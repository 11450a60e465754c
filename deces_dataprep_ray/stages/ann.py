"""Similarity search over an embedding column (list<float>).

- Brute-force cosine top-k: the baseline and the oracle. The query matrix is
  ``ray.put`` once; each batch does one numpy matmul against it and emits its
  local top-k; a final tiny reduce merges per-batch candidates. Shuffle-free.
- LSH-bucketed variant: random-hyperplane signatures bucket the corpus; only
  the query's bucket (and its 1-bit neighbors) is scanned — the scale path
  when the corpus no longer fits a full scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _to_matrix(col: pa.ChunkedArray) -> np.ndarray:
    col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against broadcast queries."""

    def __init__(self, queries_ref, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 10):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = np.asarray(q, dtype=np.float64)  # (nq, d)
        qn = np.linalg.norm(self.q, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        self.qn = self.q / qn
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_numpy()
        m = _to_matrix(batch[self.vec_col])
        if m.shape[0] == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.qn.T  # (n, nq)
        k = min(self.k, sims.shape[0])
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            part = np.argpartition(-col, k - 1)[:k] if len(col) > k else np.arange(len(col))
            for i in part:
                out_q.append(qi)
                out_id.append(int(ids[i]))
                out_s.append(float(col[i]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         self.id_col: pa.array(out_id, pa.int64()),
                         "cosine": pa.array(out_s, pa.float64())})


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] = (1, 4),
) -> pd.DataFrame:
    """Global top-k per query: distributed partial top-k → driver-side merge
    of the (num_batches × k)-row candidate set (small by construction)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cand = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, id_col=id_col,
                                   vec_col=vec_col, k=k),
        batch_format="pyarrow",
        concurrency=concurrency,
    ).to_pandas()
    out = (
        cand.sort_values(["query_id", "cosine", id_col],
                         ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


class LshSignature:
    """Random-hyperplane signature stage: embedding → nbits-bit bucket id."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, nbits)).astype(np.float32)
        self.id_col = id_col
        self.vec_col = vec_col
        self.weights = (np.uint64(1) << np.arange(nbits, dtype=np.uint64))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        bits = (vecs @ self.planes) > 0
        return (bits.astype(np.uint64) * self.weights).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col])
        buckets = self.bucket_of(m) if m.size else np.empty(0, np.uint64)
        return pa.table({
            self.id_col: batch[self.id_col],
            self.vec_col: batch[self.vec_col],
            "bucket": pa.array(buckets, pa.uint64()),
        })


def lsh_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    dim: int | None = None,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_bits: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: scan only the query's LSH bucket ± ``probe_bits``-bit
    neighbors. Recall measured against brute force in tests."""
    q = np.asarray(queries, dtype=np.float64)
    dim = dim or q.shape[1]
    sig = LshSignature(dim, nbits=nbits, id_col=id_col, vec_col=vec_col)
    bucketed = ds.map_batches(
        lambda b, _s=sig: _s(b), batch_format="pyarrow"
    )
    want: set[int] = set()
    qb = sig.bucket_of(q.astype(np.float32))
    for b in qb.tolist():
        want.add(int(b))
        if probe_bits >= 1:
            for i in range(nbits):
                want.add(int(b) ^ (1 << i))
    want_arr = np.asarray(sorted(want), dtype=np.uint64)

    def keep_buckets(t: pa.Table) -> pa.Table:
        mask = np.isin(t["bucket"].to_numpy(), want_arr)
        return t.filter(pa.array(mask))

    hit = bucketed.map_batches(keep_buckets, batch_format="pyarrow")
    qref = ray.put(q)
    cand = hit.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, id_col=id_col,
                                   vec_col=vec_col, k=k),
        batch_format="pyarrow",
        concurrency=1,
    ).to_pandas()
    return (
        cand.sort_values(["query_id", "cosine", id_col],
                         ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )

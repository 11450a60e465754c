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


# ---------------------------------------------------------------------------
# Persisted ANN index: bucket-sorted signature+vector table, pruned reads
# ---------------------------------------------------------------------------

def build_ann_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    nbits: int = 12,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_group_size: int = 2048,
) -> dict:
    """Persist the LSH-bucketed corpus once: signature map_batches → sort by
    bucket → parquet whose files/row-groups carry bucket min/max statistics.
    Queries then read ONLY the row groups intersecting their probe buckets
    (round-1's ``lsh_topk`` re-signed the whole corpus per call — a full
    scan per query; this is the serving-path fix). Layout is relocatable
    (parquet + meta.json), like the postings index."""
    import json
    import os
    import shutil

    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])

    sig_kwargs = dict(dim=dim, nbits=nbits, seed=seed,
                      id_col=id_col, vec_col=vec_col)
    bucketed = ds.map_batches(
        LshSignature, fn_constructor_kwargs=sig_kwargs,
        batch_format="pyarrow", concurrency=(1, 4),
    ).sort("bucket")
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    bucketed.write_parquet(tmp, row_group_size=row_group_size)
    os.makedirs(tmp, exist_ok=True)
    meta = {"dim": int(dim), "nbits": int(nbits), "seed": int(seed),
            "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    _swap_index_dir(tmp, index_dir)
    return meta


def _swap_index_dir(tmp: str, index_dir: str) -> None:
    """Atomic-ish publish of a fully-written index dir: the old index is
    moved aside (not rmtree'd) BEFORE ``os.replace`` and deleted only after
    the swap succeeds, so a crash at any point leaves either the old or the
    new index serveable — never neither (a pre-build rmtree of the target
    voided the tmp+replace pattern's whole point)."""
    import os
    import shutil

    old = index_dir + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(index_dir):
        os.replace(index_dir, old)
    os.replace(tmp, index_dir)
    if os.path.exists(old):
        shutil.rmtree(old)


class AnnIndex:
    """Reader over a persisted ANN index: row-group-pruned probe reads."""

    def __init__(self, index_dir: str):
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.sig = LshSignature(self.meta["dim"], nbits=self.meta["nbits"],
                                seed=self.meta["seed"],
                                id_col=self.meta["id_col"],
                                vec_col=self.meta["vec_col"])
        self._files = []
        self.total_rows = 0
        for name in sorted(os.listdir(index_dir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(index_dir, name)
            md = pq.read_metadata(path)
            idx = md.schema.to_arrow_schema().get_field_index("bucket")
            mins = np.empty(md.num_row_groups, np.uint64)
            maxs = np.empty(md.num_row_groups, np.uint64)
            rows = np.empty(md.num_row_groups, np.int64)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                mins[g], maxs[g] = np.uint64(st.min), np.uint64(st.max)
                rows[g] = md.row_group(g).num_rows
            self.total_rows += int(rows.sum())
            self._files.append({"path": path, "pf": None, "mins": mins,
                                "maxs": maxs, "rows": rows})
        self.last_rows_read = 0

    def probe_buckets(self, queries: np.ndarray, probe_bits: int = 1
                      ) -> np.ndarray:
        """``probe_bits >= nbits`` probes EVERY bucket — the exact
        configuration (identical to brute force by construction; it is the
        SQL-oracle-able gate mode, while small probe_bits is the scale
        path whose recall is measured in tests)."""
        nbits = self.meta["nbits"]
        if probe_bits >= nbits:
            return np.arange(1 << nbits, dtype=np.uint64)
        qb = self.sig.bucket_of(np.asarray(queries, np.float32))
        want: set[int] = set()
        for b in qb.tolist():
            want.add(int(b))
            if probe_bits >= 1:
                for i in range(nbits):
                    want.add(int(b) ^ (1 << i))
        return np.asarray(sorted(want), dtype=np.uint64)

    def topk(self, queries: np.ndarray, k: int = 10,
             probe_bits: int = 1) -> pd.DataFrame:
        """Exact cosine top-k within the probe buckets. Reads only row
        groups whose bucket [min, max] intersects the probe set;
        ``last_rows_read / total_rows`` reports the pruning ratio."""
        import pyarrow.parquet as pq

        q = np.asarray(queries, dtype=np.float64)
        want = self.probe_buckets(q, probe_bits)
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        scorer = BruteForceTopK(q, id_col=id_col, vec_col=vec_col, k=k)
        parts, rows_read = [], 0
        for f in self._files:
            lo = np.searchsorted(want, f["mins"], side="left")
            hi = np.searchsorted(want, f["maxs"], side="right")
            groups = np.flatnonzero(hi > lo)
            if not len(groups):
                continue
            if f["pf"] is None:
                f["pf"] = pq.ParquetFile(f["path"])
            tbl = f["pf"].read_row_groups(groups.tolist())
            rows_read += tbl.num_rows
            mask = np.isin(tbl["bucket"].to_numpy(), want)
            tbl = tbl.filter(pa.array(mask))
            if tbl.num_rows:
                parts.append(scorer(tbl))
        self.last_rows_read = rows_read
        if not parts:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        cand = pa.concat_tables(parts).to_pandas()
        return (cand.sort_values(["query_id", "cosine", id_col],
                                 ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))


def all_pairs_cosine(
    ds: rd.Dataset,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | tuple[int, int] = (1, 4),
) -> rd.Dataset:
    """ALL pairs (id_a < id_b) with cosine >= threshold — the exact
    verification baseline for :func:`..stages.dedup.embedding_near_duplicates`
    (which is the sub-quadratic scale path). Blocked matmul: the normalized
    corpus matrix broadcasts once (ray.put), each batch multiplies against
    it and emits its qualifying pairs — quadratic FLOPs (inherent to exact
    all-pairs), linear shuffle. Bound: the matrix must fit one worker
    (~n×d×8 bytes); beyond that, use the LSH near-dup stage."""
    full = ds.select_columns([id_col, vec_col]).to_pandas()
    ids_all = full[id_col].to_numpy()
    m = np.stack([np.asarray(v, np.float64) for v in full[vec_col]])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    ref = ray.put((ids_all, m / norms))

    def pairs(batch: pa.Table) -> pa.Table:
        aids = batch[id_col].to_numpy()
        am = _to_matrix(batch[vec_col])
        bids, bn = ray.get(ref)
        if am.shape[0] == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        an = am / np.where((n_ := np.linalg.norm(am, axis=1, keepdims=True)) == 0,
                           1.0, n_)
        sims = an @ bn.T
        ii, jj = np.nonzero((sims >= threshold) & (aids[:, None] < bids[None, :]))
        return pa.table({"id_a": pa.array(aids[ii], pa.int64()),
                         "id_b": pa.array(bids[jj], pa.int64()),
                         "cosine": pa.array(sims[ii, jj], pa.float64())})

    return ds.map_batches(pairs, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IVF index: k-means coarse quantizer, bucket-sorted persisted lists
# ---------------------------------------------------------------------------

def _kmeans_cosine(sample: np.ndarray, nlist: int, seed: int,
                   iters: int = 4) -> np.ndarray:
    """Small deterministic spherical k-means on a TRAINING SAMPLE (driver-
    side numpy — bounded by the sample, never the corpus): seeded init from
    sample rows, argmax-cosine assignment, mean + renormalize update; an
    emptied cluster keeps its previous centroid. Returns L2-normalized
    (nlist, dim) float32 centroids."""
    rng = np.random.default_rng(seed)
    x = np.asarray(sample, np.float64)
    n = np.linalg.norm(x, axis=1, keepdims=True)
    n[n == 0] = 1.0
    x = x / n
    nlist = min(nlist, len(x))
    c = x[rng.choice(len(x), nlist, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                v = x[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    c[j] = v / nv
    return c.astype(np.float32)


class _IvfAssign:
    """map_batches actor stage: vector → nearest-centroid bucket id
    (centroids built once per actor from the broadcast ref)."""

    def __init__(self, centroids_ref, id_col: str, vec_col: str):
        import ray as _ray

        c = (_ray.get(centroids_ref)
             if isinstance(centroids_ref, _ray.ObjectRef) else centroids_ref)
        self.c = np.asarray(c, np.float32)
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[self.vec_col]).astype(np.float32)
        if m.shape[0]:
            n = np.linalg.norm(m, axis=1, keepdims=True)
            n[n == 0] = 1.0
            buckets = np.argmax((m / n) @ self.c.T, axis=1).astype(np.uint64)
        else:
            buckets = np.empty(0, np.uint64)
        return pa.table({
            self.id_col: batch[self.id_col],
            self.vec_col: batch[self.vec_col],
            "bucket": pa.array(buckets, pa.uint64()),
        })


def build_ivf_index(
    ds: rd.Dataset,
    index_dir: str,
    *,
    nlist: int = 64,
    seed: int = 17,
    train_size: int = 4096,
    kmeans_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_group_size: int = 2048,
) -> dict:
    """Persist an IVF (inverted-file) ANN index: train a spherical-k-means
    coarse quantizer on a bounded sample, assign every vector to its
    nearest centroid in a map_batches actor stage, sort by bucket and write
    parquet whose row groups carry bucket min/max statistics — the same
    pruned-probe-read layout as :func:`build_ann_index`, with a LEARNED
    quantizer instead of random hyperplanes (tighter buckets on clustered
    corpora; the FAISS IVF-flat shape re-expressed as a Dataset pipeline).
    Centroids persist beside the data (centroids.parquet) so queries never
    retrain. Deterministic for fixed (seed, train_size, corpus order)."""
    import json
    import os
    import shutil

    import pyarrow.parquet as pq

    sample_tbl = ds.take_batch(train_size, batch_format="pyarrow")
    sample = _to_matrix(sample_tbl[vec_col])
    cents = _kmeans_cosine(sample, nlist, seed, kmeans_iters)
    cref = ray.put(cents)
    bucketed = ds.map_batches(
        _IvfAssign,
        fn_constructor_kwargs=dict(centroids_ref=cref, id_col=id_col,
                                   vec_col=vec_col),
        batch_format="pyarrow", concurrency=(1, 4),
    ).sort("bucket")
    tmp = index_dir + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    bucketed.write_parquet(tmp, row_group_size=row_group_size)
    os.makedirs(tmp, exist_ok=True)
    flat = pa.array(cents.reshape(-1), pa.float32())
    offs = pa.array(
        np.arange(0, (len(cents) + 1) * cents.shape[1], cents.shape[1],
                  dtype=np.int32), pa.int32())
    pq.write_table(
        pa.table({"centroid": pa.ListArray.from_arrays(offs, flat)}),
        os.path.join(tmp, "centroids.parquet"))
    meta = {"kind": "ivf", "nlist": int(len(cents)),
            "dim": int(cents.shape[1]), "seed": int(seed),
            "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump(meta, f)
    _swap_index_dir(tmp, index_dir)
    return meta


class IvfIndex:
    """Reader over a persisted IVF index: probes the ``nprobe`` nearest
    centroid lists per query, reads ONLY the row groups intersecting the
    probe buckets (parquet statistics pruning — same machinery as
    :class:`AnnIndex`), exact-cosine reranks inside them."""

    def __init__(self, index_dir: str):
        import json
        import os

        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, "meta.json")) as f:
            self.meta = json.load(f)
        cent_tbl = pq.read_table(os.path.join(index_dir, "centroids.parquet"))
        self.centroids = _to_matrix(cent_tbl["centroid"]).astype(np.float32)
        self._files = []
        self.total_rows = 0
        for name in sorted(os.listdir(index_dir)):
            if not name.endswith(".parquet") or name == "centroids.parquet":
                continue
            path = os.path.join(index_dir, name)
            md = pq.read_metadata(path)
            idx = md.schema.to_arrow_schema().get_field_index("bucket")
            mins = np.empty(md.num_row_groups, np.uint64)
            maxs = np.empty(md.num_row_groups, np.uint64)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                mins[g], maxs[g] = np.uint64(st.min), np.uint64(st.max)
                self.total_rows += md.row_group(g).num_rows
            self._files.append({"path": path, "pf": None,
                                "mins": mins, "maxs": maxs})
        self.last_rows_read = 0

    def probe_buckets(self, queries: np.ndarray, nprobe: int = 4
                      ) -> np.ndarray:
        q = np.asarray(queries, np.float32)
        n = np.linalg.norm(q, axis=1, keepdims=True)
        n[n == 0] = 1.0
        sims = (q / n) @ self.centroids.T
        npb = min(nprobe, sims.shape[1])
        top = np.argpartition(-sims, npb - 1, axis=1)[:, :npb]
        return np.unique(top.reshape(-1)).astype(np.uint64)

    def topk(self, queries: np.ndarray, k: int = 10,
             nprobe: int = 4) -> pd.DataFrame:
        import pyarrow.parquet as pq

        q = np.asarray(queries, dtype=np.float64)
        want = self.probe_buckets(q, nprobe)
        id_col, vec_col = self.meta["id_col"], self.meta["vec_col"]
        scorer = BruteForceTopK(q, id_col=id_col, vec_col=vec_col, k=k)
        parts, rows_read = [], 0
        for f in self._files:
            lo = np.searchsorted(want, f["mins"], side="left")
            hi = np.searchsorted(want, f["maxs"], side="right")
            groups = np.flatnonzero(hi > lo)
            if not len(groups):
                continue
            if f["pf"] is None:
                f["pf"] = pq.ParquetFile(f["path"])
            tbl = f["pf"].read_row_groups(groups.tolist())
            rows_read += tbl.num_rows
            mask = np.isin(tbl["bucket"].to_numpy(), want)
            tbl = tbl.filter(pa.array(mask))
            if tbl.num_rows:
                parts.append(scorer(tbl))
        self.last_rows_read = rows_read
        if not parts:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 id_col: pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        cand = pa.concat_tables(parts).to_pandas()
        return (cand.sort_values(["query_id", "cosine", id_col],
                                 ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(k)
                .reset_index(drop=True))

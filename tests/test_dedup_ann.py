"""Dedup suite + ANN correctness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deces_dataprep_ray.stages.ann import brute_force_topk, lsh_topk
from deces_dataprep_ray.stages.dedup import (
    exact_duplicates,
    minhash_lsh_duplicates,
    ngram_jaccard,
    simhash_duplicates,
)


def _doc_ds():
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep dark forest tonight")
    rows = {
        "doc_id": list(range(8)),
        "text": [
            base,                                   # 0
            base,                                   # 1 exact dup of 0
            base.replace("quick", "fast"),          # 2 near dup of 0
            base + " extra words here",             # 3 near dup of 0
            "completely different content about databases and indexes",  # 4
            "another unrelated document discussing ray data pipelines",  # 5
            base,                                   # 6 exact dup of 0
            "short",                                # 7
        ],
    }
    return rd.from_arrow(pa.table(rows))


def test_exact_duplicates():
    out = exact_duplicates(_doc_ds()).to_pandas().sort_values("doc_id")
    # 0,1,6 collapse to min id 0 with 3 copies
    row = out[out["doc_id"] == 0]
    assert row["n_copies"].iloc[0] == 3
    assert 1 not in out["doc_id"].tolist()
    assert 6 not in out["doc_id"].tolist()
    assert len(out) == 6  # 8 docs - 2 collapsed


def test_minhash_lsh_finds_near_dups():
    pairs = minhash_lsh_duplicates(
        _doc_ds(), threshold=0.5, num_hashes=64, num_bands=16
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    # exact dups always found; near-dups (2, 3) expected at 0.5 threshold
    assert (0, 1) in got and (0, 6) in got and (1, 6) in got
    assert (0, 3) in got
    # unrelated docs never pair
    assert not any((a, b) in got for a in (0, 1, 2, 3) for b in (4, 5, 7))


def test_simhash_finds_exact_and_near():
    pairs = simhash_duplicates(_doc_ds()).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got and (0, 6) in got
    assert not any((a, b) in got for a in (0, 1) for b in (4, 5, 7))


def test_ngram_jaccard_kernel():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "uvwxyz") == 0.0
    mid = ngram_jaccard("the quick brown fox", "the quick brown cat")
    assert 0.4 < mid < 0.9
    assert ngram_jaccard("", "") == 1.0


def _emb_ds(n=200, d=16, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, pa.array(m.reshape(-1), pa.float32())),
    })), m


def test_brute_force_topk_matches_numpy():
    ds, m = _emb_ds()
    q = m[0]
    out = brute_force_topk(ds, q[None, :], k=5)
    m64 = m.astype(np.float64)
    sims = (m64 / np.linalg.norm(m64, axis=1, keepdims=True)) @ (
        q.astype(np.float64) / np.linalg.norm(q.astype(np.float64)))
    order = np.lexsort((np.arange(len(m)), -sims))[:5]
    assert out["vec_id"].tolist() == order.tolist()
    assert np.allclose(out["cosine"].to_numpy(), sims[order])


def test_lsh_topk_recall():
    ds, m = _emb_ds(n=500)
    q = m[7]
    exact = set(brute_force_topk(ds, q[None, :], k=10)["vec_id"].tolist())
    # 4 bits over 500 vecs: ~31/bucket, 1-bit probing scans ~150 candidates
    approx = set(lsh_topk(ds, q[None, :], k=10, nbits=4)["vec_id"].tolist())
    # self (vec 7) must be found; recall should be non-trivial
    assert 7 in approx
    assert len(exact & approx) >= 3


def test_ngram_jaccard_duplicates():
    from deces_dataprep_ray.stages.dedup import ngram_jaccard_duplicates

    pairs = ngram_jaccard_duplicates(
        _doc_ds(), threshold=0.5, num_hashes=32, num_bands=8
    ).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 1) in got and (0, 6) in got    # exact dups: jaccard 1.0
    assert (0, 3) in got                       # superset text, high overlap
    full = pairs[(pairs["id_a"] == 0) & (pairs["id_b"] == 1)]
    assert full["jaccard"].iloc[0] == 1.0
    assert not any((a, b) in got for a in (0, 1) for b in (4, 5, 7))


def test_embedding_near_duplicates():
    from deces_dataprep_ray.stages.dedup import embedding_near_duplicates

    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16)).astype(np.float32)
    # rows 20/21: near-copies of rows 0/1 (tiny noise)
    near = np.vstack([base, base[0] + 0.01 * rng.standard_normal(16).astype(np.float32),
                      base[1] + 0.01 * rng.standard_normal(16).astype(np.float32)])
    n, d = near.shape
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, pa.array(near.reshape(-1), pa.float32())),
    }))
    pairs = embedding_near_duplicates(ds, threshold=0.98, nbits=4).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 20) in got and (1, 21) in got
    assert all(c >= 0.98 for c in pairs["cosine"])


def test_mulmod_m61_exact():
    # the universal-hash multiply must be the REAL (a*x) mod p, not wrapped
    from deces_dataprep_ray.stages.dedup import _M61, _mulmod_m61

    rng = np.random.default_rng(3)
    a = rng.integers(1, _M61, 40, dtype=np.int64).astype(np.uint64)
    x = rng.integers(0, _M61, 40, dtype=np.int64).astype(np.uint64)
    got = _mulmod_m61(a[:, None], x[None, :])
    ref = np.array([[(int(ai) * int(xi)) % _M61 for xi in x] for ai in a],
                   dtype=np.uint64)
    assert (got == ref).all()


def test_band_rows_carry_no_shingles():
    # the LSH shuffle moves (band_key, id, signature) ONLY — never shingles
    import pyarrow as pa

    from deces_dataprep_ray.stages.dedup import band_rows_with_sig

    sig_tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "minhash": pa.array([list(range(64))] * 2, pa.large_list(pa.uint64())),
        "shingles": pa.array([list(range(9))] * 2, pa.large_list(pa.uint64())),
    })
    out = band_rows_with_sig(sig_tbl, id_col="doc_id", num_bands=16,
                             rows_per_band=4)
    assert out.column_names == ["band_key", "doc_id", "minhash"]


def test_max_bucket_drop_is_counted():
    # an over-max_bucket bucket must report its drop count, never silently
    import ray

    from deces_dataprep_ray.stages.dedup import DropCounter, minhash_lsh_duplicates

    dc = DropCounter.remote()
    texts = ["same text repeated many times here ok " * 5] * 6
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(6, dtype=np.int64), "text": texts}))
    _ = minhash_lsh_duplicates(ds, concurrency=1, max_bucket=2,
                               drop_counter=dc).to_pandas()
    assert ray.get(dc.total.remote()) > 0

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


def test_persisted_ann_index(tmp_path):
    # persisted index must (a) return the same results as the on-the-fly
    # lsh_topk (same signatures, same probe set) and (b) READ only a small
    # fraction of the corpus rows — the serving-path property
    from deces_dataprep_ray.stages.ann import AnnIndex, build_ann_index

    ds, m = _emb_ds(n=500)
    q = m[7]
    idx = str(tmp_path / "ann")
    build_ann_index(ds, idx, nbits=6, row_group_size=64)
    r = AnnIndex(idx)
    got = r.topk(q[None, :], k=10)
    fly = lsh_topk(ds, q[None, :], k=10, nbits=6)
    assert got["vec_id"].tolist() == fly["vec_id"].tolist()
    assert np.allclose(got["cosine"].to_numpy(), fly["cosine"].to_numpy())
    # 7 probe buckets of 64 → expect ~11% of rows; row-group pruning is
    # coarse at this tiny scale, so just require a real cut
    assert r.last_rows_read < 0.6 * r.total_rows
    assert 7 in got["vec_id"].tolist()


def test_minhash_pairs_match_bruteforce():
    # the distributed LSH pipeline must return EXACTLY the pairs a direct
    # computation finds: band collision AND signature-est jaccard >= t
    from deces_dataprep_ray.stages.dedup import (
        _minhash,
        _perm_params,
        _tokenize_shingles,
        minhash_lsh_duplicates,
    )

    ds = _doc_ds()
    df = ds.to_pandas()
    nh, nb, t = 32, 8, 0.5
    rpb = nh // nb
    a, b = _perm_params(nh)
    sigs = {int(r.doc_id): _minhash(_tokenize_shingles(r.text), a, b)
            for r in df.itertuples()}
    want = {}
    ids = sorted(sigs)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            sa, sb = sigs[ia], sigs[ib]
            est = float((sa == sb).mean())
            collide = any(
                (sa[bd * rpb: (bd + 1) * rpb] == sb[bd * rpb: (bd + 1) * rpb]).all()
                for bd in range(nb))
            if collide and est >= t:
                want[(ia, ib)] = est
    got = minhash_lsh_duplicates(ds, threshold=t, num_hashes=nh,
                                 num_bands=nb).to_pandas()
    got_pairs = {(int(r.id_a), int(r.id_b)): float(r.jaccard)
                 for r in got.itertuples()}
    assert got_pairs == want


def test_simhash_pairs_match_bruteforce():
    # chunk bucketing is a pigeonhole GUARANTEE for hamming <= 3: the
    # pipeline must equal the full quadratic scan exactly
    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.stages.dedup import SimHashStage, simhash_duplicates

    ds = _doc_ds()
    df = ds.to_pandas()
    hs = {int(r.doc_id): SimHashStage.simhash(tokenize(r.text))
          for r in df.itertuples()}
    want = {}
    ids = sorted(hs)
    for i, ia in enumerate(ids):
        for ib in ids[i + 1:]:
            d = bin(hs[ia] ^ hs[ib]).count("1")
            if d <= 3:
                want[(ia, ib)] = d
    got = simhash_duplicates(ds).to_pandas()
    got_pairs = {(int(r.id_a), int(r.id_b)): int(r.hamming)
                 for r in got.itertuples()}
    assert got_pairs == want


def test_all_pairs_cosine_matches_numpy():
    from deces_dataprep_ray.stages.ann import all_pairs_cosine

    ds, m = _emb_ds(n=80)
    got = all_pairs_cosine(ds, 0.3).to_pandas()
    m64 = m.astype(np.float64)
    n = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = n @ n.T
    want = {(i, j): sims[i, j] for i in range(80) for j in range(i + 1, 80)
            if sims[i, j] >= 0.3}
    got_pairs = {(int(r.id_a), int(r.id_b)): float(r.cosine)
                 for r in got.itertuples()}
    assert set(got_pairs) == set(want)
    for k in want:
        assert abs(got_pairs[k] - want[k]) < 1e-12


def test_ngram_pairs_match_bruteforce():
    # two-pass pipeline == direct computation: LSH candidate (band collision
    # AND signature-est jaccard >= threshold - margin) AND exact shingle
    # jaccard >= threshold
    from deces_dataprep_ray.stages.dedup import (
        _minhash,
        _perm_params,
        _tokenize_shingles,
        ngram_jaccard_duplicates,
    )

    ds = _doc_ds()
    df = ds.to_pandas()
    nh, nb, thr, margin = 32, 8, 0.5, 0.15
    rpb = nh // nb
    a, b = _perm_params(nh)
    sh = {int(r.doc_id): _tokenize_shingles(r.text) for r in df.itertuples()}
    sigs = {i: _minhash(s, a, b) for i, s in sh.items()}
    want = {}
    ids = sorted(sigs)
    for x, ia in enumerate(ids):
        for ib in ids[x + 1:]:
            sa, sb = sigs[ia], sigs[ib]
            est = float((sa == sb).mean())
            collide = any(
                (sa[bd * rpb: (bd + 1) * rpb] == sb[bd * rpb: (bd + 1) * rpb]).all()
                for bd in range(nb))
            if not (collide and est >= thr - margin):
                continue
            inter = len(np.intersect1d(sh[ia], sh[ib], assume_unique=True))
            union = len(sh[ia]) + len(sh[ib]) - inter
            jac = inter / union if union else 1.0
            if jac >= thr:
                want[(ia, ib)] = round(jac, 12)
    got = ngram_jaccard_duplicates(ds, threshold=thr, num_hashes=nh,
                                   num_bands=nb,
                                   candidate_margin=margin).to_pandas()
    got_pairs = {(int(r.id_a), int(r.id_b)): round(float(r.jaccard), 12)
                 for r in got.itertuples()}
    assert got_pairs == want


def test_ngram_verify_paths_identical():
    """Driver-side and distributed (hash_join) exact-jaccard verify return
    the SAME pair set — forced by setting driver_max_pairs below the
    candidate count so the second call takes the fallback."""
    from deces_dataprep_ray.stages.dedup import ngram_jaccard_duplicates

    kw = dict(threshold=0.5, num_hashes=32, num_bands=8)
    fast = ngram_jaccard_duplicates(
        _doc_ds(), driver_max_pairs=10**9, **kw).to_pandas()
    dist = ngram_jaccard_duplicates(
        _doc_ds(), driver_max_pairs=0, **kw).to_pandas()

    def norm(df):
        return {(int(a), int(b), round(float(j), 12))
                for a, b, j in zip(df["id_a"], df["id_b"], df["jaccard"])}

    assert len(fast) > 0            # the scenario actually produces pairs
    assert norm(fast) == norm(dist)


def test_embedding_bucketize_signature_built_once():
    """EmbeddingBucketize must construct its LshSignature in __init__, not
    per batch: count constructions via a monkeypatched LshSignature."""
    from deces_dataprep_ray.stages import ann
    from deces_dataprep_ray.stages.dedup import EmbeddingBucketize

    calls = {"n": 0}
    orig_init = ann.LshSignature.__init__

    def counting_init(self, *a, **k):
        calls["n"] += 1
        orig_init(self, *a, **k)

    ann.LshSignature.__init__ = counting_init
    try:
        st = EmbeddingBucketize(dim=4, nbits=4, seed=11,
                                id_col="vec_id", vec_col="embedding")
        rng = np.random.default_rng(0)
        for _ in range(5):  # five batches, one signature
            m = rng.standard_normal((6, 4)).astype(np.float32)
            offs = pa.array(np.arange(0, 7 * 4, 4, dtype=np.int32), pa.int32())
            batch = pa.table({
                "vec_id": pa.array(np.arange(6), pa.int64()),
                "embedding": pa.ListArray.from_arrays(
                    offs, pa.array(m.reshape(-1), pa.float32())),
            })
            st(batch)
    finally:
        ann.LshSignature.__init__ = orig_init
    assert calls["n"] == 1


def test_ivf_index_recall_and_pruning(tmp_path):
    """IVF-flat vs brute force: high recall at generous nprobe, EXACT
    equality at nprobe=nlist (all lists scanned), and the probe read must
    prune (read ≪ corpus at small nprobe)."""
    from deces_dataprep_ray.stages.ann import (
        IvfIndex,
        brute_force_topk,
        build_ivf_index,
    )

    rng = np.random.default_rng(8)
    n, d = 600, 16
    # clustered corpus: 6 gaussian blobs — the case IVF's learned centroids
    # should bucket tightly
    centers = rng.standard_normal((6, d)) * 3
    m = np.vstack([c + rng.standard_normal((n // 6, d)) for c in centers])
    m = m.astype(np.float32)
    offs = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32), pa.int32())
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.ListArray.from_arrays(
            offs, pa.array(m.reshape(-1), pa.float32())),
    }))
    idx_dir = str(tmp_path / "ivf")
    meta = build_ivf_index(ds, idx_dir, nlist=12, train_size=600,
                           row_group_size=64)
    assert meta["nlist"] == 12
    ivf = IvfIndex(idx_dir)

    queries = m[rng.choice(n, 5, replace=False)].astype(np.float64)
    bf = brute_force_topk(ds, queries, k=10)
    got = ivf.topk(queries, k=10, nprobe=4)
    # recall@10 over the 5 queries
    rec = 0.0
    for qi in range(5):
        want = set(bf[bf["query_id"] == qi]["vec_id"])
        have = set(got[got["query_id"] == qi]["vec_id"])
        rec += len(want & have) / 10
    assert rec / 5 >= 0.9
    # pruning: a single query at small nprobe reads a fraction of the corpus
    ivf.topk(queries[:1], k=10, nprobe=2)
    assert ivf.last_rows_read < n * 0.6

    # exact at full probe: scanning every list == brute force
    full = ivf.topk(queries, k=10, nprobe=12)
    pd.testing.assert_frame_equal(
        full.reset_index(drop=True), bf.reset_index(drop=True),
        check_dtype=False)

    # determinism: rebuilding yields identical centroids
    idx2 = str(tmp_path / "ivf2")
    build_ivf_index(ds, idx2, nlist=12, train_size=600, row_group_size=64)
    np.testing.assert_array_equal(IvfIndex(idx2).centroids, ivf.centroids)

"""Round-5 surfaces: word-shingle MinHash (exact-verified), banded
embedding LSH, ANN exact configurations, the multi-phrase query_string
regression, and the top_hits tie-break / timestamp-precision fixes.

Oracles: independent pure-Python brute force (same pattern as
test_round4_ops / test_dedup_ann)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from deces_dataprep_ray.functions.analysis import tokenize
from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.query import idf as _idf
from deces_dataprep_ray.index.reader import IndexReader


# ---------------------------------------------------------------------------
# word-shingle kernels
# ---------------------------------------------------------------------------

def _word_gram_set(text: str, n: int = 3) -> set:
    toks = text.split()
    return {tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)} \
        if len(toks) >= n else set()


def test_word_shingles_batch_matches_scalar_and_oracle():
    from deces_dataprep_ray.stages.dedup import (
        _word_shingles,
        _word_shingles_batch,
    )

    rng = np.random.default_rng(9)
    vocab = ["a", "bb", "ccc", "dd", "e"]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 30)))
             for _ in range(100)] + ["", "one", "one two", "x " * 200]
    flat, offs = _word_shingles_batch(texts, 3)
    for i, t in enumerate(texts):
        got = flat[offs[i]:offs[i + 1]]
        # count equals the distinct-tuple oracle (hash injectivity at this
        # scale) and the scalar kernel equals the batch kernel exactly
        assert len(got) == len(_word_gram_set(t))
        assert np.array_equal(got, _word_shingles(t, 3))
        if len(got) > 1:  # per-doc ascending (sorted-unique contract)
            assert (np.diff(got.view(np.uint64)) > 0).all()


def test_word_minhash_pairs_match_bruteforce(ray_session):
    """Word-mode ngram_jaccard_duplicates == exact word-trigram jaccard
    brute force (set equality AND values), incl. short docs with zero
    shingles, which must never pair."""
    from deces_dataprep_ray.stages.dedup import ngram_jaccard_duplicates

    rng = np.random.default_rng(3)
    vocab = ["data", "spark", "row", "scan", "merge", "key"]
    base = [" ".join(rng.choice(vocab, 30)) for _ in range(20)]
    texts = list(base)
    for i in range(8):  # near-dups: mutate a few words
        w = base[i].split()
        for j in rng.choice(len(w), 3, replace=False):
            w[j] = str(rng.choice(vocab))
        texts.append(" ".join(w))
    texts += ["one two", "one two", ""]  # zero-shingle docs
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = ngram_jaccard_duplicates(
        ds, threshold=0.5, num_hashes=64, num_bands=32,
        candidate_margin=0.25, shingle_mode="word", n_words=3,
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    want = []
    grams = [_word_gram_set(t) for t in texts]
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            u = len(grams[a] | grams[b])
            if u == 0:
                continue  # SQL-oracle semantics: NULL jaccard, excluded
            j = len(grams[a] & grams[b]) / u
            if j >= 0.5:
                want.append((a, b, j))
    assert list(zip(got["id_a"], got["id_b"])) == [(a, b) for a, b, _ in want]
    assert np.allclose(got["jaccard"], [j for _, _, j in want])


def test_duplicate_spans_matches_bruteforce(ray_session):
    """duplicate_spans == brute-force distinct-word-8-gram doc counts,
    with planted boilerplate shared across docs."""
    from deces_dataprep_ray.stages.dedup import duplicate_spans

    rng = np.random.default_rng(17)
    vocab = ["data", "spark", "row", "scan", "merge", "key", "agg", "hash"]
    boiler = "subscribe to our newsletter for updates every single day"
    texts = []
    for i in range(30):
        body = " ".join(rng.choice(vocab, 40))
        texts.append(body + (" " + boiler if i % 3 == 0 else ""))
    texts += ["short doc", ""]  # < 8 tokens → no windows → no row
    ids = np.arange(len(texts), dtype=np.int64)
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = duplicate_spans(ds, n_words=8, min_docs=2).to_pandas()
    got = got.sort_values("doc_id").reset_index(drop=True)

    def grams(t):
        w = t.split()
        return {tuple(w[i:i + 8]) for i in range(len(w) - 7)}

    gs = [grams(t) for t in texts]
    from collections import Counter
    doc_count = Counter(g for s in gs for g in s)
    want = []
    for i, s in enumerate(gs):
        if not s:
            continue
        nd = sum(1 for g in s if doc_count[g] >= 2)
        want.append((i, len(s), nd, nd / len(s)))
    assert list(got["doc_id"]) == [w[0] for w in want]
    assert list(got["n_windows"]) == [w[1] for w in want]
    assert list(got["n_dup_windows"]) == [w[2] for w in want]
    assert np.allclose(got["dup_frac"], [w[3] for w in want])
    # boilerplate docs are flagged, clean docs are not
    flagged = set(got[got["n_dup_windows"] > 0]["doc_id"])
    assert {i for i in range(30) if i % 3 == 0} <= flagged


# ---------------------------------------------------------------------------
# banded embedding LSH
# ---------------------------------------------------------------------------

def test_banded_embedding_dedup_matches_exact_pairs(ray_session):
    from deces_dataprep_ray.stages.dedup import embedding_near_duplicates_banded

    rng = np.random.default_rng(21)
    n, d = 120, 16
    m = rng.standard_normal((n, d))
    for i in range(0, 30, 2):  # planted near-dups
        m[i + 1] = m[i] + 0.15 * rng.standard_normal(d)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": ids,
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d).cast(
            pa.list_(pa.float32())),
    })
    got = embedding_near_duplicates_banded(
        rd.from_arrow(tbl), threshold=0.4, num_bands=64, bits_per_band=4,
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    mm = m.astype(np.float32).astype(np.float64)
    nrm = mm / np.linalg.norm(mm, axis=1, keepdims=True)
    sims = nrm @ nrm.T
    want = [(a, b, sims[a, b]) for a in range(n) for b in range(a + 1, n)
            if sims[a, b] >= 0.4]
    assert list(zip(got["id_a"], got["id_b"])) == [(a, b) for a, b, _ in want]
    assert np.allclose(got["cosine"], [s for _, _, s in want], atol=1e-9)


# ---------------------------------------------------------------------------
# ANN exact configurations (the SQL-gated modes)
# ---------------------------------------------------------------------------

def _emb_table(n=200, d=12, seed=5):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d)).astype(np.float32)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1), pa.float32()), d).cast(
            pa.list_(pa.float32())),
    }), m


def test_ann_lsh_probe_all_equals_brute_force(ray_session, tmp_path):
    from deces_dataprep_ray.stages.ann import (
        AnnIndex,
        BruteForceTopK,
        build_ann_index,
    )

    tbl, m = _emb_table()
    idx_dir = str(tmp_path / "ann")
    build_ann_index(rd.from_arrow(tbl), idx_dir, nbits=8)
    idx = AnnIndex(idx_dir)
    q = m[:3].astype(np.float64)
    got = idx.topk(q, k=10, probe_bits=idx.meta["nbits"])
    assert idx.last_rows_read == idx.total_rows  # probed everything
    bf = BruteForceTopK(q, k=10)(tbl)
    want = (bf.to_pandas()
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True])
            .groupby("query_id").head(10).reset_index(drop=True))
    assert (got["vec_id"].to_numpy() == want["vec_id"].to_numpy()).all()
    assert np.allclose(got["cosine"], want["cosine"])


def test_ann_index_build_preserves_old_on_failure(ray_session, tmp_path,
                                                  monkeypatch):
    """The atomic-swap fix: a crash before publish leaves the OLD index
    intact (the pre-build rmtree used to delete it first)."""
    import deces_dataprep_ray.stages.ann as ann_mod

    tbl, _ = _emb_table(n=50)
    idx_dir = str(tmp_path / "ann2")
    ann_mod.build_ann_index(rd.from_arrow(tbl), idx_dir, nbits=4)
    before = ann_mod.AnnIndex(idx_dir).total_rows

    def boom(tmp, target):
        raise RuntimeError("crash before publish")

    monkeypatch.setattr(ann_mod, "_swap_index_dir", boom)
    with pytest.raises(RuntimeError):
        ann_mod.build_ann_index(rd.from_arrow(tbl), idx_dir, nbits=4)
    monkeypatch.undo()
    assert ann_mod.AnnIndex(idx_dir).total_rows == before  # old index alive


# ---------------------------------------------------------------------------
# query_string: multi-phrase regression (ADVICE r04)
# ---------------------------------------------------------------------------

def test_query_string_two_phrases_no_topk_truncation(ray_session, tmp_path):
    """Round-4 bug: k=len(union) was re-read after the first phrase filter
    shrank the union, top-k-truncating the SECOND phrase's match set.
    Corpus: phrase "aa bb" matches 2 LONG docs (low BM25); phrase "cc dd"
    matches 40 docs that all outrank them. The old code searched phrase 2
    with k=2, got 2 high-scoring docs that don't contain phrase 1, and
    returned [] — the correct answer is exactly the 2 double-phrase docs."""
    from deces_dataprep_ray.index.query import search_query_string

    filler = ["xx", "yy", "zz"]
    rows = []
    for i in range(2):  # match BOTH phrases, long docs → low scores
        rows.append("aa bb cc dd " + " ".join(filler * 20))
    for i in range(40):  # match only "cc dd", short docs → high scores
        rows.append("cc dd " + filler[i % 3])
    df = pd.DataFrame({"url": [f"doc://{i}" for i in range(len(rows))],
                       "text": rows})
    src = str(tmp_path / "qs.parquet")
    df.to_parquet(src)
    idx = str(tmp_path / "qsidx")
    build_index(src, idx, num_buckets=2, salt_shards=2, head_min_df=1000,
                store_positions=True, batch_size=16)
    r = IndexReader(idx)
    got = search_query_string(r, '"aa bb" "cc dd"', k=10)
    want_ids = sorted(doc_id_from_url(f"doc://{i}") for i in range(2))
    assert sorted(d for d, _ in got) == want_ids
    # scores: OR-BM25 over all positive terms {aa,bb,cc,dd}
    toks = [tokenize(t) for t in rows]
    dls = [len(t) for t in toks]
    avg = sum(dls) / len(dls)
    dids = [doc_id_from_url(u) for u in df["url"]]
    for d, s in got:
        i = dids.index(d)
        want = 0.0
        for term in ("aa", "bb", "cc", "dd"):
            pl = [j for j in range(len(rows)) if term in toks[j]]
            tf = toks[i].count(term)
            if tf:
                want += _idf(len(rows), len(pl)) * tf / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg))
        assert s == pytest.approx(want, rel=1e-9)


# ---------------------------------------------------------------------------
# media features through the real decode kernels
# ---------------------------------------------------------------------------

def test_media_features_closed_form():
    """MediaFeatures over synth_media_for_ids equals the closed form the
    SQL oracle uses — through the REAL PPM/WAV decode kernels."""
    from deces_dataprep_ray.stages.multimodal import (
        MediaFeatures,
        synth_media_for_ids,
    )

    ids = np.array([0, 1, 7, 123456], np.int64)
    out = MediaFeatures()(synth_media_for_ids(ids)).to_pandas()
    assert len(out) == 2 * len(ids)
    for d in ids:
        img = out[(out["media_id"] == d) & (out["kind"] == "image")]
        au = out[(out["media_id"] == d) & (out["kind"] == "audio")]
        j = np.arange(768, dtype=np.int64)
        want_b = float(np.mean((d * 37 + j) % 251))
        i = np.arange(1024, dtype=np.int64)
        s = (((d * 13 + i) % 201) - 100) / 32768.0
        want_r = float(np.sqrt(np.mean(s * s)))
        assert float(img["brightness"].iloc[0]) == pytest.approx(
            want_b, abs=1e-12)
        assert float(img["rms"].iloc[0]) == 0.0
        assert float(au["rms"].iloc[0]) == pytest.approx(want_r, abs=1e-12)
        assert float(au["brightness"].iloc[0]) == 0.0


def test_media_features_rejects_compressed():
    from deces_dataprep_ray.stages.multimodal import MEDIA_SCHEMA, MediaFeatures

    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"], pa.string()),
        "payload": pa.array([b"\xff\xd8jpegdata"], pa.large_binary()),
        "mime": pa.array(["image/jpeg"], pa.string()),
        "width": pa.array([-1], pa.int32()),
        "height": pa.array([-1], pa.int32()),
        "duration_ms": pa.array([-1], pa.int32()),
    }).cast(MEDIA_SCHEMA)
    with pytest.raises(NotImplementedError):
        MediaFeatures()(t)


# ---------------------------------------------------------------------------
# query_string extended grammar: AND / OR / parens / field: / -
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def qs_corpus(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r5qs")
    rng = np.random.default_rng(7)
    vocab = ["data", "spark", "window", "scan", "merge", "key", "row"]
    n = 90
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(n)]
    df = pd.DataFrame({"url": [f"doc://{i}" for i in range(n)],
                       "text": texts})
    src = str(d / "c.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=1000,
                store_positions=True, batch_size=16)
    return df, idx


def _qs_oracle(df, match_fn, score_terms):
    """Brute force: docs where match_fn(tokens) holds, scored OR-BM25 over
    score_terms."""
    toks = [tokenize(t) for t in df["text"]]
    dls = [len(t) for t in toks]
    n = len(df)
    avg = sum(dls) / n
    dids = [doc_id_from_url(u) for u in df["url"]]
    out = {}
    for i in range(n):
        if not match_fn(toks[i]):
            continue
        s = 0.0
        for term in sorted(set(score_terms)):
            pl = sum(1 for tt in toks if term in tt)
            tf = toks[i].count(term)
            if tf and pl:
                s += _idf(n, pl) * tf / (
                    tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg))
        if s > 0:
            out[dids[i]] = s
    return out


def _assert_topk(got, want, k=10):
    w = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(d, round(s, 9)) for d, s in got] == \
        [(d, round(s, 9)) for d, s in w]


def test_query_string_extended_boolean(qs_corpus):
    from deces_dataprep_ray.index.query import search_query_string
    from deces_dataprep_ray.index.reader import IndexReader

    df, idx = qs_corpus
    r = IndexReader(idx)

    got = search_query_string(r, "(data OR spark) AND window", k=10)
    want = _qs_oracle(
        df, lambda t: ("data" in t or "spark" in t) and "window" in t,
        ["data", "spark", "window"])
    _assert_topk(got, want)

    got = search_query_string(r, "data AND -key", k=10)
    want = _qs_oracle(df, lambda t: "data" in t and "key" not in t,
                      ["data"])
    _assert_topk(got, want)

    got = search_query_string(r, '("data spark" OR merge) AND scan', k=10)
    want = _qs_oracle(
        df,
        lambda t: (any(a == "data" and b == "spark"
                       for a, b in zip(t, t[1:])) or "merge" in t)
        and "scan" in t,
        ["data", "spark", "merge", "scan"])
    _assert_topk(got, want)

    # juxtaposition = OR; AND binds tighter
    got = search_query_string(r, "data AND key merge", k=10)
    want = _qs_oracle(
        df, lambda t: ("data" in t and "key" in t) or "merge" in t,
        ["data", "key", "merge"])
    _assert_topk(got, want)

    # flat subset still served by the old path, unchanged
    from deces_dataprep_ray.index.query import _qs_is_extended
    assert not _qs_is_extended('"data spark" window -key')
    assert _qs_is_extended("a AND b")
    assert _qs_is_extended("lang:en")
    assert not _qs_is_extended("lowercase and or terms")


def test_query_string_parser_properties(qs_corpus):
    """Parser robustness + flat/extended agreement:
    - random token soups (incl. unbalanced parens, stray AND/OR/-, quotes)
      never crash the parser or the search;
    - for pure-OR queries (bare terms only), the extended evaluator
      returns exactly the flat path's results."""
    from deces_dataprep_ray.index.query import (
        _qs_eval,
        _qs_score,
        parse_query_string_ast,
        search_query_string,
    )

    df, idx = qs_corpus
    r = IndexReader(idx)
    rng = np.random.default_rng(23)
    soup = ["data", "spark", "(", ")", "AND", "OR", "-", '"data spark"',
            "-key", "window", '""', "-(", "scan"]
    for _ in range(60):
        q = " ".join(rng.choice(soup, rng.integers(1, 9)))
        ast = parse_query_string_ast(q)     # never raises
        assert isinstance(ast, tuple)
        res = search_query_string(r, q, k=5) if any(
            c in q for c in "()") or "AND" in q or "OR" in q else None
        if res is not None:
            for d, s in res:
                assert s > 0.0

    for q in ("data", "data spark", "window scan merge key"):
        flat = search_query_string(r, q, k=10)
        leaves: list = []
        ids = _qs_eval(parse_query_string_ast(q), r, leaves)
        ext = _qs_score(r, leaves, ids, 10)
        assert [(d, round(s, 12)) for d, s in ext] == \
            [(d, round(s, 12)) for d, s in flat]


def test_query_string_field_atom(ts_index):
    """field:term matches and scores with the field's own stats."""
    from deces_dataprep_ray.index.fielded import search_fields
    from deces_dataprep_ray.index.query import search_query_string

    df, idx = ts_index
    r = IndexReader(idx)
    got = search_query_string(r, "body:data AND lang:xx", k=10)
    assert got == []  # lang is keyword-only here, xx matches nothing
    got = search_query_string(r, "body:data", k=10)
    want = search_fields(r, [("body", "data")], k=10, algorithm="exact")
    assert got == want
    # unknown field matches nothing (frozen)
    assert search_query_string(r, "nosuch:data", k=5) == []

@pytest.fixture(scope="module")
def ts_index(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("r5ts")
    n = 24
    # epoch-ns magnitudes where float64 collapses neighbors: consecutive
    # values 100 ns apart around 1.7e18 (spacing at that magnitude is 256 ns)
    base = 1_700_000_000_000_000_000
    ts = np.array([base + (i % 8) * 100 for i in range(n)], dtype="int64")
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": ["data spark"] * n,
        "lang": [["en", "fr"][i % 2] for i in range(n)],
        "ts": pd.to_datetime(ts, unit="ns"),
        "nch": np.concatenate([np.full(12, 5), np.arange(12)]),
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, fields={"body": "body"},
                keyword_fields={"lang": "lang"},
                docvalue_fields={"nch": "nch", "lang": "lang", "ts": "ts"},
                num_buckets=2, salt_shards=2, head_min_df=1000, batch_size=8)
    return df, idx


def test_top_hits_numeric_doc_id_tiebreak(ts_index):
    """Ties on the sort value must break by NUMERIC doc_id ascending (the
    round-4 str cast made '10' < '9')."""
    from deces_dataprep_ray.index.aggs import top_hits_agg

    df, idx = ts_index
    r = IndexReader(idx)
    rows = top_hits_agg(r, "lang", "nch", n_per_bucket=3, descending=True)
    pdf = df.assign(did=[doc_id_from_url(u) for u in df["url"]])
    want = []
    for lang in sorted(pdf["lang"].unique()):
        sub = pdf[pdf["lang"] == lang].sort_values(
            ["nch", "did"], ascending=[False, True]).head(3)
        want.extend((lang, int(x), float(v))
                    for x, v in zip(sub["did"], sub["nch"]))
    assert rows == want


@pytest.fixture(scope="module")
def hicard_index(ray_session, tmp_path_factory):
    """4,000 docs over a ~2,000-distinct-key column — the shape that blew
    up the round-4 driver-side terms-agg merges."""
    d = tmp_path_factory.mktemp("r5hc")
    n = 4000
    rng = np.random.default_rng(13)
    keys = [f"k{int(x):05d}" for x in rng.zipf(1.3, n) % 2000]
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": ["data"] * n,
        "key": keys,
        "inner": [f"i{i % 7}" for i in range(n)],
        "val": rng.integers(0, 1000, n),
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, fields={"body": "body"},
                keyword_fields={"key": "key"},
                docvalue_fields={"key": "key", "inner": "inner",
                                 "val": "val"},
                num_buckets=2, salt_shards=2, head_min_df=1000,
                batch_size=256)
    return df, idx


def test_terms_metric_agg_size_cap_bounds_and_matches(hicard_index):
    """size caps driver-visible buckets at ≤ size, ordered by (doc_count
    desc, key asc), with metrics equal to the uncapped enumeration's."""
    from deces_dataprep_ray.index.aggs import terms_metric_agg

    df, idx = hicard_index
    r = IndexReader(idx)
    full = {t[0]: t for t in terms_metric_agg(r, "key", "val")}
    # shard_size >= distinct keys → no per-batch pruning: the distributed
    # top-size selection must be EXACT
    capped = terms_metric_agg(r, "key", "val", size=10, shard_size=4000)
    assert len(capped) == 10  # driver rows bounded by size
    want_keys = sorted(full, key=lambda k: (-full[k][1], k))[:10]
    assert [t[0] for t in capped] == want_keys
    for t in capped:
        f = full[t[0]]
        assert t[1] == f[1] and t[2] == pytest.approx(f[2])
        assert t[3] == pytest.approx(f[3])
    # default shard_size (ES's size*1.5+10 heuristic) is the per-batch
    # APPROXIMATION ES makes: bounded output, counts never exceed the true
    # count, and the heavy head keys are exact
    approx = terms_metric_agg(r, "key", "val", size=10)
    assert len(approx) == 10
    for t in approx:
        assert t[1] <= full[t[0]][1]
    assert [t[0] for t in approx[:3]] == want_keys[:3]
    assert [t[1] for t in approx[:3]] == [full[k][1] for k in want_keys[:3]]


def test_terms_terms_agg_size_cap(hicard_index):
    from deces_dataprep_ray.index.aggs import terms_terms_agg

    df, idx = hicard_index
    r = IndexReader(idx)
    full = terms_terms_agg(r, "key", "inner")
    capped = terms_terms_agg(r, "key", "inner", size=5, inner_size=3)
    assert len(capped) <= 5 * 3  # driver rows bounded
    # outer selection: top-5 keys by total doc_count (desc, key asc)
    tot: dict = {}
    for o, i, n in full:
        tot[o] = tot.get(o, 0) + n
    want_outer = sorted(tot, key=lambda k: (-tot[k], k))[:5]
    assert list(dict.fromkeys(o for o, _, _ in capped)) == want_outer
    # inner selection per outer: top-3 by (doc_count desc, key asc)
    for o in want_outer:
        inner_full = sorted(((n, i) for oo, i, n in full if oo == o),
                            key=lambda p: (-p[0], p[1]))[:3]
        got = [(n, i) for oo, i, n in capped if oo == o]
        assert got == inner_full


def test_top_hits_agg_size_cap(hicard_index):
    from deces_dataprep_ray.index.aggs import top_hits_agg

    df, idx = hicard_index
    r = IndexReader(idx)
    capped = top_hits_agg(r, "key", "val", n_per_bucket=2, size=4,
                          tie_column="url")
    assert len(capped) <= 4 * 2
    counts = df["key"].value_counts()
    want_keys = sorted(counts.index,
                       key=lambda k: (-int(counts[k]), k))[:4]
    assert list(dict.fromkeys(k for k, _, _ in capped)) == want_keys
    pdf = df.assign(did=[doc_id_from_url(u) for u in df["url"]])
    for k in want_keys:
        sub = pdf[pdf["key"] == k].sort_values(
            ["val", "url"], ascending=[False, True]).head(2)
        assert [d for kk, d, _ in capped if kk == k] == \
            [int(x) for x in sub["did"]]


def test_top_hits_timestamp_ns_precision(ts_index):
    """Sort values 100 ns apart (collapsed by a float64 cast) must still
    order exactly — the partial and merge keep int64."""
    from deces_dataprep_ray.index.aggs import top_hits_agg

    df, idx = ts_index
    r = IndexReader(idx)
    rows = top_hits_agg(r, "lang", "ts", n_per_bucket=2, descending=True)
    pdf = df.assign(did=[doc_id_from_url(u) for u in df["url"]],
                    tsi=df["ts"].astype("int64"))
    want = []
    for lang in sorted(pdf["lang"].unique()):
        sub = pdf[pdf["lang"] == lang].sort_values(
            ["tsi", "did"], ascending=[False, True]).head(2)
        want.extend((lang, int(x)) for x in sub["did"])
    assert [(k, d) for k, d, _ in rows] == want

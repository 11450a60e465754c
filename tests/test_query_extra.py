"""Wildcard / regexp / more_like_this queries, sort-by-field, field
collapsing, function_score, range + filters aggregations, msearch.

Oracles: pure-Python/pandas brute force over the same corpus (the driver's
SQL gates cover the same semantics at sf0.01)."""

import fnmatch
import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.query import idf as _idf
from deces_dataprep_ray.index.reader import IndexReader


# --- wildcard / regexp / MLT over the shared plain index --------------------

def test_wildcard_expansion_and_search(built_index, brute_force):
    from deces_dataprep_ray.index.query import (
        search_exact,
        search_wildcard,
        wildcard_to_regexp,
    )

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    for pat in ("term1?", "term*7", "t?rm2*", "istan*"):
        regex, _lit = wildcard_to_regexp(pat)
        want = sorted(t for t in inv if re.fullmatch(regex, t))
        assert want == sorted(t for t in inv if fnmatch.fnmatchcase(t, pat))
        got = search_wildcard(r, pat, k=10, max_expansions=10**6)
        ref = search_exact(r, " ".join(want), 10) if want else []
        assert got == ref, pat


def test_regexp_expansion_and_search(built_index, brute_force):
    from deces_dataprep_ray.index.query import (
        expand_regexp,
        search_exact,
        search_regexp,
    )

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    for pat in ("term1[0-3]", "term[0-9]", ".*nbul", "is.anbul|koln"):
        want = sorted(t for t in inv if re.fullmatch(pat, t))
        assert expand_regexp(r, pat, max_expansions=10**6) == want, pat
        got = search_regexp(r, pat, k=10, max_expansions=10**6)
        ref = search_exact(r, " ".join(want), 10) if want else []
        assert got == ref, pat


def test_regexp_max_expansions_keeps_largest_df(built_index, brute_force):
    from deces_dataprep_ray.index.query import expand_regexp

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)
    all_match = sorted(t for t in inv if re.fullmatch("term[0-9]+", t))
    assert len(all_match) > 8
    got = expand_regexp(r, "term[0-9]+", max_expansions=8)
    assert len(got) == 8
    # the kept 8 are the 8 largest-df matches (stable ties by scan order)
    dfs = sorted((len(inv[t]) for t in all_match), reverse=True)
    assert sorted((len(inv[t]) for t in got), reverse=True) == dfs[:8]


def test_more_like_this(built_index, brute_force):
    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.index.query import (
        more_like_this,
        search_exact,
        select_mlt_terms,
    )

    idx, _ = built_index
    inv, dls = brute_force
    r = IndexReader(idx)
    n_docs = len(dls)
    like = "term1 term1 term2 istanbul istanbul istanbul cafe nosuchtoken"
    tf = Counter(tokenize(like))
    scored = sorted(
        ((-cnt * _idf(n_docs, len(inv[t])), t)
         for t, cnt in tf.items() if t in inv),
    )
    want = sorted(t for _, t in scored[:3])
    assert select_mlt_terms(r, like, max_query_terms=3) == want
    got = more_like_this(r, like, k=10, max_query_terms=3)
    assert got == search_exact(r, " ".join(want), 10)
    # min_doc_freq prunes rare terms before selection
    rare_ok = select_mlt_terms(r, like, max_query_terms=10, min_doc_freq=1)
    common = select_mlt_terms(r, like, max_query_terms=10,
                              min_doc_freq=n_docs // 2)
    assert set(common) <= set(rare_ok)
    assert more_like_this(r, "nosuchtoken onlymissing", k=5) == []


# --- docvalue-backed serving: sort / collapse / function_score / aggs -------

@pytest.fixture(scope="module")
def dv_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("dvx")
    rng = np.random.default_rng(11)
    vocab = ["data", "spark", "window", "row", "join", "scan", "merge"]
    n = 90
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": [" ".join(rng.choice(vocab, rng.integers(3, 12)))
                 for _ in range(n)],
        "grp": [f"g{i % 7}" for i in range(n)],
        "band": [f"b{i % 3}" for i in range(n)],
        "rank_val": rng.permutation(n).astype("int64"),
        "nullable_val": [None if i % 4 == 0 else float(i % 13)
                         for i in range(n)],
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    return df, src


@pytest.fixture(scope="module")
def dv_index(dv_corpus, tmp_path_factory):
    df, src = dv_corpus
    idx = str(tmp_path_factory.mktemp("dvidx") / "index")
    build_index(src, idx, url_col="url", text_col="body",
                docvalue_fields={"grp": "grp", "band": "band",
                                 "rank_val": "rank_val",
                                 "nullable_val": "nullable_val"},
                num_buckets=4, salt_shards=2, head_min_df=1000,
                batch_size=16)
    return idx


def _did(df):
    return df["url"].map(doc_id_from_url)


def test_sort_by_field(dv_corpus, dv_index):
    from deces_dataprep_ray.index.fielded import RangeFilter, sort_by_field

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    pdf = pd.DataFrame({"doc_id": _did(df).astype("uint64"),
                        "rank_val": df["rank_val"]})
    for desc in (True, False):
        got = sort_by_field(r, "rank_val", k=7, descending=desc)
        want = pdf.sort_values(["rank_val", "doc_id"],
                               ascending=[not desc, True]).head(7)
        assert got["doc_id"].to_pylist() == want["doc_id"].tolist()
        assert got["rank_val"].to_pylist() == want["rank_val"].tolist()
    # filter context + null skipping
    got = sort_by_field(r, "nullable_val", k=5, descending=True,
                        filters=[RangeFilter("rank_val", lo=30)])
    sub = df[(df["rank_val"] >= 30) & df["nullable_val"].notna()].copy()
    sub["doc_id"] = _did(sub).astype("uint64")
    want = sub.sort_values(["nullable_val", "doc_id"],
                           ascending=[False, True]).head(5)
    assert got["doc_id"].to_pylist() == want["doc_id"].tolist()


def _brute_scores(df, query):
    from deces_dataprep_ray.functions.analysis import tokenize

    toks = [tokenize(t) for t in df["body"]]
    dls = np.array([len(t) for t in toks], float)
    n = len(df)
    avgdl = dls.mean()
    scores = np.zeros(n)
    for term in sorted(set(tokenize(query))):
        tf = np.array([t.count(term) for t in toks], float)
        dfreq = int((tf > 0).sum())
        if not dfreq:
            continue
        w = tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dls / avgdl))
        scores += _idf(n, dfreq) * w
    return scores


def test_collapse_topk(dv_corpus, dv_index):
    from deces_dataprep_ray.index.fielded import collapse_topk

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    scores = _brute_scores(df, "data spark")
    pdf = pd.DataFrame({"doc_id": _did(df).astype("uint64"),
                        "grp": df["grp"], "score": scores})
    pdf = pdf[pdf["score"] > 0]
    pdf = pdf.sort_values(["score", "doc_id"], ascending=[False, True])
    want = pdf.groupby("grp", sort=False).head(1).head(4)
    got = collapse_topk(r, "data spark", "grp", k=4, _key_chunk=8)
    assert [(d, k) for d, _, k in got] == list(
        zip(want["doc_id"], want["grp"]))
    np.testing.assert_allclose([s for _, s, _ in got], want["score"],
                               rtol=1e-9)


def test_function_score(dv_corpus, dv_index):
    from deces_dataprep_ray.index.fielded import function_score

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    base = _brute_scores(df, "data spark")
    vals = df["nullable_val"].to_numpy(float)  # NaN where missing
    for modifier, boost_mode in (("log1p", "multiply"), ("sqrt", "sum"),
                                 ("none", "multiply")):
        fv = np.where(np.isnan(vals), 2.5, vals) * 3.0
        fv = {"log1p": np.log1p, "sqrt": np.sqrt,
              "none": lambda x: x}[modifier](fv)
        want = base * fv if boost_mode == "multiply" else base + fv
        pdf = pd.DataFrame({"doc_id": _did(df).astype("uint64"),
                            "score": want})
        pdf = pdf[base > 0].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(6)
        got = function_score(r, "data spark", "nullable_val", k=6,
                             modifier=modifier, factor=3.0, missing=2.5,
                             boost_mode=boost_mode)
        assert [d for d, _ in got] == pdf["doc_id"].tolist()
        np.testing.assert_allclose([s for _, s in got], pdf["score"],
                                   rtol=1e-9)


def test_range_agg(dv_corpus, dv_index):
    from deces_dataprep_ray.index.aggs import range_agg

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    v = df["nullable_val"].dropna()
    ranges = [(None, 4.0), (4.0, 9.0), (9.0, None), (2.0, 20.0)]  # overlap ok
    got = range_agg(r, "nullable_val", ranges)
    assert got == [
        ("*-4", int((v < 4).sum())),
        ("4-9", int(((v >= 4) & (v < 9)).sum())),
        ("9-*", int((v >= 9).sum())),
        ("2-20", int(((v >= 2) & (v < 20)).sum())),
    ]


def test_filters_agg(dv_corpus, dv_index):
    from deces_dataprep_ray.index.aggs import filters_agg
    from deces_dataprep_ray.index.fielded import ExistsFilter, RangeFilter

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    got = filters_agg(r, {
        "has_val": ExistsFilter("nullable_val"),
        "high": RangeFilter("rank_val", lo=45),
    })
    assert got == {
        "has_val": int(df["nullable_val"].notna().sum()),
        "high": int((df["rank_val"] >= 45).sum()),
    }


def test_msearch_mixed_batch(built_index):
    from deces_dataprep_ray.index.query import (
        more_like_this,
        search_exact,
        search_phrase,
        search_wildcard,
    )
    from deces_dataprep_ray.index.service import QueryService

    idx, _ = built_index
    r = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        reqs = [
            {"type": "match", "query": "term1 term2", "k": 5,
             "algorithm": "exact"},
            {"type": "wildcard", "query": "term1?", "k": 5},
            {"type": "more_like_this", "query": "term1 istanbul istanbul",
             "k": 5, "max_query_terms": 2},
            {"type": "phrase", "query": "no positional index"},
            {"type": "bogus"},
        ]
        out = svc.msearch(reqs)
        assert out[0] == search_exact(r, "term1 term2", 5)
        assert out[1] == search_wildcard(r, "term1?", 5)
        assert out[2] == more_like_this(r, "term1 istanbul istanbul", 5,
                                        max_query_terms=2)
        # phrase on a non-positional index fails per-slot, not per-batch
        assert isinstance(out[3], dict) and "error" in out[3]
        assert isinstance(out[4], dict) and "error" in out[4]
    finally:
        svc.shutdown()


def test_terms_metric_agg(dv_corpus, dv_index):
    from deces_dataprep_ray.index.aggs import terms_metric_agg

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    got = terms_metric_agg(r, "grp", "nullable_val")
    for key, n, s, avg, mn, mx in got:
        sub = df[df["grp"] == key]["nullable_val"]
        assert n == len(sub)
        nn = sub.dropna()
        np.testing.assert_allclose(s, nn.sum())
        np.testing.assert_allclose(avg, nn.mean())
        assert mn == nn.min() and mx == nn.max()
    assert [g[0] for g in got] == sorted(df["grp"].unique())


@pytest.fixture(scope="module")
def pp_setup(tmp_path_factory):
    """Positional index with phrase-prefix-friendly vocabulary."""
    d = tmp_path_factory.mktemp("ppx")
    rng = np.random.default_rng(3)
    vocab = ["data", "spark", "sparse", "spill", "scan", "row", "join"]
    texts = [" ".join(rng.choice(vocab, rng.integers(4, 14)))
             for _ in range(100)]
    texts[5] = "data spark row"
    texts[8] = "data sparse join"
    texts[13] = "data spill data spark"
    df = pd.DataFrame({"url": [f"doc://{i}" for i in range(100)],
                       "text": texts})
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=1000,
                store_positions=True, batch_size=32)
    return df, idx


def test_search_phrase_prefix(pp_setup):
    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.index.query import (
        search_phrase,
        search_phrase_prefix,
    )

    df, idx = pp_setup
    r = IndexReader(idx)
    # brute force: max over expansions of the per-expansion phrase score
    exps = sorted({t for dt in (tokenize(x) for x in df["text"])
                   for t in dt if t.startswith("sp")})
    assert len(exps) >= 3
    best: dict[int, float] = {}
    for e in exps:
        for d, s in search_phrase(r, f"data {e}", k=100):
            if s > best.get(d, -1e18):
                best[d] = s
    want = sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = search_phrase_prefix(r, "data sp", k=10)
    assert got == want
    # ES-style: the bare prefix alone is a one-token phrase-prefix
    lone = search_phrase_prefix(r, "sp", k=5)
    assert lone  # matches docs holding any sp* token
    assert search_phrase_prefix(r, "data zzz", k=5) == []


def test_suggest_terms(built_index, brute_force):
    from deces_dataprep_ray.index.query import suggest_terms

    idx, _ = built_index
    inv, _ = brute_force
    r = IndexReader(idx)

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    for bad, md in (("istanbux", 1), ("trm1", 2), ("koln", 1)):
        want = sorted(
            ((lev(bad, t), -len(inv[t]), t) for t in inv
             if t != bad and lev(bad, t) <= md),
        )[:5]
        got = suggest_terms(r, bad, n=5, max_dist=md)
        assert got == [(t, d, -negdf) for d, negdf, t in want], bad
    assert suggest_terms(r, "zzzzzzzzzz", n=5, max_dist=1) == []


def test_composite_agg_pagination(dv_corpus, dv_index):
    from deces_dataprep_ray.index.aggs import composite_agg

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    truth = sorted(df.groupby("grp").size().items())
    pages, after = [], None
    while True:
        buckets, after = composite_agg(r, "grp", size=3, after=after)
        pages.extend(buckets)
        if after is None:
            break
    assert pages == [(k, int(n)) for k, n in truth]
    # a mid-stream cursor never re-ships earlier buckets
    b2, _ = composite_agg(r, "grp", size=2, after=truth[1][0])
    assert b2 == [(k, int(n)) for k, n in truth[2:4]]


def test_terms_terms_agg(dv_corpus, dv_index):
    from deces_dataprep_ray.index.aggs import terms_terms_agg

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    got = terms_terms_agg(r, "grp", "band")
    truth = sorted((o, i, int(n)) for (o, i), n in
                   df.groupby(["grp", "band"]).size().items())
    assert got == truth


def test_explain_matches_scorer(built_index):
    from deces_dataprep_ray.index.query import explain, search_exact

    idx, _ = built_index
    r = IndexReader(idx)
    res = search_exact(r, "term1 term2 istanbul", k=5)
    assert res
    for d, s in res:
        ex = explain(r, "term1 term2 istanbul", d)
        assert ex["matched"]
        np.testing.assert_allclose(ex["score"], s, rtol=1e-12)
        np.testing.assert_allclose(
            sum(t["contribution"] for t in ex["terms"]), s, rtol=1e-12)
    miss = explain(r, "zzznope", 12345)
    assert not miss["matched"] and miss["score"] == 0.0


def test_rescore_phrase_window(pp_setup):
    from deces_dataprep_ray.index.query import (
        rescore,
        search_exact,
        search_phrase,
    )

    df, idx = pp_setup
    r = IndexReader(idx)
    w = 50
    base = search_exact(r, "data spark", k=w)
    phrase = dict(search_phrase(r, "data spark", k=10**6))
    want = sorted(
        ((d, s + 2.0 * phrase.get(d, 0.0)) for d, s in base),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = rescore(r, "data spark", "data spark", k=10, window_size=w,
                  rescore_weight=2.0)
    assert [(d, round(s, 9)) for d, s in got] == \
        [(d, round(s, 9)) for d, s in want]
    # phrase docs outrank equal-BM25 non-phrase docs after rescoring
    assert any(d in phrase for d, _ in got)


def test_decay_score(dv_corpus, dv_index):
    from deces_dataprep_ray.index.fielded import decay_score

    df, _ = dv_corpus
    r = IndexReader(dv_index)
    base = _brute_scores(df, "data spark")
    vals = df["rank_val"].to_numpy(float)
    for shape in ("gauss", "exp", "linear"):
        d = np.maximum(0.0, np.abs(vals - 45.0) - 2.0)
        if shape == "gauss":
            s2 = -(20.0 ** 2) / (2 * np.log(0.5))
            m = np.exp(-(d * d) / (2 * s2))
        elif shape == "exp":
            m = np.exp(np.log(0.5) / 20.0 * d)
        else:
            s = 20.0 / 0.5
            m = np.maximum(0.0, (s - d) / s)
        want = base * m
        pdf = pd.DataFrame({"doc_id": _did(df).astype("uint64"),
                            "score": want})
        pdf = pdf[base > 0].sort_values(
            ["score", "doc_id"], ascending=[False, True]).head(6)
        got = decay_score(r, "data spark", "rank_val", origin=45.0,
                          scale=20.0, offset=2.0, decay=0.5, shape=shape,
                          k=6)
        assert [x for x, _ in got] == pdf["doc_id"].tolist(), shape
        np.testing.assert_allclose([s_ for _, s_ in got], pdf["score"],
                                   rtol=1e-9)
    # a doc at exactly origin+offset+scale scores decay x its BM25
    got = decay_score(r, "data spark", "rank_val", origin=0.0, scale=10.0,
                      decay=0.5, shape="gauss", k=90)
    by_id = dict(got)
    at = df[df["rank_val"] == 10]
    did = int(_did(at).iloc[0])
    if did in by_id:
        i = df.index[df["rank_val"] == 10][0]
        np.testing.assert_allclose(by_id[did], base[i] * 0.5, rtol=1e-9)


def test_alias_swap(dv_index, tmp_path, dv_corpus):
    from deces_dataprep_ray.index.alias import (
        delete_alias,
        list_aliases,
        resolve_alias,
        set_alias,
    )
    from deces_dataprep_ray.index.query import search_exact

    adir = str(tmp_path / "aliases")
    set_alias(adir, "live", dv_index)
    assert list_aliases(adir) == {"live": os.path.abspath(dv_index)}
    alias_name = os.path.join(adir, "live")
    assert resolve_alias(alias_name) == os.path.abspath(dv_index)
    # readers open through the alias and serve the target
    r = IndexReader(alias_name)
    assert search_exact(r, "data", 3)
    # atomic re-point: a second index (here: the same dir via a chained
    # alias) swaps in without a torn state
    set_alias(adir, "next", dv_index)
    set_alias(adir, "live", os.path.join(adir, "next"))  # alias → alias
    assert resolve_alias(alias_name) == os.path.abspath(dv_index)
    with pytest.raises(FileNotFoundError):
        set_alias(adir, "bad", str(tmp_path / "nonexistent"))
    assert delete_alias(adir, "next")
    with pytest.raises(FileNotFoundError):
        resolve_alias(os.path.join(adir, "next"))

"""Fielded index: per-field BM25, keyword/range/geo filters, docstore.

Oracle: an independent pure-Python per-field BM25 with per-field docCount
idf and per-field avgdl length norms (the frozen semantics mirrored by the
driver SQL oracles)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.functions.geo import haversine_km
from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.fielded import (
    GeoRadiusFilter,
    KeywordFilter,
    RangeFilter,
    search_fields,
)
from deces_dataprep_ray.index.query import idf
from deces_dataprep_ray.index.reader import IndexReader


@pytest.fixture(scope="module")
def fielded_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("fielded")
    rng = np.random.default_rng(5)
    vocab = ["data", "spark", "window", "row", "join", "scan", "merge",
             "café", "groupe"]
    n = 60
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": [" ".join(rng.choice(vocab, rng.integers(3, 12)))
                 for _ in range(n)],
        "title": [" ".join(rng.choice(vocab, 2)) if i % 5 else ""
                  for i in range(n)],
        "lang": [["en", "fr", "de"][i % 3] for i in range(n)],
        "nch": (np.arange(n) * 7) % 100,
        "lat": np.linspace(-60, 60, n),
        "lon": np.linspace(-120, 120, n),
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    return df, src


@pytest.fixture(scope="module")
def fielded_index(fielded_corpus, tmp_path_factory):
    df, src = fielded_corpus
    idx = str(tmp_path_factory.mktemp("fidx") / "index")
    build_index(src, idx,
                fields={"body": "body", "title": "title"},
                keyword_fields={"lang": "lang"},
                docvalue_fields={"nch": "nch", "lat": "lat", "lon": "lon"},
                num_buckets=4, salt_shards=2, head_min_df=1000,
                batch_size=16)
    return idx


def _brute(df, matches, k=10, keep=None):
    from deces_dataprep_ray.functions.analysis import tokenize

    cols = {"body": "body", "title": "title"}
    toks = {f: [tokenize(str(t)) for t in df[c]] for f, c in cols.items()}
    dls = {f: [len(t) for t in toks[f]] for f in toks}
    nf = {f: sum(1 for d in dls[f] if d > 0) for f in toks}
    avg = {f: (sum(dls[f]) / nf[f]) if nf[f] else 1.0 for f in toks}
    dids = [doc_id_from_url(u) for u in df["url"]]
    scores: dict[int, float] = {}
    for field, q in sorted(matches):
        for tok in sorted(set(tokenize(q))):
            pl = [(i, toks[field][i].count(tok)) for i in range(len(df))
                  if tok in toks[field][i]]
            if not pl:
                continue
            widf = idf(nf[field], len(pl))
            for i, tf in pl:
                w = tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[field][i] / avg[field]))
                scores[dids[i]] = scores.get(dids[i], 0.0) + widf * w
    if keep is not None:
        lookup = {dids[i]: i for i in range(len(df))}
        scores = {d: s for d, s in scores.items() if keep(lookup[d])}
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _cmp(got, want):
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]


def test_multi_field_match(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark"), ("title", "window")], k=10)
    _cmp(got, _brute(df, [("body", "data spark"), ("title", "window")]))


def test_per_field_stats_differ(fielded_corpus, fielded_index):
    # title is empty for every 5th doc: its docCount and avgdl differ from
    # body's — per-field stats must be independent
    r = IndexReader(fielded_index)
    assert r.field_stats["title"]["n_docs"] < r.field_stats["body"]["n_docs"]
    assert r.field_stats["lang"]["avgdl"] == 1.0


def test_keyword_filter(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[KeywordFilter("lang", "fr")])
    _cmp(got, _brute(df, [("body", "data spark")],
                     keep=lambda i: df["lang"][i] == "fr"))


def test_range_filter(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[RangeFilter("nch", 20, 60)])
    _cmp(got, _brute(df, [("body", "data spark")],
                     keep=lambda i: 20 <= df["nch"][i] <= 60))


def test_combined_filters(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[RangeFilter("nch", hi=80),
                                 KeywordFilter("lang", "en")])
    _cmp(got, _brute(df, [("body", "data spark")],
                     keep=lambda i: df["nch"][i] <= 80 and df["lang"][i] == "en"))


def test_geo_filter(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=60,
                        filters=[GeoRadiusFilter("lat", "lon", 0.0, 0.0,
                                                 3000.0)])
    want = _brute(df, [("body", "data spark")], k=60,
                  keep=lambda i: haversine_km(df["lat"][i], df["lon"][i],
                                              0.0, 0.0) <= 3000.0)
    _cmp(got, want)


def test_docstore_lookup(fielded_corpus, fielded_index):
    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    dids = [doc_id_from_url(u) for u in df["url"][:7]]
    urls = r.resolve_urls(dids)
    assert urls == {d: u for d, u in zip(dids, df["url"][:7])}
    # typed columns come back from the same binary-searched lookup
    tbl = r.docstore.lookup(dids[:3], ["nch"])
    assert set(tbl.column_names) == {"doc_id", "nch"}
    assert tbl.num_rows == 3


def test_fielded_resume(fielded_corpus, fielded_index, tmp_path):
    # a rebuilt (resumed) fielded index answers identically
    df, src = fielded_corpus
    r1 = IndexReader(fielded_index)
    build_index(src, fielded_index,
                fields={"body": "body", "title": "title"},
                keyword_fields={"lang": "lang"},
                docvalue_fields={"nch": "nch", "lat": "lat", "lon": "lon"},
                num_buckets=4, salt_shards=2, head_min_df=1000,
                batch_size=16)
    r2 = IndexReader(fielded_index)
    q = [("body", "data spark window"), ("title", "café")]
    assert search_fields(r1, q, k=10) == search_fields(r2, q, k=10)


def test_fielded_head_compaction(fielded_corpus, tmp_path):
    # head compaction must preserve fielded results (per-field avgdl in
    # block-max weights)
    df, src = fielded_corpus
    from deces_dataprep_ray.index.build import build_index, compact_head_segments

    idx = str(tmp_path / "cidx")
    build_index(src, idx,
                fields={"body": "body", "title": "title"},
                keyword_fields={"lang": "lang"},
                num_buckets=4, salt_shards=2, head_min_df=10,  # force heads
                batch_size=16)
    r1 = IndexReader(idx)
    assert r1.head_terms, "fixture should produce head terms at min_df=10"
    q = [("body", "data spark window"), ("title", "café")]
    before = search_fields(r1, q, k=10)
    compact_head_segments(idx)
    r2 = IndexReader(idx)
    assert r2.head_compacted
    assert search_fields(r2, q, k=10) == before


def test_pruned_matches_exact_fielded(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import search_fields_pruned

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    cases = [
        ([("body", "data spark window"), ("title", "café")], None),
        ([("body", "join scan merge row")], None),
        ([("body", "data spark")], [KeywordFilter("lang", "en")]),
        ([("body", "data spark")], [RangeFilter("nch", 20, 60)]),
        ([("body", "groupe café")], [KeywordFilter("lang", "fr"),
                                     RangeFilter("nch", hi=90)]),
    ]
    for matches, filters in cases:
        exact = search_fields(r, matches, k=10, filters=filters)
        pruned = search_fields_pruned(r, matches, k=10, filters=filters)
        assert pruned == exact, (matches, filters)
        via_param = search_fields(r, matches, k=10, filters=filters,
                                  algorithm="pruned")
        assert via_param == exact


def test_service_fielded(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.service import QueryService

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    svc = QueryService(fielded_index, num_workers=2)
    try:
        m = [("body", "data spark"), ("title", "window")]
        f = [KeywordFilter("lang", "en")]
        assert svc.search_fields(m, k=5, filters=f) == \
               search_fields(r, m, k=5, filters=f)
    finally:
        svc.shutdown()


def test_facet_counts(fielded_corpus, fielded_index):
    from collections import Counter

    from deces_dataprep_ray.index.fielded import facet_counts

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = facet_counts(r, "lang")
    want = sorted(Counter(df["lang"]).items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == want
    assert facet_counts(r, "lang", top_n=1) == want[:1]
    assert facet_counts(r, "nonexistent_field") == []


def test_not_keyword_filter(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import NotKeywordFilter

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[NotKeywordFilter("lang", "fr")])
    _cmp(got, _brute(df, [("body", "data spark")],
                     keep=lambda i: df["lang"][i] != "fr"))
    # excluding a nonexistent value is a no-op
    got2 = search_fields(r, [("body", "data spark")], k=10,
                         filters=[NotKeywordFilter("lang", "xx")])
    _cmp(got2, _brute(df, [("body", "data spark")]))


def test_field_scoped_fuzzy_prefix(fielded_corpus, fielded_index):
    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.index.query import (
        expand_fuzzy,
        expand_prefix,
        search_fuzzy,
        search_prefix,
    )

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    body_vocab = {t for txt in df["body"] for t in tokenize(str(txt))}
    # fuzzy expansion scoped to body's bare tokens
    assert expand_fuzzy(r, "scam", max_dist=1, field="body",
                        max_expansions=10**6) == ["scan"]
    # prefix expansion scoped per field (including keyword fields)
    want = sorted(t for t in body_vocab if t.startswith("s"))
    assert expand_prefix(r, "s", field="body") == want
    assert expand_prefix(r, "f", field="lang") == ["fr"]
    assert expand_prefix(r, "zz", field="body") == []
    # field-scoped search == search_fields over the expanded token set
    assert search_fuzzy(r, "scam", 10, field="body") == \
        search_fields(r, [("body", "scan")], 10)
    assert search_prefix(r, "me*", 10, field="body") == \
        search_fields(r, [("body", "merge")], 10)


def test_must_not_never_scans_docstore(fielded_corpus, fielded_index,
                                       monkeypatch):
    # the lazy must_not drops excluded docs from the scored set by postings
    # membership — the docvalues store must NOT be read (no O(corpus) scan
    # per query at 10^12 docs)
    from deces_dataprep_ray.index import docstore as ds_mod
    from deces_dataprep_ray.index.fielded import (
        NotKeywordFilter,
        search_fields_pruned,
    )

    def boom(*a, **k):
        raise AssertionError("must_not filter touched the docstore")

    monkeypatch.setattr(ds_mod.DocStore, "scan", boom)
    monkeypatch.setattr(ds_mod.DocStore, "lookup", boom)
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[NotKeywordFilter("lang", "fr")])
    assert got  # still answers
    assert search_fields_pruned(r, [("body", "data spark")], k=10,
                                filters=[NotKeywordFilter("lang", "fr")]) \
        == got


def test_build_config_validation(fielded_corpus, tmp_path):
    df, src = fielded_corpus
    idx = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="reserved"):
        build_index(src, idx, fields={"body": "body"},
                    docvalue_fields={"dl": "nch"})
    with pytest.raises(ValueError, match="reserved"):
        build_index(src, idx, fields={"body": "body"},
                    docvalue_fields={"dl__body": "nch"})
    with pytest.raises(ValueError, match="disjoint"):
        build_index(src, idx, fields={"lang": "lang"},
                    keyword_fields={"lang": "lang"})
    with pytest.raises(ValueError, match="':'"):
        build_index(src, idx, fields={"bo:dy": "body"})


def test_boosted_clauses(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import search_fields_pruned

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    m = [("body", "data spark", 2.0), ("title", "window", 0.5)]
    got = search_fields(r, m, k=10)
    # brute with per-clause boost: scale each clause's contributions
    base_b = _brute(df, [("body", "data spark")], k=10**6)
    base_t = _brute(df, [("title", "window")], k=10**6)
    agg: dict[int, float] = {}
    for d, s in base_b:
        agg[d] = agg.get(d, 0.0) + 2.0 * s
    for d, s in base_t:
        agg[d] = agg.get(d, 0.0) + 0.5 * s
    want = sorted(agg.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]
    # pruned path scales identically
    assert search_fields_pruned(r, m, k=10) == got


def test_dis_max(fielded_corpus, fielded_index):
    """dis_max == max clause score + tie_breaker * rest; tie=1.0 == the
    bool-should sum (search_fields)."""
    from deces_dataprep_ray.index.fielded import search_dis_max

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    clauses = [("body", "data spark"), ("title", "data window")]
    per = [dict(_brute(df, [c], k=10**6)) for c in clauses]
    docs = set().union(*per)
    for tie in (0.0, 0.3, 1.0):
        got = search_dis_max(r, clauses, k=10, tie_breaker=tie)
        want = []
        for d in docs:
            ss = [p.get(d, 0.0) for p in per]
            b = max(ss)
            want.append((d, b + tie * (sum(ss) - b)))
        want = sorted(want, key=lambda kv: (-kv[1], kv[0]))[:10]
        _cmp(got, want)
    # tie_breaker=1.0 degenerates to the should-sum
    _cmp(search_dis_max(r, clauses, k=10, tie_breaker=1.0),
         search_fields(r, clauses, k=10))


def test_dis_max_boost_and_filter(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import search_dis_max

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    clauses = [("body", "data spark", 2.0), ("title", "data window", 0.5)]
    per = []
    for f, q, bst in clauses:
        per.append({d: bst * s for d, s in _brute(df, [(f, q)], k=10**6)})
    keep = lambda i: df["lang"][i] == "en"  # noqa: E731
    dids = [doc_id_from_url(u) for u in df["url"]]
    lookup = {dids[i]: i for i in range(len(df))}
    docs = {d for p in per for d in p if keep(lookup[d])}
    want = []
    for d in docs:
        ss = [p.get(d, 0.0) for p in per]
        want.append((d, max(ss) + 0.4 * (sum(ss) - max(ss))))
    want = sorted(want, key=lambda kv: (-kv[1], kv[0]))[:10]
    got = search_dis_max(r, clauses, k=10, tie_breaker=0.4,
                         filters=[KeywordFilter("lang", "en")])
    _cmp(got, want)


def test_terms_filter(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import TermsFilter

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[TermsFilter("lang", ["fr", "de"])])
    _cmp(got, _brute(df, [("body", "data spark")],
                     keep=lambda i: df["lang"][i] in ("fr", "de")))
    # empty / unknown values -> empty allow-set -> no hits
    assert search_fields(r, [("body", "data spark")], k=10,
                         filters=[TermsFilter("lang", ["xx"])]) == []


def test_exists_filter(tmp_path):
    """exists over a NULLABLE docvalue column (ES missing-field semantics)."""
    from deces_dataprep_ray.index.fielded import ExistsFilter

    rng = np.random.default_rng(11)
    vocab = ["data", "spark", "window", "row"]
    n = 30
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": [" ".join(rng.choice(vocab, rng.integers(3, 8)))
                 for _ in range(n)],
        "title": [""] * n,
        "opt": [float(i) if i % 3 else None for i in range(n)],
    })
    src = str(tmp_path / "src.parquet")
    df.to_parquet(src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, fields={"body": "body"},
                docvalue_fields={"opt": "opt"},
                num_buckets=2, salt_shards=2, head_min_df=1000,
                batch_size=16)
    r = IndexReader(idx)
    got = search_fields(r, [("body", "data spark")], k=10,
                        filters=[ExistsFilter("opt")])
    want = _brute(df, [("body", "data spark")],
                  keep=lambda i: df["opt"][i] is not None
                  and not pd.isna(df["opt"][i]))
    _cmp(got, want)
    assert got, "fixture should produce hits"


def test_cross_fields_matches_bruteforce(fielded_corpus, fielded_index):
    """cross_fields semantics vs an independent brute force: blended df =
    max over fields, N = max field docCount, per-doc weight = best field's
    tf-norm — a term in BOTH fields must count once, not twice."""
    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.index.fielded import search_cross_fields

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    query = "data spark window"

    cols = {"body": "body", "title": "title"}
    toks = {f: [tokenize(str(t)) for t in df[c]] for f, c in cols.items()}
    dls = {f: [len(t) for t in toks[f]] for f in toks}
    nf = {f: sum(1 for d in dls[f] if d > 0) for f in toks}
    avg = {f: (sum(dls[f]) / nf[f]) if nf[f] else 1.0 for f in toks}
    dids = [doc_id_from_url(u) for u in df["url"]]
    n_blend = max(nf.values())
    scores: dict[int, float] = {}
    for term in sorted(set(tokenize(query))):
        dfs = {f: sum(1 for t in toks[f] if term in t) for f in toks}
        if max(dfs.values()) == 0:
            continue
        widf = idf(n_blend, max(dfs.values()))
        for i in range(len(df)):
            best = 0.0
            for f in toks:
                tf = toks[f][i].count(term)
                if tf:
                    w = tf / (tf + 1.2 * (1 - 0.75
                                          + 0.75 * dls[f][i] / avg[f]))
                    best = max(best, w)
            if best > 0.0:
                scores[dids[i]] = scores.get(dids[i], 0.0) + widf * best
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = search_cross_fields(r, ["body", "title"], query, k=10)
    _cmp(got, want)
    # sanity: differs from the bool-should sum on a both-fields term
    summed = search_fields(r, [("body", query), ("title", query)], k=10)
    assert got != summed

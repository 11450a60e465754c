"""Round-4 surfaces: span_near / boosting / bool_prefix / constant_score /
query_string / top_hits / pipeline aggs / hash split / packing / components.

Oracles: independent pure-Python brute force over tiny synthetic corpora
(same pattern as test_fielded / test_query_extra)."""

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


@pytest.fixture(scope="module")
def pos_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("r4pos")
    rng = np.random.default_rng(11)
    vocab = ["data", "spark", "window", "scan", "merge", "key", "winter",
             "wind", "row"]
    n = 80
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 14))) for _ in range(n)]
    df = pd.DataFrame({"url": [f"doc://{i}" for i in range(n)], "text": texts})
    src = str(d / "c.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=1000,
                store_positions=True, batch_size=16)
    return df, idx


def _bm25(df, terms):
    """{doc_id: OR-BM25 sum over terms} with the engine's formula."""
    toks = [tokenize(t) for t in df["text"]]
    dls = [len(t) for t in toks]
    n = len(df)
    avg = sum(dls) / n
    dids = [doc_id_from_url(u) for u in df["url"]]
    out = {}
    for term in sorted(set(terms)):
        pl = [(i, toks[i].count(term)) for i in range(n) if term in toks[i]]
        if not pl:
            continue
        w = _idf(n, len(pl))
        for i, tf in pl:
            out[dids[i]] = out.get(dids[i], 0.0) + w * tf / (
                tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg))
    return out, toks, dids


def _cmp(got, want_scores, k=10):
    want = sorted(want_scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]


def test_span_near_unordered(pos_corpus):
    from deces_dataprep_ray.index.query import search_span_near

    df, idx = pos_corpus
    r = IndexReader(idx)
    for slop in (0, 2, 5):
        got = search_span_near(r, ["data", "window"], k=10, slop=slop)
        scores, toks, dids = _bm25(df, ["data", "window"])
        keep = {}
        for i in range(len(df)):
            pos_a = [p for p, t in enumerate(toks[i]) if t == "data"]
            pos_b = [p for p, t in enumerate(toks[i]) if t == "window"]
            if pos_a and pos_b and min(
                    abs(a - b) for a in pos_a for b in pos_b) - 1 <= slop:
                keep[dids[i]] = scores[dids[i]]
        _cmp(got, keep)


def test_span_near_in_order_delegates(pos_corpus):
    from deces_dataprep_ray.index.query import search_phrase, search_span_near

    _, idx = pos_corpus
    r = IndexReader(idx)
    assert search_span_near(r, ["data", "window"], k=10, slop=2,
                            in_order=True) == \
        search_phrase(r, "data window", 10, slop=2)


def test_boosting(pos_corpus):
    from deces_dataprep_ray.index.query import search_boosting

    df, idx = pos_corpus
    r = IndexReader(idx)
    got = search_boosting(r, "data spark", "key", k=10, negative_boost=0.3)
    scores, toks, dids = _bm25(df, ["data", "spark"])
    byid = {dids[i]: i for i in range(len(df))}
    want = {d: (s * 0.3 if "key" in toks[byid[d]] else s)
            for d, s in scores.items()}
    _cmp(got, want)


def test_bool_prefix(pos_corpus):
    from deces_dataprep_ray.index.query import search_bool_prefix

    df, idx = pos_corpus
    r = IndexReader(idx)
    got = search_bool_prefix(r, "data spark win", k=10, max_expansions=4096)
    scores, toks, dids = _bm25(df, ["data", "spark"])
    want = dict(scores)
    for i in range(len(df)):
        if any(t.startswith("win") for t in toks[i]):
            want[dids[i]] = want.get(dids[i], 0.0) + 1.0
    _cmp(got, want)


def test_query_string(pos_corpus):
    from deces_dataprep_ray.index.query import (
        parse_query_string,
        search_query_string,
    )

    parsed = parse_query_string('"data spark" window -key')
    assert parsed == {"should": ["window"], "must_not": ["key"],
                      "phrases": ["data spark"]}
    with pytest.raises(ValueError):
        parse_query_string('-"no negated phrases"')

    df, idx = pos_corpus
    r = IndexReader(idx)
    got = search_query_string(r, '"data spark" window -key', k=10)
    scores, toks, dids = _bm25(df, ["data", "spark", "window"])
    byid = {dids[i]: i for i in range(len(df))}
    want = {}
    for d, s in scores.items():
        t = toks[byid[d]]
        has_phrase = any(a == "data" and b == "spark"
                         for a, b in zip(t, t[1:]))
        if has_phrase and "key" not in t:
            want[d] = s
    _cmp(got, want)


@pytest.fixture(scope="module")
def fielded_corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("r4fld")
    rng = np.random.default_rng(5)
    vocab = ["data", "spark", "window", "row", "join", "scan"]
    n = 60
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": [" ".join(rng.choice(vocab, rng.integers(3, 12)))
                 for _ in range(n)],
        "lang": [["en", "fr", "de"][i % 3] for i in range(n)],
        "nch": (np.arange(n) * 7) % 100,
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    return df, src


@pytest.fixture(scope="module")
def fielded_index(fielded_corpus, tmp_path_factory):
    df, src = fielded_corpus
    idx = str(tmp_path_factory.mktemp("r4fidx") / "index")
    build_index(src, idx,
                fields={"body": "body"},
                keyword_fields={"lang": "lang"},
                docvalue_fields={"nch": "nch", "lang": "lang"},
                num_buckets=4, salt_shards=2, head_min_df=1000,
                batch_size=16)
    return idx


def test_constant_score(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.fielded import (
        KeywordFilter,
        RangeFilter,
        constant_score,
    )

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    got = constant_score(r, [KeywordFilter("lang", "fr"),
                             RangeFilter("nch", 10, 60)], k=10**6, boost=2.0)
    dids = sorted(doc_id_from_url(u)
                  for u, lg, nc in zip(df["url"], df["lang"], df["nch"])
                  if lg == "fr" and 10 <= nc <= 60)
    assert got == [(d, 2.0) for d in dids]
    with pytest.raises(ValueError):
        constant_score(r, [], k=5)


def test_top_hits_and_pipeline_aggs(fielded_corpus, fielded_index):
    from deces_dataprep_ray.index.aggs import bucket_pipeline_agg, top_hits_agg

    df, _ = fielded_corpus
    r = IndexReader(fielded_index)
    rows = top_hits_agg(r, "lang", "nch", n_per_bucket=2, descending=True,
                        tie_column="url")
    # brute force: per lang, top-2 by (nch desc, url asc)
    pdf = df.assign(did=[doc_id_from_url(u) for u in df["url"]])
    want = []
    for lang in sorted(pdf["lang"].unique()):
        sub = pdf[pdf["lang"] == lang].sort_values(
            ["nch", "url"], ascending=[False, True]).head(2)
        want.extend((lang, int(d), float(v))
                    for d, v in zip(sub["did"], sub["nch"]))
    assert rows == want

    out = bucket_pipeline_agg(r, "lang", "nch", metric="avg")
    want_avg = pdf.groupby("lang")["nch"].mean().mean()
    assert abs(out["avg"] - want_avg) < 1e-9
    mx = bucket_pipeline_agg(r, "lang", "nch", metric="max")
    g = pdf.groupby("lang")["nch"].mean()
    assert mx["max"] == pytest.approx(g.max())
    assert mx["keys"] == sorted(g[g == g.max()].index)


def test_hash_split_fractions_and_stability():
    import hashlib

    from deces_dataprep_ray.stages.text import HashSplit

    st = HashSplit(key_col="k", salt="s1",
                   fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    keys = list(range(20_000))
    out = st(pa.table({"k": keys}))
    labels = out["split"].to_pylist()
    frac = {x: labels.count(x) / len(labels) for x in set(labels)}
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01
    assert abs(frac["test"] - 0.1) < 0.01
    # per-key stability: same label regardless of batch composition
    again = st(pa.table({"k": keys[5000:5010]}))["split"].to_pylist()
    assert again == labels[5000:5010]
    # frozen hash contract (the SQL oracle's md5 formula)
    h = hashlib.md5(b"s1" + b"123").hexdigest()[:8]
    want = "train" if h <= "cccccccc" else ("val" if h <= "e6666666"
                                            else "test")
    assert labels[123] == want


def test_pack_sequences_matches_window_cumsum():
    from deces_dataprep_ray.stages.text import pack_sequences

    rng = np.random.default_rng(4)
    n = 300
    texts = [" ".join(rng.choice(["a", "bb", "ccc"], rng.integers(1, 40)))
             for _ in range(n)]
    ids = np.arange(0, 3 * n, 3)  # non-contiguous ids
    ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    out = pack_sequences(ds, budget=100, range_size=37).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    ntok = np.array([len(tokenize(t)) for t in texts])
    excl = np.cumsum(ntok) - ntok
    assert (out["doc_id"].to_numpy() == ids).all()
    assert (out["n_tokens"].to_numpy() == ntok).all()
    assert (out["bin"].to_numpy() == excl // 100).all()


def test_duplicate_components_vs_bfs():
    from deces_dataprep_ray.stages.dedup import duplicate_components

    # two chains + a singleton pair + isolated nodes not in any pair
    pairs = pd.DataFrame({
        "id_a": [1, 2, 3, 10, 11, 50],
        "id_b": [2, 3, 4, 11, 12, 51],
    })
    got = duplicate_components(rd.from_pandas(pairs)).to_pandas()
    got = dict(zip(got["doc_id"].astype(int), got["component"].astype(int)))
    # BFS oracle
    from collections import defaultdict, deque

    adj = defaultdict(set)
    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for start in adj:
        if start in want:
            continue
        comp, q, seen = [], deque([start]), {start}
        while q:
            u = q.popleft()
            comp.append(u)
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    q.append(v)
        m = min(comp)
        for u in comp:
            want[u] = m
    assert got == want


def test_duplicate_components_empty():
    from deces_dataprep_ray.stages.dedup import duplicate_components

    pairs = rd.from_pandas(pd.DataFrame({
        "id_a": pd.Series([], dtype=np.int64),
        "id_b": pd.Series([], dtype=np.int64)}))
    assert duplicate_components(pairs).count() == 0


def test_msearch_dispatches_round4_types(pos_corpus):
    from deces_dataprep_ray.index.query import (
        search_bool_prefix,
        search_boosting,
        search_query_string,
        search_span_near,
    )
    from deces_dataprep_ray.index.service import QueryService

    df, idx = pos_corpus
    r = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        out = svc.msearch([
            {"type": "span_near", "terms": ["data", "window"], "slop": 3},
            {"type": "boosting", "positive": "data spark",
             "negative": "key", "negative_boost": 0.3},
            {"type": "bool_prefix", "query": "data spark win",
             "max_expansions": 4096},
            {"type": "query_string", "query": '"data spark" window -key'},
            {"type": "span_near"},  # missing required key -> error slot
        ])
        assert out[0] == search_span_near(r, ["data", "window"], 10, slop=3)
        assert out[1] == search_boosting(r, "data spark", "key", 10,
                                         negative_boost=0.3)
        assert out[2] == search_bool_prefix(r, "data spark win", 10,
                                            max_expansions=4096)
        assert out[3] == search_query_string(r, '"data spark" window -key')
        assert "error" in out[4]  # per-slot isolation, batch survives
    finally:
        svc.shutdown()

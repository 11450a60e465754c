"""Positional index + phrase queries vs an independent brute force."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.functions.analysis import tokenize
from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index, compact_head_segments
from deces_dataprep_ray.index.query import idf, search_phrase
from deces_dataprep_ray.index.reader import IndexReader

N = 120


@pytest.fixture(scope="module")
def phrase_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("phrase")
    rng = np.random.default_rng(7)
    vocab = ["data", "spark", "window", "row", "join", "scan", "café"]
    texts = [" ".join(rng.choice(vocab, rng.integers(4, 15)))
             for _ in range(N)]
    texts[3] = "row data spark window join"
    texts[9] = "data spark data spark scan"
    texts[11] = "café data spark"
    df = pd.DataFrame({"url": [f"doc://{i}" for i in range(N)],
                       "text": texts})
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=40,
                store_positions=True, batch_size=32)
    return df, idx


def _brute_phrase(df, phrase, k=10):
    toks = tokenize(phrase)
    docs_tokens = [tokenize(t) for t in df["text"]]
    dls = [len(dt) for dt in docs_tokens]
    avg = sum(dls) / len(df)
    out = []
    for i, dt in enumerate(docs_tokens):
        if not any(dt[s: s + len(toks)] == toks
                   for s in range(len(dt) - len(toks) + 1)):
            continue
        sc = 0.0
        for t in sorted(set(toks)):
            dfreq = sum(1 for x in docs_tokens if t in x)
            tf = dt.count(t)
            sc += idf(len(df), dfreq) * (
                tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg)))
        out.append((doc_id_from_url(df["url"][i]), sc))
    return sorted(out, key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("phrase", [
    "data spark", "spark data", "data spark window",
    "row data spark window join", "café data", "window café",
])
def test_phrase_matches_bruteforce(phrase_setup, phrase):
    df, idx = phrase_setup
    r = IndexReader(idx)
    got = search_phrase(r, phrase, 10)
    want = _brute_phrase(df, phrase)
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want], phrase


def test_phrase_with_head_terms(phrase_setup):
    # head_min_df=40 makes the hot vocab head-salted: positions must survive
    # segment routing (each doc's positions live in its doc-range segment)
    df, idx = phrase_setup
    r = IndexReader(idx)
    assert r.head_terms, "fixture should produce salted head terms"
    head = sorted(r.head_terms)[0]
    got = search_phrase(r, f"{head} data", 10)
    want = _brute_phrase(df, f"{head} data")
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]


def test_positions_roundtrip_via_reader(phrase_setup):
    df, idx = phrase_setup
    r = IndexReader(idx)
    docs, tfs, dls, flat, off = r.postings_with_positions("data")
    dids = {doc_id_from_url(u): i for i, u in enumerate(df["url"])}
    for pi in range(len(docs)):
        want = [j for j, t in enumerate(tokenize(df["text"][dids[int(docs[pi])]]))
                if t == "data"]
        got = flat[off[pi]: off[pi + 1]].tolist()
        assert got == want


def test_non_positional_index_refuses(built_index):
    idx, _ = built_index
    r = IndexReader(idx)
    with pytest.raises(ValueError):
        r.postings_with_positions("term1")


def test_positional_head_compaction_preserves_phrases(phrase_setup, tmp_path):
    # compaction re-encodes head terms' postings AND position streams into
    # head/part.parquet — phrase results must be byte-identical before/after
    import shutil as _sh

    df, idx = phrase_setup
    cidx = str(tmp_path / "cidx")
    _sh.copytree(idx, cidx)
    r1 = IndexReader(cidx)
    assert r1.head_terms, "fixture should produce salted head terms"
    head = sorted(r1.head_terms)[0]
    queries = [(f"{head} data", 0), ("data spark", 0), ("data window", 2)]
    before = [search_phrase(r1, q, 50, slop=s) for q, s in queries]
    n = compact_head_segments(cidx)
    assert n > 0
    r2 = IndexReader(cidx)
    assert r2.head_compacted
    after = [search_phrase(r2, q, 50, slop=s) for q, s in queries]
    assert after == before


# --- fielded × positional: phrase on one field of a per-field mapping ------

@pytest.fixture(scope="module")
def fielded_phrase_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("fldphrase")
    rng = np.random.default_rng(17)
    vocab = ["data", "spark", "window", "row", "join", "scan", "café"]
    n = 100
    body = [" ".join(rng.choice(vocab, rng.integers(4, 15)))
            for _ in range(n)]
    body[3] = "row data spark window join"
    body[9] = "data spark data spark scan"
    title = [" ".join(rng.choice(vocab, 3)) if i % 4 else ""
             for i in range(n)]
    title[5] = "data spark window"
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": body, "title": title,
        "lang": [["en", "fr"][i % 2] for i in range(n)],
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx,
                fields={"body": "body", "title": "title"},
                keyword_fields={"lang": "lang"},
                store_positions=True,
                num_buckets=4, salt_shards=2, head_min_df=40, batch_size=32)
    return df, idx


def _brute_field_phrase(df, field, phrase, k=10, slop=0):
    """Independent per-field phrase + per-field-stats BM25 oracle."""
    toks = tokenize(phrase)
    docs_tokens = [tokenize(str(t)) for t in df[field]]
    dls = [len(dt) for dt in docs_tokens]
    nf = sum(1 for d in dls if d > 0)
    avg = (sum(dls) / nf) if nf else 1.0
    out = []
    for i, dt in enumerate(docs_tokens):
        if not _brute_slop_match(dt, toks, slop):
            continue
        sc = 0.0
        for t in sorted(set(toks)):
            dfreq = sum(1 for x in docs_tokens if t in x)
            tf = dt.count(t)
            sc += idf(nf, dfreq) * (
                tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dls[i] / avg)))
        out.append((doc_id_from_url(df["url"][i]), sc))
    return sorted(out, key=lambda kv: (-kv[1], kv[0]))[:k]


@pytest.mark.parametrize("field,phrase,slop", [
    ("body", "data spark", 0),
    ("body", "spark data", 0),
    ("body", "data spark window", 0),
    ("body", "data window", 2),
    ("title", "data spark", 0),
    ("title", "spark window", 1),
    ("title", "café data", 0),
])
def test_fielded_phrase_matches_bruteforce(fielded_phrase_setup, field,
                                           phrase, slop):
    df, idx = fielded_phrase_setup
    r = IndexReader(idx)
    got = search_phrase(r, phrase, 10, slop=slop, field=field)
    want = _brute_field_phrase(df, field, phrase, slop=slop)
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want], (field, phrase, slop)


def test_fielded_phrase_fields_are_independent(fielded_phrase_setup):
    # a phrase adjacent in body but not in title must only match via body
    df, idx = fielded_phrase_setup
    r = IndexReader(idx)
    b = {d for d, _ in search_phrase(r, "data spark", 1000, field="body")}
    t = {d for d, _ in search_phrase(r, "data spark", 1000, field="title")}
    assert b != t  # fixture guarantees differing doc sets
    want_t = {d for d, _ in _brute_field_phrase(df, "title", "data spark",
                                                k=10**6)}
    assert t == want_t


def test_fielded_phrase_unknown_field_empty(fielded_phrase_setup):
    _, idx = fielded_phrase_setup
    r = IndexReader(idx)
    assert search_phrase(r, "data spark", 10, field="nope") == []


def test_phrase_with_filters(fielded_phrase_setup):
    # bool query: match_phrase must + keyword filter context (the
    # reference's dominant query shape composed with phrase)
    from deces_dataprep_ray.index.fielded import (
        KeywordFilter,
        NotKeywordFilter,
    )
    from deces_dataprep_ray.index.service import QueryService

    df, idx = fielded_phrase_setup
    r = IndexReader(idx)
    unfiltered = _brute_field_phrase(df, "body", "data spark", k=10**6)
    lang = {doc_id_from_url(u): l for u, l in zip(df["url"], df["lang"])}

    got = search_phrase(r, "data spark", 1000, field="body",
                        filters=[KeywordFilter("lang", "en")])
    want = [(d, s) for d, s in unfiltered if lang[d] == "en"][:1000]
    assert [(d, round(s, 9)) for d, s in got] == \
           [(d, round(s, 9)) for d, s in want]

    got2 = search_phrase(r, "data spark", 1000, field="body",
                         filters=[NotKeywordFilter("lang", "en")])
    want2 = [(d, s) for d, s in unfiltered if lang[d] != "en"][:1000]
    assert [(d, round(s, 9)) for d, s in got2] == \
           [(d, round(s, 9)) for d, s in want2]

    # the serving pool forwards field= and filters=
    svc = QueryService(idx, num_workers=2)
    try:
        assert svc.search_phrase("data spark", 1000, field="body",
                                 filters=[KeywordFilter("lang", "en")]) \
            == got
    finally:
        svc.shutdown()


def test_fielded_positional_resume(fielded_phrase_setup):
    # resuming the fielded positional build answers identically
    df, idx = fielded_phrase_setup
    r1 = IndexReader(idx)
    before = search_phrase(r1, "data spark", 10, field="body")
    src = os.path.join(os.path.dirname(idx), "src.parquet")
    build_index(src, idx,
                fields={"body": "body", "title": "title"},
                keyword_fields={"lang": "lang"},
                store_positions=True,
                num_buckets=4, salt_shards=2, head_min_df=40, batch_size=32)
    assert search_phrase(IndexReader(idx), "data spark", 10,
                         field="body") == before


def _brute_slop_match(dt, toks, slop):
    # independent DP: best[j] = min cumulative gap for a chain ending with
    # token j at the current scan position
    INF = 10**9
    best_prev = [INF] * len(dt)  # chains of toks[0] ending at index i
    for i, t in enumerate(dt):
        if t == toks[0]:
            best_prev[i] = 0
    for j in range(1, len(toks)):
        best = [INF] * len(dt)
        run = INF  # min over f<i of best_prev[f] - f
        for i, t in enumerate(dt):
            if i > 0 and best_prev[i - 1] < INF:
                run = min(run, best_prev[i - 1] - (i - 1))
            if t == toks[j] and run < INF:
                best[i] = i - 1 + run
        best_prev = best
    return any(v <= slop for v in best_prev)


@pytest.mark.parametrize("phrase,slop", [
    ("data window", 1), ("data spark", 2), ("row spark join", 3),
    ("data join", 0),
])
def test_phrase_slop_matches_bruteforce(phrase_setup, phrase, slop):
    from deces_dataprep_ray.index.query import search_phrase

    df, idx = phrase_setup
    r = IndexReader(idx)
    got = {d for d, _ in search_phrase(r, phrase, 200, slop=slop)}
    toks = tokenize(phrase)
    want = {doc_id_from_url(df["url"][i])
            for i, t in enumerate(df["text"])
            if _brute_slop_match(tokenize(t), toks, slop)}
    assert got == want, (phrase, slop)


def test_slop_dp_vs_exhaustive_enumeration(phrase_setup):
    # independent oracle: enumerate ALL in-order index chains and check
    # min(i_m - i_0 - m) <= slop — no shared DP structure with the engine
    import itertools

    from deces_dataprep_ray.index.query import search_phrase

    df, idx = phrase_setup
    r = IndexReader(idx)
    rng = np.random.default_rng(13)
    vocab = ["data", "spark", "window", "row", "join", "scan", "café"]
    for trial in range(12):
        m = int(rng.integers(2, 4))
        phrase = " ".join(str(v) for v in rng.choice(vocab, m))
        toks = tokenize(phrase)  # folded, like the engine analyzes them
        m = len(toks)
        slop = int(rng.integers(0, 4))
        got = {d for d, _ in search_phrase(r, phrase, 500, slop=slop)}
        want = set()
        for i, text in enumerate(df["text"]):
            dt = tokenize(text)
            pos = [[p for p, t in enumerate(dt) if t == q] for q in toks]
            if any(not p for p in pos):
                continue
            found = False
            for chain in itertools.product(*pos):
                if all(chain[j] > chain[j - 1] for j in range(1, m)) \
                        and chain[-1] - chain[0] - (m - 1) <= slop:
                    found = True
                    break
            if found:
                want.add(doc_id_from_url(df["url"][i]))
        assert got == want, (toks, slop)

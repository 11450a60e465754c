"""Generation compaction ≡ from-scratch rebuild.

The contract (`index/compact.py`): ``compact_generations`` over disjoint
generations is rank- AND score-identical to ``build_index`` over the union
corpus (doc_ids are url hashes — stable across builds; Σdl is stored as an
integer, so the union avgdl matches bit-for-bit)."""

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.compact import compact_generations
from deces_dataprep_ray.index.query import search_exact, search_pruned
from deces_dataprep_ray.index.reader import IndexReader

VOCAB = ["data", "spark", "window", "row", "join", "scan", "merge",
         "café", "groupe", "stream", "shard", "index"]


def _corpus(n: int, seed: int, start: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "url": [f"doc://{start + i}" for i in range(n)],
        "text": [" ".join(rng.choice(VOCAB, rng.integers(4, 20)))
                 for _ in range(n)],
    })


@pytest.fixture(scope="module")
def compacted(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmpx")
    df_a, df_b = _corpus(300, 11), _corpus(180, 12, start=300)
    src_a, src_b = str(d / "a.parquet"), str(d / "b.parquet")
    df_a.to_parquet(src_a)
    df_b.to_parquet(src_b)
    kw = dict(num_buckets=8, salt_shards=4, head_min_df=60, batch_size=64)
    g1, g2 = str(d / "g1"), str(d / "g2")
    full, out = str(d / "full"), str(d / "out")
    build_index(src_a, g1, **kw)
    build_index(src_b, g2, **kw)
    build_index([src_a, src_b], full, **kw)
    compact_generations([g1, g2], out)
    return full, out, g1, g2


def test_stats_and_df_match(compacted):
    full, out, *_ = compacted
    rf, rc = IndexReader(full), IndexReader(out)
    assert rc.n_docs == rf.n_docs
    assert rc.avgdl == rf.avgdl  # Σdl stored as int ⇒ bit-identical
    for t in VOCAB + ["zzz_absent"]:
        assert rc.df(t) == rf.df(t), t


def test_search_score_identical(compacted):
    full, out, *_ = compacted
    rf, rc = IndexReader(full), IndexReader(out)
    for q in ["data spark", "café merge scan", "index", "groupe stream row",
              "zzz_absent data"]:
        assert search_exact(rc, q, 20) == search_exact(rf, q, 20), q


def test_pruned_rank_identity_on_compacted(compacted):
    _, out, *_ = compacted
    rc = IndexReader(out)
    for q in ["data spark", "café merge scan", "shard window"]:
        assert search_pruned(rc, q, 10) == search_exact(rc, q, 10), q


def test_docvalues_merged(compacted):
    full, out, *_ = compacted
    rf, rc = IndexReader(full), IndexReader(out)
    docs = [d for d, _ in search_exact(rc, "data spark", 5)]
    assert rc.resolve_urls(docs) == rf.resolve_urls(docs)


def test_resume_is_noop(compacted):
    _, out, g1, g2 = compacted
    import json
    import os
    man1 = json.load(open(os.path.join(out, "manifest.json")))
    compact_generations([g1, g2], out)
    man2 = json.load(open(os.path.join(out, "manifest.json")))
    assert man1["phases"]["postings"]["buckets"] == \
        man2["phases"]["postings"]["buckets"]


def test_moved_head_terms(tmp_path_factory):
    """A term head in one generation but hash-routed in the other moves
    buckets on compaction — the predicate-pushdown pickup path."""
    d = tmp_path_factory.mktemp("cmpm")
    df_a, df_b = _corpus(200, 21), _corpus(120, 22, start=200)
    src_a, src_b = str(d / "a.parquet"), str(d / "b.parquet")
    df_a.to_parquet(src_a)
    df_b.to_parquet(src_b)
    g1, g2 = str(d / "g1"), str(d / "g2")
    full, out = str(d / "full"), str(d / "out")
    # g1 salts the whole hot vocabulary; g2 salts nothing
    build_index(src_a, g1, num_buckets=8, salt_shards=4, head_min_df=10)
    build_index(src_b, g2, num_buckets=8, salt_shards=4,
                head_min_df=10 ** 6)
    build_index([src_a, src_b], full, num_buckets=8, salt_shards=4,
                head_min_df=10)
    compact_generations([g1, g2], out)
    rf, rc = IndexReader(full), IndexReader(out)
    assert IndexReader(g1).head_terms, "g1 must have detected heads"
    assert not IndexReader(g2).head_terms, "g2 must have none"
    assert rc.head_terms == IndexReader(g1).head_terms
    for t in VOCAB:
        assert rc.df(t) == rf.df(t), t
    for q in ["data spark", "café merge", "stream shard index"]:
        assert search_exact(rc, q, 20) == search_exact(rf, q, 20), q


def test_fielded_positional_compaction(tmp_path_factory):
    from deces_dataprep_ray.index.fielded import KeywordFilter, search_fields
    from deces_dataprep_ray.index.query import search_phrase

    d = tmp_path_factory.mktemp("cmpf")
    rng = np.random.default_rng(31)

    def mk(n, start):
        return pd.DataFrame({
            "url": [f"doc://{start + i}" for i in range(n)],
            "body": [" ".join(rng.choice(VOCAB, rng.integers(3, 12)))
                     for _ in range(n)],
            "title": [" ".join(rng.choice(VOCAB, 2)) if i % 4 else ""
                      for i in range(n)],
            "lang": [["en", "fr"][i % 2] for i in range(n)],
        })

    df_a, df_b = mk(120, 0), mk(80, 120)
    src_a, src_b = str(d / "a.parquet"), str(d / "b.parquet")
    df_a.to_parquet(src_a)
    df_b.to_parquet(src_b)
    kw = dict(fields={"body": "body", "title": "title"},
              keyword_fields={"lang": "lang"},
              num_buckets=4, salt_shards=2, head_min_df=40,
              store_positions=True, batch_size=32)
    g1, g2 = str(d / "g1"), str(d / "g2")
    full, out = str(d / "full"), str(d / "out")
    build_index(src_a, g1, **kw)
    build_index(src_b, g2, **kw)
    build_index([src_a, src_b], full, **kw)
    compact_generations([g1, g2], out)
    rf, rc = IndexReader(full), IndexReader(out)
    assert rc.field_stats == rf.field_stats
    for m in ([("body", "data spark")], [("title", "café")],
              [("body", "merge"), ("title", "row")]):
        assert search_fields(rc, m, k=20) == search_fields(rf, m, k=20), m
    got = search_fields(rc, [("body", "data")], k=20,
                        filters=[KeywordFilter("lang", "fr")])
    want = search_fields(rf, [("body", "data")], k=20,
                         filters=[KeywordFilter("lang", "fr")])
    assert got == want
    for ph in ["data spark", "spark data window"]:
        assert search_phrase(rc, ph, 20, field="body") == \
            search_phrase(rf, ph, 20, field="body"), ph


def test_incompatible_generations_rejected(tmp_path_factory):
    d = tmp_path_factory.mktemp("cmpr")
    df = _corpus(40, 41)
    src = str(d / "a.parquet")
    df.to_parquet(src)
    g1, g2 = str(d / "g1"), str(d / "g2")
    build_index(src, g1, num_buckets=4, salt_shards=2)
    build_index(src, g2, num_buckets=8, salt_shards=2)
    with pytest.raises(ValueError, match="num_buckets"):
        compact_generations([g1, g2], str(d / "out"))

"""Tombstones: deletes/updates between compactions (ES live-docs rule).

Oracle: a fresh build over the surviving corpus — compaction with
tombstones must be score-identical to it."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.functions.ids import doc_id_from_url
from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.compact import compact_generations
from deces_dataprep_ray.index.multi import (
    MultiReader,
    generation_exclusions,
    load_tombstones,
    tombstone_docs,
)
from deces_dataprep_ray.index.query import search, search_exact
from deces_dataprep_ray.index.reader import IndexReader

VOCAB = ["data", "spark", "window", "row", "join", "scan"]


def _texts(rng, n):
    return [" ".join(rng.choice(VOCAB, rng.integers(3, 10)))
            for _ in range(n)]


@pytest.fixture(scope="module")
def gens(tmp_path_factory):
    d = tmp_path_factory.mktemp("tomb")
    rng = np.random.default_rng(9)
    n = 100
    df0 = pd.DataFrame({"url": [f"doc://{i}" for i in range(n)],
                        "text": _texts(rng, n)})
    df0.to_parquet(d / "gen0.parquet")
    # gen1 adds 15 docs and UPDATES doc 3 (same url, new text); doc 7 is
    # deleted. Inclusive live-docs semantics: both docs live in gen0, so
    # the tombstones go on gen0 (doc 3's NEW copy lives in gen1, untouched)
    df1 = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n, n + 15)] + ["doc://3"],
        "text": _texts(rng, 15) + ["data data data spark"],
    })
    df1.to_parquet(d / "gen1.parquet")
    idx0, idx1 = str(d / "idx0"), str(d / "idx1")
    build_index(str(d / "gen0.parquet"), idx0, num_buckets=4, salt_shards=2,
                head_min_df=40, batch_size=32)
    build_index(str(d / "gen1.parquet"), idx1, num_buckets=4, salt_shards=2,
                head_min_df=40, batch_size=32)
    tombstone_docs(idx0, urls=["doc://3", "doc://7"])
    surviving = pd.concat(
        [df0[~df0["url"].isin(["doc://3", "doc://7"])], df1])
    return str(d), df0, df1, idx0, idx1, surviving


def test_tombstone_file_merges(gens, tmp_path):
    idx = str(tmp_path / "t")
    os.makedirs(idx)
    assert tombstone_docs(idx, doc_ids=[5, 3]) == 2
    assert tombstone_docs(idx, doc_ids=[5, 9]) == 3  # merge, dedup
    assert list(load_tombstones(idx)) == sorted([3, 5, 9])


def test_exclusions_inclusive_of_own_generation(gens):
    _, _, _, idx0, idx1, _ = gens
    ex = generation_exclusions([idx0, idx1])
    assert len(ex[0]) == 2      # gen0's own tombstones apply to gen0
    assert len(ex[1]) == 0      # ...but never to the LATER gen1 (the
    #                             updated copy of doc 3 lives there)


def test_multireader_serves_live_docs(gens):
    _, df0, _, idx0, idx1, _ = gens
    mr = MultiReader([idx0, idx1])
    assert mr.has_tombstones
    d3 = doc_id_from_url("doc://3")
    d7 = doc_id_from_url("doc://7")
    docs, tfs, _ = mr.postings("data")
    assert np.uint64(d7) not in docs          # deleted
    i3 = int(np.searchsorted(docs, np.uint64(d3)))
    assert docs[i3] == d3 and tfs[i3] == 3    # the UPDATED copy serves
    res = search(mr, "data spark", 20, algorithm="auto")  # auto → exact
    assert all(d != d7 for d, _ in res)
    with pytest.raises(RuntimeError):
        mr.term_segments("data")              # pruned path refuses


def test_compaction_reclaims_tombstones(gens, tmp_path):
    d, _, _, idx0, idx1, surviving = gens
    out = str(tmp_path / "compacted")
    compact_generations([idx0, idx1], out)
    ref_src = str(tmp_path / "surv.parquet")
    surviving.to_parquet(ref_src)
    ref = str(tmp_path / "idx_ref")
    build_index(ref_src, ref, num_buckets=4, salt_shards=2,
                head_min_df=40, batch_size=32)
    rc, rf = IndexReader(out), IndexReader(ref)
    assert rc.n_docs == rf.n_docs == len(surviving)
    assert abs(rc.avgdl - rf.avgdl) < 1e-9
    for q in ["data spark", "row join", "window scan", "data"]:
        a = search_exact(rc, q, 10)
        b = search_exact(rf, q, 10)
        assert [(x, round(s, 10)) for x, s in a] == \
            [(x, round(s, 10)) for x, s in b], q
    # the docstore holds exactly one row per surviving doc
    assert len(rc.resolve_urls([doc_id_from_url("doc://3")])) == 1
    assert not rc.resolve_urls([doc_id_from_url("doc://7")])


def test_fielded_tombstone_compaction(tmp_path):
    """Per-field stats (docCount, avgdl) adjust exactly for deleted docs."""
    rng = np.random.default_rng(4)
    n = 60
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": _texts(rng, n),
        "title": [" ".join(rng.choice(VOCAB, 2)) if i % 4 else ""
                  for i in range(n)],
    })
    src0 = str(tmp_path / "f0.parquet")
    df.to_parquet(src0)
    kw = dict(fields={"body": "body", "title": "title"}, num_buckets=4,
              salt_shards=2, head_min_df=1000, batch_size=16)
    idx0 = str(tmp_path / "fidx0")
    build_index(src0, idx0, **kw)
    df1 = pd.DataFrame({"url": [f"doc://{i}" for i in range(n, n + 10)],
                        "body": _texts(rng, 10),
                        "title": ["data spark"] * 10})
    src1 = str(tmp_path / "f1.parquet")
    df1.to_parquet(src1)
    idx1 = str(tmp_path / "fidx1")
    build_index(src1, idx1, **kw)
    # delete two docs, one of which has an empty title (field docCount edge)
    dead = ["doc://0", "doc://5"]
    tombstone_docs(idx1, urls=dead)
    out = str(tmp_path / "fcompact")
    compact_generations([idx0, idx1], out)
    surv = pd.concat([df[~df["url"].isin(dead)], df1])
    ref_src = str(tmp_path / "fsurv.parquet")
    surv.to_parquet(ref_src)
    ref = str(tmp_path / "fref")
    build_index(ref_src, ref, **kw)
    from deces_dataprep_ray.index.fielded import search_fields

    rc, rf = IndexReader(out), IndexReader(ref)
    assert rc.field_stats == rf.field_stats
    for q in ["data spark", "row window"]:
        a = search_fields(rc, [("body", q), ("title", q)], 10)
        b = search_fields(rf, [("body", q), ("title", q)], 10)
        assert [(x, round(s, 10)) for x, s in a] == \
            [(x, round(s, 10)) for x, s in b], q


def test_compaction_tag_changes_with_tombstones(gens, tmp_path):
    """A tombstone added after a compaction invalidates its resume state —
    the two outputs must differ (no stale-bucket reuse)."""
    _, _, _, idx0, idx1, _ = gens
    out1 = str(tmp_path / "c1")
    man1 = compact_generations([idx0, idx1], out1)
    assert "tomb:" in man1.doc["config"]["input_tag"]


def test_significant_terms_clear_error_on_compacted(gens, tmp_path):
    """compact_generations doesn't produce the `analyzed` checkpoint; the
    aggregation must fail with a clear FileNotFoundError, not a raw
    read_parquet crash."""
    import pytest

    from deces_dataprep_ray.index.aggs import significant_terms
    from deces_dataprep_ray.index.fielded import RangeFilter
    from deces_dataprep_ray.index.reader import IndexReader

    _, _, _, idx0, idx1, _ = gens
    out = str(tmp_path / "cmp_st")
    compact_generations([idx0, idx1], out)
    with pytest.raises(FileNotFoundError, match="analyzed"):
        significant_terms(IndexReader(out),
                          [RangeFilter("dl", 1, 10**9)])


def test_multireader_df_is_live_doc_df(gens):
    """df() must agree with what the scorers use: the tombstone-filtered
    postings length, not the raw per-generation sum."""
    from deces_dataprep_ray.index.multi import MultiReader

    _, _, _, idx0, idx1, _ = gens
    mr = MultiReader([idx0, idx1])
    assert mr.has_tombstones
    for term in ("data", "spark", "window"):
        docs, _, _ = mr.postings(term)
        assert mr.df(term) == len(docs)

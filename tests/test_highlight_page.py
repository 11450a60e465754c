"""search_after pagination, highlight snippets, date-histogram facet.

Oracles: full exhaustive ranking re-sorted by the documented
(rounded score DESC, url ASC) total order for pagination; hand-built
token-window expectations for snippets; a pandas groupby for the
histogram."""

import os

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.functions.analysis import tokenize
from deces_dataprep_ray.index.docstore import DocStore
from deces_dataprep_ray.index.highlight import highlight_snippets, snippet_for
from deces_dataprep_ray.index.query import _score_all, search_after
from deces_dataprep_ray.index.reader import IndexReader

QUERY = "term1 term2"


def _round_away(x, nd=6):
    f = 10.0 ** nd
    return np.floor(np.abs(np.asarray(x, np.float64)) * f + 0.5) / f * np.sign(x)


def _full_order(reader, query):
    """The documented total order: (rounded score DESC, url ASC)."""
    union, scores = _score_all(reader, query)
    urls = reader.resolve_urls(union.tolist())
    rows = [(int(d), float(s), urls[int(d)])
            for d, s in zip(union, scores)]
    return sorted(rows, key=lambda r: (-_round_away(r[1]), r[2]))


class TestSearchAfter:
    def test_first_page_matches_full_order(self, built_index):
        reader = IndexReader(built_index[0])
        expect = _full_order(reader, QUERY)
        got = search_after(reader, QUERY, k=10)
        assert [(d, u) for d, _, u in got] == \
               [(d, u) for d, _, u in expect[:10]]
        for (_, s_got, _), (_, s_exp, _) in zip(got, expect):
            assert s_got == pytest.approx(s_exp, abs=1e-12)

    def test_pagination_covers_ranking_without_dups_or_gaps(self, built_index):
        reader = IndexReader(built_index[0])
        expect = _full_order(reader, QUERY)
        assert len(expect) > 20, "corpus should match more than 2 pages"
        pages, after = [], None
        while True:
            page = search_after(reader, QUERY, k=7, after=after)
            if not page:
                break
            pages.extend(page)
            after = (float(_round_away(page[-1][1])), page[-1][2])
        assert [(d, u) for d, _, u in pages] == \
               [(d, u) for d, _, u in expect]

    def test_cursor_is_strictly_after(self, built_index):
        reader = IndexReader(built_index[0])
        page1 = search_after(reader, QUERY, k=5)
        cursor = (float(_round_away(page1[-1][1])), page1[-1][2])
        page2 = search_after(reader, QUERY, k=5, after=cursor)
        seen = {d for d, _, _ in page1}
        assert not seen & {d for d, _, _ in page2}
        # every page-2 hit sorts strictly after the cursor
        for _, s, u in page2:
            key = (float(_round_away(s)), u)
            assert (-key[0], key[1]) > (-cursor[0], cursor[1])

    def test_no_match_returns_empty(self, built_index):
        reader = IndexReader(built_index[0])
        assert search_after(reader, "zzz_absent_term") == []


class TestSnippets:
    def test_window_around_first_hit(self):
        text = "a b c d target e f g h"
        assert snippet_for(text, {"target"}, window=2) == "c d target e f"

    def test_window_clamped_at_edges(self):
        assert snippet_for("target b c", {"target"}, window=3) == "target b c"
        assert snippet_for("a b target", {"target"}, window=3) == "a b target"

    def test_first_of_several_terms_wins(self):
        text = "x early y z late w"
        assert snippet_for(text, {"late", "early"}, window=1) == "x early y"

    def test_analyzer_folding_applies(self):
        # query folded elsewhere; doc tokens fold to match
        assert snippet_for("le Café Crème est là", {"creme"}, window=1) \
            == "cafe creme est"

    def test_no_match_is_empty(self):
        assert snippet_for("a b c", {"zzz"}, window=2) == ""

    def test_highlight_snippets_via_pruned_store(self, tmp_path):
        df = pd.DataFrame({
            "doc_id": np.arange(50, dtype=np.int64),
            "text": [f"lead{i} mid{i} hit tail{i}" if i % 2 else f"none{i}"
                     for i in range(50)],
        })
        src = str(tmp_path / "docs.parquet")
        df.to_parquet(src, row_group_size=10)
        store = DocStore(paths=[src])
        snips = highlight_snippets(store, [1, 3, 11], "hit", window=1)
        assert snips == {1: "mid1 hit tail1", 3: "mid3 hit tail3",
                         11: "mid11 hit tail11"}

    def test_docstore_paths_lookup_prunes_and_filters(self, tmp_path):
        df = pd.DataFrame({"doc_id": np.arange(100, dtype=np.int64),
                           "text": [f"t{i}" for i in range(100)]})
        src = str(tmp_path / "d.parquet")
        df.to_parquet(src, row_group_size=20)
        store = DocStore(paths=[src])
        tbl = store.lookup([5, 42, 99], ["text"])
        assert sorted(tbl["doc_id"].to_numpy().tolist()) == [5, 42, 99]
        assert set(tbl["text"].to_pylist()) == {"t5", "t42", "t99"}


class TestDateHistogram:
    def test_counts_match_pandas(self, tmp_path):
        from deces_dataprep_ray.index.build import build_index
        from deces_dataprep_ray.index.fielded import facet_date_histogram

        rng = np.random.default_rng(11)
        n = 200
        ts = (pd.Timestamp("2024-01-01")
              + pd.to_timedelta(rng.integers(0, 20 * 24 * 60, n), unit="m"))
        df = pd.DataFrame({
            "url": [f"doc://{i}" for i in range(n)],
            "text": ["data spark" if i % 3 else "window row"
                     for i in range(n)],
            "ts": ts,
        })
        src = str(tmp_path / "ev.parquet")
        df.to_parquet(src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, docvalue_fields={"ts": "ts"},
                    num_buckets=4, salt_shards=2, batch_size=64)
        got = facet_date_histogram(IndexReader(idx), "ts", "day")
        expect = df["ts"].dt.floor("D").value_counts().sort_index()
        assert [(pd.Timestamp(b), n_) for b, n_ in got] == \
               [(b, int(c)) for b, c in expect.items()]
        assert sum(n_ for _, n_ in got) == n

    def test_monthly_interval(self, tmp_path):
        from deces_dataprep_ray.index.build import build_index
        from deces_dataprep_ray.index.fielded import facet_date_histogram

        ts = pd.to_datetime(["2024-01-05", "2024-01-28", "2024-02-02",
                             "2024-03-15", "2024-03-16", "2024-03-17"])
        df = pd.DataFrame({
            "url": [f"doc://{i}" for i in range(6)],
            "text": ["data"] * 6,
            "ts": ts,
        })
        src = str(tmp_path / "ev.parquet")
        df.to_parquet(src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, docvalue_fields={"ts": "ts"},
                    num_buckets=2, salt_shards=2, batch_size=8)
        got = facet_date_histogram(IndexReader(idx), "ts", "month")
        assert [(pd.Timestamp(b), c) for b, c in got] == [
            (pd.Timestamp("2024-01-01"), 2),
            (pd.Timestamp("2024-02-01"), 1),
            (pd.Timestamp("2024-03-01"), 3),
        ]

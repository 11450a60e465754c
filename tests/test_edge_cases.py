"""Degenerate inputs: empty corpus, empty/null texts, single doc."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.query import search, search_exact
from deces_dataprep_ray.index.reader import IndexReader


def _write(tmp_path, name, urls, texts):
    p = os.path.join(tmp_path, name)
    pq.write_table(pa.table({
        "url": pa.array(urls, pa.string()),
        "text": pa.array(texts, pa.large_string()),
    }), p)
    return p


def test_empty_corpus(tmp_path):
    p = _write(str(tmp_path), "empty.parquet", [], [])
    idx = str(tmp_path / "idx")
    man = build_index([p], idx, num_buckets=4, salt_shards=2, head_min_df=10)
    assert man.phase("stats")["n_docs"] == 0
    r = IndexReader(idx)
    assert search(r, "anything", 10) == []


def test_empty_and_null_texts(tmp_path):
    p = _write(str(tmp_path), "d.parquet",
               ["u://1", "u://2", "u://3"], ["", None, "hello world hello"])
    idx = str(tmp_path / "idx")
    man = build_index([p], idx, num_buckets=4, salt_shards=2, head_min_df=10)
    assert man.phase("stats")["n_docs"] == 3
    r = IndexReader(idx)
    res = search_exact(r, "hello", 10)
    assert len(res) == 1
    docs, tfs, _ = r.postings("hello")
    assert tfs.tolist() == [2]


def test_single_doc(tmp_path):
    p = _write(str(tmp_path), "d.parquet", ["u://solo"], ["only one document"])
    idx = str(tmp_path / "idx")
    build_index([p], idx, num_buckets=4, salt_shards=2, head_min_df=10)
    r = IndexReader(idx)
    res = search(r, "document only", 5)
    assert len(res) == 1
    assert r.n_docs == 1 and r.avgdl == 3.0


def test_query_with_duplicate_terms(built_index):
    idx, _ = built_index
    r = IndexReader(idx)
    # duplicate query terms analyze to a unique set
    assert search_exact(r, "term1 term1 term1", 5) == search_exact(r, "term1", 5)

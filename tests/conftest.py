import os
import shutil

import pytest
import ray


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    """One Ray session for the whole pytest run (graft driver requirement)."""
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus_dir(tmp_path_factory):
    from deces_dataprep_ray.corpus import write_pages_corpus

    d = str(tmp_path_factory.mktemp("corpus"))
    write_pages_corpus(d, 800, shard_rows=200)
    return d


@pytest.fixture(scope="session")
def built_index(corpus_dir, tmp_path_factory):
    """A small built index shared by read-only tests."""
    from deces_dataprep_ray.index.build import build_index

    idx = str(tmp_path_factory.mktemp("idx") / "index")
    man = build_index(
        sorted(
            os.path.join(corpus_dir, f)
            for f in os.listdir(corpus_dir)
            if f.endswith(".parquet")
        ),
        idx,
        num_buckets=8,
        salt_shards=4,
        head_min_df=60,
        batch_size=256,
    )
    return idx, man


@pytest.fixture(scope="session")
def brute_force(corpus_dir):
    """Independent pure-Python inverted index over the same corpus."""
    from collections import Counter

    import pyarrow.parquet as pq

    from deces_dataprep_ray.functions.analysis import tokenize
    from deces_dataprep_ray.functions.ids import doc_id_from_url

    inv: dict[str, dict[int, int]] = {}
    dls: dict[int, int] = {}
    for f in sorted(os.listdir(corpus_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(corpus_dir, f), columns=["url", "text"])
        for url, text in zip(t["url"].to_pylist(), t["text"].to_pylist()):
            did = doc_id_from_url(url)
            toks = tokenize(text)
            dls[did] = len(toks)
            for term, tf in Counter(toks).items():
                inv.setdefault(term, {})[did] = tf
    return inv, dls

"""Distributed query service: pool results identical to a local reader."""

from deces_dataprep_ray.index.query import search_pruned
from deces_dataprep_ray.index.reader import IndexReader
from deces_dataprep_ray.index.service import QueryService

QUERIES = ["term1", "term2 term3", "café crème", "term50 term300",
           "zzz_absent", "term1 term2 term3 term4"]


def test_service_matches_local(built_index):
    idx, _ = built_index
    local = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        for q in QUERIES:
            assert svc.search(q, 10) == search_pruned(local, q, 10), q
        batch = svc.search_batch(QUERIES, 10)
        assert batch == [search_pruned(local, q, 10) for q in QUERIES]
    finally:
        svc.shutdown()


def test_cli_in_process_keeps_session(built_index, tmp_path, capsys):
    # the CLI must not tear down a Ray session it didn't start
    import json

    import ray

    from deces_dataprep_ray.cli import main

    idx, _ = built_index
    assert main(["query", "--index", idx, "--q", "term1 term2", "-k", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out) == 3 and "score" in out[0]
    assert ray.is_initialized(), "CLI shut down the caller's Ray session"

    dest = str(tmp_path / "clibk")
    assert main(["push", "--index", idx, "--dest", dest]) == 0
    assert main(["verify", "--index", dest]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"]


def test_service_phrase_and_fuzzy(tmp_path):
    import numpy as np
    import pandas as pd

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.query import search_fuzzy, search_phrase
    from deces_dataprep_ray.index.reader import IndexReader
    from deces_dataprep_ray.index.service import QueryService

    rng = np.random.default_rng(3)
    vocab = ["data", "spark", "window", "scan"]
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(40)],
        "text": [" ".join(rng.choice(vocab, 8)) for _ in range(40)],
    })
    src = str(tmp_path / "s.parquet")
    df.to_parquet(src)
    idx = str(tmp_path / "i")
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=1000,
                store_positions=True, batch_size=16)
    r = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        assert svc.search_phrase("data spark", 5) == \
               search_phrase(r, "data spark", 5)
        assert svc.search_fuzzy("windoz", 5) == search_fuzzy(r, "windoz", 5)
    finally:
        svc.shutdown()


def test_service_search_after_and_highlight(tmp_path):
    import numpy as np
    import pandas as pd

    from deces_dataprep_ray.index.build import build_index
    from deces_dataprep_ray.index.highlight import snippet_for
    from deces_dataprep_ray.index.query import search, search_after
    from deces_dataprep_ray.index.reader import IndexReader
    from deces_dataprep_ray.index.service import QueryService

    rng = np.random.default_rng(9)
    vocab = ["data", "spark", "window", "scan", "merge"]
    texts = [" ".join(rng.choice(vocab, 10)) for _ in range(50)]
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(50)],
        "text": texts,
    })
    src = str(tmp_path / "s.parquet")
    df.to_parquet(src)
    idx = str(tmp_path / "i")
    # the source text stored as a docvalue = ES _source; serves highlight
    build_index(src, idx, num_buckets=4, salt_shards=2, head_min_df=1000,
                docvalue_fields={"src_text": "text"}, batch_size=16)
    r = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        page1 = svc.search_after("data spark", 5)
        assert page1 == search_after(r, "data spark", 5)
        cursor = (round(page1[-1][1], 6), page1[-1][2])
        assert svc.search_after("data spark", 5, after=cursor) == \
               search_after(r, "data spark", 5, after=cursor)

        hits = svc.highlight("data spark", 5, window=2,
                             text_col="src_text")
        expect = search(r, "data spark", 5)
        assert [(d, s) for d, s, _ in hits] == expect
        by_url = {f"doc://{i}": t for i, t in enumerate(texts)}
        urls = r.resolve_urls([d for d, _ in expect])
        for d, _, snip in hits:
            assert snip == snippet_for(by_url[urls[d]],
                                       {"data", "spark"}, window=2)
            assert snip
    finally:
        svc.shutdown()


def test_service_explain_over_pool(built_index):
    from deces_dataprep_ray.index.query import explain, search_pruned

    idx, _ = built_index
    local = IndexReader(idx)
    svc = QueryService(idx, num_workers=2)
    try:
        top = search_pruned(local, "term1 term2", 3)
        assert top
        doc, score = top[0]
        exp = svc.explain("term1 term2", doc)
        assert exp == explain(local, "term1 term2", doc)
        assert abs(exp["score"] - score) < 1e-9
        assert exp["matched"] and exp["terms"]
    finally:
        svc.shutdown()


def test_service_alias_swap_without_restart(tmp_path):
    import pandas as pd

    from deces_dataprep_ray.index.alias import set_alias
    from deces_dataprep_ray.index.build import build_index

    def mk(name, word):
        df = pd.DataFrame({
            "url": [f"doc://{i}" for i in range(12)],
            "text": [f"{word} common filler" for _ in range(12)],
        })
        src = str(tmp_path / f"{name}.parquet")
        df.to_parquet(src)
        idx = str(tmp_path / name)
        build_index(src, idx, num_buckets=2, salt_shards=2,
                    head_min_df=1000, batch_size=8)
        return idx

    blue, green = mk("blue", "alpha"), mk("green", "beta")
    aliases = str(tmp_path / "aliases")
    set_alias(aliases, "live", blue)
    svc = QueryService(str(tmp_path / "aliases" / "live"), num_workers=2)
    try:
        assert len(svc.search("alpha", 5)) == 5      # blue serves alpha
        assert len(svc.search("beta", 5)) == 0
        workers_before = list(svc.workers)
        set_alias(aliases, "live", green)            # atomic cutover
        assert svc.search("beta", 5) == []           # not yet refreshed
        switched = svc.refresh()
        assert switched == 2                         # both workers moved
        assert svc.workers == workers_before         # same actors, no restart
        assert len(svc.search("beta", 5)) == 5       # green serves beta
        assert len(svc.search("alpha", 5)) == 0
        assert all(d.endswith("green") for d in svc.resolved_dirs())
        assert svc.refresh() == 0                    # idempotent
    finally:
        svc.shutdown()

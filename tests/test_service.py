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

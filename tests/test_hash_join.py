"""Partitioned large x large hash join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from deces_dataprep_ray.stages.join import hash_join


def _sides():
    left = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4, 5, 5],
        "lv": ["a", "b", "c", "d", "e1", "e2"],
    }))
    right = rd.from_arrow(pa.table({
        "rk": [2, 3, 3, 5, 9],
        "rv": [20, 30, 31, 50, 90],
    }))
    return left, right


def test_inner_join():
    left, right = _sides()
    out = hash_join(left, right, {"k": "rk"}, how="inner",
                    bucket_count=4).to_pandas()
    out = out.sort_values(["k", "rv"]).reset_index(drop=True)
    # 2->20, 3->30, 3->31, two k=5 rows x one rv=50 = 5 rows
    assert len(out) == 5
    assert out[out["k"] == 3]["rv"].tolist() == [30, 31]
    assert sorted(out[out["k"] == 5]["lv"].tolist()) == ["e1", "e2"]
    assert 1 not in out["k"].tolist() and 9 not in out["k"].tolist()


def test_left_join_keeps_unmatched():
    left, right = _sides()
    out = hash_join(left, right, {"k": "rk"}, how="left",
                    bucket_count=4).to_pandas()
    assert len(out) == 7  # 5 matches + rows k=1, k=4 with null rv
    unmatched = out[out["k"].isin([1, 4])]
    assert unmatched["rv"].isna().all()


def test_matches_duckdb_on_tpch(tmp_path):
    import duckdb

    L = rd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])
    R = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                        columns=["l_orderkey", "l_quantity"])
    out = hash_join(L, R, {"o_orderkey": "l_orderkey"},
                    bucket_count=8).to_pandas()
    want = duckdb.sql("""
        SELECT count(*) n, sum(l.l_quantity) s
        FROM '/root/testdata/sf0.001/orders.parquet' o
        JOIN '/root/testdata/sf0.001/lineitem.parquet' l
          ON o.o_orderkey = l.l_orderkey""").df()
    assert len(out) == int(want["n"][0])
    assert abs(out["l_quantity"].sum() - float(want["s"][0])) < 1e-6


def test_mixed_key_dtypes_join():
    # int64 1 must meet float64 1.0 — keys are normalized before bucketing
    l = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3], np.int64), "a": ["x", "y", "z"]}))
    r = rd.from_pandas(pd.DataFrame(
        {"k": np.array([1.0, 3.0], np.float64), "b": [10, 30]}))
    out = hash_join(l, r, {"k": "k"}).to_pandas().sort_values("k")
    assert len(out) == 2
    assert list(out["b"]) == [10, 30]

"""Large × large equi-join: explicit partitioned hash join.

The reference only ever joins against small in-memory lookups
(`recipes/deces_dataprep.yml` — SURVEY.md §2.5 "no hash-shuffle joins
exist"), which :class:`..stages.BroadcastJoin` covers. A complete engine
also needs the both-sides-large case; Ray Data's portable pattern (per the
public Ray guidance) is: tag each side, add ``bucket = hash(key) % B`` to
both, co-group by bucket, and join bucket-pairs inside ``map_groups``.

Skew note: a hot key concentrates in one bucket; ``bucket_count`` spreads
distinct keys, and a genuinely hot single key should be broadcast-joined
separately (split the hot keys out first) — documented rather than hidden.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.ids import term_buckets


def _common_key_type(lt: pa.DataType, rt: pa.DataType) -> pa.DataType:
    """Common type both sides' key columns are cast to BEFORE bucketing, so
    numerically equal keys with different physical types (int64 1 vs float64
    1.0) land in the same bucket AND merge equal — instead of hashing as
    '1' vs '1.0' and silently never meeting.

    Known limit: an int64/float64 mix casts to float64, which is exact only
    up to 2^53 — integer keys above that can collide after the cast. Keep
    both sides integer (or cast explicitly upstream) for id spaces that
    large."""
    if lt.equals(rt):
        return lt
    num = (pa.types.is_integer, pa.types.is_floating)
    if any(p(lt) for p in num) and any(p(rt) for p in num):
        if pa.types.is_integer(lt) and pa.types.is_integer(rt):
            return pa.int64()
        return pa.float64()
    if pa.types.is_timestamp(lt) and pa.types.is_timestamp(rt):
        return pa.timestamp("us")
    return pa.string()


def _with_bucket(batch: pa.Table, keys: list[str], bucket_count: int,
                 side: int, key_types: list[pa.DataType]) -> pa.Table:
    n = batch.num_rows
    for k, t in zip(keys, key_types):
        if not batch.schema.field(k).type.equals(t):
            batch = batch.set_column(
                batch.schema.get_field_index(k), k, batch[k].cast(t))
    if n == 0:
        return batch.append_column("__bucket", pa.array([], pa.int64())) \
                    .append_column("__side", pa.array([], pa.int8()))
    parts = [batch[k].cast(pa.string()).to_pandas().fillna("\x00null")
             for k in keys]
    composite = parts[0]
    for p in parts[1:]:
        composite = composite + "\x1f" + p
    buckets = term_buckets(composite.to_numpy(), bucket_count).astype(np.int64)
    return batch.append_column("__bucket", pa.array(buckets, pa.int64())) \
                .append_column("__side", pa.array(np.full(n, side, np.int8()),
                                                  pa.int8()))


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: dict[str, str],
    *,
    how: str = "inner",
    bucket_count: int = 64,
) -> rd.Dataset:
    """Equi-join two large datasets on ``{left_col: right_col}``.

    Returns left columns + right columns (right key columns dropped —
    they equal the left keys). ``how``: "inner" or "left".
    """
    assert how in ("inner", "left")
    lkeys = list(on.keys())
    rkeys = list(on.values())
    def _arrow_types(schema) -> dict[str, pa.DataType]:
        out = {}
        for name, t in zip(schema.names, schema.types):
            if not isinstance(t, pa.DataType):
                try:
                    t = pa.from_numpy_dtype(np.dtype(t))
                except (pa.ArrowNotImplementedError, TypeError):
                    t = pa.string()  # pandas object dtype — treat as string
            out[name] = t
        return out

    ltypes, rtypes = _arrow_types(left.schema()), _arrow_types(right.schema())
    key_types = [
        _common_key_type(ltypes[lk], rtypes[rk])
        for lk, rk in zip(lkeys, rkeys)
    ]

    lb = left.map_batches(
        lambda t: _with_bucket(t, lkeys, bucket_count, 0, key_types),
        batch_format="pyarrow")
    rb = right.map_batches(
        lambda t: _with_bucket(t, rkeys, bucket_count, 1, key_types),
        batch_format="pyarrow")

    left_cols = [c for c in left.schema().names]
    right_cols = [c for c in right.schema().names]
    out_right_cols = [c for c in right_cols if c not in rkeys]

    # union both sides; schemas differ, so pad each side's frame inside the
    # group instead (the union here only aligns on (__bucket, __side) + all
    # columns — Ray unions by column name with nulls for missing)
    both = lb.union(rb)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0]
        rg = g[g["__side"] == 1]
        lg = lg[[c for c in left_cols if c in lg.columns]]
        rg = rg[[c for c in right_cols if c in rg.columns]]
        merged = lg.merge(
            rg, left_on=lkeys, right_on=rkeys,
            how="inner" if how == "inner" else "left",
            suffixes=("", "__r"),
        )
        keep = left_cols + [c for c in out_right_cols if c in merged.columns]
        # a shared non-key column name keeps the left value; right copy
        # arrives suffixed and is surfaced under <name>__r
        keep += [c for c in merged.columns if c.endswith("__r")]
        return merged[[c for c in keep if c in merged.columns]]

    return both.groupby("__bucket", num_partitions=bucket_count).map_groups(
        join_bucket, batch_format="pandas")

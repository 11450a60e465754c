"""ES-style metric aggregations over the docvalues store, on Ray Data.

Elasticsearch executes aggregations per shard over doc_values and merges
per-shard partials on the coordinating node (the surface the reference's
search API exposes on top of its `deces_index.yml` mapping). This module
re-owns that execution shape: every aggregation is a column-pruned
``read_parquet(docvalues)`` → ``map_batches`` partial fold → tiny
driver-side merge. What crosses the cluster is one partial row (or one
register array) per batch — never doc rows — so each aggregation's
exchange volume is O(batches), independent of corpus size.

Scale notes per aggregation:

- ``stats_agg``: one 5-number row per batch. Unbounded scale.
- ``histogram_agg``: one row per (bucket, batch); bounded by the bucket
  count × batches. Unbounded scale for sane intervals.
- ``cardinality_agg``: ES semantics — approximate, HyperLogLog. One
  2^p-byte register array per batch rides the merge; fixed size at any
  corpus. ``exact=True`` merges per-batch uniques driver-side instead —
  bounded by the TRUE cardinality (fine for keyword-ish columns, not for
  doc-unique ones; that asymmetry is exactly why ES ships HLL).
- ``percentiles_agg``: exact, via merged per-batch value counts — bounded
  by the column's distinct-value count (guarded by ``max_distinct``).
  Right for the mapping's typed docvalue columns (`short`/`date` fields,
  deces_index.yml:86-88,128-129 — value space ≪ doc count); for unbounded
  float columns ES falls back to t-digest approximation, which this
  engine does not need at the reference's mapping.
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .reader import IndexReader


def _dv_path(reader: IndexReader) -> str:
    return os.path.join(reader.index_dir, "docvalues")


def _read_dv(reader: IndexReader, column: str):
    import ray.data as rd

    return rd.read_parquet(_dv_path(reader), columns=[column])


def stats_agg(reader: IndexReader, column: str) -> dict:
    """ES ``stats`` aggregation: count / min / max / sum / avg over a
    docvalue column, nulls skipped (ES "missing" docs)."""

    def partial(t: pa.Table) -> pa.Table:
        col = t[column].drop_null()
        n = len(col)
        if n == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64()),
                             "sm": pa.array([], pa.float64())})
        return pa.table({
            "n": pa.array([n], pa.int64()),
            "mn": pa.array([pc.min(col).cast(pa.float64()).as_py()]),
            "mx": pa.array([pc.max(col).cast(pa.float64()).as_py()]),
            "sm": pa.array([pc.sum(col).cast(pa.float64()).as_py()]),
        })

    parts = _read_dv(reader, column).map_batches(
        partial, batch_format="pyarrow").take_all()
    if not parts:
        return {"count": 0, "min": None, "max": None, "sum": 0.0, "avg": None}
    count = int(sum(p["n"] for p in parts))
    mn = min(p["mn"] for p in parts)
    mx = max(p["mx"] for p in parts)
    # Kahan-free float64 sum of per-batch float64 partial sums: matches the
    # SQL oracle to well past 6 decimals for docvalue-typed columns
    sm = float(sum(p["sm"] for p in parts))
    return {"count": count, "min": mn, "max": mx, "sum": sm,
            "avg": sm / count if count else None}


def histogram_agg(reader: IndexReader, column: str, interval: float,
                  offset: float = 0.0) -> list[tuple[float, int]]:
    """ES ``histogram`` aggregation: fixed-interval numeric buckets.

    Bucket key = floor((v - offset) / interval) * interval + offset (the ES
    formula). Returns (bucket_key, doc_count) ascending; empty buckets are
    omitted (ES min_doc_count=1 behavior)."""
    if interval <= 0:
        raise ValueError("interval must be > 0")

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].drop_null().cast(pa.float64()).combine_chunks()
        arr = v.to_numpy(zero_copy_only=False)
        keys = np.floor((arr - offset) / interval) * interval + offset
        vc = pc.value_counts(pa.array(keys))
        return pa.table({"bucket": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = _read_dv(reader, column).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc: Counter = Counter()
    for row in parts:
        acc[float(row["bucket"])] += int(row["n"])
    return sorted(acc.items())


# --- cardinality (HyperLogLog) ---------------------------------------------

_HLL_P = 14  # 2^14 registers = 16 KiB per batch partial, ES default precision


def _hll_registers(values: np.ndarray, p: int = _HLL_P) -> np.ndarray:
    """Vectorized HLL register fold of a value array (any dtype pandas can
    hash): register[i] = max leading-zero-rank of hashes routed to i."""
    from pandas.util import hash_array

    h = hash_array(values, hash_key="0123456789123456").astype(np.uint64)
    m = np.uint64((1 << p) - 1)
    idx = (h & m).astype(np.int64)
    w = h >> np.uint64(p)
    # rank = position of first 1-bit in the remaining 64-p bits, 1-based;
    # all-zero w maps to (64-p)+1
    nbits = 64 - p
    rank = np.full(len(w), nbits + 1, dtype=np.uint8)
    nz = w != 0
    # first 1-bit position from the LSB side (HLL convention on the
    # truncated hash): count trailing zeros via bit isolation
    wnz = w[nz]
    low = (wnz & (~wnz + np.uint64(1))).astype(np.float64)
    rank[nz] = (np.log2(low)).astype(np.uint8) + 1
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def _hll_estimate(regs: np.ndarray, p: int = _HLL_P) -> float:
    """Bias-corrected HLL estimate with linear-counting small-range fix."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return est


def cardinality_agg(reader: IndexReader, column: str,
                    exact: bool = False) -> int:
    """ES ``cardinality`` aggregation over a docvalue column.

    Default path is HyperLogLog (ES semantics: approximate, fixed memory):
    each batch folds to a 2^14-register array, the driver merges by
    element-wise max — a 16 KiB partial per batch at any corpus size.
    ``exact=True`` merges per-batch unique sets instead (driver memory
    bounded by the true cardinality — the gate/oracle path)."""
    if exact:
        def u(t: pa.Table) -> pa.Table:
            return pa.table({"v": t[column].drop_null().unique()})

        parts = _read_dv(reader, column).map_batches(
            u, batch_format="pyarrow").take_all()
        return len({row["v"] for row in parts})

    def regs_partial(t: pa.Table) -> pa.Table:
        col = t[column].drop_null().combine_chunks()
        vals = col.to_numpy(zero_copy_only=False)
        regs = (_hll_registers(vals) if len(vals)
                else np.zeros(1 << _HLL_P, np.uint8))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = _read_dv(reader, column).map_batches(
        regs_partial, batch_format="pyarrow").take_all()
    merged = np.zeros(1 << _HLL_P, dtype=np.uint8)
    for row in parts:
        np.maximum(merged, np.frombuffer(row["regs"], np.uint8), out=merged)
    return int(round(_hll_estimate(merged)))


def significant_terms(
    reader: IndexReader,
    filters: list,
    field: str | None = None,
    top_n: int = 10,
    min_fg_df: int = 1,
) -> list[tuple[str, int, int, float]]:
    """ES ``significant_terms`` aggregation (JLH scoring, frozen semantics).

    Foreground = the doc set matching ``filters`` (≥1 positive filter
    required — the ES "bucket" being analyzed). For every term occurring in
    foreground docs: fg_r = fg_df / n_fg, bg_r = bg_df / n_docs, and

        JLH(term) = (fg_r − bg_r) · (fg_r / bg_r),   kept iff fg_r > bg_r

    Returns (term, fg_df, bg_df, score) sorted by score desc then term asc,
    capped at top_n; terms with fg_df < min_fg_df are dropped first.

    Execution shape: foreground doc_ids resolve from postings/docvalues
    (never a corpus scan), broadcast once via ``ray.put``; a column-pruned
    Ray pass over the ``analyzed`` checkpoint's (doc_id, terms) — the term
    vectors ES would read — folds each batch to (term, fg_df) partials, so
    the exchange is one row per (fg term, batch). Background df comes from
    a predicate-pushdown read of the term dictionary restricted to the
    candidate set. The full-corpus token scan is inherent to the
    aggregation (ES pays the same via per-shard term vectors / fielddata);
    the foreground mask keeps all downstream state fg-bounded."""
    import ray
    import ray.data as rd

    from .fielded import _resolve_filters

    allow, exclude = _resolve_filters(reader, filters)
    if allow is None:
        raise ValueError("significant_terms needs >= 1 positive filter "
                         "(the foreground doc set)")
    if exclude is not None and len(exclude):
        allow = allow[~np.isin(allow, exclude)]
    n_fg = len(allow)
    if n_fg == 0:
        return []
    fg_ref = ray.put(np.sort(allow.astype(np.uint64)))
    prefix = f"{field}:" if field else None

    def partial(t: pa.Table) -> pa.Table:
        fg = ray.get(fg_ref) if isinstance(fg_ref, ray.ObjectRef) else fg_ref
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        pos = np.searchsorted(fg, ids)
        keep = (pos < len(fg))
        keep[keep] &= fg[pos[keep]] == ids[keep]
        if not keep.any():
            return pa.table({"term": pa.array([], pa.large_string()),
                             "n": pa.array([], pa.int64())})
        terms = pc.list_flatten(
            t.filter(pa.array(keep))["terms"].combine_chunks())
        if prefix is not None:
            terms = terms.filter(pc.starts_with(terms, prefix))
        # terms are per-doc unique in `analyzed`, so value_counts == df
        vc = pc.value_counts(terms)
        return pa.table({"term": vc.field("values").cast(pa.large_string()),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    analyzed = os.path.join(reader.index_dir, "analyzed")
    if not os.path.isdir(analyzed):
        # compact_generations rebuilds postings/termstats/docvalues but not
        # the per-doc `analyzed` term-vector checkpoint this aggregation
        # scans — mirror compact.py's dl-bearing-docvalues guard with a
        # clear error instead of a raw read_parquet failure
        raise FileNotFoundError(
            f"significant_terms needs the 'analyzed' checkpoint, absent at "
            f"{analyzed!r} (compacted indexes don't carry it — run the "
            f"aggregation against the source generations' own index dirs, "
            f"or rebuild the index from documents)")
    parts = rd.read_parquet(analyzed, columns=["doc_id", "terms"]) \
        .map_batches(partial, batch_format="pyarrow").take_all()
    fg_df: Counter = Counter()
    for row in parts:
        fg_df[row["term"]] += int(row["n"])
    cands = sorted(t for t, c in fg_df.items() if c >= min_fg_df)
    if not cands:
        return []

    import pyarrow.dataset as pa_ds

    ts_dir = os.path.join(reader.index_dir, "termstats")
    bg_tbl = pa_ds.dataset(ts_dir).to_table(
        columns=["term", "df"],
        filter=pc.field("term").isin(cands))
    bg_df = dict(zip(bg_tbl["term"].to_pylist(),
                     bg_tbl["df"].to_numpy().tolist()))
    n_bg = float(reader.n_docs)
    out = []
    strip = len(prefix) if prefix else 0
    for term in cands:
        fg = fg_df[term]
        bg = int(bg_df.get(term, fg))
        fg_r = fg / n_fg
        bg_r = bg / n_bg
        if fg_r <= bg_r or bg_r <= 0.0:
            continue
        score = (fg_r - bg_r) * (fg_r / bg_r)
        out.append((term[strip:], int(fg), bg, score))
    out.sort(key=lambda r: (-r[3], r[0]))
    return out[:top_n]


def percentiles_agg(reader: IndexReader, column: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
                    max_distinct: int = 1_000_000) -> dict[float, float]:
    """Exact percentiles via merged per-batch value counts.

    Definition (type-1 inverted CDF, mirrored verbatim by the SQL oracle):
    percentile(q) = the smallest value v whose cumulative count
    ≥ ceil(q·N). Exact and shuffle-free when the column's distinct-value
    count is bounded (``max_distinct`` guards the driver merge) — true for
    the mapping's `short`/`date` docvalue columns by construction."""
    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantile {q} outside (0, 1]")

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t[column].drop_null().combine_chunks())
        return pa.table({"v": vc.field("values").cast(pa.float64()),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = _read_dv(reader, column).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc: Counter = Counter()
    for row in parts:
        acc[float(row["v"])] += int(row["n"])
        if len(acc) > max_distinct:
            raise ValueError(
                f"{column!r} exceeds max_distinct={max_distinct} distinct "
                "values; exact percentiles need a bounded value space "
                "(use a coarser derived column, or raise the cap)")
    if not acc:
        return {q: float("nan") for q in qs}
    vals = np.array(sorted(acc), dtype=np.float64)
    cum = np.cumsum([acc[v] for v in vals])
    n = int(cum[-1])
    out = {}
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        out[q] = float(vals[np.searchsorted(cum, rank, side="left")])
    return out


def range_agg(reader: IndexReader, column: str,
              ranges: list[tuple]) -> list[tuple[str, int]]:
    """ES ``range`` aggregation: explicit [from, to) buckets (from
    inclusive, to exclusive — the ES contract; either edge may be None for
    open-ended). Buckets may overlap — a doc counts in every bucket it
    falls in, exactly ES's behavior. Nulls are skipped (missing docs).

    Same distributed shape as ``histogram_agg``: Ray reads only the one
    column, each batch folds to a fixed-width per-bucket count row, the
    driver sums the tiny partials. Returns [(key, doc_count)] in the given
    range order, ES's "from-to" key format."""

    def key_of(lo, hi) -> str:
        ls = "*" if lo is None else f"{float(lo):g}"
        hs = "*" if hi is None else f"{float(hi):g}"
        return f"{ls}-{hs}"

    def partial(t: pa.Table) -> pa.Table:
        v = t[column].drop_null().combine_chunks()
        if pa.types.is_timestamp(v.type) or pa.types.is_date(v.type):
            v = v.cast(pa.int64())  # epoch units — range edges in the same
        arr = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        counts = []
        for lo, hi in ranges:
            m = np.ones(len(arr), bool)
            if lo is not None:
                m &= arr >= float(lo)
            if hi is not None:
                m &= arr < float(hi)
            counts.append(int(m.sum()))
        return pa.table({"i": pa.array(range(len(ranges)), pa.int32()),
                         "n": pa.array(counts, pa.int64())})

    parts = _read_dv(reader, column).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc = Counter()
    for row in parts:
        acc[int(row["i"])] += int(row["n"])
    return [(key_of(lo, hi), acc.get(i, 0))
            for i, (lo, hi) in enumerate(ranges)]


def filters_agg(reader: IndexReader, filters: dict) -> dict[str, int]:
    """ES ``filters`` aggregation: doc_count per named filter. Each value
    is one of the fielded filter objects (Keyword/Terms/Range/Geo/Exists/
    NotKeyword); counts come from the filter's own execution strategy —
    postings length for keyword terms (dictionary metadata, no scan),
    predicate-pushdown docvalues scan for range/geo. A negative
    (must_not) filter counts corpus − |excluded|."""
    out: dict[str, int] = {}
    for name, flt in filters.items():
        if getattr(flt, "negative", False):
            out[name] = int(reader.n_docs) - len(flt.exclude_ids(reader))
        else:
            out[name] = len(flt.doc_ids(reader))
    return out


def terms_metric_agg(reader: IndexReader, key_column: str,
                     value_column: str, size: int | None = None,
                     shard_size: int | None = None) -> list[tuple]:
    """ES ``terms`` aggregation with metric sub-aggregations: per key
    bucket, doc_count + sum/avg/min/max of a second docvalue column (the
    bucket-plus-metric composition every ES dashboard uses).

    Distributed end-to-end: per-batch partials over the TWO pruned
    docvalue columns (one (key, n, sum, min, max) row per key per batch),
    then a DISTRIBUTED ``groupby(key).aggregate`` merge (avg = Σ/n after
    the merge, so partial-merge is exact) — the driver never materializes
    the bucket table (round 4 merged partials in a driver-side dict, which
    a high-cardinality key would blow up).

    ``size`` caps the result the ES way: each batch keeps only its top
    ``shard_size`` keys by doc_count (default ``size·1.5 + 10``, ES's
    shard_size heuristic — the same per-shard approximation ES makes), and
    the merged buckets are top-``size``-selected by (doc_count desc, key
    asc) with a distributed sort+limit, so the driver sees ≤ size rows.
    ``size=None`` (the gate configuration) enumerates every bucket — use
    ``composite_agg`` to PAGE over high-cardinality keys instead. Docs
    with a null key are skipped (ES missing bucket is opt-in); null values
    count the doc but contribute no metric (ES skips missing values
    per-metric). Returns [(key, doc_count, sum, avg, min, max)] sorted by
    key when uncapped, by (doc_count desc, key asc) when capped (ES bucket
    order)."""
    cap = None if size is None else max(
        int(size * 1.5 + 10), size) if shard_size is None else shard_size

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        t = t.filter(pc.is_valid(t[key_column]))
        v = t[value_column].combine_chunks()
        if pa.types.is_timestamp(v.type) or pa.types.is_date(v.type):
            v = v.cast(pa.int64())
        vals = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame({"k": t[key_column].to_pandas(), "v": vals})
        # vectorized C groupby: size counts all docs in the bucket,
        # sum/min/max/count skip NaN (ES per-metric missing semantics)
        g = pdf.groupby("k", sort=True)["v"].agg(
            n="size", s="sum", mn="min", mx="max", nv="count")
        if cap is not None and len(g) > cap:
            g = g.sort_values("n", ascending=False, kind="stable").head(cap)
            g = g.sort_index()
        return pa.table({
            "key": pa.array(g.index.astype(str), pa.large_string()),
            "n": pa.array(g["n"].to_numpy(np.int64)),
            "s": pa.array(np.nan_to_num(g["s"].to_numpy(float))),
            "mn": pa.array(np.nan_to_num(g["mn"].to_numpy(float),
                                         nan=np.inf)),
            "mx": pa.array(np.nan_to_num(g["mx"].to_numpy(float),
                                         nan=-np.inf)),
            "nv": pa.array(g["nv"].to_numpy(np.int64)),
        })

    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    merged = rd.read_parquet(
        _dv_path(reader), columns=[key_column, value_column]).map_batches(
        partial, batch_format="pyarrow").groupby("key").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"),
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
        Sum("nv", alias_name="nv"))
    if size is not None:
        # ES bucket order: doc_count desc, key asc — selected distributed
        merged = merged.sort(["n", "key"], descending=[True, False]).limit(
            size)
    rows = merged.take_all()  # ≤ size rows, or one row per distinct key
    if size is None:
        rows.sort(key=lambda r: r["key"])
    out = []
    for r in rows:
        n, s, nv = int(r["n"]), float(r["s"]), int(r["nv"])
        out.append((r["key"], n, s, (s / nv) if nv else float("nan"),
                    float(r["mn"]) if nv else float("nan"),
                    float(r["mx"]) if nv else float("nan")))
    return out


def composite_agg(reader: IndexReader, key_column: str, size: int = 10,
                  after: str | None = None) -> tuple[list[tuple[str, int]],
                                                     str | None]:
    """ES ``composite`` aggregation over one keyword docvalue source:
    buckets in ascending key order, paginated with an ``after_key`` cursor
    — the scalable way to enumerate ALL buckets (a ``terms`` agg top-N
    cannot page). Returns (buckets, after_key): ``buckets`` is up to
    ``size`` (key, doc_count) pairs strictly after ``after``; ``after_key``
    is the last key returned (None when exhausted — pass it back to get
    the next page).

    Distributed shape: per-batch (key, count) value-count partials over the
    one pruned column, filtered to key > after AT THE MAP SIDE so a deep
    page never ships earlier buckets; the driver merges and truncates. At
    10^12 docs the partial row count is bounded by (distinct keys after
    cursor) × batches — for high-cardinality sources the map-side cursor
    filter is what keeps pages O(page), not O(all buckets)."""
    from collections import Counter as _Counter

    def partial(t: pa.Table) -> pa.Table:
        col = t[key_column].drop_null().combine_chunks()
        col = col.cast(pa.large_string())
        if after is not None:
            col = col.filter(pc.greater(col, pa.scalar(after)))
        vc = pc.value_counts(col)
        return pa.table({"key": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = _read_dv(reader, key_column).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc: _Counter = _Counter()
    for row in parts:
        acc[row["key"]] += int(row["n"])
    buckets = sorted(acc.items())[:size]
    exhausted = len(buckets) == len(acc)
    return buckets, (buckets[-1][0] if buckets and not exhausted else None)


def terms_terms_agg(reader: IndexReader, outer_column: str,
                    inner_column: str, size: int | None = None,
                    inner_size: int | None = None
                    ) -> list[tuple[str, str, int]]:
    """Two-level bucket composition — ES ``terms`` agg with a nested
    ``terms`` sub-aggregation (the lang × source dashboard breakdown).

    Distributed end-to-end: per-batch (outer, inner, count) partials over
    the two pruned docvalue columns, DISTRIBUTED ``groupby`` merge (round
    4 folded every distinct pair into a driver-side Counter). ``size``
    caps like ES's per-level ``size``: the top ``size`` OUTER buckets by
    total doc_count (distributed sort+limit over the outer totals — ≤ size
    keys ever reach the driver), then the top ``inner_size`` (default 10)
    inner buckets per surviving outer, selected in a distributed
    ``map_groups`` — driver rows ≤ size·inner_size. ``size=None`` (the
    gate configuration) enumerates everything. Docs with a null key at
    either level are skipped. Returns [(outer, inner, doc_count)] sorted
    lexicographically when uncapped; capped output orders outer buckets by
    (total doc_count desc, key asc) and inner by (doc_count desc, key
    asc) — ES bucket order."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[outer_column]),
                             pc.is_valid(t[inner_column])))
        import pandas as pd

        pdf = pd.DataFrame({
            "o": t[outer_column].to_pandas().astype(str),
            "i": t[inner_column].to_pandas().astype(str),
        })
        g = pdf.groupby(["o", "i"], sort=True).size().reset_index(name="n")
        return pa.table({"o": pa.array(g["o"], pa.large_string()),
                         "i": pa.array(g["i"], pa.large_string()),
                         "n": pa.array(g["n"].to_numpy(np.int64))})

    import ray.data as rd
    from ray.data.aggregate import Sum

    pairs = rd.read_parquet(
        _dv_path(reader), columns=[outer_column, inner_column]).map_batches(
        partial, batch_format="pyarrow").groupby(["o", "i"]).aggregate(
        Sum("n", alias_name="n"))
    if size is None:
        rows = pairs.take_all()
        return sorted((r["o"], r["i"], int(r["n"])) for r in rows)

    inner_size = 10 if inner_size is None else inner_size
    # consumed twice below (totals + filter) — materialize the pair-level
    # table once (bounded by pair cardinality, spills to the object store)
    pairs = pairs.materialize()
    totals = pairs.groupby("o").aggregate(Sum("n", alias_name="tot"))
    top_outer = totals.sort(["tot", "o"], descending=[True, False]).limit(
        size).take_all()  # ≤ size rows on the driver
    order = {r["o"]: rank for rank, r in enumerate(top_outer)}

    def keep_outer(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["o"], value_set=pa.array(list(order), pa.string()))
        return t.filter(mask)

    import pandas as pd

    def top_inner(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", "i"], ascending=[False, True],
                          kind="stable")
        return g.head(inner_size)

    rows = (pairs.map_batches(keep_outer, batch_format="pyarrow")
            .groupby("o").map_groups(top_inner, batch_format="pandas")
            .take_all())  # ≤ size·inner_size rows
    rows.sort(key=lambda r: (order[r["o"]], -int(r["n"]), r["i"]))
    return [(r["o"], r["i"], int(r["n"])) for r in rows]


def top_hits_agg(reader: IndexReader, key_column: str, sort_column: str,
                 n_per_bucket: int = 3,
                 descending: bool = True,
                 tie_column: str = "doc_id",
                 size: int | None = None) -> list[tuple]:
    """ES ``terms`` aggregation with a ``top_hits`` sub-aggregation sorted
    by a docvalue: per key bucket, the ``n_per_bucket`` best docs by
    ``sort_column`` (tie-break ascending doc_id — the engine's total order
    without a scoring clause; ES [field, _id]).

    Distributed end-to-end: each batch keeps its own ≤n rows PER KEY over
    the pruned (doc_id, key, sort) columns (a per-bucket top-n partial),
    then a DISTRIBUTED ``groupby(key).map_groups`` reduces every bucket to
    its final ≤n rows — the driver reads ≤ n·keys rows (round 4 merged the
    n·keys·batches partial table driver-side). ``size`` caps the BUCKET
    count the ES way: the top ``size`` keys by doc_count are selected with
    a distributed sort+limit over per-batch key counts, the reduce is
    filtered to them, and the driver sees ≤ n·size rows. Docs with a null
    key or null sort value are skipped (ES missing is opt-in / sort skips
    missing). ``tie_column`` picks the tie-break order (default internal
    doc_id, compared NUMERICALLY; string tie columns like ``"url"``
    compare in string order — the [field, _id]-style order the SQL oracles
    can express). Timestamp/date sort values stay int64 through the
    partial AND the merge (epoch-ns exceeds float64's 2^53 integer range —
    a float cast collapses values within ~256 ns); they convert to float
    only in the returned tuples. Returns [(key, doc_id, value)] sorted by
    (key asc, value order, tie asc); capped output orders buckets by
    (doc_count desc, key asc) — ES bucket order — keeping the in-bucket
    hit order."""
    import pandas as pd
    import ray.data as rd

    cols = ["doc_id", key_column, sort_column]
    if tie_column not in cols:
        cols.append(tie_column)

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.is_valid(t[key_column]),
                             pc.is_valid(t[sort_column])))
        v = t[sort_column].combine_chunks()
        if pa.types.is_timestamp(v.type) or pa.types.is_date(v.type):
            v = v.cast(pa.int64())          # exact — never through float64
        elif not pa.types.is_integer(v.type):
            v = v.cast(pa.float64())
        tie = t[tie_column].combine_chunks()
        if not (pa.types.is_integer(tie.type)
                or pa.types.is_floating(tie.type)):
            tie = tie.cast(pa.large_string())
        if not t.num_rows:
            return pa.table({"key": pa.array([], pa.large_string()),
                             "doc_id": pa.array([], pa.uint64()),
                             "tie": tie, "v": v})
        pdf = pd.DataFrame({
            "key": t[key_column].to_pandas().astype(str),
            "doc_id": t["doc_id"].to_numpy().astype(np.uint64),
            "tie": tie.to_pandas(),
            "v": v.to_numpy(zero_copy_only=False),
        })
        pdf = pdf.sort_values(["key", "v", "tie"],
                              ascending=[True, not descending, True])
        pdf = pdf.groupby("key", sort=False).head(n_per_bucket)
        return pa.table({
            "key": pa.array(pdf["key"], pa.large_string()),
            "doc_id": pa.array(pdf["doc_id"].to_numpy(), pa.uint64()),
            "tie": pa.Array.from_pandas(pdf["tie"], type=tie.type),
            "v": pa.Array.from_pandas(pdf["v"], type=v.type),
        })

    partials = rd.read_parquet(
        _dv_path(reader), columns=cols
    ).map_batches(partial, batch_format="pyarrow")

    key_order = None
    if size is not None:
        from ray.data.aggregate import Sum

        def key_counts(t: pa.Table) -> pa.Table:
            col = t[key_column].drop_null().combine_chunks().cast(
                pa.large_string())
            vc = pc.value_counts(col)
            return pa.table({"key": vc.field("values"),
                             "n": pc.cast(vc.field("counts"), pa.int64())})

        top = (rd.read_parquet(_dv_path(reader), columns=[key_column])
               .map_batches(key_counts, batch_format="pyarrow")
               .groupby("key").aggregate(Sum("n", alias_name="n"))
               .sort(["n", "key"], descending=[True, False])
               .limit(size).take_all())  # ≤ size rows on the driver
        key_order = {r["key"]: rank for rank, r in enumerate(top)}
        keep = pa.array(list(key_order), pa.large_string())
        partials = partials.map_batches(
            lambda t, _k=keep: t.filter(pc.is_in(t["key"], value_set=_k)),
            batch_format="pyarrow")

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["v", "tie"], ascending=[not descending, True],
                          kind="stable")
        return g.head(n_per_bucket)

    rows = (partials.groupby("key")
            .map_groups(reduce_bucket, batch_format="pandas")
            .take_all())  # ≤ n·keys (or n·size) rows on the driver
    if key_order is None:
        rows.sort(key=lambda r: (r["key"],
                                 -r["v"] if descending else r["v"],
                                 r["tie"]))
    else:
        rows.sort(key=lambda r: (key_order[r["key"]],
                                 -r["v"] if descending else r["v"],
                                 r["tie"]))
    return [(str(r["key"]), int(r["doc_id"]), float(r["v"])) for r in rows]


def bucket_pipeline_agg(reader: IndexReader, key_column: str,
                        value_column: str, metric: str = "avg") -> dict:
    """ES sibling PIPELINE aggregations (``avg_bucket`` / ``max_bucket`` /
    ``min_bucket`` / ``sum_bucket``) over a terms+avg aggregation: compute
    per-bucket avg(value), then fold the BUCKET VALUES (each bucket counts
    once, regardless of doc_count — ES pipeline semantics).

    Returns {"buckets": [(key, avg)...], metric: value, and for
    max/min_bucket "keys": [winning keys]} — the winning-key list mirrors
    ES's ``keys`` array (ties all reported, ascending). The heavy lifting
    is the existing distributed terms_metric_agg; the pipeline fold is
    driver-side over the tiny bucket table, exactly like ES's reducer."""
    rows = terms_metric_agg(reader, key_column, value_column)
    buckets = [(k, avg) for (k, n, s, avg, mn, mx) in rows
               if not np.isnan(avg)]
    if not buckets:
        return {"buckets": [], metric: float("nan")}
    vals = np.asarray([v for _, v in buckets], np.float64)
    out: dict = {"buckets": buckets}
    if metric == "avg":
        out["avg"] = float(vals.mean())
    elif metric == "sum":
        out["sum"] = float(vals.sum())
    elif metric in ("max", "min"):
        best = vals.max() if metric == "max" else vals.min()
        out[metric] = float(best)
        out["keys"] = sorted(k for (k, v), bv in zip(buckets, vals == best)
                             if bv)
    else:
        raise ValueError(f"unknown pipeline metric {metric!r}")
    return out


def extended_stats_agg(reader: IndexReader, column: str) -> dict:
    """ES ``extended_stats``: stats plus sum_of_squares / variance /
    std_deviation (population variance — ES semantics), nulls skipped.
    Same execution shape as ``stats_agg``: one 5-number partial row per
    batch, exact driver merge (variance from the merged Σx, Σx² — no
    per-batch variance folding needed)."""

    def partial(t: pa.Table) -> pa.Table:
        col = t[column].drop_null().cast(pa.float64()).combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table({"n": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "ss": pa.array([], pa.float64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "s": pa.array([float(v.sum())]),
            "ss": pa.array([float((v * v).sum())]),
            "mn": pa.array([float(v.min())]),
            "mx": pa.array([float(v.max())]),
        })

    parts = _read_dv(reader, column).map_batches(
        partial, batch_format="pyarrow").take_all()
    if not parts:
        return {"count": 0, "min": None, "max": None, "sum": 0.0,
                "avg": None, "sum_of_squares": 0.0, "variance": None,
                "std_deviation": None}
    n = int(sum(p["n"] for p in parts))
    s = float(sum(p["s"] for p in parts))
    ss = float(sum(p["ss"] for p in parts))
    avg = s / n
    var = max(0.0, ss / n - avg * avg)
    return {"count": n, "min": min(p["mn"] for p in parts),
            "max": max(p["mx"] for p in parts), "sum": s, "avg": avg,
            "sum_of_squares": ss, "variance": var,
            "std_deviation": var ** 0.5}

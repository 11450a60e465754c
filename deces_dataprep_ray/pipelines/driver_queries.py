"""Driver-facing query implementations (one per SURVEY.md §2 operator family).

Each function takes ``sf_dir`` (a directory of the driver's parquet tables)
and returns a small result the driver hashes against the DuckDB oracle SQL in
``__ray_entry__.oracle_sql``. Column names here must match the SQL aliases
exactly; float columns are quantized with :func:`round_away` (DuckDB ROUND
semantics) on both sides.

These exercise the dataprep stage library (stages/__init__.py), the
aggregation/shuffle paths, the analyzer, the dedup/ANN/text-analysis stages
and the full index+BM25 engine — all Ray-Data-first.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Count, Mean, Sum

from ..functions.analysis import tokenize_many
from ..stages import (
    BroadcastJoin,
    DeleteColumns,
    MapColumns,
    ParseDate,
    RegexReplace,
)


def round_away(x, nd: int):
    """Round half away from zero (DuckDB ROUND semantics; numpy's is
    half-even)."""
    x = np.asarray(x, dtype=np.float64)
    f = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                           columns=columns)


# --- relational / dataprep-stage ops ---------------------------------------

def q_filter_project(sf_dir: str) -> pd.DataFrame:
    """Vectorized filter + computed column (stage analogue of recipe
    replace/exec steps over a fact table)."""
    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount",
                "l_shipdate"])

    def fx(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_linenumber": t["l_linenumber"],
            "revenue": rev,
        })

    return ds.map_batches(fx, batch_format="pyarrow").to_pandas()


def q_groupby_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped grouped aggregate (groupby shuffle + combiners)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount"])
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_price"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="n"),
        )
        .to_pandas()
    )
    out["sum_qty"] = round_away(out["sum_qty"], 2)
    out["sum_price"] = round_away(out["sum_price"], 2)
    out["avg_disc"] = round_away(out["avg_disc"], 6)
    return out


def q_broadcast_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast equi-join (the reference's in_memory join,
    `recipes/deces_dataprep.yml:135-141`) + grouped rollup."""
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_mktsegment"])
    join = BroadcastJoin(cust, on={"o_custkey": "c_custkey"},
                         select={"segment": "c_mktsegment"})
    ds = join.apply(_read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]))
    out = (
        ds.groupby("segment")
        .aggregate(Count(alias_name="n_orders"),
                   Sum("o_totalprice", alias_name="sum_total"))
        .to_pandas()
    )
    out["sum_total"] = round_away(out["sum_total"], 2)
    return out


def q_anti_join(sf_dir: str) -> pd.DataFrame:
    """Broadcast anti-join (the oppositions pattern,
    `recipes/deces_dataprep.yml:37-52`): lineitems whose order is not a
    high-value order."""
    orders = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                           columns=["o_orderkey", "o_totalprice"])
    hi = orders.filter(pc.greater(orders["o_totalprice"], 150000.0))
    anti = BroadcastJoin(hi, on={"l_orderkey": "o_orderkey"}, anti=True)
    ds = anti.apply(_read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber"]))
    return ds.to_pandas().sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


def q_sort_limit(sf_dir: str) -> pd.DataFrame:
    """Global sort + limit (top-k by value)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)
    return out.to_pandas()


def q_regex_replace(sf_dir: str) -> pd.DataFrame:
    """Regex-replace cascade (recipe ``replace`` steps,
    `recipes/deces_dataprep.yml:80-94`)."""
    stage = RegexReplace(select="text", rules=[("[aeiou]", ""), ("  +", " ")])
    ds = stage.apply(_read(sf_dir, "documents", ["doc_id", "text"]))

    def ln(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chars_devoweled": pc.utf8_length(t["text"]),
        })

    return ds.map_batches(ln, batch_format="pyarrow").to_pandas()


def q_parse_format_date(sf_dir: str) -> pd.DataFrame:
    """Date format → parse round-trip (recipe ``parsedate``,
    `recipes/deces_dataprep.yml:95-97`)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def fmt(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "od": pc.strftime(t["o_orderdate"], format="%Y%m%d"),
        })

    ds = ds.map_batches(fmt, batch_format="pyarrow")
    ds = ParseDate(select="od", format="%Y%m%d").apply(ds)

    def yr(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "od": pc.strftime(t["od"], format="%Y%m%d"),
            "yr": pc.year(t["od"]),
        })

    return ds.map_batches(yr, batch_format="pyarrow").to_pandas()


def q_map_delete(sf_dir: str) -> pd.DataFrame:
    """Column alias + delete (recipe ``map``/``delete``,
    `recipes/deces_dataprep.yml:32-35,66-67`)."""
    ds = _read(sf_dir, "customer")
    ds = MapColumns({"cust_id": "c_custkey", "segment": "c_mktsegment"}).apply(ds)
    ds = DeleteColumns(select="c_.*").apply(ds)
    return ds.to_pandas()


def q_distinct(sf_dir: str) -> pd.DataFrame:
    """Distinct values (set op; shuffle)."""
    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def q_union_counts(sf_dir: str) -> pd.DataFrame:
    """Union of two filtered branches → count."""
    a = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]).filter(
        expr="o_orderstatus == 'F'")
    b = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]).filter(
        expr="o_totalprice > 200000.0")
    n = a.union(b).count()
    return pd.DataFrame({"n": [n]})


def q_window_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling-window aggregate over the event stream (groupby on a
    computed hour bucket — Ray Data has no event-time windows; SURVEY.md
    'streaming-shaped workloads')."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = round_away(out["sum_value"], 4)
    return out


def q_hash_join(sf_dir: str) -> pd.DataFrame:
    """Large x large partitioned hash join (both sides shuffled by key
    bucket — the join class the reference lacks; SURVEY.md §2.5) + rollup."""
    from ..stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    items = _read(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount"])
    joined = hash_join(orders, items, {"o_orderkey": "l_orderkey"},
                       how="inner", bucket_count=32)

    def rev(t: pa.Table) -> pa.Table:
        r = pc.multiply(t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({"o_orderpriority": t["o_orderpriority"],
                         "revenue": r})

    out = (joined.map_batches(rev, batch_format="pyarrow")
           .groupby("o_orderpriority")
           .aggregate(Count(alias_name="n"),
                      Sum("revenue", alias_name="sum_rev"))
           .to_pandas())
    out["sum_rev"] = round_away(out["sum_rev"], 2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_sessionize(sf_dir: str) -> pd.DataFrame:
    """Sessionization over the event log (streaming-shaped workload,
    SURVEY.md §2.5): per user, a >30-minute gap starts a new session —
    groupby(user).map_groups over ts-sorted groups (Ray Data has no
    event-time windows; the ordering assumption is per-group sort)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff()
        n = int(1 + (gap > pd.Timedelta(minutes=30)).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_sessions": [n]})

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    return out.to_pandas().sort_values("user_id").reset_index(drop=True)


def q_top_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-3 events per event_type by (value desc, event_id asc) — grouped
    top-k via map_groups (the window-function shape)."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["value", "event_id"],
                             ascending=[False, True]).head(3)

    out = ds.groupby("event_type").map_groups(top3, batch_format="pandas")
    return (out.to_pandas()[["event_type", "event_id", "value"]]
            .sort_values(["event_type", "event_id"]).reset_index(drop=True))


# --- text / fulltext ops ---------------------------------------------------

def q_token_count(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tc(t: pa.Table) -> pa.Table:
        toks = tokenize_many(t["text"].to_pylist())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array([len(x) for x in toks], pa.int64()),
        })

    return ds.map_batches(tc, batch_format="pyarrow").to_pandas()


def _explode_terms(t: pa.Table) -> pa.Table:
    toks = tokenize_many(t["text"].to_pylist())
    lens = np.fromiter((len(x) for x in toks), np.int64, len(toks))
    flat = [w for ws in toks for w in ws]
    return pa.table({
        "doc_id": pa.array(np.repeat(t["doc_id"].to_numpy(), lens)),
        "term": pa.array(flat, pa.string()),
    })


def q_term_df(sf_dir: str) -> pd.DataFrame:
    """Document frequency per term — the index df pre-pass as a query.
    Map-side combine: per-batch unique before the groupby."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_many(t["text"].to_pylist())
        terms, dfs = [], []
        agg: dict[str, int] = {}
        for ws in toks:
            for w in set(ws):
                agg[w] = agg.get(w, 0) + 1
        for k, v in agg.items():
            terms.append(k)
            dfs.append(v)
        return pa.table({"term": pa.array(terms, pa.string()),
                         "df": pa.array(dfs, pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )


def q_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top 20 terms by collection frequency (cf desc, term asc)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        toks = tokenize_many(t["text"].to_pylist())
        agg: dict[str, int] = {}
        for ws in toks:
            for w in ws:
                agg[w] = agg.get(w, 0) + 1
        return pa.table({"term": pa.array(list(agg), pa.string()),
                         "cf": pa.array(list(agg.values()), pa.int64())})

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"))
        .sort(["cf", "term"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    return out


def q_doc_stats(sf_dir: str) -> pd.DataFrame:
    """Global corpus stats (N, total_dl, avgdl) — the BM25 stats pass."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tc(t: pa.Table) -> pa.Table:
        toks = tokenize_many(t["text"].to_pylist())
        return pa.table({"dl": pa.array([len(x) for x in toks], pa.int64())})

    agg = ds.map_batches(tc, batch_format="pyarrow").aggregate(
        Sum("dl", alias_name="total_dl"), Count(alias_name="n_docs"))
    n, tot = int(agg["n_docs"]), int(agg["total_dl"])
    return pd.DataFrame({
        "n_docs": [n],
        "total_dl": [tot],
        "avgdl": round_away([tot / n], 6),
    })


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Exact dedup: min doc_id per distinct text (content-hash groupby)."""
    from ..stages.dedup import exact_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_duplicates(ds).to_pandas()[["doc_id", "n_copies"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Exact content fingerprint (md5) per doc — SQL-checkable."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        return pa.table({
            "doc_id": t["doc_id"],
            "fp_md5": pa.array(
                [hashlib.md5(("" if x is None else x).encode()).hexdigest()
                 for x in texts], pa.string()),
        })

    return ds.map_batches(fp, batch_format="pyarrow").to_pandas()


def q_quality(sf_dir: str) -> pd.DataFrame:
    """Quality features per doc (stopword ratio vs a fixed set)."""
    from ..stages.text import QualityScore

    stage = QualityScore(text_col="text",
                         stopwords=frozenset({"the", "a", "data", "key"}))
    ds = stage.apply(_read(sf_dir, "documents", ["doc_id", "text"]))
    out = ds.to_pandas()[["doc_id", "q_n_chars", "q_n_tokens", "q_stop_ratio"]]
    out["q_stop_ratio"] = round_away(out["q_stop_ratio"], 6)
    return out


def q_ann_cosine(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 embedding (broadcast query
    matrix, per-batch matmul, tiny final merge)."""
    from ..stages.ann import brute_force_topk

    q = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    qvec = np.asarray(q.filter(pc.equal(q["vec_id"], 0))["embedding"][0].as_py(),
                      dtype=np.float32)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id != 0")
    out = brute_force_topk(ds, qvec[None, :], k=10)
    out = out[["vec_id", "cosine"]].copy()
    # DuckDB computes list_cosine_similarity at float32 precision (~6e-8 off
    # from our float64) — quantize to 4 decimals on both sides
    out["cosine"] = round_away(out["cosine"], 4)
    return out.reset_index(drop=True)


# --- the flagship: full index build + BM25 top-k ---------------------------

def _index_for(sf_dir: str) -> str:
    """Build (once, resumable) an index over sf_dir's documents table."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"{doc_path}:{os.path.getsize(doc_path)}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", tag)

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(urls, pa.string()), "text": t["text"]})

    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"]).map_batches(
        add_url, batch_format="pyarrow")
    build_index(ds, index_dir, num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def q_bm25_topk(sf_dir: str) -> pd.DataFrame:
    """End-to-end: build the inverted index over ``documents``, run BM25
    top-10 for a fixed query through the real serving path
    (``search(algorithm="auto")`` — exact/pruned by corpus shape; WAND stays
    a rank-identity cross-check in tests), map urls back to doc_ids. The
    DuckDB oracle recomputes BM25 relationally (same k1/b/idf formula)."""
    from ..index.query import search
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    # fetch deep then re-rank by (rounded score, doc_id): mathematical score
    # ties can differ between engines at 1 ulp, so the rounded key is the
    # only cross-engine-stable ordering
    res = search(reader, "data spark window", k=200)
    urls = reader.resolve_urls([d for d, _ in res])
    df = pd.DataFrame({
        "orig_id": [int(urls[d].removeprefix("doc://")) for d, _ in res],
        "score": round_away([s for _, s in res], 6),
    })
    df = df.sort_values(["score", "orig_id"], ascending=[False, True]).head(10)
    return pd.DataFrame({"doc_id": df["orig_id"].to_numpy(),
                         "score": df["score"].to_numpy()})


def _pairs_to_pandas(ds, float_col: str | None = None) -> pd.DataFrame:
    """Normalize a (possibly empty) pair dataset to a typed DataFrame."""
    out = ds.to_pandas()
    if out.empty:
        cols = {"id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64")}
        if float_col:
            cols[float_col] = pd.Series([], dtype="float64")
        return pd.DataFrame(cols)
    if float_col:
        out[float_col] = round_away(out[float_col], 6)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _rounded_topk(res, reader, k=10):
    """Deep-fetch + re-rank by (rounded score, doc_id) — the only
    cross-engine-stable ordering (see q_bm25_topk)."""
    urls = reader.resolve_urls([d for d, _ in res])
    df = pd.DataFrame({
        "orig_id": [int(urls[d].removeprefix("doc://")) for d, _ in res],
        "score": round_away([s for _, s in res], 6),
    })
    df = df.sort_values(["score", "orig_id"], ascending=[False, True]).head(k)
    return pd.DataFrame({"doc_id": df["orig_id"].to_numpy(),
                         "score": df["score"].to_numpy()})


def q_bm25_and(sf_dir: str) -> pd.DataFrame:
    """Conjunctive BM25 (ES match operator=and): docs containing ALL query
    terms, scored identically to the OR path."""
    from ..index.query import search_and
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = search_and(reader, "data spark window", k=200)
    return _rounded_topk(res, reader)


def q_bm25_prefix(sf_dir: str) -> pd.DataFrame:
    """Prefix query (the reference's index_prefixes use case,
    `datasets/deces_index.yml:79-82`): s* expands via the term dictionary,
    expanded set scores as OR BM25."""
    from ..index.query import search_prefix
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = search_prefix(reader, "s*", k=200)
    return _rounded_topk(res, reader)


# --- fielded index: per-field BM25 + keyword / range / date / geo ----------

def _fielded_index_for(sf_dir: str) -> str:
    """Fielded index over ``documents``: analyzed fields text+source, keyword
    field lang, docvalues n_chars + lang + source (the reference's per-field
    mapping shape; lang doubles as the collapse key, lang × source as the
    nested-buckets pair)."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"fielded3:{doc_path}:{os.path.getsize(doc_path)}".encode()
    ).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "fld_" + tag)

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        return t.append_column("url", pa.array(urls, pa.string()))

    ds = rd.read_parquet(doc_path,
                         columns=["doc_id", "text", "source", "lang",
                                  "n_chars"]).map_batches(
        add_url, batch_format="pyarrow")
    build_index(ds, index_dir,
                fields={"text": "text", "source": "source"},
                keyword_fields={"lang": "lang"},
                docvalue_fields={"n_chars": "n_chars", "lang_dv": "lang",
                                 "source_dv": "source"},
                num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def _events_index_for(sf_dir: str) -> str:
    """Fielded index over ``events``: analyzed props, ts docvalue (the
    reference's date-typed field + match query shape,
    `datasets/deces_index.yml:86-88,125-127`)."""
    from ..index.build import build_index

    path = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.sha256(
        f"events:{path}:{os.path.getsize(path)}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "evt_" + tag)

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["event_id"].to_pylist()]
        return t.append_column("url", pa.array(urls, pa.string()))

    ds = rd.read_parquet(path, columns=["event_id", "props", "ts"]).map_batches(
        add_url, batch_format="pyarrow")
    build_index(ds, index_dir,
                fields={"props": "props"},
                docvalue_fields={"ts": "ts"},
                num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def _fielded_topk(reader, res, k=10, id_col="doc_id"):
    urls = reader.resolve_urls([d for d, _ in res])
    df = pd.DataFrame({
        "orig_id": [int(urls[d].removeprefix("doc://")) for d, _ in res],
        "score": round_away([s for _, s in res], 6),
    })
    df = df.sort_values(["score", "orig_id"], ascending=[False, True]).head(k)
    return pd.DataFrame({id_col: df["orig_id"].to_numpy(),
                         "score": df["score"].to_numpy()})


def q_bm25_fielded(sf_dir: str) -> pd.DataFrame:
    """Multi-field bool query: match(text) + match(source) summed, each with
    per-field idf (field docCount) and length norm (field avgdl)."""
    from ..index.fielded import search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window"),
                                 ("source", "src3")], k=200)
    return _fielded_topk(reader, res)


def q_keyword_filter(sf_dir: str) -> pd.DataFrame:
    """BM25 match + keyword raw sub-field filter (lang = 'en') — the
    reference's dominant query shape (analyzed match + exact filter)."""
    from ..index.fielded import KeywordFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window")], k=200,
                        filters=[KeywordFilter("lang", "en")])
    return _fielded_topk(reader, res)


def q_bm25_msm(sf_dir: str) -> pd.DataFrame:
    """ES minimum_should_match: docs containing >= 2 of the 3 query terms."""
    from ..index.query import search_min_should_match
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = search_min_should_match(reader, "data spark window", k=200,
                                  min_match=2)
    return _rounded_topk(res, reader)


def q_bm25_boosted(sf_dir: str) -> pd.DataFrame:
    """Per-clause boosts (ES field^boost): text clause x1 + source clause
    x2.5 summed."""
    from ..index.fielded import search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window", 1.0),
                                 ("source", "src3", 2.5)], k=200)
    return _fielded_topk(reader, res)


def q_keyword_must_not(sf_dir: str) -> pd.DataFrame:
    """BM25 match + keyword EXCLUSION (ES bool must_not): docs not tagged
    lang='de'."""
    from ..index.fielded import NotKeywordFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window")], k=200,
                        filters=[NotKeywordFilter("lang", "de")])
    return _fielded_topk(reader, res)


def q_range_filter(sf_dir: str) -> pd.DataFrame:
    """BM25 match + numeric range filter over a docvalues column
    (AGE_DECES-shaped ``short`` field, `deces_index.yml:128-129`)."""
    from ..index.fielded import RangeFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window")], k=200,
                        filters=[RangeFilter("n_chars", 200, 400)])
    return _fielded_topk(reader, res)


def q_date_range(sf_dir: str) -> pd.DataFrame:
    """BM25 match + date range filter over a timestamp docvalues column
    (DATE_*_NORM-shaped ``date`` fields, `deces_index.yml:86-88`)."""
    from ..index.fielded import RangeFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_events_index_for(sf_dir))
    res = search_fields(
        reader, [("props", "87")], k=400,
        filters=[RangeFilter("ts", pd.Timestamp("2024-01-10"),
                             pd.Timestamp("2024-01-20"))])
    return _fielded_topk(reader, res, k=10, id_col="event_id")


def q_geo_radius(sf_dir: str) -> pd.DataFrame:
    """Geo radius filter stage (geo_point distance query,
    `deces_index.yml:115-116`): deterministic synthetic lat/lon derived from
    event_id, haversine <= 2000 km of (45, 5)."""
    from ..stages.geo import geo_radius_filter

    ds = _read(sf_dir, "events", ["event_id"])

    def pts(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        lat = ((eid * 9973) % 18000) / 100.0 - 90.0
        lon = ((eid * 7919) % 36000) / 100.0 - 180.0
        return pa.table({"event_id": t["event_id"],
                         "lat": pa.array(lat, pa.float64()),
                         "lon": pa.array(lon, pa.float64())})

    ds = ds.map_batches(pts, batch_format="pyarrow")
    out = geo_radius_filter(ds, "lat", "lon", 45.0, 5.0, 2000.0).to_pandas()
    if out.empty:
        out = pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                            "lat": pd.Series([], dtype="float64"),
                            "lon": pd.Series([], dtype="float64")})
    return out.sort_values("event_id").reset_index(drop=True)


def q_dis_max(sf_dir: str) -> pd.DataFrame:
    """ES dis_max / multi_match best_fields: per-clause BM25 scores combine
    as best + tie_breaker * rest (tie_breaker=0.3) instead of the
    bool-should sum."""
    from ..index.fielded import search_dis_max
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_dis_max(reader, [("text", "data spark window"),
                                  ("source", "src3")],
                         k=200, tie_breaker=0.3)
    return _fielded_topk(reader, res)


def q_terms_filter(sf_dir: str) -> pd.DataFrame:
    """ES ``terms`` filter (SQL IN): match restricted to docs whose keyword
    field holds any of the listed values."""
    from ..index.fielded import TermsFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window")], k=200,
                        filters=[TermsFilter("lang", ["en", "fr"])])
    return _fielded_topk(reader, res)


def _nullable_index_for(sf_dir: str) -> str:
    """Fielded index over ``documents`` with a NULLABLE docvalue column
    (opt_chars = n_chars where source != 'src0', else NULL) — the ES
    missing-field shape the ``exists`` query serves."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"nullable:{doc_path}:{os.path.getsize(doc_path)}".encode()
    ).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "nul_" + tag)

    def prep(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        opt = pc.if_else(pc.equal(t["source"], "src0"),
                         pa.nulls(len(t), pa.int64()),
                         pc.cast(t["n_chars"], pa.int64()))
        return pa.table({"url": pa.array(urls, pa.string()),
                         "text": t["text"], "opt_chars": opt})

    ds = rd.read_parquet(doc_path,
                         columns=["doc_id", "text", "source",
                                  "n_chars"]).map_batches(
        prep, batch_format="pyarrow")
    build_index(ds, index_dir, fields={"text": "text"},
                docvalue_fields={"opt_chars": "opt_chars"},
                num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def q_exists_filter(sf_dir: str) -> pd.DataFrame:
    """ES ``exists`` query: match restricted to docs where a nullable
    docvalue column is non-null."""
    from ..index.fielded import ExistsFilter, search_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_nullable_index_for(sf_dir))
    res = search_fields(reader, [("text", "data spark window")], k=200,
                        filters=[ExistsFilter("opt_chars")])
    return _fielded_topk(reader, res)


def q_stats_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``stats`` aggregation over the n_chars docvalue column."""
    from ..index.aggs import stats_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    s = stats_agg(reader, "n_chars")
    return pd.DataFrame({
        "n": pd.Series([s["count"]], dtype="int64"),
        "mn": round_away([s["min"]], 6),
        "mx": round_away([s["max"]], 6),
        "sm": round_away([s["sum"]], 6),
        "avg": round_away([s["avg"]], 6),
    })


def q_histogram_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``histogram`` aggregation: fixed-interval (50) numeric buckets
    over n_chars."""
    from ..index.aggs import histogram_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    rows = histogram_agg(reader, "n_chars", interval=50.0)
    return pd.DataFrame({
        "bucket": pd.Series([b for b, _ in rows], dtype="float64"),
        "n": pd.Series([n for _, n in rows], dtype="int64"),
    })


def q_cardinality_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``cardinality`` aggregation (exact merge path — the HLL scale
    path is accuracy-tested in tests/test_aggs.py)."""
    from ..index.aggs import cardinality_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    n = cardinality_agg(reader, "n_chars", exact=True)
    return pd.DataFrame({"n_distinct": pd.Series([n], dtype="int64")})


def q_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition quality signals (top-unigram fraction,
    duplicated-word fraction, top-bigram fraction) per document."""
    from ..stages.text import RepetitionStats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(RepetitionStats(), batch_format="pyarrow").to_pandas()
    for c in ("top_unigram_frac", "dup_word_frac", "top_bigram_frac"):
        out[c] = round_away(out[c], 6)
    return (out[["doc_id", "top_unigram_frac", "dup_word_frac",
                 "top_bigram_frac"]]
            .sort_values("doc_id").reset_index(drop=True))


def q_significant_terms(sf_dir: str) -> pd.DataFrame:
    """ES ``significant_terms`` (JLH): text-field terms over-represented in
    the lang='en' foreground vs the whole corpus."""
    from ..index.aggs import significant_terms
    from ..index.fielded import KeywordFilter
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    rows = significant_terms(reader, [KeywordFilter("lang", "en")],
                             field="text", top_n=500, min_fg_df=5)
    # deep-fetch then re-rank by (rounded score, term): cross-engine-stable
    # ordering, same convention as the bm25 gates
    df = pd.DataFrame({
        "term": [t for t, _, _, _ in rows],
        "fg_df": pd.Series([f for _, f, _, _ in rows], dtype="int64"),
        "bg_df": pd.Series([b for _, _, b, _ in rows], dtype="int64"),
        "score": round_away([s for _, _, _, s in rows], 6),
    })
    return (df.sort_values(["score", "term"], ascending=[False, True])
            .head(10).reset_index(drop=True))


def q_percentiles_agg(sf_dir: str) -> pd.DataFrame:
    """ES ``percentiles`` aggregation — exact type-1 inverted CDF
    (percentile(q) = smallest v with cumulative count >= ceil(q*N)),
    mirrored verbatim by the SQL oracle."""
    from ..index.aggs import percentiles_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    qs = (0.25, 0.5, 0.75, 0.95)
    p = percentiles_agg(reader, "n_chars", qs=qs)
    return pd.DataFrame({
        "q": pd.Series(list(qs), dtype="float64"),
        "value": pd.Series([p[q] for q in qs], dtype="float64"),
    })


def _incremental_gens(sf_dir: str) -> tuple[list[str], str]:
    """Build (or reuse) the two doc_id-parity generation indexes over
    ``documents``; returns (index_dirs, cache_tag)."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"incr:{doc_path}:{os.path.getsize(doc_path)}".encode()).hexdigest()[:12]
    dirs = []
    for gen, parity in (("even", 0), ("odd", 1)):
        index_dir = os.path.join("/tmp", "dcray_index_cache",
                                 f"incr_{gen}_{tag}")
        dirs.append(index_dir)

        def gen_rows(t: pa.Table, _p=parity) -> pa.Table:
            ids = t["doc_id"].to_numpy()
            t = t.filter(pa.array(ids % 2 == _p))
            urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
            return pa.table({"url": pa.array(urls, pa.string()),
                             "text": t["text"]})

        ds = (rd.read_parquet(doc_path, columns=["doc_id", "text"])
              .map_batches(gen_rows, batch_format="pyarrow"))
        build_index(ds, index_dir, num_buckets=8, salt_shards=4,
                    head_min_df=64, input_tag=f"{gen}:{tag}",
                    batch_size=1024)
    return dirs, tag


def q_bm25_incremental(sf_dir: str) -> pd.DataFrame:
    """Incremental indexing: documents split into two generations (doc_id
    parity), each built as its own index; MultiReader serves the union with
    scores IDENTICAL to a full rebuild — the oracle is the very same
    relational BM25 over the whole table. Served through the block-max
    PRUNED path (generation bounds rescaled to the union avgdl,
    `index/multi.py term_segments`) — the 10^12-doc serving path; exact is
    the rank-identity cross-check in tests."""
    from ..index.multi import MultiReader
    from ..index.query import search_pruned

    dirs, _ = _incremental_gens(sf_dir)
    multi = MultiReader(dirs)
    res = search_pruned(multi, "data spark window", k=200)
    return _rounded_topk(res, multi)


def q_bm25_compacted(sf_dir: str) -> pd.DataFrame:
    """Generation compaction (the reference's monthly→annual rollup / ES
    force-merge, `Makefile:42`): the two parity generations are merged into
    ONE first-class index by ``compact_generations`` — no re-analysis, no
    shuffle (per-bucket decode → merge → re-encode with exact union-avgdl
    block bounds). Scores are identical to a full rebuild, so the oracle is
    the same relational BM25 over the whole table; served through the
    block-max pruned path with EXACT (not rescaled) bounds."""
    from ..index.compact import compact_generations
    from ..index.query import search_pruned
    from ..index.reader import IndexReader

    dirs, tag = _incremental_gens(sf_dir)
    out_dir = os.path.join("/tmp", "dcray_index_cache", f"cmp_{tag}")
    compact_generations(dirs, out_dir)
    reader = IndexReader(out_dir)
    res = search_pruned(reader, "data spark window", k=200)
    return _rounded_topk(res, reader)


def _positional_index_for(sf_dir: str) -> str:
    """Positional index over ``documents`` (store_positions=True)."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"pos:{doc_path}:{os.path.getsize(doc_path)}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "pos_" + tag)

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        return pa.table({"url": pa.array(urls, pa.string()), "text": t["text"]})

    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"]).map_batches(
        add_url, batch_format="pyarrow")
    build_index(ds, index_dir, num_buckets=8, salt_shards=4, head_min_df=64,
                store_positions=True, input_tag=tag, batch_size=1024)
    return index_dir


def _fielded_positional_index_for(sf_dir: str) -> str:
    """Fielded AND positional index over ``documents`` — the reference's
    real mapping shape (everything per-field, `deces_index.yml:42-157`)
    with phrase support: per-field position streams, per-field BM25 stats."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"fldpos:{doc_path}:{os.path.getsize(doc_path)}".encode()
    ).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "fldpos_" + tag)

    def add_url(t: pa.Table) -> pa.Table:
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        return t.append_column("url", pa.array(urls, pa.string()))

    ds = rd.read_parquet(doc_path,
                         columns=["doc_id", "text", "source", "lang"]
                         ).map_batches(add_url, batch_format="pyarrow")
    build_index(ds, index_dir,
                fields={"text": "text", "source": "source"},
                keyword_fields={"lang": "lang"},
                store_positions=True,
                num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def q_bm25_phrase_fielded(sf_dir: str) -> pd.DataFrame:
    """Phrase query on ONE field of a fielded positional index
    (match_phrase on an analyzed per-field mapping — the reference's
    natural phrase shape, e.g. phrase-on-NOM): 'data window' adjacent in
    the ``text`` field, scored with the FIELD's docCount/avgdl."""
    from ..index.query import search_phrase
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_positional_index_for(sf_dir))
    res = search_phrase(reader, "data window", k=400, field="text")
    return _rounded_topk(res, reader)


def q_bm25_phrase(sf_dir: str) -> pd.DataFrame:
    """Phrase query (ES match_phrase, slop 0) over the positional index:
    docs with 'data' immediately followed by 'spark', scored as the OR BM25
    of the phrase terms (frozen semantics, mirrored by the SQL oracle)."""
    from ..index.query import search_phrase
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    res = search_phrase(reader, "data spark", k=400)
    return _rounded_topk(res, reader)


def q_bm25_phrase_slop(sf_dir: str) -> pd.DataFrame:
    """Ordered-slop phrase: 'data window' with at most 1 inserted token
    (engine DP; oracle: position BETWEEN window)."""
    from ..index.query import search_phrase
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    res = search_phrase(reader, "data window", k=400, slop=1)
    return _rounded_topk(res, reader)


def q_bm25_fuzzy(sf_dir: str) -> pd.DataFrame:
    """Fuzzy match (the reference's raison d'être — typo-tolerant matching,
    ES ``fuzziness``): each token expands to dictionary terms within 1 edit,
    expanded set scores as OR BM25."""
    from ..index.query import search_fuzzy
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    # uncapped expansion so the SQL oracle (which has no expansion cap)
    # stays an exact mirror at any sf
    res = search_fuzzy(reader, "windoz graup", k=200, max_dist=1,
                       max_expansions=100_000)
    return _rounded_topk(res, reader)


def q_facet_counts(sf_dir: str) -> pd.DataFrame:
    """Keyword facet (ES terms aggregation): per-value doc counts read
    straight from the term dictionary's df — no corpus scan."""
    from ..index.fielded import facet_counts
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    rows = facet_counts(reader, "lang")
    return pd.DataFrame({"value": [v for v, _ in rows],
                         "n": pd.array([n for _, n in rows], dtype="int64")})


def q_facet_date_histogram(sf_dir: str) -> pd.DataFrame:
    """ES ``date_histogram`` aggregation (calendar day) over the events
    index's ts docvalue: distributed single-column partial counts merged
    driver-side (one row per (day, batch) crosses the cluster)."""
    from ..index.fielded import facet_date_histogram
    from ..index.reader import IndexReader

    reader = IndexReader(_events_index_for(sf_dir))
    rows = facet_date_histogram(reader, "ts", "day")
    return pd.DataFrame({
        "day": pd.Series([b for b, _ in rows], dtype="datetime64[us]"),
        "n": pd.array([n for _, n in rows], dtype="int64"),
    })


def q_bm25_search_after(sf_dir: str) -> pd.DataFrame:
    """Deep pagination (ES ``search_after``): page 2 (ranks 11-20) of the
    flagship BM25 query, fetched with the (rounded score, url) cursor of
    page 1's last hit. Total order is (score DESC, url ASC) — ES's
    [_score, _id] sort over the durable external id; the oracle is the same
    ranking LIMIT 10 OFFSET 10."""
    from ..index.query import search_after
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    q = "data spark window"
    page1 = search_after(reader, q, k=10)
    empty = pd.DataFrame({"doc_id": pd.array([], dtype="int64"),
                          "score": pd.array([], dtype="float64")})
    if len(page1) < 10:
        return empty
    cursor = (float(round_away(page1[-1][1], 6)), page1[-1][2])
    page2 = search_after(reader, q, k=10, after=cursor)
    if not page2:
        return empty
    return pd.DataFrame({
        "doc_id": [int(u.removeprefix("doc://")) for _, _, u in page2],
        "score": round_away([s for _, s, _ in page2], 6),
    })


def q_highlight(sf_dir: str) -> pd.DataFrame:
    """ES ``highlight``: the flagship query's top-10 hits, each with the
    ±3-token snippet around its first query-term occurrence. Source text is
    fetched straight from the (doc_id-ordered) documents parquet by
    row-group-pruned lookup — stored-source resolution without a corpus
    scan or a second copy of the text."""
    from ..index.docstore import DocStore
    from ..index.highlight import highlight_snippets
    from ..index.query import search
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    q = "data spark window"
    res = search(reader, q, k=200)
    urls = reader.resolve_urls([d for d, _ in res])
    df = pd.DataFrame({
        "orig_id": [int(urls[d].removeprefix("doc://")) for d, _ in res],
        "score": round_away([s for _, s in res], 6),
    }).sort_values(["score", "orig_id"], ascending=[False, True]).head(10)
    store = DocStore(paths=[os.path.join(sf_dir, "documents.parquet")])
    snips = highlight_snippets(store, df["orig_id"].tolist(), q, window=3)
    return pd.DataFrame({
        "doc_id": df["orig_id"].to_numpy(),
        "score": df["score"].to_numpy(),
        "snippet": [snips[int(d)] for d in df["orig_id"]],
    })


def q_embed_pairs_exact(sf_dir: str) -> pd.DataFrame:
    """Exact all-pairs cosine >= 0.4 over the embeddings table — the
    SQL-checkable baseline the LSH near-dup stage approximates."""
    from ..stages.ann import all_pairs_cosine

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = all_pairs_cosine(ds, 0.4).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    out["cosine"] = round_away(out["cosine"], 4)
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# --- rows-only (non-SQL-expressible) ---------------------------------------

def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    """MinHash near-dup pairs over WORD 3-gram shingles, exact-verified —
    SQL-checkable (round-4 ran the signature-estimated variant, rows-only;
    this is the ngram_dedup treatment on the classic web-dedup word-shingle
    domain). LSH candidates use 32 bands × 2 rows: per-pair miss
    probability (1 − j²)³² ≈ 1e-4 at j = 0.5 (lower above), and the
    candidate estimator filter sits 4σ below the threshold
    (margin 0.25, σ ≈ 0.0625 at 64 hashes) — the DuckDB oracle recomputes
    the exact word-trigram jaccard, and the deterministic seed makes the
    local sf0.01 equality check binding for the driver run.
    Signature-estimated MinHash (no verify pass) stays available via
    ``minhash_lsh_duplicates`` and is property-tested in
    tests/test_dedup_ann.py."""
    from ..stages.dedup import ngram_jaccard_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _pairs_to_pandas(
        ngram_jaccard_duplicates(ds, threshold=0.5, num_hashes=64,
                                 num_bands=32, candidate_margin=0.25,
                                 shingle_mode="word", n_words=3),
        "jaccard")


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import simhash_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _pairs_to_pandas(simhash_duplicates(ds))


def q_langid(sf_dir: str) -> pd.DataFrame:
    from ..stages.text import LangId

    ds = LangId(text_col="text").apply(_read(sf_dir, "documents", ["doc_id", "text"]))
    out = ds.to_pandas()[["doc_id", "lang_pred", "lang_score"]]
    out["lang_score"] = round_away(out["lang_score"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_ngram_dedup(sf_dir: str) -> pd.DataFrame:
    """Near-dup pairs verified by EXACT character-5-gram Jaccard — LSH
    proposes candidates, exact set-intersection verifies, so the output is
    SQL-checkable (DuckDB recomputes the same jaccard from substring
    5-grams). 32 bands × 2 rows keep the per-pair LSH miss probability at
    (1 − j²)³² ≤ 6e-7 for j ≥ 0.6, so candidate recall is effectively
    exact at verification thresholds."""
    from ..stages.dedup import ngram_jaccard_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return _pairs_to_pandas(
        ngram_jaccard_duplicates(ds, threshold=0.6, num_hashes=64,
                                 num_bands=32), "jaccard")


def q_embed_dedup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs via BANDED hyperplane LSH + exact
    cosine verify — SQL-checked against exact all-pairs cosine (round-4's
    single-table variant missed ~70% of threshold-0.4 pairs and was
    rows-only). At 64 bands × 4 bits the per-pair miss bound is ≈1.6e-5
    (docstring of ``embedding_near_duplicates_banded``); every emitted
    cosine is exact, so the oracle is the same SQL as ``embed_pairs_exact``
    (which remains the brute-force baseline gate — this one is the
    sub-quadratic scale path reaching the same answer)."""
    from ..stages.dedup import embedding_near_duplicates_banded

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_near_duplicates_banded(
        ds, threshold=0.4, num_bands=64, bits_per_band=4).to_pandas()
    if pairs.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64"),
                             "cosine": pd.Series([], dtype="float64")})
    # quantize like embed_pairs_exact: DuckDB list_cosine_similarity is
    # float32 (~6e-8 off our float64) — round ONCE from the raw value
    pairs["cosine"] = round_away(pairs["cosine"], 4)
    return pairs.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_ann_lsh(sf_dir: str) -> pd.DataFrame:
    """LSH-bucketed ANN against the PERSISTED signature index, gated in its
    EXACT configuration: ``probe_bits = nbits`` probes every bucket, which
    is identical to brute force by construction (tests/test_dedup_ann.py
    proves exact == brute force), so the ``ann_cosine`` SQL oracle applies
    verbatim — the round-4 rows-only gap closed. The approximate
    1-bit-probe serving mode (row-group-pruned reads) keeps its recall +
    pruning-ratio checks in tests."""
    from ..stages.ann import AnnIndex, build_ann_index

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha256(
        f"ann:{emb_path}:{os.path.getsize(emb_path)}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "ann_" + tag)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
            expr="vec_id != 0")
        build_ann_index(ds, index_dir, nbits=8)

    q = pq.read_table(emb_path)
    qvec = np.asarray(q.filter(pc.equal(q["vec_id"], 0))["embedding"][0].as_py(),
                      dtype=np.float32)
    idx = AnnIndex(index_dir)
    out = idx.topk(qvec[None, :], k=10, probe_bits=idx.meta["nbits"])
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = round_away(out["cosine"], 4)
    return out.reset_index(drop=True)


# --- round-3 query surfaces: wildcard/regexp/MLT, sort, collapse, ----------
# --- function_score, range/filters aggregations ----------------------------

def q_wildcard(sf_dir: str) -> pd.DataFrame:
    """ES wildcard query: 's?a*' expands against the term dictionary
    (? = one char, * = any run), expansion scores as OR BM25."""
    from ..index.query import search_wildcard
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    # uncapped: the oracle's LIKE enumerates every match (cap pytest-tested)
    res = search_wildcard(reader, "s?a*", k=200, max_expansions=10**6)
    return _rounded_topk(res, reader)


def q_regexp(sf_dir: str) -> pd.DataFrame:
    """ES regexp query: anchored full-term regex expansion over the
    dictionary, OR BM25 over the expansion."""
    from ..index.query import search_regexp
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    # uncapped: the oracle's regexp enumerates every match (cap pytest-tested)
    res = search_regexp(reader, "s[cm]a.*|.*der", k=200,
                        max_expansions=10**6)
    return _rounded_topk(res, reader)


def q_more_like_this(sf_dir: str) -> pd.DataFrame:
    """ES more_like_this with like-text: top max_query_terms terms by
    tf·idf (tf in the like-text, df from the dictionary) run as OR BM25.
    Like-text tokens: data×3, row×2, join×1 (mirrored in the oracle)."""
    from ..index.query import more_like_this
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = more_like_this(reader, "data data data row row join", k=200,
                         max_query_terms=2)
    return _rounded_topk(res, reader)


def q_sort_by_field(sf_dir: str) -> pd.DataFrame:
    """ES sort-by-docvalue (no scoring clause): top-10 docs by n_chars
    descending. Engine tie-break is internal doc_id; the gate re-ranks the
    deep-fetched prefix by (n_chars, orig_id) — the only cross-engine-stable
    order (internal ids are hash-assigned)."""
    from ..index.fielded import sort_by_field
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    got = sort_by_field(reader, "n_chars", k=2000, descending=True)
    urls = reader.resolve_urls(got["doc_id"].to_pylist())
    df = pd.DataFrame({
        "doc_id": [int(urls[int(d)].removeprefix("doc://"))
                   for d in got["doc_id"].to_pylist()],
        "n_chars": got["n_chars"].to_pylist(),
    })
    df = df.sort_values(["n_chars", "doc_id"],
                        ascending=[False, True]).head(10)
    return df.reset_index(drop=True)


def q_collapse(sf_dir: str) -> pd.DataFrame:
    """ES field collapsing: BM25 match on the text field collapsed on the
    lang docvalue — best score per lang. The gate reduces to
    (lang, rounded best score): the winning doc_id inside a group is
    1-ulp-tie-unstable across engines (tests pin it vs brute force)."""
    from ..index.fielded import collapse_topk
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = collapse_topk(reader, None, "lang_dv", k=10,
                        matches=[("text", "data spark window")])
    df = pd.DataFrame({
        "lang": [key for _, _, key in res],
        "best_score": round_away([s for _, s, _ in res], 6),
    })
    return df.sort_values("lang").reset_index(drop=True)


def q_function_score(sf_dir: str) -> pd.DataFrame:
    """ES function_score field_value_factor: BM25(text match) ×
    ln(1 + n_chars), missing=1."""
    from ..index.fielded import function_score
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = function_score(reader, None, "n_chars", k=200,
                         modifier="log1p", factor=1.0, missing=1.0,
                         boost_mode="multiply",
                         matches=[("text", "data spark window")])
    return _fielded_topk(reader, res)


def q_range_agg(sf_dir: str) -> pd.DataFrame:
    """ES range aggregation over the n_chars docvalue: [from, to) buckets,
    from inclusive, to exclusive, open edges allowed, overlaps counted in
    every bucket."""
    from ..index.aggs import range_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = range_agg(reader, "n_chars",
                    [(None, 150.0), (150.0, 300.0), (300.0, None),
                     (100.0, 400.0)])
    return pd.DataFrame({"key": [k for k, _ in res],
                         "doc_count": [int(n) for _, n in res]})


def q_filters_agg(sf_dir: str) -> pd.DataFrame:
    """ES filters aggregation: doc_count per named filter (keyword term via
    postings df, numeric range via predicate-pushdown docvalues)."""
    from ..index.aggs import filters_agg
    from ..index.fielded import KeywordFilter, RangeFilter
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = filters_agg(reader, {
        "en": KeywordFilter("lang", "en"),
        "mid": RangeFilter("n_chars", lo=100, hi=400),
    })
    return pd.DataFrame(
        {"name": sorted(res), "doc_count": [int(res[n]) for n in sorted(res)]})


def q_phrase_prefix(sf_dir: str) -> pd.DataFrame:
    """ES match_phrase_prefix: 'data s' — last token is a dictionary
    prefix; doc score = max over expansions of that completed phrase's
    score (BM25 sum of the completed phrase's unique terms)."""
    from ..index.query import search_phrase_prefix
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    # uncapped expansion: the SQL oracle enumerates every 's%' token, so
    # the engine must too (the ES max_expansions=50 default would silently
    # diverge on a vocabulary with >50 s-tokens; the cap itself is
    # pytest-verified in test_query_extra)
    res = search_phrase_prefix(reader, "data s", k=200,
                               max_expansions=10**6)
    return _rounded_topk(res, reader)


def q_terms_metric_agg(sf_dir: str) -> pd.DataFrame:
    """ES terms aggregation with metric sub-aggregations: per-lang bucket
    doc_count + sum/avg/min/max of n_chars."""
    from ..index.aggs import terms_metric_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = terms_metric_agg(reader, "lang_dv", "n_chars")
    return pd.DataFrame({
        "lang": [r[0] for r in res],
        "doc_count": [int(r[1]) for r in res],
        "sum_val": round_away([r[2] for r in res], 2),
        "avg_val": round_away([r[3] for r in res], 6),
        "min_val": round_away([r[4] for r in res], 2),
        "max_val": round_away([r[5] for r in res], 2),
    })


def q_suggest(sf_dir: str) -> pd.DataFrame:
    """ES term suggester: corrections for the misspelling 'spak' within 2
    edits, ranked (distance asc, df desc, term asc), top 5."""
    from ..index.query import suggest_terms
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = suggest_terms(reader, "spak", n=5, max_dist=2)
    return pd.DataFrame({"term": [t for t, _, _ in res],
                         "dist": [int(d) for _, d, _ in res],
                         "df": [int(f) for _, _, f in res]})


def q_composite_agg(sf_dir: str) -> pd.DataFrame:
    """ES composite aggregation: the lang buckets page strictly after the
    cursor 'de', ascending keys, size 3 — paginated bucket enumeration."""
    from ..index.aggs import composite_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    buckets, _after = composite_agg(reader, "lang_dv", size=3, after="de")
    return pd.DataFrame({"lang": [k for k, _ in buckets],
                         "doc_count": [int(n) for _, n in buckets]})


def q_terms_terms_agg(sf_dir: str) -> pd.DataFrame:
    """ES nested terms aggregation: lang buckets × source sub-buckets."""
    from ..index.aggs import terms_terms_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = terms_terms_agg(reader, "lang_dv", "source_dv")
    return pd.DataFrame({"lang": [o for o, _, _ in res],
                         "source": [i for _, i, _ in res],
                         "doc_count": [int(n) for _, _, n in res]})


def q_rescore(sf_dir: str) -> pd.DataFrame:
    """ES rescore: BM25('data row') re-ranked by +2× match_phrase
    'data spark' score. Window covers the whole sf0.01 match set so the
    SQL oracle is exact; the O(window) bounding is pytest-verified."""
    from ..index.query import rescore
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    res = rescore(reader, "data row", "data spark", k=200,
                  window_size=100_000, rescore_weight=2.0)
    return _rounded_topk(res, reader)


def q_bm25_tombstoned(sf_dir: str) -> pd.DataFrame:
    """Deletes via tombstones (ES live-docs): docs with orig id % 7 == 0
    are tombstoned in the newest generation, the generations compact (the
    force-merge reclaim), and BM25 over the compacted index must equal the
    relational BM25 over the SURVIVING docs — stats (N, avgdl, df) exactly
    adjusted, deleted postings gone. Generation dirs are COPIES so the
    ``bm25_incremental`` gate's cached dirs stay tombstone-free."""
    import shutil

    from ..index.compact import compact_generations
    from ..index.multi import tombstone_docs
    from ..index.query import search_exact
    from ..index.reader import IndexReader

    dirs, tag = _incremental_gens(sf_dir)
    tdirs = []
    for i, src in enumerate(dirs):
        t = os.path.join("/tmp", "dcray_index_cache", f"tomb{i}_{tag}")
        if not os.path.exists(t):
            shutil.copytree(src, t)
        tdirs.append(t)
    doc_path = os.path.join(sf_dir, "documents.parquet")
    origs = pq.read_table(doc_path, columns=["doc_id"])["doc_id"].to_numpy()
    dead = [f"doc://{int(i)}" for i in origs if i % 7 == 0]
    tombstone_docs(tdirs[-1], urls=dead)  # idempotent (sorted-set merge)
    out_dir = os.path.join("/tmp", "dcray_index_cache", f"tombcmp_{tag}")
    compact_generations(tdirs, out_dir)
    reader = IndexReader(out_dir)
    res = search_exact(reader, "data spark window", k=200)
    return _rounded_topk(res, reader)


def q_decay_score(sf_dir: str) -> pd.DataFrame:
    """ES function_score gauss decay on the n_chars docvalue: score =
    BM25(text match) × exp(−d²/2σ²), d = max(0, |n_chars−200| − 10),
    σ² = −100²/(2·ln 0.5) — docs 110 chars past the offset band score half."""
    from ..index.fielded import decay_score
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = decay_score(reader, None, "n_chars", origin=200.0, scale=100.0,
                      offset=10.0, decay=0.5, shape="gauss", k=200,
                      matches=[("text", "data spark window")])
    return _fielded_topk(reader, res)


# --- cross_fields: blended-df multi_match over a two-text-field index ------

def _crossfields_index_for(sf_dir: str) -> str:
    """Fielded index with TWO analyzed text fields sharing vocabulary —
    ``body`` = full text, ``head`` = its first 8 tokens — so the
    cross_fields df blend (max df across fields) and the per-doc best-field
    tf weight are both exercised by real overlap (every head term also has
    body postings with a different df)."""
    from ..index.build import build_index

    doc_path = os.path.join(sf_dir, "documents.parquet")
    tag = hashlib.sha256(
        f"xfld1:{doc_path}:{os.path.getsize(doc_path)}".encode()
    ).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "xf_" + tag)

    def derive(t: pa.Table) -> pa.Table:
        texts = ["" if x is None else x for x in t["text"].to_pylist()]
        heads = [" ".join(x.split()[:8]) for x in texts]
        urls = [f"doc://{d}" for d in t["doc_id"].to_pylist()]
        return pa.table({
            "doc_id": t["doc_id"],
            "text": t["text"],
            "head_text": pa.array(heads, pa.string()),
            "url": pa.array(urls, pa.string()),
        })

    ds = rd.read_parquet(doc_path, columns=["doc_id", "text"]).map_batches(
        derive, batch_format="pyarrow")
    build_index(ds, index_dir,
                fields={"body": "text", "head": "head_text"},
                num_buckets=8, salt_shards=4, head_min_df=64,
                input_tag=tag, batch_size=1024)
    return index_dir


def q_cross_fields(sf_dir: str) -> pd.DataFrame:
    """multi_match type=cross_fields over (body, head): per term the df
    blends as max(df_body, df_head) with N = max field docCount; per doc the
    term weight is the best per-field tf-norm weight (fields keep their own
    avgdl). Terms matching both fields count ONCE — the semantics the SQL
    oracle mirrors with greatest() blends."""
    from ..index.fielded import search_cross_fields
    from ..index.reader import IndexReader

    reader = IndexReader(_crossfields_index_for(sf_dir))
    res = search_cross_fields(reader, ["body", "head"],
                              "data spark window", k=200)
    return _fielded_topk(reader, res)


# --- round-4 surfaces: span/boost/prefix/constant/query_string queries,
# --- top_hits + pipeline aggs, split/pack/components training-data ops ----

def q_span_near(sf_dir: str) -> pd.DataFrame:
    """Unordered span_near over the positional index: 'data' and 'window'
    within a window of slop=3 extra positions, ANY order (Lucene width rule
    (max p − min p) − 1 ≤ 3) — strictly more than match_phrase_slop, which
    is ordered. Score = OR BM25 of the two terms."""
    from ..index.query import search_span_near
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    res = search_span_near(reader, ["data", "window"], k=400, slop=3,
                           in_order=False)
    return _rounded_topk(res, reader)


def q_boosting(sf_dir: str) -> pd.DataFrame:
    """ES boosting query: BM25('data spark window'), docs also containing
    'key' demoted to 0.5x their score (ranking demotion, not exclusion)."""
    from ..index.query import search_boosting
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = search_boosting(reader, "data spark window", "key", k=400,
                          negative_boost=0.5)
    return _rounded_topk(res, reader)


def q_bool_prefix(sf_dir: str) -> pd.DataFrame:
    """ES match_bool_prefix 'data spark win': full terms score BM25, the
    trailing prefix clause adds a constant 1.0 to docs holding any 'win%'
    term (ES's constant-score multi-term rewrite)."""
    from ..index.query import search_bool_prefix
    from ..index.reader import IndexReader

    reader = IndexReader(_index_for(sf_dir))
    res = search_bool_prefix(reader, "data spark win", k=400,
                             max_expansions=4096)
    return _rounded_topk(res, reader)


def q_constant_score(sf_dir: str) -> pd.DataFrame:
    """ES constant_score: every doc passing (lang='en' AND n_chars in
    [100, 300]) scores exactly 1.5 — full match set returned (k covers
    all) so the comparison is order-free."""
    from ..index.fielded import KeywordFilter, RangeFilter, constant_score
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    res = constant_score(reader,
                         [KeywordFilter("lang", "en"),
                          RangeFilter("n_chars", 100, 300)],
                         k=10**9, boost=1.5)
    urls = reader.resolve_urls([d for d, _ in res])
    return pd.DataFrame({
        "doc_id": sorted(int(urls[d].removeprefix("doc://"))
                         for d, _ in res),
        "score": np.full(len(res), 1.5),
    })


def q_query_string(sf_dir: str) -> pd.DataFrame:
    """EXTENDED query_string '("data spark" OR merge) AND scan -key'
    (round-5 grammar: AND/OR, parentheses, phrases and negation as bool
    operands — ``parse_query_string_ast``): match set =
    (phrase ∪ merge) ∩ scan ∖ key, score = OR-BM25 over
    {data, spark, merge, scan}. The round-4 flat subset keeps its own
    code path and its tests (test_round4_ops)."""
    from ..index.query import search_query_string
    from ..index.reader import IndexReader

    reader = IndexReader(_positional_index_for(sf_dir))
    res = search_query_string(
        reader, '("data spark" OR merge) AND scan -key', k=400)
    return _rounded_topk(res, reader)


def q_top_hits_agg(sf_dir: str) -> pd.DataFrame:
    """terms + top_hits: per lang bucket, the 3 largest-n_chars docs
    (tie-break ascending url string — the SQL-expressible [field, _id]
    order)."""
    from ..index.aggs import top_hits_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    rows = top_hits_agg(reader, "lang_dv", "n_chars", n_per_bucket=3,
                        descending=True, tie_column="url")
    urls = reader.resolve_urls([d for _, d, _ in rows])
    return pd.DataFrame({
        "lang": [k for k, _, _ in rows],
        "doc_id": [int(urls[d].removeprefix("doc://")) for _, d, _ in rows],
        "n_chars": [int(v) for _, _, v in rows],
    })


def q_avg_bucket(sf_dir: str) -> pd.DataFrame:
    """ES avg_bucket sibling pipeline aggregation: avg over the per-lang
    avg(n_chars) bucket values (each bucket counts once)."""
    from ..index.aggs import bucket_pipeline_agg
    from ..index.reader import IndexReader

    reader = IndexReader(_fielded_index_for(sf_dir))
    out = bucket_pipeline_agg(reader, "lang_dv", "n_chars", metric="avg")
    return pd.DataFrame({
        "avg_bucket": round_away([out["avg"]], 6),
        "n_buckets": [len(out["buckets"])],
    })


def q_hash_split(sf_dir: str) -> pd.DataFrame:
    """Deterministic train/val/test split: md5('s1' + doc_id) first 8 hex
    vs the cumulative-fraction thresholds (0.8/0.1/0.1) — leakage-safe,
    partition-independent."""
    from ..stages.text import HashSplit

    ds = _read(sf_dir, "documents", ["doc_id"])
    out = ds.map_batches(
        HashSplit(key_col="doc_id", salt="s1",
                  fractions=(("train", 0.8), ("val", 0.1), ("test", 0.1))),
        batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pack_sequences(sf_dir: str) -> pd.DataFrame:
    """Deterministic contiguous sequence packing: ascending doc_id, bin =
    floor(exclusive running token cumsum / 500)."""
    from ..stages.text import pack_sequences

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = pack_sequences(ds, budget=500, range_size=100).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dup_components(sf_dir: str) -> pd.DataFrame:
    """Connected components over the exact-verified ngram near-dup pairs
    (q_ngram_dedup's graph): component = min doc_id reachable through dup
    edges — the keep/drop labeling step after pairwise dedup."""
    from ..stages.dedup import duplicate_components, ngram_jaccard_duplicates

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = ngram_jaccard_duplicates(ds, threshold=0.6, num_hashes=64,
                                     num_bands=32)
    lab = duplicate_components(pairs).to_pandas()
    lab["doc_id"] = lab["doc_id"].astype(np.int64)
    lab["component"] = lab["component"].astype(np.int64)
    return lab.sort_values("doc_id").reset_index(drop=True)


def q_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-flat ANN against the PERSISTED k-means-quantized index, gated in
    its EXACT configuration: ``nprobe = nlist`` probes every centroid list,
    which is identical to brute force by construction
    (tests/test_dedup_ann.py proves exact == brute force), so the
    ``ann_cosine`` SQL oracle applies verbatim — the round-4 rows-only gap
    closed. The approximate nprobe=4/8 serving mode (pruned probe reads)
    keeps its recall ≥ 0.9 check in tests."""
    from ..stages.ann import IvfIndex, build_ivf_index

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    tag = hashlib.sha256(
        f"ivf:{emb_path}:{os.path.getsize(emb_path)}".encode()).hexdigest()[:12]
    index_dir = os.path.join("/tmp", "dcray_index_cache", "ivf_" + tag)
    if not os.path.exists(os.path.join(index_dir, "meta.json")):
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
            expr="vec_id != 0")
        build_ivf_index(ds, index_dir, nlist=32, train_size=2048)

    q = pq.read_table(emb_path)
    qvec = np.asarray(q.filter(pc.equal(q["vec_id"], 0))["embedding"][0].as_py(),
                      dtype=np.float32)
    idx = IvfIndex(index_dir)
    out = idx.topk(qvec[None, :], k=10, nprobe=idx.meta["nlist"])
    out = out[["vec_id", "cosine"]].copy()
    out["cosine"] = round_away(out["cosine"], 4)
    return out.reset_index(drop=True)


def q_extended_stats(sf_dir: str) -> pd.DataFrame:
    """ES extended_stats over the n_chars docvalue: count/sum/avg plus
    population variance and std deviation (exact partial merge from
    per-batch (n, Σx, Σx²) rows)."""
    from ..index.aggs import extended_stats_agg
    from ..index.reader import IndexReader

    out = extended_stats_agg(IndexReader(_fielded_index_for(sf_dir)),
                             "n_chars")
    return pd.DataFrame({
        "n": [int(out["count"])],
        "sm": round_away([out["sum"]], 6),
        "avg": round_away([out["avg"]], 6),
        "variance": round_away([out["variance"]], 4),
        "std_dev": round_away([out["std_deviation"]], 4),
    })


def q_media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal pipeline gate over the REAL decode paths: closed-form
    media payloads (synth_media_for_ids — every byte a pure function of
    (doc_id, position)) flow through the actor-pool MediaFeatures stage,
    which decodes P6 PPM / WAV PCM with the shipped numpy/stdlib kernels
    and emits image brightness + audio RMS. The DuckDB oracle recomputes
    both features arithmetically from the same closed form — the first
    driver row for stages/multimodal.py (compressed codecs remain honest
    NotImplementedError stubs; this gates everything around them)."""
    from ..stages.multimodal import MediaFeatures, synth_media_for_ids

    def synth(t: pa.Table) -> pa.Table:
        return synth_media_for_ids(t["doc_id"].to_numpy())

    feats = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(synth, batch_format="pyarrow", batch_size=256)
        # binary payloads dominate block size — small batches, let the
        # streaming executor backpressure (multimodal.py guidance)
        .map_batches(MediaFeatures, batch_format="pyarrow", batch_size=64,
                     concurrency=(1, 4))
    )
    out = feats.to_pandas().rename(columns={"media_id": "doc_id"})
    out["brightness"] = round_away(out["brightness"], 6)
    out["rms"] = round_away(out["rms"], 6)
    return out.sort_values(["doc_id", "kind"]).reset_index(drop=True)


def q_dup_spans(sf_dir: str) -> pd.DataFrame:
    """Cross-document duplicated-span (boilerplate) detection over word
    8-gram windows: per doc, total windows / windows shared with >= 2
    distinct docs / boilerplate fraction. Fully native Ray Data (one
    shingle pass, two groupbys, one hash join, union-zero fill); the
    DuckDB oracle recomputes the same counts from distinct word-8-gram
    strings (our 64-bit window hashes are injective at this scale and
    deterministic — same argument as minhash_pairs)."""
    from ..stages.dedup import duplicate_spans

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = duplicate_spans(ds, n_words=8, min_docs=2).to_pandas()
    out["dup_frac"] = round_away(out["dup_frac"], 6)
    return out.sort_values("doc_id").reset_index(drop=True)

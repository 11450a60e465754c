"""Fielded queries: per-field BM25 match + keyword / range / geo filters.

The reference's dominant real query shape is a bool query — analyzed
``match`` on one or more text fields combined with exact/keyword and
range/geo filters over the same document (mapping:
`projects/deces-dataprep/datasets/deces_index.yml:42-157` — analyzed fields
with ``raw`` keyword sub-fields `:55-61`, typed ``date`` fields `:86-88`,
``short`` `:128-129`, ``geo_point`` `:115-116`). This module re-owns that
shape over the fielded index:

- match(field, query): BM25 over ``field:token`` postings with PER-FIELD
  stats — idf uses the field's docCount n_f, the length norm the field's
  avgdl_f (Lucene per-field norms). Several matches sum (bool should).
- KeywordFilter: postings of the ``field:value`` keyword term (tf=1) —
  constant-score filter context, no scoring contribution.
- RangeFilter / GeoRadiusFilter: column-pruned predicate scan of the
  doc_id-sorted docvalues store (the ES doc_values execution strategy);
  returns a sorted doc_id set intersected with the scored docs.

Semantics (frozen, mirrored by the SQL oracles): a doc is returned iff it
matches ≥1 query term of ≥1 match clause AND passes every filter; its score
is the float64 sum of per-(field, term) BM25 contributions accumulated in
ascending (field, term) order; ties break by ascending doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.geo import haversine_km
from .build import bm25_weight
from .query import _topk_from_scores, idf
from .reader import IndexReader


class KeywordFilter:
    """Exact match on a keyword field (the ``raw`` sub-field pattern)."""

    def __init__(self, field: str, value: str):
        self.field = field
        self.value = value

    def doc_ids(self, reader: IndexReader) -> np.ndarray:
        from ..functions.analysis import normalize_keyword

        norm = normalize_keyword(str(self.value))
        if not norm:
            return np.empty(0, np.uint64)
        docs, _, _ = reader.postings(f"{self.field}:{norm}")
        return docs


class TermsFilter:
    """ES ``terms`` query in filter context: doc matches if its keyword
    field holds ANY of the given values (SQL ``IN``) — the union of each
    ``field:value`` term's postings."""

    def __init__(self, field: str, values):
        self.field = field
        self.values = list(values)

    def doc_ids(self, reader: IndexReader) -> np.ndarray:
        from ..functions.analysis import normalize_keyword

        parts = []
        for v in self.values:
            norm = normalize_keyword(str(v))
            if not norm:
                continue
            docs, _, _ = reader.postings(f"{self.field}:{norm}")
            if len(docs):
                parts.append(docs)
        if not parts:
            return np.empty(0, np.uint64)
        return np.unique(np.concatenate(parts))


class ExistsFilter:
    """ES ``exists`` query: doc matches iff the docvalue column is non-null
    (ES: the field has any indexed value). Served by a column-pruned
    predicate-pushdown docvalues scan, like RangeFilter."""

    def __init__(self, column: str):
        self.column = column

    def doc_ids(self, reader: IndexReader) -> np.ndarray:
        tbl = reader.docstore.scan(
            columns=["doc_id"], filter=pc.field(self.column).is_valid())
        return np.sort(tbl["doc_id"].to_numpy().astype(np.uint64))


class NotKeywordFilter:
    """Keyword exclusion — ES bool ``must_not`` on a keyword term: every doc
    EXCEPT those holding ``field:value``. Evaluated LAZILY: the exclusion
    term's postings (sorted doc_ids) are dropped from the scored doc set by
    sorted-membership test — the doc universe never materializes (an
    O(corpus) docvalues scan per query would contradict the serving posture
    at 10^12 docs)."""

    negative = True

    def __init__(self, field: str, value: str):
        self.field = field
        self.value = value

    def exclude_ids(self, reader: IndexReader) -> np.ndarray:
        """Sorted doc_ids holding the excluded keyword term (possibly empty)."""
        from ..functions.analysis import normalize_keyword

        norm = normalize_keyword(str(self.value))
        if not norm:
            return np.empty(0, np.uint64)
        excl, _, _ = reader.postings(f"{self.field}:{norm}")
        return excl


class RangeFilter:
    """lo <= column <= hi over a typed docvalues column (either bound may be
    None). Matches SQL BETWEEN semantics (inclusive)."""

    def __init__(self, column: str, lo=None, hi=None):
        assert lo is not None or hi is not None
        self.column = column
        self.lo = lo
        self.hi = hi

    def doc_ids(self, reader: IndexReader) -> np.ndarray:
        f = None
        if self.lo is not None:
            f = pc.field(self.column) >= self.lo
        if self.hi is not None:
            hi = pc.field(self.column) <= self.hi
            f = hi if f is None else f & hi
        tbl = reader.docstore.scan(columns=["doc_id"], filter=f)
        return np.sort(tbl["doc_id"].to_numpy().astype(np.uint64))


class GeoRadiusFilter:
    """haversine(doc point, center) <= radius_km over two docvalues
    columns — the geo_point distance filter."""

    def __init__(self, lat_col: str, lon_col: str, lat: float, lon: float,
                 radius_km: float):
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.lat = float(lat)
        self.lon = float(lon)
        self.radius_km = float(radius_km)

    def doc_ids(self, reader: IndexReader) -> np.ndarray:
        tbl = reader.docstore.scan(
            columns=["doc_id", self.lat_col, self.lon_col])
        d = haversine_km(tbl[self.lat_col].to_numpy(zero_copy_only=False),
                         tbl[self.lon_col].to_numpy(zero_copy_only=False),
                         self.lat, self.lon)
        ids = tbl["doc_id"].to_numpy().astype(np.uint64)
        return np.sort(ids[d <= self.radius_km])


def _resolve_filters(
    reader: IndexReader, filters
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """(allow, exclude): positive filters intersect into ``allow`` (None =
    unrestricted, empty = no hits); negative filters (``must_not``) union
    into ``exclude`` (None = nothing excluded). Exclusion stays a lazy
    sorted-membership drop on the scored docs — never a universe scan."""
    if not filters:
        return None, None
    allow = None
    exclude = None
    for flt in filters:
        if getattr(flt, "negative", False):
            ids = flt.exclude_ids(reader)
            exclude = ids if exclude is None else np.union1d(exclude, ids)
            continue
        ids = flt.doc_ids(reader)
        allow = ids if allow is None else np.intersect1d(
            allow, ids, assume_unique=True)
        if not len(allow):
            break
    return allow, exclude


def _filter_mask(docs: np.ndarray, allow: np.ndarray | None,
                 exclude: np.ndarray | None) -> np.ndarray | None:
    """Boolean keep-mask over ``docs`` for (allow, exclude); None = keep all."""
    mask = None
    if allow is not None:
        mask = np.isin(docs, allow)
    if exclude is not None and len(exclude):
        drop = np.isin(docs, exclude)
        mask = ~drop if mask is None else mask & ~drop
    return mask


def _gather_field_terms(reader: IndexReader, matches) -> list[tuple]:
    """(n_f, avgdl_f, field:term, boost) per query term, ascending
    (field, term). A match clause is (field, query) or (field, query,
    boost) — the ES ``field^boost`` clause multiplier."""
    from ..functions.analysis import tokenize

    out = []
    for clause in sorted(matches, key=lambda c: (c[0], c[1])):
        field, query = clause[0], clause[1]
        boost = float(clause[2]) if len(clause) > 2 else 1.0
        fstats = reader.field_stats.get(field)
        if fstats is None:
            continue
        n_f = int(fstats["n_docs"])
        avgdl_f = float(fstats["avgdl"]) or 1.0
        for tok in sorted(set(tokenize(query))):
            out.append((n_f, avgdl_f, f"{field}:{tok}", boost))
    return out


def search_fields(
    reader: IndexReader,
    matches: list[tuple[str, str]],
    k: int = 10,
    filters: list | None = None,
    algorithm: str = "exact",
) -> list[tuple[int, float]]:
    """Bool query: Σ BM25(field, query) over ``matches``, restricted to docs
    passing every filter. ``exact`` is the exhaustive vectorized oracle;
    ``pruned`` applies the same block-max pruning as the unfielded engine
    (rank- and score-identical, tested) and is the 10^12-doc serving path;
    ``auto`` picks by corpus shape like the unfielded ``search``."""
    if algorithm == "auto":
        algorithm = ("exact" if reader.vocabulary_size() < 50_000
                     else "pruned")
    if algorithm not in ("exact", "pruned"):
        raise ValueError(f"unknown fielded algorithm {algorithm!r} "
                         "(use 'exact', 'pruned' or 'auto')")
    if algorithm == "pruned":
        return search_fields_pruned(reader, matches, k, filters)
    union, scores = _score_fields_all(reader, matches, filters)
    if not len(union):
        return []
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def _score_fields_all(
    reader: IndexReader, matches, filters=None
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustive fielded scoring: (sorted doc_id union, float64 scores)
    for every doc matching ≥1 (field, term), already filter-masked — the
    fielded analogue of ``query._score_all``."""
    gathered = []  # (n_f, avgdl_f, docs, tfs, dls, boost), (field, term) asc
    for n_f, avgdl_f, term, boost in _gather_field_terms(reader, matches):
        docs, tfs, dls = reader.postings(term)
        if len(docs):
            gathered.append((n_f, avgdl_f, docs, tfs, dls, boost))
    if not gathered:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    union = np.unique(np.concatenate([g[2] for g in gathered]))

    allow, exclude = _resolve_filters(reader, filters)
    mask = _filter_mask(union, allow, exclude)
    if mask is not None:
        union = union[mask]
        if not len(union):
            return union, np.empty(0, np.float64)

    scores = np.zeros(len(union), dtype=np.float64)
    _accumulate_scores(scores, union, gathered, reader.k1, reader.b)
    return union, scores


def _accumulate_scores(scores: np.ndarray, union: np.ndarray,
                       gathered, k1: float, b: float) -> None:
    """Add each gathered (field, term)'s BM25 contributions into ``scores``
    (aligned with the sorted doc_id ``union``), in gathered order."""
    for n_f, avgdl_f, docs, tfs, dls, boost in gathered:
        pos = np.searchsorted(union, docs)
        ok = (pos < len(union))
        pos_ok = pos[ok]
        hit = union[pos_ok] == docs[ok]
        sel = np.flatnonzero(ok)[hit]
        if not len(sel):
            continue
        w = bm25_weight(tfs[sel], dls[sel], avgdl_f, k1, b)
        scores[pos[sel]] += boost * idf(n_f, len(docs)) * w


def search_dis_max(
    reader: IndexReader,
    matches: list[tuple],
    k: int = 10,
    tie_breaker: float = 0.0,
    filters: list | None = None,
) -> list[tuple[int, float]]:
    """ES ``dis_max`` / ``multi_match type=best_fields``: each match clause
    scores independently (per-field BM25, exactly as one `search_fields`
    clause), and a doc's final score is its BEST clause score plus
    ``tie_breaker`` × the sum of its other clause scores:

        score = max_c s_c + tie_breaker · (Σ_c s_c − max_c s_c)

    tie_breaker=0 is pure dis_max (ES default); tie_breaker=1 degenerates to
    the bool-should sum (== `search_fields`). Filters behave identically to
    `search_fields` (must/must_not in filter context, no scoring)."""
    per_clause = []  # list of gathered lists, one per match clause
    for clause in matches:
        field, query = clause[0], clause[1]
        boost = float(clause[2]) if len(clause) > 2 else 1.0
        gathered = []
        for n_f, avgdl_f, term, bst in _gather_field_terms(
                reader, [(field, query, boost)]):
            docs, tfs, dls = reader.postings(term)
            if len(docs):
                gathered.append((n_f, avgdl_f, docs, tfs, dls, bst))
        if gathered:
            per_clause.append(gathered)
    if not per_clause:
        return []
    union = np.unique(np.concatenate(
        [g[2] for cl in per_clause for g in cl]))

    allow, exclude = _resolve_filters(reader, filters)
    mask = _filter_mask(union, allow, exclude)
    if mask is not None:
        union = union[mask]
        if not len(union):
            return []

    best = np.zeros(len(union), dtype=np.float64)
    total = np.zeros(len(union), dtype=np.float64)
    for gathered in per_clause:
        cs = np.zeros(len(union), dtype=np.float64)
        _accumulate_scores(cs, union, gathered, reader.k1, reader.b)
        np.maximum(best, cs, out=best)
        total += cs
    scores = best + tie_breaker * (total - best)
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def constant_score(
    reader: IndexReader, filters: list, k: int = 10, boost: float = 1.0,
) -> list[tuple[int, float]]:
    """ES ``constant_score``: every doc passing the filter context scores
    exactly ``boost`` — no BM25, no per-doc variation (the cacheable-filter
    pattern ES documents for scoring-free clauses). Requires ≥1 positive
    filter (an unrestricted constant-score over the whole corpus would be a
    doc-universe scan — same posture as ``NotKeywordFilter``). Ties break
    ascending doc_id, the engine's total order."""
    allow, exclude = _resolve_filters(reader, filters)
    if allow is None:
        raise ValueError("constant_score needs >= 1 positive filter")
    docs = allow
    if exclude is not None and len(exclude):
        docs = docs[~np.isin(docs, exclude)]
    docs = np.sort(docs)[:k]
    return [(int(d), float(boost)) for d in docs]


def search_cross_fields(
    reader: IndexReader,
    fields: list[str],
    query: str,
    k: int = 10,
    filters: list | None = None,
) -> list[tuple[int, float]]:
    """ES ``multi_match type=cross_fields``: the fields are scored as ONE
    virtual field — term-centric, not field-centric. Frozen semantics
    (mirrored by the SQL oracle; ES's BlendedTermQuery is the model):

    - per term, the df is BLENDED across fields: df_t = max_f df_f(t), and
      the idf uses the virtual field's docCount N = max_f docCount(f) —
      a term common in ANY field is cheap in the virtual field, which is
      the cross_fields fix for the best_fields "rare in one field" trap;
    - per doc, the term's tf-weight is the BEST per-field weight (each
      field's tf against its own length norm — Lucene keeps per-field
      norms inside the blend): contribution = idf_blend · max_f w_f;
    - a doc's score sums its term contributions; same filter context and
      (score desc, doc_id asc) order as every scorer here.

    Unlike ``search_fields`` (bool-should sum == most_fields) and
    ``search_dis_max`` (best_fields), a term matching in BOTH fields
    counts once with its best weight — not twice."""
    from ..functions.analysis import tokenize

    stats = [(f, reader.field_stats.get(f)) for f in sorted(fields)]
    stats = [(f, s) for f, s in stats if s is not None]
    if not stats:
        return []
    n_blend = max(int(s["n_docs"]) for _, s in stats)

    # gather per-term, per-field postings; blend df and idf per term
    per_term: list[tuple[float, list[tuple]]] = []
    for tok in sorted(set(tokenize(query))):
        flds = []
        df_blend = 0
        for f, s in stats:
            docs, tfs, dls = reader.postings(f"{f}:{tok}")
            if len(docs):
                avgdl_f = float(s["avgdl"]) or 1.0
                flds.append((docs, tfs, dls, avgdl_f))
                df_blend = max(df_blend, len(docs))
        if flds:
            per_term.append((idf(n_blend, df_blend), flds))
    if not per_term:
        return []
    union = np.unique(np.concatenate(
        [docs for _, flds in per_term for docs, _, _, _ in flds]))

    allow, exclude = _resolve_filters(reader, filters)
    mask = _filter_mask(union, allow, exclude)
    if mask is not None:
        union = union[mask]
        if not len(union):
            return []

    scores = np.zeros(len(union), np.float64)
    for idf_t, flds in per_term:
        best = np.zeros(len(union), np.float64)  # max_f w_f per doc
        for docs, tfs, dls, avgdl_f in flds:
            pos = np.searchsorted(union, docs)
            ok = pos < len(union)
            hit = union[pos[ok]] == docs[ok]
            sel = np.flatnonzero(ok)[hit]
            if not len(sel):
                continue
            w = bm25_weight(tfs[sel], dls[sel], avgdl_f,
                            reader.k1, reader.b)
            np.maximum.at(best, pos[sel], w)
        scores += idf_t * best
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def search_fields_pruned(
    reader: IndexReader,
    matches: list[tuple[str, str]],
    k: int = 10,
    filters: list | None = None,
) -> list[tuple[int, float]]:
    """Block-max pruned fielded scorer — rank/score-identical to the exact
    path (same float64 accumulation over the surviving postings).

    1. Resolve the filter doc sets FIRST: the pruning threshold θ must lower-
       bound the k-th FILTERED score, so the bootstrap only counts allowed,
       non-excluded docs (an unfiltered bootstrap could over-prune).
    2. Bootstrap θ from the strongest (field, term)'s blocks in descending
       block-max order until k allowed docs are seen (θ = k-th best solo
       contribution — a valid lower bound on the final k-th score).
    3. Drop block b of term t iff idf_t·max_w(b) + Σ_{t'≠t} UB(t') < θ − ε.
    4. Exact accumulation over surviving blocks, masked by the filter sets.
    """
    import math as _math

    from ..functions.codecs import decode_block, decode_block_run

    allow, exclude = _resolve_filters(reader, filters)
    if allow is not None and not len(allow):
        return []

    infos = []
    for n_f, avgdl_f, term, boost in _gather_field_terms(reader, matches):
        segs = reader.term_segments(term)
        if not segs:
            continue
        df = sum(r["df"] for r in segs)
        w_idf = boost * idf(n_f, df)  # boost scales idf, so ALL bounds scale
        blk_max = np.concatenate([r["blk_max_w"] for r in segs])
        infos.append({"segs": segs, "idf": w_idf, "avgdl": avgdl_f,
                      "term": term,
                      "ub": w_idf * float(blk_max.max()) if len(blk_max) else 0.0})
    if not infos:
        return []
    total_ub = sum(i["ub"] for i in infos)

    best = max(infos, key=lambda i: i["ub"])
    order = []
    for si, seg in enumerate(best["segs"]):
        for bi in range(len(seg["blk_last"])):
            order.append((-seg["blk_max_w"][bi], si, bi))
    order.sort()
    solo: list[np.ndarray] = []
    seen = 0
    for _, si, bi in order:
        seg = best["segs"][si]
        docs_b, tfs, dls = decode_block(seg, bi)
        w = bm25_weight(tfs, dls, best["avgdl"], reader.k1, reader.b)
        contrib = best["idf"] * w
        bmask = _filter_mask(docs_b, allow, exclude)
        if bmask is not None:
            contrib = contrib[bmask]
        if len(contrib):
            solo.append(contrib)
            seen += len(contrib)
        if seen >= k:
            break
    theta = -_math.inf
    if solo:
        allsolo = np.concatenate(solo)
        if len(allsolo) >= k:
            theta = float(np.partition(allsolo, len(allsolo) - k)[len(allsolo) - k])

    gathered = []
    for info in infos:
        rest_ub = total_ub - info["ub"]
        keep_masks = [
            info["idf"] * seg["blk_max_w"] + rest_ub >= theta - 1e-9
            for seg in info["segs"]
        ]
        if all(m.all() for m in keep_masks):
            docs, tfs, dls = reader.postings(info["term"])
            w = bm25_weight(tfs, dls, info["avgdl"], reader.k1, reader.b)
            gathered.append((docs, info["idf"] * w))
            continue
        docs_parts, w_parts = [], []
        for seg, mask in zip(info["segs"], keep_masks):
            keep = np.flatnonzero(mask)
            if len(keep) == 0:
                continue
            run_breaks = np.flatnonzero(np.diff(keep) > 1)
            run_starts = np.concatenate(([0], run_breaks + 1))
            run_ends = np.concatenate((run_breaks, [len(keep) - 1]))
            for rs, re_ in zip(run_starts, run_ends):
                d, tfs, dls = decode_block_run(seg, int(keep[rs]), int(keep[re_]))
                docs_parts.append(d)
                w_parts.append(bm25_weight(tfs, dls, info["avgdl"],
                                           reader.k1, reader.b))
        if docs_parts:
            gathered.append((np.concatenate(docs_parts),
                             info["idf"] * np.concatenate(w_parts)))
    if not gathered:
        return []
    union = np.unique(np.concatenate([g[0] for g in gathered]))
    umask = _filter_mask(union, allow, exclude)
    if umask is not None:
        union = union[umask]
        if not len(union):
            return []
    scores = np.zeros(len(union), dtype=np.float64)
    for docs, contrib in gathered:
        pos = np.searchsorted(union, docs)
        ok = pos < len(union)
        hit = union[pos[ok]] == docs[ok]
        sel = np.flatnonzero(ok)[hit]
        if len(sel):
            scores[pos[sel]] += contrib[sel]
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def facet_counts(reader: IndexReader, field: str,
                 top_n: int | None = None) -> list[tuple[str, int]]:
    """Keyword-field value counts — the ES ``terms`` aggregation.

    A keyword field indexes one ``field:value`` term per doc, so each
    value's doc count is exactly that term's df: the facet is a prefix scan
    of the term dictionary (no postings decode, no corpus scan). Values are
    the NORMALIZED keyword terms (ES terms-agg over a normalized keyword
    field behaves the same — raw variants that normalize identically merge).
    Returns (value, count) sorted by count desc then value asc, capped at
    top_n."""
    import os

    import pyarrow.dataset as pa_ds

    ts_dir = os.path.join(reader.index_dir, "termstats")
    if not os.path.isdir(ts_dir):
        return []
    prefix = field + ":"
    tbl = pa_ds.dataset(ts_dir).to_table(
        columns=["term", "df"],
        filter=pc.starts_with(pc.field("term"), prefix))
    out = sorted(
        ((t[len(prefix):], int(d))
         for t, d in zip(tbl["term"].to_pylist(), tbl["df"].to_numpy())),
        key=lambda kv: (-kv[1], kv[0]))
    return out if top_n is None else out[:top_n]


def facet_date_histogram(reader: IndexReader, column: str,
                         interval: str = "day") -> list[tuple]:
    """ES ``date_histogram`` aggregation over a docvalue timestamp column.

    Distributed map-side partials: Ray reads ONLY the bucketed column from
    the docvalues parquet, each batch folds to (bucket, count) partials, and
    the driver merges the tiny partial tables — the per-shard doc_values
    pass ES runs, re-expressed as a column-pruned ``map_batches``; the
    corpus never materializes driver-side (what crosses the cluster is one
    row per (bucket, batch)). Returns (bucket_start, n) sorted by bucket."""
    import os
    from collections import Counter

    import ray.data as rd

    dv_dir = os.path.join(reader.index_dir, "docvalues")

    def partial(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(pc.floor_temporal(t[column], unit=interval))
        return pa.table({"bucket": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    parts = rd.read_parquet(dv_dir, columns=[column]).map_batches(
        partial, batch_format="pyarrow").take_all()
    acc: Counter = Counter()
    for row in parts:
        acc[row["bucket"]] += int(row["n"])
    return sorted(acc.items())


def sort_by_field(reader: IndexReader, column: str, k: int = 10,
                  descending: bool = True,
                  filters=None) -> pa.Table:
    """ES ``sort: [{column: order}]`` — top-k docs by a docvalue column
    (tie-break ascending doc_id, ES ``[_score→field, _id]`` order without a
    scoring clause), optional bool filter context.

    Distributed top-k: Ray reads ONLY (doc_id, column) from the docvalues
    parquet; each batch keeps its own k best rows (a per-batch combiner, so
    one ≤k-row partial per batch crosses the cluster), the driver merges
    the partials. Null values are skipped (SQL ``IS NOT NULL`` — the gate's
    documented "missing" semantics). Returns a (doc_id, column) Arrow
    table, k rows."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    dv_dir = os.path.join(reader.index_dir, "docvalues")

    def _empty() -> pa.Table:
        # schema-stable empty result: (doc_id, column) with the column's
        # real type from the docvalues footer
        first = sorted(f for f in os.listdir(dv_dir)
                       if f.endswith(".parquet"))[0]
        schema = pq.read_schema(os.path.join(dv_dir, first))
        return pa.table({
            "doc_id": pa.array([], pa.uint64()),
            column: pa.array([], schema.field(column).type),
        })

    allow, exclude = _resolve_filters(reader, filters)
    if allow is not None and not len(allow):
        return _empty()
    order = [(column, "descending" if descending else "ascending"),
             ("doc_id", "ascending")]

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[column]))
        mask = _filter_mask(t["doc_id"].to_numpy().astype(np.uint64),
                            allow, exclude)
        if mask is not None:
            t = t.filter(pa.array(mask))
        if t.num_rows > k:
            t = t.take(pc.sort_indices(t, sort_keys=order)[:k])
        return t

    import ray

    refs = (rd.read_parquet(dv_dir, columns=["doc_id", column])
            .map_batches(partial, batch_format="pyarrow")
            .to_arrow_refs())
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return _empty()
    merged = pa.concat_tables(parts)  # ≤ k rows per input batch
    return merged.take(pc.sort_indices(merged, sort_keys=order)[:k])


def _matched_union(reader: IndexReader, query: str | None, matches,
                   filters) -> tuple[np.ndarray, np.ndarray]:
    """The scored, filter-masked match union — shared query context of
    collapse/function_score/decay (``query`` = unfielded match, ``matches``
    = fielded bool clauses)."""
    from .query import _score_all

    if matches is not None:
        union, scores = _score_fields_all(reader, matches, filters)
        live = scores > 0.0
        return union[live], scores[live]
    union, scores = _score_all(reader, query)
    allow, exclude = _resolve_filters(reader, filters)
    mask = _filter_mask(union, allow, exclude)
    if mask is not None:
        union, scores = union[mask], scores[mask]
    return union, scores


def collapse_topk(reader: IndexReader, query: str | None,
                  collapse_field: str,
                  k: int = 10, filters=None, matches=None,
                  _key_chunk: int = 4096) -> list[tuple]:
    """ES field collapsing (``collapse: {field}``): rank by BM25 ``_score``,
    return the single best-scoring doc per collapse key, top-k keys ordered
    by that best score (tie-break ascending doc_id — the total order every
    scorer here uses).

    Exact and output-bounded: the scored union is walked in (score desc,
    doc_id asc) order and collapse keys are resolved through the
    row-group-pruned docstore in chunks, stopping as soon as k distinct
    keys have a winner — only the ranked PREFIX needed to fill k groups is
    ever looked up, never the whole match set (ES collapses per-shard
    top-groups the same way). Docs missing the collapse field form ONE null
    bucket competing like any key (ES semantics), reported with key None.
    Query context: ``query`` (unfielded) or ``matches`` (fielded bool
    clauses). Returns [(doc_id, score, key)]."""
    union, scores = _matched_union(reader, query, matches, filters)
    if not len(union):
        return []
    order = np.lexsort((union, -scores))
    best: dict = {}
    out: list[tuple] = []
    for at in range(0, len(order), _key_chunk):
        idx = order[at: at + _key_chunk]
        tbl = reader.docstore.lookup(union[idx], [collapse_field])
        keys = dict(zip(tbl["doc_id"].to_numpy().tolist(),
                        tbl[collapse_field].to_pylist()))
        for i in idx:
            d = int(union[i])
            key = keys.get(d)
            # ES groups docs MISSING the collapse field into one null
            # bucket (they compete for a single slot like any other key)
            # rather than dropping them from the ranking
            gk = ("__collapse_null__",) if key is None else key
            if gk in best:
                continue
            best[gk] = True
            out.append((d, float(scores[i]), key))
            if len(out) >= k:
                return out
    return out


def function_score(reader: IndexReader, query: str | None, field: str,
                   k: int = 10, modifier: str = "log1p",
                   factor: float = 1.0, missing: float = 1.0,
                   boost_mode: str = "multiply",
                   filters=None, matches=None) -> list[tuple[int, float]]:
    """ES ``function_score`` with ``field_value_factor``: final score =
    BM25 ⊕ modifier(factor · field_value), ⊕ = multiply or sum
    (``boost_mode``). Docs missing the field use ``missing``
    (pre-modifier, ES semantics).

    The factor can reorder arbitrarily, so the exact top-k requires the
    full match union scored (the exhaustive scorer's existing cost) plus
    ONE row-group-pruned docstore gather of that union's field values —
    O(match set), never O(corpus). The scale path at 10^12 docs is folding
    a monotone factor's per-block maximum into the block-max metadata at
    build time; this serves the exact semantics the oracle checks.

    The query context is either ``query`` (unfielded match) or ``matches``
    (fielded bool clauses, per-field stats)."""
    union, scores = _matched_union(reader, query, matches, filters)
    if not len(union):
        return []
    tbl = reader.docstore.lookup(union, [field])
    vals = np.full(len(union), float(missing), np.float64)
    got_ids = tbl["doc_id"].to_numpy().astype(np.uint64)
    # cast through float64 so nulls become NaN (an int column with nulls
    # would otherwise round-trip as object dtype); timestamps hop through
    # int64 epoch units first (no direct timestamp→double cast in Arrow)
    col = tbl[field]
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        col = pc.cast(col, pa.int64())
    got = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
    pos = np.searchsorted(union, got_ids)
    ok = ~np.isnan(got)
    vals[pos[ok]] = got[ok]
    fv = factor * vals
    if modifier == "log1p":
        fv = np.log1p(fv)
    elif modifier == "sqrt":
        fv = np.sqrt(fv)
    elif modifier != "none":
        raise ValueError(f"unknown modifier {modifier!r}")
    out = scores * fv if boost_mode == "multiply" else scores + fv
    return _topk_from_scores(union, out, k)


def decay_score(reader: IndexReader, query: str | None, field: str,
                *, origin: float, scale: float, offset: float = 0.0,
                decay: float = 0.5, shape: str = "gauss",
                k: int = 10, missing: float | None = None,
                filters=None, matches=None) -> list[tuple[int, float]]:
    """ES ``function_score`` decay functions (``gauss``/``exp``/``linear``
    on a numeric or date docvalue): final score = BM25 × decay(|v−origin|),
    the "boost by recency/proximity" pattern. ES formulas (distance d =
    max(0, |v − origin| − offset)):

    - gauss:  exp(−d² / (2σ²)),  σ² = −scale² / (2·ln(decay))
    - exp:    exp(λ·d),          λ  = ln(decay) / scale
    - linear: max(0, (s − d)/s), s  = scale / (1 − decay)

    so a doc at distance ``scale`` past ``offset`` scores exactly
    ``decay``× its BM25. Docs missing the field score 0 unless ``missing``
    gives a substitute value (pre-decay). Same execution shape as
    ``function_score``: exhaustive match union + ONE pruned docstore
    gather — O(match set)."""
    union, scores = _matched_union(reader, query, matches, filters)
    if not len(union):
        return []
    tbl = reader.docstore.lookup(union, [field])
    vals = np.full(len(union), np.nan, np.float64)
    got_ids = tbl["doc_id"].to_numpy().astype(np.uint64)
    col = tbl[field]
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        col = pc.cast(col, pa.int64())
    got = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
    vals[np.searchsorted(union, got_ids)] = got
    if missing is not None:
        vals = np.where(np.isnan(vals), float(missing), vals)
    d = np.maximum(0.0, np.abs(vals - float(origin)) - float(offset))
    if not (0.0 < decay < 1.0) or scale <= 0:
        raise ValueError("need 0 < decay < 1 and scale > 0")
    if shape == "gauss":
        sigma2 = -(scale * scale) / (2.0 * np.log(decay))
        mult = np.exp(-(d * d) / (2.0 * sigma2))
    elif shape == "exp":
        mult = np.exp(np.log(decay) / scale * d)
    elif shape == "linear":
        s = scale / (1.0 - decay)
        mult = np.maximum(0.0, (s - d) / s)
    else:
        raise ValueError(f"unknown decay shape {shape!r}")
    mult = np.where(np.isnan(mult), 0.0, mult)  # missing field ⇒ 0
    return _topk_from_scores(union, scores * mult, k)

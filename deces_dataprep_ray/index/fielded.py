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


def search_fields(
    reader: IndexReader,
    matches: list[tuple[str, str]],
    k: int = 10,
    filters: list | None = None,
) -> list[tuple[int, float]]:
    """Bool query: Σ BM25(field, query) over ``matches``, restricted to docs
    passing every filter. Exhaustive vectorized scorer (the oracle-grade
    path; block-max pruning composes later the same way as unfielded)."""
    from ..functions.analysis import tokenize

    gathered = []  # (field, term, docs, tfs, dls) in ascending (field, term)
    for field, query in sorted(matches):
        fstats = reader.field_stats.get(field)
        if fstats is None:
            continue
        n_f = int(fstats["n_docs"])
        avgdl_f = float(fstats["avgdl"]) or 1.0
        for tok in sorted(set(tokenize(query))):
            docs, tfs, dls = reader.postings(f"{field}:{tok}")
            if len(docs):
                gathered.append((n_f, avgdl_f, docs, tfs, dls))
    if not gathered:
        return []
    union = np.unique(np.concatenate([g[2] for g in gathered]))

    if filters:
        allow = None
        for flt in filters:
            ids = flt.doc_ids(reader)
            allow = ids if allow is None else np.intersect1d(
                allow, ids, assume_unique=True)
            if not len(allow):
                return []
        union = union[np.isin(union, allow)]
        if not len(union):
            return []

    scores = np.zeros(len(union), dtype=np.float64)
    for n_f, avgdl_f, docs, tfs, dls in gathered:
        pos = np.searchsorted(union, docs)
        ok = (pos < len(union))
        pos_ok = pos[ok]
        hit = union[pos_ok] == docs[ok]
        sel = np.flatnonzero(ok)[hit]
        if not len(sel):
            continue
        w = bm25_weight(tfs[sel], dls[sel], avgdl_f, reader.k1, reader.b)
        scores[pos[sel]] += idf(n_f, len(docs)) * w
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)

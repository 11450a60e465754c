"""Doc_id-sorted docvalues store: binary-searchable per-doc attributes.

Written by ``build_index`` phase E as globally doc_id-sorted parquet (the
sort's range partitioning makes file doc_id ranges disjoint). Lookups use
parquet footer statistics twice — file level, then row-group level — so
resolving k doc_ids reads only the row groups that can contain them, never a
corpus scan (the round-1 ``resolve_urls`` scanned the analyzed checkpoint
per query; at 10^12 docs that was a full scan per batch).

Typed filter columns (range / geo) are served by :meth:`DocStore.scan` — a
column-pruned, predicate-pushdown dataset scan, the ES doc_values analogue.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq


class DocStore:
    def __init__(self, dv_dir: str | None = None,
                 paths: list[str] | None = None, id_col: str = "doc_id"):
        """Over a docvalues dir, or (``paths=``) any id-ordered parquet
        files with footer statistics — e.g. the original corpus shards,
        which ``write_pages_corpus`` already writes in doc_id order, so
        stored-source lookups (highlighting) need no extra build phase."""
        if paths is None:
            if dv_dir is None or not os.path.isdir(dv_dir):
                raise FileNotFoundError(dv_dir)
            paths = [os.path.join(dv_dir, n) for n in sorted(os.listdir(dv_dir))
                     if n.endswith(".parquet")]
        self.dir = dv_dir
        self.id_col = id_col
        self._files: list[dict] = []
        for path in paths:
            md = pq.read_metadata(path)
            idx = md.schema.to_arrow_schema().get_field_index(id_col)
            mins = np.empty(md.num_row_groups, np.uint64)
            maxs = np.empty(md.num_row_groups, np.uint64)
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx).statistics
                mins[g] = np.uint64(st.min)
                maxs[g] = np.uint64(st.max)
            self._files.append({
                "path": path, "mins": mins, "maxs": maxs, "pf": None,
            })

    def lookup(self, doc_ids, columns: list[str] | None = None) -> pa.Table:
        """Rows for the given doc_ids (doc_id column always included),
        reading only row groups whose [min, max] intersects the id set."""
        idc = self.id_col
        want = np.unique(np.asarray(list(doc_ids), dtype=np.uint64))
        cols = [idc] + [c for c in (columns or ["url"]) if c != idc]
        parts = []
        for f in self._files:
            # a row group matters iff some wanted id falls in [min, max]
            lo = np.searchsorted(want, f["mins"], side="left")
            hi = np.searchsorted(want, f["maxs"], side="right")
            groups = np.flatnonzero(hi > lo)
            if not len(groups):
                continue
            if f["pf"] is None:
                f["pf"] = pq.ParquetFile(f["path"])
            tbl = f["pf"].read_row_groups(groups.tolist(), columns=cols)
            mask = np.isin(tbl[idc].to_numpy().astype(np.uint64), want)
            parts.append(tbl.filter(pa.array(mask)))
        if not parts:
            first = self._files[0]["path"] if self._files else None
            if first is None:
                return pa.table({idc: pa.array([], pa.uint64())})
            schema = pq.read_schema(first)
            return pa.table({c: pa.array([], schema.field(c).type)
                             for c in cols})
        return pa.concat_tables(parts)

    def resolve_urls(self, doc_ids) -> dict[int, str]:
        tbl = self.lookup(doc_ids, ["url"])
        return dict(zip(tbl[self.id_col].to_numpy().tolist(),
                        tbl["url"].to_pylist()))

    def scan(self, columns: list[str] | None = None,
             filter=None) -> pa.Table:
        """Column-pruned scan with predicate pushdown (range/geo filters)."""
        src = self.dir if self.dir is not None else [
            f["path"] for f in self._files]
        return pa_ds.dataset(src).to_table(columns=columns, filter=filter)

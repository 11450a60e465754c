"""Index reader: manifest + dictionaries + lazy posting-list access.

The on-disk index is self-contained and relocatable (parquet + json only) —
the property the reference gets from ES snapshot restore
(`Makefile:206-220`): a consumer can copy ``index_dir`` and serve queries
without rerunning the build.

Term lookup routes through the same hashing as the build: a term lives in
bucket ``term_hash % B``; a head term (listed in the manifest) additionally
lives as doc-range segments in buckets ``hash(term\\x00salt) % B``. Segments
are doc_id-range-contiguous and ordered by ``seg``, so the full posting list
is their ordered concatenation — the reader performs this final merge level
lazily. Parquet rows are sorted by term, so per-term reads prune row groups
via column statistics.
"""

from __future__ import annotations

import hashlib
import os
from functools import lru_cache

import numpy as np
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

from ..functions.codecs import decode_postings_blocks
from ..functions.ids import term_hash
from ..state.manifest import Manifest, bucket_dir


class IndexReader:
    def __init__(self, index_dir: str):
        if not os.path.isdir(index_dir):
            # alias indirection (blue/green swap): resolve the pointer file
            # once at open; an open reader keeps serving its resolved
            # generation until reopened (ES searcher-refresh semantics)
            from .alias import resolve_alias

            index_dir = resolve_alias(index_dir)
        man = Manifest.load(index_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest at {index_dir}")
        self.index_dir = index_dir
        self.manifest = man
        cfg = man.doc["config"]
        self.num_buckets = int(cfg["num_buckets"])
        self.salt_shards = int(cfg["salt_shards"])
        self.k1 = float(cfg["k1"])
        self.b = float(cfg["b"])
        stats = man.phase("stats")
        self.n_docs = int(stats.get("n_docs", 0))
        self.avgdl = float(stats.get("avgdl", 0.0)) or 1.0
        self.head_terms = set(man.phase("head_terms").get("terms", []))
        self.head_compacted = man.phase_done("head_compact")
        # per-field BM25 stats (fielded indexes only): field → n_docs/avgdl
        self.field_stats: dict[str, dict] = dict(
            man.phase("fieldstats").get("fields", {})
        ) if man.phase_done("fieldstats") else {}
        self._docstore = None
        self._head_path = os.path.join(index_dir, "head", "part.parquet")
        self._term_rows = lru_cache(maxsize=4096)(self._term_rows_uncached)
        self._postings_cache: dict[str, tuple] = {}
        # bucket-file cache: (table sorted by term, term ndarray for binary
        # search). Bounded LRU — at web scale only hot buckets stay resident.
        self._load_bucket = lru_cache(maxsize=256)(self._load_bucket_uncached)

    def _load_bucket_uncached(self, path: str):
        """Two-step lazy bucket: the term column loads eagerly (cheap, it's
        the lookup key); posting payload row groups load on demand."""
        if not os.path.exists(path):
            return None
        pf = pq.ParquetFile(path)
        terms = pf.read(columns=["term"])["term"].to_numpy(zero_copy_only=False)
        md = pf.metadata
        rg_starts = np.zeros(md.num_row_groups + 1, dtype=np.int64)
        for i in range(md.num_row_groups):
            rg_starts[i + 1] = rg_starts[i] + md.row_group(i).num_rows
        return {"pf": pf, "terms": terms, "rg_starts": rg_starts, "groups": {}}

    # -- routing ----------------------------------------------------------

    def buckets_for(self, term: str) -> list[int]:
        if term in self.head_terms:
            out = []
            for s in range(self.salt_shards):
                h = hashlib.blake2b(
                    f"{term}\x00{s}".encode("utf-8"), digest_size=8
                ).digest()
                out.append(int.from_bytes(h, "big") % self.num_buckets)
            return sorted(set(out))
        return [term_hash(term) % self.num_buckets]

    # -- posting access ---------------------------------------------------

    def _read_term(self, path: str, term: str) -> list[dict]:
        loaded = self._load_bucket(path)
        if loaded is None:
            return []
        terms = loaded["terms"]
        lo = int(np.searchsorted(terms, term, side="left"))
        hi = int(np.searchsorted(terms, term, side="right"))
        if hi <= lo:
            return []
        rg_starts = loaded["rg_starts"]
        g_lo = int(np.searchsorted(rg_starts, lo, side="right")) - 1
        g_hi = int(np.searchsorted(rg_starts, hi - 1, side="right")) - 1
        key = (g_lo, g_hi)
        tbl = loaded["groups"].get(key)
        if tbl is None:
            tbl = loaded["pf"].read_row_groups(list(range(g_lo, g_hi + 1)))
            loaded["groups"][key] = tbl
        base = int(rg_starts[g_lo])
        tbl = tbl.slice(lo - base, hi - lo)
        rows = []
        for i in range(tbl.num_rows):
            rows.append(
                {
                    "seg": tbl["seg"][i].as_py(),
                    "df": tbl["df"][i].as_py(),
                    "cf": tbl["cf"][i].as_py(),
                    "n": tbl["n"][i].as_py(),
                    "doc_bytes": tbl["doc_bytes"][i].as_py(),
                    "tf_bytes": tbl["tf_bytes"][i].as_py(),
                    "dl_bytes": tbl["dl_bytes"][i].as_py(),
                    "blk_last": np.asarray(tbl["blk_last"][i].as_py(), dtype=np.uint64),
                    "blk_max_w": np.asarray(tbl["blk_max_w"][i].as_py(), dtype=np.float64),
                    "blk_count": np.asarray(tbl["blk_count"][i].as_py(), dtype=np.int32),
                    "blk_off_doc": np.asarray(tbl["blk_off_doc"][i].as_py(), dtype=np.uint32),
                    "blk_off_tf": np.asarray(tbl["blk_off_tf"][i].as_py(), dtype=np.uint32),
                    "blk_off_dl": np.asarray(tbl["blk_off_dl"][i].as_py(), dtype=np.uint32),
                    **({"pos_bytes": tbl["pos_bytes"][i].as_py()}
                       if "pos_bytes" in tbl.column_names else {}),
                }
            )
        return rows

    def _term_rows_uncached(self, term: str) -> tuple[dict, ...]:
        """All encoded segments for a term, ordered by seg (doc-range order)."""
        if term in self.head_terms and self.head_compacted:
            rows = self._read_term(self._head_path, term)
            if rows:
                return tuple(rows)
        rows = []
        for b in self.buckets_for(term):
            rows.extend(
                self._read_term(os.path.join(bucket_dir(self.index_dir, b), "part.parquet"), term)
            )
        rows.sort(key=lambda r: r["seg"])
        return tuple(rows)

    def term_segments(self, term: str) -> tuple[dict, ...]:
        return self._term_rows(term)

    def df(self, term: str) -> int:
        return sum(r["df"] for r in self._term_rows(term))

    def postings(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dls), sorted by doc_id — ordered segment concat.
        Decoded arrays are LRU-cached (hot query terms decode once)."""
        cached = self._postings_cache.get(term)
        if cached is not None:
            return cached
        out = self._postings_uncached(term)
        if len(self._postings_cache) >= 1024:
            self._postings_cache.pop(next(iter(self._postings_cache)))
        self._postings_cache[term] = out
        return out

    def _postings_uncached(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        rows = self._term_rows(term)
        if not rows:
            e = np.empty(0, dtype=np.uint64)
            return e, e.astype(np.uint32), e.astype(np.uint32)
        parts = [decode_postings_blocks(r) for r in rows]
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts]).astype(np.uint32)
        dls = np.concatenate([p[2] for p in parts]).astype(np.uint32)
        return docs, tfs, dls

    # -- docstore ---------------------------------------------------------

    @property
    def docstore(self):
        """The doc_id-sorted docvalues store (built by build_index phase E)."""
        if self._docstore is None:
            from .docstore import DocStore

            self._docstore = DocStore(os.path.join(self.index_dir, "docvalues"))
        return self._docstore

    def resolve_urls(self, doc_ids: list[int]) -> dict[int, str]:
        """doc_id → url via row-group binary search in the docvalues store
        (falls back to a filtered scan of the analyzed checkpoint for
        pre-docvalues indexes)."""
        try:
            return self.docstore.resolve_urls(doc_ids)
        except FileNotFoundError:
            dset = pa_ds.dataset(os.path.join(self.index_dir, "analyzed"))
            want = pc.field("doc_id").isin([np.uint64(d) for d in doc_ids])
            tbl = dset.to_table(columns=["doc_id", "url"], filter=want)
            return dict(
                zip(tbl["doc_id"].to_numpy().tolist(), tbl["url"].to_pylist())
            )

    def postings_with_positions(
        self, term: str
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, dls, flat_positions, pos_offsets) — posting i's
        token positions are flat[pos_offsets[i]:pos_offsets[i+1]]. Requires
        an index built with ``store_positions=True``."""
        from ..functions.codecs import decode_positions, decode_postings_blocks

        # guard BEFORE any empty-term early return, so a phrase with an
        # unknown term still raises on a non-positional index instead of
        # silently returning nothing
        if not self.manifest.doc["config"].get("store_positions"):
            raise ValueError(
                "index was built without positions (store_positions=False)")
        rows = self._term_rows(term)
        e = np.empty(0, dtype=np.uint64)
        if not rows:
            return (e, e.astype(np.uint32), e.astype(np.uint32),
                    np.empty(0, np.uint32), np.zeros(1, np.int64))
        docs_p, tfs_p, dls_p, pos_p = [], [], [], []
        for r in rows:
            d, t, l = decode_postings_blocks(r)
            docs_p.append(d)
            tfs_p.append(t)
            dls_p.append(l)
            pos_p.append(decode_positions(r["pos_bytes"],
                                          np.minimum(t, 255).astype(np.int64)))
        docs = np.concatenate(docs_p)
        tfs = np.concatenate(tfs_p).astype(np.uint32)
        dls = np.concatenate(dls_p).astype(np.uint32)
        flat = np.concatenate(pos_p).astype(np.uint32)
        lens = np.minimum(tfs, 255).astype(np.int64)
        off = np.zeros(len(docs) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        return docs, tfs, dls, flat, off

    def vocabulary_size(self) -> int:
        return int(self.manifest.phase("termstats").get("n_terms", 0))

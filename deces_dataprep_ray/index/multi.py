"""Incremental indexing: query a union of index generations.

The reference appends monthly delta files and re-runs the whole build with
snapshot-skip (`Makefile:42` FILES_TO_PROCESS spans annual + monthly files;
`Makefile:177-181` full-check skip). Here appends are first-class: build the
NEW documents into their own index directory (cheap — only the delta is
analyzed/shuffled) and serve both generations through :class:`MultiReader`.

Scoring is EXACTLY a full rebuild's: the exhaustive scorer recomputes BM25
weights from the stored (tf, dl) at query time using the READER's corpus
stats, and MultiReader exposes the combined N, Σdl and avgdl (summed from
the generations' manifests) with per-term df summed across generations —
so idf and length norms match a from-scratch index over the union
(doc sets must be disjoint; same analyzer/k1/b enforced).

Block-max metadata baked at build time uses per-generation avgdl; the
pruned path stays available because each generation's ``blk_max_w`` can be
rescaled to a bound valid under the UNION avgdl: with
w = tf/(tf + k1(1-b) + k1·b·dl/avgdl) and r = avgdl_union/avgdl_gen,
r ≥ 1 ⇒ w_union ≤ r·w_gen (the denominator shrinks by at most r), and
r < 1 ⇒ w_union ≤ w_gen. ``term_segments`` applies scale = max(1, r) per
generation, so ``search_pruned`` over a MultiReader is rank- and
score-identical to ``search_exact`` over the union (actual weights are
recomputed from the stored (tf, dl) with union stats; only the skip bounds
are scaled). WAND's cursor path is not wired here — pruned + exact +
conjunctive cover serving; at scale, compact generations periodically
exactly like the reference's monthly→annual rollup.
"""

from __future__ import annotations

import numpy as np

from .reader import IndexReader


class MultiReader:
    """Read-only union over index generations.

    Doc sets must be disjoint UNLESS the overlap is covered by tombstones
    (``tombstone_docs``): generation i serves a doc unless generation i or
    a LATER one tombstoned it — the ES/Lucene live-docs rule. An update
    re-adds the doc in a new generation and tombstones the previous
    newest. Stats contract while tombstones are live (matching Lucene,
    where deleted docs smear scores until a merge): the CORPUS stats N and
    avgdl stay unadjusted, but per-term df IS live — ``postings`` filters
    tombstoned docs and the exhaustive scorer derives idf from the filtered
    posting length, so ``df()`` returns the live-doc count too (never the
    raw per-generation sum). ``compact_generations`` drops tombstoned
    postings and subtracts their exact stats contribution, after which N
    and avgdl are exact again."""

    def __init__(self, index_dirs: list[str]):
        assert index_dirs
        self.readers = [IndexReader(d) for d in index_dirs]
        self.exclusions = generation_exclusions(list(index_dirs))
        self.has_tombstones = any(len(e) for e in self.exclusions)
        cfg0 = self.readers[0].manifest.doc["config"]
        for r in self.readers[1:]:
            cfg = r.manifest.doc["config"]
            # every key that changes term strings, weights or payload layout
            # must match — a fielded generation unioned with a single-field
            # one would silently return partial results
            for key in ("analyzer", "k1", "b", "fields", "keyword_fields",
                        "store_positions"):
                if cfg.get(key) != cfg0.get(key):
                    raise ValueError(
                        f"generation {r.index_dir} differs in {key!r}: "
                        f"{cfg.get(key)!r} vs {cfg0.get(key)!r}")
        self.k1 = float(cfg0["k1"])
        self.b = float(cfg0["b"])
        self.n_docs = sum(r.n_docs for r in self.readers)
        total_dl = sum(
            int(r.manifest.phase("stats").get("total_dl", 0))
            for r in self.readers)
        self.avgdl = (total_dl / self.n_docs) if self.n_docs else 1.0
        self._postings_cache: dict[str, tuple] = {}

    def postings(self, term: str):
        cached = self._postings_cache.get(term)
        if cached is not None:
            return cached
        parts = []
        for r, excl in zip(self.readers, self.exclusions):
            p = r.postings(term)
            if len(excl) and len(p[0]):
                # drop docs tombstoned by a LATER generation (sorted-set
                # membership — the lazy must_not machinery's shape)
                keep = ~np.isin(p[0], excl, assume_unique=True)
                p = (p[0][keep], p[1][keep], p[2][keep])
            parts.append(p)
        docs = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts]).astype(np.uint32)
        dls = np.concatenate([p[2] for p in parts]).astype(np.uint32)
        order = np.argsort(docs, kind="stable")
        out = (docs[order], tfs[order], dls[order])
        if len(self._postings_cache) >= 1024:
            self._postings_cache.pop(next(iter(self._postings_cache)))
        self._postings_cache[term] = out
        return out

    def df(self, term: str) -> int:
        """LIVE-doc document frequency — consistent with what the scorers
        use: tombstoned docs are excluded (the cached filtered union), so
        df == len(postings(term)[0]) always. Without tombstones this equals
        the cheap per-generation sum (disjoint doc sets)."""
        if not self.has_tombstones:
            return sum(r.df(term) for r in self.readers)
        return len(self.postings(term)[0])

    def term_segments(self, term: str) -> tuple[dict, ...]:
        """Every generation's encoded segments for ``term``, with block-max
        weights rescaled by max(1, avgdl_union/avgdl_gen) so they remain
        valid UPPER bounds under the union's avgdl (see module doc). Segment
        dicts are copies — the per-reader caches stay untouched. Doc ranges
        interleave across generations (hash ids), which the pruned scorer
        tolerates: it only needs per-segment block bounds, never a global
        doc order across segments."""
        if self.has_tombstones:
            # the pruned scorer decodes segments directly and would score
            # (and could return) tombstoned docs; between compactions a
            # tombstoned union serves through the exhaustive scorer over
            # the filtered ``postings`` union — the fast path returns at
            # compaction (the reference's monthly rollup cadence; ES takes
            # the same hit on high-delete-ratio segments until merge)
            raise RuntimeError(
                "pruned/segment serving unavailable while tombstones are "
                "live; use the exact scorer or compact_generations()")
        out: list[dict] = []
        for r in self.readers:
            scale = max(1.0, self.avgdl / r.avgdl)
            for seg in r.term_segments(term):
                if scale != 1.0:
                    seg = {**seg, "blk_max_w": seg["blk_max_w"] * scale}
                out.append(seg)
        return tuple(out)

    def resolve_urls(self, doc_ids: list[int]) -> dict[int, str]:
        out: dict[int, str] = {}
        remaining = list(doc_ids)
        for r in self.readers:
            if not remaining:
                break
            got = r.resolve_urls(remaining)
            out.update(got)
            remaining = [d for d in remaining if d not in out]
        return out

    def vocabulary_size(self) -> int:
        # upper bound (terms shared across generations count once per gen)
        return sum(r.vocabulary_size() for r in self.readers)


# --- tombstones: deletes / updates between compactions ----------------------

TOMBSTONE_FILE = "_tombstones.parquet"


def tombstone_docs(index_dir: str, doc_ids=None, urls=None) -> int:
    """Mark docs deleted in generation ``index_dir`` AND all earlier
    generations of a :class:`MultiReader` list (the Lucene live-docs rule:
    a delete masks the segment where the doc lives; later generations are
    untouched). The ES delete/update story between merges:

    - delete  = tombstone the doc_id in the NEWEST generation (kills every
      live copy),
    - update  = rebuild the doc into a NEW generation (same url ⇒ same
      doc_id), then tombstone the previously-newest generation — the old
      copies go dark, the new copy serves.

    Merges into ``<index_dir>/_tombstones.parquet`` (sorted uint64,
    atomic replace). Returns the total tombstone count after the merge."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.ids import doc_id_from_url

    ids = [np.uint64(d) for d in (doc_ids or [])]
    ids += [np.uint64(doc_id_from_url(u)) for u in (urls or [])]
    path = os.path.join(index_dir, TOMBSTONE_FILE)
    merged = np.asarray(ids, np.uint64)
    if os.path.exists(path):
        merged = np.concatenate(
            [pq.read_table(path)["doc_id"].to_numpy().astype(np.uint64),
             merged])
    merged = np.unique(merged)
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.uint64())}), tmp)
    os.replace(tmp, path)
    return int(len(merged))


def load_tombstones(index_dir: str) -> np.ndarray:
    """Sorted uint64 tombstones of a generation (empty if none)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(index_dir, TOMBSTONE_FILE)
    if not os.path.exists(path):
        return np.empty(0, np.uint64)
    return pq.read_table(path)["doc_id"].to_numpy().astype(np.uint64)


def generation_exclusions(index_dirs: list[str]) -> list[np.ndarray]:
    """Per-generation exclusion sets: exclusions[i] = sorted union of the
    tombstones carried by generation i AND every later generation (list
    order = generation order, oldest first) — a tombstone kills the doc in
    its own generation and all earlier ones, never in later ones (where an
    updated copy may live)."""
    tombs = [load_tombstones(d) for d in index_dirs]
    out: list[np.ndarray] = []
    acc = np.empty(0, np.uint64)
    for t in reversed(tombs):
        acc = np.union1d(acc, t)
        out.append(acc)
    return list(reversed(out))

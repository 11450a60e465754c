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
    """Read-only union over index generations (disjoint doc sets)."""

    def __init__(self, index_dirs: list[str]):
        assert index_dirs
        self.readers = [IndexReader(d) for d in index_dirs]
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
        parts = [r.postings(term) for r in self.readers]
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
        return sum(r.df(term) for r in self.readers)

    def term_segments(self, term: str) -> tuple[dict, ...]:
        """Every generation's encoded segments for ``term``, with block-max
        weights rescaled by max(1, avgdl_union/avgdl_gen) so they remain
        valid UPPER bounds under the union's avgdl (see module doc). Segment
        dicts are copies — the per-reader caches stay untouched. Doc ranges
        interleave across generations (hash ids), which the pruned scorer
        tolerates: it only needs per-segment block bounds, never a global
        doc order across segments."""
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

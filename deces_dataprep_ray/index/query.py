"""Top-k BM25 query engine: exhaustive oracle + block-max WAND.

The reference's query side is an Elasticsearch ``match`` query ranked by
``_score`` with Lucene practical BM25, k1=1.2, b=0.75 (no ``similarity``
override in `datasets/deces_index.yml:6-38`). Here both the exhaustive oracle
and the block-max WAND engine are owned, and are **rank- and score-identical**
by construction:

- score(d) = Σ_t idf(t) · tf/(tf + k1·(1−b+b·dl/avgdl)), accumulated in
  float64 in ascending unique-term order (query terms sorted lexicographically
  after analysis); idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).
- ties broken by ascending doc_id.
- WAND skips a doc only when its block-max upper bound is strictly below the
  current k-th score minus a 1e-9 guard band, so float rounding in the upper
  bound can never drop a true top-k doc.
"""

from __future__ import annotations

import heapq
import math

import numpy as np

from ..functions.analysis import tokenize
from ..functions.codecs import decode_block, decode_block_run
from .build import bm25_weight
from .reader import IndexReader

_EPS = 1e-9


def analyze_query(query: str) -> list[str]:
    """Query analysis = the same norm chain; unique terms, sorted."""
    return sorted(set(tokenize(query)))


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _topk_from_scores(
    doc_ids: np.ndarray, scores: np.ndarray, k: int
) -> list[tuple[int, float]]:
    """Select top-k by (score desc, doc_id asc)."""
    n = len(doc_ids)
    if n == 0:
        return []
    kk = min(k, n)
    # partial select, then take EVERY doc tied at the k-th score so the
    # (score desc, doc_id asc) tie-break is exact even under massive ties
    if n > 4 * kk:
        part = np.argpartition(-scores, kk - 1)
        kth = scores[part[:kk]].min()
        cand = np.flatnonzero(scores >= kth)
    else:
        cand = np.arange(n)
    order = cand[np.lexsort((doc_ids[cand], -scores[cand]))][:kk]
    return [(int(doc_ids[i]), float(scores[i])) for i in order]


def _score_all(
    reader: IndexReader, query: str
) -> tuple[np.ndarray, np.ndarray]:
    """Exhaustively score every doc matching any query term: (sorted doc_id
    array, parallel float64 score array). Accumulation order per doc is
    ascending term order (terms iterated sorted)."""
    terms = analyze_query(query)
    gathered = []
    for t in terms:
        docs, tfs, dls = reader.postings(t)
        if len(docs):
            gathered.append((t, docs, tfs, dls))
    if not gathered:
        return np.empty(0, np.uint64), np.empty(0, np.float64)
    union = np.unique(np.concatenate([g[1] for g in gathered]))
    scores = np.zeros(len(union), dtype=np.float64)
    for t, docs, tfs, dls in gathered:  # sorted term order
        w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
        contrib = idf(reader.n_docs, len(docs)) * w
        scores[np.searchsorted(union, docs)] += contrib
    return union, scores


def search_exact(
    reader: IndexReader, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Exhaustive scorer — the oracle. Fully vectorized."""
    union, scores = _score_all(reader, query)
    if not len(union):
        return []
    return _topk_from_scores(union, scores, k)


def search_after(
    reader: IndexReader,
    query: str,
    k: int = 10,
    after: tuple[float, str] | None = None,
    ndigits: int = 6,
) -> list[tuple[int, float, str]]:
    """Deep pagination (ES ``search_after``). Total order over hits:
    (round(score, ndigits) DESC, url ASC) — ES's ``[_score, _id]`` sort.
    Internal doc_ids are assignment-order-dependent, so the durable external
    id (url) is the tiebreaker; the score is rounded because 1-ulp ties
    differ across engines and the cursor must be exchangeable. Returns the k
    hits strictly after cursor ``after=(rounded_score, url)`` (None = first
    page) as [(doc_id, score, url)].

    Urls resolve lazily per descending score group (pruned docstore lookup),
    so a page deep in the ranking resolves O(hits down to that page), never
    every scored doc. Scoring itself is the exhaustive pass: block-max
    pruning bounds scores from ABOVE and cannot skip below-cursor work."""
    union, scores = _score_all(reader, query)
    if not len(union):
        return []
    # half-away-from-zero rounding (SQL ROUND semantics, np.round is
    # half-even) — the rounded score is part of the exchangeable cursor, so
    # its definition must match what an external consumer recomputes
    f = 10.0 ** ndigits
    rounded = np.floor(np.abs(scores) * f + 0.5) / f * np.sign(scores)
    order = np.argsort(-rounded, kind="stable")
    a_s, a_u = after if after is not None else (None, "")
    out: list[tuple[int, float, str]] = []
    i, n = 0, len(order)
    while i < n and len(out) < k:
        s = rounded[order[i]]
        j = i
        while j < n and rounded[order[j]] == s:
            j += 1
        if a_s is not None and s > a_s:  # whole group is before the cursor
            i = j
            continue
        grp = order[i:j]
        ids = union[grp]
        urls = reader.resolve_urls(ids.tolist())
        raw = {int(d): float(scores[g]) for d, g in zip(ids, grp)}
        for u, d in sorted((urls[int(d)], int(d)) for d in ids):
            if a_s is not None and s == a_s and u <= a_u:
                continue
            out.append((d, raw[d], u))
            if len(out) == k:
                break
        i = j
    return out


class _Cursor:
    """Posting cursor over a term's ordered segments with lazy block decode."""

    __slots__ = (
        "term", "order", "idf", "segs", "blk_last", "blk_max_w", "blk_seg",
        "blk_local", "nblk", "bi", "pos", "cur_docs", "cur_w", "max_score",
        "doc", "exhausted", "avgdl", "k1", "b",
    )

    def __init__(self, term: str, order: int, reader: IndexReader):
        self.term = term
        self.order = order
        self.avgdl = reader.avgdl
        self.k1 = reader.k1
        self.b = reader.b
        segs = reader.term_segments(term)
        self.segs = segs
        total_df = sum(r["df"] for r in segs)
        self.idf = idf(reader.n_docs, total_df)
        last, maxw, seg_idx, local = [], [], [], []
        for si, r in enumerate(segs):
            nb = len(r["blk_last"])
            last.append(r["blk_last"])
            maxw.append(r["blk_max_w"])
            seg_idx.append(np.full(nb, si, dtype=np.int32))
            local.append(np.arange(nb, dtype=np.int32))
        self.blk_last = np.concatenate(last) if last else np.empty(0, np.uint64)
        self.blk_max_w = np.concatenate(maxw) if maxw else np.empty(0, np.float64)
        self.blk_seg = np.concatenate(seg_idx) if seg_idx else np.empty(0, np.int32)
        self.blk_local = np.concatenate(local) if local else np.empty(0, np.int32)
        self.nblk = len(self.blk_last)
        self.max_score = float(self.blk_max_w.max()) * self.idf if self.nblk else 0.0
        self.bi = -1
        self.pos = 0
        self.cur_docs = None
        self.cur_w = None
        self.doc = -1
        self.exhausted = self.nblk == 0
        if not self.exhausted:
            self._load_block(0)
            self.doc = int(self.cur_docs[0])

    def _load_block(self, bi: int):
        self.bi = bi
        self.pos = 0
        seg = self.segs[self.blk_seg[bi]]
        docs, tfs, dls = decode_block(seg, int(self.blk_local[bi]))
        self.cur_docs = docs
        self.cur_w = bm25_weight(tfs, dls, self.avgdl, self.k1, self.b)

    def block_max_contrib(self) -> float:
        return float(self.blk_max_w[self.bi]) * self.idf

    def contrib(self) -> float:
        return self.idf * float(self.cur_w[self.pos])

    def next_geq(self, target: int) -> int:
        """Advance to first doc >= target; returns new current doc (or -1)."""
        if self.exhausted:
            return -1
        t = np.uint64(target)
        if self.blk_last[self.bi] < t:
            nbi = self.bi + int(
                np.searchsorted(self.blk_last[self.bi:], t, side="left")
            )
            if nbi >= self.nblk:
                self.exhausted = True
                self.doc = -1
                return -1
            self._load_block(nbi)
        self.pos = int(np.searchsorted(self.cur_docs, t, side="left"))
        if self.pos >= len(self.cur_docs):
            # target falls in a gap right at block end
            if self.bi + 1 >= self.nblk:
                self.exhausted = True
                self.doc = -1
                return -1
            self._load_block(self.bi + 1)
        self.doc = int(self.cur_docs[self.pos])
        return self.doc

    def advance(self) -> int:
        """Move one posting forward."""
        if self.exhausted:
            return -1
        self.pos += 1
        if self.pos >= len(self.cur_docs):
            if self.bi + 1 >= self.nblk:
                self.exhausted = True
                self.doc = -1
                return -1
            self._load_block(self.bi + 1)
        self.doc = int(self.cur_docs[self.pos])
        return self.doc


def _search_single_term(reader: IndexReader, term: str, k: int) -> list[tuple[int, float]]:
    docs, tfs, dls = reader.postings(term)
    if not len(docs):
        return []
    w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
    scores = idf(reader.n_docs, len(docs)) * w
    return _topk_from_scores(docs, scores, k)


def search_wand(
    reader: IndexReader, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Block-max WAND top-k. Rank- and score-identical to ``search_exact``."""
    terms = analyze_query(query)
    if not terms:
        return []
    if len(terms) == 1:
        return _search_single_term(reader, terms[0], k)
    cursors = [
        c for c in (_Cursor(t, i, reader) for i, t in enumerate(terms))
        if not c.exhausted
    ]
    if not cursors:
        return []

    # heap entries: (score, -doc_id); min entry = current threshold
    heap: list[tuple[float, int]] = []

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -math.inf

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # find pivot: first cursor where cumulative global max >= threshold
        th = threshold()
        acc = 0.0
        pivot_idx = -1
        for i, c in enumerate(live):
            acc += c.max_score
            if acc >= th:
                pivot_idx = i
                break
        if pivot_idx < 0:
            break  # even all terms together cannot reach the threshold
        pivot_doc = live[pivot_idx].doc

        if live[0].doc == pivot_doc:
            # all cursors ≤ pivot are aligned on pivot_doc
            aligned = [c for c in live if c.doc == pivot_doc]
            # block-max refinement
            block_ub = sum(c.block_max_contrib() for c in aligned)
            if block_ub < th - _EPS:
                # BMW deep skip (Ding & Suel): no doc can beat the threshold
                # while every aligned cursor stays in its current block, so
                # jump to the nearest block boundary — capped at the next
                # unaligned cursor's doc, where the upper bound changes
                target = min(int(c.blk_last[c.bi]) for c in aligned) + 1
                rest = [c.doc for c in live if c.doc > pivot_doc]
                if rest:
                    target = min(target, min(rest))
                target = max(target, pivot_doc + 1)
                for c in aligned:
                    c.next_geq(target)
                continue
            # full evaluation — accumulate in term order (== oracle order)
            aligned.sort(key=lambda c: c.order)
            score = 0.0
            for c in aligned:
                score += c.contrib()
            entry = (score, -pivot_doc)
            if len(heap) < k:
                heapq.heappush(heap, entry)
            elif entry > heap[0]:
                heapq.heapreplace(heap, entry)
            for c in aligned:
                c.advance()
        else:
            # advance the lagging cursor with the largest idf to the pivot
            lag = max(
                (c for c in live[:pivot_idx] if c.doc < pivot_doc),
                key=lambda c: c.max_score,
                default=live[0],
            )
            lag.next_geq(pivot_doc)

    out = sorted(heap, key=lambda e: (-e[0], -e[1]))
    return [(-d, s) for s, d in out]


def search_pruned(
    reader: IndexReader, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Vectorized block-max pruning — rank- and score-identical to
    ``search_exact``, with BMW-style skipping but no per-doc Python loop.

    1. Bootstrap a threshold θ: decode the strongest term's blocks in
       descending block-max order until k docs are seen; θ = the k-th best
       *actual* solo contribution (a valid lower bound on the final k-th
       score).
    2. Prune: block b of term t is dropped iff
       idf_t·max_w(b) + Σ_{t'≠t} UBglobal(t') < θ − ε — every doc in such a
       block provably scores < θ, so it cannot reach the top-k, and its
       partial scores elsewhere cannot displace anything (partial ≤ true < θ).
    3. Run the exact vectorized accumulation (ascending-term float64 order)
       over the surviving blocks only.
    """
    terms = analyze_query(query)
    infos = []
    for t in terms:  # sorted term order
        segs = reader.term_segments(t)
        if not segs:
            continue
        df = sum(r["df"] for r in segs)
        w_idf = idf(reader.n_docs, df)
        blk_max = np.concatenate([r["blk_max_w"] for r in segs])
        infos.append({"term": t, "segs": segs, "idf": w_idf,
                      "ub": w_idf * float(blk_max.max()) if len(blk_max) else 0.0})
    if not infos:
        return []
    total_ub = sum(i["ub"] for i in infos)

    # --- bootstrap θ from the strongest term ---
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
        _, tfs, dls = decode_block(seg, bi)
        w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
        solo.append(best["idf"] * w)
        seen += len(w)
        if seen >= k:
            break
    theta = -math.inf
    if solo:
        allsolo = np.concatenate(solo)
        if len(allsolo) >= k:
            theta = float(np.partition(allsolo, len(allsolo) - k)[len(allsolo) - k])

    # --- prune + decode survivors, then exact accumulation ---
    gathered = []
    for info in infos:
        rest_ub = total_ub - info["ub"]
        keep_masks = [
            info["idf"] * seg["blk_max_w"] + rest_ub >= theta - _EPS
            for seg in info["segs"]
        ]
        if all(m.all() for m in keep_masks):
            # nothing prunable for this term — take the reader's (cached)
            # full decode instead of re-slicing blocks
            docs, tfs, dls = reader.postings(info["term"])
            w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
            gathered.append((docs, info["idf"] * w))
            continue
        docs_parts, w_parts = [], []
        for seg, mask in zip(info["segs"], keep_masks):
            keep = np.flatnonzero(mask)
            if len(keep) == 0:
                continue
            # decode contiguous runs of surviving blocks in single calls
            run_breaks = np.flatnonzero(np.diff(keep) > 1)
            run_starts = np.concatenate(([0], run_breaks + 1))
            run_ends = np.concatenate((run_breaks, [len(keep) - 1]))
            for rs, re_ in zip(run_starts, run_ends):
                d, tfs, dls = decode_block_run(seg, int(keep[rs]), int(keep[re_]))
                docs_parts.append(d)
                w_parts.append(bm25_weight(tfs, dls, reader.avgdl,
                                           reader.k1, reader.b))
        if docs_parts:
            gathered.append((np.concatenate(docs_parts),
                             info["idf"] * np.concatenate(w_parts)))
    if not gathered:
        return []
    union = np.unique(np.concatenate([g[0] for g in gathered]))
    scores = np.zeros(len(union), dtype=np.float64)
    for docs, contrib in gathered:  # sorted term order
        scores[np.searchsorted(union, docs)] += contrib
    return _topk_from_scores(union, scores, k)


def search_and(
    reader: IndexReader, query: str, k: int = 10
) -> list[tuple[int, float]]:
    """Conjunctive top-k: only docs containing ALL query terms score —
    ES ``match`` with ``operator: and`` semantics. Scores are the same BM25
    sums as the OR scorers (same float order), restricted to the
    intersection."""
    terms = analyze_query(query)
    if not terms:
        return []
    gathered = []
    for t in terms:
        docs, tfs, dls = reader.postings(t)
        if len(docs) == 0:
            return []  # a missing term empties the conjunction
        gathered.append((t, docs, tfs, dls))
    inter = gathered[0][1]
    for _, docs, _, _ in gathered[1:]:
        inter = np.intersect1d(inter, docs, assume_unique=True)
        if len(inter) == 0:
            return []
    scores = np.zeros(len(inter), dtype=np.float64)
    for t, docs, tfs, dls in gathered:  # sorted term order
        w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
        contrib = idf(reader.n_docs, len(docs)) * w
        pos = np.searchsorted(docs, inter)
        scores += contrib[pos]
    return _topk_from_scores(inter, scores, k)


def expand_prefix(reader: IndexReader, prefix: str,
                  max_expansions: int = 1024,
                  field: str | None = None) -> list[str]:
    """Terms starting with ``prefix``, from the termstats dictionary.

    The reference accelerates year/year-month prefix search with ES
    ``index_prefixes`` (`datasets/deces_index.yml:79-82,118-121`); here the
    sorted term dictionary serves the expansion (a dictionary range scan —
    row-group pruned by parquet statistics). Expansion is capped like ES
    ``max_expansions``; the cap keeps the largest-df terms (most selective
    ranking signal comes from them under OR semantics).

    ``field``: scope the expansion to ONE field of a fielded index — the
    dictionary scan runs over ``field:prefix`` and the returned tokens are
    BARE (prefix stripped), ready for a ``search_fields`` match clause."""
    import os

    import pyarrow.dataset as pa_ds

    ts_dir = os.path.join(reader.index_dir, "termstats")
    if not os.path.isdir(ts_dir):
        return []
    import pyarrow.compute as pc

    scan_prefix = f"{field}:{prefix}" if field else prefix
    tbl = pa_ds.dataset(ts_dir).to_table(
        columns=["term", "df"],
        filter=pc.starts_with(pc.field("term"), scan_prefix),
    )
    terms = tbl["term"].to_pylist()
    if field:
        terms = [t[len(field) + 1:] for t in terms]
    if len(terms) > max_expansions:
        dfs = tbl["df"].to_numpy()
        keep = np.argsort(-dfs, kind="stable")[:max_expansions]
        terms = [terms[i] for i in sorted(keep)]
    return sorted(terms)


def search_prefix(
    reader: IndexReader, query: str, k: int = 10,
    max_expansions: int = 1024,
    field: str | None = None,
) -> list[tuple[int, float]]:
    """Prefix query: tokens ending in ``*`` expand to all dictionary terms
    with that prefix; the expanded unique term set scores as a plain OR
    BM25 (each expanded term contributes its own idf — multi-term
    expansion semantics, defined here and mirrored by the SQL oracle).
    With ``field``, expansion and scoring are scoped to that field of a
    fielded index (per-field idf/avgdl via ``search_fields``)."""
    raw = query.split()
    expanded: set[str] = set()
    for tok in raw:
        if tok.endswith("*") and len(tok) > 1:
            # positional tokenization: the starred token's LAST subtoken is
            # the prefix stem ('marie-an*' → exact 'marie' + prefix 'an'),
            # not analyze_query's lexicographically-last
            toks = tokenize(tok[:-1])
            if toks:
                expanded.update(expand_prefix(reader, toks[-1],
                                              max_expansions, field=field))
                expanded.update(toks[:-1])
        else:
            expanded.update(analyze_query(tok))
    if not expanded:
        return []
    joined = " ".join(sorted(expanded))
    if field:
        from .fielded import search_fields

        return search_fields(reader, [(field, joined)], k)
    return search_exact(reader, joined, k)


def expand_regexp(reader: IndexReader, pattern: str,
                  max_expansions: int = 1024,
                  field: str | None = None,
                  _literal_prefix: str | None = None) -> list[str]:
    """Terms fully matching ``pattern`` (ES ``regexp`` query semantics:
    the regex is anchored to the WHOLE term), from the termstats
    dictionary. A literal prefix (given or extracted from the pattern)
    becomes a parquet ``starts_with`` row-group-pruning pre-filter so an
    anchored scan does not decode the whole dictionary; the regex then
    verifies exactly. Expansion capped like ES ``max_expansions``/
    ``rewrite: top_terms_N`` (largest-df terms kept)."""
    import os
    import re

    import pyarrow.compute as pc
    import pyarrow.dataset as pa_ds

    ts_dir = os.path.join(reader.index_dir, "termstats")
    if not os.path.isdir(ts_dir):
        return []
    if _literal_prefix is None:
        # longest leading run of plain literal chars (stop at any regex
        # metachar; a trailing literal before '*'/'?'/'{' is NOT safe to
        # include — it may repeat zero times — so back off one char).
        # An alternation ANYWHERE voids the prefix: 'ab|cd' matches terms
        # that do not start with 'ab'.
        if "|" in pattern:
            _literal_prefix = ""
        else:
            m = re.match(r"[^.^$*+?()\[\]{}|\\]*", pattern)
            lit = m.group(0) if m else ""
            if lit and len(lit) < len(pattern) and pattern[len(lit)] in "*?{":
                lit = lit[:-1]
            _literal_prefix = lit
    # Serving policy: the reader's in-memory dictionary (the same cache the
    # fuzzy path owns) serves every expansion after a one-time load — a
    # per-query parquet scan re-lists files and re-reads footers, which
    # dominates latency even prefix-pruned (measured 200 ms vs ~2 ms warm).
    # ``use_dict_cache=False`` on the reader opts a memory-constrained
    # deployment back into the row-group-pruned cold scan (only possible
    # when the pattern has a literal prefix to prune with).
    if getattr(reader, "use_dict_cache", True) or not _literal_prefix:
        voc = _vocab_cache(reader, field)
        if voc is None:
            return []
        pa_terms = voc.get("pa_terms")
        if pa_terms is None:
            import pyarrow as pa

            pa_terms = voc["pa_terms"] = pa.array(voc["terms"],
                                                  pa.large_string())
        keep = pc.match_substring_regex(pa_terms, f"^(?:{pattern})$")
        idx = np.flatnonzero(keep.to_numpy(zero_copy_only=False))
        terms = voc["terms"][idx].tolist()
        dfs = voc["dfs"][idx]
    else:
        scan_prefix = (f"{field}:{_literal_prefix}" if field
                       else _literal_prefix)
        tbl = pa_ds.dataset(ts_dir).to_table(columns=["term", "df"],
                                             filter=pc.starts_with(
                                                 pc.field("term"),
                                                 scan_prefix))
        terms_arr = tbl["term"]
        if field:
            # strip 'field:' then anchor-match the bare token
            terms_arr = pc.utf8_slice_codeunits(
                terms_arr.combine_chunks(), len(field) + 1, 2**31 - 1)
        keep = pc.match_substring_regex(terms_arr, f"^(?:{pattern})$")
        idx = np.flatnonzero(np.asarray(keep.to_numpy(zero_copy_only=False),
                                        bool))
        terms = [terms_arr[int(i)].as_py() for i in idx]
        dfs = tbl["df"].to_numpy()[idx]
    if len(terms) > max_expansions:
        top = np.argsort(-np.asarray(dfs), kind="stable")[:max_expansions]
        terms = [terms[i] for i in sorted(top)]
    return sorted(terms)


_WILDCARD_META = {"*": ".*", "?": "."}


def wildcard_to_regexp(pattern: str) -> tuple[str, str]:
    """ES ``wildcard`` pattern → (anchored-regex body, literal prefix).
    ``*`` = any run, ``?`` = any single char; everything else literal."""
    import re

    parts: list[str] = []
    for ch in pattern:
        parts.append(_WILDCARD_META.get(ch) or re.escape(ch))
    m = re.match(r"[^*?]*", pattern)
    return "".join(parts), (m.group(0) if m else "")


def search_wildcard(
    reader: IndexReader, pattern: str, k: int = 10,
    max_expansions: int = 1024,
    field: str | None = None,
) -> list[tuple[int, float]]:
    """ES ``wildcard`` query: the pattern expands against the term
    dictionary (``*``/``?`` metachars); the expanded unique term set scores
    as a plain OR BM25, each expanded term contributing its own idf — the
    same multi-term expansion semantics as ``search_prefix``, mirrored by
    the SQL oracle. With ``field``, expansion + scoring are scoped to that
    field of a fielded index."""
    regex, lit = wildcard_to_regexp(pattern.lower())
    expanded = expand_regexp(reader, regex, max_expansions, field=field,
                             _literal_prefix=lit)
    return _score_expansion(reader, expanded, k, field)


def search_regexp(
    reader: IndexReader, pattern: str, k: int = 10,
    max_expansions: int = 1024,
    field: str | None = None,
) -> list[tuple[int, float]]:
    """ES ``regexp`` query: anchored full-term regex expansion, OR BM25
    over the expansion (see ``search_wildcard``)."""
    expanded = expand_regexp(reader, pattern, max_expansions, field=field)
    return _score_expansion(reader, expanded, k, field)


def _score_expansion(reader: IndexReader, expanded: list[str], k: int,
                     field: str | None) -> list[tuple[int, float]]:
    if not expanded:
        return []
    joined = " ".join(sorted(set(expanded)))
    if field:
        from .fielded import search_fields

        return search_fields(reader, [(field, joined)], k)
    return search_exact(reader, joined, k)


def search(
    reader: IndexReader, query: str, k: int = 10, algorithm: str = "auto"
) -> list[tuple[int, float]]:
    """Top-k dispatch. All algorithms are rank- and score-identical (tested);
    they differ only in work skipped. ``auto`` picks by corpus shape: a
    small vocabulary means dense, unprunable posting lists where block-max
    pruning only adds overhead (measured: exact 23 ms vs pruned 78 ms on the
    31-word synthetic corpus), so exact wins below the vocabulary threshold
    and the block-max pruned scorer above it (realistic Zipf vocabularies,
    where lists are sparse and skips dominate)."""
    if algorithm == "auto":
        algorithm = "exact" if reader.vocabulary_size() < 50_000 else "pruned"
        if getattr(reader, "has_tombstones", False):
            # live tombstones: only the exhaustive scorer sees the filtered
            # postings union (multi.MultiReader.term_segments documents why)
            algorithm = "exact"
    if algorithm == "pruned":
        return search_pruned(reader, query, k)
    if algorithm == "wand":
        return search_wand(reader, query, k)
    if algorithm == "exact":
        return search_exact(reader, query, k)
    raise ValueError(f"unknown algorithm {algorithm!r}")


def _levenshtein_batch(query: str, cands: list[str]) -> np.ndarray:
    """Classic Levenshtein distance query→each candidate, vectorized over
    the candidate axis (DP loops over the two string lengths only). Matches
    DuckDB ``levenshtein`` (no transpositions)."""
    if not cands:
        return np.empty(0, np.int32)
    q = np.frombuffer(query.encode("utf-32-le"), np.uint32)
    maxlen = max(len(c) for c in cands)
    mat = np.zeros((len(cands), maxlen), np.uint32)
    lens = np.empty(len(cands), np.int64)
    for i, c in enumerate(cands):
        b = np.frombuffer(c.encode("utf-32-le"), np.uint32)
        mat[i, : len(b)] = b
        lens[i] = len(b)
    # dp[i, j] over candidates i: previous row = distance for query prefix
    prev = np.broadcast_to(np.arange(maxlen + 1, dtype=np.int32),
                           (len(cands), maxlen + 1)).copy()
    for qi in range(1, len(q) + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = qi
        sub = prev[:, :-1] + (mat != q[qi - 1]).astype(np.int32)
        for j in range(1, maxlen + 1):
            cur[:, j] = np.minimum(
                np.minimum(cur[:, j - 1] + 1, prev[:, j] + 1), sub[:, j - 1])
        prev = cur
    return prev[np.arange(len(cands)), lens].astype(np.int32)


def _vocab_cache(reader: IndexReader, field: str | None = None) -> dict | None:
    """The reader's in-memory term dictionary (terms, lengths, dfs) — loaded
    once per reader; with ``field``, a per-field view (terms stripped of
    their ``field:`` prefix) derived once and cached alongside."""
    import os

    import pyarrow.dataset as pa_ds

    cache = getattr(reader, "_vocab_cache", None)
    if cache is None:
        ts_dir = os.path.join(reader.index_dir, "termstats")
        if not os.path.isdir(ts_dir):
            return None
        tbl = pa_ds.dataset(ts_dir).to_table(columns=["term", "df"])
        terms = np.asarray(tbl["term"].to_pylist(), dtype=object)
        lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
        cache = {"terms": terms, "lens": lens,
                 "dfs": tbl["df"].to_numpy()}
        reader._vocab_cache = cache
    if field is None:
        return cache
    fcaches = getattr(reader, "_vocab_cache_fields", None)
    if fcaches is None:
        fcaches = {}
        reader._vocab_cache_fields = fcaches
    got = fcaches.get(field)
    if got is None:
        pfx = field + ":"
        npfx = len(pfx)
        all_terms = cache["terms"]
        keep = np.fromiter((t.startswith(pfx) for t in all_terms),
                           bool, len(all_terms))
        terms = np.asarray([t[npfx:] for t in all_terms[keep]], dtype=object)
        lens = np.fromiter((len(t) for t in terms), np.int64, len(terms))
        got = {"terms": terms, "lens": lens, "dfs": cache["dfs"][keep]}
        fcaches[field] = got
    return got


def expand_fuzzy(reader: IndexReader, term: str, max_dist: int = 1,
                 max_expansions: int = 64,
                 field: str | None = None) -> list[str]:
    """Dictionary terms within Levenshtein distance ``max_dist`` of ``term``.

    The reference's matchID raison d'être is typo-tolerant person matching
    (ES ``fuzziness`` over the same mapping); here the expansion runs over
    the termstats dictionary with a |len| band prune then one vectorized
    edit-distance pass. The dictionary loads once per reader (cached) — at
    web scale this is the in-memory term dictionary every serving node
    already holds. Cap keeps the largest-df expansions, exact match always
    kept first.

    ``field``: scope the expansion to ONE field of a fielded index — edit
    distance runs over that field's bare tokens (``field:`` stripped), and
    bare tokens are returned, ready for a ``search_fields`` match clause."""
    cache = _vocab_cache(reader, field)
    if cache is None:
        return []
    terms, lens, dfs = cache["terms"], cache["lens"], cache["dfs"]
    band = np.flatnonzero(np.abs(lens - len(term)) <= max_dist)
    if not len(band):
        return []
    cands = [terms[i] for i in band]
    dist = _levenshtein_batch(term, cands)
    hit = np.flatnonzero(dist <= max_dist)
    out = [(cands[i], int(dfs[band[i]]), int(dist[i])) for i in hit]
    if len(out) > max_expansions:
        # exact match (dist 0) always survives; then largest df
        out.sort(key=lambda x: (x[2] != 0, -x[1], x[0]))
        out = out[:max_expansions]
    return sorted(t for t, _, _ in out)


def search_fuzzy(
    reader: IndexReader, query: str, k: int = 10,
    max_dist: int = 1, max_expansions: int = 64,
    field: str | None = None,
) -> list[tuple[int, float]]:
    """Fuzzy match: each query token expands to all dictionary terms within
    ``max_dist`` edits; the expanded unique term set scores as plain OR
    BM25 (each expanded term contributes its own idf — same multi-term
    semantics as prefix search, mirrored by the SQL oracle). With ``field``,
    expansion and scoring are scoped to that field of a fielded index
    (per-field idf/avgdl via ``search_fields``)."""
    expanded: set[str] = set()
    for tok in tokenize(query):
        expanded.update(expand_fuzzy(reader, tok, max_dist, max_expansions,
                                     field=field))
    if not expanded:
        return []
    joined = " ".join(sorted(expanded))
    if field:
        from .fielded import search_fields

        return search_fields(reader, [(field, joined)], k)
    return search_exact(reader, joined, k)


# Doc-stride for the flattened cross-doc phrase DP: positions of candidate
# doc i live in [i*_DOC_STRIDE, (i+1)*_DOC_STRIDE). Positions are uint32, so
# 2^33 strictly separates docs; int64 holds stride * n_candidates for any
# candidate set below 2^30 docs.
_DOC_STRIDE = np.int64(1) << np.int64(33)


def _gather_candidate_positions(
    data: dict, tok: str, inter: np.ndarray, idx: dict
) -> np.ndarray:
    """Flat, strictly increasing array of ``doc_rank * stride + position``
    for token ``tok`` over every candidate doc — the whole candidate set's
    position lists in one array, doc identity encoded in the offset."""
    _, _, _, flat, off = data[tok]
    p = idx[tok]  # posting index of each candidate doc for this token
    lens = (off[p + 1] - off[p]).astype(np.int64)
    starts = off[p].astype(np.int64)
    ends = np.cumsum(lens)
    total = int(ends[-1]) if len(ends) else 0
    gather = (np.repeat(starts, lens)
              + np.arange(total) - np.repeat(ends - lens, lens))
    base = np.repeat(np.arange(len(inter), dtype=np.int64) * _DOC_STRIDE,
                     lens)
    return flat[gather].astype(np.int64) + base


def search_phrase(
    reader: IndexReader, phrase: str, k: int = 10, slop: int = 0,
    field: str | None = None, filters: list | None = None,
) -> list[tuple[int, float]]:
    """Phrase query (ES ``match_phrase``) over a positional index.

    slop=0: tokens at consecutive positions. slop>0 (ordered-slop
    semantics, frozen here): the tokens appear IN ORDER with at most
    ``slop`` total extra positions inserted between them (no reordering —
    simpler than Lucene's move-based slop, and exactly SQL-checkable).
    Matching docs score as the plain BM25 sum of the phrase's UNIQUE terms
    (same weights as the OR scorers).

    ``field``: phrase over ONE field of a fielded positional index —
    tokens look up ``field:token`` postings, positions are within that
    field's token stream, and scoring uses the field's docCount/avgdl
    (per-field norms, matching ``search_fields``). ``None`` = the
    single-field index layout.

    ``filters``: the same filter objects ``search_fields`` takes
    (KeywordFilter / NotKeywordFilter / RangeFilter / GeoRadiusFilter) —
    ES bool query with a ``match_phrase`` must clause plus filter context.
    Applied to the intersection BEFORE the position DP, so filtered-out
    docs never pay position gathering.

    Recall cap: the index stores at most 255 positions per posting (the
    uint8 tf quantization, `build.py _analyze_with_positions`), so a phrase
    whose only occurrence starts after a token's 255th occurrence in one
    doc is missed — pathologically repetitive docs only; the SQL oracle has
    no such cap (documented divergence, also in docs/INDEX_FORMAT.md).

    The ordered-slop DP is vectorized ACROSS candidate docs: every
    candidate's position list for token j concatenates into one flat array
    with doc identity folded into the position offset (doc_rank * 2^33), so
    each DP step is one searchsorted + one prefix-min over the whole
    candidate set — no per-doc Python loop. Cross-doc chains self-eliminate:
    a predecessor from an earlier doc inflates the gap by ≥2^33 > slop.
    """
    toks = tokenize(phrase)
    if not toks:
        return []
    prefix = f"{field}:" if field else ""
    if field:
        fstats = reader.field_stats.get(field)
        if fstats is None:
            return []
        n_docs = int(fstats["n_docs"])
        avgdl = float(fstats["avgdl"]) or 1.0
    else:
        n_docs = reader.n_docs
        avgdl = reader.avgdl
    data = {}
    for t in set(toks):
        docs, tfs, dls, flat, off = reader.postings_with_positions(prefix + t)
        if not len(docs):
            return []  # a missing term empties the phrase
        data[t] = (docs, tfs, dls, flat, off)

    inter = data[toks[0]][0]
    for t in set(toks[1:]):
        inter = np.intersect1d(inter, data[t][0], assume_unique=True)
        if not len(inter):
            return []

    if filters:
        from .fielded import _filter_mask, _resolve_filters

        allow, exclude = _resolve_filters(reader, filters)
        if allow is not None and not len(allow):
            return []
        mask = _filter_mask(inter, allow, exclude)
        if mask is not None:
            inter = inter[mask]
            if not len(inter):
                return []

    # ordered-slop DP, one vectorized pass per phrase token over ALL
    # candidate docs at once: U[p] = minimum total gap of any in-order chain
    # ending with token j at flattened position p; the prefix-min trick
    # (min over f<p of U_prev[f] - f) makes each step one accumulate pass.
    idx = {t: np.searchsorted(data[t][0], inter) for t in set(toks)}
    P_prev = _gather_candidate_positions(data, toks[0], inter, idx)
    U_prev = np.zeros(len(P_prev), np.int64)
    for tj in toks[1:]:
        P = _gather_candidate_positions(data, tj, inter, idx)
        if not len(P_prev):
            P_prev = P[:0]
            break
        G = np.minimum.accumulate(U_prev - P_prev)  # min(U[f] - f), f ≤ ·
        at = np.searchsorted(P_prev, P, side="left") - 1  # last f < p
        ok = at >= 0
        U = np.full(len(P), np.iinfo(np.int64).max, np.int64)
        U[ok] = P[ok] - 1 + G[at[ok]]
        keep = U <= slop  # a cross-doc chain's U carries ≥2^33 — never kept
        P_prev, U_prev = P[keep], U[keep]
        if not len(P_prev):
            break
    if not len(P_prev):
        return []
    surv = inter[np.unique(P_prev // _DOC_STRIDE)]

    # score = OR-BM25 of the unique phrase terms, restricted to survivors
    scores = np.zeros(len(surv), dtype=np.float64)
    for t in sorted(set(toks)):
        docs, tfs, dls, _, _ = data[t]
        pos = np.searchsorted(docs, surv)
        w = bm25_weight(tfs[pos], dls[pos], avgdl, reader.k1, reader.b)
        scores += idf(n_docs, len(docs)) * w
    return _topk_from_scores(surv, scores, k)


def search_span_near(
    reader: IndexReader, terms: list[str], k: int = 10, slop: int = 0,
    in_order: bool = False, field: str | None = None,
    filters: list | None = None,
) -> list[tuple[int, float]]:
    """ES/Lucene ``span_near`` over single-term spans: doc matches iff one
    position per (distinct) term fits in a window of ``slop`` extra
    positions. Frozen semantics (Lucene's width rule on unit-length spans):

    - in_order=False: exists p_t per term with (max p − min p) − (m−1) ≤
      slop — delegated window check, any term order inside the window;
    - in_order=True: delegates to :func:`search_phrase`'s ordered-slop DP
      (total inserted gap ≤ slop — the identical width formula when the
      terms appear in the given order).

    Matching docs score as the OR-BM25 of the unique terms (the engine's
    phrase convention). The unordered check is vectorized across the whole
    candidate set: anchors are EVERY position of every term (a satisfying
    window's min position is some term's position), and each term does one
    searchsorted against its stride-encoded position array per anchor set —
    no per-doc loop. Same filter context as ``search_phrase``."""
    toks = [t for tok in terms for t in tokenize(tok)]
    if not toks:
        return []
    if in_order:
        return search_phrase(reader, " ".join(toks), k, slop=slop,
                             field=field, filters=filters)
    uniq = sorted(set(toks))
    prefix = f"{field}:" if field else ""
    if field:
        fstats = reader.field_stats.get(field)
        if fstats is None:
            return []
        n_docs = int(fstats["n_docs"])
        avgdl = float(fstats["avgdl"]) or 1.0
    else:
        n_docs = reader.n_docs
        avgdl = reader.avgdl
    data = {}
    for t in uniq:
        docs, tfs, dls, flat, off = reader.postings_with_positions(prefix + t)
        if not len(docs):
            return []
        data[t] = (docs, tfs, dls, flat, off)
    inter = data[uniq[0]][0]
    for t in uniq[1:]:
        inter = np.intersect1d(inter, data[t][0], assume_unique=True)
        if not len(inter):
            return []
    if filters:
        from .fielded import _filter_mask, _resolve_filters

        allow, exclude = _resolve_filters(reader, filters)
        if allow is not None and not len(allow):
            return []
        mask = _filter_mask(inter, allow, exclude)
        if mask is not None:
            inter = inter[mask]
            if not len(inter):
                return []

    idx = {t: np.searchsorted(data[t][0], inter) for t in uniq}
    pos = {t: _gather_candidate_positions(data, t, inter, idx) for t in uniq}
    anchors = np.unique(np.concatenate(list(pos.values())))
    width = np.int64(slop + len(uniq) - 1)  # max p − anchor allowed
    ok = np.ones(len(anchors), bool)
    for t in uniq:
        # first position of t at or after the anchor must sit inside the
        # window; stride-encoding keeps windows within one doc (width ≪ 2^33)
        at = np.searchsorted(pos[t], anchors, side="left")
        inb = at < len(pos[t])
        good = np.zeros(len(anchors), bool)
        good[inb] = pos[t][at[inb]] - anchors[inb] <= width
        ok &= good
        if not ok.any():
            return []
    surv = inter[np.unique(anchors[ok] // _DOC_STRIDE)]
    scores = np.zeros(len(surv), np.float64)
    for t in uniq:
        docs, tfs, dls, _, _ = data[t]
        p = np.searchsorted(docs, surv)
        w = bm25_weight(tfs[p], dls[p], avgdl, reader.k1, reader.b)
        scores += idf(n_docs, len(docs)) * w
    return _topk_from_scores(surv, scores, k)


def search_boosting(
    reader: IndexReader, positive: str, negative: str, k: int = 10,
    negative_boost: float = 0.5,
) -> list[tuple[int, float]]:
    """ES ``boosting`` query: docs score their positive-query BM25; docs
    ALSO matching the negative query (any of its terms) keep ranking but at
    score × ``negative_boost`` — demotion without exclusion (the must_not
    alternative ES documents for 'relevant but less so')."""
    union, scores = _score_all(reader, positive)
    if not len(union):
        return []
    neg_docs = []
    for t in analyze_query(negative):
        docs, _, _ = reader.postings(t)
        if len(docs):
            neg_docs.append(docs)
    if neg_docs:
        neg = np.unique(np.concatenate(neg_docs))
        demote = np.isin(union, neg)
        scores = np.where(demote, scores * float(negative_boost), scores)
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def search_bool_prefix(
    reader: IndexReader, query: str, k: int = 10,
    max_expansions: int = 50,
) -> list[tuple[int, float]]:
    """ES ``match_bool_prefix``: every term but the last matches as a
    regular OR term query; the LAST term matches as a prefix. Frozen
    scoring (= ES's default constant-score rewrite of the prefix clause):
    full terms contribute their BM25; the prefix clause contributes a
    constant 1.0 to any doc holding ≥1 expansion. Unlike
    ``match_phrase_prefix`` no positions are consulted — clauses are
    independent bool-should terms."""
    toks = tokenize(query)
    if not toks:
        return []
    head, last = toks[:-1], toks[-1]
    union, scores = (_score_all(reader, " ".join(head)) if head
                     else (np.empty(0, np.uint64), np.empty(0, np.float64)))
    exp = expand_prefix(reader, last, max_expansions=max_expansions)
    pdocs = []
    for t in exp:
        docs, _, _ = reader.postings(t)
        if len(docs):
            pdocs.append(docs)
    if pdocs:
        pd_ = np.unique(np.concatenate(pdocs))
        union2 = np.union1d(union, pd_)
        s2 = np.zeros(len(union2), np.float64)
        if len(union):
            s2[np.searchsorted(union2, union)] = scores
        s2[np.searchsorted(union2, pd_)] += 1.0  # constant-score prefix
        union, scores = union2, s2
    if not len(union):
        return []
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


_QS_CLAUSE = None  # compiled lazily (module import stays light)


def parse_query_string(qs: str) -> dict:
    """Parse the frozen mini query-string grammar (a small, DOCUMENTED
    subset of ES ``query_string``):

    - bare token            → bool-should term (analyzed)
    - ``-token``            → must_not term (doc excluded if it holds it)
    - ``"quoted tokens"``   → must match_phrase (slop 0)
    - ``-"quoted tokens"``  → must_not phrase is NOT supported (raises) —
      keeping exclusion term-level keeps the oracle exact

    Returns {"should": [terms...], "must_not": [terms...],
    "phrases": [phrase strings...]}. AND/OR connectives are not part of the
    grammar (ES default operator OR == bool-should here; phrases are must
    clauses, matching ES's behavior of quoted text in query_string)."""
    import re as _re

    global _QS_CLAUSE
    if _QS_CLAUSE is None:
        _QS_CLAUSE = _re.compile(r'(-)?(?:"([^"]*)"|(\S+))')
    should: list[str] = []
    must_not: list[str] = []
    phrases: list[str] = []
    for m in _QS_CLAUSE.finditer(qs):
        neg, quoted, bare = m.groups()
        if quoted is not None:
            if neg:
                raise ValueError("negated phrases are not in the grammar")
            if tokenize(quoted):
                phrases.append(quoted)
        elif bare:
            (must_not if neg else should).extend(tokenize(bare))
    return {"should": sorted(set(should)),
            "must_not": sorted(set(must_not)),
            "phrases": phrases}


_QS_EXTENDED = None  # compiled lazily


def _qs_is_extended(qs: str) -> bool:
    """Extended grammar activates iff the query uses AND / OR (uppercase
    reserved words), parentheses, or a ``field:term`` atom — the flat
    round-4 subset stays byte-identical on the old path."""
    import re as _re

    global _QS_EXTENDED
    if _QS_EXTENDED is None:
        _QS_EXTENDED = _re.compile(
            r"\bAND\b|\bOR\b|[()]"
            r"|(?:^|[\s(])-?[A-Za-z_][A-Za-z0-9_.]*:\S")
    return bool(_QS_EXTENDED.search(qs))


def parse_query_string_ast(qs: str):
    """Parse the EXTENDED query_string grammar to an AST (round-5
    extension of the round-4 flat subset; frozen and documented):

    - ``a b``                → OR (ES default operator)
    - ``a AND b``            → AND (binds tighter than OR)
    - ``(a OR b) AND c``     → grouping
    - ``-x`` / ``- (…)``     → negation (set subtraction at its bool
      level; a bool level with ONLY negative operands matches nothing)
    - ``field:term``         → the term in that field (fielded index)
    - ``"tok toks"``         → exact phrase (positional index)

    AND / OR are reserved UPPERCASE; lowercase and/or are ordinary terms.
    Nodes: ("or"|"and", [ops]) / ("not", op) / ("term", t) /
    ("field", f, t) / ("phrase", text) / ("empty",)."""
    import re as _re

    toks = _re.findall(r'\(|\)|"[^"]*"|[^\s()"]+', qs)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def advance():
        pos[0] += 1

    def word_atom(w: str):
        m = _re.match(r"^([A-Za-z_][A-Za-z0-9_.]*):(\S+)$", w)
        if m:
            field, val = m.group(1), m.group(2)
            vt = tokenize(val)
            if not vt:
                return ("empty",)
            if len(vt) == 1:
                return ("field", field, vt[0])
            return ("or", [("field", field, t) for t in vt])
        wt = tokenize(w)
        if not wt:
            return ("empty",)
        if len(wt) == 1:
            return ("term", wt[0])
        return ("or", [("term", t) for t in wt])

    def parse_atom():
        t = peek()
        if t is None:
            return ("empty",)
        if t == "(":
            advance()
            e = parse_or()
            if peek() == ")":
                advance()
            return e
        if t == ")":
            return ("empty",)
        advance()
        if t.startswith('"'):
            inner = t[1:-1]
            return ("phrase", inner) if tokenize(inner) else ("empty",)
        if t == "-":
            return ("not", parse_atom())
        if t.startswith("-") and len(t) > 1:
            return ("not", word_atom(t[1:]))
        return word_atom(t)

    def parse_and():
        ops = [parse_atom()]
        while peek() == "AND":
            advance()
            ops.append(parse_atom())
        ops = [o for o in ops if o != ("empty",)] or [("empty",)]
        return ("and", ops) if len(ops) > 1 else ops[0]

    def parse_or():
        ops = [parse_and()]
        while peek() is not None and peek() != ")":
            if peek() == "OR":
                advance()
            ops.append(parse_and())
        ops = [o for o in ops if o != ("empty",)] or [("empty",)]
        return ("or", ops) if len(ops) > 1 else ops[0]

    return parse_or()


def _qs_eval(node, reader: IndexReader, leaves: list) -> np.ndarray:
    """Evaluate an AST node to its sorted uint64 match set, collecting
    positive scoring leaves (negated subtrees never score — the round-4
    must_not rule)."""
    kind = node[0]
    if kind == "empty":
        return np.empty(0, np.uint64)
    if kind == "term":
        leaves.append(("term", node[1]))
        docs, _, _ = reader.postings(node[1])
        return np.unique(np.asarray(docs, np.uint64))
    if kind == "field":
        leaves.append(("field", node[1], node[2]))
        if node[1] not in getattr(reader, "field_stats", {}):
            return np.empty(0, np.uint64)  # unknown field matches nothing
        docs, _, _ = reader.postings(f"{node[1]}:{node[2]}")
        return np.unique(np.asarray(docs, np.uint64))
    if kind == "phrase":
        for t in tokenize(node[1]):
            leaves.append(("term", t))
        surv = search_phrase(reader, node[1], k=max(int(reader.n_docs), 1))
        return np.unique(np.asarray([d for d, _ in surv], np.uint64))
    if kind == "not":
        # a NOT outside a bool-level operand position (lone "-x" query,
        # "-(-x)") has no positive set to subtract from — frozen: matches
        # nothing, like a bool level with only negative operands (and like
        # the flat path, where a pure-must_not query returns [])
        return np.empty(0, np.uint64)
    pos_sets, neg_sets = [], []
    for op in node[1]:
        if op[0] == "not":
            neg_sets.append(_qs_eval(op[1], reader, []))
        else:
            pos_sets.append(_qs_eval(op, reader, leaves))
    if not pos_sets:
        out = np.empty(0, np.uint64)  # only-negative level matches nothing
    elif kind == "or":
        out = np.unique(np.concatenate(pos_sets))
    else:
        out = pos_sets[0]
        for s in pos_sets[1:]:
            out = out[np.isin(out, s, assume_unique=True)]
    for s in neg_sets:
        if len(out) and len(s):
            out = out[~np.isin(out, s, assume_unique=True)]
    return out


def _qs_score(reader: IndexReader, leaves: list, ids: np.ndarray,
              k: int) -> list[tuple[int, float]]:
    """Score the match set: OR-BM25 sum over every positive leaf —
    unfielded terms against the main index stats, ``field:term`` leaves
    with that field's docCount/avgdl (the fielded bool scorer's weights)."""
    if not len(ids):
        return []
    terms = sorted({t for kind, *rest in leaves if kind == "term"
                    for t in [rest[0]]})
    fields = sorted({(f, t) for kind, *rest in leaves if kind == "field"
                     for f, t in [tuple(rest)]})
    total: dict = {}
    if terms:
        union, scores = _score_all(reader, " ".join(terms))
        keep = np.isin(union, ids, assume_unique=True)
        for d, s in zip(union[keep], scores[keep]):
            total[int(d)] = total.get(int(d), 0.0) + float(s)
    if fields:
        from .fielded import _score_fields_all

        fu, fs = _score_fields_all(reader, list(fields))
        keep = np.isin(fu, ids, assume_unique=True)
        for d, s in zip(fu[keep], fs[keep]):
            total[int(d)] = total.get(int(d), 0.0) + float(s)
    live = [(d, s) for d, s in total.items() if s > 0.0]
    if not live:
        return []
    docs = np.asarray([d for d, _ in live], np.uint64)
    vals = np.asarray([s for _, s in live], np.float64)
    order = np.argsort(docs)
    return _topk_from_scores(docs[order], vals[order], k)


def search_query_string(
    reader: IndexReader, qs: str, k: int = 10,
) -> list[tuple[int, float]]:
    """ES ``query_string``. Two frozen modes:

    - FLAT (the round-4 subset — no AND/OR/parens/field:): docs score the
      OR-BM25 sum over every positive term (bare terms + phrase tokens,
      deduped), restricted to docs containing every quoted phrase (must),
      minus docs holding any must_not term.
    - EXTENDED (:func:`parse_query_string_ast`): the boolean tree
      evaluates to a match set (AND = ∩, OR = ∪, ``-`` = ∖ at its level;
      phrases and ``field:term`` are ordinary operands), and matching
      docs score the OR-BM25 sum over every positive leaf (fielded leaves
      with their field's stats). Negated subtrees never score.

    Phrases need a positional index, like ``search_phrase``."""
    if _qs_is_extended(qs):
        leaves: list = []
        ids = _qs_eval(parse_query_string_ast(qs), reader, leaves)
        return _qs_score(reader, leaves, ids, k)
    parsed = parse_query_string(qs)
    pos_terms = set(parsed["should"])
    for ph in parsed["phrases"]:
        pos_terms.update(tokenize(ph))
    if not pos_terms:
        return []
    union, scores = _score_all(reader, " ".join(sorted(pos_terms)))
    if not len(union):
        return []
    # every phrase's match set is a subset of the ORIGINAL union (phrase
    # tokens are positive terms), so k0 bounds each phrase search even after
    # earlier phrase filters shrink `union` — re-reading len(union) here
    # top-k-truncated a later phrase's match set and dropped true matches
    k0 = len(union)
    for ph in parsed["phrases"]:
        surv = search_phrase(reader, ph, k=k0)
        ids = np.asarray(sorted(d for d, _ in surv), np.uint64)
        keep = np.isin(union, ids)
        union, scores = union[keep], scores[keep]
        if not len(union):
            return []
    for t in parsed["must_not"]:
        docs, _, _ = reader.postings(t)
        if len(docs):
            keep = ~np.isin(union, docs)
            union, scores = union[keep], scores[keep]
            if not len(union):
                return []
    live = scores > 0.0
    return _topk_from_scores(union[live], scores[live], k)


def search_min_should_match(
    reader: IndexReader, query: str, k: int = 10, min_match: int = 1
) -> list[tuple[int, float]]:
    """ES ``match`` with ``minimum_should_match``: only docs containing at
    least ``min_match`` DISTINCT query terms score (min_match=1 is the OR
    scorer, min_match=#terms the AND scorer); scores are the same BM25 sums."""
    terms = analyze_query(query)
    gathered = []
    for t in terms:
        docs, tfs, dls = reader.postings(t)
        if len(docs):
            gathered.append((t, docs, tfs, dls))
    if len(gathered) < min_match:
        return []
    union = np.unique(np.concatenate([g[1] for g in gathered]))
    scores = np.zeros(len(union), dtype=np.float64)
    hits = np.zeros(len(union), dtype=np.int32)
    for t, docs, tfs, dls in gathered:  # sorted term order
        w = bm25_weight(tfs, dls, reader.avgdl, reader.k1, reader.b)
        pos = np.searchsorted(union, docs)
        scores[pos] += idf(reader.n_docs, len(docs)) * w
        hits[pos] += 1
    keep = hits >= min_match
    return _topk_from_scores(union[keep], scores[keep], k)


def select_mlt_terms(reader: IndexReader, like_text: str,
                     max_query_terms: int = 25, min_term_freq: int = 1,
                     min_doc_freq: int = 1) -> list[str]:
    """ES ``more_like_this`` term selection: analyze the like-text, keep
    terms with tf ≥ min_term_freq and corpus df ≥ min_doc_freq, rank by
    tf·idf (this engine's idf formula — frozen, mirrored by the SQL
    oracle), keep the top ``max_query_terms`` (tie-break ascending term).
    df comes from the term dictionary / posting metadata — never a corpus
    scan."""
    from collections import Counter

    tf = Counter(tokenize(like_text))
    scored: list[tuple[float, str]] = []
    for term, cnt in tf.items():
        if cnt < min_term_freq:
            continue
        df = reader.df(term)
        if df < min_doc_freq or df <= 0:
            continue
        scored.append((cnt * idf(reader.n_docs, df), term))
    scored.sort(key=lambda p: (-p[0], p[1]))
    return sorted(t for _, t in scored[:max_query_terms])


def more_like_this(reader: IndexReader, like_text: str, k: int = 10,
                   max_query_terms: int = 25, min_term_freq: int = 1,
                   min_doc_freq: int = 1) -> list[tuple[int, float]]:
    """ES ``more_like_this`` (``like`` given as text): the selected
    representative terms run as a plain OR BM25 disjunction — exactly the
    query ES's MLT builds after its term selection."""
    terms = select_mlt_terms(reader, like_text, max_query_terms,
                             min_term_freq, min_doc_freq)
    if not terms:
        return []
    return search_exact(reader, " ".join(terms), k)


def search_phrase_prefix(
    reader: IndexReader, phrase: str, k: int = 10,
    max_expansions: int = 50, slop: int = 0,
    field: str | None = None, filters: list | None = None,
) -> list[tuple[int, float]]:
    """ES ``match_phrase_prefix``: a phrase whose LAST token is a prefix.
    The prefix expands against the term dictionary (ES ``max_expansions``,
    default 50 like ES); a doc matches iff ANY expansion completes the
    phrase, and scores as the MAX over matching expansions of that
    expansion's phrase score (BM25 sum of the completed phrase's unique
    terms — ``search_phrase``'s frozen scoring), tie-break ascending
    doc_id.

    Exactness of the per-expansion top-k merge: if doc d is in the global
    top-k by max-score, then inside d's best expansion every doc ranked
    above d scores higher there, hence ≥ that globally — so at most k-1
    docs outrank d in that expansion and d survives its per-expansion
    top-k. Merging per-expansion top-k lists by max is therefore exact."""
    toks = tokenize(phrase)
    if not toks:
        return []
    *fixed, last = toks
    expansions = expand_prefix(reader, last, max_expansions, field=field)
    best: dict[int, float] = {}
    for e in expansions:
        res = search_phrase(reader, " ".join(fixed + [e]), k=k,
                            slop=slop, field=field, filters=filters)
        for d, s in res:
            if s > best.get(d, -math.inf):
                best[d] = s
    if not best:
        return []
    docs = np.fromiter(best.keys(), np.uint64, len(best))
    scores = np.fromiter(best.values(), np.float64, len(best))
    return _topk_from_scores(docs, scores, k)


def suggest_terms(reader: IndexReader, term: str, n: int = 5,
                  max_dist: int = 2,
                  field: str | None = None) -> list[tuple[str, int, int]]:
    """ES term suggester ("did you mean"): dictionary terms within
    ``max_dist`` Levenshtein edits of the (possibly misspelled) input,
    ranked the way ES's suggest mode=missing does — ascending edit
    distance, then descending df (popular spellings first), then ascending
    term. The input term itself is excluded (a suggester corrects, it does
    not echo). Returns [(term, dist, df)] — the same |len|-band +
    vectorized edit-distance pass the fuzzy query uses, over the reader's
    cached dictionary."""
    cache = _vocab_cache(reader, field)
    if cache is None:
        return []
    terms, lens, dfs = cache["terms"], cache["lens"], cache["dfs"]
    band = np.flatnonzero(np.abs(lens - len(term)) <= max_dist)
    if not len(band):
        return []
    cands = [terms[i] for i in band]
    dist = _levenshtein_batch(term, cands)
    hit = np.flatnonzero((dist <= max_dist) & (dist > 0))
    out = [(cands[i], int(dist[i]), int(dfs[band[i]])) for i in hit]
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return out[:n]


def explain(reader: IndexReader, query: str, doc_id: int) -> dict:
    """ES ``_explain`` analogue: the per-term BM25 breakdown of one doc's
    score for a query. Returns {"doc_id", "score", "matched": bool,
    "terms": [{term, tf, dl, df, idf, weight, contribution}]} — each
    contribution = idf · tf/(tf + k1·(1−b+b·dl/avgdl)), summing exactly to
    what every scorer here returns (identity asserted in tests). Costs one
    postings read + one searchsorted per query term — no corpus access."""
    did = np.uint64(doc_id)
    parts = []
    total = 0.0
    for t in analyze_query(query):
        docs, tfs, dls = reader.postings(t)
        if not len(docs):
            continue
        pos = int(np.searchsorted(docs, did))
        if pos >= len(docs) or docs[pos] != did:
            continue
        tf = float(tfs[pos])
        dl = float(dls[pos])
        w = float(bm25_weight(tfs[pos:pos + 1], dls[pos:pos + 1],
                              reader.avgdl, reader.k1, reader.b)[0])
        i = idf(reader.n_docs, len(docs))
        contribution = i * w
        total += contribution
        parts.append({"term": t, "tf": tf, "dl": dl, "df": len(docs),
                      "idf": i, "weight": w, "contribution": contribution})
    return {"doc_id": int(doc_id), "score": total,
            "matched": bool(parts), "terms": parts}


def rescore(reader: IndexReader, query: str, rescore_phrase: str,
            k: int = 10, window_size: int = 100,
            query_weight: float = 1.0, rescore_weight: float = 1.0,
            slop: int = 0) -> list[tuple[int, float]]:
    """ES ``rescore`` with a ``match_phrase`` rescorer: fetch the top
    ``window_size`` docs by the cheap BM25 query, then re-rank ONLY that
    window by query_weight·bm25 + rescore_weight·phrase_score where the
    phrase score is ``search_phrase``'s BM25-of-unique-phrase-terms for
    window docs that contain the phrase, else 0 (ES total-score rescoring
    over the window; hits outside the window keep their original ranks —
    and here, outside-window docs simply aren't returned, k ≤ window).

    The phrase pass is fetch-bounded: only window members are checked
    (the intersection of phrase-term postings is masked to the window
    before the position DP), so rescoring costs O(window), never a second
    corpus-scale query — exactly why ES exposes rescore instead of phrase-
    scoring everything."""
    base = search_exact(reader, query, max(k, window_size))
    if not base:
        return []
    window_ids = np.sort(np.array([d for d, _ in base], np.uint64))
    phrase_hits = dict(search_phrase(
        reader, rescore_phrase, k=len(window_ids), slop=slop,
        filters=[_WindowFilter(window_ids)]))
    rescored = [
        (d, query_weight * s + rescore_weight * phrase_hits.get(d, 0.0))
        for d, s in base
    ]
    docs = np.fromiter((d for d, _ in rescored), np.uint64, len(rescored))
    scores = np.fromiter((s for _, s in rescored), np.float64, len(rescored))
    return _topk_from_scores(docs, scores, k)


class _WindowFilter:
    """Internal allow-list filter: restricts a query to a sorted doc_id
    window (quacks like the fielded filter objects)."""

    def __init__(self, doc_ids: np.ndarray):
        self._ids = doc_ids

    def doc_ids(self, reader) -> np.ndarray:
        return self._ids

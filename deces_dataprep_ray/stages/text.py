"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` bodies over Arrow batches; the
tokenizer is the same frozen ``norm`` chain the index uses
(`deces_dataprep_ray.functions.analysis`), so token counts here agree with
index doc lengths by construction.
"""

from __future__ import annotations

import hashlib
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..functions.analysis import tokenize_many
from . import Stage

# small per-language stopword sets for the n-gram/stopword language heuristic
_STOP = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "en"},
}

_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)
# RE2 (Arrow compute) equivalent of Python's [^\w\s]: RE2's \w/\s are
# ASCII-only, so spell the Unicode classes out — verified char-by-char
# against the Python regex over the BMP in tests
_PUNCT_RE2 = r"[^\p{L}\p{N}_\t\n\x0b\f\r\x1c-\x1f\x85\p{Z}]"
_WS_SPLIT = re.compile(r"\s+")


@dataclass
class TokenCount(Stage):
    """Per-doc token count via the norm analyzer (whitespace+regex chain)."""

    text_col: str = "text"
    out_col: str = "n_tokens"

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks = tokenize_many(["" if t is None else t for t in batch[self.text_col].to_pylist()])
        arr = pa.array(np.fromiter((len(t) for t in toks), dtype=np.int64,
                                   count=len(toks)), pa.int64())
        return batch.append_column(self.out_col, arr)


@dataclass
class QualityScore(Stage):
    """Heuristic quality features: lengths, punctuation ratio, stopword
    ratio, mean token length — the standard web-text quality signals."""

    text_col: str = "text"
    stopwords: frozenset = frozenset(_STOP["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        col = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        # Arrow kernels end-to-end (the LangId rework's pattern): lengths and
        # punctuation counts per doc, tokens via lower + whitespace split,
        # per-doc folds as cumsum diffs at the doc offsets — no Python loop
        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        n_punct = pc.count_substring_regex(col, _PUNCT_RE2).to_numpy(
            zero_copy_only=False).astype(np.int64)
        parts = pc.utf8_split_whitespace(pc.utf8_lower(col))
        flat = pc.list_flatten(parts)
        lens_all = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens_all, out=offsets[1:])

        csum = np.empty(len(flat) + 1, np.int64)
        csum[0] = 0

        def per_doc(vals: np.ndarray) -> np.ndarray:
            np.cumsum(vals, out=csum[1:])
            return (csum[offsets[1:]] - csum[offsets[:-1]]).astype(np.float64)

        n_tokens = lens_all.astype(np.float64)
        stop_cnt = np.zeros(n, np.float64)
        tok_chars = np.zeros(n, np.float64)
        if len(flat):
            # the Arrow split emits '' at text edges — drop from the token
            # count, the stopword hits and the char sum arithmetically
            tlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
            tok_chars = per_doc(tlen)  # '' contributes 0 chars already
            empties = pc.equal(flat, "")
            if pc.any(empties).as_py():
                n_tokens -= per_doc(empties.to_numpy(zero_copy_only=False))
            memb = pc.is_in(
                flat, value_set=pa.array(sorted(self.stopwords)).cast(
                    flat.type)).to_numpy(zero_copy_only=False)
            stop_cnt = per_doc(memb)
        safe_t = np.maximum(n_tokens, 1.0)
        safe_c = np.maximum(n_chars, 1).astype(np.float64)
        for name, arr, typ in (
            ("q_n_chars", n_chars, pa.int64()),
            ("q_n_tokens", n_tokens.astype(np.int64), pa.int64()),
            ("q_punct_ratio", n_punct / safe_c, pa.float64()),
            ("q_stop_ratio", stop_cnt / safe_t, pa.float64()),
            ("q_mean_tok_len", tok_chars / safe_t, pa.float64()),
        ):
            batch = batch.append_column(name, pa.array(arr, typ))
        return batch


@dataclass
class LangId(Stage):
    """Stopword-overlap language heuristic → (lang_pred, lang_score).

    Deterministic and dependency-free; ties broken by language code order.
    """

    text_col: str = "text"
    langs: tuple = ("de", "en", "es", "fr")

    def _tables(self):
        """Stopword-union value set + (union+1, nlangs) membership matrix,
        built once per actor (cached on the instance, not per batch)."""
        if not hasattr(self, "_union"):
            union = sorted(set().union(*(_STOP[lg] for lg in self.langs)))
            memb = np.zeros((len(union) + 1, len(self.langs)), bool)
            for li, lang in enumerate(self.langs):
                sw = _STOP[lang]
                for ui, w in enumerate(union):
                    memb[ui, li] = w in sw
            self._union = pa.array(union, pa.string())
            self._memb = memb
        return self._union, self._memb

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        col = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        # Arrow-native tokenize: lower + Unicode-whitespace split (same token
        # stream as the old `\s+` regex split after the empty-string filter)
        parts = pc.utf8_split_whitespace(pc.utf8_lower(col))
        flat = pc.list_flatten(parts)
        lens_all = pc.list_value_length(parts).to_numpy(
            zero_copy_only=False).astype(np.int64)
        # doc boundaries in the flat token stream — per-doc sums become
        # cumsum diffs at these offsets (no np.repeat'd doc index, no
        # bincount over a 1-per-token array)
        offsets = np.zeros(n + 1, np.int64)
        np.cumsum(lens_all, out=offsets[1:])

        preds = np.full(n, "und", dtype=object)
        best = np.zeros(n, np.float64)
        if len(flat):
            # one hash probe per token against the (tiny) stopword union —
            # index_in returns the union position or null; the per-language
            # membership matrix is precomputed once per actor. No per-doc /
            # per-token Python loop, no full-vocab dictionary build.
            union, memb = self._tables()
            idx = pc.index_in(flat, value_set=union)
            iu = idx.fill_null(len(union)).to_numpy(zero_copy_only=False)
            csum = np.empty(len(iu) + 1, np.int64)
            csum[0] = 0

            def per_doc(tok_mask: np.ndarray) -> np.ndarray:
                np.cumsum(tok_mask, out=csum[1:])
                return (csum[offsets[1:]] - csum[offsets[:-1]]).astype(
                    np.float64)

            # the Arrow split emits '' at text edges; '' is never a stopword,
            # so only the per-doc token count needs correcting — cheaper than
            # filtering the whole 1-per-token stream
            ntok = lens_all.astype(np.float64)
            empties = pc.equal(flat, "")
            if pc.any(empties).as_py():
                ntok -= per_doc(
                    empties.to_numpy(zero_copy_only=False))
            tok_memb = memb[iu]  # (n_tokens, nlangs) bool gather
            scores = np.zeros((len(self.langs), n), np.float64)
            for li in range(len(self.langs)):
                scores[li] = per_doc(tok_memb[:, li])
            scores /= np.maximum(ntok, 1.0)
            # argmax returns the FIRST max → ties break by self.langs order,
            # exactly the old scalar loop's strict `s > best` rule
            bi = np.argmax(scores, axis=0)
            best = scores[bi, np.arange(n)]
            langs_arr = np.array(self.langs, dtype=object)
            preds = np.where(best > 0.0, langs_arr[bi], "und")
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_score", pa.array(best, pa.float64()))


@dataclass
class Fingerprint(Stage):
    """Deterministic document fingerprints: md5 of raw text (exact) and a
    64-bit rolling-shingle fingerprint (splitmix64 fold of the document's 8
    smallest vectorized 5-gram hashes — a cheap winnowing-style content id,
    sharing the dedup stage's shingle kernel instead of per-gram crypto
    hashing)."""

    text_col: str = "text"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _mix64, _tokenize_shingles_batch

        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        n = len(texts)
        fps = np.empty(n, np.uint64)
        if n:
            # batched shingle kernel: one sliding-window pass + one lexsort
            # for the whole batch (the old per-doc _tokenize_shingles loop)
            h_u, offs = _tokenize_shingles_batch(texts, 5)
            m = np.minimum(offs[1:] - offs[:-1], 8)  # ≥1 per doc (padding)
            cm = np.zeros(n + 1, np.int64)
            np.cumsum(m, out=cm[1:])
            within = np.arange(cm[-1], dtype=np.int64) - np.repeat(cm[:-1], m)
            sel = within + np.repeat(offs[:-1], m)
            # position-salted mix then one xor-fold per doc segment
            mixed = _mix64(h_u[sel] + within.astype(np.uint64))
            acc = np.bitwise_xor.reduceat(mixed, cm[:-1])
            fps = _mix64(acc ^ m.astype(np.uint64))
        batch = batch.append_column("fp_md5", pa.array(md5s, pa.string()))
        return batch.append_column("fp_sketch", pa.array(fps, pa.uint64()))


@dataclass
class RepetitionStats(Stage):
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1, the
    standard web-text repetition filters), token-level over the frozen norm
    analyzer:

    - ``top_unigram_frac``: count of the most frequent token / n_tokens
    - ``dup_word_frac``: fraction of tokens occurring more than once
    - ``top_bigram_frac``: count of the most frequent bigram / (n_tokens−1)

    Fully vectorized across the batch: one dictionary-encode of the flat
    token stream, np.unique group counts keyed by (doc, code), and
    scatter-max/-add folds — no per-document Python loop."""

    text_col: str = "text"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from itertools import chain

        texts = ["" if t is None else t
                 for t in batch[self.text_col].to_pylist()]
        toks = tokenize_many(texts)
        n = len(texts)
        lens = np.fromiter((len(t) for t in toks), np.int64, count=n)
        flat = list(chain.from_iterable(toks))
        top1 = np.zeros(n, np.float64)
        dupc = np.zeros(n, np.float64)
        top2 = np.zeros(n, np.float64)
        if flat:
            enc = pa.array(flat, pa.large_string()).dictionary_encode()
            codes = enc.indices.to_numpy().astype(np.int64)
            vsize = len(enc.dictionary)
            doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)

            key = doc_idx * vsize + codes
            uk, counts = np.unique(key, return_counts=True)
            gdoc = uk // vsize
            np.maximum.at(top1, gdoc, counts.astype(np.float64))
            np.add.at(dupc, gdoc,
                      np.where(counts > 1, counts, 0).astype(np.float64))

            # bigrams: successive positions within the same doc; re-encode
            # the (c1, c2) pairs first so the (doc, bigram) key stays far
            # from int64 overflow at any batch size
            same = doc_idx[:-1] == doc_idx[1:]
            if same.any():
                c1 = codes[:-1][same]
                c2 = codes[1:][same]
                bd = doc_idx[:-1][same]
                _, bcode = np.unique(c1 * np.int64(vsize) + c2,
                                     return_inverse=True)
                nb = int(bcode.max()) + 1
                bk, bcounts = np.unique(bd * np.int64(nb) + bcode,
                                        return_counts=True)
                np.maximum.at(top2, bk // nb, bcounts.astype(np.float64))

        safe = np.maximum(lens, 1).astype(np.float64)
        safe2 = np.maximum(lens - 1, 1).astype(np.float64)
        batch = batch.append_column(
            "top_unigram_frac", pa.array(top1 / safe, pa.float64()))
        batch = batch.append_column(
            "dup_word_frac", pa.array(dupc / safe, pa.float64()))
        return batch.append_column(
            "top_bigram_frac", pa.array(top2 / safe2, pa.float64()))


@dataclass
class HashSplit(Stage):
    """Deterministic train/val/test split by content-stable hash — the
    standard leakage-safe corpus split (same key ⇒ same split, forever,
    regardless of corpus growth or partitioning).

    Frozen semantics (SQL-checkable): bucket = first 8 hex chars of
    md5(salt + str(key)); the unit interval splits at the cumulative
    fractions, compared in hex space (lexicographic == numeric for fixed-
    width lowercase hex). Adds a ``split`` column."""

    key_col: str = "doc_id"
    salt: str = ""
    fractions: tuple = (("train", 0.9), ("val", 0.05), ("test", 0.05))

    def _thresholds(self) -> list[tuple[str, str]]:
        out, cum = [], 0.0
        for name, frac in self.fractions:
            cum += float(frac)
            hi = min(int(cum * (1 << 32)), (1 << 32) - 1)
            out.append((name, format(hi, "08x")))
        out[-1] = (out[-1][0], "ffffffff")  # float-sum slack → last bucket
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        # md5 per key is the FROZEN contract (the SQL oracle's formula) —
        # bulked to a C-level map over pre-encoded bytes; the first 8 hex
        # chars compare lexicographically == the big-endian uint32 of the
        # first 4 digest bytes, so the threshold scan is one searchsorted
        # against the cumulative-fraction boundaries (the round-4 version
        # ran a Python threshold loop per row).
        th = self._thresholds()
        names = np.asarray([n for n, _ in th], dtype=object)
        bounds = np.asarray([int(hi, 16) for _, hi in th], np.uint64)
        salt_b = self.salt.encode("utf-8")
        keys = batch[self.key_col].to_pylist()
        digs = b"".join(
            [m.digest()[:4] for m in
             map(hashlib.md5, ((salt_b + str(k).encode("utf-8"))
                               for k in keys))])
        h32 = np.frombuffer(digs, dtype=">u4").astype(np.uint64)
        idx = np.searchsorted(bounds, h32, side="left")
        return batch.append_column(
            "split", pa.array(names[idx], pa.string()))


def pack_sequences(ds, id_col: str = "doc_id", text_col: str = "text",
                   budget: int = 2048, range_size: int = 100_000):
    """Deterministic contiguous sequence packing for training shards:
    docs in ascending ``id_col`` order, ``bin = floor(exclusive running
    token cumsum / budget)`` — a doc whose tokens straddle a boundary
    belongs to the bin its FIRST token falls in (frozen, SQL-checkable via
    a window sum; simpler than first-fit-decreasing and deterministic
    under any partitioning).

    Distributed two-pass shape (no driver-side corpus state):
    1. per-batch (range, Σtokens) partials over the id ranges
       ``id // range_size`` → tiny driver-side exclusive prefix offsets;
    2. ``groupby(range).map_groups``: sort the range by id, local exclusive
       cumsum + the range's offset → bin. Exchange volume: pass 1 one row
       per (range, batch); pass 2 shuffles (id, n_tokens) rows only.

    Returns a Dataset of (id_col, n_tokens, bin)."""
    import ray.data as rd  # noqa: F401 — dataset in, dataset out
    from ray.data.aggregate import Sum

    from ..functions.analysis import tokenize_many

    def counts(t: pa.Table) -> pa.Table:
        texts = ["" if x is None else x for x in t[text_col].to_pylist()]
        toks = tokenize_many(texts)
        n = np.fromiter((len(x) for x in toks), np.int64, len(toks))
        ids = t[id_col].to_numpy().astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n, pa.int64()),
            "rng": pa.array(ids // range_size, pa.int64()),
        })

    counted = ds.select_columns([id_col, text_col]).map_batches(
        counts, batch_format="pyarrow")
    per_range = (counted.select_columns(["rng", "n_tokens"])
                 .groupby("rng").aggregate(Sum("n_tokens", alias_name="s"))
                 .to_pandas())  # one row per id range — tiny at any corpus
    per_range = per_range.sort_values("rng")
    offs = dict(zip(per_range["rng"].astype(int),
                    per_range["s"].astype(int).cumsum().shift(
                        1, fill_value=0)))

    def assign(g) -> "pa.Table":
        g = g.sort_values(id_col)
        n = g["n_tokens"].to_numpy()
        excl = int(offs.get(int(g["rng"].iloc[0]), 0)) + (
            np.cumsum(n) - n)
        return pa.table({
            id_col: pa.array(g[id_col].to_numpy()),
            "n_tokens": pa.array(n, pa.int64()),
            "bin": pa.array(excl // budget, pa.int64()),
        })

    return counted.groupby("rng").map_groups(assign, batch_format="pandas")

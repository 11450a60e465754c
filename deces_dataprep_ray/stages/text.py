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
        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        n = len(texts)
        n_chars = np.empty(n, np.int64)
        n_tokens = np.empty(n, np.int64)
        punct_ratio = np.empty(n, np.float64)
        stop_ratio = np.empty(n, np.float64)
        mean_tok_len = np.empty(n, np.float64)
        stop = self.stopwords
        for i, t in enumerate(texts):
            n_chars[i] = len(t)
            toks = [w for w in _WS_SPLIT.split(t.lower()) if w]
            n_tokens[i] = len(toks)
            punct_ratio[i] = (len(_PUNCT_RE.findall(t)) / len(t)) if t else 0.0
            if toks:
                stop_ratio[i] = sum(1 for w in toks if w in stop) / len(toks)
                mean_tok_len[i] = sum(len(w) for w in toks) / len(toks)
            else:
                stop_ratio[i] = 0.0
                mean_tok_len[i] = 0.0
        for name, arr, typ in (
            ("q_n_chars", n_chars, pa.int64()),
            ("q_n_tokens", n_tokens, pa.int64()),
            ("q_punct_ratio", punct_ratio, pa.float64()),
            ("q_stop_ratio", stop_ratio, pa.float64()),
            ("q_mean_tok_len", mean_tok_len, pa.float64()),
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        preds, scores = [], []
        for t in texts:
            toks = [w for w in _WS_SPLIT.split(t.lower()) if w]
            best_lang, best = "und", 0.0
            for lang in self.langs:
                sw = _STOP[lang]
                s = (sum(1 for w in toks if w in sw) / len(toks)) if toks else 0.0
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang)
            scores.append(best)
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_score", pa.array(scores, pa.float64()))


@dataclass
class Fingerprint(Stage):
    """Deterministic document fingerprints: md5 of raw text (exact) and a
    64-bit rolling-shingle fingerprint (splitmix64 fold of the document's 8
    smallest vectorized 5-gram hashes — a cheap winnowing-style content id,
    sharing the dedup stage's shingle kernel instead of per-gram crypto
    hashing)."""

    text_col: str = "text"

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _mix64, _tokenize_shingles

        texts = ["" if t is None else t for t in batch[self.text_col].to_pylist()]
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        fps = np.empty(len(texts), np.uint64)
        for i, t in enumerate(texts):
            sh = _tokenize_shingles(t, 5)  # sorted unique uint64 hashes
            mins = sh[:8]  # 8 smallest = the winnowing sketch
            # position-salted mix then xor-fold (array ops only — numpy
            # scalar arithmetic warns on intentional uint64 wraparound)
            mixed = _mix64(mins + np.arange(len(mins), dtype=np.uint64))
            acc = np.bitwise_xor.reduce(mixed) ^ np.uint64(len(mins))
            fps[i] = _mix64(np.array([acc], np.uint64))[0]
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

"""The ``norm`` analysis chain, re-owned from the reference's Elasticsearch config.

Reference spec (`projects/deces-dataprep/datasets/deces_index.yml:19-38`):
  char_filter ``alphanum``: regex ``[^\\p{L}\\d]`` → ``" "``; tokenizer
  ``standard``; filters ``asciifolding, lowercase``. The same chain doubles as
  the ``keyword`` normalizer (whole value = one term, `:23-27`).

Our canonical chain (frozen; golden-fixture locked in tests/golden/):
  1. NFKD-normalize, strip combining marks (Mn) — the asciifolding step;
  2. apply an explicit fold table for non-decomposable latin ligatures/letters
     (œ→oe, æ→ae, ø→o, đ→d, ß→ss, þ→th, ı→i, ł→l …) which NFKD leaves alone;
  3. lowercase;
  4. replace every non-(unicode letter/digit) run with a space — char filter
     and standard tokenizer collapse to "split on non-alphanumeric" after
     folding;
  5. split on whitespace.

All five passes run over ONE concatenated buffer per batch (C-speed string
ops), not per-row Python — this is the hot path of the index build.

Determinism: unicodedata's NFKD table is pinned by the Python build; no locale
dependence (the reference's ``str.title()`` locale quirk,
`recipes/deces_dataprep.yml:69-71`, is deliberately avoided).
"""

from __future__ import annotations

import re
import sys
import unicodedata

import numpy as np

# --- fold table: latin chars asciifolding maps but NFKD does not decompose ---
_FOLD_PAIRS = {
    "œ": "oe", "Œ": "OE", "æ": "ae", "Æ": "AE",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "ð": "d", "Ð": "D", "þ": "th", "Þ": "TH",
    "ß": "ss", "ẞ": "SS", "ı": "i", "İ": "I",
    "ł": "l", "Ł": "L", "ħ": "h", "Ħ": "H",
    "ŋ": "n", "Ŋ": "N", "ĸ": "k",
    "ʼ": " ", "’": " ", "'": " ",
}
_FOLD_TABLE = str.maketrans(_FOLD_PAIRS)

# Record separator used to batch-concatenate strings; it is stripped from the
# input first so it can never merge or split records. U+001E RS is not a
# letter/digit, survives NFKD, and never appears in normal text.
_SEP = "\x1e"

# combining-mark stripper: one char class covering all Mn codepoints in the BMP
# plus the common supplementary combining ranges, compiled once at import.
def _mark_class() -> tuple[str, dict[int, None]]:
    ranges = []
    delete: dict[int, None] = {}
    start = prev = None
    for cp in range(sys.maxunicode + 1):
        if unicodedata.category(chr(cp)) == "Mn":
            delete[cp] = None
            if prev is not None and cp == prev + 1:
                prev = cp
            else:
                if start is not None:
                    ranges.append((start, prev))
                start = prev = cp
    if start is not None:
        ranges.append((start, prev))
    cls = "".join(
        re.escape(chr(a)) if a == b else f"{re.escape(chr(a))}-{re.escape(chr(b))}"
        for a, b in ranges
    )
    return cls, delete


_MARK_CLS, _MARK_DEL = _mark_class()
_MARK_RE = re.compile(f"[{_MARK_CLS}]+")
# non-(letter|digit) → space. After mark-stripping, \w == letters+digits+_ ;
# fold _ into the separator class to match the reference's [^\p{L}\d].
_NONALNUM_RE = re.compile(r"[\W_]+", re.UNICODE)
# raw token: word chars, underscore excluded
_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)


def _findall_tokens(text: str) -> list[str]:
    """Raw tokens, combining-mark aware. Python \\w excludes Mn marks, so a
    mark-in-class tokenizer regex costs ~5x per char (the class holds ~1900
    codepoints). Equivalent and fast: DELETE the marks first (C-speed
    str.translate) — stripping Mn commutes with the later NFKD+strip fold,
    so 'e\\u0301tat' tokenizes to 'etat' exactly as the mark-aware regex +
    fold would (golden + hypothesis tested) — then run the plain word-char
    regex. ASCII strings cannot contain marks and skip the translate."""
    if not text.isascii() and max(text) >= "̀":
        # every Mn mark is >= U+0300, so latin-1-accent text (NFC é < U+0300)
        # skips the translate on a single C-speed max() pass
        text = text.translate(_MARK_DEL)
    return _TOKEN_RE.findall(text)


def fold(text: str) -> str:
    """asciifold + lowercase one string (steps 1–3)."""
    t = text.translate(_FOLD_TABLE)
    t = unicodedata.normalize("NFKD", t)
    t = _MARK_RE.sub("", t)
    return t.lower()


def normalize_keyword(text: str) -> str:
    """The keyword normalizer: full chain, whole value = one term."""
    return _NONALNUM_RE.sub(" ", fold(text)).strip()


def _fold_token(tok: str) -> tuple[str, ...]:
    """Fold one raw token → its folded sub-token(s). Folding can introduce
    separators (NFKD of ¼ is 1⁄4), hence the re-split."""
    if tok.isascii():
        return (tok.lower(),)
    return tuple(t for t in _NONALNUM_RE.split(fold(tok)) if t)


def tokenize(text: str) -> list[str]:
    """Analyze one string → token list. CANONICAL chain (golden-locked):
    raw-tokenize on (letters|digits|marks)+, then fold each token
    (ligature table + NFKD + strip marks + lowercase), re-splitting tokens
    whose fold introduced separators. Symbol characters (e.g. №) act as
    separators — matching ES ``standard`` tokenizer behavior — rather than
    being compatibility-decomposed into letters."""
    return [s for t in _findall_tokens(text) for s in _fold_token(t)]


def fold_many(texts: list[str]) -> list[str]:
    """Vectorized fold over a batch: one NFKD/regex/lower pass on a joined buffer."""
    if not texts:
        return []
    safe = [(t or "").replace(_SEP, " ") for t in texts]
    big = _SEP.join(safe)
    big = big.translate(_FOLD_TABLE)
    big = unicodedata.normalize("NFKD", big)
    big = _MARK_RE.sub("", big)
    big = big.lower()
    out = big.split(_SEP)
    if len(out) != len(texts):  # NFKD never produces \x1e, but guard anyway
        return [fold(t or "") for t in texts]
    return out


def tokenize_many(
    texts: list[str], folder: "TokenFolder | None" = None
) -> list[list[str]]:
    """Batch analyze, order-preserving; unique-token folding is memoized via
    ``folder`` (pass a persistent one from an actor to amortize)."""
    folder = folder or TokenFolder()
    tok_lists = [_findall_tokens(t or "") for t in texts]
    uniq = list({t for toks in tok_lists for t in toks})
    if uniq:
        folder.fold_unique(np.asarray(uniq, dtype=object))
    cache = folder.cache
    return [[s for t in toks for s in cache[t]] for toks in tok_lists]


class TokenFolder:
    """Memoized token-level folding.

    The full fold chain (translate + NFKD + mark-strip + lower) costs
    O(bytes); applying it to the raw corpus dominates analysis time. Instead
    we tokenize RAW text first and fold only the batch's UNIQUE tokens —
    with a cross-batch memo (held per actor) so a Zipf vocabulary folds each
    term once per worker lifetime. Equivalence with fold-then-tokenize is
    guaranteed by re-splitting folded tokens on non-alphanumerics (NFKD can
    introduce separators, e.g. ¼ → 1⁄4) and is golden-tested.
    """

    def __init__(self) -> None:
        self.cache: dict[str, tuple[str, ...]] = {}

    def fold_unique(self, uniques: np.ndarray) -> list[tuple[str, ...]]:
        cache = self.cache
        missing = [t for t in uniques if t not in cache]
        nonascii = []
        for t in missing:
            if t.isascii():
                # raw tokens contain only word chars; ascii word chars need
                # only lowercasing
                cache[t] = (t.lower(),)
            else:
                nonascii.append(t)
        if nonascii:
            for raw, f in zip(nonascii, fold_many(nonascii)):
                cache[raw] = tuple(tt for tt in _NONALNUM_RE.split(f) if tt)
        return [cache[t] for t in uniques]


def analyze_batch(
    texts: list[str],
    folder: TokenFolder | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Analyze a batch → flat (term, tf) pairs with per-doc offsets.

    Returns (flat_terms: object ndarray, flat_tfs: uint32, offsets: int64 of
    length n+1 — doc i's unique terms are flat[offsets[i]:offsets[i+1]] —
    and dl: uint32 token counts). The hot path of the index build: raw
    findall per doc, hash-factorize, memoized unique-token folding, integer
    sorts — no per-corpus-byte unicode work, no string comparison sorts.

    Per-doc term order is factorize (first-appearance) order, which depends
    on batch composition; consumers must not rely on it (the bucket writer
    re-sorts by (term, doc_id) globally, so index bytes stay deterministic).
    """
    import pandas as pd

    folder = folder or TokenFolder()
    tok_lists = [_findall_tokens(t) for t in texts]
    n = len(tok_lists)
    raw_lens = np.fromiter((len(t) for t in tok_lists), np.int64, n)
    total = int(raw_lens.sum())
    if total == 0:
        return (np.empty(0, object), np.empty(0, np.uint32),
                np.zeros(n + 1, np.int64), np.zeros(n, np.uint32))
    flat_raw = np.empty(total, dtype=object)
    pos = 0
    for toks in tok_lists:
        flat_raw[pos: pos + len(toks)] = toks
        pos += len(toks)
    codes, uniques = pd.factorize(flat_raw, sort=False)
    subs = folder.fold_unique(np.asarray(uniques, dtype=object))
    sub_lens = np.fromiter((len(s) for s in subs), np.int64, len(subs))

    doc_idx = np.repeat(np.arange(n, dtype=np.int64), raw_lens)
    if (sub_lens == 1).all():
        folded_unique = np.asarray([s[0] for s in subs], dtype=object)
        fmap, funiques = pd.factorize(folded_unique, sort=False)
        fcodes = fmap[codes]
    else:
        rep = sub_lens[codes]
        doc_idx = np.repeat(doc_idx, rep)
        flat_folded = np.empty(int(rep.sum()), dtype=object)
        p = 0
        for c in codes:
            s = subs[c]
            flat_folded[p: p + len(s)] = s
            p += len(s)
        fcodes, funiques = pd.factorize(flat_folded, sort=False)

    dl = np.bincount(doc_idx, minlength=n).astype(np.uint32)
    v = np.int64(len(funiques))
    key = doc_idx * v + fcodes
    uk, counts = np.unique(key, return_counts=True)
    u_doc = uk // v
    u_code = uk % v
    offsets = np.searchsorted(u_doc, np.arange(n + 1, dtype=np.int64)).astype(np.int64)
    flat_terms = np.asarray(funiques, dtype=object)[u_code]
    return flat_terms, counts.astype(np.uint32), offsets, dl


def term_freqs_many(
    texts: list[str],
) -> tuple[list[np.ndarray], list[np.ndarray], np.ndarray]:
    """Per-doc (unique terms, tfs, doc length) — thin wrapper over
    :func:`analyze_batch` for tests and small callers."""
    flat_terms, flat_tfs, offsets, dl = analyze_batch(texts)
    terms_out = [flat_terms[offsets[i]: offsets[i + 1]] for i in range(len(dl))]
    tfs_out = [flat_tfs[offsets[i]: offsets[i + 1]] for i in range(len(dl))]
    return terms_out, tfs_out, dl

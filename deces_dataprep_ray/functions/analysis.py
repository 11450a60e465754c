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
def _build_mark_re() -> re.Pattern[str]:
    ranges = []
    start = prev = None
    for cp in range(sys.maxunicode + 1):
        if unicodedata.category(chr(cp)) == "Mn":
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
    return re.compile(f"[{cls}]+")


_MARK_RE = _build_mark_re()
# non-(letter|digit) → space. After mark-stripping, \w == letters+digits+_ ;
# fold _ into the separator class to match the reference's [^\p{L}\d].
_NONALNUM_RE = re.compile(r"[\W_]+", re.UNICODE)


def fold(text: str) -> str:
    """asciifold + lowercase one string (steps 1–3)."""
    t = text.translate(_FOLD_TABLE)
    t = unicodedata.normalize("NFKD", t)
    t = _MARK_RE.sub("", t)
    return t.lower()


def normalize_keyword(text: str) -> str:
    """The keyword normalizer: full chain, whole value = one term."""
    return _NONALNUM_RE.sub(" ", fold(text)).strip()


def tokenize(text: str) -> list[str]:
    """Analyze one string → token list (the full norm chain)."""
    return [t for t in _NONALNUM_RE.split(fold(text)) if t]


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


def tokenize_many(texts: list[str]) -> list[list[str]]:
    """Vectorized analyze over a batch of strings."""
    return [[t for t in _NONALNUM_RE.split(f) if t] for f in fold_many(texts)]


def term_freqs_many(
    texts: list[str],
) -> tuple[list[np.ndarray], list[np.ndarray], np.ndarray]:
    """Analyze a batch → per-doc (sorted unique terms, tfs, doc length).

    Returns (terms_per_doc: list of str ndarrays, tfs_per_doc: list of uint32
    ndarrays, dl: uint32 ndarray of token counts). Terms are sorted
    lexicographically within each doc (deterministic layout).
    """
    folded = fold_many(texts)
    terms_out: list[np.ndarray] = []
    tfs_out: list[np.ndarray] = []
    dl = np.empty(len(folded), dtype=np.uint32)
    for i, f in enumerate(folded):
        toks = [t for t in _NONALNUM_RE.split(f) if t]
        dl[i] = len(toks)
        if toks:
            u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            terms_out.append(u)
            tfs_out.append(c.astype(np.uint32))
        else:
            terms_out.append(np.empty(0, dtype=object))
            tfs_out.append(np.empty(0, dtype=np.uint32))
    return terms_out, tfs_out, dl

"""Deterministic synthetic Common-Crawl-style pages corpus (FIXTURES.md F1).

Schema per BASELINE.json ``input_hint``:
  url:string, warc_ts:timestamp[us], html:binary, text:large_string, lang:string

Every cell is a pure function of (seed, row sequence number) via a
counter-based hash (splitmix64), so generation is deterministic regardless of
batch boundaries or parallelism — the same row is byte-identical whether
generated on 1 CPU or 32. Vocabulary is Zipf(s≈1.1) over ~10k terms with
accented words planted in the head so head-term skew and the fold chain are
both exercised at small scale.

The html column embeds exactly ``text`` (entity-escaped for a deterministic
subset of rows), so ``extract_text(html) == text`` byte-identically — the
per-row invariant the reference pattern requires (SURVEY.md §7.4).
"""

from __future__ import annotations

import html as _htmlmod
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in microseconds

_ACCENTED = [
    "café", "sèvres", "crème", "hôtel", "œuvre", "élève", "münchen", "köln",
    "garçon", "noël", "zürich", "señor", "país", "beyoglu", "łódź", "istanbul",
]
_LANGS = np.asarray(["en", "fr", "de", "es", "zh"], dtype=object)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — counter-based deterministic hash."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z ^= z >> np.uint64(30)
    z *= np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def build_vocab(size: int = 10_000, s: float = 1.1) -> tuple[np.ndarray, np.ndarray]:
    """(vocab terms, Zipf CDF). Accented terms planted at ranks 5,17,29,…"""
    vocab = np.asarray([f"term{i}" for i in range(size)], dtype=object)
    for j, w in enumerate(_ACCENTED):
        vocab[5 + 12 * j] = w
    vocab[3] = "42"
    vocab[11] = "2024"
    ranks = np.arange(1, size + 1, dtype=np.float64)
    p = ranks ** (-s)
    p /= p.sum()
    return vocab, np.cumsum(p)


_VOCAB, _CDF = build_vocab()


def generate_rows(seq: np.ndarray, seed: int = 42) -> dict:
    """Generate the pages rows for an array of sequence numbers (int64)."""
    seq = np.asarray(seq, dtype=np.uint64)
    n = len(seq)
    base = _mix64(seq * np.uint64(0x10001) + np.uint64(seed))
    ntok = (20 + (base % np.uint64(381))).astype(np.int64)  # 20..400 tokens
    site = (_mix64(base + np.uint64(1)) % np.uint64(997)).astype(np.int64)
    lang_h = _mix64(base + np.uint64(2))
    esc_h = _mix64(base + np.uint64(3)) % np.uint64(100)

    offsets = np.concatenate(([0], np.cumsum(ntok)))
    total = int(offsets[-1])
    # per-token counter: doc_seq * 2^20 + position (docs cap at 400 tokens)
    tok_doc = np.repeat(seq, ntok)
    tok_pos = np.arange(total, dtype=np.uint64) - np.repeat(
        offsets[:-1].astype(np.uint64), ntok
    )
    u = _mix64(tok_doc * np.uint64(1 << 20) + tok_pos + np.uint64(seed * 7919))
    unif = (u >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    tok_idx = np.searchsorted(_CDF, unif, side="left")
    toks = _VOCAB[np.minimum(tok_idx, len(_VOCAB) - 1)]

    texts = [" ".join(toks[offsets[i]: offsets[i + 1]]) for i in range(n)]
    urls = [f"https://site{site[i]}.example/p/{int(seq[i])}" for i in range(n)]
    langs = _LANGS[(lang_h % np.uint64(len(_LANGS))).astype(np.int64)]
    langs = langs.copy()
    langs[(lang_h % np.uint64(53)) == 0] = None  # a few nulls
    htmls = []
    for i in range(n):
        body = texts[i]
        if esc_h[i] < 20:  # deterministic subset carries entities
            body = body.replace("é", "&eacute;").replace("è", "&egrave;")
        htmls.append(
            (
                f"<html><head><title>page {int(seq[i])}</title>"
                f'<meta charset="utf-8"/></head>'
                f'<body><div class="nav">site{site[i]}</div>'
                f"<p>{body}</p><!-- noise --></body></html>"
            ).encode("utf-8")
        )
    ts = (EPOCH_US + seq * np.uint64(1_000_000)).astype(np.int64)
    return {
        "url": urls,
        "warc_ts": ts,
        "html": htmls,
        "text": texts,
        "lang": langs,
    }


PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)


def rows_to_table(rows: dict) -> pa.Table:
    return pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.large_string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )


def write_pages_corpus(
    out_dir: str,
    num_docs: int,
    seed: int = 42,
    shard_rows: int = 50_000,
) -> list[str]:
    """Write the corpus as sharded parquet (resumable: one file per shard,
    skipped if already present). Driver-side loop is fine here — generation is
    test/bench scaffolding, not the engine."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for shard, lo in enumerate(range(0, num_docs, shard_rows)):
        hi = min(lo + shard_rows, num_docs)
        path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
        paths.append(path)
        if os.path.exists(path):
            continue
        tbl = rows_to_table(generate_rows(np.arange(lo, hi), seed=seed))
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
    return paths


# ---------------------------------------------------------------------------
# Extraction: html → text, byte-identical per url across runs / parallelism.
# ---------------------------------------------------------------------------

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_text(html_bytes: bytes) -> str:
    """Canonical extraction: concatenate <p> block contents, strip any nested
    tags, unescape HTML entities, collapse whitespace. One frozen function —
    the per-url byte-identity invariant depends on it (SURVEY.md §7.4).
    This scalar form is the GOLDEN ORACLE; the hot path is
    :func:`extract_text_vectorized` (byte-identical, property-tested)."""
    parts = _P_RE.findall(html_bytes)
    raw = b" ".join(parts).decode("utf-8", errors="replace")
    raw = _TAG_RE.sub(" ", raw)
    raw = _htmlmod.unescape(raw)
    return _WS_RE.sub(" ", raw).strip()


# RE2 class equal to Python's str-mode \s (ASCII controls \t-\r, the
# \x1c-\x1f file separators, \x85 NEL, and every Unicode Z-category char);
# Python re excludes ​ (Cf) and so does \p{Z}.
_WS_CLASS = r"[\t\n\x0b\f\r\x1c-\x1f\x85\p{Z}]"
# same class MINUS the plain space — "this doc needs a collapse pass"
_WS_NOSPACE = (r"[\t\n\x0b\f\r\x1c-\x1f\x85\x{00A0}\x{1680}"
               r"\x{2000}-\x{200A}\x{2028}\x{2029}\x{202F}\x{205F}"
               r"\x{3000}]")


def extract_text_vectorized(html: pa.ChunkedArray | pa.Array) -> pa.Array | None:
    """Vectorized :func:`extract_text` over a binary column — byte-identical
    to the scalar oracle (tests/test_corpus.py property-checks both on
    adversarial fixtures). Returns None when the column is not valid UTF-8
    (the oracle's errors="replace" path — callers fall back per row; the
    cast is all-or-nothing in Arrow).

    The oracle's findall-then-join is re-expressed exactly with two PLAIN
    substring replaces (``<p>`` → \\x01, ``</p>`` → \\x02 — cheap, no
    regex) followed by linear ``[^\\x01]*`` deletions: drop the trailing
    unclosed span, the prefix, the inter-block gaps (→ " ", the oracle's
    join) and the tail; a content-internal \\x01 (nested ``<p>``) becomes
    " " exactly like the tag strip would have made it. RE2's leftmost scan
    over the markers reproduces ``findall``'s alternation, and stray
    ``<p>``/``</p>`` in junk regions cannot confuse the marker classes.
    Docs that already CONTAIN a sentinel byte (pathological input) take
    the scalar oracle, scattered back. Entity unescape is NOT a finite
    replace chain (2k+ names, semicolon-optional, longest-match), so docs
    containing ``&`` — and only those — take the exact ``html.unescape``
    scalar path. The whitespace collapse+strip runs only on docs that need
    one (any non-space \\s char, a double space, or a leading/trailing
    space) — extracted web text is usually already single-spaced."""
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    try:
        s = pc.cast(html, pa.large_string())
    except pa.lib.ArrowInvalid:
        return None
    sent = pc.match_substring_regex(s, "[\x01\x02]")
    s = pc.replace_substring(s, "<p>", "\x01")
    s = pc.replace_substring(s, "</p>", "\x02")
    s = pc.replace_substring_regex(s, "\x01[^\x02]*$", "",
                                   max_replacements=1)
    # prefix + first opener in one pass; the ($) alternative clears
    # no-block docs entirely
    s = pc.replace_substring_regex(s, "^[^\x01]*(\x01|$)", "",
                                   max_replacements=1)
    s = pc.replace_substring_regex(s, "\x02[^\x01]*\x01", " ")
    s = pc.replace_substring_regex(s, "\x02[^\x01]*$", "",
                                   max_replacements=1)
    s = pc.replace_substring(s, "\x01", " ")  # nested <p> ≡ stripped tag
    s = pc.replace_substring_regex(s, r"<[^>]+>", " ")

    def _scatter(cur, mask, fn):
        idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
        sub = fn(cur.take(pa.array(idx)))
        if not isinstance(sub, (pa.Array, pa.ChunkedArray)):
            sub = pa.array(sub, cur.type)
        return pc.replace_with_mask(cur, mask, sub)

    amp = pc.match_substring(s, "&")
    if pc.any(amp).as_py():
        s = _scatter(s, amp,
                     lambda a: [_htmlmod.unescape(x) for x in a.to_pylist()])
    needs_ws = pc.match_substring_regex(
        s, "  |^ | $|" + _WS_NOSPACE)
    if pc.any(needs_ws).as_py():
        def collapse(a):
            a = pc.replace_substring_regex(a, _WS_CLASS + "+", " ")
            return pc.replace_substring_regex(a, r"^ | $", "")
        s = _scatter(s, needs_ws, collapse)
    if pc.any(sent).as_py():  # sentinel collision → exact scalar path
        idx = np.flatnonzero(sent.to_numpy(zero_copy_only=False))
        raw = html.take(pa.array(idx)).to_pylist()
        repl = pa.array([extract_text(h) for h in raw], s.type)
        s = pc.replace_with_mask(s, sent, repl)
    return s


class ExtractText:
    """Actor-pool stage: pages(html) → +text column (overwrites if present).

    Drops ``html`` on output — at 100 TB the binary column dominates block
    size and must not travel further down the pipeline (SURVEY.md §7.4).
    Vectorized RE2 chain per batch (was the single most expensive bench
    stage as a per-row Python loop — BENCH_r04); falls back to the scalar
    oracle only for batches whose html is not valid UTF-8."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = extract_text_vectorized(batch["html"])
        if texts is None:
            texts = pa.array(
                [extract_text(h) for h in batch["html"].to_pylist()],
                pa.large_string())
        cols = {name: batch[name] for name in batch.column_names if name not in ("html", "text")}
        cols["text"] = texts
        return pa.table(cols)

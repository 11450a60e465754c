"""Deterministic identity: doc_ids and content-hash row UIDs.

The reference assigns ``UID = urlsafe_b64(blake3(str(tuple(row))))[:12]`` and
uses it as the Elasticsearch ``_id`` for idempotent upserts
(`recipes/deces_dataprep.yml:14-15`). We keep the same *shape* — a
content-derived, re-run-stable id — built on hashlib.blake2b (blake3 is not in
the stdlib; the choice of hash is an implementation detail the reference does
not expose downstream).

doc_id: a stable 64-bit hash of ``url``. This deliberately avoids a global
sort / zipWithIndex shuffle for dense numbering (SURVEY.md §7.3); the cost is
sparser doc_id deltas in posting lists (≈4 bytes/posting varbyte at 10^12 docs
instead of 1-2 for dense ids). Collisions are checked at build time at small
scale by tests; the id space is 2^63 (top bit cleared so ids also fit int64).
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np


def doc_id_from_url(url: str) -> int:
    """Stable 63-bit doc id from a url (blake2b-8, big-endian, top bit cleared)."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big") & 0x7FFF_FFFF_FFFF_FFFF


def doc_ids_from_urls(urls: list[str]) -> np.ndarray:
    """Vectorized-ish batch variant → uint64 ndarray (top bit always 0)."""
    out = np.empty(len(urls), dtype=np.uint64)
    b2b = hashlib.blake2b
    for i, u in enumerate(urls):
        out[i] = int.from_bytes(
            b2b(u.encode("utf-8"), digest_size=8).digest(), "big"
        ) & 0x7FFF_FFFF_FFFF_FFFF
    return out


def content_uid(parts: tuple) -> str:
    """12-char urlsafe-b64 content hash of a row tuple (reference UID shape,
    `recipes/deces_dataprep.yml:14-15`)."""
    h = hashlib.blake2b(str(parts).encode("utf-8"), digest_size=9).digest()
    return base64.urlsafe_b64encode(h).decode("ascii")[:12]


def term_hash(term: str) -> int:
    """Stable 64-bit term hash used for bucket routing (blake2b-8)."""
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "big")


_TERM_HASH_MEMO: dict[str, int] = {}


def term_buckets(terms: np.ndarray, num_buckets: int) -> np.ndarray:
    """Bucket id per term (uint32). Stable across runs and processes.

    The 64-bit hash is memoized per process: a Zipf vocabulary re-presents
    the same head terms in every batch, so each worker pays blake2b once per
    distinct term instead of once per (term, batch)."""
    out = np.empty(len(terms), dtype=np.uint32)
    memo = _TERM_HASH_MEMO
    b2b = hashlib.blake2b
    for i, t in enumerate(terms):
        h = memo.get(t)
        if h is None:
            h = memo[t] = int.from_bytes(
                b2b(t.encode("utf-8"), digest_size=8).digest(), "big")
        out[i] = h % num_buckets
    if len(memo) > 2_000_000:  # bound worker memory on huge vocabularies
        memo.clear()
    return out

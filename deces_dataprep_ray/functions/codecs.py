"""Vectorized varbyte / delta codecs and posting-block layout.

The reference delegates posting-list storage to Lucene (see SURVEY.md §2.4;
`projects/deces-dataprep/datasets/deces_index.yml` declares the index but the
posting format is Lucene-internal). Here we own it: sorted doc_ids are
delta-encoded then varbyte-compressed; term frequencies and doc lengths are
varbyte-compressed as-is; per-block metadata (last doc_id, byte offsets, max
BM25 weight) supports block-max WAND skipping.

All codecs are numpy-vectorized: encode/decode cost is O(total bytes) with a
constant number (<=10) of vectorized passes — no per-value Python loops.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_SEVEN = _U64(7)
_MASK7 = _U64(0x7F)


def vb_encode(values: np.ndarray, lengths: np.ndarray | None = None) -> bytes:
    """Varbyte-encode an array of unsigned 64-bit ints (LSB-first, 0x80 = continue).

    ``lengths`` (optional) is the precomputed :func:`vb_lengths` of ``values``
    — callers that also need byte offsets pass it in so the lengths pass runs
    once, not twice. The work matrix is sized to the stream's ACTUAL maximum
    width (1 for small tf/dl streams, up to 10 for sparse doc-id deltas)
    instead of a fixed (n, 10): the encoder is memory-bandwidth-bound under
    concurrency, so traffic proportional to real width is what scales.
    Any unsigned dtype is accepted AS-IS (uint32 tf/dl streams are not cast
    up to uint64 — halving the read traffic); byte output is identical."""
    v = np.ascontiguousarray(values)
    if v.dtype.kind != "u":
        v = v.astype(_U64)
    n = v.size
    if n == 0:
        return b""
    nb = vb_lengths(v) if lengths is None else lengths
    width = int(nb.max())
    if width == 1:  # every value fits 7 bits — no continuation bytes at all
        return v.astype(np.uint8).tobytes()
    out = np.zeros((n, width), dtype=np.uint8)
    for k in range(width):
        out[:, k] = (v >> (7 * k)).astype(np.uint8) & np.uint8(0x7F)
    # continuation bit on every byte except each value's last
    cols = np.arange(width, dtype=np.int64)
    keep = cols[None, :] < nb[:, None]
    cont = cols[None, :] < (nb - 1)[:, None]
    out[cont] |= 0x80
    return out[keep].tobytes()


def vb_decode(buf: bytes | memoryview | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varbyte stream back to uint64. ``count`` (if given) is
    validated. Two fast paths: all-single-byte streams (typical for tf/dl)
    decode with one mask; multi-byte streams decode per length-group with
    L ≤ 10 vectorized gathers."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    is_last = b < 0x80
    if is_last.all():  # every value fits 7 bits
        if count is not None and b.size != count:
            raise ValueError(f"varbyte stream holds {b.size} values, expected {count}")
        return b.astype(_U64)
    ends = np.flatnonzero(is_last)
    n = ends.size
    if count is not None and n != count:
        raise ValueError(f"varbyte stream holds {n} values, expected {count}")
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    payload = (b & 0x7F).astype(_U64)
    vals = payload[starts].copy()
    maxlen = int(lens.max())
    sel = lens > 1
    for j in range(1, maxlen):
        idx = starts[sel] + j
        vals[np.flatnonzero(sel)] |= payload[idx] << _U64(7 * j)
        if j + 1 < maxlen:
            sel = sel & (lens > j + 1)
    return vals


def vb_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (1..10), vectorized; stops at the
    stream's actual width (tf/dl streams are 1-2 wide, not 10). Unsigned
    input dtypes are used as-is (no uint64 upcast pass)."""
    v = np.ascontiguousarray(values)
    if v.dtype.kind != "u":
        v = v.astype(_U64)
    nb = np.ones(v.size, dtype=np.int64)
    kmax = (v.dtype.itemsize * 8 + 6) // 7  # 5 for uint32, 10 for uint64
    for k in range(1, kmax):
        m = v >= v.dtype.type(1 << (7 * k))
        if not m.any():
            break
        nb += m
    return nb


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value absolute, then gaps. Input must be strictly increasing."""
    v = np.ascontiguousarray(sorted_vals, dtype=_U64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=_U64)
    return np.cumsum(d, dtype=_U64)


def encode_postings_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    weights: np.ndarray,
    block_size: int = 128,
) -> dict:
    """Encode one term's postings (sorted by doc_id) into block layout.

    Each block holds up to ``block_size`` postings. Within a block, doc_ids are
    delta-encoded (first doc of block i>0 is delta'd against block i-1's last
    doc) so any block can be decoded independently given ``blk_last[i-1]``.

    Returns dict with: doc_bytes, tf_bytes, dl_bytes (varbyte streams),
    blk_last (uint64 per block), blk_max_w (float64 per block), blk_off_doc /
    blk_off_tf / blk_off_dl (uint32 byte offset of each block; end offset is
    the stream length), blk_count (int32 postings per block), n.
    """
    n = int(doc_ids.size)
    doc_ids = np.ascontiguousarray(doc_ids, dtype=_U64)
    deltas = delta_encode(doc_ids)
    # tf/dl keep their native unsigned dtype (uint32 from the reducer) —
    # the codecs are dtype-native, so no upcast pass
    tfs64 = np.ascontiguousarray(tfs)
    dls64 = np.ascontiguousarray(dls)
    if tfs64.dtype.kind != "u":
        tfs64 = tfs64.astype(_U64)
    if dls64.dtype.kind != "u":
        dls64 = dls64.astype(_U64)
    # block boundaries — fully vectorized: block i's first delta is already
    # relative to block i-1's last doc (it's just the global delta), so one
    # whole-stream varbyte encode per column is byte-identical to per-block
    # encodes concatenated; block byte offsets come from per-value lengths
    starts = np.arange(0, max(n, 1), block_size, dtype=np.int64)
    if n == 0:
        starts = starts[:0]
    ends = np.minimum(starts + block_size, n)
    blk_last = doc_ids[ends - 1] if n else np.empty(0, _U64)
    blk_max_w = (
        np.maximum.reduceat(np.asarray(weights, np.float64), starts)
        if n else np.empty(0, np.float64)
    )
    blk_count = (ends - starts).astype(np.int32)

    def offsets_for(nb: np.ndarray) -> np.ndarray:
        cum = np.zeros(len(nb) + 1, dtype=np.int64)
        np.cumsum(nb, out=cum[1:])
        return cum[starts].astype(np.uint32)

    # one lengths pass per stream, shared between the encode and the offsets
    nb_doc = vb_lengths(deltas)
    nb_tf = vb_lengths(tfs64)
    nb_dl = vb_lengths(dls64)
    return {
        "n": n,
        "doc_bytes": vb_encode(deltas, nb_doc),
        "tf_bytes": vb_encode(tfs64, nb_tf),
        "dl_bytes": vb_encode(dls64, nb_dl),
        "blk_last": blk_last,
        "blk_max_w": blk_max_w,
        "blk_count": blk_count,
        "blk_off_doc": offsets_for(nb_doc),
        "blk_off_tf": offsets_for(nb_tf),
        "blk_off_dl": offsets_for(nb_dl),
    }


def decode_postings_blocks(enc: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full block-encoded posting list → (doc_ids, tfs, dls)."""
    n = enc["n"]
    deltas = vb_decode(enc["doc_bytes"], n)
    tfs = vb_decode(enc["tf_bytes"], n)
    dls = vb_decode(enc["dl_bytes"], n)
    return delta_decode(deltas), tfs, dls


def decode_block_run(
    enc: dict, lo: int, hi: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode blocks lo..hi (inclusive) in one pass. Valid because delta
    continuity chains across consecutive blocks: block i's first delta is
    relative to block i-1's last doc."""
    nblk = len(enc["blk_last"])
    cnt = int(enc["blk_count"][lo: hi + 1].sum())
    b_doc = enc["doc_bytes"][int(enc["blk_off_doc"][lo]):
                             int(enc["blk_off_doc"][hi + 1]) if hi + 1 < nblk
                             else len(enc["doc_bytes"])]
    b_tf = enc["tf_bytes"][int(enc["blk_off_tf"][lo]):
                           int(enc["blk_off_tf"][hi + 1]) if hi + 1 < nblk
                           else len(enc["tf_bytes"])]
    b_dl = enc["dl_bytes"][int(enc["blk_off_dl"][lo]):
                           int(enc["blk_off_dl"][hi + 1]) if hi + 1 < nblk
                           else len(enc["dl_bytes"])]
    docs = delta_decode(vb_decode(b_doc, cnt))
    if lo > 0:
        docs += enc["blk_last"][lo - 1]
    return docs, vb_decode(b_tf, cnt), vb_decode(b_dl, cnt)


def decode_block(enc: dict, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a single block i independently → (doc_ids, tfs, dls)."""
    nblk = len(enc["blk_last"])
    lo_doc = int(enc["blk_off_doc"][i])
    hi_doc = int(enc["blk_off_doc"][i + 1]) if i + 1 < nblk else len(enc["doc_bytes"])
    lo_tf = int(enc["blk_off_tf"][i])
    hi_tf = int(enc["blk_off_tf"][i + 1]) if i + 1 < nblk else len(enc["tf_bytes"])
    lo_dl = int(enc["blk_off_dl"][i])
    hi_dl = int(enc["blk_off_dl"][i + 1]) if i + 1 < nblk else len(enc["dl_bytes"])
    cnt = int(enc["blk_count"][i])
    deltas = vb_decode(enc["doc_bytes"][lo_doc:hi_doc], cnt)
    docs = delta_decode(deltas)
    if i > 0:
        # first delta of block i is relative to block i-1's last doc
        docs += enc["blk_last"][i - 1]
    tfs = vb_decode(enc["tf_bytes"][lo_tf:hi_tf], cnt)
    dls = vb_decode(enc["dl_bytes"][lo_dl:hi_dl], cnt)
    return docs, tfs, dls


def binary_column_view(col) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy (data u8, per-row int64 offsets) view of an Arrow
    binary / large_binary column (ChunkedArray or Array). The returned
    data array is already sliced to the column's rows; offsets are
    rebased to 0."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], off_dt)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2] or b"", np.uint8)
    return data[offs[0]: offs[-1]], offs - offs[0]


def binary_column_from(data: bytes | np.ndarray, offsets: np.ndarray):
    """Build a large_binary Array from a flat byte stream + int64 row
    offsets without any per-row Python objects."""
    import pyarrow as pa

    offs = np.ascontiguousarray(offsets, np.int64)
    buf = data.tobytes() if isinstance(data, np.ndarray) else data
    return pa.Array.from_buffers(
        pa.large_binary(), len(offs) - 1,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(buf)])


def delta_decode_segments(deltas: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Segmented delta-decode: segment r (``lens[r]`` values) was encoded
    with its first value absolute. One global cumsum + modular base
    subtraction — exact mod 2^64 even though the cross-segment cumsum
    wraps, because each segment's true values are < 2^64."""
    c = np.cumsum(np.ascontiguousarray(deltas, _U64), dtype=_U64)
    lens = np.ascontiguousarray(lens, np.int64)
    starts = np.cumsum(lens) - lens
    base = np.zeros(len(lens), _U64)
    nz = np.flatnonzero(starts > 0)
    base[nz] = c[starts[nz] - 1]
    return c - np.repeat(base, lens)


def encode_positions(flat_pos: np.ndarray, lens: np.ndarray) -> bytes:
    """Varbyte stream of per-posting token positions.

    ``flat_pos`` concatenates each posting's ascending positions; ``lens``
    gives the posting boundaries (len i = posting i's occurrence count).
    Within a posting the first position is absolute and the rest are deltas
    — decodable with :func:`decode_positions` given the same ``lens``."""
    if flat_pos.size == 0:
        return b""
    v = flat_pos.astype(_U64)
    d = v.copy()
    d[1:] -= v[:-1]  # wraps across posting boundaries — overwritten next
    starts = (np.cumsum(lens) - lens).astype(np.int64)
    d[starts] = v[starts]
    return vb_encode(d)


def decode_positions(buf: bytes, lens: np.ndarray) -> np.ndarray:
    """Inverse of :func:`encode_positions`: flat uint32 positions (grouped
    cumulative sums with a reset at every posting boundary)."""
    total = int(np.sum(lens))
    if total == 0:
        return np.empty(0, np.uint32)
    vals = vb_decode(buf, total)
    c = np.cumsum(vals, dtype=np.uint64)
    starts = (np.cumsum(lens) - lens).astype(np.int64)
    base = np.zeros(total, np.uint64)
    nz = starts[starts > 0]
    base[nz] = c[nz - 1]
    base = np.maximum.accumulate(base)
    return (c - base).astype(np.uint32)

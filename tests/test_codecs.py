import numpy as np
import pytest

from deces_dataprep_ray.functions.codecs import (
    decode_block,
    decode_postings_blocks,
    delta_decode,
    delta_encode,
    encode_postings_blocks,
    vb_decode,
    vb_encode,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_varbyte_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    for n in (1, 7, 1000):
        vals = rng.integers(0, 2**63, n, dtype=np.int64).astype(np.uint64)
        assert vb_decode(vb_encode(vals), n).tolist() == vals.tolist()


def test_varbyte_boundaries():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**21 - 1, 2**21,
         2**63 - 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    out = vb_decode(vb_encode(vals), len(vals))
    assert out.tolist() == vals.tolist()


def test_varbyte_empty():
    assert vb_encode(np.empty(0, dtype=np.uint64)) == b""
    assert len(vb_decode(b"")) == 0


def test_varbyte_count_mismatch_raises():
    buf = vb_encode(np.array([5, 6], dtype=np.uint64))
    with pytest.raises(ValueError):
        vb_decode(buf, 3)


def test_delta_roundtrip():
    v = np.array([3, 9, 10, 1000, 2**62], dtype=np.uint64)
    assert delta_decode(delta_encode(v)).tolist() == v.tolist()


@pytest.mark.parametrize("n,block", [(1, 128), (128, 128), (129, 128), (1000, 64)])
def test_block_encode_roundtrip(n, block):
    rng = np.random.default_rng(n)
    docs = np.unique(rng.integers(0, 2**63, n * 2, dtype=np.int64).astype(np.uint64))[:n]
    tfs = rng.integers(1, 50, len(docs)).astype(np.uint32)
    dls = rng.integers(1, 400, len(docs)).astype(np.uint32)
    w = rng.random(len(docs))
    enc = encode_postings_blocks(docs, tfs, dls, w, block_size=block)
    d, t, l = decode_postings_blocks(enc)
    assert d.tolist() == docs.tolist()
    assert t.tolist() == tfs.tolist()
    assert l.tolist() == dls.tolist()
    # block metadata: max weight per block matches, blocks decode independently
    nblk = len(enc["blk_last"])
    assert nblk == (len(docs) + block - 1) // block
    for i in range(nblk):
        lo, hi = i * block, min((i + 1) * block, len(docs))
        bd, bt, bl = decode_block(enc, i)
        assert bd.tolist() == docs[lo:hi].tolist()
        assert enc["blk_last"][i] == docs[hi - 1]
        assert enc["blk_max_w"][i] == w[lo:hi].max()

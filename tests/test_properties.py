"""Property-based tests (hypothesis): codecs, analyzer, rounding parity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deces_dataprep_ray.functions.analysis import tokenize, tokenize_many
from deces_dataprep_ray.functions.codecs import (
    decode_block,
    decode_postings_blocks,
    encode_postings_blocks,
    vb_decode,
    vb_encode,
)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varbyte_roundtrip_any(vals):
    arr = np.asarray(vals, dtype=np.uint64)
    assert vb_decode(vb_encode(arr), len(arr)).tolist() == arr.tolist()


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1),
             min_size=1, max_size=400, unique=True),
    st.integers(min_value=1, max_value=200),
)
def test_block_encode_roundtrip_any(docs, block_size):
    d = np.asarray(sorted(docs), dtype=np.uint64)
    rng = np.random.default_rng(len(d))
    tfs = rng.integers(1, 250, len(d)).astype(np.uint32)
    dls = rng.integers(1, 60000, len(d)).astype(np.uint32)
    w = rng.random(len(d))
    enc = encode_postings_blocks(d, tfs, dls, w, block_size=block_size)
    dd, tt, ll = decode_postings_blocks(enc)
    assert dd.tolist() == d.tolist()
    assert tt.tolist() == tfs.tolist()
    assert ll.tolist() == dls.tolist()
    # every block decodes independently and max-weights are exact
    for i in range(len(enc["blk_last"])):
        lo = i * block_size
        hi = min(lo + block_size, len(d))
        bd, bt, bl = decode_block(enc, i)
        assert bd.tolist() == d[lo:hi].tolist()
        assert enc["blk_max_w"][i] == w[lo:hi].max()


_texty = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@settings(max_examples=100, deadline=None)
@given(_texty)
def test_tokenize_idempotent(s):
    toks = tokenize(s)
    assert tokenize(" ".join(toks)) == toks


@settings(max_examples=50, deadline=None)
@given(st.lists(_texty, max_size=10))
def test_batch_matches_scalar(texts):
    assert tokenize_many(texts) == [tokenize(t) for t in texts]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=20))
def test_round_away_matches_duckdb(vals):
    import duckdb

    from deces_dataprep_ray.pipelines.driver_queries import round_away

    got = round_away(np.asarray(vals), 4)
    con = duckdb.connect()
    want = [con.sql(f"select round({v!r}::DOUBLE, 4)").fetchone()[0]
            for v in vals]
    assert np.allclose(got, want, rtol=0, atol=0)

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


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=(1 << 61) - 2), min_size=1,
             max_size=30),
    st.lists(st.integers(min_value=0, max_value=(1 << 61) - 2), min_size=1,
             max_size=30),
)
def test_mulmod_m61_matches_python_ints(avals, xvals):
    from deces_dataprep_ray.stages.dedup import _M61, _mulmod_m61

    a = np.asarray(avals, dtype=np.uint64)
    x = np.asarray(xvals, dtype=np.uint64)
    got = _mulmod_m61(a[:, None], x[None, :])
    for i, ai in enumerate(avals):
        for j, xj in enumerate(xvals):
            assert int(got[i, j]) == (ai * xj) % _M61


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=200))
def test_tokens_never_contain_field_separator(s):
    # fielded terms are "field:token"; the analyzer must never emit ':'
    # inside a token, or field routing would be ambiguous
    for tok in tokenize(s):
        assert ":" not in tok and tok


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.floats(min_value=-90, max_value=90, allow_nan=False),
             min_size=1, max_size=20),
    st.lists(st.floats(min_value=-180, max_value=180, allow_nan=False),
             min_size=1, max_size=20),
)
def test_haversine_properties(lats, lons):
    from deces_dataprep_ray.functions.geo import haversine_km

    n = min(len(lats), len(lons))
    la = np.asarray(lats[:n]); lo = np.asarray(lons[:n])
    d_self = haversine_km(la, lo, la, lo)
    assert np.allclose(d_self, 0.0, atol=1e-6)
    d_ab = haversine_km(la, lo, 10.0, 20.0)
    d_ba = haversine_km(np.full(n, 10.0), np.full(n, 20.0), la, lo)
    assert np.allclose(d_ab, d_ba)          # symmetric
    assert (d_ab <= 6371.0 * np.pi + 1e-6).all()  # bounded by half meridian


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.integers(min_value=0, max_value=100_000), min_size=1,
             max_size=40, unique=True),
    min_size=1, max_size=15,
))
def test_position_codec_roundtrip_any(groups):
    from deces_dataprep_ray.functions.codecs import (
        decode_positions,
        encode_positions,
    )

    groups = [np.sort(np.asarray(g, np.uint32)) for g in groups]
    lens = np.array([len(g) for g in groups])
    flat = np.concatenate(groups)
    got = decode_positions(encode_positions(flat, lens), lens)
    assert (got == flat).all()


@given(st.text(alphabet="abcde*?.[", min_size=0, max_size=12))
@settings(max_examples=200, deadline=None)
def test_wildcard_regexp_equals_fnmatch(pattern):
    """wildcard_to_regexp's full-match semantics == fnmatch's, for any mix
    of literals, metachars and regex-special chars (which must be escaped)."""
    import fnmatch
    import re

    from deces_dataprep_ray.index.query import wildcard_to_regexp

    regex, lit = wildcard_to_regexp(pattern)
    # the literal prefix never contains a metachar and prefixes the pattern
    assert "*" not in lit and "?" not in lit
    assert pattern.startswith(lit)
    for cand in ("", "a", "ab", "abc", "a.c", "ab[", "abcd", "xyz",
                 pattern.replace("*", "zz").replace("?", "q")):
        want = fnmatch.fnmatchcase(cand, pattern)
        got = re.fullmatch(regex, cand) is not None
        assert got == want, (pattern, cand)


@given(st.floats(min_value=-1e6, max_value=1e6),
       st.floats(min_value=0.1, max_value=1e4),
       st.floats(min_value=0.0, max_value=1e3),
       st.sampled_from(["gauss", "exp", "linear"]))
@settings(max_examples=100, deadline=None)
def test_decay_formula_properties(origin, scale, offset, shape):
    """ES decay invariants: value 1 inside the offset band, exactly
    ``decay`` at distance offset+scale, monotone nonincreasing in |d|."""
    import numpy as np

    decay = 0.5
    d = np.array([0.0, offset * 0.5, offset, offset + scale,
                  offset + 2 * scale])
    dd = np.maximum(0.0, d - offset)
    if shape == "gauss":
        s2 = -(scale * scale) / (2 * np.log(decay))
        m = np.exp(-(dd * dd) / (2 * s2))
    elif shape == "exp":
        m = np.exp(np.log(decay) / scale * dd)
    else:
        s = scale / (1 - decay)
        m = np.maximum(0.0, (s - dd) / s)
    assert m[0] == 1.0 and m[1] == 1.0 and m[2] == 1.0  # inside the band
    np.testing.assert_allclose(m[3], decay, rtol=1e-12)  # the half point
    assert np.all(np.diff(m) <= 1e-15)  # nonincreasing


@settings(max_examples=20, deadline=None)
@given(st.lists(st.text(alphabet="ab cde", min_size=0, max_size=120),
                min_size=0, max_size=40),
       st.integers(min_value=2, max_value=8))
def test_shingle_batch_kernel_equals_scalar(texts, k):
    """_tokenize_shingles_batch must reproduce the per-doc kernel exactly
    for ANY text list and shingle width (padding, dups, unicode-free and
    boundary cases alike)."""
    import numpy as np

    from deces_dataprep_ray.stages.dedup import (
        _tokenize_shingles,
        _tokenize_shingles_batch,
    )

    flat, offs = _tokenize_shingles_batch(texts, k)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        assert np.array_equal(_tokenize_shingles(t, k),
                              flat[offs[i]:offs[i + 1]])


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=200, unique=True),
       st.text(alphabet="abc", max_size=3))
def test_hash_split_properties(keys, salt):
    """HashSplit: labels come only from the configured names, and the
    assignment depends on (salt, key) alone — element order and batch
    composition are irrelevant."""
    import pyarrow as pa

    from deces_dataprep_ray.stages.text import HashSplit

    st_ = HashSplit(key_col="k", salt=salt,
                    fractions=(("a", 0.5), ("b", 0.3), ("c", 0.2)))
    out = st_(pa.table({"k": keys}))["split"].to_pylist()
    assert set(out) <= {"a", "b", "c"}
    rev = st_(pa.table({"k": list(reversed(keys))}))["split"].to_pylist()
    assert rev == list(reversed(out))


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 60), st.integers(0, 60)),
                min_size=0, max_size=60))
def test_duplicate_components_invariants(edges):
    """Every edge's endpoints share a component; each component's label is
    the minimum of its members (checked against a union-find oracle)."""
    import pandas as pd
    import ray.data as rd

    from deces_dataprep_ray.stages.dedup import duplicate_components

    edges = [(a, b) for a, b in edges if a != b]
    pairs = pd.DataFrame({
        "id_a": pd.Series([a for a, _ in edges], dtype="int64"),
        "id_b": pd.Series([b for _, b in edges], dtype="int64"),
    })
    got = duplicate_components(rd.from_pandas(pairs)).to_pandas()
    if not edges:
        assert len(got) == 0
        return
    lab = dict(zip(got["doc_id"].astype(int), got["component"].astype(int)))
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict[int, list[int]] = {}
    for x in parent:
        groups.setdefault(find(x), []).append(x)
    want = {x: min(members) for r, members in groups.items() for x in members}
    assert lab == want

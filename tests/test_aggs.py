"""ES-style metric aggregations over docvalues (index/aggs.py).

Oracles: pandas recomputation over the source frame, plus the frozen
type-1 inverted-CDF percentile definition and HLL accuracy bounds."""

import numpy as np
import pandas as pd
import pytest

from deces_dataprep_ray.index.aggs import (
    _hll_estimate,
    _hll_registers,
    cardinality_agg,
    histogram_agg,
    percentiles_agg,
    stats_agg,
)
from deces_dataprep_ray.index.build import build_index
from deces_dataprep_ray.index.reader import IndexReader


@pytest.fixture(scope="module")
def agg_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("aggs")
    rng = np.random.default_rng(7)
    vocab = ["data", "spark", "window", "row", "scan"]
    n = 300
    df = pd.DataFrame({
        "url": [f"doc://{i}" for i in range(n)],
        "body": [" ".join(rng.choice(vocab, rng.integers(3, 9)))
                 # skew: docs tagged "b" lean heavily on "window"
                 + (" window window" if i % 3 == 0 else "")
                 for i in range(n)],
        "tag": ["b" if i % 3 == 0 else "a" for i in range(n)],
        "val": rng.integers(0, 40, n).astype("int64"),
        "opt": [float(i % 25) if i % 4 else None for i in range(n)],
    })
    src = str(d / "src.parquet")
    df.to_parquet(src)
    idx = str(d / "idx")
    build_index(src, idx, fields={"body": "body"},
                keyword_fields={"tag": "tag"},
                docvalue_fields={"val": "val", "opt": "opt"},
                num_buckets=2, salt_shards=2, head_min_df=1000,
                batch_size=64)
    return df, IndexReader(idx)


def test_stats_agg(agg_setup):
    df, r = agg_setup
    got = stats_agg(r, "val")
    assert got["count"] == len(df)
    assert got["min"] == float(df["val"].min())
    assert got["max"] == float(df["val"].max())
    assert got["sum"] == float(df["val"].sum())
    assert got["avg"] == pytest.approx(float(df["val"].mean()), rel=1e-12)


def test_stats_agg_skips_nulls(agg_setup):
    df, r = agg_setup
    got = stats_agg(r, "opt")
    nn = df["opt"].dropna()
    assert got["count"] == len(nn)
    assert got["sum"] == float(nn.sum())


def test_histogram_agg(agg_setup):
    df, r = agg_setup
    got = histogram_agg(r, "val", interval=10.0)
    want = (np.floor(df["val"] / 10.0) * 10.0).value_counts().sort_index()
    assert got == [(float(k), int(v)) for k, v in want.items()]
    # offset shifts bucket boundaries (ES offset param)
    got_off = histogram_agg(r, "val", interval=10.0, offset=3.0)
    keys = np.floor((df["val"] - 3.0) / 10.0) * 10.0 + 3.0
    want_off = keys.value_counts().sort_index()
    assert got_off == [(float(k), int(v)) for k, v in want_off.items()]


def test_cardinality_exact(agg_setup):
    df, r = agg_setup
    assert cardinality_agg(r, "val", exact=True) == df["val"].nunique()
    assert cardinality_agg(r, "opt", exact=True) == df["opt"].nunique()


def test_cardinality_hll_small_range(agg_setup):
    # p=14 registers with n << m run in the linear-counting regime: the
    # estimate should land within a couple of counts of truth
    df, r = agg_setup
    est = cardinality_agg(r, "val")
    assert abs(est - df["val"].nunique()) <= 2


def test_hll_accuracy_large():
    # direct register-level check at n >> linear-counting range:
    # standard error for m=2^14 is 1.04/sqrt(m) ~ 0.8%; assert 3 sigma
    vals = np.arange(500_000, dtype=np.int64)
    regs = _hll_registers(vals)
    est = _hll_estimate(regs)
    assert abs(est - 500_000) / 500_000 < 0.025


def test_hll_merge_is_union():
    a = np.arange(0, 30_000, dtype=np.int64)
    b = np.arange(20_000, 50_000, dtype=np.int64)
    ra, rb = _hll_registers(a), _hll_registers(b)
    merged = np.maximum(ra, rb)
    est = _hll_estimate(merged)
    assert abs(est - 50_000) / 50_000 < 0.025


def test_percentiles(agg_setup):
    df, r = agg_setup
    qs = (0.25, 0.5, 0.75, 0.95, 1.0)
    got = percentiles_agg(r, "val", qs=qs)
    v = np.sort(df["val"].to_numpy())
    n = len(v)
    for q in qs:
        rank = max(1, int(np.ceil(q * n)))
        assert got[q] == float(v[rank - 1]), q


def test_percentiles_guards(agg_setup):
    _, r = agg_setup
    with pytest.raises(ValueError, match="max_distinct"):
        percentiles_agg(r, "val", max_distinct=3)
    with pytest.raises(ValueError, match="outside"):
        percentiles_agg(r, "val", qs=(0.0,))


def test_significant_terms(agg_setup):
    """JLH vs a pandas recomputation over the foreground tag bucket."""
    from deces_dataprep_ray.index.aggs import significant_terms
    from deces_dataprep_ray.index.fielded import KeywordFilter

    df, r = agg_setup
    got = significant_terms(r, [KeywordFilter("tag", "b")], field="body",
                            top_n=5, min_fg_df=2)
    fg = df[df["tag"] == "b"]
    n_fg, n_bg = len(fg), len(df)
    toks = df["body"].str.split()
    fg_df = {}
    bg_df = {}
    for i, ts in toks.items():
        for t in set(ts):
            bg_df[t] = bg_df.get(t, 0) + 1
            if df["tag"][i] == "b":
                fg_df[t] = fg_df.get(t, 0) + 1
    want = []
    for t, c in fg_df.items():
        if c < 2:
            continue
        fr, br = c / n_fg, bg_df[t] / n_bg
        if fr > br:
            want.append((t, c, bg_df[t], (fr - br) * (fr / br)))
    want.sort(key=lambda x: (-x[3], x[0]))
    want = want[:5]
    assert [(t, f, b, round(s, 9)) for t, f, b, s in got] == \
           [(t, f, b, round(s, 9)) for t, f, b, s in want]
    assert got and got[0][0] == "window"


def test_significant_terms_requires_positive_filter(agg_setup):
    from deces_dataprep_ray.index.aggs import significant_terms
    from deces_dataprep_ray.index.fielded import NotKeywordFilter

    _, r = agg_setup
    with pytest.raises(ValueError, match="positive"):
        significant_terms(r, [NotKeywordFilter("tag", "a")])

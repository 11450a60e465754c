"""Stage library semantics (SURVEY.md §2.1 operator types)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from deces_dataprep_ray.stages import (
    BroadcastJoin,
    DeleteColumns,
    Exec,
    Filter,
    MapColumns,
    Normalize,
    ParseDate,
    Pipeline,
    RegexReplace,
)


def _ds(d: dict) -> rd.Dataset:
    return rd.from_arrow(pa.table(d))


def test_normalize_trims_and_collapses():
    out = Normalize(select="a|b").apply(
        _ds({"a": ["  x  y ", "z"], "b": ["p\t\tq", " r "], "c": [" keep ", "me"]})
    ).to_pandas()
    assert out["a"].tolist() == ["x y", "z"]
    assert out["b"].tolist() == ["p q", "r"]
    assert out["c"].tolist() == [" keep ", "me"]  # unselected untouched


def test_regex_replace_cascade_order_and_backrefs():
    # mirrors the reference's NOM extraction: ^(.*)\*.*/$ -> \1
    # (recipes/deces_dataprep.yml:54-57)
    stage = RegexReplace(select="nom", rules=[
        (r"^(.*)\*.*/$", r"\1"),
        (r"X$", "Y"),
    ])
    out = stage.apply(_ds({"nom": ["DUPONT*JEAN/", "PLAIN", "AX*B/"]})).to_pandas()
    assert out["nom"].tolist() == ["DUPONT", "PLAIN", "AY"]


def test_date_cascade_reference_semantics():
    """The reference's 13-regex date-fix cascade shape
    (recipes/deces_dataprep.yml:80-94): clamp day/month, kill zeros."""
    cascade = RegexReplace(select="d", rules=[
        (r"^00000000$", ""),                               # null date
        (r"^(\d{4})(\d{2})3[2-9]$", r"\g<1>\g<2>31"),     # day > 31 -> 31
        (r"^(\d{4})1[3-9](\d{2})$", r"\g<1>12\g<2>"),     # month > 12 -> 12
        (r"^(\d{4})00(\d{2})$", r"\g<1>01\g<2>"),         # month 00 -> 01
        (r"^(\d{6})00$", r"\g<1>01"),                      # day 00 -> 01
    ])
    out = cascade.apply(_ds({"d": [
        "20200133", "20201815", "20200015", "20200100", "00000000", "20200505",
    ]})).to_pandas()
    assert out["d"].tolist() == [
        "20200131", "20201215", "20200115", "20200101", "", "20200505"]


def test_parse_date_nulls_unparseable():
    ds = RegexReplace(select="d", rules=[(r"^00000000$", "")]).apply(
        _ds({"d": ["20200131", "00000000", "garbage"]}))
    out = ParseDate(select="d", format="%Y%m%d").apply(ds).to_pandas()
    assert out["d"][0] == pd.Timestamp("2020-01-31")
    assert pd.isna(out["d"][1])
    assert pd.isna(out["d"][2])


def test_map_and_delete():
    ds = _ds({"NOM_PRENOMS": ["a", "b"], "x": [1, 2]})
    ds = MapColumns({"NOM": "NOM_PRENOMS", "PRENOMS": "NOM_PRENOMS"}).apply(ds)
    ds = DeleteColumns(select="NOM_PRENOMS").apply(ds)
    out = ds.to_pandas()
    assert sorted(out.columns) == ["NOM", "PRENOMS", "x"]
    assert out["NOM"].tolist() == ["a", "b"]


def test_broadcast_join_and_anti():
    right = pa.table({"code": ["FR", "DE"], "label": ["France", "Germany"]})
    left = _ds({"id": [1, 2, 3], "c": ["FR", "XX", "DE"]})
    out = BroadcastJoin(right, on={"c": "code"}, select={"country": "label"}) \
        .apply(left).to_pandas().sort_values("id")
    assert out["country"].tolist() == ["France", None, "Germany"]
    anti = BroadcastJoin(right, on={"c": "code"}, anti=True) \
        .apply(left).to_pandas()
    assert anti["id"].tolist() == [2]


def test_exec_and_filter_and_pipeline():
    import pyarrow.compute as pc

    pipe = Pipeline([
        Exec(lambda t: t.append_column("y", pc.multiply(t["x"], pa.scalar(2))),
             name="double"),
        Filter(lambda t: pc.greater(t["y"], pa.scalar(4))),
    ])
    out = pipe.apply(_ds({"x": [1, 2, 3, 4]})).to_pandas()
    assert out["y"].tolist() == [6, 8]


def test_parse_geopoint_malformed_to_null():
    # shared kernel contract: whitespace tolerated, junk -> null, no raise
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from deces_dataprep_ray.stages.geo import parse_geopoint

    ds = rd.from_pandas(pd.DataFrame({
        "gp": ["48.85,2.35", "48.85, 2.35", "bad,pair", "", None, "1,2,3"]}))
    out = parse_geopoint(ds, "gp").to_pandas()
    lat = out["lat"].tolist()
    assert lat[0] == 48.85 and lat[1] == 48.85
    assert all(pd.isna(v) for v in lat[2:])

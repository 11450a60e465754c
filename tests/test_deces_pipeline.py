"""Reference-recipe parity on a synthetic FIXTURES.md F2 corpus."""

import gzip
import os

import pyarrow as pa
import pytest

from deces_dataprep_ray.pipelines.deces import deces_pipeline
from deces_dataprep_ray.sources.fwf import (
    DECES_NAMES,
    DECES_WIDTHS,
    read_fwf_gzip,
)


def _fwf_line(vals: list[str]) -> bytes:
    out = b""
    for v, w in zip(vals, DECES_WIDTHS):
        out += v.encode("latin-1").ljust(w)[:w]
    return out + b"\n"


ROWS = [
    # name marker format, valid dates, domestic codes
    ["DUPONT*JEAN PIERRE/", "1", "19500115", "75056", "PARIS", "",
     "20200301", "75056", "123456789"],
    # female, day 32 (clamp), month 13 (clamp), colonial birth code
    ["MARTIN*MARIE/", "2", "19450233", "98201", "NOUAKCHOTT", "MAURITANIE",
     "20211315", "97101", "987654321 "],
    # null birth date, bad-char repair, commune with (Dept)
    ["BERNARD*LUC/", "1", "00000000", "92072", "SEVRES (92)", "",
     "20190715", "92072", "111222333"],
    # opposition row — must be dropped by the anti-join
    ["SECRET*ANNE/", "2", "19600101", "75056", "PARIS", "",
     "20220101", "99999", "OPPOSE001"],
    # death before birth → AGE null; Feb 29 non-leap (1961) → 02/28
    ["PETIT*PAUL/", "1", "19610229", "75056", "PARIS", "",
     "19500101", "75056", "444555666"],
]


@pytest.fixture(scope="module")
def fwf_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("fwf")
    p = os.path.join(d, "deces-2020.txt.gz")
    with gzip.open(p, "wb") as f:
        for r in ROWS:
            f.write(_fwf_line(r))
    return p


OPPOSITIONS = pa.table({
    "Code du lieu de décès": ["99999"],
    "Date de décès": ["20220101"],
    "Numéro d'acte de décès": ["OPPOSE001"],
})
COUNTRIES = pa.table({
    "COG": ["99336", "99352", "XXXXX"],
    "CODEISO3": ["MRT", "DZA", "FRA"],
    "LIBCOG": ["MAURITANIE", "ALGERIE", "FRANCE"],
})
CITYCODES = pa.table({
    "insee_code": ["75056", "92072", "97101"],
    "insee_code_history": ['"75056,75156"', "92072", "97101"],
    "Code postal": ['"75001,75002"', "92310", "97100"],
    "name": ["Paris", "Sèvres", "Abymes"],
    "newest_name": ["Paris", "Sèvres", "Les Abymes"],
    "dep_code": ["75", "92", "971"],
    "geopoint_2d": ["48.85,2.35", "48.82,2.21", "16.27,-61.5"],
})


@pytest.fixture(scope="module")
def result(fwf_path):
    ds = read_fwf_gzip([fwf_path])
    pipe = deces_pipeline(OPPOSITIONS, COUNTRIES, CITYCODES)
    return pipe.apply(ds).to_pandas().sort_values("SOURCE_LINE").reset_index(drop=True)


def test_fwf_reader(fwf_path):
    df = read_fwf_gzip([fwf_path]).to_pandas()
    assert len(df) == 5
    assert list(df.columns)[:9] == DECES_NAMES
    assert df["NOM_PRENOMS"].iloc[0] == "DUPONT*JEAN PIERRE/"
    assert df["row_offset"].tolist() == [1, 2, 3, 4, 5]


def test_opposition_dropped(result):
    assert len(result) == 4  # 5 rows - 1 opposition
    assert "Anne" not in " ".join(str(x) for x in result["PRENOMS"])


def test_names_and_sex(result):
    r = result.iloc[0]
    assert r["NOM"] == "Dupont"
    assert r["PRENOMS"] == "Jean Pierre"
    assert r["PRENOM"] == "Jean"
    assert r["PRENOMS_NOM"] == "jean pierre dupont"
    assert r["SEXE"] == "M"
    assert result.iloc[1]["SEXE"] == "F"


def test_uid_and_source(result):
    assert result["SOURCE"].unique().tolist() == ["2020"]
    assert all(len(u) == 12 for u in result["UID"])
    assert result["UID"].nunique() == 4


def test_date_cascade(result):
    r = result.iloc[1]
    # death month 13 clamped to 12: 20211315 → 20211215
    assert r["DATE_DECES_NORM"] == "20211215"
    # birth 19450233: day 33→31, then Feb 31 → Mar 1 ⇒ 19450301
    assert r["DATE_NAISSANCE_NORM"] == "19450301"


def test_null_date_and_age(result):
    import pandas as pd

    r = result.iloc[2]
    assert r["DATE_NAISSANCE_NORM"] == ""
    assert pd.isna(r["AGE_DECES"])
    # age computed for row 0: 1950-01-15 → 2020-03-01 = 70
    assert result.iloc[0]["AGE_DECES"] == 70
    # death before birth → null
    assert pd.isna(result.iloc[3]["AGE_DECES"])


def test_leap_year_fix(result):
    # 1961-02-29 (non-leap) → 1961-02-28
    assert result.iloc[3]["DATE_NAISSANCE_NORM"] == "19610228"


def test_country_mapping(result):
    r = result.iloc[1]  # colonial birth code 98201 → Mauritanie
    assert r["PAYS_NAISSANCE_CODEISO3"] == "MRT"
    assert "Mauritanie" in r["PAYS_NAISSANCE"]
    r0 = result.iloc[0]  # domestic → XXXXX → FRA
    assert r0["PAYS_NAISSANCE_CODEISO3"] == "FRA"


def test_commune_alias_lists(result):
    r0 = result.iloc[0]
    assert isinstance(r0["COMMUNE_NAISSANCE"], (list, object))
    assert "Paris" in list(r0["COMMUNE_NAISSANCE"])
    assert list(r0["CODE_POSTAL_NAISSANCE"]) == ["75001", "75002"]
    # Sèvres (92) → "92 Sevres"-style flip + ref merge
    r2 = result.iloc[2]
    vals = list(r2["COMMUNE_NAISSANCE"])
    assert any("Sevres" in v or "Sèvres" in v or "92" in v for v in vals)


def test_historique_lists(result):
    r0 = result.iloc[0]
    assert list(r0["CODE_INSEE_NAISSANCE_HISTORIQUE"]) == ["75056", "75156"]
    r1 = result.iloc[1]  # colonial: fallback [country, insee]
    assert list(r1["CODE_INSEE_NAISSANCE_HISTORIQUE"]) == ["99336", "98201"]


def test_deleted_columns(result):
    for c in result.columns:
        assert not c.endswith("_ALTER")
        assert not c.endswith("_NORM") or c.startswith("DATE")
        assert c != "NOM_PRENOMS"
        assert c not in ("PAYS_NAISSANCE_CODE", "PAYS_DECES_CODE")


def test_geopoint_typing(tmp_path):
    # GEOPOINT_* "lat,lon" strings come out as typed float64 LAT/LON columns
    import pyarrow as pa

    from deces_dataprep_ray.pipelines.deces import _type_geopoints

    t = pa.table({
        "GEOPOINT_NAISSANCE": ["48.85,2.35", "", None, "16.27,-61.5", "junk"],
        "GEOPOINT_DECES": ["-12.78,45.23", "48.82,2.21", "bad,pair", "", "1,2"],
    })
    out = _type_geopoints(t)
    lat = out["GEOPOINT_NAISSANCE_LAT"].to_pylist()
    lon = out["GEOPOINT_NAISSANCE_LON"].to_pylist()
    assert lat == [48.85, None, None, 16.27, None]
    assert lon == [2.35, None, None, -61.5, None]
    assert out["GEOPOINT_DECES_LAT"].to_pylist() == [-12.78, 48.82, None, None, 1.0]
    assert out["GEOPOINT_DECES_LON"].type == pa.float64()

"""The reference's 42-step dataprep recipe, re-expressed as typed stages.

Source semantics: `projects/deces-dataprep/recipes/deces_dataprep.yml` (cited
per step below). This is the parity demonstration that the stage library
(`deces_dataprep_ray.stages`) covers the reference's whole recipe DSL: every
step is one of the 7 operator types over Arrow/pandas batches, with the
``exec`` pandas snippets re-written as named functions (no string eval).

Differences, deliberate (SURVEY.md §1.3/§2.5):
- string-or-list union columns (commune aliases, postal codes, historic INSEE
  codes) are ALWAYS ``list<string>`` here — the reference leaves them
  str-or-list depending on the row, which Arrow cannot type.
- ``SOURCE_LINE`` derives from explicit (source_file, row_offset) lineage
  carried by the fwf reader instead of the chunk-frame index
  (`recipes/deces_dataprep.yml:17`).
- the reference's dead ``(04|06|09|11)/31\\$`` rule (escaped ``$`` — never
  matches, `deces_dataprep.yml:91`) is kept AS an effect: we omit it, so
  April 31 stays invalid and nulls at parsedate, exactly as in the reference.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.ids import content_uid
from ..stages import (
    BroadcastJoin,
    DeleteColumns,
    Exec,
    MapColumns,
    Normalize,
    ParseDate,
    Pipeline,
    RegexReplace,
)

SRC_COLS = [
    "NOM_PRENOMS", "SEXE", "DATE_NAISSANCE", "CODE_INSEE_NAISSANCE",
    "COMMUNE_NAISSANCE", "PAYS_NAISSANCE", "DATE_DECES", "CODE_INSEE_DECES",
    "NUM_DECES",
]

# colonial-INSEE-prefix → COG country code table
# (`recipes/deces_dataprep.yml:107-134`; death variant `:248-274` lacks the
# Vietnam birth-only rule)
_COLONIAL_RULES = [
    (r"^98201.*", "99336"),  # Mauritanie
    (r"^98202.*", "99341"),  # Sénégal
    (r"^98203.*", "99330"),  # Guinée
    (r"^98204.*", "99326"),  # Côte d'Ivoire
    (r"^98205.*", "99327"),  # Bénin
    (r"^98206.*", "99335"),  # Mali
    (r"^98207.*", "99337"),  # Niger
    (r"^98208.*", "99345"),  # Togo
    (r"^98209.*", "99331"),  # Burkina
    (r"^98301.*", "99328"),  # Gabon
    (r"^98302.*", "99324"),  # Congo
    (r"^98303.*", "99323"),  # République centrafricaine
    (r"^98304.*", "99344"),  # Tchad
    (r"^98305.*", "99322"),  # Cameroun
    (r"^98401.*", "99333"),  # Madagascar
    (r"^98402.*", "99397"),  # Comores
    (r"^98405.*", "XXXXX"),  # La Réunion → FR
    (r"^98406.*", "99399"),  # Djibouti
]
_COLONIAL_TAIL = [
    (r"^99143.*", "99254"),        # Chypre
    (r"^9(1|2|3|4)352$", "99352"),  # Algérie
    (r"^98(4|5|6|7|8)(..)$", "XXXXX"),  # Mayotte, Nlle-Calédonie, …
    (r"^9[0-5](...)$", "XXXXX"),   # IdF + Belfort historic
    (r"^97[1-6](..)$", "XXXXX"),   # DOMs
    (r"^[0-8]....$", "XXXXX"),     # métropole
]


def colonial_rules(birth: bool) -> list[tuple[str, str]]:
    rules = list(_COLONIAL_RULES)
    if birth:
        rules.append((r"^98506.*", "99243"))  # Vietnam (birth only, `:96`)
    return rules + _COLONIAL_TAIL


# the 13-regex date-fix cascade (`recipes/deces_dataprep.yml:80-94`)
DATE_CASCADE = [
    (r"\D*", ""),                    # strip non-digits
    (r"^00000000$", ""),             # null date
    (r"(\d{4})(\d{2})(\d{2})", r"\1/\2/\3"),
    (r"/(3[2-9]|[4-9][0-9])$", "/31"),   # day > 31 → 31
    (r"/(1[3-9])/", "/12/"),             # month 13-19 → 12
    (r"/[2-9]([1-9])/", r"/0\1/"),       # month 21-99 (unit≠0) → 0x
    (r"/[2-9]0/", "/01/"),               # month x0 (x≥2) → 01
    (r"(\d{4})/02/(30|31)", r"\1/03/01"),
    # non-leap-year Feb 29 → Feb 28
    (r"(1900|(\d{2})([02468][26]|[13579][048]|\d[13579]))/02/29", r"\1/02/28"),
    # NOTE: the reference's `(04|06|09|11)/31\$` rule is dead (escaped `$`,
    # `deces_dataprep.yml:91`) — effect preserved by omission (31st of a
    # 30-day month stays invalid and nulls at parsedate)
    (r"/00", "/01"),
    (r"/", ""),
]


def _uid_source(t: pa.Table) -> pa.Table:
    """Step 2 (`:12-17`): content-hash UID, source year tag, line number."""
    cols = {c: t[c].to_pylist() for c in SRC_COLS}
    uids = [
        content_uid(tuple(cols[c][i] for c in SRC_COLS))
        for i in range(t.num_rows)
    ]
    t = t.append_column("UID", pa.array(uids, pa.string()))
    if "source_file" in t.column_names:
        src = t["source_file"].to_pylist()
        line = t["row_offset"]
    else:
        src = [""] * t.num_rows
        line = pa.array(np.arange(1, t.num_rows + 1), pa.int64())
    t = t.append_column("SOURCE", pa.array(src, pa.string()))
    return t.append_column("SOURCE_LINE", line)


def _sexe_recode(df: pd.DataFrame) -> pd.DataFrame:
    """Step 8b (`:52`): '2' → F else M."""
    df["SEXE"] = np.where(df["SEXE"] == "2", "F", "M")
    return df


def _title_and_concat(df: pd.DataFrame) -> pd.DataFrame:
    """Step 13 (`:68-75`): title-case names, lowercase concat columns."""
    for c in ("NOM", "PRENOMS", "PRENOM"):
        df[c] = df[c].astype(str).str.title()
    df["PRENOMS_NOM"] = (df["PRENOMS"] + " " + df["NOM"]).str.lower().str.strip()
    df["PRENOM_NOM"] = (df["PRENOM"] + " " + df["NOM"]).str.lower().str.strip()
    return df


def _age_and_reformat(df: pd.DataFrame) -> pd.DataFrame:
    """Step 17 (`:98-103`): age in whole years where death > birth (raw
    string compare, like the reference), dates reformatted to yyyyMMdd."""
    delta_years = (
        (df["DATE_DECES_NORM"] - df["DATE_NAISSANCE_NORM"]).dt.days / 365.25
    )
    age = np.floor(delta_years)
    valid = (df["DATE_DECES"] > df["DATE_NAISSANCE"]) & delta_years.notna()
    df["AGE_DECES"] = pd.array(
        np.where(valid, age, np.nan), dtype="Int64"
    )
    for c in ("DATE_NAISSANCE_NORM", "DATE_DECES_NORM"):
        df[c] = df[c].dt.strftime("%Y%m%d").fillna("")
    return df


def _merge_country_label(col: str) -> "Exec":
    """Steps 21/35 (`:143-152`, `:283-284`): merge free-text vs referential
    country label (3-way np.where; 'Ref, Freetext' when both differ)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        lib = df[f"{col}_LIBCOG"].fillna("").astype(str)
        free = df[col].fillna("").astype(str)
        df[col] = np.where(
            free == "",
            lib.str.title(),
            np.where(
                free != lib,
                lib.str.title() + ", " + free.str.title(),
                free.str.title(),
            ),
        )
        # the reference's join leaves "" for unmatched; ours yields None —
        # normalize trailing ', ' artifacts from empty lib
        df[col] = df[col].str.removeprefix(", ")
        return df

    return Exec(fn, name=f"merge_{col}", batch_format="pandas")


def _ascii_title(s: pd.Series) -> pd.Series:
    return (
        s.fillna("").astype(str)
        .str.normalize("NFKD")
        .str.encode("ascii", "ignore")
        .str.decode("ascii")
        .str.title()
    )


def _commune_alias(prefix: str) -> "Exec":
    """Steps 28/39 (`:185-218`, `:309-333`): accent-fold compare freetext vs
    referential commune, build '/'-joined alternatives incl. arrondissement
    parents, split to list; postal codes CSV → list. Always-list output."""

    com, ref, alter = (f"COMMUNE_{prefix}", f"COMMUNE_{prefix}_REF",
                       f"COMMUNE_{prefix}_ALTER")
    cp = f"CODE_POSTAL_{prefix}"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        for c in (ref, alter, cp):
            df[c] = df[c].fillna("")
        free = df[com].astype(str)
        refs = df[ref].astype(str)
        alts = df[alter].astype(str)
        all_ = np.where(
            free == _ascii_title(refs),
            refs,
            np.where(refs == "", free, free + "/" + refs),
        )
        all_ = np.where(
            refs == alts,
            all_,
            np.where(free == _ascii_title(alts), all_, all_ + "/" + alts),
        )
        # arrondissement: 'Paris 14e Arrondissement' → parent + full name
        arr = refs.str.contains("Arrondissement", regex=False)
        parent = refs.str.replace(r"^(\w+)\s.*$", r"\1", regex=True)
        df[com] = np.where(arr, parent + "/" + refs, all_)
        df[cp] = df[cp].astype(str).str.replace(r"[^AB0-9,]", "", regex=True)
        return df

    return Exec(fn, name=f"commune_alias_{prefix}", batch_format="pandas")


def _historique(prefix: str) -> "Exec":
    """Steps 31/40 (`:231-244`, `:334-347`): historic INSEE code list —
    CSV-quoted referential history when present, else [country_code,
    insee_code]. Always-list output."""

    hist = f"CODE_INSEE_{prefix}_HISTORIQUE"
    code = f"CODE_INSEE_{prefix}"
    pays = f"PAYS_{prefix}_CODE"

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        h = df[hist].fillna("").astype(str)
        cleaned = h.str.replace(r"[^AB0-9,]", "", regex=True)
        same = df[code] == df[pays]
        fallback = np.where(same, df[code], df[pays] + "," + df[code])
        df[hist] = np.where(h.str.contains('"'), cleaned, fallback)
        return df

    return Exec(fn, name=f"historique_{prefix}", batch_format="pandas")


def _dep_backfill(df: pd.DataFrame) -> pd.DataFrame:
    """Step 29 (`:219-228`): backfill département from INSEE prefix when
    domestic."""
    dep = df["DEPARTEMENT_NAISSANCE"].fillna("").astype(str)
    domestic = df["PAYS_NAISSANCE_CODE"].astype(str).str.match("XXXXX")
    df["DEPARTEMENT_NAISSANCE"] = np.where(
        dep == "",
        np.where(
            domestic,
            df["CODE_INSEE_NAISSANCE"].astype(str)
            .str.replace(r"...$", "", regex=True),
            dep,
        ),
        dep,
    )
    return df


LIST_COLS = [
    ("COMMUNE_NAISSANCE", "/"), ("COMMUNE_DECES", "/"),
    ("CODE_POSTAL_NAISSANCE", ","), ("CODE_POSTAL_DECES", ","),
    ("CODE_INSEE_NAISSANCE_HISTORIQUE", ","), ("CODE_INSEE_DECES_HISTORIQUE", ","),
]


def _split_lists(t: pa.Table) -> pa.Table:
    """Final stage: normalize the reference's string-or-list union columns
    to always-list<string> (SURVEY.md §1.3) — one Arrow split_pattern pass,
    avoiding list cells bouncing through pandas stage boundaries."""
    import pyarrow.compute as pc

    for c, sep in LIST_COLS:
        if c in t.column_names:
            col = pc.fill_null(pc.cast(t[c], pa.string()), "")
            idx = t.schema.get_field_index(c)
            t = t.set_column(idx, c, pc.split_pattern(col, pattern=sep))
    return t


def _type_geopoints(t: pa.Table) -> pa.Table:
    """Split GEOPOINT_* "lat,lon" strings into <col>_LAT / <col>_LON float64
    (empty / malformed → null) via the shared geo parsing kernel."""
    from ..functions.geo import parse_latlon_strings

    for c in ("GEOPOINT_NAISSANCE", "GEOPOINT_DECES"):
        if c not in t.column_names:
            continue
        lat, lon = parse_latlon_strings(t[c])
        t = t.append_column(c + "_LAT", lat).append_column(c + "_LON", lon)
    return t


def deces_pipeline(
    oppositions: pa.Table,
    countries: pa.Table,
    citycodes: pa.Table,
) -> Pipeline:
    """The full recipe. Lookup tables (schemas per SURVEY.md §2.2):

    - ``oppositions``: Code du lieu de décès; Date de décès; Numéro d'acte
      (`datasets/oppositions_rgpd.yml`) — anti-joined (`:37-52`)
    - ``countries``: COG; CODEISO3; LIBCOG (`:135-141`)
    - ``citycodes``: insee_code; insee_code_history; Code postal; name;
      newest_name; dep_code; geopoint_2d (`:167-178`)
    """
    insee_norm_rules = [
        (r"^9.352$", ""),          # Algérie
        (r"^985(..)$", r"976\1"),  # Mayotte
        (r"^98405.*", "97409"),    # La Réunion → Saint-Denis
        (r"^98(2|3|4).*$", ""),    # anciennes colonies
        (r"^99.*$", ""),           # pays étrangers
    ]
    citycode_select = lambda p: {
        f"CODE_INSEE_{p}_HISTORIQUE": "insee_code_history",
        f"CODE_POSTAL_{p}": "Code postal",
        f"COMMUNE_{p}_REF": "name",
        f"COMMUNE_{p}_ALTER": "newest_name",
        f"DEPARTEMENT_{p}": "dep_code",
        f"GEOPOINT_{p}": "geopoint_2d",
    }
    return Pipeline([
        # 1 (`:10-11`)
        Normalize(select="NOM_PRENOMS|COMMUNE_NAISSANCE|PAYS_NAISSANCE|NUM_DECES"),
        # 2 (`:12-17`)
        Exec(_uid_source, name="uid_source"),
        # 3 (`:18-22`): NUM_DECES → 9 chars, strip trailing space
        RegexReplace(select="NUM_DECES", rules=[(r"^(.{9}).*$", r"\1"),
                                                (r"\s+$", "")]),
        # 4 (`:23-27`): SOURCE → year tag
        RegexReplace(select="SOURCE", rules=[(r"^.*/deces-", ""),
                                             (r"\.txt(\.gz)?$", "")]),
        # 5 (`:28-31`): bad-char repair (the PAYS_NAISSACE selector typo
        # matches nothing in the reference — effect kept: two real columns)
        RegexReplace(select="NOM_PRENOMS|COMMUNE_NAISSANCE",
                     rules=[(r" \?", "X")]),
        # 6 (`:32-35`)
        MapColumns({"NOM": "NOM_PRENOMS", "PRENOMS": "NOM_PRENOMS",
                    "PRENOM": "NOM_PRENOMS"}),
        # 7+8a (`:37-51`): anti-join oppositions (drop matches)
        BroadcastJoin(oppositions, on={
            "CODE_INSEE_DECES": "Code du lieu de décès",
            "DATE_DECES": "Date de décès",
            "NUM_DECES": "Numéro d'acte de décès",
        }, anti=True),
        # 8b (`:52`)
        Exec(_sexe_recode, name="sexe_recode", batch_format="pandas"),
        # 9-11 (`:54-65`)
        RegexReplace(select="NOM", rules=[(r"^(.*)\*.*/\s*$", r"\1")]),
        RegexReplace(select="PRENOMS", rules=[(r"^.*\*(.*)/\s*$", r"\1")]),
        RegexReplace(select="PRENOM", rules=[(r"^.*\*(.*)/\s*$", r"\1"),
                                             (r"^([^\s]+)\s.*$", r"\1")]),
        # 12 (`:66-67`)
        DeleteColumns(select="NOM_PRENOMS"),
        # 13 (`:68-75`)
        Exec(_title_and_concat, name="title_concat", batch_format="pandas"),
        # 14-16 (`:77-97`)
        MapColumns({"DATE_NAISSANCE_NORM": "DATE_NAISSANCE",
                    "DATE_DECES_NORM": "DATE_DECES"}),
        RegexReplace(select="DATE_(DECES|NAISSANCE)_NORM", rules=DATE_CASCADE),
        ParseDate(select="DATE_(DECES|NAISSANCE)_NORM", format="%Y%m%d"),
        # 17 (`:98-103`)
        Exec(_age_and_reformat, name="age", batch_format="pandas"),
        # 18-22 (`:105-154`): birth country
        MapColumns({"PAYS_NAISSANCE_CODE": "CODE_INSEE_NAISSANCE"}),
        RegexReplace(select="PAYS_NAISSANCE_CODE", rules=colonial_rules(birth=True)),
        BroadcastJoin(countries, on={"PAYS_NAISSANCE_CODE": "COG"},
                      select={"PAYS_NAISSANCE_CODEISO3": "CODEISO3",
                              "PAYS_NAISSANCE_LIBCOG": "LIBCOG"}),
        _merge_country_label("PAYS_NAISSANCE"),
        DeleteColumns(select="PAYS_NAISSANCE_LIBCOG"),
        # 23-30 (`:157-230`): birth commune
        MapColumns({"CODE_INSEE_NAISSANCE_NORM": "CODE_INSEE_NAISSANCE"}),
        RegexReplace(select="CODE_INSEE_NAISSANCE_NORM", rules=insee_norm_rules),
        BroadcastJoin(citycodes, on={"CODE_INSEE_NAISSANCE_NORM": "insee_code"},
                      select=citycode_select("NAISSANCE")),
        Exec(lambda df: df.assign(
            COMMUNE_NAISSANCE=df["COMMUNE_NAISSANCE"].astype(str).str.title()),
            name="title_commune", batch_format="pandas"),
        RegexReplace(select="COMMUNE_NAISSANCE",
                     rules=[(r"^(.*?)\s*\((\w+)\)$", r"\2 \1")]),
        _commune_alias("NAISSANCE"),
        Exec(_dep_backfill, name="dep_backfill", batch_format="pandas"),
        DeleteColumns(select="CODE_INSEE_NAISSANCE_NORM|COMMUNE_NAISSANCE_(REF|ALL)"),
        _historique("NAISSANCE"),
        # 32-40 (`:246-347`): death country + commune (mirrors)
        MapColumns({"PAYS_DECES_CODE": "CODE_INSEE_DECES"}),
        RegexReplace(select="PAYS_DECES_CODE", rules=colonial_rules(birth=False)),
        BroadcastJoin(countries, on={"PAYS_DECES_CODE": "COG"},
                      select={"PAYS_DECES_CODEISO3": "CODEISO3",
                              "PAYS_DECES_LIBCOG": "LIBCOG"}),
        Exec(lambda df: df.assign(PAYS_DECES=np.where(
            df["PAYS_DECES_LIBCOG"].fillna("") != "",
            df["PAYS_DECES_LIBCOG"].fillna("").astype(str).str.title(), "")),
            name="pays_deces", batch_format="pandas"),
        DeleteColumns(select="PAYS_DECES_LIBCOG"),
        MapColumns({"CODE_INSEE_DECES_NORM": "CODE_INSEE_DECES"}),
        RegexReplace(select="CODE_INSEE_DECES_NORM", rules=insee_norm_rules),
        BroadcastJoin(citycodes, on={"CODE_INSEE_DECES_NORM": "insee_code"},
                      select=citycode_select("DECES")),
        Exec(lambda df: df.assign(
            COMMUNE_DECES=df.get("COMMUNE_DECES_REF", pd.Series([""] * len(df))).fillna("").astype(str)),
            name="commune_deces_seed", batch_format="pandas"),
        _commune_alias("DECES"),
        _historique("DECES"),
        # 41-42 (`:348-351`)
        DeleteColumns(select="PAYS_(NAISSANCE|DECES)_CODE"),
        DeleteColumns(select=".*_ALTER|CODE.*_NORM"),
        # union-column normalization (ours; SURVEY.md §1.3)
        Exec(_split_lists, name="split_lists"),
        # geo_point typing (`datasets/deces_index.yml:115-116,156-157`): the
        # ES mapping types GEOPOINT_* as geo_point; here the "lat,lon"
        # strings become typed float64 LAT/LON columns so the haversine
        # radius filter (stages.geo) and docvalue range scans apply directly
        Exec(_type_geopoints, name="type_geopoints"),
    ])

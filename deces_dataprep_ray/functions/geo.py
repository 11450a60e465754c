"""Geo kernels: haversine distance + geopoint string parsing.

The reference types ``GEOPOINT_NAISSANCE`` / ``GEOPOINT_DECES`` as ES
``geo_point`` (`projects/deces-dataprep/datasets/deces_index.yml:115-116,
156-157`), fed from the citycodes ``geopoint_2d`` "lat,lon" strings. These
kernels re-own the distance math for the radius filter.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lon1, lat2, lon2) -> np.ndarray:
    """Vectorized great-circle distance (km), float64."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, np.float64))
                              for x in (lat1, lon1, lat2, lon2))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = (np.sin(dlat / 2.0) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2.0) ** 2)
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def parse_latlon_strings(arr):
    """Vectorized "lat,lon" string column → (lat float64, lon float64)
    Arrow arrays; whitespace tolerated, anything unparseable → null (never
    raises — one malformed row must not kill a 100 TB stage).

    The ONE shared geopoint parser: `stages.geo.parse_geopoint` and the
    deces pipeline's GEOPOINT typing both route here.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    s = pc.fill_null(pc.cast(arr, pa.string()), "")
    parts = pc.split_pattern(s, ",")
    two = pc.equal(pc.list_value_length(parts), 2)
    safe = pc.if_else(two, parts, pa.scalar(["", ""], pa.list_(pa.string())))
    num_re = r"^-?\d+(\.\d+)?$"

    def f64(component):
        trimmed = pc.utf8_trim_whitespace(component)
        ok = pc.match_substring_regex(pc.fill_null(trimmed, ""), num_re)
        return pc.cast(pc.if_else(ok, trimmed, pa.scalar(None, pa.string())),
                       pa.float64())

    lat = f64(pc.if_else(two, pc.list_element(safe, 0),
                         pa.scalar(None, pa.string())))
    lon = f64(pc.if_else(two, pc.list_element(safe, 1),
                         pa.scalar(None, pa.string())))
    return lat, lon

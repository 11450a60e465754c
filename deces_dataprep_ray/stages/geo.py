"""Geo stages: geopoint typing + radius filter over (lat, lon) columns.

The reference carries ``geopoint_2d`` "lat,lon" strings through the
citycodes join and maps them as ES ``geo_point``
(`datasets/deces_index.yml:115-116,156-157`); distance filtering is then
ES-side. Here the typing and the filter are owned as Ray Data stages:

- :func:`parse_geopoint` — one vectorized split of the "lat,lon" string
  column into two float64 columns (invalid/missing → null).
- :func:`geo_radius_filter` — per-batch vectorized haversine against a fixed
  center; a pure map_batches filter (no shuffle), composable with the
  docvalues-backed :class:`..index.fielded.GeoRadiusFilter` for index-side
  filtering.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.geo import haversine_km


def parse_geopoint(ds: rd.Dataset, src_col: str, lat_col: str = "lat",
                   lon_col: str = "lon") -> rd.Dataset:
    """Type a "lat,lon" string column into two float64 columns
    (invalid/missing → null; shared kernel, never raises on bad rows)."""
    from ..functions.geo import parse_latlon_strings

    def fx(t: pa.Table) -> pa.Table:
        lat, lon = parse_latlon_strings(t[src_col])
        return (t.append_column(lat_col, lat)
                 .append_column(lon_col, lon))

    return ds.map_batches(fx, batch_format="pyarrow")


def geo_radius_filter(ds: rd.Dataset, lat_col: str, lon_col: str,
                      center_lat: float, center_lon: float,
                      radius_km: float) -> rd.Dataset:
    """Keep rows within ``radius_km`` of the center (haversine, inclusive)."""

    def fx(t: pa.Table) -> pa.Table:
        lat = t[lat_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lon = t[lon_col].to_numpy(zero_copy_only=False).astype(np.float64)
        d = haversine_km(lat, lon, center_lat, center_lon)
        keep = np.isfinite(d) & (d <= radius_km)
        return t.filter(pa.array(keep))

    return ds.map_batches(fx, batch_format="pyarrow")

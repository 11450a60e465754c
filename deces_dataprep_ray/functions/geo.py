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

"""Coordinate transform: EPSG:3857 (WGS84 Web Mercator) → EPSG:5880
(SIRGAS 2000 / Brazil Polyconic).

This is the single CRS pair the reference uses — ST_Transform(geometry,
'EPSG:3857', 'EPSG:5880') so areas come out in m²
(reference spark_job/process_geodata.py:124,133-136).

Closed-form, no pyproj: spherical Web-Mercator inverse + ellipsoidal American
Polyconic forward per Snyder, "Map Projections: A Working Manual" (USGS PP
1395), eqs. 3-21, 18-12..18-15. SIRGAS 2000 uses the GRS80 ellipsoid, which is
WGS84-compatible at the accuracy scale of this pipeline, so no datum shift.
"""

from __future__ import annotations

import math

# GRS80 / WGS84 shared semi-major axis
_A = 6378137.0
_F = 1.0 / 298.257222101  # GRS80 flattening
_E2 = _F * (2.0 - _F)
_E4 = _E2 * _E2
_E6 = _E4 * _E2

# EPSG:5880 projection parameters
_LON0 = math.radians(-54.0)
_FE = 5_000_000.0
_FN = 10_000_000.0

_M0_C0 = 1.0 - _E2 / 4.0 - 3.0 * _E4 / 64.0 - 5.0 * _E6 / 256.0
_M0_C2 = 3.0 * _E2 / 8.0 + 3.0 * _E4 / 32.0 + 45.0 * _E6 / 1024.0
_M0_C4 = 15.0 * _E4 / 256.0 + 45.0 * _E6 / 1024.0
_M0_C6 = 35.0 * _E6 / 3072.0

def _meridian_arc(phi: float) -> float:
    return _A * (_M0_C0 * phi - _M0_C2 * math.sin(2 * phi)
                 + _M0_C4 * math.sin(4 * phi) - _M0_C6 * math.sin(6 * phi))

def webmercator_inverse(x: float, y: float) -> tuple[float, float]:
    """EPSG:3857 metres → (lon, lat) radians (spherical, R = a)."""
    lon = x / _A
    lat = 2.0 * math.atan(math.exp(y / _A)) - math.pi / 2.0
    return lon, lat

def polyconic_forward(lon: float, lat: float) -> tuple[float, float]:
    """(lon, lat) radians → EPSG:5880 easting/northing metres."""
    if abs(lat) < 1e-12:
        return _FE + _A * (lon - _LON0), _FN  # M0 = 0 (lat0 = 0)
    n = _A / math.sqrt(1.0 - _E2 * math.sin(lat) ** 2)
    cot = 1.0 / math.tan(lat)
    e_ang = (lon - _LON0) * math.sin(lat)
    x = n * cot * math.sin(e_ang)
    # 2·sin²(E/2), not 1−cos(E): for |lat| ≲ 1e-5 (metres from the equator)
    # E ~ 1e-7 and 1−cos(E) cancels catastrophically; multiplied by
    # cot(lat) ~ 1e7 the noise reached millimetres per vertex, visible in
    # area checks. The half-angle form keeps full relative precision.
    y = _meridian_arc(lat) + n * cot * 2.0 * math.sin(e_ang / 2.0) ** 2
    return _FE + x, _FN + y

def mercator_to_polyconic(x: float, y: float) -> tuple[float, float]:
    """EPSG:3857 → EPSG:5880, the fused per-vertex transform."""
    return polyconic_forward(*webmercator_inverse(x, y))

def transform_geom(geom: list) -> list:
    """Apply the vertex transform to a kernel geometry (list-of-polygons)."""
    return [[[mercator_to_polyconic(x, y) for x, y in ring] for ring in poly]
            for poly in geom]

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

# ------------------------------------------------------------ inverse pair

def webmercator_forward(lon: float, lat: float) -> tuple[float, float]:
    """(lon, lat) radians → EPSG:3857 metres (spherical, R = a)."""
    return _A * lon, _A * math.log(math.tan(math.pi / 4.0 + lat / 2.0))

def polyconic_inverse(x: float, y: float) -> tuple[float, float]:
    """EPSG:5880 easting/northing metres → (lon, lat) radians.

    2-D Newton on the closed-form forward (finite-difference Jacobian):
    simple, robust near the equator branch, and converges to < 1e-9 m in
    ~4 iterations from the M(φ) ≈ y_rel seed. Chosen over Snyder's 18-18
    series inverse so the inverse is DEFINED as forward's fixpoint — any
    future forward fix automatically keeps the pair consistent
    (round-trip property-tested to sub-micrometre)."""
    lat = (y - _FN) / _A
    lon = _LON0 + (x - _FE) / (_A * max(math.cos(lat), 1e-9))
    for _ in range(20):
        fx, fy = polyconic_forward(lon, lat)
        rx, ry = fx - x, fy - y
        if abs(rx) < 1e-9 and abs(ry) < 1e-9:
            break
        h = 1e-8
        fx1, fy1 = polyconic_forward(lon + h, lat)
        fx2, fy2 = polyconic_forward(lon, lat + h)
        j11, j21 = (fx1 - fx) / h, (fy1 - fy) / h
        j12, j22 = (fx2 - fx) / h, (fy2 - fy) / h
        det = j11 * j22 - j12 * j21
        if det == 0.0:
            break
        lon -= (rx * j22 - j12 * ry) / det
        lat -= (j11 * ry - rx * j21) / det
    return lon, lat

def polyconic_to_mercator(x: float, y: float) -> tuple[float, float]:
    """EPSG:5880 → EPSG:3857, the fused inverse per-vertex transform."""
    return webmercator_forward(*polyconic_inverse(x, y))

def transform_geom_inverse(geom: list) -> list:
    return [[[polyconic_to_mercator(x, y) for x, y in ring] for ring in poly]
            for poly in geom]

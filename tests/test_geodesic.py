"""Geodesic measures (r7, VERDICT r6 item 3): ST_DistanceSphere /
ST_DistanceSpheroid / ST_AreaSpheroid against published constants and
cross-formula invariants.

Parity target: the Sedona lat/lon calls users reach for before any CRS
reprojection (the reference's own workaround is the ST_Transform chain at
spark_job/process_geodata.py:133-136).
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
    _area_spheroid,
    _distance_sphere,
    _distance_spheroid,
)


def test_spheroid_known_points():
    # WGS84 equator quadrant: a quarter of the equatorial circle, exactly
    # pi/2 * a (the equator is a circle of radius a on the ellipsoid)
    eq = _distance_spheroid("POINT (0 0)", "POINT (90 0)")
    assert abs(eq - math.pi / 2 * 6378137.0) < 1e-3
    # WGS84 meridian quadrant: published 10 001 965.729 m
    mer = _distance_spheroid("POINT (0 0)", "POINT (0 90)")
    assert abs(mer - 10_001_965.729) < 1e-2
    # LAX (33.9425 N, 118.4080 W) -> JFK (40.6398 N, 73.7789 W):
    # the classic geodesic example, ~3 983 km on the ellipsoid
    d = _distance_spheroid("POINT (-118.408 33.9425)",
                           "POINT (-73.7789 40.6398)")
    assert 3_975_000 < d < 3_990_000
    assert _distance_spheroid("POINT (12 34)", "POINT (12 34)") == 0.0


def test_sphere_known_points():
    # half the sphere circumference: antipodal points
    d = _distance_sphere("POINT (0 0)", "POINT (180 0)")
    assert abs(d - math.pi * 6371008.0) < 1e-6
    # one degree of longitude at the equator: R * pi/180
    d = _distance_sphere("POINT (0 0)", "POINT (1 0)")
    assert abs(d - 6371008.0 * math.pi / 180) < 1e-6
    # non-points and NULLs -> NULL (engine SQL convention)
    assert _distance_sphere("LINESTRING (0 0, 1 1)", "POINT (0 0)") is None
    assert _distance_sphere(None, "POINT (0 0)") is None


def test_geodesic_input_validation():
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel.geom import GeomError

    with pytest.raises(GeomError, match="4326"):
        _distance_sphere("POINT (200 0)", "POINT (0 0)")
    with pytest.raises(GeomError, match="4326"):
        _distance_spheroid("POINT (0 95)", "POINT (0 0)")


def test_area_spheroid_known_values():
    # whole sphere via two hemispheres is out of polygon scope; instead:
    # a full longitude band [0,360)x... is invalid WKT; use the published
    # identity that a 1-deg x 1-deg cell at the equator is ~12 364 km^2
    a = _area_spheroid("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
    assert abs(a - 12_364e6) / 12_364e6 < 0.001
    # same cell at 60N is ~cos(60.5deg) smaller (band midpoint latitude)
    a60 = _area_spheroid("POLYGON ((0 60, 1 60, 1 61, 0 61, 0 60))")
    assert abs(a60 / a - math.cos(math.radians(60.5))) < 0.01
    # holes subtract
    outer = "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0), " \
            "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"
    solid = _area_spheroid("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
    hole = _area_spheroid(
        "POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))")
    assert abs(_area_spheroid(outer) - (solid - hole)) < 1.0
    # non-areal -> 0
    assert _area_spheroid("LINESTRING (0 0, 1 1)") == 0.0
    assert _area_spheroid("POINT (3 4)") == 0.0


@given(lon1=st.integers(-179, 179), lat1=st.integers(-89, 89),
       dlon=st.integers(-2, 2), dlat=st.integers(-2, 2))
@settings(max_examples=80, deadline=None)
def test_prop_spheroid_within_flattening_bound_of_sphere(lon1, lat1,
                                                         dlon, dlat):
    """The geodesic on WGS84 differs from the great circle on the mean
    sphere by at most the flattening-scale bound (~0.56%); symmetric in
    argument order."""
    from hypothesis import assume

    assume(dlon or dlat)
    # keep b on the sphere: lat1=89 + dlat=2 would step past the pole
    assume(abs(lat1 + dlat) <= 90 and abs(lon1 + dlon) <= 180)
    a = f"POINT ({lon1} {lat1})"
    b = f"POINT ({lon1 + dlon} {lat1 + dlat})"
    ds = _distance_sphere(a, b)
    dv = _distance_spheroid(a, b)
    assert ds > 0 and dv > 0
    assert abs(dv / ds - 1) < 0.006
    assert _distance_spheroid(b, a) == pytest.approx(dv, rel=1e-12)
    assert _distance_sphere(b, a) == pytest.approx(ds, rel=1e-12)

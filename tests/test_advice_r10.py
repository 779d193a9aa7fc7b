"""Round-10 regression tests for the four r9 advice items:

1. ST_AsEWKT on a malformed SRID prefix ('SRID=abc;...') raises
   GeomError — the same parse-edge contract _srid already honors —
   instead of a raw ValueError from int().
2. kernel/noding._snap_nodes clusters over a sliding x-window, so two
   ulp-sibling crossing nodes merge even when an unrelated node sorts
   lexicographically between them (the three-concurrent-lines case).
3. ST_Collect of homogeneous Z members returns the Z-tagged MULTI*
   (PostGIS semantics), not a GEOMETRYCOLLECTION; mixed-dimension
   input still nests.
4. The LOF small-neighborhood guard (kd_fn group width <= K) is pinned
   by tests/test_outlier.py::test_small_neighborhood_raises_loudly —
   listed here for the audit trail only.
"""

from __future__ import annotations

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial as S
from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial_ext as SE
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geomtypes as GT
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import noding as N


# ---------------------------------------------- 1. _as_ewkt bad SRID

def test_as_ewkt_bad_srid_raises_geomerror():
    with pytest.raises(GT.GeomError, match="bad SRID"):
        S._as_ewkt("SRID=abc;POINT (1 2)")


def test_as_ewkt_good_srid_still_carries():
    assert S._as_ewkt("SRID=4326;POINT (1 2)") == "SRID=4326;POINT (1 2)"


# ------------------------------- 2. snap window over interposed nodes

def test_snap_merges_ulp_siblings_across_interposed_node():
    """a=(1,1) and b=(1+1ulp,1) are ulp siblings; m=(1,2) shares a's x
    with a larger y, so it sorts lexicographically BETWEEN them. The
    one-back greedy compared b only against m and left the arrangement
    non-manifold; the sliding window must still snap b onto a."""
    a = (1.0, 1.0)
    b = (1.0000000000000002, 1.0)   # next float after 1.0 in x
    m = (1.0, 2.0)
    assert a < m < b                 # the interposition premise
    pieces = [((0.0, 0.0), a), ((2.0, 0.0), b), (m, (1.0, 3.0))]
    snapped = N._snap_nodes(sorted(pieces))
    endpoints = {p for seg in snapped for p in seg}
    assert b not in endpoints        # merged away ...
    assert a in endpoints            # ... onto the smaller sibling
    assert m in endpoints            # unrelated node untouched


def test_snap_exact_nodes_pass_through():
    pieces = [((0.0, 0.0), (1.0, 1.0)), ((1.0, 1.0), (2.0, 0.0))]
    assert N._snap_nodes(sorted(pieces)) == sorted(pieces)


# --------------------------------------- 3. ST_Collect of Z members

def test_collect_homogeneous_z_points():
    out = SE._collect_array(["POINT Z (1 2 3)", "POINT Z (4 5 6)"])
    assert out == "MULTIPOINT Z (1 2 3, 4 5 6)"
    assert GT.parse_wkt(out)[1] == [(1.0, 2.0, 3.0), (4.0, 5.0, 6.0)]


def test_collect_homogeneous_z_linestrings():
    out = SE._collect_array(["LINESTRING Z (0 0 0, 1 1 1)",
                             "LINESTRING Z (2 2 2, 3 3 3)"])
    assert out.startswith("MULTILINESTRING Z")


def test_collect_mixed_dimension_still_nests():
    out = SE._collect_array(["POINT (1 2)", "POINT Z (1 2 3)"])
    assert out.startswith("GEOMETRYCOLLECTION")


def test_collect_2d_unchanged():
    assert SE._collect_array(["POINT (1 2)", "POINT (3 4)"]) \
        == "MULTIPOINT (1 2, 3 4)"

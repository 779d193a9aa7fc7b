"""kernel/noding.py (ST_Node / ST_Polygonize): arrangement laws the
GEOS Polygonizer guarantees, checked on exact-integer fixtures plus a
randomized Euler-formula property."""

import random

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial_ext as SX
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import noding as N


def test_grid_faces_and_noding():
    segs = [((x, 0), (x, 4)) for x in (0, 2, 4)] \
        + [((0, y), (4, y)) for y in (0, 2, 4)]
    pieces = N.node_segments(segs)
    assert len(pieces) == 12
    polys = N.polygonize(segs)
    assert len(polys) == 4
    assert all(abs(N._signed_area(p[0])) == 4.0 for p in polys)
    # shells come out CCW, canonical start at the smallest vertex
    for p in polys:
        assert N._signed_area(p[0]) > 0
        assert p[0][0] == min(p[0])


def test_bowtie_splits_at_crossing():
    bow = [((0, 0), (2, 2)), ((2, 2), (2, 0)),
           ((2, 0), (0, 2)), ((0, 2), (0, 0))]
    polys = N.polygonize(bow)
    assert len(polys) == 2
    assert sorted(abs(N._signed_area(p[0])) for p in polys) == [1.0, 1.0]
    # the crossing vertex was inserted exactly
    assert any((1.0, 1.0) in (a, b) for a, b in N.node_segments(bow))


def test_nested_holes_innermost():
    def square(x, y, s):
        return [((x, y), (x + s, y)), ((x + s, y), (x + s, y + s)),
                ((x + s, y + s), (x, y + s)), ((x, y + s), (x, y))]

    segs = square(0, 0, 10) + square(3, 3, 3) + square(4, 4, 1)
    polys = N.polygonize(segs)
    shapes = sorted((abs(N._signed_area(p[0])), len(p) - 1) for p in polys)
    # inner 1x1 (no holes), middle 3x3 (hole = inner), outer 10x10
    # (hole = middle ONLY — innermost assignment)
    assert shapes == [(1.0, 0), (9.0, 1), (100.0, 1)]


def test_dangles_and_cut_edges_dropped():
    bow = [((0, 0), (2, 0)), ((2, 0), (2, 2)),
           ((2, 2), (0, 2)), ((0, 2), (0, 0))]
    segs = bow + [((5, 5), (9, 9)), ((1, 1), (1, 5))]  # dangle + cut
    polys = N.polygonize(segs)
    assert len(polys) == 1
    assert abs(N._signed_area(polys[0][0])) == 4.0


def test_collinear_overlap_noding():
    segs = [((0, 0), (4, 0)), ((2, 0), (6, 0))]
    pieces = N.node_segments(segs)
    assert pieces == [(((0.0, 0.0)), (2.0, 0.0)),
                      ((2.0, 0.0), (4.0, 0.0)),
                      ((4.0, 0.0), (6.0, 0.0))]


def test_euler_formula_random_grids():
    """For a connected planar graph, V - E + F = 2 (F counts the
    unbounded face): polygonize must find exactly E - V + 1 bounded
    faces of a randomly thinned integer grid, as long as it stays
    connected and hole-free by construction (full outer frame)."""
    rng = random.Random(41)
    for _ in range(20):
        nx, ny = rng.randint(2, 5), rng.randint(2, 5)
        segs = []
        for i in range(nx + 1):
            segs.append(((2 * i, 0), (2 * i, 2 * ny)))
        for j in range(ny + 1):
            segs.append(((0, 2 * j), (2 * nx, 2 * j)))
        pieces = N.node_segments(segs)
        verts = {p for seg in pieces for p in seg}
        faces = N.polygonize(segs)
        assert len(faces) == len(pieces) - len(verts) + 1
        assert len(faces) == nx * ny


def test_udf_bodies_match_kernel():
    out = SX._node("MULTILINESTRING ((0 0, 4 0), (2 -2, 2 2))")
    assert out == ("MULTILINESTRING ((0 0, 2 0), (2 -2, 2 0),"
                   " (2 0, 2 2), (2 0, 4 0))")
    gc = SX._polygonize(
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0),"
        " LINESTRING (2 0, 2 4))")
    assert gc == ("GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 4, 0 4,"
                  " 0 0)), POLYGON ((2 0, 4 0, 4 4, 2 4, 2 0)))")
    assert SX._polygonize("POINT (1 1)") == "GEOMETRYCOLLECTION EMPTY"
    assert SX._node("POINT (1 1)") == "MULTILINESTRING EMPTY"
    # areal input contributes its ring edges (PostGIS semantics)
    assert SX._polygonize("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))") == \
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"


def test_cut_edge_bridge_removed():
    """A bridge joining nested rings is a cut edge (both directed halves
    in one face cycle): GEOS's Polygonizer deletes it before forming
    polygons. Without the removal the walk emits a self-touching shell
    with the bridge run twice; with it the component splits and hole
    assignment re-applies — outer-with-hole + inner, exactly the
    no-bridge answer."""
    def square(x, y, s):
        return [((x, y), (x + s, y)), ((x + s, y), (x + s, y + s)),
                ((x + s, y + s), (x, y + s)), ((x, y + s), (x, y))]

    segs = square(0, 0, 10) + square(3, 3, 3) + [((0, 5), (3, 5))]
    polys = N.polygonize(segs)
    shapes = sorted((abs(N._signed_area(p[0])), len(p) - 1) for p in polys)
    assert shapes == [(9.0, 0), (100.0, 1)]
    # and no ring contains a repeated vertex (simple shells only)
    for p in polys:
        for ring in p:
            assert len(ring) == len(set(ring))


def test_build_area_even_odd():
    """ST_BuildArea: donut (inner ring unfilled), diagonal dissolve (one
    square back, not two triangles), triple nest (outer-with-hole plus
    refilled center), disjoint rings, NULL for area-less input."""
    assert SX._build_area(
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0),"
        " LINESTRING (3 3, 6 3, 6 6, 3 6, 3 3))") == \
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0)," \
        " (3 3, 3 6, 6 6, 6 3, 3 3))"
    assert SX._build_area(
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0),"
        " LINESTRING (0 0, 4 4))") == \
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    assert SX._build_area(
        "GEOMETRYCOLLECTION (LINESTRING (0 0, 10 0, 10 10, 0 10, 0 0),"
        " LINESTRING (2 2, 8 2, 8 8, 2 8, 2 2),"
        " LINESTRING (4 4, 6 4, 6 6, 4 6, 4 4))") == \
        "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0)," \
        " (2 2, 2 8, 8 8, 8 2, 2 2)), ((4 4, 6 4, 6 6, 4 6, 4 4)))"
    assert SX._build_area(
        "MULTILINESTRING ((0 0, 2 0, 2 2, 0 2, 0 0),"
        " (5 0, 7 0, 7 2, 5 2, 5 0))") == \
        "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0))," \
        " ((5 0, 7 0, 7 2, 5 2, 5 0)))"
    assert SX._build_area("LINESTRING (0 0, 5 5)") is None


def test_noding_covers_every_crossing_random():
    """Property: for random integer segment soups, every pairwise
    crossing/touch point of the ORIGINAL segments appears as an endpoint
    in the noded output, and noded pieces never cross in their interiors
    (re-noding a noded set is the identity)."""
    rng = random.Random(73)
    for _ in range(25):
        segs = []
        for _k in range(rng.randint(3, 8)):
            x1, y1 = rng.randint(0, 12), rng.randint(0, 12)
            x2, y2 = rng.randint(0, 12), rng.randint(0, 12)
            if (x1, y1) != (x2, y2):
                segs.append(((x1, y1), (x2, y2)))
        if not segs:
            continue
        pieces = N.node_segments(segs)
        endpoints = {p for seg in pieces for p in seg}
        for i in range(len(segs)):
            for j in range(i + 1, len(segs)):
                for t, u in N._cuts_for_pair(
                        tuple(map(lambda p: (float(p[0]), float(p[1])),
                                  segs[i])),
                        tuple(map(lambda p: (float(p[0]), float(p[1])),
                                  segs[j]))):
                    (ax, ay), (bx, by) = segs[i]
                    px = ax + t * (bx - ax)
                    py = ay + t * (by - ay)
                    assert (px, py) in endpoints, (segs, (px, py))
        # STRUCTURAL idempotence: re-noding a noded set changes no
        # structure — same piece count, every node within the snap
        # tolerance of a first-pass node. (Strict == would require exact
        # arithmetic: re-noding recomputes crossings from the snapped
        # pieces and may pick the 1-ulp-sibling representative. Exact
        # fixtures — integer/half crossings — ARE strictly idempotent,
        # pinned by the grid/bowtie tests above.)
        again = N.node_segments(pieces)
        assert len(again) == len(pieces), (segs, again, pieces)
        nodes1 = sorted({p for s in pieces for p in s})
        nodes2 = sorted({p for s in again for p in s})
        assert len(nodes1) == len(nodes2)
        for p, q in zip(nodes1, nodes2):
            assert abs(p[0] - q[0]) <= 1e-8 and abs(p[1] - q[1]) <= 1e-8

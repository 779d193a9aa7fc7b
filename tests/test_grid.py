"""Grid/tiling surface (functions/grid.py): geometric laws of the
constructors, the hex-assignment inverse, and cross-engine agreement of
the shared SQL fragments against the Python reference implementation."""

import math
import random

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import grid as GD
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geom as G
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geomtypes as GT

SQ3 = math.sqrt(3.0)


def test_tile_envelope_laws():
    # zoom 0 = the full EPSG:3857 extent
    tg = GT.parse_wkt(GD._tile_envelope(0, 0, 0))
    xs = [p[0] for p in tg[1][0][0]]
    ys = [p[1] for p in tg[1][0][0]]
    assert min(xs) == -GD.MERC_HALF and max(xs) == GD.MERC_HALF
    assert min(ys) == -GD.MERC_HALF and max(ys) == GD.MERC_HALF
    # adjacent tiles share their boundary EXACTLY (same double)
    a = GT.parse_wkt(GD._tile_envelope(3, 2, 5))[1][0][0]
    b = GT.parse_wkt(GD._tile_envelope(3, 3, 5))[1][0][0]
    assert max(p[0] for p in a) == min(p[0] for p in b)
    # y grows SOUTH (slippy standard): tile row 0 is the top
    top = GT.parse_wkt(GD._tile_envelope(2, 0, 0))[1][0][0]
    assert max(p[1] for p in top) == GD.MERC_HALF
    # out of range -> NULL
    assert GD._tile_envelope(2, 4, 0) is None
    assert GD._tile_envelope(2, 0, -1) is None
    assert GD._tile_envelope(31, 0, 0) is None


def test_square_tiles_exactly():
    a = GT.parse_wkt(GD._square(2.5, 3, -1))[1][0][0]
    b = GT.parse_wkt(GD._square(2.5, 4, -1))[1][0][0]
    assert max(p[0] for p in a) == min(p[0] for p in b) == 10.0
    assert GD._square(0.0, 1, 1) is None


def test_hexagon_geometry():
    s = 2.0
    w = GD._hexagon(s, 3, -2)
    ring = GT.parse_wkt(w)[1][0][0]
    assert len(ring) == 6
    # all edges have length s (regular), area = 1.5*sqrt(3)*s^2
    for i in range(6):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % 6]
        assert math.hypot(x2 - x1, y2 - y1) == pytest.approx(s, rel=1e-12)
    area = abs(G._ring_signed_area(ring))
    assert area == pytest.approx(1.5 * SQ3 * s * s, rel=1e-12)
    # neighboring columns share exactly two vertices (tiling law)
    right = set(GT.parse_wkt(GD._hexagon(s, 4, -2))[1][0][0])
    assert len(set(ring) & right) == 2


def test_hex_assign_inverse_and_containment():
    rng = random.Random(17)
    for _ in range(300):
        size = rng.choice([1.0, 2.5, 6.0, 40.0])
        q = rng.randint(-30, 30)
        r = rng.randint(-30, 30)
        cx, cy = GD.hex_center(size, q, r)
        # the center assigns back to its own cell
        assert GD.hex_assign(size, cx, cy) == (q, r)
        # random interior points (strictly inside the incircle) too
        rad = size * SQ3 * 0.5 * 0.95
        ang = rng.uniform(0, 2 * math.pi)
        rr = rng.uniform(0, rad)
        px, py = cx + rr * math.cos(ang), cy + rr * math.sin(ang)
        assert GD.hex_assign(size, px, py) == (q, r), (size, q, r, px, py)


def test_hex_assign_partitions_the_plane():
    """Arbitrary points: the assigned cell must CONTAIN the point (or the
    point sits on a boundary — then it must be within the cell's
    circumradius; both engines pick the same cell bit-deterministically,
    which the oracle equality pins)."""
    rng = random.Random(23)
    size = 6.0
    for _ in range(500):
        px, py = rng.uniform(-200, 200), rng.uniform(-200, 200)
        q, r = GD.hex_assign(size, px, py)
        cx, cy = GD.hex_center(size, q, r)
        assert math.hypot(px - cx, py - cy) <= size * 1.0000001


@pytest.mark.usefixtures("spark")
def test_sql_fragments_match_python(spark):
    """The shared SQL fragments (engine selectExpr == oracle text) must
    reproduce hex_assign exactly — including on half-integer centroids
    (the fixture's (x1+x2)*0.5 shape) that sit near cell boundaries."""
    rng = random.Random(31)
    rows = [(i, rng.randint(0, 220) * 0.5, rng.randint(0, 220) * 0.5)
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, px double, py double")
    got = (
        df.selectExpr("id", "px", "py",
                      *GD.hex_assign_exprs("px", "py", "CAST(6 AS DOUBLE)"))
        .selectExpr("id", "px", "py", *GD.HEX_ROUND_EXPRS)
        .collect()
    )
    for row in got:
        assert (row["hq"], row["hr"]) == GD.hex_assign(6.0, row["px"],
                                                       row["py"]), row

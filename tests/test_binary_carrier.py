"""Binary (WKB) carrier == text (WKT) carrier, property-tested per family
(r7 verdict item 8: the perf change must not silently shift semantics).

Three layers:
  1. kernel/packed.py codec: pack/unpack round trips are byte-identical
     to geomtypes.to_wkb, and the vectorized measures equal the typed
     kernel scalar-for-scalar, over hypothesis-generated geometry.
  2. the vectorized convex round buffer equals the scalar walk
     coordinate-for-coordinate (1e-9, trig-libm ulp slack) with the same
     ring structure and vertex counts.
  3. the registered `_B` UDF surface equals the text surface through a
     live SparkSession on a mixed batch (rects, L-shapes, lines, points,
     multis, holes, Z, GC, NULLs).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import geomb as GB
from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial as S
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geom as G
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geomtypes as GT
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import packed as PK


def _random_wkts(rng: random.Random, n: int) -> list:
    out: list = []
    for pid in range(n):
        x1, y1 = rng.randint(-500, 500), rng.randint(-500, 500)
        w, h = rng.randint(1, 40), rng.randint(1, 40)
        t = pid % 10
        if t == 0:
            out.append(f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h},"
                       f" {x1} {y1+h}))")
        elif t == 1:
            out.append(f"POINT ({x1} {y1})")
        elif t == 2:
            out.append(f"LINESTRING ({x1} {y1}, {x1+w} {y1+h},"
                       f" {x1} {y1+h+3})")
        elif t == 3:
            out.append(f"MULTIPOINT ({x1} {y1}, {x1+w} {y1+h})")
        elif t == 4:
            out.append(f"MULTILINESTRING (({x1} {y1}, {x1+w} {y1}),"
                       f" ({x1} {y1+h}, {x1+w} {y1+h}))")
        elif t == 5:
            out.append(
                f"MULTIPOLYGON ((({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h},"
                f" {x1} {y1+h})), (({x1+100} {y1}, {x1+110} {y1},"
                f" {x1+110} {y1+10}, {x1+100} {y1+10})))")
        elif t == 6:
            out.append(
                f"POLYGON (({x1} {y1}, {x1+40} {y1}, {x1+40} {y1+40},"
                f" {x1} {y1+40}), ({x1+10} {y1+10}, {x1+10} {y1+20},"
                f" {x1+20} {y1+20}, {x1+20} {y1+10}))")
        elif t == 7:  # L-shape: non-convex, exercises the buffer fallback
            out.append(
                f"POLYGON (({x1} {y1}, {x1+w+10} {y1}, {x1+w+10} {y1+5},"
                f" {x1+5} {y1+5}, {x1+5} {y1+h+10}, {x1} {y1+h+10}))")
        elif t == 8:
            out.append(None)
        else:
            k = 5 + pid % 4  # regular convex k-gon
            pts = ", ".join(
                f"{x1 + 10*math.cos(2*math.pi*i/k):.6f}"
                f" {y1 + 10*math.sin(2*math.pi*i/k):.6f}"
                for i in range(k))
            out.append(f"POLYGON (({pts}))")
    out += ["POLYGON EMPTY", "POINT EMPTY", "LINESTRING EMPTY",
            "MULTIPOLYGON EMPTY", "POINT Z (1 2 3)",
            "POLYGON Z ((0 0 1, 4 0 1, 4 4 1, 0 4 1))",
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"]
    return out


@given(seed=st.integers(0, 10_000))
@settings(max_examples=20, deadline=None)
def test_prop_packed_codec_round_trips(seed):
    rng = random.Random(seed)
    wkts = _random_wkts(rng, 60)
    tg = [GT.parse_wkt(w) if w is not None else None for w in wkts]
    wkb = [GT.to_wkb(t) if t is not None else None for t in tg]
    p = PK.pack_wkb(wkb)
    assert PK.unpack_wkb(p) == wkb
    for i, w in enumerate(PK.unpack_wkt(p)):
        exp = GT.to_wkt(tg[i]) if tg[i] is not None else None
        assert w == exp
    # pack_geoms is the same batch by construction
    assert PK.unpack_wkb(PK.pack_geoms(tg)) == wkb


@given(seed=st.integers(0, 10_000))
@settings(max_examples=20, deadline=None)
def test_prop_packed_measures_equal_typed_kernel(seed):
    rng = random.Random(seed)
    wkts = _random_wkts(rng, 60)
    tg = [GT.parse_wkt(w) if w is not None else None for w in wkts]
    wkb = [GT.to_wkb(t) if t is not None else None for t in tg]
    p = PK.pack_wkb(wkb)
    ar, npt, ln = PK.area_np(p), PK.npoints_np(p), PK.length_np(p)
    for i, t in enumerate(tg):
        if t is None or p.kind[i] == -1:
            continue  # null / fallback rows are the scalar path already
        assert ar[i] == GT.area_of(t), wkts[i]
        assert npt[i] == GT.npoints(t), wkts[i]
        # np.hypot (C99 libm) vs math.hypot (CPython's compensated
        # algorithm) differ in the last ulp — lengths compare at 1e-12 rel
        exp_len = GT.length(t)
        assert abs(ln[i] - exp_len) <= 1e-12 * max(1.0, abs(exp_len)), \
            wkts[i]


@given(seed=st.integers(0, 10_000))
@settings(max_examples=15, deadline=None)
def test_prop_vectorized_buffer_equals_scalar_walk(seed):
    rng = random.Random(seed)
    wkts = [w for w in _random_wkts(rng, 80) if w is not None]
    ds = [(1 + i % 5) / 4.0 for i in range(len(wkts))]
    tg = [GT.parse_wkt(w) for w in wkts]
    wkb = [GT.to_wkb(t) for t in tg]
    p = PK.pack_wkb(wkb)
    fast, coords, off = PK.buffer_round_np(p, np.asarray(ds), 8)
    fi = 0
    n_fast = 0
    for i in np.flatnonzero(fast):
        exp = G.parse_wkt(S._buffer_round(wkts[i], ds[i], 8))
        assert len(exp) == 1 and len(exp[0]) == 1
        er = np.asarray(exp[0][0])
        got = coords[off[fi]:off[fi + 1]]
        assert er.shape == got.shape, wkts[i]
        assert np.abs(er - got).max() < 1e-9, wkts[i]
        fi += 1
        n_fast += 1
    # the generator always yields convex candidates — the fast path must
    # actually engage (guards against a silently-always-fallback build)
    assert n_fast > 0


@given(seed=st.integers(0, 10_000))
@settings(max_examples=10, deadline=None)
def test_prop_packed_transform_equals_scalar(seed):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import transform as T

    rng = random.Random(seed)
    # metre-scale rects in the 3857 domain
    wkts = []
    for _ in range(30):
        x1 = rng.uniform(-2e6, 2e6)
        y1 = rng.uniform(-2e6, 2e6)
        wkts.append(f"POLYGON (({x1} {y1}, {x1+50} {y1}, {x1+50} {y1+30},"
                    f" {x1} {y1+30}))")
    tg = [GT.parse_wkt(w) for w in wkts]
    p = PK.pack_wkb([GT.to_wkb(t) for t in tg])
    q = PK.transform_np(p, "EPSG:3857", "EPSG:5880")
    for i, t in enumerate(tg):
        exp = GT.map_coords(
            t, lambda x, y: T.transform_point(x, y, "EPSG:3857",
                                              "EPSG:5880"))
        got = PK.row_tgeom(q, i)
        ea = np.asarray(GT.points_of(exp))
        ga = np.asarray(GT.points_of(got))
        assert np.abs(ea - ga).max() < 1e-6


def test_geomfromwkt_b_rect_fast_path_matches_scalar():
    fn = GB.st_geomfromwkt_b.func
    import pandas as pd

    rows = [
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",      # closed integer rect
        "POLYGON ((0 0, 4 0, 4 4, 0 4))",           # open integer rect
        "POLYGON ((-52.35 -11.16, -52.34 -11.16, -52.34 -11.15,"
        " -52.35 -11.15))",                          # float rect (concat)
        "POLYGON ((4 0, 0 0, 0 4, 4 4))",           # CW -> slow path
        "POINT (3 7)",
        "LINESTRING (0 0, 5 5)",
        None,
        "POLYGON ((0 0, 10 0, 10 2, 2 2, 2 10, 0 10))",  # L-shape
        "POLYGON Z ((0 0 1, 4 0 1, 4 4 1, 0 4 1))",
    ]
    got = fn(pd.Series(rows)).tolist()
    exp = [GB._geom_from_wkt_b_scalar(s) for s in rows]
    for g, e, s in zip(got, exp, rows):
        assert g == e, s


@pytest.mark.usefixtures("spark")
def test_binary_surface_equals_text_surface(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rng = random.Random(404)
    wkts = _random_wkts(rng, 40)
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wkts)], "id int, g string")
    df.createOrReplaceTempView("bin_vs_text")
    rows = spark.sql("""
      SELECT id,
             ST_AsText_B(ST_GeomFromWKT_B(g)) AS rt_b,
             ST_AsText(ST_GeomFromWKT(g)) AS rt_t,
             ST_Area_B(ST_GeomFromWKT_B(g)) AS area_b,
             ST_Area(ST_GeomFromWKT(g)) AS area_t,
             ST_NPoints_B(ST_GeomFromWKT_B(g)) AS np_b,
             ST_NPoints(ST_GeomFromWKT(g)) AS np_t,
             ST_Length_B(ST_GeomFromWKT_B(g)) AS len_b,
             ST_Length(ST_GeomFromWKT(g)) AS len_t,
             ST_Area_B(ST_BufferRound_B(ST_GeomFromWKT_B(g),
                 1 + id % 3, 8)) AS buf_b,
             ST_Area(ST_BufferRound(ST_GeomFromWKT(g),
                 1 + id % 3, 8)) AS buf_t
      FROM bin_vs_text ORDER BY id
    """).collect()
    for r in rows:
        assert r["rt_b"] == r["rt_t"], r
        for pair in (("area_b", "area_t"), ("len_b", "len_t")):
            a, b = r[pair[0]], r[pair[1]]
            assert (a is None) == (b is None), r
            if a is not None and a == a and b == b:
                assert abs(a - b) < 1e-9, r
        assert r["np_b"] == r["np_t"], r
        a, b = r["buf_b"], r["buf_t"]
        assert (a is None) == (b is None), r
        if a is not None:
            assert abs(a - b) < 1e-6 * max(1.0, abs(b)), r


@pytest.mark.usefixtures("spark")
def test_binary_shape_ops_equal_text_surface(spark):
    """r8 late widening: ST_Centroid_B / ST_Envelope_B / ST_X_B / ST_Y_B
    == their text twins over the mixed corpus (GEOMETRYCOLLECTION rows
    excluded — ST_Centroid raises on GC on BOTH surfaces)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rng = random.Random(71)
    wkts = [w for w in _random_wkts(rng, 40)
            if w is None or not w.startswith("GEOMETRYCOLLECTION")]
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(wkts)], "id int, g string")
    df.createOrReplaceTempView("bin_shape")
    rows = spark.sql("""
      SELECT id,
             ST_AsText_B(ST_Centroid_B(ST_GeomFromWKT_B(g))) AS c_b,
             ST_Centroid(ST_GeomFromWKT(g)) AS c_t,
             ST_AsText_B(ST_Envelope_B(ST_GeomFromWKT_B(g))) AS e_b,
             ST_Envelope(ST_GeomFromWKT(g)) AS e_t,
             ST_X_B(ST_Centroid_B(ST_GeomFromWKT_B(g))) AS x_b,
             ST_X(ST_Centroid(ST_GeomFromWKT(g))) AS x_t,
             ST_Y_B(ST_Centroid_B(ST_GeomFromWKT_B(g))) AS y_b,
             ST_Y(ST_Centroid(ST_GeomFromWKT(g))) AS y_t
      FROM bin_shape ORDER BY id
    """).collect()
    n_checked = 0
    for r in rows:
        assert (r["c_b"] is None) == (r["c_t"] is None), r
        if r["c_b"] is not None:
            ga = np.asarray(GT.points_of(GT.parse_wkt(r["c_b"])))
            gb = np.asarray(GT.points_of(GT.parse_wkt(r["c_t"])))
            # text areal centroid formats through %.10g — compare at the
            # 10-significant-digit precision it guarantees
            assert np.abs(ga - gb).max() <= 1e-8 * max(
                1.0, np.abs(gb).max()), r
            n_checked += 1
        assert (r["e_b"] is None) == (r["e_t"] is None), r
        if r["e_b"] is not None:
            assert r["e_b"] == r["e_t"], r
        for a, t in (("x_b", "x_t"), ("y_b", "y_t")):
            va, vt = r[a], r[t]
            if va is None or va != va:
                assert vt is None or vt != vt, r
            else:
                assert abs(va - vt) <= 1e-8 * max(1.0, abs(vt)), r
    assert n_checked > 10


@pytest.mark.usefixtures("spark")
def test_binary_transform_chain_equals_text(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rng = random.Random(17)
    rows = []
    for i in range(40):
        x1 = rng.uniform(-2e6, 2e6)
        y1 = rng.uniform(-2e6, 2e6)
        rows.append((i, f"POLYGON (({x1} {y1}, {x1+50} {y1},"
                        f" {x1+50} {y1+30}, {x1} {y1+30}))"))
    df = spark.createDataFrame(rows, "id int, g string")
    df.createOrReplaceTempView("bin_tf")
    out = spark.sql("""
      SELECT id,
             ST_AsText_B(ST_Transform_B(ST_GeomFromWKT_B(g),
                 'EPSG:3857', 'EPSG:5880')) AS t_b,
             ST_Transform(g, 'EPSG:3857', 'EPSG:5880') AS t_t
      FROM bin_tf ORDER BY id
    """).collect()
    for r in out:
        ga = np.asarray(GT.points_of(GT.parse_wkt(r["t_b"])))
        gb = np.asarray(GT.points_of(GT.parse_wkt(r["t_t"])))
        assert np.abs(ga - gb).max() < 1e-6, r["id"]


def test_fused_struct_udfs_equal_composition(spark):
    """r13 (optimization round): the fused struct UDFs
    (ST_BufferRoundStats_B, ST_TransformRoundtripStats_B,
    ST_TransformFwdRtCoords_B) must equal the unfused compositions
    value-for-value on rects, a non-rect slow-path polygon, and NULL —
    and each fused query plan must carry exactly ONE ArrowEvalPython
    node (the whole point of the fusion)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rows = [
        (0, "POLYGON ((10 10, 60 10, 60 40, 10 40))"),          # rect lane
        (1, "POLYGON ((0 0, 40 0, 40 20, 20 20, 20 40, 0 40))"),  # L-shape
        (2, None),                                              # NULL row
        (3, "POLYGON ((5 5, 9 5, 9 9, 5 9, 5 5))"),             # closed rect
    ]
    df = spark.createDataFrame(rows, "id int, g string")
    df.createOrReplaceTempView("fused_par")
    fused = spark.sql("""
      SELECT id,
             ST_BufferRoundStats_B(g, 0.5, 8) AS bs,
             ST_TransformRoundtripStats_B(g, 'EPSG:3857', 'EPSG:5880') AS ts,
             ST_TransformFwdRtCoords_B(g, 'EPSG:3857', 'EPSG:5880') AS fc
      FROM fused_par ORDER BY id""").collect()
    comp = spark.sql("""
      SELECT id,
             ST_Area_B(ST_BufferRound_B(ST_GeomFromWKT_B(g), 0.5, 8)) AS b_area,
             ST_NPoints_B(ST_BufferRound_B(ST_GeomFromWKT_B(g), 0.5, 8)) AS b_np,
             ST_Area_B(ST_Transform_B(ST_Transform_B(ST_GeomFromWKT_B(g),
                 'EPSG:3857', 'EPSG:5880'), 'EPSG:5880', 'EPSG:3857')) AS t_area,
             ST_NPoints_B(ST_Transform_B(ST_Transform_B(ST_GeomFromWKT_B(g),
                 'EPSG:3857', 'EPSG:5880'), 'EPSG:5880', 'EPSG:3857')) AS t_np,
             ST_Coords_B(ST_Transform_B(ST_GeomFromWKT_B(g),
                 'EPSG:3857', 'EPSG:5880')) AS fwd,
             ST_Coords_B(ST_Transform_B(ST_Transform_B(ST_GeomFromWKT_B(g),
                 'EPSG:3857', 'EPSG:5880'), 'EPSG:5880', 'EPSG:3857')) AS rt
      FROM fused_par ORDER BY id""").collect()
    for f, c in zip(fused, comp):
        assert f["bs"]["area"] == c["b_area"], f["id"]
        assert f["bs"]["npts"] == c["b_np"], f["id"]
        assert f["ts"]["area"] == c["t_area"], f["id"]
        assert f["ts"]["npts"] == c["t_np"], f["id"]
        assert f["fc"]["fwd"] == c["fwd"], f["id"]
        assert f["fc"]["rt"] == c["rt"], f["id"]
    # plan shape: the three fused headline queries run ONE Python node
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import pipeline as P
    for fn in (P.st_buffer_round, P.st_transform_roundtrip,
               P.st_transform_utm):
        plan = fn(spark, "/root/testdata/sf0.001") \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, (fn.__name__, plan[:800])


@given(seed=st.integers(0, 100_000))
@settings(max_examples=50, deadline=None)
def test_prop_typed_parse_fast_path_equals_general(seed):
    """r8 parse fast path: canonical POINT/LINESTRING/MULTIPOINT text
    must parse identically through the tight split/float path and the
    general parser. Injecting a double space after the tag word defeats
    the fast path's exact-prefix match WITHOUT changing WKT semantics,
    so the same string parses through both code paths."""
    rng = random.Random(seed)
    nums = [round(rng.uniform(-1e6, 1e6), rng.randint(0, 12))
            for _ in range(6)]
    for tmpl, tag in (
        ("POINT ({} {})", "POINT"),
        ("LINESTRING ({} {}, {} {}, {} {})", "LINESTRING"),
        ("MULTIPOINT ({} {}, {} {})", "MULTIPOINT"),
        # r9: canonical single-ring POLYGON fast path — both the closed
        # (explicit repeat of the first vertex, to_wkt's shape) and the
        # unclosed spelling must match the general parser
        ("POLYGON (({0} {1}, {2} {3}, {4} {5}, {0} {1}))", "POLYGON"),
        ("POLYGON (({0} {1}, {2} {3}, {4} {5}))", "POLYGON"),
    ):
        w = tmpl.format(*nums)
        fast = GT.parse_wkt(w)
        slow = GT.parse_wkt(w.replace(tag + " (", tag + "  (", 1))
        assert fast == slow, w
        # and the canonical round trip is a fixed point either way
        assert GT.parse_wkt(GT.to_wkt(fast)) == fast, w
    # holed / Z / mid-paren polygons must FALL BACK (the fast path only
    # accepts what the general parser parses identically): parse equality
    # against the defeated-prefix spelling pins the fallback routing
    holed = ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
             " (2 2, 3 2, 3 3, 2 3, 2 2))")
    assert GT.parse_wkt(holed) == GT.parse_wkt(
        holed.replace("POLYGON (", "POLYGON  (", 1))
    zpoly = "POLYGON ((0 0 1, 10 0 1, 10 10 1, 0 0 1))"
    assert GT.parse_wkt(zpoly) == GT.parse_wkt(
        zpoly.replace("POLYGON (", "POLYGON  (", 1))


@pytest.mark.usefixtures("spark")
def test_binary_predicates_equal_text_surface(spark):
    """r8 late widening: the DE-9IM `_B` family == the text family over
    mixed rect / L-shape / point pairs (rect×rect rides the vectorized
    interval law off packed bounds; everything else the shared scalar
    kernel)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rng = random.Random(29)
    rows = []
    for i in range(120):
        x1, y1 = rng.randint(0, 50), rng.randint(0, 50)
        w, h = rng.randint(1, 20), rng.randint(1, 20)
        a = (f"POLYGON (({x1} {y1}, {x1+w} {y1}, {x1+w} {y1+h},"
             f" {x1} {y1+h}, {x1} {y1}))")
        if i % 7 == 0:
            a = f"POINT ({x1} {y1})"
        elif i % 11 == 0:
            a = (f"POLYGON (({x1} {y1}, {x1+w+10} {y1}, {x1+w+10} {y1+5},"
                 f" {x1+5} {y1+5}, {x1+5} {y1+h+10}, {x1} {y1+h+10}))")
        x2, y2 = rng.randint(0, 50), rng.randint(0, 50)
        w2, h2 = rng.randint(1, 20), rng.randint(1, 20)
        b = (f"POLYGON (({x2} {y2}, {x2+w2} {y2}, {x2+w2} {y2+h2},"
             f" {x2} {y2+h2}, {x2} {y2}))")
        rows.append((i, a, b))
    spark.createDataFrame(rows, "id int, a string, b string") \
        .createOrReplaceTempView("bin_pred")
    res = spark.sql("""
      SELECT id,
        ST_Intersects_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS i_b,
        ST_Intersects(a, b) AS i_t,
        ST_Disjoint_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS d_b,
        ST_Disjoint(a, b) AS d_t,
        ST_Touches_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS t_b,
        ST_Touches(a, b) AS t_t,
        ST_Overlaps_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS o_b,
        ST_Overlaps(a, b) AS o_t,
        ST_Contains_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS c_b,
        ST_Contains(a, b) AS c_t,
        ST_Within_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS w_b,
        ST_Within(a, b) AS w_t,
        ST_Crosses_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS x_b,
        ST_Crosses(a, b) AS x_t,
        ST_Equals_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(a)) AS e_b,
        ST_Distance_B(ST_GeomFromWKT_B(a), ST_GeomFromWKT_B(b)) AS dist_b,
        ST_Distance(a, b) AS dist_t
      FROM bin_pred ORDER BY id
    """).collect()
    for r in res:
        for p in ("i", "d", "t", "o", "c", "w", "x"):
            assert r[f"{p}_b"] == r[f"{p}_t"], (r["id"], p)
        assert r["e_b"] is True
        assert abs(r["dist_b"] - r["dist_t"]) <= 1e-9 * max(
            1.0, abs(r["dist_t"])), r["id"]


def test_packed_big_endian_fallback_rows():
    """Big-endian WKB rows become opaque fallback rows: unpack returns
    the ORIGINAL bytes verbatim, and the `_B` measure/transform UDFs
    route them through the scalar kernels (GT.parse_wkb reads either
    byte order)."""
    import struct as _s

    import pandas as pd

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import geomb as GB

    # big-endian POINT (3, 4)
    be_pt = b"\x00" + _s.pack(">I", 1) + _s.pack(">2d", 3.0, 4.0)
    # big-endian closed rect POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))
    ring = [(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)]
    be_poly = (b"\x00" + _s.pack(">I", 3) + _s.pack(">I", 1)
               + _s.pack(">I", 5)
               + b"".join(_s.pack(">2d", float(x), float(y))
                          for x, y in ring))
    le_poly = GT.to_wkb(GT.parse_wkb(be_poly))

    p = PK.pack_wkb([be_pt, be_poly, le_poly, None])
    assert int(p.kind[0]) == -1 and int(p.kind[1]) == -1
    assert int(p.kind[2]) == 3 and int(p.kind[3]) == 0
    rt = PK.unpack_wkb(p)
    assert rt[0] == be_pt and rt[1] == be_poly and rt[2] == le_poly
    assert rt[3] is None

    s = pd.Series([be_pt, be_poly, le_poly, None])
    ar = GB.st_area_b.func(s)
    assert ar.iloc[0] == 0.0 and ar.iloc[1] == 12.0 and ar.iloc[2] == 12.0
    npt = GB.st_npoints_b.func(s)
    assert npt.iloc[0] == 1 and npt.iloc[1] == 5 and npt.iloc[2] == 5
    # transform routes fallbacks through the scalar path and re-emits LE
    tr = GB.st_transform_b.func(
        s, pd.Series(["EPSG:3857"] * 4), pd.Series(["EPSG:3857"] * 4))
    for i in (0, 1, 2):
        tg = GT.parse_wkb(bytes(tr.iloc[i]))
        assert tg[0] in ("POINT", "POLYGON")
    wkt = GB.st_astext_b.func(s)
    assert wkt.iloc[0] == "POINT (3 4)"
    assert wkt.iloc[1] == wkt.iloc[2]


def test_packed_z_and_gc_fallback_through_b_surface():
    """Z and GEOMETRYCOLLECTION WKB rows ride the fallback lane through
    the binary measures with the same conventions as the text surface
    (strip_z areas, GC sums)."""
    import pandas as pd

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import geomb as GB

    z_poly = GT.to_wkb(GT.parse_wkt(
        "POLYGON Z ((0 0 1, 4 0 1, 4 3 1, 0 3 1))"))
    gc = GT.to_wkb(GT.parse_wkt(
        "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)),"
        " POINT (9 9))"))
    s = pd.Series([z_poly, gc])
    ar = GB.st_area_b.func(s)
    assert ar.iloc[0] == 12.0 and ar.iloc[1] == 4.0
    npt = GB.st_npoints_b.func(s)
    assert npt.iloc[0] == 5 and npt.iloc[1] == 6

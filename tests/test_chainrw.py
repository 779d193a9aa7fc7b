"""Chain rewriter (r8 verdict item 1) + ragged packed codec (item 2).

Layer 1: `chainrw.rewrite` string-level unit tests — chains of >= 2
twin-covered calls move to the `_B` carrier, lone calls and hygiene-only
chains stay on text, non-ST_ tokens (strings, identifiers, keywords,
arithmetic) are copied verbatim, and the kill switch restores identity.

Layer 2: `kernel/packed._pack_ragged` / `_emit_ragged` engagement tests —
single-kind variable-shape batches must take the vectorized lane (not
silently fall back to the per-row loop) and round-trip byte-identical to
geomtypes.to_wkb; anomalous batches (mixed kinds, big-endian, Z, trailing
bytes) must bail to the strict loop and still round-trip.

Layer 3: Spark parity — the SAME query text through `select_st` (rewritten)
and through plain `selectExpr` (text path) returns identical rows, on the
reference's own chain spelling (spark_job/process_geodata.py:120-139).
"""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import chainrw as CR
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import geomtypes as GT
from geospatial_data_pipeline_spark_sedona_on_aws_spark.kernel import packed as PK


# ------------------------------------------------------------- layer 1

def test_rewrite_simple_chain_moves_to_carrier():
    got = CR.rewrite("ST_Area(ST_GeomFromWKT(wkt)) AS a")
    assert got == "ST_Area_B(ST_GeomFromWKT_B(wkt)) AS a"


def test_rewrite_geometry_output_gets_text_edge():
    got = CR.rewrite("ST_BufferRound(ST_GeomFromWKT(w), 0.5, 8) AS g")
    # geometry surfacing to the user comes back as canonical WKT
    assert got == ("ST_AsText_B(ST_BufferRound_B(ST_GeomFromWKT_B(w),"
                   " 0.5, 8)) AS g")


def test_rewrite_three_deep_chain_single_parse_edge():
    got = CR.rewrite(
        "ST_Area(ST_Transform(ST_GeomFromWKT(w), 'EPSG:4326', 'EPSG:3857'))")
    assert got == ("ST_Area_B(ST_Transform_B(ST_GeomFromWKT_B(w), "
                   "'EPSG:4326', 'EPSG:3857'))")


def test_rewrite_lone_call_left_on_text_path():
    # a single un-chained call: rewriting would ADD a WKB hop
    for expr in ("ST_Area(geom_col)", "ST_GeomFromWKT(wkt) AS g",
                 "ST_AsText(g) AS t"):
        assert CR.rewrite(expr) == expr


def test_rewrite_hygiene_only_chain_left_on_text_path():
    # parse -> serialize round trip with no compute op in between: the
    # text twins are near-identity on canonical input, cheaper than any
    # carrier round trip
    e = "ST_AsText(ST_GeomFromWKT(wkt_pt)) AS pt_rt"
    assert CR.rewrite(e) == e


def test_rewrite_compute_inside_hygiene_chain_rewrites():
    got = CR.rewrite("ST_AsText(ST_Centroid(ST_GeomFromWKT(w))) AS c")
    assert got == "ST_AsText_B(ST_Centroid_B(ST_GeomFromWKT_B(w))) AS c"


def test_rewrite_binary_predicate_both_edges():
    got = CR.rewrite(
        "ST_Intersects(ST_GeomFromWKT(a), ST_GeomFromWKT(b)) AS hit")
    assert got == ("ST_Intersects_B(ST_GeomFromWKT_B(a), "
                   "ST_GeomFromWKT_B(b)) AS hit")


def test_rewrite_mixed_edges_one_parsed_one_raw():
    # only one geometry arg is itself a producer; the other parses once
    # at the edge
    got = CR.rewrite("ST_Distance(ST_Centroid(ST_GeomFromWKT(a)), "
                     "ST_GeomFromWKT(b))")
    assert got == ("ST_Distance_B(ST_Centroid_B(ST_GeomFromWKT_B(a)), "
                   "ST_GeomFromWKT_B(b))")


def test_rewrite_preserves_non_st_tokens_verbatim():
    e = ("CASE WHEN upper(name) = 'ST_FAKE(X)' THEN round("
         "ST_Area(ST_GeomFromWKT(w)) * 100, 2) ELSE length('a,b((') END"
         " AS v")
    got = CR.rewrite(e)
    # the string literals and every non-ST_ token survive untouched
    assert "'ST_FAKE(X)'" in got
    assert "'a,b(('" in got
    assert got.replace(
        "ST_Area_B(ST_GeomFromWKT_B(w))",
        "ST_Area(ST_GeomFromWKT(w))") == e


def test_rewrite_unknown_st_name_blocks_that_node_but_not_args():
    # ST_ConvexHull has no _B twin: it stays text, but the chain INSIDE
    # its argument still rewrites independently
    got = CR.rewrite("ST_ConvexHull(ST_GeomFromWKT(w))")
    assert got == "ST_ConvexHull(ST_GeomFromWKT(w))"
    got2 = CR.rewrite("ST_NPoints(ST_ConvexHull(ST_GeomFromWKT(w)))")
    assert got2 == "ST_NPoints(ST_ConvexHull(ST_GeomFromWKT(w)))"


def test_rewrite_kill_switch(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_NO_CHAINRW", "1")
    e = "ST_Area(ST_GeomFromWKT(wkt)) AS a"
    assert CR.rewrite(e) == e


def test_rewrite_case_insensitive_names():
    got = CR.rewrite("st_area(st_geomfromwkt(wkt)) AS a")
    assert got == "ST_Area_B(ST_GeomFromWKT_B(wkt)) AS a"


# ------------------------------------------------------------- layer 2

def _wkb(w: str) -> bytes:
    return GT.to_wkb(GT.parse_wkt(w))


def _codec_case(rng: random.Random, kind: str) -> str:
    x, y = rng.randint(-300, 300), rng.randint(-300, 300)
    if kind == "POINT":
        return f"POINT ({x} {y})"
    if kind == "LINESTRING":
        n = rng.randint(2, 9)
        pts = ", ".join(f"{x+i} {y+i*i%7}" for i in range(n))
        return f"LINESTRING ({pts})"
    if kind == "MULTIPOINT":
        n = rng.randint(1, 6)
        pts = ", ".join(f"{x+i} {y-i}" for i in range(n))
        return f"MULTIPOINT ({pts})"
    if kind == "MULTILINESTRING":
        parts = []
        for j in range(rng.randint(1, 4)):
            n = rng.randint(2, 5)
            parts.append("(" + ", ".join(
                f"{x+i+10*j} {y+i}" for i in range(n)) + ")")
        return f"MULTILINESTRING ({', '.join(parts)})"
    # POLYGON with 1-3 rings, varying vertex counts
    w, h = rng.randint(20, 60), rng.randint(20, 60)
    rings = [f"({x} {y}, {x+w} {y}, {x+w} {y+h}, {x} {y+h}, {x} {y})"]
    for j in range(rng.randint(0, 2)):
        hx, hy = x + 2 + 5 * j, y + 2
        rings.append(f"({hx} {hy}, {hx} {hy+3}, {hx+3} {hy+3},"
                     f" {hx+3} {hy})")
    return f"POLYGON ({', '.join(rings)})"


@pytest.mark.parametrize("kind", ["POINT", "LINESTRING", "MULTIPOINT",
                                  "MULTILINESTRING", "POLYGON"])
def test_ragged_lane_engages_and_round_trips(kind):
    rng = random.Random(hash(kind) & 0xFFFF)
    wkts = [_codec_case(rng, kind) for _ in range(50)]
    wkts[7] = None
    wkts[23] = None
    wkb = [None if w is None else _wkb(w) for w in wkts]
    # the vectorized lane must ENGAGE on a single-kind ragged batch
    ragged = PK._pack_ragged(wkb)
    assert ragged is not None, f"{kind}: ragged decode did not engage"
    # ... and what pack_wkb returns must round-trip byte-identically
    p = PK.pack_wkb(wkb)
    assert PK.unpack_wkb(p) == wkb
    # the vectorized encoder must also engage and agree
    emitted = PK._emit_ragged(p)
    assert emitted is not None, f"{kind}: ragged encode did not engage"
    assert emitted == wkb


def test_ragged_lane_polygon_closing_dup_and_open_rings():
    # WKT parser accepts open rings; to_wkb closes them — both spellings
    # of the same rect must decode to the same packed rows
    a = _wkb("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    b = _wkb("POLYGON ((0 0, 4 0, 4 4, 0 4))")
    assert a == b
    p = PK._pack_ragged([a, a, b])
    assert p is not None
    assert (p.ring_len() == 4).all()
    assert PK.unpack_wkb(p) == [a, a, b]


def test_ragged_lane_with_empties():
    wkb = [_wkb("LINESTRING (0 0, 3 4)"), _wkb("LINESTRING EMPTY"),
           None, _wkb("LINESTRING (1 1, 2 2, 3 3)")]
    p = PK._pack_ragged(wkb)
    assert p is not None
    assert PK.unpack_wkb(p) == wkb
    assert PK._emit_ragged(p) == wkb


def test_ragged_lane_bails_on_anomalies():
    ls = _wkb("LINESTRING (0 0, 3 4)")
    pt = _wkb("POINT (1 2)")
    # mixed kinds
    assert PK._pack_ragged([ls, pt]) is None
    # big-endian byte
    assert PK._pack_ragged([b"\x00" + ls[1:]]) is None
    # Z coordinates (code 1002 / 0x80000001 style both differ from 1..5)
    z = GT.to_wkb(GT.parse_wkt("POINT Z (1 2 3)"))
    assert PK._pack_ragged([z]) is None
    # trailing garbage bytes
    assert PK._pack_ragged([ls + b"\x00"]) is None
    # truncated payload
    assert PK._pack_ragged([ls[:-8]]) is None
    # ... and the full codec still handles each via the strict path
    mixed = [ls, pt, z, None]
    assert PK.unpack_wkb(PK.pack_wkb(mixed)) == mixed


def test_ragged_lane_multipoint_member_headers():
    w = _wkb("MULTIPOINT (1 2, 3 4, 5 6)")
    p = PK._pack_ragged([w])
    assert p is not None
    out = PK._emit_ragged(p)[0]
    # member headers present every 21 bytes after the 9-byte row header
    assert out == w
    assert out[9] == 1 and struct.unpack("<I", out[10:14])[0] == 1


def test_ragged_multipoint_empty_member_drops():
    # POINT EMPTY members (NaN NaN) are dropped by the packed decode,
    # matching the typed kernel's canonicalization
    raw = struct.pack("<bI", 1, 4) + struct.pack("<I", 2)
    raw += struct.pack("<bI2d", 1, 1, 1.0, 2.0)
    raw += struct.pack("<bI2d", 1, 1, float("nan"), float("nan"))
    p = PK._pack_ragged([raw])
    assert p is not None
    assert int(p.ring_len()[0]) == 1
    assert np.allclose(p.coords, [[1.0, 2.0]])


# ------------------------------------------------------------- layer 3

@pytest.mark.usefixtures("spark")
def test_select_st_equals_text_path_on_reference_chain(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions,
    )

    register_spatial_functions(spark)
    rng = random.Random(99)
    rows = []
    for i in range(400):
        x, y = rng.randint(-50, 50), rng.randint(-50, 50)
        w, h = rng.randint(1, 9), rng.randint(1, 9)
        rows.append((i, f"POLYGON (({x} {y}, {x+w} {y}, {x+w} {y+h},"
                        f" {x} {y+h}))",
                     f"LINESTRING ({x} {y}, {x+w} {y+h}, {x} {y+h})"))
    rows.append((len(rows), None, None))
    rows.append((len(rows), "POLYGON Z ((0 0 1, 4 0 1, 4 4 1, 0 4 1))",
                 "GEOMETRYCOLLECTION (POINT (1 2))"))
    df = spark.createDataFrame(rows, "id long, wkt string, lwkt string")
    exprs = [
        "id",
        "ST_AsText(ST_GeomFromWKT(wkt)) AS rt",
        "ST_Area(ST_BufferRound(ST_GeomFromWKT(wkt), 0.5, 8))"
        " AS buf_area",
        "ST_NPoints(ST_BufferRound(ST_GeomFromWKT(wkt), 0.5, 8))"
        " AS buf_np",
        "ST_AsText(ST_Centroid(ST_GeomFromWKT(wkt))) AS ctr",
        "ST_AsText(ST_Envelope(ST_GeomFromWKT(lwkt))) AS env",
        "ST_Length(ST_GeomFromWKT(lwkt)) AS ln",
        "ST_Distance(ST_Centroid(ST_GeomFromWKT(wkt)),"
        " ST_GeomFromWKT(lwkt)) AS d",
        "ST_Intersects(ST_Envelope(ST_GeomFromWKT(wkt)),"
        " ST_GeomFromWKT(lwkt)) AS hit",
    ]
    # guard: the rewriter actually fires on these (not a silent no-op)
    assert any("_B(" in CR.rewrite(e) for e in exprs)
    got = CR.select_st(df, *exprs).orderBy("id").collect()
    exp = df.selectExpr(*exprs).orderBy("id").collect()
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        for k in g.asDict():
            gv, ev = g[k], e[k]
            if isinstance(gv, float) and isinstance(ev, float):
                assert abs(gv - ev) <= 1e-9 * max(1.0, abs(ev)), (k, g, e)
            else:
                assert gv == ev, (k, g, e)


# ---------------------------------------- ST_Union_Aggr auto-salt (r9)

def test_salt_rewrite_canonical_shapes():
    f = CR.salt_union_aggr_sql
    got = f("SELECT region_id, ST_Union_Aggr(g) AS u FROM t GROUP BY region_id")
    assert "pmod(xxhash64(g), 16)" in got
    assert got.count("ST_Union_Aggr") == 2          # partial + final
    # nested-in-expression aggregate rewrites too
    got2 = f("SELECT region_id % 4 AS rk, CAST(round(ST_Area("
             "ST_Union_Aggr(g))) AS BIGINT) AS a FROM t GROUP BY region_id % 4")
    assert "ST_Union_Aggr(__ua_p0)" in got2 and "GROUP BY rk" in got2
    # two aggregates over the SAME arg share one partial
    got3 = f("SELECT k, ST_Area(ST_Union_Aggr(g)) AS a, "
             "ST_NPoints(ST_Union_Aggr(g)) AS n FROM t GROUP BY k")
    assert got3.count("AS __ua_p0") == 1 and "__ua_p1" not in got3


def test_salt_rewrite_bails_on_unrecognized_shapes(monkeypatch):
    f = CR.salt_union_aggr_sql
    keep = [
        # mixed with another aggregate: the split is not union-shaped
        "SELECT k, count(*) AS n, ST_Union_Aggr(g) AS u FROM t GROUP BY k",
        # HAVING / ORDER BY / LIMIT / DISTINCT / WITH at depth 0
        "SELECT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k HAVING k > 1",
        "SELECT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k ORDER BY k",
        "SELECT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k LIMIT 5",
        "SELECT DISTINCT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k",
        "WITH x AS (SELECT 1) SELECT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k",
        # no GROUP BY at all
        "SELECT ST_Union_Aggr(g) AS u FROM t",
        # aggregate without an alias
        "SELECT k, ST_Union_Aggr(g) FROM t GROUP BY k",
        # plain statement without the name
        "SELECT k, count(*) AS n FROM t GROUP BY k",
    ]
    for s in keep:
        assert f(s) == s, s
    monkeypatch.setenv("SPARK_GRAFT_NO_UNION_AGGR_SALT", "1")
    s = "SELECT k, ST_Union_Aggr(g) AS u FROM t GROUP BY k"
    assert f(s) == s


@pytest.mark.usefixtures("spark")
def test_registered_union_aggr_hot_key_fans_out(spark):
    """The plain SQL spelling through the engine's SQL door executes as
    the salted two-phase plan: a hot key's rows split across 16 salt
    groups in phase 1 (two AggregateInPandas stages, the first exchange
    hash-partitioned on (k, pmod(xxhash64(g), 16))), and the result is
    IDENTICAL to the unsalted single-phase aggregate."""
    rows = []
    for i in range(3000):                 # one hot key...
        x, y = (i % 60) * 2, (i // 60) * 2
        rows.append((1, f"POLYGON (({x} {y}, {x+1} {y}, {x+1} {y+1},"
                        f" {x} {y+1}))"))
    for i in range(40):                   # ...and a few cold ones
        x = i * 3
        rows.append((2 + i % 3, f"POLYGON (({x} 500, {x+2} 500,"
                                f" {x+2} 502, {x} 502))"))
    spark.createDataFrame(rows, "k long, g string") \
        .createOrReplaceTempView("ua_hot")
    q = "SELECT k, ST_Union_Aggr(g) AS u FROM ua_hot GROUP BY k"
    salted = CR.sql_st(spark, q)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    n_agg = (plan.count("ArrowAggregatePython")       # Spark 4.x name
             + plan.count("AggregateInPandas"))       # 3.x name
    assert n_agg >= 2, plan
    assert "pmod" in plan and "xxhash64" in plan
    got = sorted(map(tuple, salted.collect()))
    exact = sorted(map(tuple, spark.sql(q).collect()))
    assert got == exact


def test_box_predicate_boundary_parity_binary_equals_text():
    """Covers-semantics pin for the r9 box lanes (point boxes join the
    vectorized interval law): points ON rect boundaries, at corners,
    outside, and point×point pairs must agree EXACTLY with the text
    kernel — the engine's documented ST_Contains is covers (boundary
    counts), NOT strict JTS contains; a 'correct-looking' strict law red
    the st_point_line_ops oracle by 149k rows."""
    import pandas as pd

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import geomb as GB
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial as S

    rect = "POLYGON ((0 0, 10 0, 10 10, 0 10))"
    pts = ["POINT (0 5)", "POINT (5 5)", "POINT (0 0)", "POINT (10 10)",
           "POINT (11 5)", "POINT (10 0)", "POINT (1 2)", "POINT EMPTY"]
    a = pd.Series([rect] * len(pts) + ["POINT (1 2)", "POINT (1 2)"],
                  dtype=object)
    b = pd.Series(pts + ["POINT (1 2)", "POINT (3 4)"], dtype=object)
    wa = GB.st_geomfromwkt_b.func(a)
    wb = GB.st_geomfromwkt_b.func(b)
    for name in ("contains", "within", "intersects", "disjoint", "equals"):
        bfn = getattr(GB, f"st_{name}_b").func
        got = bfn(wa, wb).tolist()
        tfn = {
            "contains": S._contains,
            "within": lambda x, y: S._contains(y, x),
            "intersects": S._intersects,
            "disjoint": lambda x, y: (None if S._intersects(x, y) is None
                                      else not S._intersects(x, y)),
            "equals": S._equals,
        }[name]
        exp = [tfn(x, y) for x, y in zip(a, b)]
        assert got == exp, (name, got, exp)


@given(seed=st.integers(0, 100_000))
@settings(max_examples=30, deadline=None)
def test_nonareal_fixed_mask_is_identity(seed):
    """Every string _nonareal_fixed_mask accepts must be an exact fixed
    point of parse→to_wkt (the ST_GeomFromWKT / non-areal ST_MakeValid
    contract); adversarial near-misses (floats, single-member multis,
    leading zeros, extra spaces, Z) must be REJECTED by the mask and then
    agree with the scalar path anyway."""
    import pandas as pd

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import spatial as S

    rng = random.Random(seed)
    rows = []
    for _ in range(40):
        x, y = rng.randint(-10**6, 10**6), rng.randint(-10**6, 10**6)
        t = rng.randrange(8)
        if t == 0:
            rows.append(f"POINT ({x} {y})")
        elif t == 1:
            n = rng.randint(2, 6)
            rows.append("LINESTRING (" + ", ".join(
                f"{x+i} {y}" for i in range(n)) + ")")
        elif t == 2:
            rows.append(f"MULTIPOINT ({x} {y}, {x+1} {y+1})")
        elif t == 3:
            rows.append(f"MULTILINESTRING (({x} {y}, {x+1} {y}),"
                        f" ({x} {y+1}, {x+2} {y+2}, {x} {y}))")
        elif t == 4:   # duplicates / unsorted members stay verbatim
            rows.append(f"MULTIPOINT ({x} {y}, {x} {y})")
        elif t == 5:   # near-misses the mask must reject
            rows.append(rng.choice([
                f"POINT ({x}.5 {y})", f"MULTIPOINT ({x} {y})",
                f"MULTILINESTRING (({x} {y}, {x+1} {y}))",
                f"POINT (0{abs(x) % 10} {y})", f"POINT  ({x} {y})",
                f"POINT Z ({x} {y} 1)", "LINESTRING EMPTY",
                f"POINT ({x} {y}) ",
            ]))
        elif t == 6:
            rows.append(None)
        else:
            rows.append(f"POLYGON (({x} {y}, {x+3} {y}, {x+3} {y+3},"
                        f" {x} {y+3}, {x} {y}))")
    ser = pd.Series(rows, dtype=object)
    mask = S._nonareal_fixed_mask(ser)
    for w, m in zip(rows, mask):
        if w is None:
            assert not m
            continue
        exp = S._geom_from_wkt(w)
        if m:
            assert exp == w, f"mask accepted a non-fixed-point: {w} -> {exp}"
    # the full UDF path equals the scalar path on the whole batch
    got = S.st_geomfromwkt.func(ser)
    exp_all = [None if w is None else S._geom_from_wkt(w) for w in rows]
    assert got.tolist() == exp_all
    got_mv = S.st_makevalid.func(ser)
    exp_mv = [None if w is None else S._make_valid(w) for w in rows]
    assert got_mv.tolist() == exp_mv


# ------------------------------------------------ fused kernels (r13)

def test_fuse_npoints_segmentize_rewrite():
    """The _FUSE rule turns ST_NPoints(ST_Segmentize(g, m)) into the
    fused counter — and leaves non-matching consumers alone."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions import chainrw as C

    assert C.rewrite("ST_NPoints(ST_Segmentize(g, 1D))") == \
        "ST_SegmentizeNPoints(g, 1D)"
    assert C.rewrite("ST_NumPoints(ST_Segmentize(g, 2.5))") == \
        "ST_SegmentizeNPoints(g, 2.5)"
    # inner args that are themselves expressions survive verbatim
    assert C.rewrite("ST_NPoints(ST_Segmentize(wkt, d + 1))") == \
        "ST_SegmentizeNPoints(wkt, d + 1)"
    # non-fusable consumers keep the plain spelling
    assert "ST_SegmentizeNPoints" not in C.rewrite(
        "ST_Length(ST_Segmentize(g, 1D))")
    # the A/B kill switch disables the fusion too
    import os
    os.environ["SPARK_GRAFT_NO_CHAINRW"] = "1"
    try:
        assert C.rewrite("ST_NPoints(ST_Segmentize(g, 1D))") == \
            "ST_NPoints(ST_Segmentize(g, 1D))"
    finally:
        del os.environ["SPARK_GRAFT_NO_CHAINRW"]


def test_fused_segmentize_npoints_parity(spark):
    """Fused == literal composition over mixed inputs: lane-eligible
    int rects, float rects, an L-shape (scalar fallback), a linestring,
    NULL geometry, and a non-positive max_len (both sides NULL)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.functions.spatial import (
        register_spatial_functions)

    register_spatial_functions(spark)
    rows = [
        ("POLYGON ((0 0, 9 0, 9 4, 0 4, 0 0))", 1.0),
        ("POLYGON ((0 0, 9 0, 9 4, 0 4, 0 0))", 2.5),
        ("POLYGON ((0.5 0.5, 7.25 0.5, 7.25 3.5, 0.5 3.5, 0.5 0.5))",
         1.0),
        ("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))", 1.0),
        ("LINESTRING (0 0, 10 0)", 3.0),
        (None, 1.0),
        ("POLYGON ((0 0, 9 0, 9 4, 0 4, 0 0))", 0.0),
    ]
    df = spark.createDataFrame(rows, "g string, m double")
    both = df.selectExpr(
        "ST_SegmentizeNPoints(g, m) AS fused",
        "ST_NPoints(ST_Segmentize(g, m)) AS composed").collect()
    for r in both:
        assert r.fused == r.composed, r
    # spot-check the closed form on the unit-step rect: 2(w+h)+1
    assert both[0].fused == 2 * (9 + 4) + 1

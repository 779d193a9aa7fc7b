"""Distributed DBSCAN (operators/dbscan.py — r9 Sedona-1.7-stats parity):
the Spark labeling must match a brute-force textbook DBSCAN computed
independently in pure Python (all-pairs neighbors, BFS expansion,
min-core-id canonical labels, min-rule border assignment) — this pins the
ALGORITHM, not just the SQL-oracle mirror of the same decomposition."""

import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import dbscan as DB

SF_DIR = "/root/testdata/sf0.001"


def _brute_force(points):
    """Textbook DBSCAN with the module's determinism refinements:
    cluster id = min core id of the density-connected component; border
    points take min(cluster) over their core neighbors; noise = -1."""
    eps2 = DB.EPS * DB.EPS
    ids = sorted(points)
    nbr = {i: [] for i in ids}
    for i in ids:
        xi, yi = points[i]
        for j in ids:
            if i == j:
                continue
            xj, yj = points[j]
            if (xi - xj) ** 2 + (yi - yj) ** 2 <= eps2:
                nbr[i].append(j)
    core = {i for i in ids if len(nbr[i]) + 1 >= DB.MIN_PTS}
    # components over core-core edges (BFS)
    comp = {}
    for seed in sorted(core):
        if seed in comp:
            continue
        stack, members = [seed], []
        seen = {seed}
        while stack:
            u = stack.pop()
            members.append(u)
            for v in nbr[u]:
                if v in core and v not in seen:
                    seen.add(v)
                    stack.append(v)
        label = min(members)
        for u in members:
            comp[u] = label
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, comp[i])
        else:
            cores = [comp[j] for j in nbr[i] if j in core]
            out[i] = (False, min(cores) if cores else -1)
    return out, {i: len(nbr[i]) for i in ids}


@pytest.fixture(scope="module")
def result(spark):
    rows = DB.spatial_dbscan(spark, SF_DIR).collect()
    return {r["id"]: r for r in rows}


@pytest.fixture(scope="module")
def points(spark):
    return {r["id"]: (r["x"], r["y"])
            for r in DB._points(spark, SF_DIR).collect()}


def test_matches_brute_force(result, points):
    assert len(result) == len(points) > 0
    expect, degrees = _brute_force(points)
    for i, (is_core, cluster) in expect.items():
        r = result[i]
        assert r["is_core"] == is_core, f"core flag differs at {i}"
        assert r["cluster"] == cluster, f"cluster differs at {i}"
        assert r["n_neighbors"] == degrees[i], f"degree differs at {i}"


def test_fixture_has_all_three_roles(result):
    # the point law must actually exercise core, border, and noise —
    # a fixture without borders or noise proves much less
    cores = [r for r in result.values() if r["is_core"]]
    borders = [r for r in result.values()
               if not r["is_core"] and r["cluster"] != -1]
    noise = [r for r in result.values() if r["cluster"] == -1]
    assert cores and borders and noise, (
        f"cores={len(cores)} borders={len(borders)} noise={len(noise)}")


def test_cluster_labels_are_core_ids(result):
    core_ids = {i for i, r in result.items() if r["is_core"]}
    for i, r in result.items():
        if r["cluster"] != -1:
            assert r["cluster"] in core_ids
        if r["is_core"]:
            assert r["cluster"] <= i  # min-id canonical label


def test_grid_pairs_equal_brute_force(spark, points):
    pairs = {(r["a"], r["b"])
             for r in DB._neighbor_pairs(DB._points(spark, SF_DIR)).collect()}
    eps2 = DB.EPS * DB.EPS
    expect = {(i, j) for i in points for j in points if i != j
              and (points[i][0] - points[j][0]) ** 2
              + (points[i][1] - points[j][1]) ** 2 <= eps2}
    assert pairs == expect


def test_hot_cell_block_decomposition(spark):
    """r10: all points in ONE eps-cell (the skew worst case) must fan
    out across block-pair tasks with bounded slice sizes — never the
    single |A|x|B| task a plain hash equi-join would produce — and the
    pair set must equal brute force exactly."""
    import functools

    from pyspark.sql import functions as F

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import spatial_join as SJ

    n, block = 120, 8
    # n points inside one eps-cell (coords 0..EPS-1): every pair is a
    # candidate; d2 <= EPS^2 keeps most of them
    pts = spark.range(n).selectExpr(
        "id", f"CAST(id % {DB.EPS} AS BIGINT) AS x",
        f"CAST((id * 7) % {DB.EPS} AS BIGINT) AS y")
    probe: list = []
    orig = SJ._cell_block_join
    import unittest.mock as mock
    with mock.patch.object(
            SJ, "_cell_block_join",
            functools.partial(orig, block=block)):
        pairs_df = DB._neighbor_pairs(pts, _tasks_probe=probe)
        pairs = {(r["a"], r["b"]) for r in pairs_df.collect()}
    # bounded per-task volume: every shipped slice <= block elements
    assert probe, "block spine was not engaged"
    sizes = probe[0].select(
        F.max(F.size("__sa")).alias("ma"),
        F.max(F.size("__sb")).alias("mb")).first()
    assert sizes["ma"] <= block and sizes["mb"] <= block
    pl = {r["id"]: (r["x"], r["y"]) for r in pts.collect()}
    eps2 = DB.EPS * DB.EPS
    expect = {(i, j) for i in pl for j in pl if i != j
              and (pl[i][0] - pl[j][0]) ** 2
              + (pl[i][1] - pl[j][1]) ** 2 <= eps2}
    assert pairs == expect


def test_lof_hot_cell_bounded(spark, monkeypatch):
    """r10: LOF's dense-cell exposure — GRID forced huge puts EVERY
    point of the fixture in ONE 3x3 neighborhood group (the city-center
    worst case) while TILE=16 keeps each distance-matrix tile at 16x16;
    k-distances must still match the all-pairs brute-force ranking
    exactly, proving the tiled accumulators are exact at any density."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import outlier as O

    monkeypatch.setattr(O, "TILE", 16)
    monkeypatch.setattr(O, "GRID", 10 ** 9)
    out = {r["id"]: r
           for r in O.local_outlier_factor(spark, SF_DIR).collect()}
    pts = {r["id"]: (r["x"], r["y"])
           for r in O._lof_points(spark, SF_DIR).collect()}
    assert len(out) == len(pts) > 0
    for i, (xi, yi) in pts.items():
        d2s = sorted((xi - x) ** 2 + (yi - y) ** 2
                     for j, (x, y) in pts.items() if j != i)
        assert out[i]["kdist2"] == d2s[O.K - 1], f"kdist2 differs at {i}"


def test_cc_loop_path_equals_union_find(spark):
    """r10: the two connected-components finishes — driver union-find
    (small contracted graph) and the distributed min-label loop — must
    produce identical labelings. Forcing localMaxEdges=0 routes the
    same fixture through the loop."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import graph as G

    base = {(r["id"], r["cluster"])
            for r in DB.spatial_dbscan(spark, SF_DIR).collect()}
    spark.conf.set(G.LOCAL_CC_CONF, "0")
    try:
        looped = {(r["id"], r["cluster"])
                  for r in DB.spatial_dbscan(spark, SF_DIR).collect()}
    finally:
        spark.conf.unset(G.LOCAL_CC_CONF)
    assert base == looped


def test_half_neighborhood_pairs_equal_three_by_three(spark, points):
    """r12: the half-neighborhood spelling (B explodes to self + the four
    directed offsets, union-swap after the filter) must emit EXACTLY the
    3x3 spelling's ordered pair set — same cardinality, no duplicates.
    r13: broadcastMaxN=0 forces the spine spellings (the broadcast gate
    would otherwise capture n_points <= 2M)."""
    pts = DB._points(spark, SF_DIR)
    spark.conf.set(DB.DBSCAN_BROADCAST_CONF, "0")
    try:
        base = DB._neighbor_pairs(pts).collect()
        half = DB._neighbor_pairs(
            pts, n_points=DB.DBSCAN_HALF_MIN_N).collect()
    finally:
        spark.conf.unset(DB.DBSCAN_BROADCAST_CONF)
    assert len(half) == len(base)                       # no duplicates
    assert {(r["a"], r["b"]) for r in half} == \
        {(r["a"], r["b"]) for r in base}


def test_broadcast_pairs_equal_three_by_three(spark, points):
    """r13 (optimization round): the size-gated broadcast spelling (the
    un-exploded point side broadcast into the 9x-exploded probe side,
    no block spine, no shuffle) must emit EXACTLY the 3x3 spine
    spelling's ordered pair set — same cardinality, no duplicates — and
    its plan must actually be a broadcast hash join."""
    pts = DB._points(spark, SF_DIR)
    bcast_df = DB._neighbor_pairs(pts, n_points=len(points))
    plan = bcast_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    bcast = bcast_df.collect()
    spark.conf.set(DB.DBSCAN_BROADCAST_CONF, "0")
    try:
        base = DB._neighbor_pairs(pts).collect()
    finally:
        spark.conf.unset(DB.DBSCAN_BROADCAST_CONF)
    assert len(bcast) == len(base)                      # no duplicates
    assert {(r["a"], r["b"]) for r in bcast} == \
        {(r["a"], r["b"]) for r in base}

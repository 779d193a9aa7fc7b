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

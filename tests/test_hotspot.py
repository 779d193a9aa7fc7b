"""Getis-Ord Gi* hot-spot detection (operators/hotspot.py — r9
Sedona-1.7-stats parity): the Spark scores must match an independent
numpy implementation of the published Gi* formula (Getis & Ord 1992),
and the fixture must produce actual hot spots."""

import math

import numpy as np
import pytest

from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import dbscan as DB
from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import hotspot as HS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def result(spark):
    return {(r["cx"], r["cy"]): r
            for r in HS.getis_ord_hotspots(spark, SF_DIR).collect()}


def _numpy_gi_star(spark):
    pts = DB._points(spark, SF_DIR).collect()
    cells = {}
    for r in pts:
        key = (r["x"] // HS.CELL, r["y"] // HS.CELL)
        cells[key] = cells.get(key, 0) + 1
    xs = np.array(list(cells.values()), dtype=np.float64)
    n, xbar = len(xs), xs.mean()
    s = math.sqrt((xs * xs).mean() - xbar * xbar)
    out = {}
    for (cx, cy), _v in cells.items():
        hood = [cells[(cx + dx, cy + dy)]
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (cx + dx, cy + dy) in cells]
        w_i, w_sum = len(hood), sum(hood)
        gi = (w_sum - xbar * w_i) / (
            s * math.sqrt((n * w_i - w_i * w_i) / (n - 1)))
        out[(cx, cy)] = (w_i, w_sum, gi)
    return out


def test_matches_numpy_formula(spark, result):
    expect = _numpy_gi_star(spark)
    assert set(result) == set(expect)
    for key, (w_i, w_sum, gi) in expect.items():
        r = result[key]
        assert r["w_i"] == w_i and r["w_sum"] == w_sum
        # numpy folds in a different order than the SQL expression, so
        # compare to float tolerance (engine-vs-oracle equality is the
        # bit-exact contract; this is the independent-formula check)
        assert r["gi_star"] == pytest.approx(gi, rel=1e-12)


def test_fixture_has_hot_cells(result):
    hot = [r for r in result.values() if r["is_hot"]]
    assert hot, "fixture produced no hot cells — Gi* never exceeded 2.576"
    # hot cells must be high-count cells: their value should be above
    # the mean cell value
    mean = sum(r["x_val"] for r in result.values()) / len(result)
    assert all(r["w_sum"] / r["w_i"] > mean for r in hot)


def test_isolated_cell_weight_is_self_only(result):
    # every cell includes itself in its own neighborhood
    assert all(1 <= r["w_i"] <= 9 for r in result.values())
    assert all(r["w_sum"] >= r["x_val"] for r in result.values())

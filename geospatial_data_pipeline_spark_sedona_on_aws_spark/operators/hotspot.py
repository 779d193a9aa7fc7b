"""Getis-Ord Gi* hot-spot detection over a gridded point set.

Sedona 1.7 ships this as `sedona.stats.hotspot_detection.g_local`
(the Gi/Gi* local spatial statistic of Getis & Ord 1992, with the
neighbor lists usually built by ST_BinaryDistanceBandColumn). The
reference pipeline has no statistics surface (spark_job/
process_geodata.py); this is Sedona-surface parity, re-expressed as
DataFrame aggregates.

Shape: points (the spatial_dbscan fixture law — one deterministic
point table shared by both stats operators) aggregate to occupied
grid cells (ONE hash aggregate), each cell's 3×3 Moore neighborhood
joins via the explode→equi-join probe pattern (binary weights,
self included → the starred Gi*), and the global moments arrive as a
single broadcast row. Two shuffles total — the cell aggregate and the
neighbor equi-join — independent of point count; skewed blobs only
make cell VALUES larger, never a hot join key (cell ids are unique
after the aggregate).

Exactness contract: every partial is integer (cell counts, Σx, Σx²,
W_i, w_i, n), so shuffles and partial-aggregation order cannot perturb
anything; the final Gi* is ONE identical floating-point expression on
both engines (+ − × ÷ √ are all IEEE-exact, so equal integer inputs
give bit-equal doubles — the same trick bm25_term_scores uses to stay
transcendental-free).

Gi* (binary weights w_ij ∈ {0,1}, j ranging over the n occupied cells,
self included):

    Gi* = [W_i − x̄·w_i] / [ s·sqrt((n·w_i − w_i²)/(n−1)) ]

with W_i = Σ_{j∈N(i)} x_j, w_i = |N(i)|, x̄ = Σx/n,
s = sqrt(Σx²/n − x̄²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dbscan import _points

#: grid cell edge — 8 units vs the 13-unit blob jitter box, so a blob
#: occupies ~4 cells and hot cells carry genuinely larger counts.
CELL = 8

def getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per occupied cell: (cx, cy, x_val, w_i, w_sum, gi_star, is_hot,
    is_cold) — Gi* with 3×3 binary neighborhood, hot/cold at the 99%
    two-tailed z threshold (±2.576)."""
    pts = _points(spark, sf_dir)
    cells = (
        pts.selectExpr(f"x div {CELL} AS cx", f"y div {CELL} AS cy")
        .groupBy("cx", "cy").agg(F.count("*").alias("x_val"))
        .localCheckpoint(eager=False)  # both join sides + global moments
    )
    glob = cells.agg(
        F.count("*").alias("n"),
        F.sum("x_val").alias("sumx"),
        F.sum(F.col("x_val") * F.col("x_val")).alias("sumx2"),
    )
    probe = (
        cells.select(
            F.col("x_val").alias("nx"),
            F.explode(F.expr("sequence(cx - 1, cx + 1)")).alias("px"),
            "cy")
        .select("nx", "px",
                F.explode(F.expr("sequence(cy - 1, cy + 1)")).alias("py"))
    )
    hood = (
        cells.join(probe, (cells["cx"] == probe["px"])
                   & (cells["cy"] == probe["py"]))
        .groupBy("cx", "cy", "x_val")
        .agg(F.sum("nx").alias("w_sum"), F.count("*").alias("w_i"))
    )
    # the Gi* expression — written ONCE, identically, on both engines
    return (
        hood.crossJoin(F.broadcast(glob))
        .selectExpr(
            "cx", "cy", "x_val", "w_i", "w_sum",
            "(CAST(w_sum AS DOUBLE) - CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE) * CAST(w_i AS DOUBLE))"
            " / (sqrt(CAST(sumx2 AS DOUBLE) / CAST(n AS DOUBLE)"
            "         - (CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE)))"
            "    * sqrt((CAST(n AS DOUBLE) * CAST(w_i AS DOUBLE) - CAST(w_i AS DOUBLE) * CAST(w_i AS DOUBLE))"
            "           / (CAST(n AS DOUBLE) - 1.0D))) AS gi_star",
        )
        .selectExpr("cx", "cy", "x_val", "w_i", "w_sum", "gi_star",
                    "gi_star > 2.576D AS is_hot",
                    "gi_star < -2.576D AS is_cold")
    )

GETIS_ORD_ORACLE = f"""
WITH params AS (
    SELECT greatest(count(*) // 25, 1) AS k FROM events
),
pts AS (
    SELECT event_id AS id,
           (blob % 1000) * 40
               + ((event_id // k * 5 + event_id % 7) % 13) AS x,
           (blob // 1000) * 40
               + ((event_id // k * 7 + event_id % 11) % 13) AS y
    FROM (
        SELECT event_id, k,
               CASE WHEN event_id % 4 = 0
                    THEN (event_id % k) % greatest(k // 10, 1)
                    ELSE event_id % k END AS blob
        FROM events CROSS JOIN params
    )
),
cells AS (
    SELECT x // {CELL} AS cx, y // {CELL} AS cy, count(*) AS x_val
    FROM pts GROUP BY 1, 2
),
gmoments AS (
    SELECT count(*) AS n, sum(x_val) AS sumx,
           sum(x_val * x_val) AS sumx2
    FROM cells
),
probe AS (
    SELECT c.x_val AS nx, c.cx + tx.dx AS px, c.cy + ty.dy AS py
    FROM cells c, unnest([-1, 0, 1]) AS tx(dx), unnest([-1, 0, 1]) AS ty(dy)
),
hood AS (
    SELECT c.cx, c.cy, c.x_val,
           sum(p.nx) AS w_sum, count(*) AS w_i
    FROM cells c JOIN probe p ON c.cx = p.px AND c.cy = p.py
    GROUP BY 1, 2, 3
),
scored AS (
    SELECT cx, cy, x_val, w_i, w_sum,
           (CAST(w_sum AS DOUBLE) - CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE) * CAST(w_i AS DOUBLE))
           / (sqrt(CAST(sumx2 AS DOUBLE) / CAST(n AS DOUBLE)
                   - (CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sumx AS DOUBLE) / CAST(n AS DOUBLE)))
              * sqrt((CAST(n AS DOUBLE) * CAST(w_i AS DOUBLE) - CAST(w_i AS DOUBLE) * CAST(w_i AS DOUBLE))
                     / (CAST(n AS DOUBLE) - 1.0))) AS gi_star
    FROM hood CROSS JOIN gmoments
)
SELECT cx, cy, CAST(x_val AS BIGINT) AS x_val, CAST(w_i AS BIGINT) AS w_i,
       CAST(w_sum AS BIGINT) AS w_sum, gi_star,
       gi_star > 2.576 AS is_hot, gi_star < -2.576 AS is_cold
FROM scored
"""

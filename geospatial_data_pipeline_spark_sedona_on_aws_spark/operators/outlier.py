"""Local Outlier Factor — k-NN density-based outlier scoring.

Sedona 1.7 ships this as `sedona.stats.outlier_detection.
local_outlier_factor` (Breunig et al. 2000). The reference has no
statistics surface; this completes the engine's parity with Sedona's
stats trio (DBSCAN — operators/dbscan.py, Gi* — operators/hotspot.py,
LOF — here), each as an oracle-checked DataFrame query.

Algorithm, re-expressed in shapes that scale:

1. **candidate pairs** on the 40-unit blob grid via the explode →
   equi-join 3×3 probe (the dbscan/hotspot pattern). The point law
   bounds every point's k-distance ball inside the 3×3 neighborhood
   (worst-case 5-NN radius < 30 < cell edge 40 — see the law note), so
   the candidate set provably contains every true neighbor: exact k-NN
   without an all-pairs stage.
2. **k-distance** (k = {K}) per point: one window over the candidate
   pairs ordered by (dist², neighbor id) — a deterministic total order,
   so both engines rank ties identically; the rank-{K} dist² value is
   order-independent anyway (it is the {K}th smallest).
3. **reachability / lrd / LOF** with the INTEGER-QUANTIZED arithmetic
   the engine uses wherever a float fold would cross a shuffle
   (pagerank_links, bm25): the metric is squared euclidean distance
   (integer), reach²(p,o) = max(kdist²(o), d²(p,o), 1) — the max(…,1)
   regularizes coincident points, which the jitter law does produce —
   lrd_q(p) = |N(p)|·SCALE div Σreach², and
   LOF_q(p) = Σ_o lrd_q(o) · Σreach²(p) div |N(p)|², i.e. LOF × SCALE
   in pure BIGINT ops. Deterministic at any parallelism, bit-equal in
   DuckDB. (Squared-distance LOF ranks identically to classic LOF on
   uniform-density neighborhoods and is the price of exactness; the
   quantization error is ≤ |N| / SCALE, invisible at SCALE = 1e9.)

Fixture: the dbscan/hotspot point law plus a +15 x-shift for every
97th point — those land in the empty corridor between blobs (blob span
13, spacing 40), the textbook LOF outlier. N_k uses ALL points within
the k-distance (ties included), per the original paper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dbscan import _points

K = 5
SCALE = 10 ** 9
#: blob-grid edge (the point-law spacing): one blob per cell
GRID = 40
#: candidate-prune bound: the same point law that makes the 3x3 probe
#: exact (worst 5-NN radius < 30 — every point has >= K blob-mates
#: within d2 <= 27^2 + 12^2 = 873, the corridor-outlier worst case)
#: bounds every pair that can EVER matter (top-K member or N_k member,
#: since N_k needs d2 <= kdist2 < 900) strictly under 30^2. Pruning
#: cand at this bound changes nothing — pinned two ways: the all-pairs
#: brute-force test (tests/test_outlier.py) and the direct
#: max-kdist2 < PRUNE_D2 law assertion at the driver-gate sf.
PRUNE_D2 = 900

def _lof_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stats point law with every 97th point pushed +15 in x: off
    the blob (span 0..12) into the inter-blob corridor, still within
    one grid cell of its neighbors (27 + jitter < 40)."""
    return _points(spark, sf_dir).selectExpr(
        "id",
        "x + CASE WHEN id % 97 = 0 THEN 15 ELSE 0 END AS x",
        "y",
    )

def local_outlier_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, n_k, kdist2, lof_q, is_outlier): integer-quantized LOF with
    k = 5 over the blob point law; lof_q ≈ LOF × 1e9, outliers flagged
    at LOF > 1.5."""
    pts = _lof_points(spark, sf_dir).localCheckpoint(eager=False)
    cells = pts.selectExpr(
        "id", "x", "y", f"x div {GRID} AS cx", f"y div {GRID} AS cy")
    a = cells.select(F.col("id").alias("a"), F.col("x").alias("ax"),
                     F.col("y").alias("ay"), "cx", "cy")
    b = (
        cells.select(F.col("id").alias("b"), F.col("x").alias("bx"),
                     F.col("y").alias("by"),
                     F.explode(F.expr("sequence(cx - 1, cx + 1)"))
                     .alias("px"), "cy")
        .select("b", "bx", "by", "px",
                F.explode(F.expr("sequence(cy - 1, cy + 1)")).alias("py"))
    )
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    cand = (
        a.join(b, (a["cx"] == b["px"]) & (a["cy"] == b["py"]))
        .where(F.col("a") != F.col("b"))
        .select("a", "b", d2.alias("d2"))
        # the PRUNE_D2 law (see the constant): no top-K or N_k pair can
        # sit at d2 >= 900, so the 3x3 candidate fan (~225 pairs/point,
        # 22M rows at sf0.1) collapses ~7x BEFORE anything is
        # materialized or shuffled — measured 24.1 s -> single digits
        .where(F.col("d2") < F.lit(PRUNE_D2))
        .localCheckpoint(eager=False)  # kdist aggregate + N_k join below
    )
    # kdist2 = the K-th smallest d2 (duplicates counted): identical to
    # max(d2) over the first K rows of the (d2, b) window — the tie
    # order in b never changes the K-th VALUE — but as a hash aggregate
    # with map-side partials instead of a full per-key sort window
    kd = (
        cand.groupBy("a")
        .agg(F.element_at(F.array_sort(F.collect_list("d2")), K)
             .alias("kdist2"))
        .localCheckpoint(eager=False)  # joined from BOTH pair sides
    )
    # N_k(p): every point within the k-distance (ties included)
    nk = (
        cand.join(kd, "a")
        .where(F.col("d2") <= F.col("kdist2"))
        .join(kd.select(F.col("a").alias("b"),
                        F.col("kdist2").alias("kdist2_b")), "b")
        .selectExpr("a", "b",
                    "greatest(greatest(kdist2_b, d2), 1L) AS reach2")
        # consumed by the lrd aggregate AND the neighbor-lrd lookup —
        # truncate once or the 3-way join over the candidate set runs
        # twice (measured: ~2x the query's wall at sf0.1)
        .localCheckpoint(eager=False)
    )
    lrd = (
        nk.groupBy("a").agg(F.count("*").alias("n_k"),
                            F.sum("reach2").alias("sum_reach2"))
        .selectExpr("a", "n_k", "sum_reach2",
                    f"(n_k * {SCALE}L) div sum_reach2 AS lrd_q")
        .localCheckpoint(eager=False)  # self-joined below
    )
    return (
        nk.select("a", "b")
        .join(lrd.select(F.col("a").alias("b"),
                         F.col("lrd_q").alias("lrd_q_o")), "b")
        .groupBy("a").agg(F.sum("lrd_q_o").alias("sum_lrd_o"))
        .join(lrd, "a")
        .join(kd, "a")
        .selectExpr(
            "a AS id", "n_k", "kdist2",
            "(sum_lrd_o * sum_reach2) div (n_k * n_k) AS lof_q",
        )
        .selectExpr("id", "n_k", "kdist2", "lof_q",
                    f"lof_q > {SCALE}L * 3L div 2L AS is_outlier")
    )

LOCAL_OUTLIER_FACTOR_ORACLE = f"""
WITH params AS (
    SELECT greatest(count(*) // 25, 1) AS k FROM events
),
base AS (
    SELECT event_id, k,
           CASE WHEN event_id % 4 = 0
                THEN (event_id % k) % greatest(k // 10, 1)
                ELSE event_id % k END AS blob
    FROM events CROSS JOIN params
),
pts AS (
    SELECT event_id AS id,
           (blob % 1000) * 40
               + ((event_id // k * 5 + event_id % 7) % 13)
               + CASE WHEN event_id % 97 = 0 THEN 15 ELSE 0 END AS x,
           (blob // 1000) * 40
               + ((event_id // k * 7 + event_id % 11) % 13) AS y
    FROM base
),
cells AS (
    SELECT id, x, y, x // {GRID} AS cx, y // {GRID} AS cy FROM pts
),
probe AS (
    SELECT c.id, c.x, c.y, c.cx + tx.dx AS px, c.cy + ty.dy AS py
    FROM cells c, unnest([-1, 0, 1]) AS tx(dx), unnest([-1, 0, 1]) AS ty(dy)
),
cand AS (
    SELECT a.id AS a, b.id AS b,
           (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
    FROM cells a JOIN probe b ON a.cx = b.px AND a.cy = b.py
    WHERE a.id <> b.id
),
ranked AS (
    SELECT a, b, d2,
           row_number() OVER (PARTITION BY a ORDER BY d2, b) AS rn
    FROM cand
),
kd AS (
    SELECT a, max(d2) AS kdist2 FROM ranked WHERE rn <= {K} GROUP BY a
),
nk AS (
    SELECT c.a, c.b,
           greatest(greatest(kb.kdist2, c.d2), 1) AS reach2
    FROM cand c
    JOIN kd ka ON ka.a = c.a AND c.d2 <= ka.kdist2
    JOIN kd kb ON kb.a = c.b
),
lrd AS (
    SELECT a, count(*) AS n_k, sum(reach2) AS sum_reach2,
           (count(*) * {SCALE}) // sum(reach2) AS lrd_q
    FROM nk GROUP BY a
)
SELECT n.a AS id,
       CAST(l.n_k AS BIGINT) AS n_k,
       CAST(k.kdist2 AS BIGINT) AS kdist2,
       CAST((sum(lo.lrd_q) * l.sum_reach2) // (l.n_k * l.n_k) AS BIGINT)
           AS lof_q,
       (sum(lo.lrd_q) * l.sum_reach2) // (l.n_k * l.n_k)
           > CAST({SCALE} AS BIGINT) * 3 // 2 AS is_outlier
FROM nk n
JOIN lrd lo ON lo.a = n.b
JOIN lrd l ON l.a = n.a
JOIN kd k ON k.a = n.a
GROUP BY n.a, l.n_k, l.sum_reach2, k.kdist2
"""

"""Distributed DBSCAN — density-based spatial clustering over a point set.

Sedona 1.7 ships DBSCAN as its flagship spatial-statistics operator
(`sedona.stats.clustering.dbscan` — DataFrame in, per-point cluster
labels out). The reference pipeline itself never clusters
(spark_job/process_geodata.py is scan→overlay→aggregate), so this is
north-star parity with the Sedona surface a reference user has available,
re-expressed Spark-first.

Algorithm (classic DBSCAN, Ester et al. 1996), decomposed into shapes
that scale on a cluster:

1. **eps-neighbor pairs via grid bucketing** — never all-pairs: each
   point lands in ONE cell of an eps-sized grid and probes the 3×3
   neighborhood via an explode → EQUI-join on cell id (the same shape as
   knn_join_grid / geo_range_join). A candidate pair appears in exactly
   one (owner-cell, probe-cell) combination, so no dedup pass is needed.
   Hash-partitioned on cell id; a pathologically hot cell can reuse
   `spatial_join._cell_block_join`'s block spine (the r9 hot-cell
   decomposition) — the fixture's cells are bounded by construction.
2. **core points** — one count aggregate per point over its neighbor
   list: |N_eps(p)| >= MIN_PTS, counting p itself (the sklearn
   convention; PostGIS ST_ClusterDBSCAN counts the same way).
3. **core-core edges → connected components** — min-label propagation
   with pointer jumping (operators/graph.connected_components, the same
   O(log diameter) loop dedup_clusters uses). Cluster id = min core
   point id of the component (canonical, engine-independent).
4. **border assignment** — a non-core point within eps of >= 1 core
   point joins min(cluster of those cores). The textbook algorithm
   assigns borders to whichever core reaches them first (order-
   dependent); the min rule is the deterministic refinement, applied
   identically in the SQL oracle.
5. everything else is NOISE (cluster = -1).

Exactness: coordinates are integers and the eps test is an integer
squared-distance comparison (dist² <= EPS²) — no float fold anywhere,
so Spark and DuckDB agree bit-for-bit.

Fixture: the testdata has no point table, so points derive from
`events` arithmetically (the pagerank_links pattern): K = max(n/25, 1)
blob centers on a 40-unit grid (blobs cannot touch: jitter spans 13
units and EPS = 3 < 40 - 13), point i joins blob i mod K with a
deterministic jitter law, and every 4th point re-routes into the first
K/10 blobs so ~10% of blobs run ~4× denser (real density contrast for
DBSCAN and for getis_ord_hotspots' Gi* threshold, which shares this
law). Light blobs hold ~19 points per 13×13 box — the expected
eps-neighborhood (~19·π·EPS²/169 ≈ 3) straddles MIN_PTS, heavy blobs
(~80 points) are solid core — so every SF produces a real
core/border/noise mix (sf0.01: 6148/2082/1770 of 10000) with bounded
per-component size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph import connected_components

#: eps (integer units) and the minimum neighborhood size (incl. self).
EPS = 3
MIN_PTS = 5
#: points per blob — fixes per-component size at every SF.
BLOB = 25

#: (sf_dir, mtime, size) -> events row count (parquet footer metadata);
#: memoized so the stats trio's repeated calls pay the count job once per
#: directory. Keyed on the file identity, not just the path, so a
#: regenerated fixture in the same driver session invalidates naturally
#: (r10 advice item 1).
_N_CACHE: dict = {}


def _events_cache_key(sf_dir: str) -> tuple:
    import os

    path = f"{sf_dir}/events.parquet"
    try:
        st = os.stat(path)
        return (sf_dir, st.st_mtime_ns, st.st_size)
    except OSError:
        # directory-shaped parquet or remote path: fall back to the key
        # that always works; regeneration then needs a new sf_dir
        return (sf_dir, 0, 0)


def events_count(spark: SparkSession, sf_dir: str) -> int:
    """Memoized row count of events.parquet (footer metadata, exact)."""
    key = _events_cache_key(sf_dir)
    if key not in _N_CACHE:
        _N_CACHE[key] = spark.read.parquet(
            f"{sf_dir}/events.parquet").count()
    return _N_CACHE[key]


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic clustered point set from `events`: blob centers on a
    40-grid, ±10 jitter (shifted +10 so coordinates are non-negative —
    Spark's `div` truncates toward zero while DuckDB's `//` floors, so
    the cell law is only cross-engine exact on non-negative ints).

    r10: k derives from a driver-side memoized parquet row count (footer
    metadata, exact — the same count(*) the oracle computes) instead of
    a count-aggregate crossJoin, removing one job + broadcast exchange
    from every stats-trio call."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    n = events_count(spark, sf_dir)
    return (
        ev.selectExpr(
            "event_id AS id",
            f"greatest({n}L div {BLOB}, 1L) AS k",
        )
        .selectExpr(
            "id",
            # every 4th point piles into the first k/10 blobs: ~10% of
            # blobs run ~4x denser, so density-sensitive consumers (the
            # DBSCAN core test, the Gi* hot threshold) see real contrast
            "CASE WHEN id % 4 = 0"
            "     THEN (id % k) % greatest(k div 10, 1L)"
            "     ELSE id % k END AS blob",
            "id div k AS j",
        )
        .selectExpr(
            "id",
            "(blob % 1000) * 40 + ((j * 5 + id % 7) % 13) AS x",
            "(blob div 1000) * 40 + ((j * 7 + id % 11) % 13) AS y",
        )
    )

#: point count above which _neighbor_pairs switches to HALF-neighborhood
#: probing. Measured by same-process alternating A/B at sf1.0 (1M points:
#: 14.7 -> 11.6 s, the candidate build dominates) and sf0.1 (100k points:
#: 5.6 -> 6.2 s, the extra checkpoint write + union-swap overhead
#: dominates) — the crossover sits between, and the two spellings emit
#: the identical ordered pair set either way.
DBSCAN_HALF_MIN_N = 500_000


def _neighbor_pairs(pts: DataFrame,
                    _tasks_probe: list | None = None,
                    n_points: int = 0) -> DataFrame:
    """(a, b) ordered pairs with 0 < dist² <= EPS², via eps-grid cells,
    met through `spatial_join._cell_block_join`'s block spine (r10,
    closing the r9 hot-cell exposure): a pathologically dense eps-cell
    fans out into CELL_BLOCK-slice block-pair tasks instead of landing
    its whole |A|×|B| candidate cross product on the ONE task a plain
    hash equi-join would give that cell's key.

    r12 (sf1.0 attribution): above DBSCAN_HALF_MIN_N points, side B
    explodes to its own cell plus only the four DIRECTED offsets
    E/NE/N/NW, so every unordered cell pair with Chebyshev distance <= 1
    meets exactly once (the four offsets cover one of each antipodal
    neighbor pair; same-cell pairs keep one direction via a < b), and
    the ordered pair set is restored by a union-swap of the already-
    FILTERED pairs. That runs the candidate build, the collect_list
    shuffle, and the distance filter on 5/9 of the 3×3 spelling's volume
    — the measured dominant stages at sf1.0 — while the emitted ordered
    pair SET is identical, so the SQL oracle (which spells the plain 3×3
    probe join) is untouched. Below the threshold the swap's extra
    checkpoint write outweighs the saved candidates (measured) and the
    3×3 spelling stays."""
    from .spatial_join import _cell_block_join

    cells = pts.selectExpr(
        "id", "x", "y", f"x div {EPS} AS cx", f"y div {EPS} AS cy")
    a = cells.select(
        F.col("id").alias("a"), F.col("x").alias("ax"),
        F.col("y").alias("ay"), F.col("cx").alias("__cx"),
        F.col("cy").alias("__cy"))
    d2 = ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
          + (F.col("ay") - F.col("by")) * (F.col("ay") - F.col("by")))
    if n_points < DBSCAN_HALF_MIN_N:
        b = (
            cells.select(
                F.col("id").alias("b"), F.col("x").alias("bx"),
                F.col("y").alias("by"),
                F.explode(F.expr("sequence(cx - 1, cx + 1)"))
                .alias("__cx"), "cy")
            .select("b", "bx", "by", "__cx",
                    F.explode(F.expr("sequence(cy - 1, cy + 1)"))
                    .alias("__cy"))
        )
        return (
            _cell_block_join(a, ["a", "ax", "ay"], b, ["b", "bx", "by"],
                             _tasks_probe=_tasks_probe)
            .where((F.col("a") != F.col("b")) & (d2 <= EPS * EPS))
            .select("a", "b")
        )
    b = (
        cells.select(
            F.col("id").alias("b"), F.col("x").alias("bx"),
            F.col("y").alias("by"), "cx", "cy",
            F.explode(F.expr(
                "array(struct(0 AS dx, 0 AS dy),"
                " struct(1 AS dx, 0 AS dy), struct(1 AS dx, 1 AS dy),"
                " struct(0 AS dx, 1 AS dy), struct(-1 AS dx, 1 AS dy))"))
            .alias("__o"))
        .select("b", "bx", "by",
                F.expr("cx + __o.dx").alias("__cx"),
                F.expr("cy + __o.dy").alias("__cy"),
                ((F.col("__o.dx") == 0)
                 & (F.col("__o.dy") == 0)).alias("__own"))
    )
    half = (
        _cell_block_join(a, ["a", "ax", "ay"], b,
                         ["b", "bx", "by", "__own"],
                         _tasks_probe=_tasks_probe)
        .where((~F.col("__own") | (F.col("a") < F.col("b")))
               & (F.col("a") != F.col("b")) & (d2 <= EPS * EPS))
        .select("a", "b")
        # both union branches read this subtree: truncate once so the
        # candidate build + filter never evaluates twice
        .localCheckpoint(eager=False)
    )
    return half.unionByName(
        half.select(F.col("b").alias("a"), F.col("a").alias("b")))

def spatial_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point DBSCAN labeling: (id, x, y, n_neighbors, is_core,
    cluster) with cluster = min core id of the density-connected
    component, or -1 for noise. See the module docstring for the
    decomposition and the determinism contract."""
    # pts feeds the grid join and the final labeling join; nbr feeds the
    # degree count, the core-core edge filter, AND the border join —
    # truncate lineage once instead of replaying the count aggregate /
    # grid join per consumer (the triangle_count multi-consumer pattern)
    pts = _points(spark, sf_dir).localCheckpoint(eager=False)
    nbr = _neighbor_pairs(
        pts, n_points=events_count(spark, sf_dir)
    ).localCheckpoint(eager=False)
    deg = nbr.groupBy("a").agg(F.count("*").alias("nn")) \
             .localCheckpoint(eager=False)  # core filter + final readback
    core = deg.where(F.col("nn") >= MIN_PTS - 1) \
              .select(F.col("a").alias("id")).localCheckpoint(eager=False)
    core_a = core.select(F.col("id").alias("a"))
    core_b = core.select(F.col("id").alias("b"))
    core_edges = (
        nbr.join(core_a, "a", "left_semi")
        .join(core_b, "b", "left_semi")
        .where(F.col("a") < F.col("b"))
    )
    # grid pairs are unique by construction (each candidate pair appears
    # in exactly one owner/probe cell combination) and a < b keeps one
    # direction — skip the CC symmetrize-distinct shuffle
    comp = connected_components(core_edges, "a", "b", unique_edges=True)
    # isolated cores (no core neighbor) are their own cluster
    labels = (
        core.join(comp, core["id"] == comp["node"], "left")
        .select("id", F.coalesce("comp", "id").alias("comp"))
        .localCheckpoint(eager=False)  # consumed by core AND border joins
    )
    border = (
        nbr.join(labels.withColumnRenamed("id", "b"), "b")
        .join(core_a, "a", "left_anti")
        .groupBy("a").agg(F.min("comp").alias("bcomp"))
    )
    return (
        pts.join(deg.select(F.col("a").alias("id"),
                            F.col("nn").alias("n_neighbors")), "id", "left")
        .join(labels.withColumnRenamed("comp", "ccomp"), "id", "left")
        .join(border.withColumnRenamed("a", "id"), "id", "left")
        .select(
            "id", "x", "y",
            F.coalesce("n_neighbors", F.lit(0)).alias("n_neighbors"),
            F.col("ccomp").isNotNull().alias("is_core"),
            F.coalesce("ccomp", "bcomp", F.lit(-1)).alias("cluster"),
        )
    )

SPATIAL_DBSCAN_ORACLE = f"""
WITH RECURSIVE params AS (
    SELECT greatest(count(*) // {BLOB}, 1) AS k FROM events
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
    SELECT id, x, y, x // {EPS} AS cx, y // {EPS} AS cy FROM pts
),
probe AS (
    SELECT c.id, c.x, c.y, c.cx + tx.dx AS px, c.cy + ty.dy AS py
    FROM cells c, unnest([-1, 0, 1]) AS tx(dx), unnest([-1, 0, 1]) AS ty(dy)
),
nbr AS (
    SELECT a.id AS a, b.id AS b
    FROM cells a JOIN probe b ON a.cx = b.px AND a.cy = b.py
    WHERE a.id <> b.id
      AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
          <= {EPS * EPS}
),
deg AS (SELECT a AS id, count(*) AS nn FROM nbr GROUP BY a),
core AS (SELECT id FROM deg WHERE nn >= {MIN_PTS - 1}),
core_edges AS (
    SELECT n.a, n.b FROM nbr n
    JOIN core ca ON ca.id = n.a
    JOIN core cb ON cb.id = n.b
    WHERE n.a < n.b
),
edges AS (
    SELECT a, b FROM core_edges UNION SELECT b AS a, a AS b FROM core_edges
),
reach AS (
    SELECT id AS node, id AS comp FROM core
    UNION
    SELECT e.a AS node, r.comp FROM reach r JOIN edges e ON e.b = r.node
),
labels AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
border AS (
    SELECT n.a AS id, min(l.comp) AS bcomp
    FROM nbr n JOIN labels l ON l.node = n.b
    WHERE n.a NOT IN (SELECT id FROM core)
    GROUP BY n.a
)
SELECT p.id, p.x, p.y,
       CAST(coalesce(d.nn, 0) AS BIGINT) AS n_neighbors,
       l.comp IS NOT NULL AS is_core,
       coalesce(l.comp, bo.bcomp, -1) AS cluster
FROM pts p
LEFT JOIN deg d ON d.id = p.id
LEFT JOIN labels l ON l.node = p.id
LEFT JOIN border bo ON bo.id = p.id
"""

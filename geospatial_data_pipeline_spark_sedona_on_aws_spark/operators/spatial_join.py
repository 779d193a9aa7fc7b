"""True spatial range join (extension beyond the reference, which joins on a
foreign key and only then intersects — reference spark_job/process_geodata.py:101.
SURVEY.md §2.2 calls for the real thing: pairs whose *geometries* overlap).

Strategy = Sedona's partitioned spatial join re-expressed in DataFrame ops:
explode both sides to covering grid cells → equi-join on cell id (this is the
shuffle key, so the join is hash-partitioned, never a cross join) → exact
rectangle-overlap predicate → dropDuplicates on the pair key (a pair can meet
in several cells).

At 100 TB the grid size trades replication (small cells → more exploded rows)
against selectivity (big cells → more false candidates); GRID=16 matches the
fixture's 15-unit regions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

from ..plans import fixtures
from ..sources import io as IO

GRID = 16

def _cells(df: DataFrame, x1: str, y1: str, x2: str, y2: str) -> DataFrame:
    """Explode rows to the grid cells their rect covers (coords are integers;
    x2/y2 exclusive, so the last covered cell is floor((x2-1)/G))."""
    return (
        df.withColumn(
            "cx",
            F.explode(F.sequence(F.floor(F.col(x1) / GRID),
                                 F.floor((F.col(x2) - 1) / GRID))),
        )
        .withColumn(
            "cy",
            F.explode(F.sequence(F.floor(F.col(y1) / GRID),
                                 F.floor((F.col(y2) - 1) / GRID))),
        )
    )

# Hot-cell decomposition threshold for the SHUFFLE (non-broadcast) grid
# join (r8 verdict item 3): a dense cell — all the data in one grid square
# — would otherwise land its whole |A_cell| x |B_cell| candidate cross
# product on ONE task. Cells are decomposed into (bi, bj) block-pair tasks
# over CELL_BLOCK-element slices (the _bucket_pairs spine from
# operators/dedup.py:153, cross-sided): per-task pair fan-out is capped at
# CELL_BLOCK^2 and the tasks round-robin across the cluster. The candidate
# SET is unchanged — bounded and spread, never sampled — so the exact
# predicates and the SQL oracles are untouched.
CELL_BLOCK = 1024

#: test seam (plan-shape assertions): the most recent _cell_block_join's
#: per-cell join frame BEFORE the lazy checkpoint truncates its lineage.
#: OPT-IN — retained only while _KEEP_LAST_CELL_JOIN is set by a test,
#: so production queries never pin a frame's lineage + session for the
#: process lifetime (r10 advice item 3)
_LAST_CELL_JOIN = None
_KEEP_LAST_CELL_JOIN = False


def _cell_block_join(a_cells: DataFrame, a_fields: list,
                     b_cells: DataFrame, b_fields: list,
                     cell_cols: tuple = ("__cx", "__cy"),
                     block: int = CELL_BLOCK,
                     _tasks_probe: list | None = None) -> DataFrame:
    """Skew-proof replacement for `a_cells.join(b_cells, cell_cols)`:
    each side groups by cell (the SAME single shuffle the hash join would
    do), the per-cell member arrays meet in a one-row-per-cell join, and a
    (bi, bj) block spine explodes every cell into tasks shipping two
    <=block-element slices each. Emits one row per (cell, a-row, b-row)
    candidate with a_fields + b_fields as top-level columns — identical to
    the plain equi-join's output set.

    Bounded-hold caveat (same contract as dedup._bucket_pairs): the
    grouping task for a cell holds that cell's full member array once;
    rows are sliced BEFORE the spreading exchange, so no downstream task
    ever ships or pairs more than 2*block elements / block^2 pairs."""
    cx, cy = cell_cols
    sess = a_cells.sparkSession
    ga = a_cells.groupBy(cx, cy).agg(
        F.collect_list(F.struct(*a_fields)).alias("__la"))
    gb = b_cells.groupBy(cx, cy).agg(
        F.collect_list(F.struct(*b_fields)).alias("__lb"))
    # the small and hot branches below both consume this subtree; the
    # lazy checkpoint materializes the per-cell join ONCE instead of
    # recomputing the (potentially expensive) upstream per branch —
    # measured 41.7 s vs 2.3 s on geo_range_join at sf0.1 without it.
    # The checkpoint hides the join from downstream plan dumps, so the
    # pre-checkpoint frame is parked for plan-shape tests.
    cell_join = ga.join(gb, [cx, cy])
    if _KEEP_LAST_CELL_JOIN:
        global _LAST_CELL_JOIN
        _LAST_CELL_JOIN = cell_join
    j = cell_join.localCheckpoint(eager=False)
    la, lb = F.col("__la"), F.col("__lb")

    def _explode_pairs(df):
        # r12 (DBSCAN sf1.0 attribution): two chained Generate explodes
        # instead of one nested transform→flatten→explode struct-pair
        # expression — the HOF spelling evaluated interpreted per row
        # (no whole-stage codegen through lambda structs) and was the
        # measured dominant stage of spatial_dbscan at sf1.0 (12.9 s of
        # a 14 s pass, ~14 µs per candidate); the chained explodes stay
        # inside codegen and emit the identical (cell, a, b) set
        pairs = df.select(
            cx, cy, F.explode(F.col("__sa")).alias("__a"), "__sb"
        ).select(cx, cy, "__a", F.explode(F.col("__sb")).alias("__b"))
        return pairs.select(cx, cy, "__a.*", "__b.*")

    # fast path (r10): a cell whose BOTH member lists fit one block is
    # its own bounded task already (<= block^2 pairs) — explode it in
    # place in the grouping task, skipping the spine explode and the
    # spreading repartition exchange. Only oversized cells — the skew
    # case the spine exists for — pay the extra shuffle.
    fits = (F.size(la) <= block) & (F.size(lb) <= block)
    small = j.where(fits).select(
        cx, cy, la.alias("__sa"), lb.alias("__sb"))
    hot = j.where(~fits)
    na = F.ceil(F.size(la) / F.lit(block)).cast("int")
    nb = F.ceil(F.size(lb) / F.lit(block)).cast("int")
    spine = F.flatten(F.transform(
        F.sequence(F.lit(0), na - 1),
        lambda i: F.transform(
            F.sequence(F.lit(0), nb - 1),
            lambda jj: F.struct(i.alias("bi"), jj.alias("bj")),
        ),
    ))
    tasks = (
        hot.select(cx, cy, "__la", "__lb", F.explode(spine).alias("__t"))
        .select(
            cx, cy,
            F.slice(F.col("__la"), F.col("__t.bi") * block + 1, block)
            .alias("__sa"),
            F.slice(F.col("__lb"), F.col("__t.bj") * block + 1, block)
            .alias("__sb"),
        )
        .repartition(sess.sparkContext.defaultParallelism)
    )
    if _tasks_probe is not None:           # test seam: the task spine
        _tasks_probe.append(tasks)
    return _explode_pairs(small).unionByName(_explode_pairs(tasks))


_NUM = r"-?[0-9.eE+]+"

def _wkt_axis_sql(col: str, axis: int) -> str:
    """SQL text for array<double> of just the x (axis=0) or y (axis=1)
    coordinates of a WKT string: a global regex keeps one number of each
    `x y` pair, then trim + split + array cast — all whole-stage codegen,
    no lambdas. One SQL string = one py4j parse (see wkt_nums_sql)."""
    rep = "$1" if axis == 0 else "$2"
    return ("cast(split(regexp_replace(regexp_replace(" + col +
            f", '({_NUM})\\\\s+({_NUM})', '{rep}')"
            ", '^[^-0-9.]+|[^-0-9.eE+]+$', ''), '[^-0-9.eE+]+') as array<double>)")

def wkt_bbox(col: str):
    """(x1, y1, x2, y2) bounding-box Columns of ANY WKT geometry (column
    name or SQL fragment), computed in the JVM — whole-stage codegen, no
    Python, no rect assumption."""
    xs, ys = _wkt_axis_sql(col, 0), _wkt_axis_sql(col, 1)
    return (F.expr(f"array_min({xs})"), F.expr(f"array_min({ys})"),
            F.expr(f"array_max({xs})"), F.expr(f"array_max({ys})"))

def geo_range_join(a_df: DataFrame, a_geom: str, b_df: DataFrame, b_geom: str,
                   grid: float = GRID,
                   keep: list[str] | None = None,
                   broadcast_b: bool = True) -> DataFrame:
    """General spatial range join on WKT geometry columns: rows of a × b
    whose geometries overlap. Returns `keep` columns (default: all of a's
    and b's) for every overlapping pair; `keep` is also the pair identity
    for dedup, so pass the columns that identify a pair.

    Plan shape (the one that survives 100 TB — Sedona's partitioned spatial
    join in DataFrame terms):
      1. JVM bbox per row (codegen), explode to covering grid cells;
      2. equi-join on cell id — hash-partitioned, never a cross join;
      3. bbox-overlap prefilter (codegen), then immediate projection to
         `keep` — WKT strings survive ONLY on rows that need the kernel
         (nulled for rectangle pairs), so the dedup shuffle moves narrow
         rows no matter how wide the geometries are;
      4. dropDuplicates on `keep` — also the materialization point both
         result branches share (ReusedExchange), so the candidate subtree
         runs once;
      5. exact predicate: for rectangle pairs the bbox test is already
         exact (JVM, done); remaining pairs cross to the kernel's general
         intersection test in an Arrow batch.
    """
    from collections.abc import Iterator

    import pandas as pd

    from ..kernel import boolean as KB
    from ..kernel import geom as KG
    from .dissolve import is_rect_sql, wkt_nums_sql

    ax1, ay1, ax2, ay2 = wkt_bbox(f"`{a_geom}`")
    bx1, by1, bx2, by2 = wkt_bbox(f"`{b_geom}`")
    # materialization barrier (r10): without it Catalyst collapses these
    # projections into every downstream reference, so the WKT-regex bbox
    # chains re-evaluate per JOIN-OUTPUT row (once per probed cell x
    # candidate) instead of once per input row — measured 84 s vs 6 s on
    # geo_range_join_count at sf0.1. One lazy checkpoint per side pins
    # the 4 bbox doubles + the rect flag next to the geometry text.
    a = a_df.select(
        "*", ax1.alias("__ax1"), ay1.alias("__ay1"),
        ax2.alias("__ax2"), ay2.alias("__ay2"),
        F.expr(is_rect_sql(wkt_nums_sql(f"`{a_geom}`"))).alias("__arect"),
    ).localCheckpoint(eager=False)
    b = b_df.select(
        "*", bx1.alias("__bx1"), by1.alias("__by1"),
        bx2.alias("__bx2"), by2.alias("__by2"),
        F.expr(is_rect_sql(wkt_nums_sql(f"`{b_geom}`"))).alias("__brect"),
    ).localCheckpoint(eager=False)
    def cells(df, x1, y1, x2, y2):
        return df.withColumn(
            "__cx", F.explode(F.sequence(
                F.floor(F.col(x1) / grid), F.floor(F.col(x2) / grid)))
        ).withColumn(
            "__cy", F.explode(F.sequence(
                F.floor(F.col(y1) / grid), F.floor(F.col(y2) / grid)))
        )

    keep_all = keep or (list(a_df.columns)
                        + [c for c in b_df.columns if c not in a_df.columns])
    both_rect = F.coalesce(F.col("__arect") & F.col("__brect"), F.lit(False))
    b_cells = cells(b, "__bx1", "__by1", "__bx2", "__by2")
    if broadcast_b:
        # cell-id cardinality can be low (dense data, coarse grid), which
        # would skew a shuffle join onto a handful of keys — broadcast the
        # dimension side when it fits (caller disables for large×large,
        # where the cell keys are plentiful and the shuffle join is right)
        joined = cells(a, "__ax1", "__ay1", "__ax2", "__ay2").join(
            F.broadcast(b_cells), ["__cx", "__cy"])
    else:
        # shuffle path: hot-cell block decomposition — a dense cell fans
        # out into CELL_BLOCK-slice tasks instead of landing one task
        joined = _cell_block_join(
            cells(a, "__ax1", "__ay1", "__ax2", "__ay2"),
            [c for c in a.columns],
            b_cells,
            [c for c in b.columns if c not in a.columns],
        )
    cand = (
        joined
        .where(
            (F.col("__ax1") < F.col("__bx2")) & (F.col("__bx1") < F.col("__ax2"))
            & (F.col("__ay1") < F.col("__by2")) & (F.col("__by1") < F.col("__ay2"))
        )
        .select(
            *keep_all,
            both_rect.alias("__fastpair"),
            F.when(~both_rect, F.col(a_geom)).alias("__ga"),
            F.when(~both_rect, F.col(b_geom)).alias("__gb"),
        )
        # dedup on ALL columns, not a subset: the extras are functionally
        # dependent on the pair, and subset-dedup would turn them into
        # first() aggregates — which forces a SortAggregate over every
        # candidate row instead of a hash aggregate
        .dropDuplicates()
    )

    # ONE pass over the deduped candidates: rectangle pairs ride through on
    # the flag (no parsing), only the rare general pairs hit the kernel.
    # A fast/slow branch-and-union would recompute the candidate subtree
    # per branch (column pruning makes the copies differ, defeating
    # ReuseExchange) — measured 2-4x slower.
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in cand.select(*keep_all).schema.fields
    )

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            fastmask = pdf["__fastpair"].fillna(False).to_numpy(dtype=bool)
            slow = pdf.loc[~fastmask]
            if len(slow):
                ok = [
                    KB.intersection_area(KG.parse_wkt(ga), KG.parse_wkt(gb)) > 0
                    for ga, gb in zip(slow["__ga"], slow["__gb"])
                ]
                keep_rows = pdf.loc[fastmask, keep_all]
                yield pd.concat([keep_rows, slow.loc[ok, keep_all]])
            else:
                yield pdf.loc[fastmask, keep_all]

    return cand.mapInPandas(exact, schema=out_schema)

def spatial_range_join(spark: SparkSession, sf_dir: str,
                       broadcast_dim: bool = True) -> DataFrame:
    """For every region, how many land-use parcels *spatially* overlap it
    (strict interior overlap, not just FK membership).

    broadcast_dim=False is the documented scale fallback (SCALING.md):
    when the dimension's exploded cell table outgrows the broadcast
    budget, the SAME pair generator runs as a hash join on the (cx, cy)
    cell ids — both sides shuffle once on cell id, the reference-point
    dedup predicate stays row-local, and the output is bit-identical
    (pinned by test_spatial_range_join_forced_fallback)."""
    lu = fixtures.land_use_areas(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    lu_cells = _cells(lu.select("property_id", "x1", "y1", "x2", "y2"),
                      "x1", "y1", "x2", "y2")
    rg_cells = _cells(regions.select("id", "gx1", "gy1", "gx2", "gy2"),
                      "gx1", "gy1", "gx2", "gy2")
    if broadcast_dim:
        joined = lu_cells.join(F.broadcast(rg_cells), ["cx", "cy"])
    else:
        # shuffle path with hot-cell block decomposition (r8 verdict
        # item 3): same candidate set, bounded per-task pair fan-out
        joined = _cell_block_join(
            lu_cells, ["property_id", "x1", "y1", "x2", "y2"],
            rg_cells, ["id", "gx1", "gy1", "gx2", "gy2"],
            cell_cols=("cx", "cy"),
        )
    pairs = (
        joined
        .where(
            (F.col("x1") < F.col("gx2")) & (F.col("gx1") < F.col("x2"))
            & (F.col("y1") < F.col("gy2")) & (F.col("gy1") < F.col("y2"))
            # reference-point dedup (the standard partitioned-spatial-join
            # trick): a pair meeting in several cells is counted ONLY in the
            # cell containing the intersection's lower-left corner, so the
            # aggregate needs no distinct — dup elimination is a row-local
            # predicate instead of a second shuffle
            & (F.col("cx") == F.floor(F.greatest("x1", "gx1") / GRID))
            & (F.col("cy") == F.floor(F.greatest("y1", "gy1") / GRID))
        )
        .select("id", "property_id")
    )
    # distinct-free: each overlapping pair survives exactly once, and since
    # the parcel side never shuffles (broadcast cells + row-local dedup),
    # the count aggregate's map-side partials are the only exchange
    return pairs.groupBy("id").agg(
        F.count("property_id").alias("n_overlapping")
    )

# plain count(*): reference-point dedup emits each overlapping (region,
# parcel-row) pair exactly once, matching the oracle join's row count
SPATIAL_RANGE_JOIN_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT r.id, count(*) AS n_overlapping
FROM regions r
JOIN land_use lu
  ON lu.x1 < r.gx2 AND r.gx1 < lu.x2
 AND lu.y1 < r.gy2 AND r.gy1 < lu.y2
GROUP BY r.id
"""

# count(DISTINCT ...) for the WKT-driven variant: its pair generator dedups
# on the pair KEY, and property_id is not unique in the synthetic fixture
# (the driver's lineitem has duplicate (orderkey, linenumber) pairs)
GEO_RANGE_JOIN_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT r.id, count(DISTINCT lu.property_id) AS n_overlapping
FROM regions r
JOIN land_use lu
  ON lu.x1 < r.gx2 AND r.gx1 < lu.x2
 AND lu.y1 < r.gy2 AND r.gy1 < lu.y2
GROUP BY r.id
"""

DWITHIN_D = 5

def st_dwithin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per region: how many order-derived POINTs lie within DWITHIN_D of
    the region polygon — the classic Sedona ST_DWithin join, r6's typed
    kernel driving a real join predicate rather than a projection.

    Scale shape (same contract as spatial_range_join): regions explode
    ONCE to the grid cells of their D-expanded bbox; each point names its
    single cell; the pair space is an equi-join on cell ids (a point
    within D of a region is inside the expanded bbox, hence in one of its
    cells — and a point has exactly one cell, so no pair dedup is
    needed). The exact predicate is the registered ST_DWithin over the
    point WKT vs the region polygon WKT — boundary-exact, because
    distances here are sqrt(integer) compared against an integer D."""
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    o = _rpc(spark, f"{sf_dir}/orders.parquet")
    pts = IO.spread_scan(o.selectExpr(
        "o_orderkey AS point_id",
        "o_custkey % 100 AS px",
        "(o_orderkey * 7) % 100 AS py",
    )).selectExpr(
        "point_id", "px", "py",
        f"CAST(floor(px / {GRID}) AS BIGINT) AS cx",
        f"CAST(floor(py / {GRID}) AS BIGINT) AS cy",
        "concat('POINT (', px, ' ', py, ')') AS pt",
    )
    regions = fixtures.geographic_regions(spark, sf_dir)
    rg_cells = _cells(
        regions.selectExpr(
            "id", "region_geometry",
            f"gx1 - {DWITHIN_D} AS ex1", f"gy1 - {DWITHIN_D} AS ey1",
            f"gx2 + {DWITHIN_D} + 1 AS ex2", f"gy2 + {DWITHIN_D} + 1 AS ey2",
        ),
        "ex1", "ey1", "ex2", "ey2",
    ).select("id", "region_geometry", "cx", "cy")
    cand = pts.join(F.broadcast(rg_cells), ["cx", "cy"])
    hits = cand.where(F.expr(
        f"ST_DWithin(pt, region_geometry, CAST({DWITHIN_D} AS DOUBLE))"))
    return hits.groupBy("id").agg(F.count("point_id").alias("n_within"))

ST_DWITHIN_JOIN_ORACLE = f"""
WITH {fixtures.REGIONS_CTE.strip()},
pts AS (
    SELECT o_orderkey AS point_id,
           o_custkey % 100        AS px,
           (o_orderkey * 7) % 100 AS py
    FROM orders
)
SELECT r.id, count(*) AS n_within
FROM regions r
JOIN pts p
  ON greatest(r.gx1 - p.px, p.px - r.gx2, 0) * greatest(r.gx1 - p.px, p.px - r.gx2, 0)
   + greatest(r.gy1 - p.py, p.py - r.gy2, 0) * greatest(r.gy1 - p.py, p.py - r.gy2, 0)
   <= {DWITHIN_D * DWITHIN_D}
GROUP BY r.id
"""

def geo_range_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range join driven purely by WKT geometry columns (no numeric
    side-channel): overlapping (region, parcel) pairs counted per region.
    Same answer as spatial_range_join — one operator, two front doors."""
    lu = fixtures.land_use_areas(spark, sf_dir).select("property_id", "land_geometry")
    rg = fixtures.geographic_regions(spark, sf_dir).select("id", "region_geometry")
    # parcels stream as side a; the 50-region dim is side b (broadcast);
    # keep only the id pair so no WKT reaches any shuffle
    pairs = geo_range_join(lu, "land_geometry", rg, "region_geometry",
                           keep=["id", "property_id"])
    return pairs.groupBy("id").agg(
        F.countDistinct("property_id").alias("n_overlapping")
    )

def points_in_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join — the most common geospatial query shape:
    synthetic points (one per order, coordinates from order attributes)
    counted per containing region.

    Points are the cheap case of the grid join: each point lands in exactly
    ONE cell (no explode fan-out on the big side), the region cells
    broadcast, and containment is a row-local bbox check — so the plan is
    scan → broadcast join → filter → one count aggregate. At 100 TB the
    point side streams through unshuffled; this is strictly lighter than
    the rect-rect range join.

    Overlapping regions both count their shared points (the grid is 12
    apart with 15-wide cells), so the per-region counts legitimately
    double-count boundary points — same semantics as the SQL oracle.
    """
    o = _t_orders(spark, sf_dir)
    pts = o.select(
        F.col("o_orderkey").alias("point_id"),
        (F.col("o_custkey") % 100).alias("px"),
        ((F.col("o_orderkey") * 7) % 100).alias("py"),
    )
    regions = fixtures.geographic_regions(spark, sf_dir)
    rg_cells = _cells(regions.select("id", "gx1", "gy1", "gx2", "gy2"),
                      "gx1", "gy1", "gx2", "gy2")
    pt_cells = pts.select(
        "point_id", "px", "py",
        F.floor(F.col("px") / GRID).alias("cx"),
        F.floor(F.col("py") / GRID).alias("cy"),
    )
    return (
        pt_cells.join(F.broadcast(rg_cells), ["cx", "cy"])
        .where((F.col("gx1") <= F.col("px")) & (F.col("px") < F.col("gx2"))
               & (F.col("gy1") <= F.col("py")) & (F.col("py") < F.col("gy2")))
        .groupBy("id").agg(F.count("*").alias("n_points"))
    )

def _t_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rpc(spark, f"{sf_dir}/orders.parquet")

POINTS_IN_REGIONS_ORACLE = f"""
WITH {fixtures.REGIONS_CTE.strip()},
pts AS (
    SELECT o_orderkey AS point_id,
           o_custkey % 100 AS px,
           (o_orderkey * 7) % 100 AS py
    FROM orders
)
SELECT r.id, count(*) AS n_points
FROM regions r
JOIN pts p ON r.gx1 <= p.px AND p.px < r.gx2
          AND r.gy1 <= p.py AND p.py < r.gy2
GROUP BY r.id
"""

# ------------------------------------------------------- spatial KNN join

KNN_K = 3

def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-nearest-neighbor spatial join: for every point, the KNN_K regions
    with the closest centroid (squared euclidean; ties by region id).

    Plan shape: the 50-region dimension collapses to ONE array-of-structs
    row, broadcast to every task; each point computes distance + top-k
    entirely ROW-LOCALLY (transform → array_sort → slice) and explodes only
    its k winners. The point side never hash-shuffles and no per-pair row
    ever materializes — at 100 TB this is scan → map → done, the same shape
    as a dimension-array lookup join (the one round-robin repartition below
    exists only to split the fixture's single-row-group file). For dims too
    big to broadcast as an array, use knn_join_grid below — the
    implemented expanding-ring grid fallback, bit-identical output
    (tests/test_operators.py::test_knn_grid_fallback_matches_broadcast_path).

    Distances stay in exact integer arithmetic (doubled coordinates avoid
    the 0.5 centroid fraction) so cross-engine comparison is bit-exact.
    """
    o = _t_orders(spark, sf_dir)
    pts = o.select(
        F.col("o_orderkey").alias("point_id"),
        (F.col("o_custkey") % 100).alias("px"),
        ((F.col("o_orderkey") * 7) % 100).alias("py"),
    )
    # the testdata parquet is single-row-group → ONE scan split; the
    # distance/sort work is CPU-bound per point, so spread the narrow
    # (id, x, y) rows across all cores before the map stage. On a real
    # multi-split table spread_scan leaves the scan untouched.
    pts = IO.spread_scan(pts)
    regions = fixtures.geographic_regions(spark, sf_dir)
    dim = regions.agg(F.collect_list(F.struct(
        (F.col("gx1") + F.col("gx2")).alias("sx"),
        (F.col("gy1") + F.col("gy2")).alias("sy"),
        F.col("id"),
    )).alias("dims"))
    dx = lambda d: 2 * F.col("px") - d["sx"]  # noqa: E731
    dy = lambda d: 2 * F.col("py") - d["sy"]  # noqa: E731
    cand = F.transform(F.col("dims"), lambda d: F.struct(
        (dx(d) * dx(d) + dy(d) * dy(d)).cast("bigint").alias("dist2"),
        d["id"].alias("region_id"),
    ))
    # array_sort on structs is lexicographic (dist2, then region_id) — the
    # tie-break is part of the sort key, no second pass needed
    nn = F.slice(F.array_sort(cand), 1, KNN_K)
    return (
        pts.crossJoin(F.broadcast(dim))
        .select("point_id", F.posexplode(nn).alias("pos", "nn"))
        .select(
            "point_id",
            (F.col("pos") + 1).cast("bigint").alias("rank"),
            F.col("nn.region_id").alias("region_id"),
            F.col("nn.dist2").alias("dist2"),
        )
    )

def knn_join_numpy(spark: SparkSession, sf_dir: str,
                   k: int = KNN_K) -> DataFrame:
    """knn_join's Arrow-batched numpy path: same query, same bit-exact
    output, but the per-point distance/top-k runs as ONE vectorized numpy
    computation per Arrow batch instead of interpreted higher-order
    lambdas per point (transform/array_sort evaluate outside codegen at
    ~µs per element — 50 regions x 1.5M points at sf1 made the lambda
    form the steepest curve in BENCH_SWEEP_r4).

    The 50-row dimension is collected driver-side and closed over — the
    same bounded-artifact contract as the IVF centroid / PQ codebook
    collects (operators/similarity.py); the point side streams through
    mapInPandas unshuffled, so the scale shape is identical to the
    broadcast-array form: scan -> map -> done.

    Tie-break (dist2, then region id) is folded into one exact float64
    sort key dist2 * mult + id with mult = max_id + 1: dist2, mult, and id
    are integers and dist2 * mult + id < 2^53, so the float64 key is exact
    and its order IS the lexicographic (dist2, id) order. The bound is
    CHECKED (raise, not assert — asserts vanish under python -O and a
    silent overflow would produce wrong-but-plausible rankings).
    """
    import numpy as np
    import pandas as pd

    o = _t_orders(spark, sf_dir)
    pts = o.select(
        F.col("o_orderkey").alias("point_id"),
        (F.col("o_custkey") % 100).alias("px"),
        ((F.col("o_orderkey") * 7) % 100).alias("py"),
    )
    pts = IO.spread_scan(pts)
    regions = fixtures.geographic_regions(spark, sf_dir)
    dim = regions.select(
        (F.col("gx1") + F.col("gx2")).alias("sx"),
        (F.col("gy1") + F.col("gy2")).alias("sy"), "id",
    ).collect()
    sx = np.array([r.sx for r in dim], dtype=np.float64)
    sy = np.array([r.sy for r in dim], dtype=np.float64)
    ids = np.array([r.id for r in dim], dtype=np.int64)
    mult = float(ids.max() + 1)

    def topk(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            px = pdf["px"].to_numpy(dtype=np.float64)
            py = pdf["py"].to_numpy(dtype=np.float64)
            dx = 2.0 * px[:, None] - sx[None, :]
            dy = 2.0 * py[:, None] - sy[None, :]
            d2 = dx * dx + dy * dy
            if d2.max() * mult + ids.max() >= 2.0 ** 53:
                raise ValueError(
                    "knn_join_numpy tie-break key overflows exact float64 "
                    f"range (max dist2 {d2.max()}, {len(ids)} regions)")
            key = d2 * mult + ids[None, :]
            # a dimension with <= k regions degrades gracefully to fewer
            # rows (full argsort), matching the F.slice-of-sorted-array
            # variant registered under the same oracle — argpartition with
            # kth = k-1 would raise "kth out of bounds" instead
            ke = min(k, len(ids))
            if ke < len(ids):
                part = np.argpartition(key, ke - 1, axis=1)[:, :ke]
            else:
                part = np.broadcast_to(
                    np.arange(ke), (len(pdf), ke)).copy()
            rowk = np.take_along_axis(key, part, axis=1)
            order = np.argsort(rowk, axis=1)
            nn = np.take_along_axis(part, order, axis=1)
            n = len(pdf)
            yield pd.DataFrame({
                "point_id": np.repeat(pdf["point_id"].to_numpy(), ke),
                "rank": np.tile(np.arange(1, ke + 1, dtype=np.int64), n),
                "region_id": ids[nn].ravel(),
                "dist2": np.take_along_axis(d2, nn, axis=1)
                .ravel().astype(np.int64),
            })

    return pts.mapInPandas(
        topk, "point_id bigint, rank bigint, region_id bigint, dist2 bigint"
    )


def knn_join_grid(spark: SparkSession, sf_dir: str, cell: int = 25,
                  k: int = KNN_K) -> DataFrame:
    """The non-broadcast KNN fallback: grid-partitioned dimension with
    expanding neighbor-cell probing — the scale path for dimensions too big
    to collapse into one broadcast array (the watch item flagged in r2;
    same answer as knn_join, proven by sharing KNN_JOIN_ORACLE).

    Classic grid-KNN (Simba/Sedona partitioned-KNN shape) in DataFrame ops:
      1. dimension centroids land in grid cells ONCE (no per-point work);
      2. each point probes the (2r+1)² cells of Chebyshev ring r around its
         own cell via an explode → EQUI-join on cell id — hash-partitioned,
         never a cross join, never a broadcast of the whole dimension;
      3. per-point top-k by window rank over the bounded candidate set;
      4. a point is DONE when it found k candidates and its kth distance is
         ≤ r·cellsize — the ring provably contains every centroid that
         close (per-axis: |Δcell| ≤ r covers |Δcoord| ≤ r·cellsize), so no
         closer centroid can exist outside the probed cells;
      5. unresolved points re-probe with r doubled; the final ring covers
         the whole domain, so termination is unconditional.

    At 100 TB both sides shuffle only on cell ids (points once per round,
    the dim once at the start), the fan-out per round is (2r+1)² rows per
    REMAINING point, and rounds fall geometrically — dense data resolves
    in round 1, stragglers pay proportionally to their local sparsity.
    Distances stay in exact integer arithmetic (doubled coordinates), so
    results are bit-identical to the broadcast variant and the oracle.
    """
    o = _t_orders(spark, sf_dir)
    pts = IO.spread_scan(o.select(
        F.col("o_orderkey").alias("point_id"),
        (F.col("o_custkey") % 100).alias("px"),
        ((F.col("o_orderkey") * 7) % 100).alias("py"),
    ))
    regions = fixtures.geographic_regions(spark, sf_dir)
    # doubled coordinates (2·centroid = gx1+gx2) keep everything integral;
    # the doubled cell width is 2·cell so cell ids match plain-space cells
    dcell = 2 * cell
    dimc = regions.select(
        (F.col("gx1") + F.col("gx2")).alias("sx"),
        (F.col("gy1") + F.col("gy2")).alias("sy"),
        F.col("id").alias("region_id"),
        F.floor((F.col("gx1") + F.col("gx2")) / dcell).alias("cx"),
        F.floor((F.col("gy1") + F.col("gy2")) / dcell).alias("cy"),
    # the dim cells join into EVERY probe round AND the bounds agg —
    # truncate once instead of replaying the dim scan per consumer
    ).localCheckpoint(eager=False)
    ptc = pts.select(
        "point_id", "px", "py",
        F.floor(2 * F.col("px") / dcell).alias("pcx"),
        F.floor(2 * F.col("py") / dcell).alias("pcy"),
    )
    # smallest ring guaranteed to cover every dim cell from every point cell
    db = dimc.agg(F.min("cx"), F.max("cx"), F.min("cy"), F.max("cy")).first()
    pb = ptc.agg(F.min("pcx"), F.max("pcx"), F.min("pcy"), F.max("pcy")).first()
    if any(v is None for v in (*db, *pb)):
        # an empty side has NULL bounds: no (point, neighbor) pair exists —
        # return the empty result with the output schema instead of a
        # TypeError out of the max() below
        return spark.createDataFrame(
            [], "point_id bigint, rank bigint, region_id bigint, dist2 bigint")
    r_cover = int(max(abs(pb[1] - db[0]), abs(db[1] - pb[0]),
                      abs(pb[3] - db[2]), abs(db[3] - pb[2]), 1))

    from pyspark.sql import Window

    w = Window.partitionBy("point_id").orderBy("dist2", "region_id")
    resolved: list[DataFrame] = []
    rem = ptc
    r = 1
    while True:
        probe = (
            rem.withColumn("__dx", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .withColumn("__dy", F.explode(F.sequence(F.lit(-r), F.lit(r))))
            .select(
                "point_id", "px", "py",
                (F.col("pcx") + F.col("__dx")).alias("cx"),
                (F.col("pcy") + F.col("__dy")).alias("cy"),
            )
        )
        dxe = 2 * F.col("px") - F.col("sx")
        dye = 2 * F.col("py") - F.col("sy")
        topk = (
            probe.join(dimc, ["cx", "cy"])
            .select(
                "point_id", "region_id",
                (dxe * dxe + dye * dye).cast("bigint").alias("dist2"),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            # topk feeds BOTH the done-test aggregate and the resolved
            # semi-join; one truncation = one evaluation per round
            .localCheckpoint(eager=False)
        )
        if r >= r_cover:
            resolved.append(topk)
            break
        # done = k found AND kth distance certainly inside the probed ring
        done = (
            topk.groupBy("point_id")
            .agg(F.count("*").alias("__n"), F.max("dist2").alias("__dk"))
            .where((F.col("__n") == k) & (F.col("__dk") <= (r * dcell) ** 2))
            .select("point_id")
        )
        resolved.append(topk.join(done, "point_id", "left_semi"))
        rem = rem.join(done, rem["point_id"] == done["point_id"], "left_anti")
        # truncate lineage: each round's rem otherwise re-plans all priors
        rem = rem.localCheckpoint(eager=True)
        if not rem.take(1):
            break
        r *= 2

    out = resolved[0]
    for df in resolved[1:]:
        out = out.unionByName(df)
    return out.select(
        "point_id", F.col("rank").cast("bigint").alias("rank"),
        "region_id", "dist2",
    )

KNN_JOIN_ORACLE = f"""
WITH {fixtures.REGIONS_CTE.strip()},
pts AS (
    SELECT o_orderkey AS point_id,
           o_custkey % 100 AS px,
           (o_orderkey * 7) % 100 AS py
    FROM orders
),
d AS (
    SELECT p.point_id, r.id AS region_id,
           (2 * p.px - (r.gx1 + r.gx2)) * (2 * p.px - (r.gx1 + r.gx2))
         + (2 * p.py - (r.gy1 + r.gy2)) * (2 * p.py - (r.gy1 + r.gy2)) AS dist2
    FROM pts p CROSS JOIN regions r
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY point_id ORDER BY dist2, region_id) AS rank
    FROM d
)
SELECT point_id, rank, region_id, dist2
FROM ranked WHERE rank <= {KNN_K}
"""

# --------------------------------------------------- trajectory similarity

TRAJ_LEN = 12     # points per trajectory (first K events per user)
TRAJ_TAU_SQ = 64  # similarity threshold: symmetric Hausdorff² ≤ 64 (τ = 8)
TRAJ_CELL = 16    # blocking-grid cell size (≥ τ so ±1-cell is never needed)

def trajectory_similarity_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity search (REPOSE, ICDE 2021 shape): users walk a
    deterministic integer path (cumulative steps derived from their event
    ids, first TRAJ_LEN events by time); report all user pairs whose
    SYMMETRIC HAUSDORFF distance² is ≤ TRAJ_TAU_SQ.

    Exactness: positions, distances, and the Hausdorff max-min are all
    integer arithmetic — no floating point anywhere, so the oracle matches
    bit-for-bit. The max-min itself runs JVM-side as nested higher-order
    array functions (transform/array_min/array_max), no UDF.

    Scale — the blocking is SOUND for the threshold: if h_sym(A,B)² ≤ τ²
    then every point of A lies within τ of some point of B, so A's bbox
    intersects B's bbox expanded by τ; expanding each trajectory's bbox by
    τ and exploding it to TRAJ_CELL grid cells therefore co-locates every
    qualifying pair in ≥ 1 shared cell. Candidates never go all-pairs —
    the expensive O(len²) Hausdorff only runs inside cells, exactly the
    grid-prefilter contract of geo_range_join."""
    ev = _rpc(spark, f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TRAJ_LEN)
        .selectExpr(
            "user_id", "rn",
            "CAST(event_id % 5 - 2 AS BIGINT) AS dx",
            "CAST(CAST(floor(event_id / 5) AS BIGINT) % 5 - 2 AS BIGINT) AS dy",
        )
        .select(
            "user_id", "rn",
            # walks start from one of 25 shared home sites 50 steps
            # apart: same-home users can match, cross-home pairs are
            # geometrically impossible (walk reach 24 + 24 < 50 - tau), so
            # the blocking prefilter prunes ~96% of pairs NON-vacuously
            (F.expr("CAST(user_id % 5 AS BIGINT) * 50")
             + F.sum("dx").over(
                 Window.partitionBy("user_id").orderBy("rn")
                 .rowsBetween(Window.unboundedPreceding, 0))
             ).alias("x"),
            (F.expr("CAST(user_id % 25 AS BIGINT) DIV 5 * 50")
             + F.sum("dy").over(
                 Window.partitionBy("user_id").orderBy("rn")
                 .rowsBetween(Window.unboundedPreceding, 0))
             ).alias("y"),
        )
    )
    trajs = (
        pts.groupBy("user_id")
        .agg(F.array_sort(F.collect_list(F.struct("rn", "x", "y")))
             .alias("t"))
        .selectExpr(
            "user_id", "t",
            "array_min(transform(t, p -> p.x)) AS xmin",
            "array_max(transform(t, p -> p.x)) AS xmax",
            "array_min(transform(t, p -> p.y)) AS ymin",
            "array_max(transform(t, p -> p.y)) AS ymax",
        )
    )
    tau = int(TRAJ_TAU_SQ ** 0.5)
    cells = trajs.selectExpr(
        "user_id", "t", "xmin", "xmax", "ymin", "ymax",
        f"CAST(floor((xmin - {tau}) / {TRAJ_CELL}) AS INT) AS cxmin",
        f"CAST(floor((ymin - {tau}) / {TRAJ_CELL}) AS INT) AS cymin",
        f"explode(flatten(transform("
        f"  sequence(CAST(floor((xmin - {tau}) / {TRAJ_CELL}) AS INT),"
        f"           CAST(floor((xmax + {tau}) / {TRAJ_CELL}) AS INT)),"
        f"  cx -> transform("
        f"    sequence(CAST(floor((ymin - {tau}) / {TRAJ_CELL}) AS INT),"
        f"             CAST(floor((ymax + {tau}) / {TRAJ_CELL}) AS INT)),"
        f"    cy -> struct(cx, cy))))) AS cell",
    )
    # ---- per-cell verify (r6, closes the r5 sweep-slope item) ----------
    # The r5 shape joined the exploded cells pairwise, so BOTH 12-point
    # trajectories shipped through Arrow once per CANDIDATE PAIR — at
    # sf1's 3.6M candidates that is ~1.4 GB of duplicated coordinate
    # traffic, and profiling put ~80% of the 5-9 s wall there (the
    # numpy max-min itself is memory-bandwidth-fast). Candidates ≈
    # results at sf1 (3.63M : 2.89M — the blocking already prunes to
    # 1.26×), so the candidate SET cannot shrink; what shrinks is the
    # per-candidate traffic: group the exploded rows BY CELL and ship
    # each trajectory once per touched cell (~4 cells), then enumerate
    # the pair mask and run the same exact-integer Hausdorff cube with
    # numpy INSIDE the cell task. Pair-level Arrow volume drops ~100×
    # (one 12-pt array per user-cell vs 2 per pair); the candidate set,
    # the reference-point dedup rule, and the output are IDENTICAL.
    #
    # 100 TB shape: one shuffle of (user × touched-cells) rows keyed by
    # cell id; per-task work is O(members²) pair-mask bits + O(pairs ·
    # len²) verify, bounded by physical density per cell — a degenerate
    # mega-cell would take the _bucket_pairs block-decomposition spine
    # (operators/dedup.py:150), but grid cells are area-bounded so
    # occupancy grows with density, not corpus size.
    per_cell = cells.selectExpr(
        "cell.cx AS cx", "cell.cy AS cy", "user_id",
        "transform(t, p -> CAST(p.x AS DOUBLE)) AS xs",
        "transform(t, p -> CAST(p.y AS DOUBLE)) AS ys",
        "cxmin", "cymin", "xmin", "xmax", "ymin", "ymax",
    )
    import numpy as np
    import pandas as pd

    # bound the dense (pairs × len × len) workspace: chunk the pair list
    # so the distance cube stays ~tens of MB per task regardless of how
    # many pairs one cell holds
    CUBE_BUDGET = 4_000_000  # float64 cells per (pairs × la × lb) cube
    _EMPTY = pd.DataFrame({
        "ua": np.empty(0, np.int64),
        "ub": np.empty(0, np.int64),
        "hausdorff_sq": np.empty(0, np.int64),
    })

    def verify_cell(key, pdf):
        cx, cy = key
        # empty trajectories have no Hausdorff distance to anything (the
        # oracle's GROUP BY never emits one; adversarial inputs only) —
        # drop before the cube, where a zero-length side would make
        # min(axis=2) a zero-size reduction
        lens = pdf["xs"].str.len().to_numpy()
        if not (lens > 0).all():
            pdf = pdf.loc[lens > 0].reset_index(drop=True)
            lens = lens[lens > 0]
        n = len(pdf)
        if n < 2:
            return _EMPTY
        uid = pdf["user_id"].to_numpy(np.int64)
        x1 = pdf["xmin"].to_numpy(np.float64)
        x2 = pdf["xmax"].to_numpy(np.float64)
        y1 = pdf["ymin"].to_numpy(np.float64)
        y2 = pdf["ymax"].to_numpy(np.float64)
        cxm = pdf["cxmin"].to_numpy(np.int64)
        cym = pdf["cymin"].to_numpy(np.int64)
        # candidate-pair mask, all vectorized:
        #  * ua < ub once per unordered pair;
        #  * reference-point dedup (same trick as spatial_range_join):
        #    a pair can meet in up to (bbox/cell)² shared cells — evaluate
        #    it ONLY in the lower-left cell of its expanded-bbox
        #    intersection, which both sides name from their bbox minima;
        #  * mutual τ-expansion bbox containment (necessary for h_sym ≤ τ:
        #    every point of each trajectory within τ of the other ⇒ each
        #    bbox inside the other's τ-expansion), which reduces to
        #    |bbox-edge deltas| ≤ τ on all four edges
        P = uid[:, None] < uid[None, :]
        P &= np.maximum(cxm[:, None], cxm[None, :]) == cx
        P &= np.maximum(cym[:, None], cym[None, :]) == cy
        P &= np.abs(x1[:, None] - x1[None, :]) <= tau
        P &= np.abs(x2[:, None] - x2[None, :]) <= tau
        P &= np.abs(y1[:, None] - y1[None, :]) <= tau
        P &= np.abs(y2[:, None] - y2[None, :]) <= tau
        ii, jj = np.nonzero(P)
        if not len(ii):
            return _EMPTY
        L = int(lens.max())
        X = np.zeros((n, L)); Y = np.zeros((n, L))
        for i, (xa, ya) in enumerate(zip(pdf["xs"], pdf["ys"])):
            X[i, :len(xa)] = xa; Y[i, :len(ya)] = ya
        mask_len = np.arange(L)[None, :] < lens[:, None]
        out = []
        chunk = max(1, CUBE_BUDGET // (L * L))
        for st in range(0, len(ii), chunk):
            ic = ii[st:st + chunk]
            jc = jj[st:st + chunk]
            dx = X[ic][:, :, None] - X[jc][:, None, :]
            dy = Y[ic][:, :, None] - Y[jc][:, None, :]
            d2 = dx * dx + dy * dy
            del dx, dy
            mask_a = mask_len[ic]
            mask_b = mask_len[jc]
            d2b = np.where(mask_b[:, None, :], d2, np.inf)
            dab = np.where(mask_a, d2b.min(axis=2), -np.inf).max(axis=1)
            del d2b
            d2a = np.where(mask_a[:, :, None], d2, np.inf)
            dba = np.where(mask_b, d2a.min(axis=1), -np.inf).max(axis=1)
            del d2a, d2
            h = np.maximum(dab, dba)
            keep = h <= TRAJ_TAU_SQ
            out.append(pd.DataFrame({
                "ua": uid[ic[keep]],
                "ub": uid[jc[keep]],
                "hausdorff_sq": h[keep].astype(np.int64),
            }))
        return pd.concat(out, ignore_index=True) if out else _EMPTY

    # r14 (optimization round 2, the LOF _per_cell pattern): the
    # groupBy().applyInPandas protocol shipped ONE Arrow batch per grid
    # cell; rows now hash-partition and sort by cell once, and
    # mapInPandas streams whole partitions, looping the contiguous cell
    # groups in Python with the identical verify_cell body (at most the
    # batch-straddling tail group is carried between Arrow batches; a
    # cell group can never straddle partitions — the repartition keys
    # on the cell).
    rep = (per_cell.repartition(F.col("cx"), F.col("cy"))
           .sortWithinPartitions("cx", "cy"))

    def _stream_cells(batches):
        tail = None
        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
                tail = None
            if not len(pdf):
                continue
            lc, ld = pdf["cx"].iat[-1], pdf["cy"].iat[-1]
            is_tail = (pdf["cx"] == lc) & (pdf["cy"] == ld)
            tail = pdf.loc[is_tail]
            body = pdf.loc[~is_tail]
            outs = [out
                    for key, g in body.groupby(["cx", "cy"], sort=False)
                    for out in (verify_cell(
                        key, g.reset_index(drop=True)),)
                    if len(out)]
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if tail is not None and len(tail):
            out = verify_cell((tail["cx"].iat[0], tail["cy"].iat[0]),
                              tail.reset_index(drop=True))
            if len(out):
                yield out

    return rep.mapInPandas(
        _stream_cells, "ua bigint, ub bigint, hausdorff_sq bigint")

TRAJECTORY_SIMILARITY_ORACLE = f"""
WITH ranked AS (
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS rn
    FROM events
),
pts AS (
    SELECT user_id, rn,
           CAST(user_id % 5 AS BIGINT) * 50
               + sum(event_id % 5 - 2) OVER (
                   PARTITION BY user_id ORDER BY rn) AS x,
           CAST(user_id % 25 AS BIGINT) // 5 * 50
               + sum(CAST(floor(event_id / 5) AS BIGINT) % 5 - 2) OVER (
                   PARTITION BY user_id ORDER BY rn) AS y
    FROM ranked WHERE rn <= {TRAJ_LEN}
),
trajs AS (
    SELECT user_id,
           list(struct_pack(x := x, y := y) ORDER BY rn) AS t
    FROM pts GROUP BY user_id
)
SELECT a.user_id AS ua, b.user_id AS ub,
       CAST(greatest(
           list_max(list_transform(a.t, p -> list_min(list_transform(b.t,
               q -> (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y))))),
           list_max(list_transform(b.t, p -> list_min(list_transform(a.t,
               q -> (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)))))
       ) AS BIGINT) AS hausdorff_sq
FROM trajs a JOIN trajs b ON a.user_id < b.user_id
WHERE greatest(
           list_max(list_transform(a.t, p -> list_min(list_transform(b.t,
               q -> (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y))))),
           list_max(list_transform(b.t, p -> list_min(list_transform(a.t,
               q -> (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)))))
       ) <= {TRAJ_TAU_SQ}
"""


def st_intersects_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing `JOIN ON ST_Intersects(a, b)` shape (the classic
    Sedona spatial join), executed the scale way: grid-cell equi-join
    for candidates, reference-point dedup, and the registered
    ST_Intersects UDF as the pair predicate. CLOSED-boundary semantics
    (touching rects DO intersect — the variant spatial_range_join's
    strict interior overlap deliberately excludes), so the cell explode
    is inclusive of the exact upper edge: a parcel touching a region at
    x2 == gx1 must land in the same cell.

    100 TB: identical plan shape to spatial_range_join — one equi-join
    on cell ids (broadcast here; hash-join fallback documented there),
    dedup as a row-local predicate, one count exchange. The UDF verify
    rides the pair stream through the rect-pair interval fast path —
    the same arithmetic as the candidate filter, asserting the
    user-facing predicate agrees with the join plumbing on every pair."""
    from ..functions.spatial import register_spatial_functions
    from ..plans import fixtures

    register_spatial_functions(spark)
    lu = fixtures.land_use_areas(spark, sf_dir).where("property_id % 5 = 0")
    regions = fixtures.geographic_regions(spark, sf_dir)

    def cells_incl(df, x1, y1, x2, y2):
        # closed-boundary variant of _cells: upper edges inclusive
        return (df.withColumn(
            "cx", F.explode(F.sequence(F.floor(F.col(x1) / GRID),
                                       F.floor(F.col(x2) / GRID))))
            .withColumn(
            "cy", F.explode(F.sequence(F.floor(F.col(y1) / GRID),
                                       F.floor(F.col(y2) / GRID)))))

    lu_cells = cells_incl(
        lu.select("property_id", "x1", "y1", "x2", "y2", "land_geometry"),
        "x1", "y1", "x2", "y2")
    rg_cells = cells_incl(
        regions.select("id", "gx1", "gy1", "gx2", "gy2",
                       "region_geometry"),
        "gx1", "gy1", "gx2", "gy2")
    pairs = (
        lu_cells.join(F.broadcast(rg_cells), ["cx", "cy"])
        # reference-point dedup on the CLOSED intersection's lower-left
        # corner (well-defined for touching pairs too — the degenerate
        # intersection still has a unique lower-left corner)
        .where((F.col("cx") == F.floor(F.greatest("x1", "gx1") / GRID))
               & (F.col("cy") == F.floor(F.greatest("y1", "gy1") / GRID)))
        .where(F.expr("ST_Intersects(land_geometry, region_geometry)"))
        .select("id", "property_id")
    )
    return pairs.groupBy("id").agg(
        F.count("property_id").alias("n_intersecting"))


ST_INTERSECTS_JOIN_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT r.id, count(*) AS n_intersecting
FROM regions r
JOIN land_use lu
  ON lu.x1 <= r.gx2 AND r.gx1 <= lu.x2
 AND lu.y1 <= r.gy2 AND r.gy1 <= lu.y2
WHERE lu.property_id % 5 = 0
GROUP BY r.id
"""

"""Data-quality expectations and incremental aggregate maintenance —
warehouse-load machinery a production pipeline runs around every refresh
(the reference's only quality backstop is its unique output index,
ecs_loader/load_to_postgres.py:134-136; a 100 TB pipeline needs the
full expectation set as first-class queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

from ..streaming.events import _events


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _rpc(spark, f"{sf_dir}/{name}.parquet")


# ------------------------------------------------- expectations check

PRICE_MAX = 1_000_000.0
DATE_MIN, DATE_MAX = "1990-01-01", "2010-01-01"


def expectations_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over `orders`: null-rate, value-range,
    date-range, key-uniqueness, and referential-integrity rules evaluated
    in one result row (0 violations everywhere = publishable).

    Scale shape: the row-local rules (nulls, ranges) fold into ONE
    conditional-aggregate pass over the scan; uniqueness is one hash
    aggregate on the key; referential integrity is a left-anti join
    against the customer keys (broadcast when the dim fits, shuffle
    otherwise — Catalyst's choice). Three scans total, no collect until
    the final 1-row result."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    row_rules = o.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .alias("null_custkey"),
        F.sum(F.when(~F.col("o_totalprice").between(0.0, PRICE_MAX), 1)
              .otherwise(0)).alias("price_out_of_range"),
        F.sum(F.when(
            (F.col("o_orderdate") < F.lit(DATE_MIN).cast("timestamp"))
            | (F.col("o_orderdate") >= F.lit(DATE_MAX).cast("timestamp")),
            1).otherwise(0)).alias("date_out_of_range"),
    )
    dup_keys = (
        o.groupBy("o_orderkey").count().where(F.col("count") > 1)
        .agg(F.count("*").alias("dup_orderkeys"))
    )
    orphans = (
        o.join(c.select("c_custkey"),
               o["o_custkey"] == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("orphan_orders"))
    )
    return row_rules.crossJoin(dup_keys).crossJoin(orphans)


EXPECTATIONS_ORACLE = f"""
SELECT
    (SELECT count(*) FROM orders) AS n_rows,
    (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS null_custkey,
    (SELECT count(*) FROM orders
     WHERE o_totalprice NOT BETWEEN 0.0 AND {PRICE_MAX}) AS price_out_of_range,
    (SELECT count(*) FROM orders
     WHERE o_orderdate < TIMESTAMP '{DATE_MIN}'
        OR o_orderdate >= TIMESTAMP '{DATE_MAX}') AS date_out_of_range,
    (SELECT count(*) FROM (
        SELECT o_orderkey FROM orders GROUP BY o_orderkey
        HAVING count(*) > 1)) AS dup_orderkeys,
    (SELECT count(*) FROM orders
     WHERE NOT EXISTS (SELECT 1 FROM customer
                       WHERE c_custkey = o_custkey)) AS orphan_orders
"""


# -------------------------------------- incremental aggregate maintenance

ROLLUP_CUTOFF = "2024-01-15"


def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup maintenance: a stored base aggregate (events before the
    cutoff) merged with the delta batch's partial aggregate (events on or
    after it) via ONE full-outer join of two already-reduced relations —
    the incremental-refresh pattern that avoids rescanning history at
    every arrival. count/sum are mergeable; sums ride DECIMAL so the
    merged result is bit-identical to a full recompute (which is exactly
    what the oracle does). In production the base side is the previous
    snapshot table, not a re-scan — here both derive from the same file
    to keep the query self-contained."""
    ev = _events(spark, sf_dir)
    cut = F.lit(ROLLUP_CUTOFF).cast("timestamp")

    def agg(side: DataFrame, tag: str) -> DataFrame:
        return side.groupBy("user_id").agg(
            F.count("*").alias(f"{tag}_n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias(f"{tag}_sum"),
        )

    base = agg(ev.where(F.col("ts") < cut), "b")
    delta = agg(ev.where(F.col("ts") >= cut), "d")
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        base.join(delta, "user_id", "full")
        .select(
            "user_id",
            (F.coalesce(F.col("b_n"), F.lit(0))
             + F.coalesce(F.col("d_n"), F.lit(0))).alias("n_events"),
            (F.coalesce(F.col("b_sum"), zero)
             + F.coalesce(F.col("d_sum"), zero))
            .cast("double").alias("sum_value"),
        )
    )


INCREMENTAL_ROLLUP_ORACLE = """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
"""


def observed_load_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality metrics captured with the Observation API — Spark's
    mechanism for collecting aggregates ON THE SIDE of a real action, in
    the SAME pass over the data (a CollectMetrics node in the plan), where
    expectations_check pays a dedicated aggregation query.

    The observed action here is the filtered load itself (count of the
    rows a loader would move); the observation rides along and yields
    row count, null keys, quantity sum (exact DECIMAL), and date bounds
    of the loaded slice. The returned 1-row frame is built from the
    observation result, and the oracle recomputes the same aggregates —
    so the side-channel itself is value-checked.

    At 100 TB this is the difference between one scan and two: quality
    telemetry attaches to every production load without a second job.
    """
    from pyspark.sql import Observation

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 10)
    obs = Observation("load_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_loaded"),
        F.sum(F.col("l_orderkey").isNull().cast("long")).alias("null_keys"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.min(F.col("l_shipdate").cast("date")).alias("first_ship"),
        F.max(F.col("l_shipdate").cast("date")).alias("last_ship"),
    )
    observed.count()  # the "load" action; metrics captured in this pass
    m = obs.get
    return spark.createDataFrame(
        [(m["rows_loaded"], m["null_keys"], float(m["qty_sum"]),
          str(m["first_ship"]), str(m["last_ship"]))],
        "rows_loaded bigint, null_keys bigint, qty_sum double, "
        "first_ship string, last_ship string",
    )


OBSERVED_LOAD_METRICS_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS rows_loaded,
       CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS null_keys,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
       strftime(CAST(min(l_shipdate) AS DATE), '%Y-%m-%d') AS first_ship,
       strftime(CAST(max(l_shipdate) AS DATE), '%Y-%m-%d') AS last_ship
FROM lineitem
WHERE l_quantity > 10
"""

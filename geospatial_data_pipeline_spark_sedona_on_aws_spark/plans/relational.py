"""Relational operator breadth (SURVEY.md §7 phase 3): filters, sorts,
limits, joins of every flavor, distinct/rollup/pivot aggregates, window
functions, set ops, scalar functions — thin idiomatic DataFrame plans, each
with an exactly-equivalent DuckDB oracle.

The reference exercises only one join and one aggregation shape
(SURVEY.md §2.2-2.3); these fill out the engine surface a real user of a
Spark-based analytics engine needs.

Cross-engine determinism rules used throughout:
  - double-typed measures are summed as DECIMAL(18,2) (exact, order-free)
    and cast back to double at the end;
  - averages are computed as exact-sum / count in double;
  - every ORDER BY ... LIMIT has a unique-key tie-break;
  - no round() on half-representable values (engines differ on ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _rpc(spark, f"{sf_dir}/{name}.parquet")

def _dec(c) -> F.Column:
    return F.col(c).cast("decimal(18,2)") if isinstance(c, str) else c.cast("decimal(18,2)")

# ----------------------------------------------------------- q1 pricing

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )

Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

# --------------------------------------------------- q3 shipping priority

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )

Q3_ORACLE = """
SELECT l_orderkey, CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# ------------------------------------------------------- nation revenue

def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way join with broadcast dims: revenue per nation and region."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )

NATION_REVENUE_ORACLE = """
SELECT r_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

# --------------------------------------------------- semi / anti joins

def late_ship_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join with a correlated extra predicate (TPC-H Q4 shape):
    orders having at least one lineitem shipped after the order date."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    sel = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"]),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))

LATE_SHIP_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no 1995 orders, per segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("total_balance"),
        )
    )

CUSTOMERS_WITHOUT_ORDERS_ORACLE = """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1995)
GROUP BY c_mktsegment
"""

# ------------------------------------------------ distinct / rollup / pivot

def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_distinct_cust"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count("*").alias("n_orders"),
    )

DISTINCT_AGG_ORACLE = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_distinct_cust,
       count(DISTINCT o_orderpriority) AS n_priorities,
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""

def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("total_sales"),
        F.count("*").alias("n_orders"),
    )

ROLLUP_SALES_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )

PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders
GROUP BY o_orderpriority
"""

# ------------------------------------------------------------- set ops

def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(1994 buyers ∩ BUILDING customers) ∪ (negative-balance ∖ 1994 buyers)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    buyers_1994 = orders.where(F.year("o_orderdate") == 1994).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    building = cust.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    negative = cust.where(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("custkey")
    )
    return (
        buyers_1994.intersect(building)
        .union(negative.subtract(buyers_1994))
        .distinct()
    )

SET_OPS_ORACLE = """
(SELECT DISTINCT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1994
 INTERSECT
 SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
UNION
(SELECT c_custkey FROM customer WHERE c_acctbal < 0
 EXCEPT
 SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1994)
"""

# ----------------------------------------------------- sort/limit/scalars

def filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000))
        .select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )

FILTER_SORT_LIMIT_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(day(o_orderdate) AS BIGINT) AS order_day
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 100000
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar surface in one projection (all codegen'd JVM-side)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.floor("p_retailprice").cast("long").alias("price_floor"),
        F.ceil("p_retailprice").cast("long").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        (F.col("p_size") % 7).cast("long").alias("size_mod"),
        F.sqrt(F.col("p_size").cast("double")).alias("size_sqrt"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#00")), F.lit("UNKNOWN")).alias("brand_nz"),
    )

SCALAR_FUNCTIONS_ORACLE = """
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       lower(p_type) AS type_lower,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_name, 1, 8) AS name_prefix,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       CAST(abs(p_size - 25) AS BIGINT) AS size_dev,
       CAST(p_size % 7 AS BIGINT) AS size_mod,
       sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt,
       coalesce(nullif(p_brand, 'Brand#00'), 'UNKNOWN') AS brand_nz
FROM part
"""

# ------------------------------------------------------------- windows

def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "c_nationkey",
            F.col("rank").cast("int").alias("rank"),
            "c_custkey", "c_name", "c_acctbal",
        )
    )

TOP_CUSTOMERS_ORACLE = """
SELECT c_nationkey, CAST(rank AS INT) AS rank, c_custkey, c_name, c_acctbal
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
    FROM customer
)
WHERE rank <= 3
"""

def part_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank + lag + running decimal sum inside one brand-partitioned
    window — the analytic-function trifecta."""
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.asc("p_retailprice"), F.asc("p_partkey"))
    wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return part.select(
        "p_brand", "p_partkey", "p_retailprice",
        F.dense_rank().over(
            Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
        ).cast("long").alias("price_rank"),
        (F.col("p_retailprice") - F.lag("p_retailprice").over(w)).alias("price_step"),
        F.sum(_dec("p_retailprice")).over(wr).cast("double").alias("running_total"),
    )

PART_WINDOW_STATS_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice,
       CAST(dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS BIGINT) AS price_rank,
       p_retailprice - lag(p_retailprice) OVER w AS price_step,
       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) OVER (
            PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice ASC, p_partkey ASC)
"""

def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims + GROUPING() disambiguation (a NULL key value vs a
    rollup-level NULL are different things; grouping bits make the hash
    comparison unambiguous)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("total_sales"),
        F.count("*").alias("n_orders"),
        F.grouping_id().cast("long").alias("grp"),
    )

CUBE_SALES_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
       count(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""

def order_priority_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (the DataFrame API has no
    grouping-sets method; SQL text is the idiomatic route in both engines)."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__orders_gs")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               CAST(grouping_id() AS BIGINT) AS grp
        FROM __orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)

GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS grp
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

# --------------------------------------------------- SCD2 / CDC operators

def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: each customer's order
    stream becomes versioned rows with [valid_from, valid_to) intervals and
    a current flag — the snapshot-to-history derivation every warehouse-load
    pipeline needs (the reference only ever rebuilds full snapshots;
    blue-green publish S7-S9 pairs with this for incremental history).

    One window over (custkey ORDER BY date, orderkey): valid_to = next
    version's valid_from. No self-join — the window shuffle is the only
    exchange, and it scales by key cardinality, not history depth.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("valid_from"),
            F.col("o_orderkey").alias("version_key"),
            F.col("o_totalprice").alias("attr_totalprice"),
        )
        .withColumn("valid_to", F.lead("valid_from").over(
            Window.partitionBy("custkey").orderBy("valid_from", "version_key")))
        .withColumn("is_current", F.col("valid_to").isNull())
    )

SCD2_HISTORY_ORACLE = """
SELECT o_custkey AS custkey,
       CAST(o_orderdate AS TIMESTAMP_NS) AS valid_from,
       o_orderkey AS version_key,
       o_totalprice AS attr_totalprice,
       CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS TIMESTAMP_NS) AS valid_to,
       lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) IS NULL AS is_current
FROM orders
"""

def merge_upsert(snapshot: DataFrame, changes: DataFrame, key: str,
                 value_cols: list, op_col: str = "op") -> DataFrame:
    """MERGE INTO semantics on plain DataFrames: changes carry op in
    {'upsert','delete'}; matched upserts replace the snapshot row, unmatched
    upserts insert, deletes drop, untouched snapshot rows pass through.

    Shape: ONE full-outer join on the key — no per-row driver logic, no
    multiple passes; at scale this is a single co-partitioned shuffle (or
    broadcast when the change batch is small, which AQE picks up).
    """
    s = snapshot.alias("s")
    c = changes.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = F.col(f"c.{key}").isNull() | (F.col(f"c.{op_col}") != "delete")
    return joined.where(keep).select(
        F.coalesce(F.col(f"c.{key}"), F.col(f"s.{key}")).alias(key),
        *[
            F.when(F.col(f"c.{key}").isNotNull(), F.col(f"c.{v}"))
            .otherwise(F.col(f"s.{v}")).alias(v)
            for v in value_cols
        ],
    )

def cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply: the latest order per customer becomes a change record —
    final status 'F' customers are deletes, everyone else upserts a new
    balance; applied to the customer snapshot with merge_upsert."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("balance"),
    )
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("balance"),
            F.when(F.col("o_orderstatus") == "F", F.lit("delete"))
            .otherwise(F.lit("upsert")).alias("op"),
        )
    )
    return merge_upsert(cust, latest, "custkey", ["balance"])

CDC_MERGE_ORACLE = """
WITH latest AS (
    SELECT o_custkey AS custkey,
           o_totalprice AS balance,
           CASE WHEN o_orderstatus = 'F' THEN 'delete' ELSE 'upsert' END AS op
    FROM (
        SELECT *, row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
)
SELECT coalesce(l.custkey, c.c_custkey) AS custkey,
       CASE WHEN l.custkey IS NOT NULL THEN l.balance ELSE c.c_acctbal END AS balance
FROM customer c FULL OUTER JOIN latest l ON l.custkey = c.c_custkey
WHERE l.custkey IS NULL OR l.op != 'delete'
"""

# ----------------------------------------------- additional TPC-H-shape plans

Q18_QTY_THRESHOLD = 250

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): the aggregate-subquery-filter
    pattern — orders whose lineitem quantity total clears a threshold, joined
    back to customer detail.

    Scale shape: the inner aggregate reduces lineitem BEFORE any join (the
    heavy table is aggregated at its own grain first — never join-then-
    aggregate when the filter is on the aggregate), and its survivors are a
    tiny set that AQE broadcast-joins back to orders/customer.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY_THRESHOLD)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", F.col("total_qty").cast("double").alias("total_qty"),
        )
    )

Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS TIMESTAMP_NS) AS o_orderdate, o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
    SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > {Q18_QTY_THRESHOLD}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue per (supplier nation →
    customer nation) pair — two independent dimension branches hanging off
    the same fact row, both ending in broadcast joins against the 25-row
    nation table."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    n1 = nation.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(n1), supp["s_nationkey"] == n1["sk"])
        .join(F.broadcast(n2), cust["c_nationkey"] == n2["ck"])
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )

NATION_TRADE_FLOWS_ORACLE = """
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
GROUP BY 1, 2
"""

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery — orders with at least one
    lineitem shipped more than 90 days after the order date, per priority. Written as the literal
    EXISTS in SQL so Catalyst's subquery decorrelation (rewrite to left-semi
    join) does the planning — the engine does not hand-decorrelate."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__q4_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__q4_lineitem")
    return spark.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM __q4_orders
        WHERE EXISTS (
            SELECT 1 FROM __q4_lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAYS
        )
        GROUP BY o_orderpriority
    """)

Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 90 DAYS
)
GROUP BY o_orderpriority
"""

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery — lineitems whose
    quantity is below 20% of their part's average quantity; yearly-revenue
    style sum. DECIMAL for the final sum; the avg comparison itself is a
    filter (no float crosses the hash)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("__q17_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("__q17_part")
    return spark.sql("""
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
               count(*) AS n_items
        FROM __q17_lineitem, __q17_part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#13'
          AND l_quantity < (
              SELECT 0.2 * avg(l_quantity) FROM __q17_lineitem
              WHERE l_partkey = p_partkey
          )
    """)

Q17_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS small_qty_revenue,
       count(*) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#13'
  AND l_quantity < (
      SELECT 0.2 * avg(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p_partkey
  )
"""

# ------------------------------------------------------ window-function zoo

def window_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every window-function family over one shuffle of `orders`: ranking
    (row_number/rank/dense_rank/ntile), distribution (percent_rank/
    cume_dist), offsets (lag/lead), a ROWS running total, and a RANGE
    30-day-interval rolling sum. All windows share the o_custkey partition
    key, so the whole zoo rides ONE Exchange; ordering differences only
    re-sort within partitions. Money through DECIMAL as everywhere."""
    o = _t(spark, sf_dir, "orders")
    wseq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wpri = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    # RANGE frame needs a numeric order key: day count from a fixed epoch —
    # zone-free (NTZ date arithmetic), identical in both engines
    wrange = (
        Window.partitionBy("o_custkey")
        .orderBy(F.datediff(F.col("o_orderdate"), F.lit("1990-01-01")))
        .rangeBetween(-30, 0)
    )
    dec_price = F.col("o_totalprice").cast("decimal(18,2)")
    return o.select(
        "o_orderkey", "o_custkey",
        F.row_number().over(wseq).alias("rn"),
        F.rank().over(wpri).alias("rnk"),
        F.dense_rank().over(wpri).alias("drnk"),
        F.lag("o_orderkey").over(wseq).alias("prev_key"),
        F.lead("o_orderkey").over(wseq).alias("next_key"),
        F.ntile(4).over(wseq).alias("quartile"),
        F.percent_rank().over(wpri).alias("pr"),
        F.cume_dist().over(wpri).alias("cd"),
        F.sum(dec_price).over(
            wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").alias("run_total"),
        F.sum(dec_price).over(wrange).cast("double").alias("d30_total"),
    )

WINDOW_ZOO_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(row_number() OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS INT) AS rn,
       CAST(rank() OVER (PARTITION BY o_custkey
            ORDER BY o_orderpriority) AS INT) AS rnk,
       CAST(dense_rank() OVER (PARTITION BY o_custkey
            ORDER BY o_orderpriority) AS INT) AS drnk,
       lag(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS prev_key,
       lead(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS next_key,
       CAST(ntile(4) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey) AS INT) AS quartile,
       percent_rank() OVER (PARTITION BY o_custkey
            ORDER BY o_orderpriority) AS pr,
       cume_dist() OVER (PARTITION BY o_custkey
            ORDER BY o_orderpriority) AS cd,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_total,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey
            ORDER BY date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS d30_total
FROM orders
"""

# --------------------------------------------- Spark-4 SQL surface breadth

def recursive_supplier_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): walk an implicit supplier hierarchy where
    supplier k reports to floor(k/2) (a binary tree rooted at key 1),
    accumulating depth and the account-balance sum along each chain. The
    recursion is a genuine iterative fixpoint the optimizer unions level
    by level — per level one equi-join against the 10k-row dim; chains are
    log2(|supplier|) deep, so the plan is O(n log n) rows total.

    The integer step uses CAST(floor(cur / 2.0) AS BIGINT) — identical
    text and semantics in Spark SQL and DuckDB (avoiding the dialects'
    differing integer-division operators)."""
    for t in ("supplier",):
        _rpc(spark, f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql("""
        WITH RECURSIVE walk AS (
            SELECT s_suppkey AS suppkey, s_suppkey AS cur,
                   0 AS depth,
                   CAST(s_acctbal AS DECIMAL(18,2)) AS chain_bal
            FROM supplier
            UNION ALL
            SELECT w.suppkey, p.s_suppkey,
                   w.depth + 1,
                   CAST(w.chain_bal + CAST(p.s_acctbal AS DECIMAL(18,2))
                        AS DECIMAL(18,2))
            FROM walk w
            JOIN supplier p
              ON p.s_suppkey = CAST(floor(w.cur / 2.0) AS BIGINT)
            WHERE w.cur > 1
        )
        SELECT suppkey,
               CAST(depth AS BIGINT) AS depth,
               CAST(chain_bal AS DOUBLE) AS chain_bal
        FROM walk
        WHERE cur = 1
    """)

RECURSIVE_SUPPLIER_TREE_ORACLE = """
WITH RECURSIVE walk AS (
    SELECT s_suppkey AS suppkey, s_suppkey AS cur,
           0 AS depth,
           CAST(s_acctbal AS DECIMAL(18,2)) AS chain_bal
    FROM supplier
    UNION ALL
    SELECT w.suppkey, p.s_suppkey,
           w.depth + 1,
           CAST(w.chain_bal + CAST(p.s_acctbal AS DECIMAL(18,2))
                AS DECIMAL(18,2))
    FROM walk w
    JOIN supplier p
      ON p.s_suppkey = CAST(floor(w.cur / 2.0) AS BIGINT)
    WHERE w.cur > 1
)
SELECT suppkey,
       CAST(depth AS BIGINT) AS depth,
       CAST(chain_bal AS DOUBLE) AS chain_bal
FROM walk
WHERE cur = 1
"""

def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: top-3 orders by price per customer.
    Catalyst DECORRELATES this into a windowed ranking (no per-customer
    re-execution — check the plan for a single Window over one shuffle),
    which is exactly why the lateral formulation is safe at 100 TB: the
    written query is per-row, the executed plan is set-at-a-time."""
    for t in ("customer", "orders"):
        _rpc(spark, f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql("""
        SELECT c.c_custkey, l.o_orderkey,
               CAST(l.o_totalprice AS DOUBLE) AS o_totalprice
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 3
        ) l
    """)

LATERAL_TOPK_ORDERS_ORACLE = """
SELECT c.c_custkey, l.o_orderkey,
       CAST(l.o_totalprice AS DOUBLE) AS o_totalprice
FROM customer c,
LATERAL (
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 3
) l
"""

def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT: the four lineitem measures melted to (metric, value) rows —
    the wide→long reshape (inverse of pivot_order_status). Row-local
    generation, no shuffle; output is 4× the input rows with 2 columns,
    which is why at scale you unpivot AFTER filtering, never before."""
    li = _rpc(spark, f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").cast("double").alias("quantity"),
            F.col("l_extendedprice").cast("double").alias("extendedprice"),
            F.col("l_discount").cast("double").alias("discount"),
            F.col("l_tax").cast("double").alias("tax"),
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice", "discount", "tax"],
            "metric", "value",
        )
    )

UNPIVOT_METRICS_ORACLE = """
SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount',
       CAST(l_discount AS DOUBLE) FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'tax',
       CAST(l_tax AS DOUBLE) FROM lineitem
"""

# ----------------------------------------------------- skew-salted join

SALT_R = 8

def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual salt-replicated join: the fact side carries a deterministic
    salt, the dimension side is replicated across all SALT_R salts, and
    the join keys on (key, salt) — spreading ONE hot join key over R
    reducers. AQE's skew-join split handles most cases at runtime
    (session.py enables it; tests force it), but manual salting remains
    the tool when AQE can't — e.g. streaming joins or a skewed key that
    must never land on one task even transiently. The oracle is the PLAIN
    join: salting must be invisible in the result.

    Scale: dim replication is R× a small table (broadcast-sized anyway —
    the technique matters when the dim is too big to broadcast but small
    enough to replicate); the fact never moves twice."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    fact = li.selectExpr(
        "l_orderkey", "l_extendedprice", "l_discount",
        f"CAST(pmod(l_linenumber, {SALT_R}) AS INT) AS __salt",
    )
    dim = o.selectExpr(
        "o_orderkey", "o_orderpriority",
        f"explode(sequence(0, {SALT_R - 1})) AS __salt",
    )
    return (
        fact.join(dim, (fact.l_orderkey == dim.o_orderkey)
                  & (fact.__salt == dim.__salt))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.expr(
                "CAST(l_extendedprice AS DECIMAL(18,2))"
                " * CAST((1 - l_discount) AS DECIMAL(18,2))"))
            .cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )

SALTED_JOIN_REVENUE_ORACLE = """
SELECT o.o_orderpriority,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
            * CAST((1 - l.l_discount) AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       count(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""

def running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per key over event time — the windowed
    composition that replaces stateful distinct-tracking: flag each
    (event_type, user)'s FIRST event via row_number, then a running sum
    of flags ordered by time gives the exact distinct-so-far count. Two
    window passes over one event_type partitioning; no state store, no
    approximation."""
    ev = _rpc(spark, f"{sf_dir}/events.parquet")
    first_w = Window.partitionBy("event_type", "user_id") \
        .orderBy("ts", "event_id")
    run_w = Window.partitionBy("event_type").orderBy("ts", "event_id") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn(
            "__first",
            (F.row_number().over(first_w) == 1).cast("bigint"))
        .select(
            "event_id", "event_type",
            F.sum("__first").over(run_w).alias("distinct_users_so_far"),
        )
    )

RUNNING_DISTINCT_USERS_ORACLE = """
WITH flagged AS (
    SELECT event_id, event_type, ts,
           CAST(row_number() OVER (PARTITION BY event_type, user_id
                                   ORDER BY ts, event_id) = 1
                AS BIGINT) AS first_seen
    FROM events
)
SELECT event_id, event_type,
       CAST(sum(first_seen) OVER (PARTITION BY event_type ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS distinct_users_so_far
FROM flagged
"""

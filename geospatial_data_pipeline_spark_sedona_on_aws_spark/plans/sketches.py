"""Sketch, sampling, and skew-mitigation operators — the approximate /
single-pass machinery a 100 TB training-data pipeline leans on when exact
global answers are too expensive.

The reference has none of these (its only aggregate is the spatial dissolve,
SURVEY.md §2.3); they extend the engine the same way the dedup/similarity
families do. Every operator here is *cross-engine deterministic*: the sketch
arithmetic is written so Spark and DuckDB produce bit-identical doubles —
hashes go through the md5-derived portable_hash60, register sums stay in
exact BIGINT powers of two, and the final floating-point expression is the
same literal arithmetic in both engines (no libm calls like ln/exp whose
last-ulp behavior differs).

Scale notes per operator:
  hll_distinct        two hash aggregates over (group, 256 buckets) — the
                      shuffle carries ≤ 256 rows per group regardless of
                      input size; this is the partial-aggregatable substitute
                      for countDistinct's exact (and shuffle-heavy) expand.
  hash_sample         a deterministic WHERE over a key hash — fully pushed
                      into the scan stage, no shuffle, reproducible across
                      runs/engines (unlike df.sample's RNG).
  stratified_sample   per-stratum rates via the same hash — one pass computes
                      population AND sample aggregates together.
  histogram_quantile  fixed-domain equi-width histogram: one hash aggregate
                      to ≤ 64 rows, then driver-scale interpolation — the
                      single-pass alternative to a global sort for
                      percentiles.
  salted_agg_topk     two-phase (key, salt)->key aggregation: a hot key is
                      spread over 32 partial groups before the final merge,
                      so one skewed supplier can't pin the job on one task.
                      DECIMAL partials keep the re-association exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

from ..functions.text import portable_hash60

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _rpc(spark, f"{sf_dir}/{name}.parquet")

def _dec(c) -> F.Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")

# ------------------------------------------------------------------ HLL

HLL_M = 256          # 2^8 buckets: low 8 hash bits
HLL_REM_BITS = 52    # remaining 60-8 bits feed the rank
_TWO53 = 1 << 53     # register scale: term = 2^(53 - rho), exact in BIGINT

def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct customers per order priority via a HyperLogLog
    sketch built from first principles on the portable hash (Flajolet et al.
    2007's raw estimator, no bias/linear-counting corrections — those need
    ln(), which is not bit-portable across engines).

    rho (the register value) is computed with integer/string ops only:
    rho = 53 - bit_length(remainder); the register sum accumulates
    2^(53-rho) as an exact BIGINT (max 256·2^53 < 2^63), so partial
    aggregation order cannot perturb it. Only the final
    alpha·m²·2^53 / S division is floating point, and it is the same
    IEEE expression in both engines. Exact countDistinct rides along to
    show the sketch's error."""
    o = _t(spark, sf_dir, "orders")
    h = portable_hash60(F.col("o_custkey").cast("string"))
    rem = F.shiftright(h, 8)
    rho = F.when(rem > 0, F.lit(53) - F.length(F.bin(rem))).otherwise(F.lit(53))
    regs = (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            F.pmod(h, F.lit(HLL_M)).alias("b"),
            rho.alias("rho"),
        )
        .groupBy("priority", "b")
        .agg(F.max("rho").alias("m"))
    )
    # F.shiftleft only takes a literal shift; the SQL form accepts a column
    sums = regs.groupBy("priority").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - m)")).alias("s_present"),
        F.count("*").alias("nb"),
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("nb")) * F.lit(_TWO53).cast("long")
    ).cast("double")
    est = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))
        * F.lit(65536.0) * F.lit(float(_TWO53)) / s_total
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return (
        sums.join(F.broadcast(exact), "priority")
        .select(
            "priority",
            "exact_distinct",
            F.col("nb").alias("buckets_used"),
            est.alias("hll_estimate"),
        )
    )

HLL_DISTINCT_ORACLE = """
WITH h AS (
    SELECT o_orderpriority AS priority,
           ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM orders
),
r AS (
    SELECT priority, hv % 256 AS b,
           CASE WHEN hv // 256 > 0 THEN 53 - length(bin(hv // 256))
                ELSE 53 END AS rho
    FROM h
),
regs AS (SELECT priority, b, max(rho) AS m FROM r GROUP BY priority, b),
s AS (
    SELECT priority,
           sum(1::BIGINT << (53 - m)) AS s_present,
           count(*) AS nb
    FROM regs GROUP BY priority
),
e AS (
    SELECT o_orderpriority AS priority,
           count(DISTINCT o_custkey) AS exact_distinct
    FROM orders GROUP BY 1
)
SELECT s.priority, e.exact_distinct, s.nb AS buckets_used,
       0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
         / CAST(s.s_present + (256 - s.nb) * (1::BIGINT << 53) AS DOUBLE)
         AS hll_estimate
FROM s JOIN e ON s.priority = e.priority
"""

# ------------------------------------------------------- deterministic sample

SAMPLE_PERMILLE = 50  # 5%

def hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5% row sample of lineitem: keep rows whose key hash
    lands in [0, 50) mod 1000. Unlike df.sample (seeded RNG per partition
    split, not reproducible across engines or even repartitionings), a hash
    sample is a pure row-local predicate — it pushes into the scan, shuffles
    nothing, and the same rows are chosen on any engine at any parallelism."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "|", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    sampled = li.where(F.pmod(portable_hash60(key), F.lit(1000)) < SAMPLE_PERMILLE)
    return sampled.groupBy("l_returnflag").agg(
        F.count("*").alias("sample_rows"),
        F.sum(_dec("l_quantity")).cast("double").alias("sample_qty"),
    )

HASH_SAMPLE_ORACLE = f"""
SELECT l_returnflag,
       count(*) AS sample_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sample_qty
FROM lineitem
WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|'
                          || CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT
      % 1000 < {SAMPLE_PERMILLE}
GROUP BY l_returnflag
"""

def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (urgent orders kept at 50%,
    high at 20%, the rest at 5%) — the standard shape for building an
    importance-weighted training subset. One pass computes the population and
    sample aggregates together; the rate is a row-local CASE, so the plan is
    scan → single hash aggregate."""
    o = _t(spark, sf_dir, "orders")
    permille = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 500)
        .when(F.col("o_orderpriority") == "2-HIGH", 200)
        .otherwise(50)
    )
    picked = F.pmod(portable_hash60(F.col("o_orderkey").cast("string")), F.lit(1000)) < permille
    return o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("population"),
        F.sum(F.when(picked, 1).otherwise(0)).alias("sampled"),
        F.sum(F.when(picked, _dec("o_totalprice"))).cast("double").alias("sampled_totalprice"),
    )

STRATIFIED_SAMPLE_ORACLE = """
WITH flagged AS (
    SELECT o_orderpriority AS priority, o_totalprice,
           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 1000
             < CASE o_orderpriority WHEN '1-URGENT' THEN 500
                                    WHEN '2-HIGH' THEN 200
                                    ELSE 50 END AS picked
    FROM orders
)
SELECT priority,
       count(*) AS population,
       CAST(sum(CASE WHEN picked THEN 1 ELSE 0 END) AS BIGINT) AS sampled,
       CAST(sum(CASE WHEN picked THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
            AS DOUBLE) AS sampled_totalprice
FROM flagged
GROUP BY priority
"""

# ------------------------------------------------- histogram quantile sketch

HIST_LO = 900.0
HIST_HI = 105000.0
HIST_BINS = 64
HIST_W = (HIST_HI - HIST_LO) / HIST_BINS  # 1626.5625, exact in binary

def histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p95/p99 of l_extendedprice from a fixed-domain equi-width
    histogram: one hash aggregate reduces any input to ≤ 64 (bin, count)
    rows; quantiles interpolate linearly inside the covering bin. This is
    the single-pass, partial-aggregatable alternative to a global sort —
    the estimate's resolution is the bin width, and the arithmetic
    (floor, cumulative sums in BIGINT, one interpolation expression) is
    bit-identical in DuckDB."""
    li = _t(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.lit(HIST_BINS - 1),
        F.greatest(F.lit(0), F.floor((F.col("l_extendedprice") - HIST_LO) / HIST_W)),
    ).cast("int")
    hist = li.select(bin_col.alias("bin")).groupBy("bin").agg(
        F.count("*").alias("cnt")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    total = hist.agg(F.sum("cnt").alias("n"))
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))).alias("quantile")
    )
    j = (
        qs.crossJoin(F.broadcast(total))
        .join(cum, F.col("cum").cast("double") >= F.col("quantile") * F.col("n"))
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("quantile").orderBy("bin"))
        )
        .where(F.col("rn") == 1)
    )
    est = (
        F.lit(HIST_LO)
        + F.col("bin").cast("double") * F.lit(HIST_W)
        + (F.col("quantile") * F.col("n") - (F.col("cum") - F.col("cnt")).cast("double"))
        / F.col("cnt").cast("double") * F.lit(HIST_W)
    )
    return j.select("quantile", est.alias("estimate"))

HISTOGRAM_QUANTILE_ORACLE = f"""
WITH b AS (
    SELECT CAST(least({HIST_BINS - 1},
                greatest(0, floor((l_extendedprice - {HIST_LO!r}) / {HIST_W!r})))
           AS INT) AS bin
    FROM lineitem
),
hist AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
c AS (
    SELECT bin, cnt,
           sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
    FROM hist
),
tot AS (SELECT sum(cnt) AS n FROM hist),
-- ::DOUBLE: bare literals are DECIMAL(3,2) and quantile * n would be
-- computed exactly in decimal, disagreeing with Spark's double
-- product in the last ulp for ~a third of row counts n
q AS (SELECT unnest([0.5::DOUBLE, 0.95::DOUBLE, 0.99::DOUBLE]) AS quantile),
hit AS (
    SELECT q.quantile, c.bin, c.cnt, c.cum, tot.n,
           row_number() OVER (PARTITION BY q.quantile ORDER BY c.bin) AS rn
    FROM q CROSS JOIN tot
    JOIN c ON CAST(c.cum AS DOUBLE) >= q.quantile * tot.n
)
SELECT quantile,
       {HIST_LO!r} + CAST(bin AS DOUBLE) * {HIST_W!r}
         + (quantile * n - CAST(cum - cnt AS DOUBLE))
           / CAST(cnt AS DOUBLE) * {HIST_W!r} AS estimate
FROM hit WHERE rn = 1
"""

# ------------------------------------------------------- salted aggregation

SALT_BUCKETS = 32
TOPK_SUPPLIERS = 20

def salted_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 suppliers by revenue through an explicitly salted two-phase
    aggregation: phase 1 aggregates (l_suppkey, salt) so a pathologically hot
    supplier is spread across 32 partial groups on 32 different reducers;
    phase 2 merges the ≤ 32 partials per key. With DECIMAL partials the
    re-association is exact, so the result is identical to a direct groupBy
    (the oracle) — this is the skew shape AQE can't always save you from
    when the aggregation itself (not a join) is the hot spot."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    partial = (
        li.withColumn("__salt", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)))
        .groupBy("l_suppkey", "__salt")
        .agg(F.sum(revenue).alias("r"), F.count("*").alias("c"))
    )
    merged = partial.groupBy("l_suppkey").agg(
        F.sum("r").cast("double").alias("revenue"),
        F.sum("c").alias("n_items"),
    )
    return merged.orderBy(F.desc("revenue"), F.asc("l_suppkey")).limit(TOPK_SUPPLIERS)

SALTED_AGG_ORACLE = f"""
SELECT l_suppkey,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
GROUP BY l_suppkey
ORDER BY revenue DESC, l_suppkey ASC
LIMIT {TOPK_SUPPLIERS}
"""

# --------------------------------------------------- count-min heavy hitters

CMS_D = 4       # hash rows
CMS_W = 256     # buckets per row
CMS_MIN_EST = 25

def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter customers by order count via a Count-Min sketch built
    from first principles: d=4 portable hashes into w=256 buckets each; a
    key's estimate is the min of its d bucket counts (never an
    underestimate; collisions only inflate).

    Scale story: the sketch build is ONE hash aggregate whose output is
    ≤ d·w = 1024 rows no matter how many orders stream through — the
    mergeable partial state a 100 TB pass reduces to. The probe here rides
    the same query for the oracle's sake; in production the 1024-row sketch
    is broadcast and probed without touching the raw data again.
    """
    o = _t(spark, sf_dir, "orders")
    rows = F.array(*[
        F.pmod(portable_hash60(F.concat(F.col("o_custkey").cast("string"),
                                        F.lit(f"#cms{i}"))), F.lit(CMS_W))
        for i in range(CMS_D)
    ])
    # build: explode (row, bucket) pairs -> bucket counts (≤ d·w rows out)
    sketch = (
        o.select(F.posexplode(rows).alias("r", "bucket"))
        .groupBy("r", "bucket").agg(F.count("*").alias("cnt"))
    )
    # probe: distinct keys -> d (row,bucket) probes -> min of the d counts
    keys = o.select("o_custkey").distinct().select(
        "o_custkey", F.posexplode(rows).alias("r", "bucket")
    )
    est = (
        keys.join(sketch, ["r", "bucket"], "inner")
        .groupBy("o_custkey").agg(F.min("cnt").alias("est"))
        .where(F.col("est") >= CMS_MIN_EST)
    )
    return est.select("o_custkey", "est")

_CMS_HASH = ("('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '#cms{i}'), 1, 15))::BIGINT"
             f" % {CMS_W}")

CMS_HEAVY_HITTERS_ORACLE = f"""
WITH probes AS (
    SELECT o_custkey, r, CASE r
        {' '.join(f"WHEN {i} THEN {_CMS_HASH.format(i=i)}" for i in range(CMS_D))}
    END AS bucket
    FROM orders, (SELECT unnest(range(0, {CMS_D})) AS r)
),
sketch AS (
    SELECT r, bucket, count(*) AS cnt FROM probes GROUP BY r, bucket
),
keyprobes AS (SELECT DISTINCT o_custkey, r, bucket FROM probes)
SELECT k.o_custkey, min(s.cnt) AS est
FROM keyprobes k JOIN sketch s ON s.r = k.r AND s.bucket = k.bucket
GROUP BY k.o_custkey
HAVING min(s.cnt) >= {CMS_MIN_EST}
"""

# ------------------------------------------------ bloom-filter join pruning

BLOOM_M = 1 << 14   # bits
BLOOM_K = 5         # hashes
BLOOM_WORDS = BLOOM_M // 64

def _bloom_positions(key, k: int = BLOOM_K, m: int = BLOOM_M) -> list:
    return [
        F.pmod(portable_hash60(F.concat(key.cast("string"),
                                        F.lit(f"#bf{i}"))), F.lit(m))
        for i in range(k)
    ]

def bloom_semi_join(fact: DataFrame, fact_key: str,
                    dim: DataFrame, dim_key: str) -> DataFrame:
    """Semi join with a Bloom-filter pre-filter: the dim keys build a
    m=16384-bit / k=5 filter (as 256 OR-aggregated longs, collected once),
    which prunes fact rows *before* the join shuffle; the exact semi join
    then removes the filter's false positives, so the result is EXACTLY the
    semi join.

    At scale this is the classic shuffle-volume win: the fact side usually
    dwarfs the dim side, and rows failing the bloom test die in the scan
    stage (whole-stage codegen bitwise ops against 256 broadcast literals)
    instead of crossing the wire to a join task. Spark's own runtime bloom
    (spark.sql.optimizer.runtime.bloomFilter.enabled) does this adaptively;
    this operator is the explicit, engine-controlled form.
    """
    # build: explode each dim key to its k bit positions, OR them into
    # 64-bit words — ≤ 256 (word, bits) rows leave the dim scan
    pos_arr = F.array(*_bloom_positions(F.col(dim_key)))
    bits = (
        dim.select(F.explode(pos_arr).alias("p"))
        .select((F.col("p") / F.lit(64)).cast("int").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"))
        .groupBy("w").agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * BLOOM_WORDS
    for r in bits:
        words[r["w"]] = r["bits"]
    pref = bloom_prefilter(fact, fact_key, words)
    return pref.join(dim.select(F.col(dim_key).alias(fact_key)).distinct(),
                     on=fact_key, how="left_semi")

def bloom_prefilter(fact: DataFrame, fact_key: str, words: list) -> DataFrame:
    """fact rows whose key passes the bloom filter given as 256 long words.
    The predicate is a SQL string because the Python shiftleft API takes
    only a literal shift — SQL's takes a column."""
    return fact.where(_bloom_predicate_sql(fact_key, words))

def _bloom_predicate_sql(fact_key: str, words: list) -> str:
    """SQL predicate string: all k bloom bits set for this key."""
    warr = "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    terms = []
    for i in range(BLOOM_K):
        pos = (f"(CAST(conv(substr(md5(concat(CAST({fact_key} AS STRING), "
               f"'#bf{i}')), 1, 15), 16, 10) AS BIGINT) % {BLOOM_M})")
        terms.append(
            f"(element_at({warr}, CAST({pos} / 64 AS INT) + 1) & "
            f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))) != 0"
        )
    return " AND ".join(terms)

def bloom_pruned_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of BUILDING-segment customers via bloom prefilter + exact semi
    join (the bloom is transparent in the result — the oracle is the plain
    semi join)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    return (
        bloom_semi_join(o, "o_custkey", c.select(F.col("c_custkey")), "c_custkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )

BLOOM_PRUNED_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

# ----------------------------------------- per-group reservoir (exact-k) sample

RESERVOIR_K = 5

def reservoir_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k uniform sample per group (here: 5 orders per priority class)
    via hash ranking: rank rows inside each group by the portable hash of
    their key and keep the k smallest. Statistically this is a reservoir
    sample with a deterministic, engine-independent tiebreak — rerunning at
    any parallelism, or in DuckDB, picks the same rows (df.sample cannot
    promise either).

    Scale: one window shuffle on the group key; no global sort. For groups
    too hot for one reducer, the same trick composes with salting: take k
    per (group, salt) then k of those — min-k is a mergeable aggregate.
    """
    o = _t(spark, sf_dir, "orders")
    h = portable_hash60(F.col("o_orderkey").cast("string"))
    w = Window.partitionBy("o_orderpriority").orderBy(h.asc(), F.col("o_orderkey").asc())
    return (
        o.select("o_orderpriority", "o_orderkey", "o_totalprice",
                 F.row_number().over(w).cast("long").alias("pick"))
        .where(F.col("pick") <= RESERVOIR_K)
    )

RESERVOIR_ORACLE = f"""
SELECT o_orderpriority, o_orderkey, o_totalprice, pick
FROM (
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))::BIGINT ASC,
                        o_orderkey ASC) AS pick
    FROM orders
)
WHERE pick <= {RESERVOIR_K}
"""

# ------------------------------------------------------------ table profiling

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-profiling: per-column null count, distinct estimate
    proxy (exact here for the oracle), min/max/sum — the health check a
    pipeline runs before trusting an input drop.

    ONE scan computes every column's stats simultaneously (no per-column
    passes); the unpivot to (column, stat-row) form happens on the ≤
    |cols| aggregated rows, never on the raw data. Sums go through DECIMAL
    so the profile is bit-stable across partitionings and engines.
    """
    li = _t(spark, sf_dir, "lineitem")
    aggs = []
    for c in PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.sum(_dec(c)).cast("double").alias(f"{c}__sum"),
        ]
    wide = li.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
            F.col(f"{c}__sum").alias("sum_val"),
        )
        for c in PROFILE_COLS
    ])
    return wide.select(F.explode(rows).alias("p")).select("p.*")

PROFILE_TABLE_ORACLE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS column,
       count(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_val,
       CAST(max({c}) AS DOUBLE) AS max_val,
       CAST(sum(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
FROM lineitem"""
    for c in PROFILE_COLS
)

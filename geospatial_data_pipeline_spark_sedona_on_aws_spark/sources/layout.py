"""Space-filling-curve data layout: Z-order (Morton) clustering for spatial
tables.

The reference controls layout only by row count (repartition(10) +
maxRecordsPerFile, spark_job/process_geodata.py:149-151). At 100 TB the
layout that matters for spatial scans is CLUSTERING: writing rows ordered by
an interleaved-bit curve makes each parquet file cover a compact spatial
tile, so a bbox query prunes most files on min/max column statistics alone
(the same reason Delta/Iceberg expose ZORDER BY).

The z-value is pure integer bit arithmetic — exactly reproducible in ANSI
SQL for the oracle, and cheap inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import fixtures

Z_BITS = 8  # testdata coords fit in [0, 256); widen per-domain at scale

def zorder_value(x: Column, y: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of two non-negative integer columns:
    bit i of x -> bit 2i, bit i of y -> bit 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(1), 2 * i + 1)
        )
    return z

def zorder_sql(x: str, y: str, bits: int = Z_BITS) -> str:
    """The identical Morton interleave as an ANSI SQL expression string."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"

def write_zordered(df: DataFrame, x: str, y: str, path: str,
                   num_files: int = 16, bits: int = Z_BITS) -> None:
    """Write df as parquet clustered on the z-curve: range-partition on the
    z-value (contiguous curve segments per file) and sort within partitions,
    so every file's (x, y) min/max stats describe a tight tile. Readers then
    prune files for bbox predicates via ordinary parquet stats — no index
    structure, no custom reader."""
    z = zorder_value(F.col(x), F.col(y), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    )

def zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parcels with their z-curve position — the clustering key
    write_zordered lays files out by. Top-500 by curve position (ties broken
    by property_id) keeps the result deterministic for the oracle."""
    lu = fixtures.land_use_areas(spark, sf_dir, wkt=False)
    return (
        lu.select(
            "property_id",
            "x1", "y1",
            zorder_value(F.col("x1"), F.col("y1")).alias("z"),
        )
        .orderBy("z", "property_id")
        .limit(500)
    )

ZORDER_CURVE_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()}
SELECT property_id, x1, y1,
       {zorder_sql('x1', 'y1')} AS z
FROM land_use
ORDER BY z, property_id
LIMIT 500
"""

# --------------------------------------------------------------- Hilbert

H_BITS = 7  # testdata coords fit in [0, 128); widen per-domain at scale

def _hilbert_level_exprs(lvl: int, bits: int) -> tuple[str, str, str]:
    """One unrolled level of the standard Hilbert xy2d walk (high bit
    first), over running columns hx, hy. Returns SQL text for
    (d_increment, next_hx, next_hy) in the dialect-neutral subset both
    Spark SQL and DuckDB parse identically: CASE / & / >> / integer
    arithmetic. Per level, with s = 2^lvl and n = 2^bits:

        rx = (hx >> lvl) & 1 ; ry = (hy >> lvl) & 1
        d += s*s * ((3*rx) XOR ry)           -- spelled as a CASE table
        if ry == 0:
            if rx == 1: hx, hy = n-1-hx, n-1-hy   -- Gray reflection
            hx, hy = hy, hx                        -- diagonal swap

    The flip uses the full-width complement n-1-v (bits above lvl are
    already consumed, and complementing them flips every *future* bit
    test consistently — the reflection the curve needs)."""
    s = 1 << lvl
    m = (1 << bits) - 1
    rx = f"((hx >> {lvl}) & 1)"
    ry = f"((hy >> {lvl}) & 1)"
    d_add = (
        f"{s * s} * (CASE WHEN {ry} = 1 THEN"
        f" (CASE WHEN {rx} = 1 THEN 2 ELSE 1 END)"
        f" ELSE (CASE WHEN {rx} = 1 THEN 3 ELSE 0 END) END)"
    )
    nx = (f"CASE WHEN {ry} = 0 THEN"
          f" (CASE WHEN {rx} = 1 THEN {m} - hy ELSE hy END)"
          f" ELSE hx END")
    ny = (f"CASE WHEN {ry} = 0 THEN"
          f" (CASE WHEN {rx} = 1 THEN {m} - hx ELSE hx END)"
          f" ELSE hy END")
    return d_add, nx, ny

def hilbert_value(df: DataFrame, x: str, y: str, out: str,
                  bits: int = H_BITS) -> DataFrame:
    """Append the Hilbert index of integer columns (x, y) ∈ [0, 2^bits)²
    as column `out`. Unlike the Morton interleave, each level's reflection
    depends on the previous level's outcome, so this unrolls to a chain of
    CASE projections — still pure JVM column arithmetic inside one
    whole-stage-codegen span (Catalyst collapses the withColumn chain into
    a single Project)."""
    # r13 (optimization round): one selectExpr (one py4j round trip) per
    # step instead of ~6 Column calls each — the parsed projections are
    # identical, still one whole-stage-codegen span
    df = df.selectExpr(
        "*", f"CAST({x} AS LONG) AS hx", f"CAST({y} AS LONG) AS hy",
        f"CAST(0 AS LONG) AS {out}")
    keep = [c for c in df.columns if c not in ("hx", "hy", out)]
    for lvl in range(bits - 1, -1, -1):
        d_add, nx, ny = _hilbert_level_exprs(lvl, bits)
        # one select per level: hx/hy/d must update SIMULTANEOUSLY against
        # the previous level's values — select makes that explicit
        df = df.selectExpr(
            *keep, f"{nx} AS hx", f"{ny} AS hy",
            f"{out} + {d_add} AS {out}")
    return df.select(*keep, out)

def hilbert_sql(base_subquery: str, cols: list[str], x: str, y: str,
                out: str, bits: int = H_BITS) -> str:
    """The identical Hilbert walk as nested ANSI-SQL subqueries over
    `base_subquery` (which must yield `cols` plus integer x, y). Level
    snippets come from the same _hilbert_level_exprs generator the Spark
    path uses, so both engines evaluate character-identical formulas."""
    keep = ", ".join(cols)
    q = (f"SELECT {keep}, CAST({x} AS BIGINT) AS hx,"
         f" CAST({y} AS BIGINT) AS hy, 0 AS {out} FROM ({base_subquery})")
    for lvl in range(bits - 1, -1, -1):
        d_add, nx, ny = _hilbert_level_exprs(lvl, bits)
        q = (f"SELECT {keep}, {nx} AS hx, {ny} AS hy,"
             f" {out} + {d_add} AS {out} FROM ({q})")
    return f"SELECT {keep}, {out} FROM ({q})"

def write_hilbert_ordered(df: DataFrame, x: str, y: str, path: str,
                          num_files: int = 16, bits: int = H_BITS) -> None:
    """Write df as parquet clustered on the Hilbert curve — same layout
    mechanics as write_zordered (range-partition on the curve position,
    sort within partitions) with strictly better tile locality: every
    unit step of the Hilbert curve is Manhattan-distance 1, so a file
    holding a contiguous curve segment covers a tighter bbox than the
    same-length Morton segment (which jumps across tile boundaries).
    tests/test_layout.py quantifies the gap on the real fixture."""
    df = hilbert_value(df, x, y, "__h", bits)
    (
        df.repartitionByRange(num_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h")
        .write.mode("overwrite").parquet(path)
    )

def hilbert_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parcels with their Hilbert-curve position (the clustering key
    write_hilbert_ordered lays files out by), top-500 by curve position —
    the Hilbert companion of zorder_curve, same output contract."""
    lu = fixtures.land_use_areas(spark, sf_dir, wkt=False)
    return (
        hilbert_value(lu.select("property_id", "x1", "y1"),
                      "x1", "y1", "h")
        .orderBy("h", "property_id")
        .limit(500)
    )

HILBERT_CURVE_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()}
SELECT property_id, x1, y1, CAST(h AS BIGINT) AS h
FROM ({hilbert_sql("SELECT property_id, x1, y1 FROM land_use",
                   ["property_id", "x1", "y1"], "x1", "y1", "h")})
ORDER BY h, property_id
LIMIT 500
"""

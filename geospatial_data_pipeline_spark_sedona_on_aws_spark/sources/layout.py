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

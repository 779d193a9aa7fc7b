"""SparkSession factory.

Mirrors the reference's session setup (reference spark_job/process_geodata.py:13-24
builds a SparkSession + SedonaContext; our engine needs no JVM extension — the
spatial functions are registered as Arrow pandas UDFs, see functions/spatial.py).

Scale posture: AQE on (runtime coalesce + skew-join splitting), Arrow enabled for
the pandas-UDF spatial kernel, shuffle partitions sized to local cores but meant
to be overridden (spark.sql.shuffle.partitions) on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

def get_spark(app_name: str = "geospatial-engine", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Deterministic-comparison settings: session timezone pinned to UTC so
    timestamp semantics match the DuckDB oracle.
    """
    cores = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cores
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE coalesces by shuffle BYTES, but several engine stages are
        # CPU-bound per row on small data (pair explode, window shingling),
        # where 64 MB targets collapse them to 1-4 tasks. 4 MB keeps those
        # stages wide on local[32]; on a real cluster override upward
        # (SPARK_GRAFT_ADVISORY_PARTITION) — at 100 TB the default 64m is
        # right because stage inputs are no longer overhead-dominated.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "4m"))
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver testdata stores event timestamps as TIMESTAMP(NANOS);
        # read as long + convert (streaming/events.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bigger Arrow batches amortize the per-batch Python round-trip for
        # the numeric kernels (rows here are narrow: keys + a few doubles)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        # broadcast dims up to 64 MB — the reference broadcasts its region
        # dimension explicitly (spark_job/process_geodata.py:101)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if SparkSession.getActiveSession() is None:
        builder = builder.master(master)
    return builder.getOrCreate()

"""Custom batch source via Spark 4's Python DataSource API — the engine's
demonstration that NEW source formats plug in at the planner level, not as
driver-side DataFrame glue (SURVEY.md §2.1 extends the reference's
source surface, which is JDBC + CSV only; reference
spark_job/process_geodata.py:74-96, ecs_loader/load_to_postgres.py:145-163).

`SensorSource` generates a deterministic synthetic "sensor readings" table
entirely inside executors:

  reading_id bigint, sensor_id bigint, ts_us bigint, value double

with every column a pure integer function of reading_id, so a DuckDB
`range()` oracle reproduces it bit-for-bit — the correctness gate can check
a query over a source that has NO backing file.

Scale shape:
  - partition planning: the row space splits into `n_partitions` ranges,
    one InputPartition each — the Spark scheduler fans them out like any
    file split; nothing is generated on the driver;
  - filter pushdown: `pushFilters` claims reading_id range/equality
    predicates, prunes non-overlapping partitions at PLANNING time, and
    applies the exact bounds inside `read` (claiming a filter means the
    source must fully enforce it);
  - vectorized transfer: `read` yields pyarrow RecordBatches, not Python
    tuples — one Arrow buffer per partition crosses the Python/JVM
    boundary, the same path pandas UDFs use.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SENSOR_SCHEMA = "reading_id bigint, sensor_id bigint, ts_us bigint, value double"

# deterministic column laws — mirrored literally in the DuckDB oracle
N_SENSORS = 25
TS_BASE_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
TS_STEP_US = 30_000_000             # one reading / 30 s


@dataclass(frozen=True)
class _RangePartition(InputPartition):
    start: int
    end: int  # exclusive


class SensorReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = int(options.get("n_partitions", 8))
        # reading_id bounds narrowed by pushed filters (inclusive)
        self.lo = 0
        self.hi = self.n_rows - 1

    def pushFilters(self, filters: list[Filter]):
        """Claim reading_id range/equality predicates (narrow [lo, hi]);
        yield back everything else for Spark to evaluate post-scan."""
        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr == ("reading_id",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value - 1)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value)
                    continue
            yield f

    def partitions(self):
        """Fixed-width splits of the FULL row space, then prune/clip the
        ones outside the pushed [lo, hi] bounds — the Python analog of
        parquet row-group pruning: the splits exist independently of the
        query, the predicate just drops whole ones at planning time."""
        if self.hi < self.lo:
            return [_RangePartition(0, 0)]
        per = max(1, -(-self.n_rows // self.n_parts))
        out = []
        for s in range(0, self.n_rows, per):
            lo = max(s, self.lo)
            hi = min(s + per - 1, self.hi)
            if lo <= hi:
                out.append(_RangePartition(lo, hi + 1))
        return out or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        import pyarrow as pa

        if partition.end <= partition.start:
            return
        # vectorized generation: one numpy pass, one Arrow batch out
        import numpy as np

        rid = np.arange(partition.start, partition.end, dtype=np.int64)
        yield pa.record_batch(
            {
                "reading_id": rid,
                "sensor_id": rid % N_SENSORS,
                "ts_us": TS_BASE_US + rid * TS_STEP_US,
                "value": (rid * 37 % 1000) / 10.0,
            }
        )


class SensorSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensor_gen"

    def schema(self) -> str:
        return SENSOR_SCHEMA

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SensorSource)


# --------------------------------------------------------------- gate query

N_ROWS = 200_000
READ_LO, READ_HI = 50_000, 150_000  # [lo, hi) — exercises the pushdown path
HOUR_US = 3_600_000_000


def sensor_hourly(spark, sf_dir: str):
    """Hourly per-sensor rollup over the custom Python source with a
    reading_id range predicate — planned partitions outside [lo, hi) are
    pruned before any task launches when pushdown fires; the plan stays
    correct (Spark re-applies the filter) when it does not. sf_dir is
    unused: the source is generated, which is the point — the oracle is a
    pure DuckDB range() expression, no backing file on either side.

    Exact cross-engine sums: value carries one decimal digit, so the sum
    runs in DECIMAL(18,1) (associative) and casts back to double."""
    from pyspark.sql import functions as F

    # pushdown for Python data sources is gated by a SQL conf in Spark 4;
    # set at runtime (the caller may own the session — entry contract)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    df = (
        spark.read.format("sensor_gen")
        .option("n_rows", N_ROWS).option("n_partitions", 16).load()
        .where((F.col("reading_id") >= READ_LO)
               & (F.col("reading_id") < READ_HI))
    )
    return (
        df.groupBy(
            "sensor_id",
            F.expr(f"(ts_us - {TS_BASE_US}L) div {HOUR_US}L").alias("hour_idx"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,1)")).cast("double")
            .alias("sum_value"),
            F.max("value").alias("max_value"),
        )
    )


SENSOR_HOURLY_ORACLE = f"""
WITH r AS (
    SELECT range AS reading_id FROM range({READ_LO}, {READ_HI})
),
s AS (
    SELECT reading_id,
           reading_id % {N_SENSORS} AS sensor_id,
           (reading_id * {TS_STEP_US}) // {HOUR_US} AS hour_idx,
           (reading_id * 37 % 1000) / 10.0 AS value
    FROM r
)
SELECT sensor_id, hour_idx,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,1))) AS DOUBLE) AS sum_value,
       max(value) AS max_value
FROM s
GROUP BY sensor_id, hour_idx
"""

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
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
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


def _gen_batch(partition: _RangePartition):
    """Vectorized generation of one partition's rows: one numpy pass, one
    Arrow batch across the Python/JVM boundary (the pandas-UDF transfer
    path). Shared by the batch and streaming readers so both faces of the
    source are bit-identical."""
    import numpy as np
    import pyarrow as pa

    if partition.end <= partition.start:
        return
    rid = np.arange(partition.start, partition.end, dtype=np.int64)
    yield pa.record_batch(
        {
            "reading_id": rid,
            "sensor_id": rid % N_SENSORS,
            "ts_us": TS_BASE_US + rid * TS_STEP_US,
            "value": (rid * 37 % 1000) / 10.0,
        }
    )


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
        return _gen_batch(partition)


class SensorStreamReader(DataSourceStreamReader):
    """Streaming face of the same generated table: the offset is simply the
    next unread reading_id. latestOffset() is capped at n_rows, so
    `trigger(availableNow=True)` drains initial→latest and STOPS — a
    finite, deterministic stream the batch oracle reproduces exactly.
    Each micro-batch's offset span splits into `n_partitions`
    InputPartitions like the batch reader's, and commit() is the no-op a
    replayable generated source can afford (the offset dict in the
    checkpoint IS the recovery state — exactly-once comes from
    deterministic replay of [start, end), the same contract as Kafka
    offsets)."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 100_000))
        self.n_parts = int(options.get("n_partitions", 8))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        return {"next": self.n_rows}

    def partitions(self, start: dict, end: dict):
        # partitions MUST cover [start, end) exactly: Spark commits `end`
        # after the batch, so a reader that under-covers the range silently
        # loses rows (the Python stream API has no admission control — the
        # engine, not the source, decides the batch's offset span)
        lo, hi = start["next"], end["next"]
        if hi <= lo:
            return [_RangePartition(0, 0)]
        per = max(1, -(-(hi - lo) // self.n_parts))
        return [_RangePartition(s, min(s + per, hi))
                for s in range(lo, hi, per)]

    def read(self, partition: _RangePartition):
        return _gen_batch(partition)

    def commit(self, end: dict) -> None:
        pass


class SensorSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sensor_gen"

    def schema(self) -> str:
        return SENSOR_SCHEMA

    def reader(self, schema) -> SensorReader:
        return SensorReader(self.options)

    def streamReader(self, schema) -> SensorStreamReader:
        return SensorStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-register overwrites)."""
    spark.dataSource.register(SensorSource)
    spark.dataSource.register(JsonlCommitSink)


# ------------------------------------------------- custom sink (2-phase commit)


@dataclass(frozen=True)
class _FileCommit(WriterCommitMessage):
    tmp_name: str
    rows: int


class JsonlCommitWriter(DataSourceWriter):
    """JSON-lines sink with the two-phase commit every distributed sink
    needs (the engine-side analog of the reference's blue-green publish,
    ecs_loader/load_to_postgres.py:234-247 — consumers never observe a
    half-written snapshot):

      phase 1 (executors): each task stages rows into a uniquely-named
        dot-prefixed temp file and returns a WriterCommitMessage; a failed
        task leaves only invisible garbage, never partial output.
      phase 2 (driver `commit`): rename every staged file to its final
        name, then write the `_SUCCESS` manifest listing exactly this
        run's files. The manifest write is the single atomic publish
        point: readers resolve file lists through it, so stale part files
        from dead runs are unreachable, and `overwrite` is just "publish
        a manifest that doesn't mention them".
      `abort`: delete staged temp files; the previous manifest (if any)
        remains the live snapshot.

    Local-filesystem staging; on a cluster the same protocol runs against
    the shared store (S3/HDFS rename-or-manifest, as Spark's own
    FileOutputCommitter v2 / magic committer do)."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_commit requires .option('path', ...)")
        self.overwrite = overwrite
        import os

        os.makedirs(self.path, exist_ok=True)

    def write(self, iterator):
        import json
        import os
        import uuid

        tmp_name = f".part-{uuid.uuid4().hex}.jsonl.tmp"
        n = 0
        with open(os.path.join(self.path, tmp_name), "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(tmp_name, n)

    def commit(self, messages) -> None:
        import json
        import os

        finals, rows = [], 0
        for m in messages:
            if m is None:
                continue
            final = m.tmp_name[1:-4]  # strip leading dot and ".tmp"
            os.replace(os.path.join(self.path, m.tmp_name),
                       os.path.join(self.path, final))
            finals.append(final)
            rows += m.rows
        if self.overwrite:
            for name in os.listdir(self.path):
                if (name.startswith("part-") and name.endswith(".jsonl")
                        and name not in finals):
                    os.remove(os.path.join(self.path, name))
        else:
            # append: fold the previous manifest in, or every previously
            # committed part silently vanishes from manifest-resolved reads
            # (the files would remain on disk but be unreachable)
            prev_path = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(prev_path):
                with open(prev_path) as f:
                    prev = json.load(f)
                finals.extend(n for n in prev.get("files", []) if n not in finals)
                rows += prev.get("rows", 0)
        manifest = os.path.join(self.path, "_SUCCESS")
        with open(manifest + ".tmp", "w") as f:
            json.dump({"files": sorted(finals), "rows": rows}, f)
        os.replace(manifest + ".tmp", manifest)  # the atomic publish

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is None:
                continue
            try:
                os.remove(os.path.join(self.path, m.tmp_name))
            except FileNotFoundError:
                pass


class JsonlCommitSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonl_commit"

    def writer(self, schema, overwrite: bool) -> JsonlCommitWriter:
        return JsonlCommitWriter(self.options, overwrite)


def read_jsonl_commit(spark, path: str, schema: str):
    """Manifest-resolved read of a jsonl_commit directory: only files the
    `_SUCCESS` manifest names are visible — uncommitted/stale parts are
    unreachable by construction."""
    import json
    import os

    with open(os.path.join(path, "_SUCCESS")) as f:
        manifest = json.load(f)
    paths = [os.path.join(path, n) for n in manifest["files"]]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(paths)


def crop_jsonl_commit_roundtrip(spark, sf_dir: str):
    """The flagship result pushed through the two-phase-commit sink and
    read back via its manifest (same oracle as crop_analytics — the round
    trip must preserve every value exactly; the fixture's areas are
    integral so double↔text is lossless)."""
    import atexit
    import shutil
    import tempfile

    from ..plans.pipeline import crop_analytics

    register(spark)
    out = crop_analytics(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="crop_jsonl_commit_")
    # the returned DataFrame reads the files lazily, so the directory must
    # outlive this call — reap it at interpreter exit instead of leaking one
    # per gate run
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    out.write.format("jsonl_commit").option("path", tmp).mode("overwrite").save()
    return read_jsonl_commit(
        spark, tmp,
        "region_id bigint, season_id bigint, land_type_id bigint, area double",
    )


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


STREAM_N_ROWS = 120_000


def sensor_stream_totals(spark, sf_dir: str):
    """Per-sensor totals computed by STREAMING the generated source:
    readStream over sensor_gen (latestOffset capped at n_rows) →
    complete-mode aggregate → availableNow drain into a memory sink. The
    result must equal the batch formulation — same DuckDB range() oracle,
    proving the streaming reader's offset/partition/replay contract end
    to end."""
    import tempfile

    from pyspark.sql import functions as F

    register(spark)
    stream = (
        spark.readStream.format("sensor_gen")
        .option("n_rows", STREAM_N_ROWS)
        .option("n_partitions", 8)
        .load()
    )
    agg = (
        stream.groupBy("sensor_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,1)")).cast("double")
            .alias("sum_value"),
        )
    )
    name = "pyds_sensor_stream_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


SENSOR_STREAM_TOTALS_ORACLE = f"""
WITH r AS (
    SELECT range AS reading_id FROM range(0, {STREAM_N_ROWS})
)
SELECT reading_id % {N_SENSORS} AS sensor_id,
       count(*) AS n,
       CAST(sum(CAST((reading_id * 37 % 1000) / 10.0 AS DECIMAL(18,1)))
            AS DOUBLE) AS sum_value
FROM r
GROUP BY 1
"""


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

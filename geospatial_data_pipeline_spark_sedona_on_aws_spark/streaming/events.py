"""Event-stream operators over the `events` table.

The reference has no streaming surface (SURVEY.md §2.8 — its temporal model
is scheduled full-refresh batch), so this module is pure extension: the
standard event-analytics set, each with a batch formulation (DuckDB-oracle
checkable) and, for the windowed aggregate, a Structured Streaming
formulation (readStream + watermark + window + availableNow trigger) proven
equivalent to the batch one.

Money/measure sums go through DECIMAL so partial-aggregation order can't
perturb the result vs the oracle (doubles aren't associative; decimals are).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30

def _ensure_event_confs(spark: SparkSession) -> None:
    """The query-entry contract is (spark, sf_dir) with a CALLER-owned session,
    so the two confs events queries depend on must be (re)applied at runtime,
    not only in session.py's builder (getOrCreate silently drops builder confs
    when a session already exists):

    - spark.sql.legacy.parquet.nanosAsLong: if events.parquet stores ts as
      TIMESTAMP(NANOS), Spark's parquet reader otherwise rejects it
      (PARQUET_TYPE_ILLEGAL). Runtime-settable SQL conf.
    - spark.sql.session.timeZone=UTC: date_trunc/timestamp rendering must
      match the DuckDB oracle regardless of the host zone, and makes the
      NTZ->LTZ normalization in _norm_ts value-preserving.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

def _norm_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (LTZ) whatever flavor the
    parquet file carries:

    - TIMESTAMP(NANOS)  -> read as long under nanosAsLong; integer-divide to
      micros (a double division would lose sub-microsecond bits);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) -> Spark infers TIMESTAMP_NTZ,
      which watermarks and unix_micros() reject; with the session zone pinned
      UTC the cast to TIMESTAMP keeps the identical micros-since-epoch value;
    - TIMESTAMP -> already the type every event operator expects.

    Watermarks, F.window, and unix_micros all require TIMESTAMP, so every
    batch AND streaming read of events goes through this normalization.
    """
    t = dict(df.dtypes)[col]
    if t in ("bigint", "long"):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if t == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df

def _events_schema(spark: SparkSession, sf_dir: str):
    """Schema of the raw events source, readable on any session."""
    _ensure_event_confs(spark)
    return _rpc(spark, f"{sf_dir}/events.parquet").schema

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read nanos as long (spark.sql.legacy.parquet.nanosAsLong)
    and convert to a microsecond timestamp."""
    _ensure_event_confs(spark)
    return _norm_ts(_rpc(spark, f"{sf_dir}/events.parquet"))

# engine knob: cap files per streaming micro-batch (availableNow then takes
# several batches to drain a multi-file table — the real-cluster shape)
MAX_FILES_CONF = "spark.geoengine.streaming.maxFilesPerTrigger"

def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events table, robust to BOTH physical layouts:

    - `{sf_dir}/events.parquet` as a DIRECTORY of part files (what any
      writer produces) → load the directory straight — the file-stream
      source requires a directory path;
    - `{sf_dir}/events.parquet` as a single FILE (the driver testdata) →
      load `sf_dir` with a pathGlobFilter, because the source rejects a
      file basePath. The glob alone is NOT enough for the directory case:
      it filters leaf files, so part-*.parquet under events.parquet/ would
      match nothing and the stream would silently read ZERO rows — the
      worst failure mode a source can have.

    Event time is normalized like the batch read (_norm_ts). Local-path
    check is os.path; a cluster deployment would route this through the
    Hadoop FS API the same way."""
    import os

    raw_schema = _events_schema(spark, sf_dir)
    reader = spark.readStream.schema(raw_schema).format("parquet")
    mft = spark.conf.get(MAX_FILES_CONF, None)
    if mft:
        reader = reader.option("maxFilesPerTrigger", mft)
    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        stream = reader.load(path)
    else:
        stream = reader.option("pathGlobFilter", "events.parquet").load(sf_dir)
    return _norm_ts(stream)

def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type: count + exact sum(value)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )

EVENTS_WINDOWED_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""

def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap): lag + cumulative sum of
    gap markers inside a per-user window — the classic batch formulation."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # gap compared in MICROSECONDS (unix_micros), not floored seconds:
    # floored-second diffs call a 1800.3 s gap "1800, not > 1800" and merge
    # sessions the microsecond law (streaming sessionize, the built-in
    # session_window — probed: exactly-1800 s merges, 1800.000001 s splits)
    # would break. One law everywhere: strict > at microsecond precision.
    marked = ev.withColumn(
        "new_session",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)))
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        ).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(w))
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events", "session_start", "session_end", "sum_value",
        )
    )

SESSIONIZE_ORACLE = f"""
WITH marked AS (
    SELECT *,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {SESSION_GAP_MIN * 60 * 1_000_000}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM marked
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       CAST(min(ts) AS TIMESTAMP_NS) AS session_start,
       CAST(max(ts) AS TIMESTAMP_NS) AS session_end,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""

def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: pull the integer `k` out of the props JSON blob
    with a portable regex, aggregate per event_type."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn(
            "k", F.regexp_extract(F.col("props"), '"k":\\s*(\\d+)', 1).cast("long")
        )
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("*").alias("n"),
        )
    )

# TRY_CAST, not CAST: regexp_extract returns '' (not NULL) on a props
# without "k", and DuckDB CAST('' AS BIGINT) is a hard Conversion Error
# while Spark's tolerant cast yields NULL — TRY_CAST restores parity.
EVENTS_JSON_ORACLE = """
SELECT event_type,
       CAST(sum(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
       max(TRY_CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT)) AS max_k,
       count(*) AS n
FROM events
GROUP BY event_type
"""

def events_windowed_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same tumbling-window aggregate executed as a Structured Streaming
    job: readStream over the events parquet → 10-min watermark → F.window →
    availableNow trigger into an in-memory sink. Returns the sink table —
    values must equal the batch formulation (and the DuckDB oracle).
    """
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n_events", "sum_value",
        )
    )
    name = "events_windowed_stream_sink"
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

EVENTS_WINDOWED_STREAMING_ORACLE = """
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication: the first occurrence of each
    (user_id, event_type) pair across the stream, via dropDuplicates state.

    Emitting only the key columns keeps the result deterministic (which
    physical row "wins" inside a key is arrival-order dependent; the key set
    is not), so the oracle is a plain SELECT DISTINCT. At 100 TB the state
    store is the concern, not the compute: production would add
    `withWatermark` + dropDuplicatesWithinWatermark to bound state to the
    dedup horizon; availableNow over a finite source doesn't need it and a
    watermark here could drop legitimate first-arrivals if file order
    disagrees with event time across micro-batches."""
    stream = _events_stream(spark, sf_dir)
    deduped = stream.select("user_id", "event_type").dropDuplicates(
        ["user_id", "event_type"]
    )
    name = "streaming_dedup_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)

STREAMING_DEDUP_ORACLE = """
SELECT DISTINCT user_id, event_type FROM events
"""

def sessionize_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a *custom stateful streaming operator*:
    readStream → groupBy(user) → applyInPandasWithState, keeping the open
    session (last ts + running aggregates) as group state across micro-batches
    and emitting a session row whenever the 30-min gap closes it (update
    mode). With the availableNow trigger the final micro-batch also emits the
    still-open session, so the result equals the batch formulation
    (sessionize) and shares its DuckDB oracle.

    Money sums accumulate as exact DECIMAL(18,2) cents (decimal.Decimal over
    the exact binary double, HALF_UP) — the same rounding Spark's
    cast(value AS DECIMAL(18,2)) applies in the batch/oracle formulations.

    Ordering contract: batches must arrive in event-time order (per key) —
    the contract of time-partitioned file drops or per-key-ordered log
    offsets, proven by the multi-file in-order test. A historically
    UNORDERED replay is the built-in session_window's job
    (events_session_window), whose merge semantics are order-free.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    stream = _events_stream(spark, sf_dir).withColumn("ts_us", F.unix_micros("ts"))
    stream = stream.select("user_id", "event_id", "ts_us", "value")

    gap_us = SESSION_GAP_MIN * 60 * 1_000_000

    def fn(key, pdfs, state: GroupState):
        import decimal

        import pandas as pd

        cent = decimal.Decimal("0.01")

        def cents(v: float) -> int:
            return int(decimal.Decimal(v).quantize(
                cent, rounding=decimal.ROUND_HALF_UP) * 100)

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts_us", "event_id"])
        if state.exists:
            seq, n, start_us, end_us, sum_cents = state.get
        else:
            seq, n, start_us, end_us, sum_cents = 0, 0, None, None, 0
        out = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if n and ts_us - end_us > gap_us:
                out.append((key[0], seq, n, start_us, end_us, sum_cents))
                seq, n, start_us, sum_cents = seq + 1, 0, ts_us, 0
            if not n:
                start_us = ts_us
            n += 1
            end_us = ts_us
            sum_cents += cents(float(value))
        state.update((seq, n, start_us, end_us, sum_cents))
        # availableNow: this is the last chance to surface the open session;
        # if more data arrived later, update mode would re-emit it corrected
        out.append((key[0], seq, n, start_us, end_us, sum_cents))
        df = pd.DataFrame(out, columns=[
            "user_id", "session_seq", "n_events", "start_us", "end_us", "cents"])
        yield pd.DataFrame({
            "user_id": df["user_id"],
            "session_seq": df["session_seq"],
            "n_events": df["n_events"],
            "session_start": pd.to_datetime(df["start_us"], unit="us"),
            "session_end": pd.to_datetime(df["end_us"], unit="us"),
            "sum_value": df["cents"] / 100.0,
        })

    out_schema = ("user_id long, session_seq long, n_events long, "
                  "session_start timestamp, session_end timestamp, "
                  "sum_value double")
    state_schema = ("seq long, n long, start_us long, end_us long, "
                    "sum_cents long")
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )

    name = "sessionize_stream_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            sessions.writeStream.format("memory").queryName(name)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # The memory sink accumulates update-mode re-emissions: if availableNow
    # splits the source into several micro-batches, a session open at a batch
    # boundary is emitted once per batch (each emission more complete than the
    # last). Within a (user_id, session_seq) key, n_events and session_end are
    # monotone across emissions, so keeping the max-(n_events, session_end)
    # row recovers exactly the final state — batch-equivalent regardless of
    # how the file source was split.
    from pyspark.sql import Window as W

    sink = spark.table(name)
    w_latest = W.partitionBy("user_id", "session_seq").orderBy(
        F.desc("n_events"), F.desc("session_end"))
    return (
        sink.withColumn("_rn", F.row_number().over(w_latest))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

# same semantics as the batch sessionize — shares its oracle
SESSIONIZE_STREAMING_ORACLE = SESSIONIZE_ORACLE

def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for every 'purchase' event, the most recent prior (or
    simultaneous) 'click' by the same user, with its value.

    Spark has no ASOF JOIN operator; the scalable formulation is the tagged
    union + last(ignorenulls) running window: both sides shuffle ONCE on
    user_id, the window scans each user's timeline in ts order, and every
    left row picks up the right side's last-seen state. No range self-join,
    no per-row subquery — this is the shape that survives a billion events
    per user bucket. Ordering (ts, tag, event_id) is total, so ties are
    deterministic in both engines (click-before-purchase at equal ts)."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    left = ev.where(F.col("event_type") == "purchase")
    right = ev.where(F.col("event_type") == "click")
    tagged = left.select(
        "event_id", "user_id", "ts", F.lit(1).alias("tag"),
        F.lit(None).cast("double").alias("rv"),
    ).unionByName(right.select(
        "event_id", "user_id", "ts", F.lit(0).alias("tag"),
        F.col("value").cast("double").alias("rv"),
    ))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        tagged
        .withColumn("last_click_ts",
                    F.last(F.when(F.col("tag") == 0, F.col("ts")), ignorenulls=True).over(w))
        .withColumn("last_click_value",
                    F.last(F.when(F.col("tag") == 0, F.col("rv")), ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
    )
    return out.select(
        "event_id", "user_id", "ts", "last_click_ts", "last_click_value"
    )

ASOF_JOIN_ORACLE = """
WITH tagged AS (
    SELECT event_id, user_id, ts, 1 AS tag, CAST(NULL AS DOUBLE) AS rv
    FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT event_id, user_id, ts, 0 AS tag, CAST(value AS DOUBLE) AS rv
    FROM events WHERE event_type = 'click'
),
x AS (
    SELECT *,
           last_value(CASE WHEN tag = 0 THEN ts END IGNORE NULLS) OVER w AS last_click_ts,
           last_value(CASE WHEN tag = 0 THEN rv END IGNORE NULLS) OVER w AS last_click_value
    FROM tagged
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS UNBOUNDED PRECEDING)
)
SELECT event_id, user_id, CAST(ts AS TIMESTAMP_NS) AS ts,
       CAST(last_click_ts AS TIMESTAMP_NS) AS last_click_ts,
       last_click_value
FROM x WHERE tag = 1
"""

RANGE_JOIN_WINDOW_MIN = 5

def interval_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range join: for every 'error' event, how many 'click' events
    by the same user landed within ±5 minutes.

    A naive formulation is an inequality join (cross product per user); the
    scale shape buckets time into window-sized cells, explodes each left row
    to its bucket and both neighbors, equi-joins on (user_id, bucket) — the
    only shuffle, with bounded fan-out — and applies the exact |Δt| filter
    after. Same pattern as the spatial grid join, one dimension down."""
    ev = _events(spark, sf_dir)
    win_us = RANGE_JOIN_WINDOW_MIN * 60 * 1_000_000
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    left = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", us("ts").alias("t_err"),
    ).withColumn(
        "bucket",
        F.explode(F.array(
            F.floor(F.col("t_err") / win_us) - 1,
            F.floor(F.col("t_err") / win_us),
            F.floor(F.col("t_err") / win_us) + 1,
        )),
    )
    right = ev.where(F.col("event_type") == "click").select(
        "user_id", us("ts").alias("t_clk"),
    ).withColumn("bucket", F.floor(F.col("t_clk") / win_us))
    joined = (
        left.join(right, ["user_id", "bucket"])
        .where(F.abs(F.col("t_clk") - F.col("t_err")) <= win_us)
        .groupBy("error_id")
        .agg(F.count("*").alias("n_nearby_clicks"))
    )
    base = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id")
    )
    return base.join(joined, "error_id", "left").select(
        "error_id", F.coalesce("n_nearby_clicks", F.lit(0)).alias("n_nearby_clicks")
    )

INTERVAL_RANGE_JOIN_ORACLE = f"""
WITH err AS (
    SELECT event_id AS error_id, user_id,
           CAST(floor(epoch_us(ts)) AS BIGINT) AS t_err
    FROM events WHERE event_type = 'error'
),
clk AS (
    SELECT user_id, CAST(floor(epoch_us(ts)) AS BIGINT) AS t_clk
    FROM events WHERE event_type = 'click'
)
SELECT e.error_id,
       count(c.t_clk) AS n_nearby_clicks
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id
 AND abs(c.t_clk - e.t_err) <= {RANGE_JOIN_WINDOW_MIN * 60 * 1000000}
GROUP BY e.error_id
"""

def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (view → purchase attribution): each purchase
    joins the same user's views from the previous 30 minutes. Both sides are
    Structured Streaming readers with watermarks; the join carries the
    event-time range condition Spark needs to bound state retention (without
    it the join state grows forever — the canonical stream-stream trap).

    availableNow trigger + memory sink so the result is a finite table the
    DuckDB batch oracle reproduces exactly.

    Scale: state is partitioned by user_id (the equi key); the watermark +
    time bound let each micro-batch evict view rows older than 30 min past
    the watermark, so state size tracks the join window, not the stream.
    """
    def read(alias: str, typ: str) -> DataFrame:
        s = _events_stream(spark, sf_dir)
        return (
            s.where(F.col("event_type") == typ)
            .select(
                F.col("event_id").alias(f"{alias}_id"),
                F.col("user_id").alias(f"{alias}_user"),
                F.col("ts").alias(f"{alias}_ts"),
                F.col("value").alias(f"{alias}_value"),
            )
            .withWatermark(f"{alias}_ts", "10 minutes")
        )

    views, purchases = read("v", "view"), read("p", "purchase")
    joined = views.join(
        purchases,
        F.expr(
            "v_user = p_user AND "
            "p_ts >= v_ts AND p_ts <= v_ts + INTERVAL 30 MINUTES"
        ),
        "inner",
    ).select(
        F.col("v_user").alias("user_id"), "v_id", "p_id",
        F.unix_micros("v_ts").alias("view_us"),
        F.unix_micros("p_ts").alias("purchase_us"),
    )
    name = "stream_stream_join_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)

STREAM_STREAM_JOIN_ORACLE = """
SELECT v.user_id,
       v.event_id AS v_id,
       p.event_id AS p_id,
       epoch_us(v.ts) AS view_us,
       epoch_us(p.ts) AS purchase_us
FROM events v
JOIN events p
  ON v.event_type = 'view' AND p.event_type = 'purchase'
 AND v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
"""

def streaming_snapshot_publish(spark: SparkSession, sf_dir: str,
                               table: str = "events_hourly") -> DataFrame:
    """Incremental refresh wired into the blue-green catalog: a streaming
    windowed aggregate lands each micro-batch through foreachBatch →
    publish_snapshot (versioned table + atomic view swap + retention). This
    is the reference's batch cadence (cron full-rebuild + swap,
    airflow_dag/dag_geo_pipeline.py:38, ecs_loader/load_to_postgres.py:293-304)
    upgraded to arrive-and-refresh semantics: consumers always read
    vw_{table}, never a half-written snapshot.

    availableNow makes the run finite; on a cluster the same code tails a
    growing directory. Returns the published view's contents.
    """
    from ..plans.catalog import publish_snapshot

    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "event_type", "n_events", "sum_value",
        )
    )

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        # batch id encoded as a REAL rolling date so the version stays
        # date-shaped (catalog._DATE_RE) for ANY batch count — the old
        # f"1970_01_{id+1:02d}" form broke the retention regex at batch 99
        # and emitted non-dates (1970_01_45) from batch 31 on
        import datetime

        version = (datetime.date(1970, 1, 1)
                   + datetime.timedelta(days=batch_id)).strftime("%Y_%m_%d")
        publish_snapshot(
            batch_df.sparkSession, batch_df, table, version,
            grain=["window_start_us", "event_type"],
        )

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.foreachBatch(publish)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # the publishes above ran in foreachBatch's CLONED session; the relation
    # cache is per-session, so on a re-run (snapshot overwritten) THIS
    # session still holds the old file listing — refresh here, in the
    # session the caller reads from
    from ..plans.catalog import list_snapshots

    for snap in list_snapshots(spark, table):
        spark.catalog.refreshTable(snap)
    spark.catalog.refreshTable(f"vw_{table}")
    return spark.table(f"vw_{table}")

STREAMING_SNAPSHOT_PUBLISH_ORACLE = """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""

def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    customer dimension (user_id % |customers| → segment), aggregated per
    segment. The static side needs no watermark and no state — Spark
    re-plans it per micro-batch, and with a small dim it stays a broadcast
    hash join inside the streaming plan. Completes the join matrix:
    stream-stream (stream_stream_join), stream-static (here), static-static
    (everything else).
    """
    stream = _events_stream(spark, sf_dir)
    cust = _rpc(spark, f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    n_cust = cust.count()
    enriched = stream.withColumn(
        "ck", F.pmod(F.col("user_id"), F.lit(n_cust)) + 1
    ).join(F.broadcast(cust), "ck", "inner")
    agg = (
        enriched.groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
    )
    name = "stream_static_enrich_sink"
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

STREAM_STATIC_ENRICH_ORACLE = """
SELECT c_mktsegment, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
JOIN customer ON c_custkey = user_id % (SELECT count(*) FROM customer) + 1
GROUP BY 1, 2
"""

def streaming_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming geofence: each event carries a lattice point (user_id /
    event_id integers), candidate fence cells are computed ARITHMETICALLY
    map-side (the 12-stride/15-size region grid means ≤2 candidate indexes
    per axis — explode(sequence(...)), never a stream×dim fan-out), the
    50-row region dim joins broadcast on the candidate id, and
    ST_Contains verifies containment inside the streaming plan — the
    registered spatial UDFs' first Structured Streaming appearance.
    Hourly windowed counts per region, complete mode (same shape as
    stream_static_enrich).

    100 TB: candidate generation is a per-row projection (no shuffle); the
    only exchange is the windowed count keyed by (region, window). Points
    above the grid's y-extent (py > 63, where no fence can contain them)
    are filtered BEFORE candidate generation — without that guard the
    clamped sequence() bounds invert for py > 63 and Spark emits a
    DESCENDING sequence of spurious candidates. With it, the interval
    [max(0,⌈(p-15)/12⌉), min(max,⌊p/12⌋)] enumerates exactly the covering
    fences, so the ST_Contains filter is provably redundant — it runs as
    an in-stream assertion that the spatial UDF path works under
    micro-batch execution, and drops nothing."""
    from ..functions.spatial import register_spatial_functions
    from ..plans import fixtures

    register_spatial_functions(spark)
    stream = _events_stream(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    pts = stream.selectExpr(
        "ts",
        "user_id % 100 AS px",
        "(event_id * 7) % 100 AS py",
    ).where("py <= 63")  # grid y-extent: 4*12+15; beyond it no fence covers
    cand = pts.selectExpr(
        "ts", "px", "py",
        "explode(sequence(greatest(0, CAST(ceil((px - 15) / 12.0) AS INT)),"
        " least(9, CAST(px DIV 12 AS INT)))) AS ix",
    ).selectExpr(
        "ts", "px", "py", "ix",
        "explode(sequence(greatest(0, CAST(ceil((py - 15) / 12.0) AS INT)),"
        " least(4, CAST(py DIV 12 AS INT)))) AS iy",
    ).selectExpr("ts", "px", "py", "CAST(iy * 10 + ix AS BIGINT) AS cand_id")
    joined = cand.join(F.broadcast(regions),
                       cand["cand_id"] == regions["id"], "inner")
    fenced = joined.where(F.expr(
        "ST_Contains(region_geometry, concat('POINT (', px, ' ', py, ')'))"))
    agg = (fenced.groupBy(F.window("ts", "1 hour"), F.col("id"))
           .agg(F.count("*").alias("n_events"))
           .select(F.col("window.start").alias("window_start"),
                   F.col("id").alias("region_id"), "n_events"))
    name = "streaming_geofence_sink"
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

STREAMING_GEOFENCE_ORACLE = """
WITH regions AS (
    SELECT id, gx1, gy1, gx1 + 15 AS gx2, gy1 + 15 AS gy2
    FROM (
        SELECT DISTINCT s_suppkey % 50 AS id,
               (s_suppkey % 50) % 10 * 12                        AS gx1,
               CAST(floor((s_suppkey % 50) / 10) AS BIGINT) * 12 AS gy1
        FROM supplier
    )
),
pts AS (
    SELECT ts, user_id % 100 AS px, (event_id * 7) % 100 AS py
    FROM events
)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
       r.id AS region_id,
       count(*) AS n_events
FROM pts p JOIN regions r
  ON r.gx1 <= p.px AND p.px <= r.gx2 AND r.gy1 <= p.py AND p.py <= r.gy2
GROUP BY 1, 2
"""

# ------------------------------------------------- sliding / session windows

def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping window (1h length, 30min slide): each event lands in exactly
    window/slide = 2 windows. F.window expands rows BEFORE the aggregate, so
    the shuffle carries 2x rows keyed by (window, type) — still one hash
    aggregate with map-side combine; at 100TB the fan-out factor is the
    window/slide ratio, chosen small on purpose."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), F.col("event_type"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("sum_value"))
        .select(F.col("window.start").alias("window_start"),
                "event_type", "n_events", "sum_value")
    )

# an event at epoch second e belongs to the two 30-min-aligned starts
# floor(e/1800)*1800 and floor(e/1800)*1800 - 1800 (window 3600 > slide 1800)
EVENTS_SLIDING_WINDOW_ORACLE = """
WITH w AS (
    SELECT event_type, value,
           make_timestamp(unnest([
               CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000,
               (CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800) * 1000000
           ])) AS window_start
    FROM events
)
SELECT CAST(window_start AS TIMESTAMP_NS) AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM w
GROUP BY window_start, event_type
"""

def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization via the BUILT-IN F.session_window (the
    declarative counterpart of the applyInPandasWithState sessionizer
    above): windows merge while consecutive events are <= 30min apart.
    Native aggregate — session merging happens JVM-side inside the
    aggregation, one shuffle on user_id, no Python boundary."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id",
                   F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
             .alias("sum_value"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "sum_value")
    )

# session_window's end = last event ts + gap; same gaps-and-islands core as
# SESSIONIZE_ORACLE with the strict-> boundary (diff > gap opens a session)
EVENTS_SESSION_WINDOW_ORACLE = f"""
WITH marked AS (
    SELECT *,
           CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                     > {SESSION_GAP_MIN * 60 * 1_000_000}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts, event_id
        ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM marked
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP_NS) AS session_start,
       CAST(max(ts) + INTERVAL {SESSION_GAP_MIN} MINUTE AS TIMESTAMP_NS)
           AS session_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM sessions
GROUP BY user_id, session_seq
"""

def events_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed semi-structured path: props parsed ONCE per row with from_json
    against an explicit schema (vs events_json_extract's regex pull) — the
    JVM JSON parser feeds a typed struct, so downstream expressions are
    ordinary codegen'd column math. At 100 TB an explicit schema also means
    no inference pass and a stable type contract across arrivals."""
    from pyspark.sql import types as T

    ev = _events(spark, sf_dir)
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.withColumn("p", F.from_json(F.col("props"), schema))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.sum(F.col("p.k")).alias("sum_k"),
            F.avg(F.col("p.k")).alias("avg_k"),
            F.sum(F.when(F.col("p.k") > 50, 1).otherwise(0)).alias("n_high"),
        )
    )

EVENTS_JSON_TYPED_ORACLE = """
SELECT event_type,
       CAST(sum(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k,
       avg(json_extract(props, '$.k')::BIGINT) AS avg_k,
       CAST(sum(CASE WHEN json_extract(props, '$.k')::BIGINT > 50
                THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events
GROUP BY event_type
"""


def _tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf-based Python state
    client (google.protobuf); absent in minimal containers, present on any
    full Spark 4 deployment (protobuf ships with pyspark[connect])."""
    import importlib.util

    try:
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:  # no 'google' namespace package at all
        return False


def _running_totals_update(state, pdf):
    """Shared per-batch state transition for BOTH stateful APIs:
    (n, mx, cents) ⊕ batch → (n', mx', cents'). Money accumulates in
    integer cents with the same DECIMAL(18,2) HALF_UP quantization as the
    batch/oracle side, so drained equality is exact, not approximate."""
    import decimal

    cent = decimal.Decimal("0.01")
    n, mx, cents = state
    vals = pdf["value"].astype(float)
    n += len(pdf)
    if len(vals):
        bmax = float(vals.max())
        mx = bmax if mx is None or bmax > mx else mx
    for v in vals:
        cents += int(decimal.Decimal(float(v)).quantize(
            cent, rounding=decimal.ROUND_HALF_UP) * 100)
    return n, mx, cents


def user_type_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) running totals as an arbitrary-stateful
    streaming operator: a per-key state cell (count, max, exact-cents sum)
    updated across micro-batches, emitting the running totals each batch in
    update mode. After the availableNow drain, the latest emission per key
    (max n_events — monotone across batches) equals the batch groupBy,
    which is the DuckDB oracle.

    Two implementations of the identical state transition
    (_running_totals_update), chosen by environment:
    - transformWithStateInPandas (Spark 4's arbitrary-state API, explicit
      ValueState on the RocksDB state store) when its protobuf-based Python
      state client is importable — the production path;
    - applyInPandasWithState (the classic GroupState API the sessionizer
      uses) otherwise — e.g. this container, which has no google.protobuf
      and no way to install it. Same keys, same state tuple, same
      emissions, so the drained result is identical by construction.

    Scale: state is one 3-field row per live key, sharded by the grouping
    key across the state store — nothing here is local-mode-only.
    """
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    stream = _events_stream(spark, sf_dir).select("user_id", "event_type", "value")

    state_schema = StructType([
        StructField("n", LongType()),
        StructField("mx", DoubleType()),
        StructField("cents", LongType()),
    ])
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
        StructField("sum_value", DoubleType()),
    ])

    def emit_row(key, n, mx, cents):
        return pd.DataFrame({
            "user_id": [int(key[0])],
            "event_type": [str(key[1])],
            "n_events": [n],
            "max_value": [mx],
            "sum_value": [cents / 100.0],
        })

    if _tws_available():  # pragma: no cover - needs protobuf in env
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        _PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
        _old_provider = spark.conf.get(_PROVIDER_KEY, None)
        spark.conf.set(
            _PROVIDER_KEY,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

        class RunningTotals(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._totals = handle.getValueState("totals", state_schema)

            def handleInputRows(self, key, rows, timerValues):
                st = tuple(self._totals.get()) if self._totals.exists() \
                    else (0, None, 0)
                for pdf in rows:
                    st = _running_totals_update(st, pdf)
                self._totals.update(st)
                yield emit_row(key, *st)

            def close(self) -> None:
                pass

        totals = stream.groupBy("user_id", "event_type") \
            .transformWithStateInPandas(
                statefulProcessor=RunningTotals(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None",
            )
    else:
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def fn(key, pdfs, state: GroupState):
            st = tuple(state.get) if state.exists else (0, None, 0)
            for pdf in pdfs:
                st = _running_totals_update(st, pdf)
            state.update(st)
            yield emit_row(key, *st)

        totals = stream.groupBy("user_id", "event_type") \
            .applyInPandasWithState(
                fn, out_schema, state_schema, "update",
                GroupStateTimeout.NoTimeout,
            )

    name = "user_type_totals_tws_sink"
    try:
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                totals.writeStream.format("memory").queryName(name)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        # restore the caller session's state-store provider: leaving the
        # RocksDB override set would silently change the backend of every
        # LATER streaming query in this session (and fail outright where
        # the RocksDB native lib is absent)
        if _tws_available():  # pragma: no cover - mirrors the set above
            if _old_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, _old_provider)

    from pyspark.sql import Window as W

    sink = spark.table(name)
    w_latest = W.partitionBy("user_id", "event_type").orderBy(F.desc("n_events"))
    return (
        sink.withColumn("_rn", F.row_number().over(w_latest))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


USER_TYPE_TOTALS_TWS_ORACLE = """
SELECT user_id, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       max(value) AS max_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id, event_type
"""


def streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with BOUNDED state: dropDuplicatesWithinWatermark
    evicts a key's dedup state once the event-time watermark passes it —
    the production form of streaming_dedup above, whose plain
    dropDuplicates keeps every key forever (the state-store killer at
    100 TB/day).

    Exactness contract: correctness of "first occurrence wins" holds for
    duplicates arriving within the watermark delay of each other; here the
    delay (30 days) exceeds the fixture's whole event-time span, so no
    state is ever evicted and the drained result equals SELECT DISTINCT
    exactly — while still exercising the real bounded-state operator
    (DedupWithinWatermark, not Dedup, in the physical plan). Production
    sets the delay to the true duplicate horizon (e.g. the Kafka
    redelivery window), trading state size for how-late a duplicate can
    still be suppressed.
    """
    stream = _events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "30 days")
        .select("user_id", "event_type", "ts")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = "streaming_dedup_wm_sink"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            deduped.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


STREAMING_DEDUP_WATERMARKED_ORACLE = STREAMING_DEDUP_ORACLE


def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via Spark 4's VARIANT type: parse_json into
    the binary variant encoding once, then variant_get typed path access —
    the third semi-structured path the engine exercises (regex:
    events_json_extract; schema'd struct: events_json_typed; schemaless
    binary variant: here). VARIANT keeps parse cost at the scan and lets
    Catalyst push typed extraction into codegen — on a 100 TB event lake
    this replaces per-query JSON re-parsing with one decode.

    Output is plain BIGINTs (the variant never leaves the plan), so the
    DuckDB oracle is its native JSON path extraction.
    """
    ev = _events(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n_with_k"),
        )
    )


EVENTS_VARIANT_EXTRACT_ORACLE = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
       CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS n_with_k
FROM events
GROUP BY event_type
"""

# --------------------------------------------------------- streaming CDC

def streaming_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply: the cdc_merge change set arrives as a FILE
    STREAM in three micro-batches, each applied through foreachBatch →
    merge_upsert into a versioned state directory (read state_{i-1}, merge,
    write state_{i} — the incremental form of the blue-green snapshot
    swap). The drained state must equal the one-shot batch MERGE
    (CDC_MERGE_ORACLE), which is the exactness contract.

    Determinism without relying on file-arrival order: batches partition
    the KEY space (custkey % 3), and cdc_merge's change set carries exactly
    one change per key, so per-batch merge application is commutative —
    any trigger order yields the same final state. A totally-ordered
    change log would instead carry a change_seq and reduce each batch to
    max-seq-wins before merging (same plan shape, one extra window).

    Scale: each micro-batch is one co-partitioned (or broadcast) merge
    join against the current snapshot; state lives in the table, not the
    state store — the pattern that keeps streaming upserts bounded at
    100 TB snapshots."""
    import atexit
    import os
    import shutil

    from ..plans.relational import merge_upsert

    cust = _rpc(spark, f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_acctbal").alias("balance"),
    )
    o = _rpc(spark, f"{sf_dir}/orders.parquet")
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey"))
    changes = (
        o.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("balance"),
            F.when(F.col("o_orderstatus") == "F", F.lit("delete"))
            .otherwise(F.lit("upsert")).alias("op"),
            F.pmod(F.col("o_custkey"), F.lit(3)).cast("int").alias("batch"),
        )
    )

    root = tempfile.mkdtemp(prefix="cdc_stream_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    log_dir = f"{root}/changelog"
    changes.write.partitionBy("batch").parquet(log_dir)

    state = {"dir": f"{root}/state_init"}
    cust.write.parquet(state["dir"])

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        cur = sp.read.parquet(state["dir"])
        new_dir = f"{root}/state_{batch_id}"
        merge_upsert(cur, batch_df.select("custkey", "balance", "op"),
                     "custkey", ["balance"]).write.parquet(new_dir)
        state["dir"] = new_dir

    n_files = sum(1 for _, _, fs in os.walk(log_dir)
                  for f in fs if f.endswith(".parquet"))
    if n_files > 0:  # empty change set: the snapshot IS the final state
        stream = (
            spark.readStream.schema(
                "custkey bigint, balance double, op string, batch int")
            .option("maxFilesPerTrigger", "1")
            .parquet(log_dir)
        )
        ckpt = f"{root}/ckpt"
        q = (stream.writeStream.foreachBatch(apply_batch)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        assert n_files >= 3, "change log must span multiple micro-batches"
    return spark.read.parquet(state["dir"]).select(
        "custkey", F.col("balance").cast("double").alias("balance"))

# ------------------------------------------------------ gap fill / resample

def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with linear interpolation: per event_type, the
    hourly value series is densified onto a complete epoch-hour spine
    (sequence + explode) and every missing hour is filled by interpolating
    between its nearest present neighbours (last/first IGNORE NULLS
    windows — no self-join, no per-row lookup).

    Scale: the spine explode is bounded by the series' hour span per key
    (not by row count). Plan (measured): the hourly aggregate is one hash
    shuffle, the spine side arrives broadcast, and all four IGNORE-NULLS
    windows share ONE further event_type partitioning — two data shuffles
    total, window count notwithstanding. The interpolation arithmetic is
    written in the same operand order as the oracle, so values match
    bit-for-bit and the 1e-6 quantization is pure belt-and-braces."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    hourly = (
        ev.groupBy(
            F.col("event_type"),
            F.expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)")
            .alias("h"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)"))
             .cast("double").alias("v"))
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select("event_type",
                F.explode(F.expr("sequence(h0, h1)")).alias("h"))
    )
    dense = spine.join(hourly, ["event_type", "h"], "left")
    w = Window.partitionBy("event_type").orderBy("h")
    back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    marked = dense.select(
        "event_type", "h", "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last(F.when(F.col("v").isNotNull(), F.col("h")),
               ignorenulls=True).over(back).alias("ph"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first(F.when(F.col("v").isNotNull(), F.col("h")),
                ignorenulls=True).over(fwd).alias("nh"),
    )
    return marked.select(
        "event_type", "h",
        F.expr("CAST(v IS NULL AS BOOLEAN)").alias("filled"),
        F.expr(
            "CAST(round((CASE WHEN v IS NOT NULL THEN v"
            " ELSE pv + (nv - pv) * (h - ph) / (nh - ph) END) * 1000000)"
            " AS BIGINT)"
        ).alias("v_q"),
    )

GAP_FILL_INTERPOLATE_ORACLE = """
WITH hourly AS (
    SELECT event_type,
           CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
    FROM events
    GROUP BY 1, 2
),
spine AS (
    SELECT event_type, unnest(range(min(h), max(h) + 1)) AS h
    FROM hourly
    GROUP BY event_type
),
dense AS (
    SELECT s.event_type, s.h, hr.v
    FROM spine s LEFT JOIN hourly hr
      ON s.event_type = hr.event_type AND s.h = hr.h
),
marked AS (
    SELECT event_type, h, v,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
    FROM dense
)
SELECT event_type, h,
       v IS NULL AS filled,
       CAST(round((CASE WHEN v IS NOT NULL THEN v
            ELSE pv + (nv - pv) * (h - ph) / (nh - ph) END) * 1000000)
            AS BIGINT) AS v_q
FROM marked
"""

# ------------------------------------------------- cohort / anomaly zoo

def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen epoch-week,
    crossed with every week they were active — the cohort matrix with
    absolute counts and the retained fraction. Two shuffles total (distinct
    user-week, then cohort aggregate); weeks are integer epoch buckets so
    both engines bucket identically, timezone-free."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    uw = (
        ev.selectExpr(
            "user_id",
            "CAST(floor(unix_timestamp(ts) / 604800) AS BIGINT) AS week",
        ).distinct()
    )
    w = Window.partitionBy("user_id")
    cohorted = uw.withColumn("cohort", F.min("week").over(w))
    cells = cohorted.groupBy("cohort", "week").agg(
        F.countDistinct("user_id").alias("n_active"))
    # cohort size = the week-0 cell, read via a cohort window instead of a
    # self-join (the join form scanned events twice — plan-audited)
    size_w = F.max(
        F.when(F.col("week") == F.col("cohort"), F.col("n_active"))
    ).over(Window.partitionBy("cohort"))
    return (
        cells.withColumn("cohort_size", size_w)
        .selectExpr(
            "cohort", "week", "CAST(week - cohort AS BIGINT) AS week_offset",
            "n_active", "cohort_size",
            "CAST(n_active AS DOUBLE) / cohort_size AS retention",
        )
    )

COHORT_RETENTION_ORACLE = """
WITH uw AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch(ts) / 604800) AS BIGINT) AS week
    FROM events
),
cohorted AS (
    SELECT user_id, week,
           min(week) OVER (PARTITION BY user_id) AS cohort
    FROM uw
),
cells AS (
    SELECT cohort, week, count(DISTINCT user_id) AS n_active
    FROM cohorted GROUP BY 1, 2
),
sizes AS (
    SELECT cohort, n_active AS cohort_size FROM cells WHERE week = cohort
)
SELECT c.cohort, c.week, CAST(c.week - c.cohort AS BIGINT) AS week_offset,
       c.n_active, s.cohort_size,
       CAST(c.n_active AS DOUBLE) / s.cohort_size AS retention
FROM cells c JOIN sizes s ON c.cohort = s.cohort
"""

def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly flags with EXACT cross-engine numerics:
    values are quantized to integer cents first, so the sufficient
    statistics (Σv, Σv²) are exact BIGINT sums — no floating-point
    accumulation order to disagree on — and mean/stddev derive from those
    integers in one deterministic double expression. Flags |z| > 3.
    A zero-variance type (all values equal) yields NULL z_q in BOTH
    engines via nullif(stddev, 0) — never NaN-vs-NULL divergence.

    Scale: one map-side-combined aggregate for the stats (broadcast back),
    one stateless pass for the flags — the standard two-pass shape that
    replaces a per-row window at 100 TB."""
    ev = _events(spark, sf_dir)
    cents = ev.selectExpr(
        "event_id", "event_type",
        "CAST(round(value * 100) AS BIGINT) AS vc",
    )
    stats = cents.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("vc").cast("bigint").alias("s1"),
        F.sum(F.expr("vc * vc")).cast("bigint").alias("s2"),
    )
    return (
        cents.join(F.broadcast(stats), "event_type")
        .selectExpr(
            "event_id", "event_type",
            "CAST(round((vc - CAST(s1 AS DOUBLE) / n)"
            " / nullif(sqrt(CAST(s2 AS DOUBLE) / n"
            " - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)),"
            " CAST(0 AS DOUBLE))"
            " * 1000000) AS BIGINT) AS z_q",
        )
        .selectExpr("event_id", "event_type", "z_q",
                    "CAST(abs(z_q) > 3000000 AS BOOLEAN) AS is_anomaly")
    )

ANOMALY_ZSCORE_ORACLE = """
WITH cents AS (
    SELECT event_id, event_type,
           CAST(round(value * 100) AS BIGINT) AS vc
    FROM events
),
stats AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(vc) AS BIGINT) AS s1,
           CAST(sum(vc * vc) AS BIGINT) AS s2
    FROM cents GROUP BY 1
)
SELECT c.event_id, c.event_type,
       CAST(round((c.vc - CAST(s.s1 AS DOUBLE) / s.n)
            / nullif(sqrt(CAST(s.s2 AS DOUBLE) / s.n
            - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)),
            CAST(0 AS DOUBLE))
            * 1000000) AS BIGINT) AS z_q,
       abs(CAST(round((c.vc - CAST(s.s1 AS DOUBLE) / s.n)
            / nullif(sqrt(CAST(s.s2 AS DOUBLE) / s.n
            - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)),
            CAST(0 AS DOUBLE))
            * 1000000) AS BIGINT)) > 3000000 AS is_anomaly
FROM cents c JOIN stats s ON c.event_type = s.event_type
"""

# ----------------------------------------------------- streaming sketches

def streaming_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog over a STREAM: per-micro-batch register maxima merged
    into a persistent register table (max per (event_type, bucket) —
    merge-order-invariant, so the drained estimate is BIT-IDENTICAL to
    the one-shot batch sketch, which is what the oracle recomputes).
    This is the mergeable-sketch streaming pattern: state is 256 registers
    per key regardless of stream volume, and a restart resumes from the
    register table, not from re-reading history.

    Mechanics mirror streaming_cdc_apply: the events table is re-written
    as a >=3-file change log, drained with maxFilesPerTrigger=1, each
    batch folding its registers into a versioned state dir."""
    import atexit
    import os
    import shutil

    from ..functions.text import portable_hash60
    from ..plans.sketches import HLL_M, _TWO53

    ev = _events(spark, sf_dir)
    h = portable_hash60(F.col("user_id").cast("string"))
    rem = F.shiftright(h, 8)
    rho = F.when(rem > 0, F.lit(53) - F.length(F.bin(rem))).otherwise(F.lit(53))
    tagged = ev.select(
        F.col("event_type"),
        F.pmod(h, F.lit(HLL_M)).alias("b"),
        rho.alias("rho"),
        F.pmod(F.col("event_id"), F.lit(3)).cast("int").alias("batch"),
    )

    root = tempfile.mkdtemp(prefix="hll_stream_")
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    log_dir = f"{root}/changelog"
    tagged.write.partitionBy("batch").parquet(log_dir)

    state = {"dir": None}

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        regs = batch_df.groupBy("event_type", "b").agg(
            F.max("rho").alias("m"))
        if state["dir"] is not None:
            regs = regs.unionByName(sp.read.parquet(state["dir"])) \
                .groupBy("event_type", "b").agg(F.max("m").alias("m"))
        new_dir = f"{root}/state_{batch_id}"
        regs.write.parquet(new_dir)
        state["dir"] = new_dir

    n_files = sum(1 for _, _, fs in os.walk(log_dir)
                  for f in fs if f.endswith(".parquet"))
    if n_files == 0:  # empty stream: no keys, empty sketch
        return spark.createDataFrame(
            [], "event_type string, buckets_used bigint, hll_estimate double")
    stream = (
        spark.readStream.schema("event_type string, b bigint, rho int, batch int")
        .option("maxFilesPerTrigger", "1")
        .parquet(log_dir)
    )
    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", f"{root}/ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    assert n_files >= 3, "change log must span multiple micro-batches"

    regs = spark.read.parquet(state["dir"])
    sums = regs.groupBy("event_type").agg(
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
    return sums.select(
        "event_type",
        F.col("nb").cast("bigint").alias("buckets_used"),
        est.alias("hll_estimate"),
    )

STREAMING_HLL_DISTINCT_ORACLE = """
WITH h AS (
    SELECT event_type,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
    FROM events
),
r AS (
    SELECT event_type, hv % 256 AS b,
           CASE WHEN hv // 256 > 0 THEN 53 - length(bin(hv // 256))
                ELSE 53 END AS rho
    FROM h
),
regs AS (
    SELECT event_type, b, max(rho) AS m FROM r GROUP BY 1, 2
),
sums AS (
    SELECT event_type,
           CAST(sum(1::BIGINT << (53 - m)) AS BIGINT) AS s_present,
           count(*) AS nb
    FROM regs GROUP BY 1
)
SELECT event_type,
       CAST(nb AS BIGINT) AS buckets_used,
       0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 * 9007199254740992.0
           / CAST(s_present + (256 - nb) * 9007199254740992 AS DOUBLE)
           AS hll_estimate
FROM sums
"""


def streaming_hex_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming hexagonal density map (r9): the hex_density_rollup
    assignment — pure codegen arithmetic from the SHARED SQL fragments
    (functions/grid.py), bit-equal to the DuckDB oracle — running
    inside Structured Streaming: per-event lattice point -> flat-top
    axial cell -> hourly windowed count per cell, complete mode.

    100 TB: cell assignment is a stateless per-row projection (no
    Python, no lookup table, no broadcast); the only exchange is the
    windowed count keyed by (window, hq, hr) with map-side partials —
    the streaming twin of the batch rollup's one-shuffle shape."""
    from ..functions.grid import HEX_ROUND_EXPRS, hex_assign_exprs

    stream = _events_stream(spark, sf_dir)
    pts = stream.selectExpr(
        "ts",
        "CAST(user_id % 100 AS DOUBLE) AS px",
        "CAST((event_id * 7) % 100 AS DOUBLE) AS py",
    )
    cells = (
        pts.selectExpr("ts", *hex_assign_exprs("px", "py",
                                               "CAST(6 AS DOUBLE)"))
        .selectExpr("ts", *HEX_ROUND_EXPRS)
    )
    agg = (cells.groupBy(F.window("ts", "1 hour"), "hq", "hr")
           .agg(F.count("*").alias("n_events"))
           .select(F.col("window.start").alias("window_start"),
                   "hq", "hr", "n_events"))
    name = "streaming_hex_density_sink"
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


def _streaming_hex_density_oracle() -> str:
    from ..functions.grid import HEX_ROUND_EXPRS, hex_assign_exprs

    return f"""
WITH pts AS (
    SELECT ts,
           CAST(user_id % 100 AS DOUBLE) AS px,
           CAST((event_id * 7) % 100 AS DOUBLE) AS py
    FROM events
),
frac AS (
    SELECT ts, {", ".join(hex_assign_exprs("px", "py",
                                           "CAST(6 AS DOUBLE)"))}
    FROM pts
),
cells AS (
    SELECT ts, {", ".join(HEX_ROUND_EXPRS)} FROM frac
)
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NS) AS window_start,
       hq, hr, count(*) AS n_events
FROM cells
GROUP BY 1, 2, 3
"""


STREAMING_HEX_DENSITY_ORACLE = _streaming_hex_density_oracle()

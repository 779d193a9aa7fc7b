"""Structured Streaming equivalence: the availableNow windowed aggregate must
equal the batch formulation row-for-row."""

from __future__ import annotations

from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

from tests.conftest import SF_SMOKE

def test_streaming_matches_batch(spark):
    stream_out = EV.events_windowed_streaming(spark, SF_SMOKE).toPandas()
    batch = EV.events_windowed(spark, SF_SMOKE).toPandas()
    key = ["window_start", "event_type"]
    s = stream_out.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["n_events"].values == b["n_events"].values).all()
    assert (s["sum_value"].values == b["sum_value"].values).all()

def test_sessionize_gap_semantics(spark):
    out = EV.sessionize(spark, SF_SMOKE)
    pdf = out.toPandas()
    assert (pdf["n_events"] >= 1).all()
    assert (pdf["session_end"] >= pdf["session_start"]).all()
    # sessions of one user don't overlap
    one = pdf.sort_values(["user_id", "session_start"])
    prev_end = None
    prev_user = None
    for _, r in one.iterrows():
        if prev_user == r["user_id"]:
            assert r["session_start"] > prev_end
        prev_user, prev_end = r["user_id"], r["session_end"]


def test_streaming_dedup_matches_distinct(spark, duck):
    s = EV.streaming_dedup(spark, SF_SMOKE).toPandas()
    o = duck.execute(EV.STREAMING_DEDUP_ORACLE).df()
    key = ["user_id", "event_type"]
    assert sorted(map(tuple, s[key].values.tolist())) == \
        sorted(map(tuple, o[key].values.tolist()))


def test_events_queries_survive_a_fresh_default_session(spark):
    """Round-1 regression: the driver owns its SparkSession, so events
    queries must set their required confs (nanosAsLong, UTC zone) at
    runtime. newSession() starts from default SQLConf — exactly the
    driver's shape; without the runtime confs every events read throws
    PARQUET_TYPE_ILLEGAL."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

    fresh = spark.newSession()
    # simulate the driver's conf state (builder confs absent / adverse)
    fresh.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    fresh.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    n = EV.events_windowed(fresh, SF_SMOKE).count()
    assert n > 0
    assert fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
    assert fresh.conf.get("spark.sql.session.timeZone") == "UTC"


def test_streaming_on_multi_file_events_dir(spark, tmp_path):
    """events.parquet as a DIRECTORY of part files (what any writer
    produces), drained one file per micro-batch: the glob-based read shape
    would silently see ZERO files here, and multi-batch draining is
    exactly the case round-1 ADVICE flagged for sessionize_streaming's
    open-session re-emissions. Both the windowed aggregate and the
    stateful sessionizer must equal their batch formulations."""
    import os
    import time

    from pyspark.sql import functions as F

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

    ev = EV._events(spark, SF_SMOKE)
    sf2 = str(tmp_path)
    # time-partitioned files arriving chronologically — the real multi-file
    # shape (hourly drops). The stateful sessionizer's contract is in-order
    # ARRIVAL (like offset-ordered replay); unordered historical replay is
    # the built-in session_window's job. mtimes force the source's order.
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cuts = [lo + (hi - lo) * i / 3 for i in (1, 2)]
    parts = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    d = f"{sf2}/events.parquet"
    os.makedirs(d)
    now = time.time()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{sf2}/__stage{i}")
        src = next(f for f in os.listdir(f"{sf2}/__stage{i}")
                   if f.endswith(".parquet"))
        dst = f"{d}/part-{i}.parquet"
        os.rename(f"{sf2}/__stage{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    spark.conf.set(EV.MAX_FILES_CONF, "1")  # force 3 micro-batches
    try:
        sw = EV.events_windowed_streaming(spark, sf2).toPandas()
        ss = EV.sessionize_streaming(spark, sf2).toPandas()
    finally:
        spark.conf.unset(EV.MAX_FILES_CONF)
    bw = EV.events_windowed(spark, sf2).toPandas()
    bs = EV.sessionize(spark, sf2).toPandas()

    kw = ["window_start", "event_type"]
    sw = sw.sort_values(kw).reset_index(drop=True)
    bw = bw[sw.columns].sort_values(kw).reset_index(drop=True)
    assert sw.equals(bw)

    ks = ["user_id", "session_seq"]
    ss = ss.sort_values(ks).reset_index(drop=True)
    bs = bs[ss.columns].sort_values(ks).reset_index(drop=True)
    assert ss.equals(bs)


def test_streaming_events_survive_ntz_inference(spark):
    """Round-2 regression: the regenerated events.parquet stores ts as
    TIMESTAMP(MICROS, isAdjustedToUTC=false), which a default session
    infers as TIMESTAMP_NTZ — a type watermarks, F.window, and
    unix_micros all reject. _norm_ts must land every batch AND streaming
    read on plain TIMESTAMP regardless of the parquet flavor, and with
    the session zone pinned UTC the values must equal the batch result."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

    fresh = spark.newSession()
    fresh.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    # the batch read normalizes to TIMESTAMP (not NTZ, not long)
    ev = EV._events(fresh, SF_SMOKE)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # the streaming formulation (watermark + window) must run on the same
    # fresh session and agree with the batch aggregate
    stream = EV.events_windowed_streaming(fresh, SF_SMOKE).toPandas()
    batch = EV.events_windowed(fresh, SF_SMOKE).toPandas()
    key = ["window_start", "event_type"]
    s = stream.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["n_events"].to_numpy() == b["n_events"].to_numpy()).all()
    assert (s["sum_value"].to_numpy() == b["sum_value"].to_numpy()).all()


def test_streaming_contamination_multi_batch_equals_batch(spark, tmp_path):
    """documents.parquet as a DIRECTORY of 3 part files drained one file
    per micro-batch: the drained streaming_contamination sink must equal
    the batch contamination_check on the same data. Exactness across
    batches is the operator's core claim (shingling is row-local, so no
    cross-batch state is ever needed)."""
    import os

    from pyspark.sql import functions as F

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import dedup as DD

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sf2 = str(tmp_path)
    d = f"{sf2}/documents.parquet"
    os.makedirs(d)
    # three part files split by doc_id — each doc in exactly one file
    for i in range(3):
        p = docs.where(F.pmod(F.col("doc_id"), F.lit(3)) == i)
        p.coalesce(1).write.parquet(f"{sf2}/__stage{i}")
        src = next(f for f in os.listdir(f"{sf2}/__stage{i}")
                   if f.endswith(".parquet"))
        os.rename(f"{sf2}/__stage{i}/{src}", f"{d}/part-{i}.parquet")

    spark.conf.set("spark.geoengine.streaming.maxFilesPerTrigger", "1")
    try:
        streamed = {tuple(r) for r in
                    DD.streaming_contamination(spark, sf2)
                    .select("doc_id", "eval_doc", "shared_shingles").collect()}
    finally:
        spark.conf.unset("spark.geoengine.streaming.maxFilesPerTrigger")
    batch = {tuple(r) for r in
             DD.contamination_check(spark, sf2)
             .select("doc_id", "eval_doc", "shared_shingles").collect()}
    assert streamed == batch
    assert len(streamed) > 0


def test_user_type_totals_tws_multi_batch_state(spark, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-state API): the
    per-key ValueState must carry running totals ACROSS micro-batches —
    three chronologically-arriving part files, one per batch, must drain
    to exactly the batch groupBy (count, max, exact-cents sum)."""
    import os
    import time

    from pyspark.sql import functions as F

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

    ev = EV._events(spark, SF_SMOKE)
    sf2 = str(tmp_path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cuts = [lo + (hi - lo) * i / 3 for i in (1, 2)]
    parts = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    d = f"{sf2}/events.parquet"
    os.makedirs(d)
    now = time.time()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{sf2}/__stage{i}")
        src = next(f for f in os.listdir(f"{sf2}/__stage{i}")
                   if f.endswith(".parquet"))
        dst = f"{d}/part-{i}.parquet"
        os.rename(f"{sf2}/__stage{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    spark.conf.set(EV.MAX_FILES_CONF, "1")  # force 3 micro-batches
    try:
        got = EV.user_type_totals_tws(spark, sf2).toPandas()
    finally:
        spark.conf.unset(EV.MAX_FILES_CONF)

    batch = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_events"),
             F.max("value").alias("max_value"),
             F.sum(F.col("value").cast("decimal(18,2)"))
              .cast("double").alias("sum_value"))
        .toPandas()
    )
    k = ["user_id", "event_type"]
    got = got.sort_values(k).reset_index(drop=True)[batch.columns.tolist()]
    batch = batch.sort_values(k).reset_index(drop=True)
    assert got.equals(batch)


def test_streaming_dedup_watermarked_multi_batch(spark, tmp_path):
    """dropDuplicatesWithinWatermark across three chronologically-arriving
    micro-batches: with the delay exceeding the event-time span, no state
    evicts, so cross-batch duplicates must still be suppressed and the
    drained key set equals SELECT DISTINCT."""
    import os
    import time

    from pyspark.sql import functions as F

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming import events as EV

    ev = EV._events(spark, SF_SMOKE)
    sf2 = str(tmp_path)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cuts = [lo + (hi - lo) * i / 3 for i in (1, 2)]
    parts = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    d = f"{sf2}/events.parquet"
    os.makedirs(d)
    now = time.time()
    for i, p in enumerate(parts):
        p.coalesce(1).write.parquet(f"{sf2}/__stage{i}")
        src = next(f for f in os.listdir(f"{sf2}/__stage{i}")
                   if f.endswith(".parquet"))
        dst = f"{d}/part-{i}.parquet"
        os.rename(f"{sf2}/__stage{i}/{src}", dst)
        os.utime(dst, (now + i * 10, now + i * 10))

    spark.conf.set(EV.MAX_FILES_CONF, "1")
    try:
        got = EV.streaming_dedup_watermarked(spark, sf2).toPandas()
    finally:
        spark.conf.unset(EV.MAX_FILES_CONF)
    want = ev.select("user_id", "event_type").distinct().toPandas()
    k = ["user_id", "event_type"]
    got = got.sort_values(k).reset_index(drop=True)
    want = want.sort_values(k).reset_index(drop=True)
    assert got.equals(want)


def test_streaming_cdc_apply_equals_batch_merge(spark):
    """The foreachBatch incremental MERGE loop, drained over >=3 file-source
    micro-batches (asserted inside the operator), must land on exactly the
    one-shot batch MERGE's state."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.relational import cdc_merge
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming.events import (
        streaming_cdc_apply,
    )

    got = sorted(map(tuple, streaming_cdc_apply(spark, SF_SMOKE).collect()))
    want = sorted(
        (r["custkey"], float(r["balance"]))
        for r in cdc_merge(spark, SF_SMOKE).collect()
    )
    assert got == want and len(got) > 0

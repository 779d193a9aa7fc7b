"""Central query registry: every implemented operator from SURVEY.md §2 (plus
the north-star extensions) as a named (spark, sf_dir) -> DataFrame callable,
with its DuckDB oracle SQL where SQL-expressible.

__spark_entry__.py re-exports these for the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..multimodal import binary as MM
from ..operators import dedup as DD
from ..operators import dbscan as DB
from ..operators import graph as GR
from ..operators import hotspot as HS
from ..operators import outlier as OL
from ..operators import similarity as SIM
from ..operators import spatial_join as SJ
from ..sources import layout as LAY
from ..sources import pydatasource as PDS
from ..streaming import events as EV
from . import pipeline as P
from . import quality as Q
from . import relational as R
from . import retrieval as RET
from . import sketches as SK
from . import grid_queries as GQ
from . import spatial_ext_queries as SX
from . import text_queries as TQ
from . import tpch as T

QueryFn = Callable[[SparkSession, str], DataFrame]

"""Registry ordering contract: the driver's correctness gate reads the FIRST
50 entries in insertion order (CORRECTNESS_r02 proved entries 51+ are
invisible to it). The dict is therefore laid out in two tiers:

  tier 1 (entries 1-50)  — every family's strongest representatives, so each
    family (spatial parity, relational/TPC-H, streaming, text, dedup,
    similarity, sketches, multimodal, Python DataSource) lands at least one
    driver-verified green row per round;
  tier 2 (entries 51+)   — the remaining breadth, covered by the committed
    full run of scripts/check_oracles.py (ORACLES_FULL_r*.txt).

tests/test_plans.py::test_gate_window_covers_every_family pins tier 1's
family coverage so a future insertion can't silently push a family out of
the driver's window."""

"""Round-4 rotation (VERDICT r3 item 7): tier 1 keeps the anchors from the
round-3 window (flagship spatial rows, the formerly-red q12, one
representative per family whose implementation changed this round) and
applies one policy throughout the round's sessions: BRAND-NEW CODE EARNS
THE DRIVER GATE FIRST. The first r4 session put its 19 new queries in the
window; the second session rotated in its own new operators (round buffer /
hull / simplify, Hilbert, shard manifest, OOV, recursive CTE, LATERAL,
UNPIVOT, streaming CDC, gap fill, BPE, fuzzy join, cohort, z-score,
transform round-trip), displacing rows that are already driver-green (r3)
or double-judge-replica-verified into tier 2. Every tier-2 query is still
covered each round by the committed full run of scripts/check_oracles.py
(ORACLES_FULL_r4.txt, regenerated at round close over the full registry)."""

QUERIES: dict[str, QueryFn] = {
    # ==================== tier 1: the driver's 50-entry window ============
    # --- anchors kept from the round-3 window ---
    "crop_analytics": P.crop_analytics,
    "crop_analytics_full": P.crop_analytics_full,  # r5: fused one-crossing op
    "crop_analytics_full_chain": P.crop_analytics_full_chain,  # verbatim F.expr chain
    "q12_late_priority": T.q12_late_priority,   # r2's one red row — keep gated
    "sessionize_events_stateful": EV.sessionize_streaming,
    "dedup_clusters": GR.dedup_clusters,        # r4: two-phase star backstop
    "embedding_lsh_ann": SIM.lsh_ann,           # r4: regression watch
    # --- spatial rotation ---
    "spatial_knn_join_grid": SJ.knn_join_grid,
    "crop_analytics_skewed": P.crop_analytics_skewed,
    # --- new-this-session operators (same policy: brand-new code earns the
    # driver gate first; displaced to tier 2: st_geometry_ops /
    # spatial_range_join / token_counts — all driver-green in r3 and
    # unchanged — plus the q3/nation_revenue/top_customers rotation rows,
    # judge-replica-verified twice) ---
    "st_buffer_round": P.st_buffer_round,       # round-join ε-buffer
    "st_binary_carrier_ops": P.st_binary_carrier_ops,  # r8: WKB carrier breadth
    "st_name_parity_ops": P.st_name_parity_ops,  # r8: name-parity batch
    "st_union_aggr_salted": P.st_union_aggr_salted,  # r8: two-phase UDAF
    "st_binary_predicates": P.st_binary_predicates,  # r8: DE-9IM on WKB
    "st_buffer_line_point": P.st_buffer_line_point,  # r7: lineal/puntal
    "st_affine_ops": P.st_affine_ops,           # r7: affine/precision
    "st_measure_ops": P.st_measure_ops,         # r7: distance measures
    "st_shape_edit_ops": P.st_shape_edit_ops,   # r7: shape/editor ops
    "st_aggr_ops": P.st_aggr_ops,               # r7: *_Aggr UDAF names
    "st_triangulate_ops": P.st_triangulate_ops,  # r7: Delaunay/Voronoi
    "st_concave_hull": P.st_concave_hull,       # r7: length-ratio erosion
    "st_edit_line_ops": P.st_edit_line_ops,     # r7: snap/split/vertex ops
    "st_misc_ops": P.st_misc_ops,               # r7: constructors/bounds
    "st_subdivide_ops": P.st_subdivide_ops,     # r7: bbox-halving split
    "st_convex_hull": P.st_convex_hull,         # monotone-chain hull
    "st_simplify": P.st_simplify,               # Douglas–Peucker
    "hilbert_curve": LAY.hilbert_curve,         # locality-optimal layout
    "doc_shard_manifest": TQ.doc_shard_manifest,
    "vocab_oov_rate": TQ.vocab_oov_rate,
    "recursive_supplier_tree": R.recursive_supplier_tree,  # WITH RECURSIVE
    "lateral_topk_orders": R.lateral_topk_orders,          # LATERAL decorrelation
    "unpivot_metrics": R.unpivot_metrics,                  # wide→long reshape
    "streaming_cdc_apply": EV.streaming_cdc_apply,         # foreachBatch MERGE
    "gap_fill_interpolate": EV.gap_fill_interpolate,       # resample + interp
    "bpe_merge_train": TQ.bpe_merge_train,                 # tokenizer merges
    "fuzzy_token_join": TQ.fuzzy_token_join,               # blocked edit-distance join
    "cohort_retention": EV.cohort_retention,               # weekly cohort matrix
    "anomaly_zscore": EV.anomaly_zscore,                   # exact-int z-score flags
    "st_transform_roundtrip": P.st_transform_roundtrip,    # bijective CRS pair
    "st_transform_utm": P.st_transform_utm,                # r5: CRS registry (UTM 22S)
    "crop_analytics_utm": P.crop_analytics_utm,            # r5: fused dissolve x UTM
    "streaming_hll_distinct": EV.streaming_hll_distinct,   # mergeable-sketch state
    "snapshot_diff": P.snapshot_diff,                      # blue-green CDC report
    "segment_dedup_rewrite": DD.segment_dedup_rewrite,     # C4-style line dedup
    "trajectory_similarity_pairs": SJ.trajectory_similarity_pairs,  # Hausdorff search
    # --- new-this-round operators (brand-new code earns the driver gate
    # first; the displaced TPC-H rotation rows q2/q5/q8/q9/q13/q21 +
    # ngram_topk_corpus are double-judge-replica-verified and move to
    # tier 2 until the r5 rotation) ---
    "embedding_cluster_dedup": GR.embedding_cluster_dedup,
    "spatial_dbscan": DB.spatial_dbscan,  # r9: Sedona 1.7 stats parity
    "getis_ord_hotspots": HS.getis_ord_hotspots,  # r9: Gi* g_local parity
    "local_outlier_factor": OL.local_outlier_factor,  # r9: LOF parity
    "st_from_text_ops": SX.st_from_text_ops,      # r9 name batch
    "st_orientation_ops": SX.st_orientation_ops,  # r9 name batch
    "st_clearance_ops": SX.st_clearance_ops,      # r9 name batch
    "st_grid_ops": GQ.st_grid_ops,                # r9: tiling constructors
    "hex_density_rollup": GQ.hex_density_rollup,  # r9: codegen hex binning
    "st_srid_ops": SX.st_srid_ops,                # r9: SRID text carriage
    "st_xml_ops": SX.st_xml_ops,                  # r9: KML/GML round trips
    "st_polygonize_ops": SX.st_polygonize_ops,    # r9: noding/face extraction
    "st_collect_ops": SX.st_collect_ops,          # r9: Collect/Points/MemSize
    "streaming_hex_density": EV.streaming_hex_density,  # r9: codegen hex in SS
    "token_packing": TQ.token_packing,
    "lm_bigram_score": RET.lm_bigram_score,
    "phrase_search": RET.phrase_search,
    "dup_ngram_spans": DD.dup_ngram_spans,
    "pagerank_links": GR.pagerank_links,
    "user_type_totals_tws": EV.user_type_totals_tws,
    "chunk_documents": RET.chunk_documents,
    "sql_udf_chunk_plan": RET.sql_udf_chunk_plan,
    "streaming_dedup_watermarked": EV.streaming_dedup_watermarked,
    "dedup_apply": GR.dedup_apply,
    "corpus_report": GR.corpus_report,
    "llm_pipeline_report": RET.llm_pipeline_report,
    "triangle_count": GR.triangle_count,
    # --- streaming rotation ---
    # --- text rotation ---
    "repetition_scores": TQ.repetition_scores,
    # --- dedup rotation ---
    "ngram_jaccard_pairs": DD.ngram_jaccard_pairs,
    # --- similarity rotation ---
    "embedding_pq_ann": SIM.pq_ann,
    "embedding_cosine_near_dup": SIM.cosine_near_dup,
    "embedding_near_dup_topm": SIM.near_dup_topm,   # r13: bounded output
    "embedding_rep_near_dup": SIM.rep_near_dup,     # r13: linear compute
    # --- sketches rotation ---
    "reservoir_per_group": SK.reservoir_per_group,
    # --- multimodal / Python DataSource rotation ---
    "multimodal_wav_decode": MM.multimodal_wav_decode,  # NEW r4: real audio
    "multimodal_y4m_decode": MM.multimodal_y4m_decode,  # NEW r4: real video
    "pyds_sensor_stream_totals": PDS.sensor_stream_totals,
    # ==================== tier 2: full breadth (entries 51+) ==============
    "embedding_pq_rerank": SIM.pq_rerank,
    "arrow_quant_stats": SIM.arrow_quant_stats,
    "streaming_snapshot_publish": EV.streaming_snapshot_publish,
    "observed_load_metrics": Q.observed_load_metrics,
    "events_variant_extract": EV.events_variant_extract,
    "stream_static_enrich": EV.stream_static_enrich,
    "multimodal_resize": MM.multimodal_resize,
    "streaming_contamination": DD.streaming_contamination,
    "events_sliding_window": EV.events_sliding_window,
    "multimodal_frame_sample": MM.multimodal_frame_sample,
    # --- spatial (driver-green in r3) ---
    "st_geometry_ops": P.st_geometry_ops,
    "st_point_line_ops": P.st_point_line_ops,   # r6: typed WKT kernel
    "st_dwithin_join": SJ.st_dwithin_join,      # r6: ST_DWithin as a join
    "st_line_clip": P.st_line_clip,             # r6: lineal x areal clip
    "st_wkb_roundtrip": P.st_wkb_roundtrip,     # r6: WKB interchange
    "st_predicates": P.st_predicates,           # r6: DE-9IM on areal pairs
    "st_line_relate": P.st_line_relate,         # r6: DE-9IM lineal x areal
    "st_accessors": P.st_accessors,             # r6: accessor/constructor set
    "st_geojson_roundtrip": P.st_geojson_roundtrip,  # r6: RFC 7946
    "st_geohash_agg": P.st_geohash_agg,         # r6: geohash bucketing
    "st_geohash_decode": P.st_geohash_decode,   # r6: geohash inverse
    "st_geomcollection_ops": P.st_geomcollection_ops,  # r7: GC + Z surface
    "st_geodesic_ops": P.st_geodesic_ops,       # r7: sphere/spheroid
    "st_symdiff_ops": P.st_symdiff_ops,         # r6: symdiff/makeline/norm
    "st_metadata_ops": P.st_metadata_ops,       # r6: metadata/affine set
    "streaming_geofence": EV.streaming_geofence,  # r6: ST_* under streaming
    "st_collect_dump": P.st_collect_dump,       # r6: geometry UDAF + dump
    "st_relate_matrix": P.st_relate_matrix,     # r6: full DE-9IM matrix
    "st_linear_ref": P.st_linear_ref,           # r6: linear referencing
    "st_line_clip_lshape": P.st_line_clip_lshape,  # r6: general clip
    "st_relate_line": P.st_relate_line,         # r6: DE-9IM all pairs
    "st_intersects_join": SJ.st_intersects_join,  # r6: Sedona join shape
    "spatial_range_join": SJ.spatial_range_join,
    # r6: the documented non-broadcast scale path, same oracle — the pair
    # generator as a hash join on cell ids instead of a broadcast
    "spatial_range_join_fallback":
        lambda spark, sf_dir: SJ.spatial_range_join(
            spark, sf_dir, broadcast_dim=False),
    "token_counts": TQ.token_counts,
    "q3_shipping_priority": R.q3_shipping_priority,
    "nation_revenue": R.nation_revenue,
    "top_customers_per_nation": R.top_customers_per_nation,
    "q18_large_orders": R.q18_large_orders,
    "training_mix": TQ.training_mix,
    "udtf_token_explode": TQ.udtf_token_explode,
    "event_funnel": TQ.event_funnel,
    "profile_table": SK.profile_table,
    "crop_analytics_orc_roundtrip": P.crop_analytics_orc_roundtrip,
    "salted_join_revenue": R.salted_join_revenue,
    "running_distinct_users": R.running_distinct_users,
    "bpe_tokenize_apply": TQ.bpe_tokenize_apply,
    "st_area_rect": P.st_area_rect,
    "st_intersection_area": P.st_intersection_area,
    "geo_range_join": SJ.geo_range_join_count,
    "zorder_curve": LAY.zorder_curve,
    "points_in_regions": SJ.points_in_regions,
    "spatial_knn_join": SJ.knn_join_numpy,  # r5: vectorized top-k (bit-identical, 3x at sf1)
    "spatial_knn_join_lambda": SJ.knn_join,  # the HOF form it replaced
    "crop_analytics_csv_roundtrip": P.crop_analytics_csv_roundtrip,
    "crop_analytics_jsonl_roundtrip": P.crop_analytics_jsonl_roundtrip,
    # --- relational / TPC-H ---
    "q1_pricing_summary": R.q1_pricing_summary,
    "window_zoo": R.window_zoo,
    "scd2_history": R.scd2_history,
    "cdc_merge": R.cdc_merge,
    "late_ship_orders": R.late_ship_orders,
    "customers_without_orders": R.customers_without_orders,
    "distinct_agg": R.distinct_agg,
    "cube_sales": R.cube_sales,
    "grouping_sets": R.order_priority_grouping_sets,
    "filter_sort_limit": R.filter_sort_limit,
    "scalar_functions": R.scalar_functions,
    "nation_trade_flows": R.nation_trade_flows,
    "q4_order_priority": R.q4_order_priority,
    "q17_small_quantity": R.q17_small_quantity_revenue,
    "q6_forecast_revenue": T.q6_forecast_revenue,
    "q10_returned_items": T.q10_returned_items,
    "q11_important_parts": T.q11_important_parts,
    "q14_promo_revenue": T.q14_promo_revenue,
    "q15_top_supplier": T.q15_top_supplier,
    "q16_parts_supplier_count": T.q16_parts_supplier_count,
    "q19_disjunctive_revenue": T.q19_disjunctive_revenue,
    "q20_dominant_suppliers": T.q20_dominant_suppliers,
    "q22_dormant_customers": T.q22_dormant_customers,
    "q2_min_cost_supplier": T.q2_min_cost_supplier,
    "q5_local_supplier_volume": T.q5_local_supplier_volume,
    "q8_market_share": T.q8_market_share,
    "q9_product_profit": T.q9_product_profit,
    "q13_customer_distribution": T.q13_customer_distribution,
    "q21_waiting_suppliers": T.q21_waiting_suppliers,
    "rollup_sales": R.rollup_sales,
    "pivot_order_status": R.pivot_order_status,
    "set_ops": R.set_ops,
    "part_window_stats": R.part_window_stats,
    "expectations_check": Q.expectations_check,
    "incremental_rollup": Q.incremental_rollup,
    "events_json_extract": EV.events_json_extract,
    "interval_range_join": EV.interval_range_join,
    "hash_sample": SK.hash_sample,
    "stratified_sample": SK.stratified_sample,
    # --- streaming ---
    "events_windowed": EV.events_windowed,
    "sessionize_events": EV.sessionize,
    "events_windowed_streaming": EV.events_windowed_streaming,
    "streaming_dedup": EV.streaming_dedup,
    "asof_join": EV.asof_join,
    "stream_stream_join": EV.stream_stream_join,
    "events_session_window": EV.events_session_window,
    "events_json_typed": EV.events_json_typed,
    # --- text ---
    "text_stats": TQ.text_stats,
    "quality_scores": TQ.quality_scores,
    "lang_detect": TQ.lang_detect,
    "bm25_term_scores": TQ.bm25_term_scores,
    "pii_redact": TQ.pii_redact,
    # --- dedup / similarity ---
    "exact_dedup": DD.exact_dedup,
    "minhash_lsh_candidates": DD.minhash_lsh_candidates,
    "simhash": DD.simhash,
    "ngram_jaccard_verified": DD.ngram_jaccard_verified,
    "contamination_check": DD.contamination_check,
    "embedding_topk_cosine": SIM.topk_cosine,
    "embedding_ivf_ann": SIM.ivf_ann,
    "ann_recall_at_k": SIM.ann_recall_at_k,
    "embedding_quantized_topk": SIM.quantized_topk,
    "kmeans_quantized": SIM.kmeans_quantized,
    "ngram_topk_corpus": TQ.ngram_topk_corpus,
    # --- sketches ---
    "hll_distinct": SK.hll_distinct,
    "cms_heavy_hitters": SK.cms_heavy_hitters,
    "histogram_quantile": SK.histogram_quantile,
    "salted_agg_topk": SK.salted_agg_topk,
    "bloom_pruned_orders": SK.bloom_pruned_orders,
    # --- multimodal / Python DataSource ---
    "multimodal_png_decode": MM.multimodal_png_decode,
    "multimodal_jpeg_decode": MM.multimodal_jpeg_decode,  # r8: stdlib baseline JPEG
    "multimodal_jpeg_progressive": MM.multimodal_jpeg_progressive,  # r9: SOF2
    "multimodal_jpeg_lossless": MM.multimodal_jpeg_lossless,  # r12: SOF3
    "multimodal_audio_features": MM.multimodal_audio_features,  # r8: RMS/ZC/peak
    "multimodal_mp3_probe": MM.multimodal_mp3_probe,  # r9: MP3 frame stream
    "multimodal_vp9_probe": MM.multimodal_vp9_probe,  # r9: IVF/VP9 headers
    "multimodal_mp3_granules": MM.multimodal_mp3_granules,  # r10: side info
    "multimodal_mp3_scalefactors": MM.multimodal_mp3_scalefactors,  # r11
    "multimodal_mp3_regions": MM.multimodal_mp3_regions,  # r12: Huffman regions
    "multimodal_mp3_spectrum": MM.multimodal_mp3_spectrum,  # r13: lines
    "multimodal_vp9_compressed": MM.multimodal_vp9_compressed,  # r13
    "multimodal_jpeg_lossless_rgb": MM.multimodal_jpeg_lossless_rgb,
    "multimodal_mp3_band_energy": MM.multimodal_mp3_band_energy,  # r13
    "multimodal_mp3_lsf_scalefactors":
        MM.multimodal_mp3_lsf_scalefactors,  # r12: LSF partitions
    "multimodal_vp9_inter": MM.multimodal_vp9_inter,  # r11
    "multimodal_vp9_superframes": MM.multimodal_vp9_superframes,  # r12
    "multimodal_vp9_headers_full": MM.multimodal_vp9_headers_full,  # r12
    "multimodal_features": MM.multimodal_features,
    "pyds_sensor_hourly": PDS.sensor_hourly,
    "pyds_jsonl_commit_roundtrip": PDS.crop_jsonl_commit_roundtrip,
}

# ======================================================================
# Round-6 rotation (VERDICT r5 item 8): every query whose CODE or ORACLE
# changed this round sits in tier 1 — the typed-WKT routing touched every
# shared ST_* scalar (prefix dispatch), the dtype pinning rewrote 20
# oracle strings (BIGINT CASE keys, TIMESTAMP_NS outputs), the trajectory
# verify moved to per-cell applyInPandas, decode_media gained the H.264
# branch, and two queries are brand new (st_point_line_ops,
# spatial_range_join_fallback). Standing anchors keep their seats.
# Everything else is cumulatively driver-green (r1-r5 union = 158/158,
# judge-computed) and stays covered by the committed full run.
_R6_WINDOW = [
    # --- brand new this round (10) ---
    "st_point_line_ops",
    "spatial_range_join_fallback",
    "st_dwithin_join",
    "st_line_clip",
    "st_wkb_roundtrip",
    "st_predicates",         # DE-9IM family on areal pairs
    "st_line_relate",        # DE-9IM lineal × areal
    "st_accessors",          # accessor/constructor surface
    "st_geojson_roundtrip",  # RFC 7946 interchange
    "st_geohash_agg",        # geohash bucketing
    "st_metadata_ops",       # metadata/affine accessor set
    "streaming_geofence",    # first ST_* under Structured Streaming
    "st_collect_dump",       # ST_Collect UDAF + ST_Dump explode
    "st_relate_matrix",      # full DE-9IM matrix string
    "st_linear_ref",         # linear referencing family
    "st_line_clip_lshape",   # general even-odd clip (non-convex)
    "st_relate_line",        # DE-9IM matrix, all type pairs
    "st_intersects_join",    # JOIN ON ST_Intersects, grid-blocked
    "st_geohash_decode",     # geohash inverse, exact dyadic bounds
    "st_symdiff_ops",        # symdifference / makeline / normalize
    # --- operator code changed this round (8) ---
    "trajectory_similarity_pairs",   # per-cell verify rewrite
    "spatial_range_join",            # broadcast_dim param
    "spatial_knn_join",              # kth clamp in numpy top-k
    "embedding_topk_cosine",         # NaN cos_sim prune
    # (geo_range_join rotated out for st_collect_dump: its changed
    # LAND_USE_CTE text is equally exercised by crop_analytics +
    # st_predicates, both seated)
    "st_geometry_ops",               # shared scalars gained type routing
    # --- ST_* scalars gained the typed-kernel prefix dispatch ---
    # (st_area_rect and st_intersection_area rotated out for the new
    # suites: their shared scalars are covered by st_geometry_ops, and
    # the boolean-kernel intersection now also backs st_relate_matrix's
    # II cell on every seated pair)
    # (st_buffer_round and st_convex_hull rotated out for st_linear_ref
    # and st_line_clip_lshape: the shared prefix dispatch they would
    # re-verify is covered by st_geometry_ops + st_line_clip, both
    # seated; their own scalars are unchanged since their r5
    # driver-green + judge-replica rows)
    # (st_transform_roundtrip rotated out: the CRS scalars are covered by
    # st_transform_utm + crop_analytics_utm, both seated)
    "st_transform_utm",
    # --- oracle dtype pinning: BIGINT CASE keys (10) ---
    "crop_analytics",
    "crop_analytics_full",
    "crop_analytics_full_chain",
    "crop_analytics_skewed",
    "crop_analytics_utm",
    "crop_analytics_csv_roundtrip",
    "crop_analytics_jsonl_roundtrip",
    "crop_analytics_orc_roundtrip",
    "snapshot_diff",
    "pyds_jsonl_commit_roundtrip",
    # --- oracle dtype pinning: TIMESTAMP_NS outputs ---
    # (sessionize_events rotated out for st_symdiff_ops: its stateful
    # twin sessionize_events_stateful shares the oracle and stays)
    "events_windowed",
    # (events_sliding_window and events_windowed_streaming rotated out
    # for st_intersects_join / st_geohash_decode: their TIMESTAMP_NS
    # pinning is equally exercised by the remaining events-family seats)
    "sessionize_events_stateful",
    "events_session_window",
    "asof_join",
    "scd2_history",
    "q3_shipping_priority",
    "q18_large_orders",
    # --- decode_media gained the H.264 branch ---
    # (multimodal_frame_sample rotated out for st_relate_line: the
    # decode_media branch is covered by the three decode seats below)
    "multimodal_png_decode",
    "multimodal_y4m_decode",
    "multimodal_wav_decode",
    # --- standing anchors / family representatives (5) ---
    # (five r5 anchors — q12_late_priority, dedup_clusters, exact_dedup,
    # embedding_lsh_ann, pyds_sensor_stream_totals — rotated out to seat
    # the five new ST_* suites; every family keeps a representative:
    # ngram_jaccard_verified=dedup, embedding_topk_cosine=similarity,
    # pyds_jsonl_commit_roundtrip=pydatasource, q3/q18=relational)
    "ngram_jaccard_verified",
    "repetition_scores",     # text-family seat
    "histogram_quantile",    # sketches-family seat
    "q12_late_priority",     # round-2's only red row: stays driver-visible
]
# ======================================================================
# Round-7 rotation (VERDICT r6 item 7): tier 1 = (a) the r7 blast radius
# — one brand-new query (st_buffer_line_point), the two queries added
# right after the r6 freeze (st_geomcollection_ops, st_geodesic_ops),
# the rewritten buffer walk, the series-seeded Newton CRS inverses, and
# representatives of the WKT-parser fast paths (_parse_ring /
# _split_top_level now feed every areal scalar) — plus (b) the 12
# stalest rows: the r1/r2 relational cohort, driver-unverified for five
# rounds (the cumulative ledger covers them, but staleness rotates in).
# The remaining 18 of that cohort (set_ops, top_customers_per_nation,
# training_mix, udtf_token_explode, q4_order_priority,
# q5_local_supplier_volume, q6_forecast_revenue, q8_market_share,
# q9_product_profit, rollup_sales, scalar_functions,
# pivot_order_status, part_window_stats, nation_trade_flows,
# late_ship_orders, incremental_rollup, grouping_sets,
# expectations_check, distinct_agg, cube_sales,
# customers_without_orders) are r8's stale seats. One seat per family stays
# pinned regardless (test_gate_window_covers_every_family).
_R7_WINDOW = [
    # --- brand new / post-freeze additions (12) ---
    "st_buffer_line_point",      # lineal/puntal ST_Buffer surface
    "st_affine_ops",             # rotate/scale/affine/snap/expand/multi
    "st_measure_ops",            # perimeter/angle/hausdorff/frechet/...
    "st_shape_edit_ops",         # simple/ring/POS/MEC/median/editors
    "st_aggr_ops",               # Envelope/Union/Intersection _Aggr
    "st_triangulate_ops",        # Delaunay / Voronoi
    "st_concave_hull",           # border-erosion concave hull
    "st_edit_line_ops",          # snap / split / vertex surgery
    "st_misc_ops",               # constructors / bounds / project
    "st_subdivide_ops",          # bbox-halving subdivision
    "st_geomcollection_ops",     # GEOMETRYCOLLECTION + Z kernel
    "st_geodesic_ops",           # sphere/spheroid measures
    # --- buffer walk rewritten (shared _round_offset_ring) (2) ---
    "st_buffer_round",
    "st_geometry_ops",
    # --- CRS Newton inverses re-seeded (series seeds, ULP gate) (4) ---
    "st_transform_utm",
    "st_transform_roundtrip",
    "crop_analytics_utm",
    "crop_analytics",            # flagship rides polyconic_inverse
    # --- WKT parser fast paths feed every areal scalar (12) ---
    "st_area_rect",
    "st_intersection_area",
    "st_convex_hull",
    "st_simplify",
    "st_predicates",
    "st_wkb_roundtrip",
    "st_collect_dump",
    "geo_range_join",
    "points_in_regions",
    "crop_analytics_full",
    "crop_analytics_full_chain",
    "crop_analytics_skewed",
    # --- family representatives (one seat per family, pinned by
    # test_gate_window_covers_every_family; streaming_geofence is also
    # r7 blast radius — its descending-sequence guard landed post-freeze)
    "streaming_geofence",        # streaming
    "repetition_scores",         # text
    "ngram_jaccard_verified",    # dedup
    "embedding_topk_cosine",     # similarity
    "histogram_quantile",        # sketches
    "multimodal_png_decode",     # multimodal
    "pyds_jsonl_commit_roundtrip",  # pydatasource
    "q12_late_priority",         # round-2's only red row: stays visible
    # --- stalest cohort: last driver-verified r1/r2 (12) ---
    "filter_sort_limit",
    "nation_revenue",
    "q10_returned_items",
    "q11_important_parts",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_parts_supplier_count",
    "q17_small_quantity",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q2_min_cost_supplier",
    # (q8_market_share, q9_product_profit, rollup_sales,
    # scalar_functions displaced by
    # the four new r7 ST_* suites — they join the r8 stale cohort with
    # set_ops / top_customers_per_nation / training_mix /
    # udtf_token_explode)
]
# ======================================================================
# Round-8 rotation (VERDICT r7 item 7): tier 1 = (a) the r8 blast radius
# — the binary-carrier rewires (st_buffer_round / st_transform_roundtrip
# / st_transform_utm now chain on WKB through functions/geomb.py +
# kernel/packed.py), the brand-new stdlib-JPEG decode query, the
# chunk-folded grouped UDAFs (st_aggr_ops), and every query downstream
# of the r7-advice scalar fixes (_is_areal whitespace, Z/GC buffer
# dispatch, GC perimeter, degenerate ST_Expand) — the fused==verbatim
# crop pair stays seated as the standing equivalence proof; plus (b) the
# 21-query stale cohort the r7 rotation queued (the r1/r2 relational
# rows displaced last round) and the 6 next-stalest family rows.
_R8_WINDOW = [
    # --- binary-carrier rewires + new query + UDAF fold (r8 code) ---
    "multimodal_jpeg_decode",    # NEW: stdlib baseline JPEG round trip
    "st_buffer_round",           # WKB carrier + vectorized convex walk
    "st_transform_roundtrip",    # WKB carrier, double projection
    "st_transform_utm",          # WKB carrier + ST_Coords_B extraction
    "st_aggr_ops",               # chunk-folded UDAFs (bounded hold)
    # --- r7-advice scalar fixes' blast radius ---
    "st_buffer_line_point",      # lineal/puntal buffer dispatch changed
    "st_geomcollection_ops",     # GC buffer-union + GC perimeter
    "st_affine_ops",             # degenerate ST_Expand
    "st_measure_ops",            # ST_Perimeter GC recursion
    "st_geometry_ops",           # shared scalars ride _is_areal
    "st_area_rect",              # ST_Area / GeomFromWKT edge
    "crop_analytics_full_chain", # verbatim ST_ chain (fused==verbatim)
    "crop_analytics_full",       # the fused twin of the pair
    "multimodal_png_decode",     # decode_media gained the JPEG branch
    "crop_analytics",            # flagship; registration caching path
    "crop_analytics_utm",        # CRS registry + caching path
    # --- family representatives (pinned by
    # test_gate_window_covers_every_family) ---
    "streaming_geofence",        # streaming
    "repetition_scores",         # text
    "ngram_jaccard_verified",    # dedup
    "embedding_topk_cosine",     # similarity
    "histogram_quantile",        # sketches
    "pyds_jsonl_commit_roundtrip",  # pydatasource
    "q12_late_priority",         # round-2's only red row: stays visible
    # --- stale cohort queued by the r7 rotation (21) ---
    "set_ops",
    "top_customers_per_nation",
    "training_mix",
    "st_binary_predicates",      # NEW r8 late: DE-9IM on the WKB carrier
    # (udtf_token_explode deferred to r9 — cumulative-ledger green,
    # text family stays seated via repetition_scores + training_mix;
    # brand-new code earns the gate first)
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q8_market_share",
    "q9_product_profit",
    "rollup_sales",
    "scalar_functions",
    "pivot_order_status",
    "part_window_stats",
    "nation_trade_flows",
    "late_ship_orders",
    "incremental_rollup",
    "grouping_sets",
    "expectations_check",
    "distinct_agg",
    "cube_sales",
    "customers_without_orders",
    "st_binary_carrier_ops",     # NEW r8 late: widened WKB carrier
    # --- next-stalest family rows (5; window_zoo deferred — judge
    # replica r7 keeps it verified) ---
    "exact_dedup",
    "multimodal_audio_features", # NEW r8 late: decoded-stream features
    # (minhash_lsh_candidates deferred — judge replica r7 keeps it
    # verified; dedup family stays seated via ngram_jaccard_verified
    # and exact_dedup)
    "st_union_aggr_salted",      # NEW r8 late: salted two-phase UDAF
    # (spatial_knn_join deferred — judge replica r7 keeps it verified)
    "multimodal_wav_decode",     # decode_media module also changed
    "st_name_parity_ops",        # NEW r8 late: name-parity batch
    # (embedding_lsh_ann deferred — cumulative ledger green since r4,
    # similarity family stays seated via embedding_topk_cosine)
]
# ======================================================================
# Round-9 rotation (VERDICT r8 item 7): tier 1 = (a) the r9 blast radius
# — the chain rewriter (st_point_line_ops runs the reference spelling on
# the WKB carrier), the ragged packed codec + typed text lanes + box
# predicate lanes + factorize-uniques parse (every *_B query), the
# canonical puntal/lineal hygiene fixed points (every hygiene caller:
# the crop chains, st_accessors, st_predicates), the hot-cell block
# decomposition (both range-join doors + the fallback), the auto-salted
# ST_Union_Aggr name (st_union_aggr_salted / st_aggr_ops), and the two
# NEW queries (ann_recall_at_k, multimodal_jpeg_progressive; the
# baseline JPEG query stays seated because the marker walk was
# restructured for multi-scan); plus (b) the rows the r8 rotation
# deferred by name (udtf_token_explode, window_zoo,
# minhash_lsh_candidates, embedding_lsh_ann) and the stalest tier-2
# cohort — rows last driver-verified in r5 or earlier (computed as
# registry minus the union of the r6/r7/r8 windows), one per family
# spread. Displaced: the 21-row r1/r2 relational cohort re-verified in
# r8 plus crop_analytics / multimodal_png_decode / st_geometry_ops /
# st_area_rect (driver-green r8, code untouched in r9; the hygiene mask
# they share is seated via the crop chains + st_accessors).
_R10_WINDOW = [
    # --- r10 blast radius (27): the stats-trio scale rewrite (tiled LOF
    # matrices + size-gated broadcasts, block-spine DBSCAN pairs,
    # star-contracted + union-find components), every consumer of
    # connected_components and _cell_block_join, the arrow-laned scalar
    # batches and the base accessors they front (Area / Length / NPoints
    # / X / Y / Z / NumGeometries / NumInteriorRings), the new MP3
    # side-info query, the BNL-audited rows, the standing
    # q12_late_priority seat ---
    "multimodal_mp3_granules",   # NEW: Layer III side-info quantizer law
    "multimodal_mp3_probe",      # encoder grew structured_side
    "spatial_dbscan",            # block-spine pairs + contracted CC
    "local_outlier_factor",      # tiled matrices + broadcast gate
    "getis_ord_hotspots",        # stats-trio seat (shares the point law)
    "dedup_clusters",            # connected_components consumer
    "embedding_cluster_dedup",   # connected_components consumer
    "spatial_range_join",        # _cell_block_join small-cell fast path
    "spatial_range_join_fallback",  # forced-shuffle door of the same
    "geo_range_join",            # WKT door of the same
    "spatial_knn_join",          # grid-join family seat
    "st_from_text_ops",          # arrow lanes (constructors)
    "st_orientation_ops",        # arrow lanes (orientation/flags)
    "st_clearance_ops",          # arrow lanes (clearance/3D/VW)
    "st_accessors",              # ST_X/Y/Z/NPoints lanes
    "st_name_parity_ops",        # broad name surface over laned fns
    "st_aggr_ops",               # ST_Area lane under the UDAFs
    "st_collect_ops",            # NumGeometries/Points/Collect (+Z fix)
    "st_point_line_ops",         # Length/NPoints lanes + chain rewrite
    "crop_analytics_full",       # flagship; ST_Area on the hot path
    "st_srid_ops",               # ST_AsEWKT bad-SRID contract fix
    "ann_recall_at_k",           # BNL size-audited + sweep member
    "histogram_quantile",        # BNL size-audited
    "bm25_term_scores",          # BNL size-audited
    "q12_late_priority",         # r2's one red row: stays visible
    "trajectory_similarity_pairs",  # ST_Length-adjacent spatial seat
    "st_buffer_round",           # carrier heavyweight, sweep member
    # --- stalest tier-2 cohort (23, last driver-verified r3/r4; every
    # displaced row stays in the committed full oracle run and each
    # family keeps at least one seat) ---
    "bloom_pruned_orders",
    "cdc_merge",
    "cms_heavy_hitters",
    "contamination_check",
    "embedding_quantized_topk",
    "events_windowed_streaming",
    "hll_distinct",
    "kmeans_quantized",
    "lang_detect",
    "pii_redact",
    "pyds_sensor_hourly",
    "q1_pricing_summary",
    "quality_scores",
    "salted_agg_topk",
    "sessionize_events",
    "simhash",
    "stream_stream_join",
    "streaming_dedup",
    "token_counts",
    "zorder_curve",
    "chunk_documents",
    "cohort_retention",
    "corpus_report",
]

_R11_WINDOW = [
    # --- r11 blast radius (28): the five newly-laned scalar batches and
    # the wrapper hooks they share (st_area/length/npoints/
    # num_geometries/centroid/bounds/terminal points now dispatch through
    # lanes_ops for EVERY consumer), the three gates that grew the
    # _sampled seam, the LOF pass fusion + single cell exchange, the
    # LSH Hamming-2 probe widening, the two NEW codec-layer queries and
    # the probes whose encoders grew flags, the standing
    # q12_late_priority seat ---
    "multimodal_mp3_scalefactors",  # NEW: part2 scalefactor law
    "multimodal_vp9_inter",         # NEW: inter-frame headers
    "multimodal_vp9_probe",         # encoder grew inter_frames flag
    "multimodal_mp3_granules",      # encoder grew structured_scalefactors
    "st_shape_edit_ops",            # laned (r10 verdict item 1)
    "st_edit_line_ops",             # laned
    "st_measure_ops",               # laned
    "st_affine_ops",                # laned
    "st_misc_ops",                  # laned
    "st_accessors",                 # shared lane hooks (X/Y/Z/NPoints)
    "st_orientation_ops",           # shared lane hooks (NumGeometries)
    "st_point_line_ops",            # Length/NPoints hooks + chainrw
    "st_aggr_ops",                  # ST_Area hook under the UDAFs
    "st_collect_ops",               # NumGeometries/NPoints hooks
    "st_name_parity_ops",           # broad name surface over laned fns
    "st_clearance_ops",             # r10 lanes + new infra
    "st_from_text_ops",             # r10 lanes + new infra
    "crop_analytics_full",          # flagship; ST_Area/centroid hooks
    "st_buffer_round",              # ST_Area hook, sweep member
    "st_triangulate_ops",           # _sampled seam added
    "st_subdivide_ops",             # _sampled seam added
    "st_concave_hull",              # _sampled seam added
    "local_outlier_factor",         # fused LOF + single cell exchange
    "spatial_dbscan",               # events_count cache rekey
    "getis_ord_hotspots",           # stats-trio seat (shared point law)
    "embedding_lsh_ann",            # Hamming-2 probe ring
    "ann_recall_at_k",              # raised lsh floor (800 -> 1500 bp)
    "q12_late_priority",            # r2's one red row: stays visible
    # --- stalest tier-2 cohort (22, last driver-verified r4; every
    # displaced row stays in the committed full oracle run and each
    # family keeps at least one seat) ---
    "hilbert_curve",
    "doc_shard_manifest",
    "vocab_oov_rate",
    "recursive_supplier_tree",
    "lateral_topk_orders",
    "unpivot_metrics",
    "streaming_cdc_apply",
    "gap_fill_interpolate",
    "fuzzy_token_join",
    "streaming_hll_distinct",
    "token_packing",
    "lm_bigram_score",
    "phrase_search",
    "dup_ngram_spans",
    "pagerank_links",
    "event_funnel",                 # text family seat (r5-stale)
    "ngram_topk_corpus",            # text family seat (r5-stale)
    "streaming_dedup_watermarked",
    "ngram_jaccard_pairs",          # dedup family seat (r5-stale)
    "triangle_count",
    "reservoir_per_group",          # sketches family seat (r4-stale)
    "pyds_jsonl_commit_roundtrip",  # pydatasource family seat (r9-stale)
]

_R12_WINDOW = [
    # --- r12 blast radius (19): the two NEW codec-layer queries
    # (multimodal_mp3_regions, multimodal_vp9_superframes) plus the
    # siblings whose shared code moved (the mp3 part2 oracle CTEs are
    # now factored and shared; the vp9 inter parser grew the intra_only
    # path and the encoder the show/superframe args); the adaptive-plane
    # LSH family (lsh_ann, cosine_near_dup share the new bucket law +
    # probe budget + Arrow cogroup scorer; ann_recall's lsh arm + floor
    # sync); the stats trio (DBSCAN's half-neighborhood pairs + the
    # codegen _explode_pairs every _cell_block_join consumer now runs);
    # st_shape_edit_ops (Vardi-Zhang/Newton geometric median); the broad
    # name-parity batch (ST_GeometricMedian rides it); the flagship and
    # the standing q12 seat ---
    "multimodal_mp3_regions",       # NEW: Huffman region structure
    "multimodal_mp3_lsf_scalefactors",  # NEW: LSF partition scheme
    "multimodal_jpeg_lossless",     # NEW: SOF3 Annex H round trip
    "multimodal_vp9_superframes",   # NEW: superframe index walk
    "multimodal_vp9_headers_full",  # NEW: complete uncompressed header
    "multimodal_mp3_scalefactors",  # shared part2 CTE refactor
    "multimodal_vp9_inter",         # intra_only parse path + encoder args
    "multimodal_vp9_probe",         # shares _parse_frame_header
    "embedding_lsh_ann",            # adaptive planes + budget + Arrow
    "embedding_cosine_near_dup",    # adaptive bucket law (also r4-stale)
    "ann_recall_at_k",              # lsh arm + floor sync (800 -> 1500)
    "spatial_dbscan",               # half-neighborhood pairs + codegen
    "local_outlier_factor",         # stats-trio seat (bounded-hold kin)
    "getis_ord_hotspots",           # stats-trio seat (shared point law)
    "spatial_range_join",           # _cell_block_join _explode_pairs
    "spatial_range_join_fallback",  # forced-shuffle door of the same
    "geo_range_join",               # WKT door of the same
    "spatial_knn_join",             # grid-join family seat
    "st_shape_edit_ops",            # geometric median + segmentize pins
    "st_name_parity_ops",           # broad name surface (GeometricMedian)
    "crop_analytics_full",          # flagship, standing seat
    "q12_late_priority",            # r2's one red row: stays visible
    # --- stalest tier-2 cohort (31): every r4-verified row left
    # (dedup_apply .. user_type_totals_tws), the r5 cohort minus three
    # rows whose family is already multiply seated (events_json_typed,
    # spatial_knn_join_grid/lambda, multimodal_frame_sample), and the
    # r6-era ST_ trio the r11 verdict named (st_dwithin_join,
    # st_line_clip, st_geojson_roundtrip). Every displaced row stays in
    # the committed full oracle run ---
    "dedup_apply",
    "embedding_pq_ann",
    "llm_pipeline_report",
    "sql_udf_chunk_plan",
    "user_type_totals_tws",
    "anomaly_zscore",
    "arrow_quant_stats",
    "bpe_merge_train",
    "bpe_tokenize_apply",
    "embedding_pq_rerank",
    "events_json_extract",
    "events_sliding_window",
    "exact_dedup",                  # dedup family seat (r8-stale)
    "hash_sample",
    "interval_range_join",
    "multimodal_features",
    "multimodal_resize",
    "training_mix",                 # text family seat (r8-stale)
    "profile_table",
    "q21_waiting_suppliers",
    "pyds_sensor_stream_totals",    # pydatasource family seat (r9-stale)
    "segment_dedup_rewrite",
    "stratified_sample",
    "streaming_contamination",
    "streaming_snapshot_publish",
    "st_dwithin_join",
    "st_line_clip",
    "st_geojson_roundtrip",
]

_R13_WINDOW = [
    # --- r13 blast radius (24): the six NEW queries (bounded near-dup
    # pair + SemDeDup representative edges, MP3 spectral lines + band
    # energy, VP9 compressed header, interleaved RGB lossless JPEG);
    # embedding_cluster_dedup rewired onto the rep edge stream; the LSH
    # family sharing the chunked Arrow cogroup scorer; every MP3 query
    # riding the refactored side-info/scalefactor writers and the
    # libmad mixed-block region default; the VP9 siblings sharing the
    # encoder's compressed_headers seam; the r12 lossless JPEG whose
    # SOF3/SOS gates were restructured for multi-component; the
    # shape-edit batch now routed through the chain rewriter's new
    # _FUSE rule plus the two chainrw consumers and the name-parity
    # surface that grew ST_SegmentizeNPoints; dedup_clusters as the
    # standing connected-components seat; the flagship and the
    # standing q12 seat ---
    "embedding_near_dup_topm",      # NEW: bounded per-doc top-m
    "embedding_rep_near_dup",       # NEW: linear representative edges
    "embedding_cluster_dedup",      # rewired to rep edge stream
    "embedding_cosine_near_dup",    # unbounded parity spelling
    "embedding_lsh_ann",            # chunked cogroup scorer
    "ann_recall_at_k",              # lsh arm seat
    "multimodal_mp3_spectrum",      # NEW: spectral Huffman lines
    "multimodal_mp3_band_energy",   # NEW: per-band energy rollup
    "multimodal_mp3_regions",       # libmad mixed-block default
    "multimodal_mp3_scalefactors",  # refactored per-gc writer
    "multimodal_mp3_lsf_scalefactors",  # shared encoder path
    "multimodal_mp3_granules",      # side_info_encode refactor
    "multimodal_vp9_compressed",    # NEW: bool-coded header
    "multimodal_vp9_headers_full",  # encoder compressed seam
    "multimodal_vp9_superframes",   # shared superframe_split
    "multimodal_jpeg_lossless_rgb", # NEW: interleaved lossless
    "multimodal_jpeg_lossless",     # SOF3/SOS gate restructure
    "st_shape_edit_ops",            # _FUSE + select_st routing
    "st_name_parity_ops",           # registry grew SegmentizeNPoints
    "crop_analytics_full_chain",    # chainrw _emit_call touched
    "crop_analytics_full",          # flagship, standing seat
    "q12_late_priority",            # r2's one red row: stays visible
    "dedup_clusters",               # connected_components seat
    "st_union_aggr_salted",         # chainrw sql_st door
    # --- stalest tier-2 cohort (26): every row last driver-verified in
    # r5 (the events/variant/knn-fallback/stream cohort) or r6 (the
    # crop roundtrips, events windows, geohash pair, relate/linear-ref
    # rows), computed as argmin over CORRECTNESS_r01..r12 green rows;
    # every displaced row stays in the committed full oracle run ---
    "events_json_typed",
    "events_variant_extract",
    "multimodal_frame_sample",
    "observed_load_metrics",
    "q22_dormant_customers",
    "running_distinct_users",
    "salted_join_revenue",
    "spatial_knn_join_grid",
    "spatial_knn_join_lambda",
    "stream_static_enrich",
    "asof_join",
    "crop_analytics_csv_roundtrip",
    "crop_analytics_jsonl_roundtrip",
    "crop_analytics_orc_roundtrip",
    "events_session_window",
    "events_windowed",
    "multimodal_y4m_decode",
    "q18_large_orders",
    "q3_shipping_priority",
    "scd2_history",
    "sessionize_events_stateful",
    "snapshot_diff",
    "st_geohash_agg",
    # one-seat-per-family floor (test_gate_window_covers_every_family):
    # the stalest text / sketches / pydatasource rows take the last
    # three seats (displacing three r6-verified spatial rows — the
    # family already holds many seats above)
    "repetition_scores",
    "bloom_pruned_orders",
    "pyds_sensor_hourly",
]

_WINDOW = _R13_WINDOW
# a duplicated name would silently dedupe in the dict rebuild below,
# shrinking the driver's tier-1 gate without any signal (ADVICE r6)
assert len(_WINDOW) == len(set(_WINDOW)), "duplicate name in gate window"
assert len(_WINDOW) == 50, "gate window must stay 50 seats"
QUERIES = {
    **{k: QUERIES[k] for k in _WINDOW},
    **{k: v for k, v in QUERIES.items() if k not in set(_WINDOW)},
}

ORACLES: dict[str, str] = {
    "crop_analytics": P.CROP_ANALYTICS_ORACLE,
    "crop_analytics_csv_roundtrip": P.CROP_ANALYTICS_ORACLE,
    "crop_analytics_jsonl_roundtrip": P.CROP_ANALYTICS_ORACLE,
    "st_area_rect": P.ST_AREA_RECT_ORACLE,
    "st_buffer_round": P.ST_BUFFER_ROUND_ORACLE,
    "st_binary_carrier_ops": P.ST_BINARY_CARRIER_OPS_ORACLE,
    "st_name_parity_ops": P.ST_NAME_PARITY_OPS_ORACLE,
    "st_union_aggr_salted": P.ST_UNION_AGGR_SALTED_ORACLE,
    "st_binary_predicates": P.ST_PREDICATES_ORACLE,
    "st_buffer_line_point": P.ST_BUFFER_LINE_POINT_ORACLE,
    "st_affine_ops": P.ST_AFFINE_OPS_ORACLE,
    "st_measure_ops": P.ST_MEASURE_OPS_ORACLE,
    "st_shape_edit_ops": P.ST_SHAPE_EDIT_OPS_ORACLE,
    "st_aggr_ops": P.ST_AGGR_OPS_ORACLE,
    "st_triangulate_ops": P.ST_TRIANGULATE_OPS_ORACLE,
    "st_concave_hull": P.ST_CONCAVE_HULL_ORACLE,
    "st_edit_line_ops": P.ST_EDIT_LINE_OPS_ORACLE,
    "st_misc_ops": P.ST_MISC_OPS_ORACLE,
    "st_subdivide_ops": P.ST_SUBDIVIDE_OPS_ORACLE,
    "recursive_supplier_tree": R.RECURSIVE_SUPPLIER_TREE_ORACLE,
    "streaming_cdc_apply": R.CDC_MERGE_ORACLE,  # drained state == batch MERGE
    "gap_fill_interpolate": EV.GAP_FILL_INTERPOLATE_ORACLE,
    "bpe_merge_train": TQ.BPE_MERGE_TRAIN_ORACLE,
    "fuzzy_token_join": TQ.FUZZY_TOKEN_JOIN_ORACLE,
    "cohort_retention": EV.COHORT_RETENTION_ORACLE,
    "anomaly_zscore": EV.ANOMALY_ZSCORE_ORACLE,
    "st_transform_roundtrip": P.ST_TRANSFORM_ROUNDTRIP_ORACLE,
    "st_transform_utm": P.ST_TRANSFORM_UTM_ORACLE,
    "crop_analytics_utm": P.CROP_ANALYTICS_UTM_ORACLE,
    "streaming_hll_distinct": EV.STREAMING_HLL_DISTINCT_ORACLE,
    "snapshot_diff": P.SNAPSHOT_DIFF_ORACLE,
    "segment_dedup_rewrite": DD.SEGMENT_DEDUP_REWRITE_ORACLE,
    "trajectory_similarity_pairs": SJ.TRAJECTORY_SIMILARITY_ORACLE,
    "lateral_topk_orders": R.LATERAL_TOPK_ORDERS_ORACLE,
    "unpivot_metrics": R.UNPIVOT_METRICS_ORACLE,
    "st_convex_hull": P.ST_CONVEX_HULL_ORACLE,
    "st_simplify": P.ST_SIMPLIFY_ORACLE,
    "hilbert_curve": LAY.HILBERT_CURVE_ORACLE,
    "doc_shard_manifest": TQ.DOC_SHARD_MANIFEST_ORACLE,
    "vocab_oov_rate": TQ.VOCAB_OOV_RATE_ORACLE,
    "crop_analytics_orc_roundtrip": P.CROP_ANALYTICS_ORACLE,
    "st_intersection_area": P.ST_INTERSECTION_AREA_ORACLE,
    "st_geometry_ops": P.ST_GEOMETRY_OPS_ORACLE,
    "st_point_line_ops": P.ST_POINT_LINE_OPS_ORACLE,
    "st_dwithin_join": SJ.ST_DWITHIN_JOIN_ORACLE,
    "st_line_clip": P.ST_LINE_CLIP_ORACLE,
    "st_wkb_roundtrip": P.ST_WKB_ROUNDTRIP_ORACLE,
    "st_predicates": P.ST_PREDICATES_ORACLE,
    "st_line_relate": P.ST_LINE_RELATE_ORACLE,
    "st_accessors": P.ST_ACCESSORS_ORACLE,
    "st_geojson_roundtrip": P.ST_GEOJSON_ROUNDTRIP_ORACLE,
    "st_geohash_agg": P.ST_GEOHASH_AGG_ORACLE,
    "st_geohash_decode": P.ST_GEOHASH_DECODE_ORACLE,
    "st_geomcollection_ops": P.ST_GEOMCOLLECTION_OPS_ORACLE,
    "st_geodesic_ops": P.ST_GEODESIC_OPS_ORACLE,
    "st_symdiff_ops": P.ST_SYMDIFF_OPS_ORACLE,
    "st_metadata_ops": P.ST_METADATA_OPS_ORACLE,
    "streaming_geofence": EV.STREAMING_GEOFENCE_ORACLE,
    "st_collect_dump": P.ST_COLLECT_DUMP_ORACLE,
    "st_relate_matrix": P.ST_RELATE_MATRIX_ORACLE,
    "st_linear_ref": P.ST_LINEAR_REF_ORACLE,
    "st_line_clip_lshape": P.ST_LINE_CLIP_LSHAPE_ORACLE,
    "st_relate_line": P.ST_RELATE_LINE_ORACLE,
    "st_intersects_join": SJ.ST_INTERSECTS_JOIN_ORACLE,
    "spatial_range_join": SJ.SPATIAL_RANGE_JOIN_ORACLE,
    "spatial_range_join_fallback": SJ.SPATIAL_RANGE_JOIN_ORACLE,
    "geo_range_join": SJ.GEO_RANGE_JOIN_ORACLE,
    "points_in_regions": SJ.POINTS_IN_REGIONS_ORACLE,
    "spatial_knn_join": SJ.KNN_JOIN_ORACLE,
    "spatial_knn_join_lambda": SJ.KNN_JOIN_ORACLE,
    "spatial_knn_join_grid": SJ.KNN_JOIN_ORACLE,  # fallback path, same answer
    "crop_analytics_skewed": P.CROP_ANALYTICS_SKEWED_ORACLE,
    "q1_pricing_summary": R.Q1_ORACLE,
    "q3_shipping_priority": R.Q3_ORACLE,
    "nation_revenue": R.NATION_REVENUE_ORACLE,
    "late_ship_orders": R.LATE_SHIP_ORACLE,
    "customers_without_orders": R.CUSTOMERS_WITHOUT_ORDERS_ORACLE,
    "distinct_agg": R.DISTINCT_AGG_ORACLE,
    "rollup_sales": R.ROLLUP_SALES_ORACLE,
    "cube_sales": R.CUBE_SALES_ORACLE,
    "grouping_sets": R.GROUPING_SETS_ORACLE,
    "pivot_order_status": R.PIVOT_ORACLE,
    "set_ops": R.SET_OPS_ORACLE,
    "filter_sort_limit": R.FILTER_SORT_LIMIT_ORACLE,
    "scalar_functions": R.SCALAR_FUNCTIONS_ORACLE,
    "top_customers_per_nation": R.TOP_CUSTOMERS_ORACLE,
    "part_window_stats": R.PART_WINDOW_STATS_ORACLE,
    "window_zoo": R.WINDOW_ZOO_ORACLE,
    "expectations_check": Q.EXPECTATIONS_ORACLE,
    "incremental_rollup": Q.INCREMENTAL_ROLLUP_ORACLE,
    "events_windowed": EV.EVENTS_WINDOWED_ORACLE,
    "sessionize_events": EV.SESSIONIZE_ORACLE,
    "events_json_extract": EV.EVENTS_JSON_ORACLE,
    "events_json_typed": EV.EVENTS_JSON_TYPED_ORACLE,
    "events_windowed_streaming": EV.EVENTS_WINDOWED_STREAMING_ORACLE,
    "sessionize_events_stateful": EV.SESSIONIZE_STREAMING_ORACLE,
    "streaming_dedup": EV.STREAMING_DEDUP_ORACLE,
    "asof_join": EV.ASOF_JOIN_ORACLE,
    "interval_range_join": EV.INTERVAL_RANGE_JOIN_ORACLE,
    "stream_stream_join": EV.STREAM_STREAM_JOIN_ORACLE,
    "events_sliding_window": EV.EVENTS_SLIDING_WINDOW_ORACLE,
    "events_session_window": EV.EVENTS_SESSION_WINDOW_ORACLE,
    "scd2_history": R.SCD2_HISTORY_ORACLE,
    "cdc_merge": R.CDC_MERGE_ORACLE,
    "q18_large_orders": R.Q18_ORACLE,
    "nation_trade_flows": R.NATION_TRADE_FLOWS_ORACLE,
    "q4_order_priority": R.Q4_ORACLE,
    "q17_small_quantity": R.Q17_ORACLE,
    "q2_min_cost_supplier": T.Q2_ORACLE,
    "q5_local_supplier_volume": T.Q5_ORACLE,
    "q6_forecast_revenue": T.Q6_ORACLE,
    "q8_market_share": T.Q8_ORACLE,
    "q9_product_profit": T.Q9_ORACLE,
    "q10_returned_items": T.Q10_ORACLE,
    "q11_important_parts": T.Q11_ORACLE,
    "q12_late_priority": T.Q12_ORACLE,
    "q13_customer_distribution": T.Q13_ORACLE,
    "q14_promo_revenue": T.Q14_ORACLE,
    "q15_top_supplier": T.Q15_ORACLE,
    "q16_parts_supplier_count": T.Q16_ORACLE,
    "q19_disjunctive_revenue": T.Q19_ORACLE,
    "q20_dominant_suppliers": T.Q20_ORACLE,
    "q21_waiting_suppliers": T.Q21_ORACLE,
    "q22_dormant_customers": T.Q22_ORACLE,
    "bm25_term_scores": TQ.BM25_ORACLE,
    "udtf_token_explode": TQ.UDTF_TOKEN_EXPLODE_ORACLE,
    "training_mix": TQ.TRAINING_MIX_ORACLE,
    "event_funnel": TQ.EVENT_FUNNEL_ORACLE,
    "repetition_scores": TQ.REPETITION_SCORES_ORACLE,
    "ngram_topk_corpus": TQ.NGRAM_TOPK_CORPUS_ORACLE,
    "pii_redact": TQ.PII_REDACT_ORACLE,
    "zorder_curve": LAY.ZORDER_CURVE_ORACLE,
    "text_stats": TQ.TEXT_STATS_ORACLE,
    "quality_scores": TQ.QUALITY_ORACLE,
    "lang_detect": TQ.LANG_DETECT_ORACLE,
    "exact_dedup": DD.EXACT_DEDUP_ORACLE,
    "minhash_lsh_candidates": DD.MINHASH_LSH_ORACLE,
    "simhash": DD.SIMHASH_ORACLE,
    "ngram_jaccard_pairs": DD.NGRAM_JACCARD_ORACLE,
    "ngram_jaccard_verified": DD.NGRAM_JACCARD_VERIFIED_ORACLE,
    "dedup_clusters": GR.DEDUP_CLUSTERS_ORACLE,
    "spatial_dbscan": DB.SPATIAL_DBSCAN_ORACLE,
    "getis_ord_hotspots": HS.GETIS_ORD_ORACLE,
    "local_outlier_factor": OL.LOCAL_OUTLIER_FACTOR_ORACLE,
    "st_from_text_ops": SX.ST_FROM_TEXT_OPS_ORACLE,
    "st_orientation_ops": SX.ST_ORIENTATION_OPS_ORACLE,
    "st_clearance_ops": SX.ST_CLEARANCE_OPS_ORACLE,
    "st_grid_ops": GQ.ST_GRID_OPS_ORACLE,
    "hex_density_rollup": GQ.HEX_DENSITY_ROLLUP_ORACLE,
    "st_srid_ops": SX.ST_SRID_OPS_ORACLE,
    "st_xml_ops": SX.ST_XML_OPS_ORACLE,
    "st_polygonize_ops": SX.ST_POLYGONIZE_OPS_ORACLE,
    "st_collect_ops": SX.ST_COLLECT_OPS_ORACLE,
    "streaming_hex_density": EV.STREAMING_HEX_DENSITY_ORACLE,
    "embedding_cluster_dedup": GR.EMBEDDING_CLUSTER_DEDUP_ORACLE,
    "token_packing": TQ.TOKEN_PACKING_ORACLE,
    "lm_bigram_score": RET.LM_BIGRAM_SCORE_ORACLE,
    "phrase_search": RET.PHRASE_SEARCH_ORACLE,
    "dup_ngram_spans": DD.DUP_NGRAM_SPANS_ORACLE,
    "pagerank_links": GR.PAGERANK_LINKS_ORACLE,
    "user_type_totals_tws": EV.USER_TYPE_TOTALS_TWS_ORACLE,
    "chunk_documents": RET.CHUNK_DOCUMENTS_ORACLE,
    "streaming_dedup_watermarked": EV.STREAMING_DEDUP_WATERMARKED_ORACLE,
    "events_variant_extract": EV.EVENTS_VARIANT_EXTRACT_ORACLE,
    "sql_udf_chunk_plan": RET.SQL_UDF_CHUNK_PLAN_ORACLE,
    "dedup_apply": GR.DEDUP_APPLY_ORACLE,
    "corpus_report": GR.CORPUS_REPORT_ORACLE,
    "llm_pipeline_report": RET.LLM_PIPELINE_REPORT_ORACLE,
    "observed_load_metrics": Q.OBSERVED_LOAD_METRICS_ORACLE,
    "triangle_count": GR.TRIANGLE_COUNT_ORACLE,
    "embedding_pq_rerank": SIM.PQ_RERANK_ORACLE,
    "arrow_quant_stats": SIM.ARROW_QUANT_STATS_ORACLE,
    "contamination_check": DD.CONTAMINATION_ORACLE,
    "streaming_contamination": DD.CONTAMINATION_ORACLE,  # drained stream == batch scan
    "embedding_topk_cosine": SIM.TOPK_COSINE_ORACLE,
    "embedding_lsh_ann": SIM.LSH_ANN_ORACLE,
    "embedding_cosine_near_dup": SIM.COSINE_NEAR_DUP_ORACLE,
    "embedding_near_dup_topm": SIM.NEAR_DUP_TOPM_ORACLE,
    "embedding_rep_near_dup": SIM.REP_NEAR_DUP_ORACLE,
    "embedding_ivf_ann": SIM.IVF_ANN_ORACLE,
    "ann_recall_at_k": SIM.ANN_RECALL_AT_K_ORACLE,
    "embedding_quantized_topk": SIM.QUANTIZED_TOPK_ORACLE,
    "embedding_pq_ann": SIM.PQ_ANN_ORACLE,
    "kmeans_quantized": SIM.KMEANS_QUANTIZED_ORACLE,
    "hll_distinct": SK.HLL_DISTINCT_ORACLE,
    "hash_sample": SK.HASH_SAMPLE_ORACLE,
    "stratified_sample": SK.STRATIFIED_SAMPLE_ORACLE,
    "histogram_quantile": SK.HISTOGRAM_QUANTILE_ORACLE,
    "salted_agg_topk": SK.SALTED_AGG_ORACLE,
    "salted_join_revenue": R.SALTED_JOIN_REVENUE_ORACLE,
    "running_distinct_users": R.RUNNING_DISTINCT_USERS_ORACLE,
    "bpe_tokenize_apply": TQ.BPE_TOKENIZE_APPLY_ORACLE,
    "cms_heavy_hitters": SK.CMS_HEAVY_HITTERS_ORACLE,
    "bloom_pruned_orders": SK.BLOOM_PRUNED_ORDERS_ORACLE,
    "reservoir_per_group": SK.RESERVOIR_ORACLE,
    "profile_table": SK.PROFILE_TABLE_ORACLE,
    "streaming_snapshot_publish": EV.STREAMING_SNAPSHOT_PUBLISH_ORACLE,
    "stream_static_enrich": EV.STREAM_STATIC_ENRICH_ORACLE,
    "multimodal_features": MM.MULTIMODAL_FEATURES_ORACLE,
    "multimodal_png_decode": MM.MULTIMODAL_PNG_DECODE_ORACLE,
    "multimodal_jpeg_decode": MM.MULTIMODAL_JPEG_DECODE_ORACLE,
    "multimodal_jpeg_progressive": MM.MULTIMODAL_JPEG_PROGRESSIVE_ORACLE,
    "multimodal_jpeg_lossless": MM.MULTIMODAL_JPEG_LOSSLESS_ORACLE,
    "multimodal_audio_features": MM.MULTIMODAL_AUDIO_FEATURES_ORACLE,
    "multimodal_mp3_probe": MM.MULTIMODAL_MP3_PROBE_ORACLE,
    "multimodal_vp9_probe": MM.MULTIMODAL_VP9_PROBE_ORACLE,
    "multimodal_mp3_granules": MM.MULTIMODAL_MP3_GRANULES_ORACLE,
    "multimodal_mp3_scalefactors":
        MM.MULTIMODAL_MP3_SCALEFACTORS_ORACLE,
    "multimodal_mp3_regions": MM.MULTIMODAL_MP3_REGIONS_ORACLE,
    "multimodal_mp3_spectrum": MM.MULTIMODAL_MP3_SPECTRUM_ORACLE,
    "multimodal_vp9_compressed": MM.MULTIMODAL_VP9_COMPRESSED_ORACLE,
    "multimodal_jpeg_lossless_rgb":
        MM.MULTIMODAL_JPEG_LOSSLESS_RGB_ORACLE,
    "multimodal_mp3_band_energy": MM.MULTIMODAL_MP3_BAND_ENERGY_ORACLE,
    "multimodal_mp3_lsf_scalefactors":
        MM.MULTIMODAL_MP3_LSF_SCALEFACTORS_ORACLE,
    "multimodal_vp9_inter": MM.MULTIMODAL_VP9_INTER_ORACLE,
    "multimodal_vp9_superframes": MM.MULTIMODAL_VP9_SUPERFRAMES_ORACLE,
    "multimodal_vp9_headers_full": MM.MULTIMODAL_VP9_HEADERS_FULL_ORACLE,
    "multimodal_wav_decode": MM.MULTIMODAL_WAV_DECODE_ORACLE,
    "multimodal_y4m_decode": MM.MULTIMODAL_Y4M_DECODE_ORACLE,
    "crop_analytics_full": P.CROP_ANALYTICS_FULL_ORACLE,
    "crop_analytics_full_chain": P.CROP_ANALYTICS_FULL_ORACLE,
    "multimodal_resize": MM.MULTIMODAL_RESIZE_ORACLE,
    "multimodal_frame_sample": MM.MULTIMODAL_FRAME_SAMPLE_ORACLE,
    "pyds_sensor_hourly": PDS.SENSOR_HOURLY_ORACLE,
    "pyds_sensor_stream_totals": PDS.SENSOR_STREAM_TOTALS_ORACLE,
    "pyds_jsonl_commit_roundtrip": P.CROP_ANALYTICS_ORACLE,
    "token_counts": TQ.TOKEN_COUNTS_ORACLE,
    # r4: crop_analytics_full (the registry's last rows-only row) now has a
    # full-chain quantized oracle — band decomposition + polyconic forward
    # replicated in SQL, both engines rounded to 0.01 m² (pipeline.py).
}

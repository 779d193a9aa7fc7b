"""Sketch / sampling / skew operators: cross-engine equality with the DuckDB
oracle (the determinism contract) plus semantic checks that the sketches
actually approximate what they claim."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import sketches as SK

from tests.conftest import SF_SMOKE

SF_MID = "/root/testdata/sf0.01"


def _cmp(spark_df, duck, oracle, key):
    s = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    o = duck.execute(oracle).df().sort_values(key).reset_index(drop=True)
    assert len(s) == len(o)
    for c in o.columns:
        assert (s[c] == o[c]).all(), c


def test_hll_matches_oracle(spark, duck):
    _cmp(SK.hll_distinct(spark, SF_SMOKE), duck, SK.HLL_DISTINCT_ORACLE, "priority")


def test_hll_accuracy_at_valid_cardinality():
    # the raw estimator is only meaningful for n >~ 2.5·m; sf0.01 has
    # ~1300 distinct customers per priority against m=256 buckets
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_MID}/orders.parquet'")
    df = con.execute(SK.HLL_DISTINCT_ORACLE).df()
    rel_err = (df["hll_estimate"] - df["exact_distinct"]).abs() / df["exact_distinct"]
    assert (rel_err < 0.25).all()


def test_hash_sample_matches_oracle_and_rate(spark, duck):
    _cmp(SK.hash_sample(spark, SF_SMOKE), duck, SK.HASH_SAMPLE_ORACLE, "l_returnflag")
    total = duck.execute("SELECT count(*) FROM lineitem").fetchone()[0]
    sampled = duck.execute(SK.HASH_SAMPLE_ORACLE).df()["sample_rows"].sum()
    # 5% nominal rate; md5 is uniform, so the realized rate is close
    assert 0.02 < sampled / total < 0.09


def test_stratified_sample_matches_oracle_and_rates(spark, duck):
    _cmp(SK.stratified_sample(spark, SF_SMOKE), duck,
         SK.STRATIFIED_SAMPLE_ORACLE, "priority")
    df = duck.execute(SK.STRATIFIED_SAMPLE_ORACLE).df().set_index("priority")
    nominal = {"1-URGENT": 0.5, "2-HIGH": 0.2, "3-MEDIUM": 0.05}
    for prio, rate in nominal.items():
        realized = df.loc[prio, "sampled"] / df.loc[prio, "population"]
        assert abs(realized - rate) < 0.12, (prio, realized)


def test_histogram_quantile_matches_oracle_and_exact(spark, duck):
    _cmp(SK.histogram_quantile(spark, SF_SMOKE), duck,
         SK.HISTOGRAM_QUANTILE_ORACLE, "quantile")
    # each estimate is within one bin width of the exact percentile
    est = duck.execute(SK.HISTOGRAM_QUANTILE_ORACLE).df().set_index("quantile")
    for q in (0.5, 0.95, 0.99):
        exact = duck.execute(
            f"SELECT quantile_cont(l_extendedprice, {q}) FROM lineitem"
        ).fetchone()[0]
        assert abs(est.loc[q, "estimate"] - exact) <= SK.HIST_W, q


def test_salted_agg_equals_unsalted_oracle(spark, duck):
    # the whole point of salting: bit-identical to the direct groupBy
    _cmp(SK.salted_agg_topk(spark, SF_SMOKE), duck, SK.SALTED_AGG_ORACLE, "l_suppkey")


def test_ann_recall_vs_exact_topk(spark):
    """Approximation QUALITY gate for the ANN variants: recall@5 of the
    LSH-bucketed and IVF searches against the exact brute-force top-5,
    over the shared query set. Bucketed search trades recall for never
    going all-pairs; this pins the trade at the fixture scale so a
    bucketing regression (e.g. a broken hash) fails loudly rather than
    silently returning garbage neighbors."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    exact = SIM.topk_cosine(spark, SF_SMOKE).toPandas()
    exact5 = {
        q: set(g.nlargest(5, "cos_sim")["neighbor_id"])
        for q, g in exact.groupby("query_id")
    }

    def recall(df, qcol, ncol):
        hits = tot = 0
        for q, g in df.groupby(qcol):
            want = exact5.get(q)
            if not want:
                continue
            hits += len(set(g[ncol]) & want)
            tot += len(want)
        return hits / tot if tot else 0.0

    lsh = SIM.lsh_ann(spark, SF_SMOKE).toPandas()
    ivf = SIM.ivf_ann(spark, SF_SMOKE).toPandas()
    pq = SIM.pq_ann(spark, SF_SMOKE).toPandas()
    r_lsh = recall(lsh, lsh.columns[0], lsh.columns[1])
    r_ivf = recall(ivf, ivf.columns[0], ivf.columns[1])
    r_pq = recall(pq, pq.columns[0], pq.columns[1])
    # the fixture embeddings are uniform-random (near-orthogonal) — the
    # WORST case for locality bucketing (no cluster structure to exploit);
    # multi-probe LSH measured ~0.12 here vs ~0.03 single-probe, PQ/ADC
    # with the init-only 16-entry codebook measured ~0.16. The gate
    # catches collapse back to random, not perfection — clustered real
    # corpora recall far higher
    # r11: 25-probe multi-probe (H1 + fixed H2 ring) measures 0.228
    # at sf0.1 and ~0.2 at the test sf; 0.15 leaves noise margin
    assert r_lsh >= 0.15, f"LSH recall@5 collapsed: {r_lsh:.3f}"
    assert r_ivf >= 0.15, f"IVF recall@5 collapsed: {r_ivf:.3f}"
    assert r_pq >= 0.10, f"PQ recall@5 collapsed: {r_pq:.3f}"


def test_pq_rerank_recall_dominates_pq(spark):
    """Re-ranking guarantee: exact re-scoring of the PQ candidate pool can
    only help — recall@5 of pq_rerank must be >= recall@5 of the raw PQ
    top-5, because a global top-5 vector recalled into the candidate set
    is necessarily top-5 by exact cosine within it."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    exact = SIM.topk_cosine(spark, SF_SMOKE).toPandas()
    exact5 = {
        q: set(g.nlargest(5, "cos_sim")["neighbor_id"])
        for q, g in exact.groupby("query_id")
    }

    def recall(df):
        hits = tot = 0
        for q, g in df.groupby("query_id"):
            want = exact5.get(q)
            if not want:
                continue
            hits += len(set(g["neighbor_id"].head(5)) & want)
            tot += len(want)
        return hits / tot if tot else 0.0

    r_pq = recall(SIM.pq_ann(spark, SF_SMOKE).toPandas())
    r_rr = recall(SIM.pq_rerank(spark, SF_SMOKE).toPandas())
    assert r_rr >= r_pq, (r_rr, r_pq)
    assert r_rr > 0.2, r_rr  # the over-fetch pool must lift recall meaningfully


def test_lsh_adaptive_plane_law_python_sql_parity(duck):
    """r12 (VERDICT r11 item 2): the adaptive plane ladder and the capped
    order-stable probe-mask list must be ONE law across engines — the
    Python spelling (lsh_planes_for / lsh_probe_masks) element-for-element
    equal to the SQL spelling the oracles embed, for every plane count and
    across the ladder's exact power-of-two boundaries."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    # ladder: SQL CASE vs Python loop at boundaries and interior points
    for n in (1, 100, 128, 129, 256, 500, 2000, 2048, 2049, 20000,
              10**6, 10**9):
        sql_p = duck.execute(
            f"SELECT {SIM.LSH_PLANES_SQL} FROM (SELECT {n} AS n)"
        ).fetchone()[0]
        assert sql_p == SIM.lsh_planes_for(n), n

    # probe masks: the oracle's fam/dedupe/cap/prepend pipeline vs Python
    for planes in range(SIM.LSH_MIN_PLANES, SIM.LSH_MAX_PLANES + 1):
        sql_masks = duck.execute(f"""
            SELECT {SIM._MASKS_SQL}
            FROM (SELECT {SIM._FAM_SQL} AS fam
                  FROM (SELECT {planes} AS planes) p)
        """).fetchone()[0]
        assert tuple(sql_masks) == (0,) + SIM.lsh_probe_masks(planes), planes


def test_lsh_ann_big_and_small_paths_agree(spark):
    """The Arrow cogroup scorer (corpus arm above the pair-count
    threshold) must produce EXACTLY the JVM HOF fold's rows — same
    bitwise cosines, same top-5 — since both spell the identical per-dim
    left fold. Forced by monkeypatching the threshold over the sf0.001
    fixture."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    big = SIM.lsh_ann(spark, SF_SMOKE)
    # small path is the default at this n; force the big path by dropping
    # the scorer-switch threshold (plane count is untouched)
    import unittest.mock as mock

    # r14: 50-row Arrow batches so bucket groups straddle batch
    # boundaries — the streamed scorer's tail-carry path must reunite
    # them (the ADVICE r13 fragmentation lesson)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "50")
        with mock.patch.object(SIM, "LSH_ARROW_MIN_N", 0):
            forced = SIM.lsh_ann(spark, SF_SMOKE)
        b = forced.toPandas().sort_values(
            ["query_id", "rank"]).reset_index(drop=True)
    finally:
        spark.conf.set(key, old)
    a = big.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a["query_id"].tolist() == b["query_id"].tolist()
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
    assert a["cos_sim"].tolist() == b["cos_sim"].tolist()  # bitwise


# ------------------------------------------- bounded near-dup (r13)

def test_near_dup_topm_output_contract(spark):
    """Every doc carries at most NEAR_DUP_TOPM neighbors with contiguous
    ranks starting at 1, every emitted pair clears the threshold, and
    every emitted (a, b) pair exists in the unbounded cosine_near_dup
    stream (the cap SELECTS from the unbounded answer, never invents)."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    topm = SIM.near_dup_topm(spark, SF_SMOKE).toPandas()
    assert (topm["cos_sim"] >= SIM.NEAR_DUP_THRESHOLD).all()
    for _, grp in topm.groupby("doc_id"):
        assert len(grp) <= SIM.NEAR_DUP_TOPM
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))
    unbounded = SIM.cosine_near_dup(spark, SF_SMOKE).toPandas()
    full = {(min(a, b), max(a, b))
            for a, b in zip(unbounded["doc_a"], unbounded["doc_b"])}
    for a, b in zip(topm["doc_id"], topm["neighbor_id"]):
        assert (min(a, b), max(a, b)) in full


def test_near_dup_topm_rank_order_is_cos_desc_id_asc(spark):
    """Within a doc, ranks follow (cos desc, neighbor asc) exactly."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    topm = SIM.near_dup_topm(spark, SF_SMOKE).toPandas()
    for _, grp in topm.groupby("doc_id"):
        got = grp.sort_values("rank")
        want = grp.sort_values(["cos_sim", "neighbor_id"],
                               ascending=[False, True])
        assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()


def test_rep_near_dup_linear_edge_contract(spark):
    """rep_near_dup emits at most ONE edge per member (doc_b unique),
    every edge's doc_a is its bucket's min vec_id, doc_a < doc_b always
    (the representative is the bucket minimum), and every edge clears
    the threshold. Edge count <= n by construction."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    edges = SIM.rep_near_dup(spark, SF_SMOKE).toPandas()
    assert edges["doc_b"].is_unique
    assert (edges["doc_a"] < edges["doc_b"]).all()
    assert (edges["cos_sim"] >= SIM.NEAR_DUP_THRESHOLD).all()
    n = SIM.emb_count(spark, SF_SMOKE)
    assert len(edges) <= n
    # representative law: doc_a is the min vec_id of the member's bucket
    planes = SIM.lsh_planes_for(n)
    emb = SIM._emb(spark, SF_SMOKE).select(
        "vec_id",
        SIM._bucket("embedding", planes).alias("bucket")).toPandas()
    bucket_of = dict(zip(emb["vec_id"], emb["bucket"]))
    rep_of = emb.groupby("bucket")["vec_id"].min().to_dict()
    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        assert a == rep_of[bucket_of[b]]


def test_cluster_dedup_consumes_rep_edges(spark):
    """embedding_cluster_dedup's clusters are exactly the connected
    components of the rep_near_dup edge stream: every edge's endpoints
    share a cluster_id, the cluster_id is the min member, singletons are
    their own canonical cluster, and every vector appears once."""
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import graph as GR
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    out = GR.embedding_cluster_dedup(spark, SF_SMOKE).toPandas()
    n = SIM.emb_count(spark, SF_SMOKE)
    assert len(out) == n and out["vec_id"].is_unique
    cl = dict(zip(out["vec_id"], out["cluster_id"]))
    edges = SIM.rep_near_dup(spark, SF_SMOKE).toPandas()
    for a, b in zip(edges["doc_a"], edges["doc_b"]):
        assert cl[a] == cl[b]
    # cluster_id = min member; canonical iff id == cluster_id
    import collections
    members = collections.defaultdict(list)
    for v, c in cl.items():
        members[c].append(v)
    for c, vs in members.items():
        assert c == min(vs)
    assert (out["is_canonical"] == (out["vec_id"] == out["cluster_id"])).all()


def test_near_dup_topm_big_and_small_paths_agree(spark):
    """The per-bucket Arrow top-m kernel (corpus arm above
    LSH_ARROW_MIN_N) must produce EXACTLY the JVM join+window path's
    rows — same bitwise cosines, same ranks — since both spell the
    identical per-dim left fold and the (cos desc, id asc) order."""
    import unittest.mock as mock

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    small = SIM.near_dup_topm(spark, SF_SMOKE).toPandas()
    # r14: tiny Arrow batches so bucket groups straddle batch boundaries
    # (exercises the streamed kernel's tail-carry path)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, "50")
        with mock.patch.object(SIM, "LSH_ARROW_MIN_N", 0):
            big = SIM.near_dup_topm(spark, SF_SMOKE).toPandas()
    finally:
        spark.conf.set(key, old)
    a = small.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    b = big.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert a["neighbor_id"].tolist() == b["neighbor_id"].tolist()
    assert a["rank"].tolist() == b["rank"].tolist()
    assert a["cos_sim"].tolist() == b["cos_sim"].tolist()  # bitwise


def test_ivf_streams_lists_without_grppandas(spark):
    """r14 (VERDICT r13 item 4): the in-list scorer streams cell-sorted
    partitions through mapInPandas — the per-group Arrow protocol
    (FlatMapGroupsInPandas) must be gone from the plan, and the scored
    pair set must be identical to a reference per-group recomputation."""
    import numpy as np

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators import similarity as SIM

    df = SIM.ivf_ann(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    assert "MapInPandas" in plan
    got = df.toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    # reference: exact top-5 within each vector's assigned list, computed
    # from the same deterministic assignment law (argmax of fold-ordered
    # cosines against the 16 lowest-id centroids)
    emb = SIM._emb(spark, SF_SMOKE).toPandas()
    V = np.array(emb["embedding"].tolist(), dtype=np.float64)
    ids = emb["vec_id"].to_numpy()
    order = np.argsort(ids)
    V, ids = V[order], ids[order]
    C = V[ids < SIM.IVF_NLIST]
    dots = np.zeros((len(V), len(C)))
    for i in range(V.shape[1]):
        dots = dots + np.multiply.outer(V[:, i], C[:, i])
    sims = dots / np.multiply.outer(np.sqrt((V * V).sum(1)),
                                    np.sqrt((C * C).sum(1)))
    lists = sims.argmax(axis=1)
    rows = []
    for q in np.flatnonzero(ids < SIM.N_QUERY_VECS):
        mates = np.flatnonzero(lists == lists[q])
        cand = [(float(np.dot(V[m], V[q])
                       / (np.linalg.norm(V[m]) * np.linalg.norm(V[q]))),
                 int(ids[m])) for m in mates if m != q]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for r, (c, n) in enumerate(cand[:SIM.IVF_TOPK], 1):
            rows.append((int(ids[q]), n, r))
    ref = sorted(rows)
    got_rows = sorted(zip(got["query_id"], got["neighbor_id"], got["rank"]))
    assert [(a, b, c) for a, b, c in got_rows] == ref

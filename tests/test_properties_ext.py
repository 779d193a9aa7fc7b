"""Property-based tests (Hypothesis) for the extension operators, checked
against independent in-test reference implementations — the same strategy the
kernel uses (SURVEY.md §5: property tests where closed forms run out)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.graph import connected_components
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.relational import merge_upsert

_SETTINGS = dict(
    max_examples=12,  # each example runs Spark jobs — keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@given(st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
    min_size=1, max_size=25,
))
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    want = _union_find_components(edges)
    # union-find roots are component minima after min-merging; CC labels are
    # min reachable node — compare via canonical (min-of-component) labels
    comp_min = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want_labels = {n: comp_min[r] for n, r in want.items()}
    assert got == want_labels


@given(
    st.dictionaries(st.integers(0, 20), st.floats(allow_nan=False, allow_infinity=False, width=32), max_size=10),
    st.lists(st.tuples(st.integers(0, 20),
                       st.floats(allow_nan=False, allow_infinity=False, width=32),
                       st.sampled_from(["upsert", "delete"])), max_size=10,
             unique_by=lambda c: c[0]),
)
@settings(**_SETTINGS)
def test_merge_upsert_matches_dict_semantics(spark, snap, changes):
    want = dict(snap)
    for k, v, op in changes:
        if op == "delete":
            want.pop(k, None)
        else:
            want[k] = v
    snap_df = spark.createDataFrame(
        list(snap.items()) or [(None, None)], "k int, v float"
    ).where("k is not null")
    ch_df = spark.createDataFrame(
        changes or [(None, None, None)], "k int, v float, op string"
    ).where("k is not null")
    got = {r["k"]: r["v"] for r in
           merge_upsert(snap_df, ch_df, "k", ["v"]).collect()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6 or got[k] == want[k]


@given(st.integers(0, 255), st.integers(0, 255))
@settings(max_examples=50, deadline=None)
def test_zorder_bit_roundtrip(x, y):
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.layout import Z_BITS

    # reference interleave + deinterleave in plain python
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    rx = sum(((z >> (2 * i)) & 1) << i for i in range(Z_BITS))
    ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(Z_BITS))
    assert (rx, ry) == (x % 256, y % 256)
    # and the SQL expression agrees with the python interleave
    import duckdb

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.sources.layout import zorder_sql
    got = duckdb.sql(
        f"SELECT {zorder_sql('x', 'y')} AS z FROM (SELECT {x % 256} AS x, {y % 256} AS y)"
    ).fetchone()[0]
    assert got == z


@given(
    st.integers(1, 24), st.integers(1, 24),  # width, height
    st.sampled_from([1, 3]),                 # channels (gray / RGB)
    st.integers(0, 4),                       # scanline filter type
    st.integers(0, 2**32 - 1),               # pixel seed
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(w, h, ch, ft, seed):
    """PNG codec property: encode→decode is the identity for every image
    shape (including 1-pixel edges), both color modes, and every filter
    type — no Spark involved, so the example budget can be generous."""
    import numpy as np

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.multimodal.binary import (
        png_decode,
        png_encode,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    d = png_decode(png_encode(img, filter_type=ft))
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert (np.asarray(d["pixels"]).reshape(shape) == img).all()


def test_lm_bigram_score_matches_python_replay(spark):
    """Property: on random small corpora, lm_bigram_score equals a direct
    Python computation of the identical integer-quantized recurrence."""
    import itertools
    import random

    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.retrieval import (
        LM_SCALE,
        lm_bigram_score_df,
    )

    rng = random.Random(11)
    for trial in range(3):
        words = ["a", "b", "c", "dd"][: 2 + trial]
        docs = [(i, " ".join(rng.choice(words)
                             for _ in range(rng.randint(2, 12))))
                for i in range(6)]
        sdf = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["doc_id"]: (r["n_bigrams"], r["sum_qprob"], r["min_qprob"])
               for r in lm_bigram_score_df(sdf).collect()}

        toks = {i: t.split(" ") for i, t in docs}
        bigrams = {i: list(itertools.pairwise(t)) for i, t in toks.items()}
        c2, c1 = {}, {}
        for bs in bigrams.values():
            for b in bs:
                c2[b] = c2.get(b, 0) + 1
                c1[b[0]] = c1.get(b[0], 0) + 1
        vocab = len({w for t in toks.values() for w in t})
        expected = {}
        for i, bs in bigrams.items():
            if not bs:
                continue
            qs = [(LM_SCALE * (c2[b] + 1)) // (c1[b[0]] + vocab) for b in bs]
            expected[i] = (len(qs), sum(qs), min(qs))
        assert got == expected, trial


def test_dup_ngram_spans_matches_python_replay(spark):
    """Property: on random corpora with injected shared runs, the span
    coverage equals a direct Python interval-union computation."""
    import random
    import unittest.mock as mock

    import geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup as DD
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.dedup import (
        DUP_SPAN_N,
        dup_ngram_spans,
    )

    rng = random.Random(7)
    shared = " ".join(f"s{i}" for i in range(rng.randint(DUP_SPAN_N, 14)))
    docs = []
    for i in range(8):
        n = rng.randint(0, 15)
        own = " ".join(f"w{i}_{j}" for j in range(n))
        parts = [p for p in ([own, shared] if i % 2 == 0 else [own]) if p]
        rng.shuffle(parts)
        docs.append((i, " ".join(parts) if parts else "lone"))
    sdf = spark.createDataFrame(docs, ["doc_id", "text"])
    with mock.patch.object(DD, "_docs", lambda spark, sf_dir: sdf):
        got = {r["doc_id"]: (r["n_tokens"], r["dup_ngrams"], r["covered_tokens"])
               for r in dup_ngram_spans(spark, "unused").collect()}

    toks = {i: t.split(" ") for i, t in docs}
    grams = {}
    for i, t in toks.items():
        for p in range(len(t) - DUP_SPAN_N + 1):
            g = tuple(t[p:p + DUP_SPAN_N])
            grams.setdefault(g, set()).add(i)
    expected = {}
    for i, t in toks.items():
        dup_pos = [p for p in range(len(t) - DUP_SPAN_N + 1)
                   if len(grams[tuple(t[p:p + DUP_SPAN_N])]) >= 2]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + DUP_SPAN_N))
        expected[i] = (len(t), len(dup_pos), len(covered))
    assert got == expected

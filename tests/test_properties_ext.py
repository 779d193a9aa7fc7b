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

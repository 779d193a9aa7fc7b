"""Dissolve (grouped geometric union) + the fused dissolve-clip-area operator.

Reproduces the reference's aggregation core — groupBy 4 keys (one of them a
geometry) + ST_Union_Aggr, then clip to the region polygon and take the area
(reference spark_job/process_geodata.py:110-113 and :120-139) — as Spark
grouped-map pandas UDFs over the pure-Python kernel.

Scale design (SURVEY.md §4.3): a grouped-map UDAF has no partial aggregation,
so one huge group (a region with millions of parcels) lands in one task. Union
is associative and commutative, so we run a *two-level salted union*:

    stage 1  groupBy(keys + salt)  -> partial union per salt bucket
             (disjoint-rect decomposition = mergeable state)
    stage 2  groupBy(keys)         -> union of the ≤ SALT partial states

Both stages are map-side-partitionable shuffles on the grouping keys; no
driver collect anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernel import geom as G

DEFAULT_SALT = 16

def _poly_rects(wkt: str) -> list[tuple[float, float, float, float]]:
    """Parse a WKT geometry whose polygons are axis-aligned rectangles into
    bounds tuples; raises GeomError on non-rectilinear input (general
    boolean union is the phase-2 kernel core)."""
    out = []
    for poly in G.parse_wkt(wkt):
        r = G.is_rectilinear_rect(poly)
        if r is None:
            raise G.GeomError("union: non-rectilinear input needs phase-2 kernel")
        out.append(r)
    return out

def union_aggr(df: DataFrame, group_cols: Sequence[str], geom_col: str,
               out_col: str = "geometry", salt: int = DEFAULT_SALT) -> DataFrame:
    """ST_Union_Aggr: per-group geometric union, geometry-valued output
    (canonical WKT). Two-level salted to keep skewed groups off one task."""
    keys = list(group_cols)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    ) + f", `{out_col}` string"

    def stage(col: str):
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            rects = [r for w in pdf[col] if w is not None for r in _poly_rects(w)]
            merged = G.union_rects_decompose(rects)
            head = pdf.iloc[[0]][keys].reset_index(drop=True)
            head[out_col] = [G.to_wkt(G.rects_to_geom(merged))]
            return head
        return run

    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)))
    partials = salted.groupBy(*keys, "__salt").applyInPandas(
        stage(geom_col), schema=out_schema
    )
    return partials.groupBy(*keys).applyInPandas(
        stage(out_col), schema=out_schema
    )

def dissolve_clip_area(df: DataFrame, group_cols: Sequence[str], geom_col: str,
                       clip_col: str, out_col: str = "area",
                       salt: int = DEFAULT_SALT) -> DataFrame:
    """Fused area(clip ∩ union(geoms)) per group — the engine's hot path for
    the reference's flagship computation (spark_job/process_geodata.py:110-139)
    with ONE Python-boundary crossing per stage instead of five UDF stages.

    Clip distributes over union, so each geometry is clipped to its group's
    clip polygon *before* the union; the clipped pieces then union via Klee's
    measure. clip_col must be constant within a group (it is a grouping key in
    the reference, :110-112).
    """
    keys = list(group_cols)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*keys).schema.fields
    )

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        clip_wkt = pdf[clip_col].iloc[0]
        pieces: list[tuple[float, float, float, float]] = []
        if clip_wkt is not None:
            clip_geom = G.parse_wkt(clip_wkt)
            crect = G.is_rectilinear_rect(clip_geom[0]) if len(clip_geom) == 1 else None
            for w in pdf[geom_col]:
                if w is None:
                    continue
                for rect in _poly_rects(w):
                    if crect is not None:
                        c = G.rect_clip(*rect, *crect)
                        if c is not None:
                            pieces.append(c)
                    else:
                        clipped = G.clip_convex(G.rects_to_geom([rect]), clip_geom[0][0])
                        for poly in clipped:
                            r = G.is_rectilinear_rect(poly)
                            if r is not None:
                                pieces.append(r)
        merged = G.union_rects_decompose(pieces)
        head = pdf.iloc[[0]][keys + [clip_col]].reset_index(drop=True)
        head["__pieces"] = [G.to_wkt(G.rects_to_geom(merged))]
        return head

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        rects = [r for w in pdf["__pieces"] for r in _poly_rects(w)]
        head = pdf.iloc[[0]][keys].reset_index(drop=True)
        head[out_col] = [G.union_area_rectilinear(rects)]
        return head

    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partials = salted.groupBy(*keys, "__salt").applyInPandas(
        partial, schema=f"{key_schema}, `{clip_col}` string, `__pieces` string"
    )
    return partials.groupBy(*keys).applyInPandas(
        final, schema=f"{key_schema}, `{out_col}` double"
    )

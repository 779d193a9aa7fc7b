"""The flagship crop-analytics pipeline — same logical plan as the reference's
Spark job (reference spark_job/process_geodata.py:98-144):

    land_use ⋈(broadcast) regions        [:101]
      → geometry hygiene (MakeValid/Buffer)  [:102-103]
      → groupBy(region, season, land_type, region_geom) + ST_Union_Aggr [:110-113]
      → clip to region, reproject, area      [:120-139]
      → project 4 columns                    [:144]

Two variants:
  crop_analytics()        planar, integer-exact — the DuckDB-oracle-checked
                          correctness query (cell-counting closed form).
  crop_analytics_full()   adds the reference's ε-buffer weld and the
                          EPSG:3857→5880 reprojection — full parity chain,
                          rows-only checked (no SQL closed form for the
                          polyconic projection; FIXTURES.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dissolve import dissolve_clip_area, union_aggr
from . import fixtures

def crop_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dissolve import rect_bounds

    lu = fixtures.land_use_areas(spark, sf_dir, wkt=False)
    regions = fixtures.geographic_regions(spark, sf_dir)
    # dimension-side projection pushdown: parse each region's WKT once on the
    # 50-row dim (before the broadcast) instead of once per joined fact row
    rx1, ry1, rx2, ry2 = rect_bounds("region_geometry")
    regions = regions.select(
        "id", "region_geometry",
        rx1.alias("__cb_x1"), ry1.alias("__cb_y1"),
        rx2.alias("__cb_x2"), ry2.alias("__cb_y2"),
    )
    # broadcast inner equi-join, dimension side hinted — exactly the
    # reference join (spark_job/process_geodata.py:101)
    joined = lu.join(F.broadcast(regions), lu["region_id"] == regions["id"], "inner")
    # geometry column added POST-join so the concat_ws inlines into the
    # dissolve's slow-path conditional — fast-path (bbox) rows never build it
    joined = joined.withColumn(
        "land_geometry",
        fixtures.rect_wkt("x1", "y1", "x2", "y2"),
    )
    out = dissolve_clip_area(
        joined,
        group_cols=["region_id", "season_id", "land_type_id"],
        geom_col="land_geometry",
        clip_col="region_geometry",
        out_col="area",
        clip_bounds=["__cb_x1", "__cb_y1", "__cb_x2", "__cb_y2"],
        # bbox covering columns ride next to the WKT (GeoParquet-style), so
        # the rect fast path never builds or parses a geometry string;
        # Catalyst prunes the WKT construction out of the fast branch
        geom_bounds=["x1", "y1", "x2", "y2"],
    )
    # grain matches the loader's unique index (region, season, land_type)
    # (reference ecs_loader/load_to_postgres.py:134-136); empty clips drop
    return out.filter(F.col("area") > 0).select(
        "region_id", "season_id", "land_type_id", F.col("area").cast("double").alias("area")
    )

def crop_analytics_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship plan under a hot key: region 0 holds ~50% of all
    parcels (fixtures.land_use_areas_skewed). The combiner decomposition in
    dissolve_clip_area (map-side partial union per partition, one shuffle
    of numeric partials) is exactly what makes this survive — a grouped-map
    dissolve would drag half the fact table into one task. Oracle-checked
    like crop_analytics; benched as the skew-proof entry."""
    from ..operators.dissolve import rect_bounds

    lu = fixtures.land_use_areas_skewed(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    rx1, ry1, rx2, ry2 = rect_bounds("region_geometry")
    regions = regions.select(
        "id", "region_geometry",
        rx1.alias("__cb_x1"), ry1.alias("__cb_y1"),
        rx2.alias("__cb_x2"), ry2.alias("__cb_y2"),
    )
    joined = lu.join(F.broadcast(regions), lu["region_id"] == regions["id"], "inner")
    joined = joined.withColumn(
        "land_geometry", fixtures.rect_wkt("x1", "y1", "x2", "y2"))
    out = dissolve_clip_area(
        joined,
        group_cols=["region_id", "season_id", "land_type_id"],
        geom_col="land_geometry",
        clip_col="region_geometry",
        out_col="area",
        clip_bounds=["__cb_x1", "__cb_y1", "__cb_x2", "__cb_y2"],
        geom_bounds=["x1", "y1", "x2", "y2"],
    )
    return out.filter(F.col("area") > 0).select(
        "region_id", "season_id", "land_type_id",
        F.col("area").cast("double").alias("area"),
    )

def crop_analytics_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-parity chain incl. ST_MakeValid / ST_Buffer(ε) / ST_Buffer(0) /
    ST_Transform — every F.expr below is a verbatim reference call-site shape
    (spark_job/process_geodata.py:102-139) resolved against our UDF registry."""
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    lu = fixtures.land_use_areas(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    joined = lu.join(F.broadcast(regions), lu["region_id"] == regions["id"], "inner")
    hygiened = (
        joined
        # reference :102 — weld slivers: Buffer(MakeValid(geom), 1e-7)
        .withColumn("geo_land_use_mod",
                    F.expr("ST_Buffer(ST_MakeValid(ST_GeomFromWKT(land_geometry)), 0.0)"))
        # reference :103 — regions get MakeValid only
        .withColumn("geo_region_mod",
                    F.expr("ST_MakeValid(ST_GeomFromWKT(region_geometry))"))
    )
    dissolved = union_aggr(
        hygiened,
        group_cols=["region_id", "season_id", "land_type_id", "geo_region_mod"],
        geom_col="geo_land_use_mod",
        out_col="geo_union",
    )
    # reference :120-139 — area = ST_Area(ST_Transform(ST_Buffer(
    #   ST_MakeValid(ST_Intersection(union, region)), 0), 3857, 5880))
    return dissolved.withColumn(
        "area",
        F.expr(
            "ST_Area(ST_Transform(ST_Buffer(ST_MakeValid("
            "ST_Intersection(geo_union, geo_region_mod)), 0.0), "
            "'EPSG:3857', 'EPSG:5880'))"
        ),
    ).select("region_id", "season_id", "land_type_id", "area")

def st_area_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-parcel ST_Area through the registered UDF (closed form: w·h)."""
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    lu = fixtures.land_use_areas(spark, sf_dir)
    return lu.select(
        "property_id",
        F.expr("ST_Area(ST_GeomFromWKT(land_geometry))").alias("area"),
    )

ST_AREA_RECT_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()}
SELECT property_id, CAST((x2 - x1) * (y2 - y1) AS DOUBLE) AS area
FROM land_use
"""

def st_intersection_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-parcel clipped area via the fused ST_ClippedArea UDF
    (closed form: overlap of two rectangles)."""
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    lu = fixtures.land_use_areas(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    joined = lu.join(F.broadcast(regions), lu["region_id"] == regions["id"], "inner")
    return joined.select(
        "property_id",
        F.expr("ST_ClippedArea(land_geometry, region_geometry)").alias("clipped_area"),
    )

ST_INTERSECTION_AREA_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT lu.property_id,
       CAST(greatest(0, least(lu.x2, r.gx2) - greatest(lu.x1, r.gx1))
          * greatest(0, least(lu.y2, r.gy2) - greatest(lu.y1, r.gy1)) AS DOUBLE)
           AS clipped_area
FROM land_use lu
JOIN regions r ON lu.region_id = r.id
"""

# ------------------------------------------------------------- oracle SQL

CROP_ANALYTICS_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()},
clipped AS (
    SELECT lu.region_id, lu.season_id, lu.land_type_id,
           greatest(lu.x1, r.gx1) AS cx1, least(lu.x2, r.gx2) AS cx2,
           greatest(lu.y1, r.gy1) AS cy1, least(lu.y2, r.gy2) AS cy2
    FROM land_use lu
    JOIN regions r ON lu.region_id = r.id
    WHERE least(lu.x2, r.gx2) > greatest(lu.x1, r.gx1)
      AND least(lu.y2, r.gy2) > greatest(lu.y1, r.gy1)
),
xcells AS (
    SELECT region_id, season_id, land_type_id, cy1, cy2,
           unnest(range(cx1, cx2)) AS cx
    FROM clipped
),
ycells AS (
    SELECT region_id, season_id, land_type_id, cx,
           unnest(range(cy1, cy2)) AS cy
    FROM xcells
),
cells AS (SELECT DISTINCT * FROM ycells)
SELECT region_id, season_id, land_type_id,
       CAST(count(*) AS DOUBLE) AS area
FROM cells
GROUP BY region_id, season_id, land_type_id
"""

CROP_ANALYTICS_SKEWED_ORACLE = f"""
WITH {fixtures.LAND_USE_SKEWED_CTE.strip()},
{fixtures.REGIONS_CTE.strip()},
clipped AS (
    SELECT lu.region_id, lu.season_id, lu.land_type_id,
           greatest(lu.x1, r.gx1) AS cx1, least(lu.x2, r.gx2) AS cx2,
           greatest(lu.y1, r.gy1) AS cy1, least(lu.y2, r.gy2) AS cy2
    FROM land_use lu
    JOIN regions r ON lu.region_id = r.id
    WHERE least(lu.x2, r.gx2) > greatest(lu.x1, r.gx1)
      AND least(lu.y2, r.gy2) > greatest(lu.y1, r.gy1)
),
xcells AS (
    SELECT region_id, season_id, land_type_id, cy1, cy2,
           unnest(range(cx1, cx2)) AS cx
    FROM clipped
),
ycells AS (
    SELECT region_id, season_id, land_type_id, cx,
           unnest(range(cy1, cy2)) AS cy
    FROM xcells
),
cells AS (SELECT DISTINCT * FROM ycells)
SELECT region_id, season_id, land_type_id,
       CAST(count(*) AS DOUBLE) AS area
FROM cells
GROUP BY region_id, season_id, land_type_id
"""

def st_geometry_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Contains / ST_Distance / ST_Difference-area through the registered
    UDF surface, per (parcel, region) pair — each has a rectangle closed form
    for the oracle."""
    from ..functions.spatial import register_spatial_functions

    register_spatial_functions(spark)
    lu = fixtures.land_use_areas(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    joined = lu.join(F.broadcast(regions), lu["region_id"] == regions["id"], "inner")
    return joined.select(
        "property_id",
        F.expr("ST_Contains(region_geometry, land_geometry)").alias("contained"),
        F.expr("ST_Distance(land_geometry, region_geometry)").alias("dist"),
        F.expr("ST_Area(ST_Difference(land_geometry, region_geometry))").alias("outside_area"),
    )

ST_GEOMETRY_OPS_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT lu.property_id,
       (r.gx1 <= lu.x1 AND lu.x2 <= r.gx2 AND
        r.gy1 <= lu.y1 AND lu.y2 <= r.gy2) AS contained,
       sqrt(greatest(r.gx1 - lu.x2, lu.x1 - r.gx2, 0) ^ 2
          + greatest(r.gy1 - lu.y2, lu.y1 - r.gy2, 0) ^ 2) AS dist,
       CAST((lu.x2 - lu.x1) * (lu.y2 - lu.y1)
          - greatest(0, least(lu.x2, r.gx2) - greatest(lu.x1, r.gx1))
          * greatest(0, least(lu.y2, r.gy2) - greatest(lu.y1, r.gy1))
          AS DOUBLE) AS outside_area
FROM land_use lu
JOIN regions r ON lu.region_id = r.id
"""

def crop_analytics_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship result pushed through the reference's CSV interchange
    boundary and read back positionally — S4 (sized headerless CSV sink,
    spark_job/process_geodata.py:146-160) and S5 (directory CSV read,
    ecs_loader/load_to_postgres.py:145-163,174-175) exercised inside the
    correctness gate: the round trip must preserve every value exactly
    (same oracle as crop_analytics). Ints survive CSV verbatim; the area
    column is integral in the fixture domain so double↔text is lossless."""
    import atexit
    import shutil
    import tempfile

    from ..sources.io import read_csv_sink, write_csv_sink

    out = crop_analytics(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="crop_csv_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    write_csv_sink(out, tmp)
    return read_csv_sink(
        spark, tmp,
        "region_id bigint, season_id bigint, land_type_id bigint, area double",
    )

def crop_analytics_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship result pushed through a JSON-lines interchange boundary
    and read back with an explicit schema — the non-parquet text-sink path
    exercised inside the correctness gate (same oracle as crop_analytics;
    ints survive JSON verbatim and the fixture's areas are integral, so
    double↔text is lossless)."""
    import atexit
    import shutil
    import tempfile

    from ..sources.io import read_jsonl_sink, write_jsonl_sink

    out = crop_analytics(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="crop_jsonl_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    write_jsonl_sink(out, tmp)
    return read_jsonl_sink(
        spark, tmp,
        "region_id bigint, season_id bigint, land_type_id bigint, area double",
    )

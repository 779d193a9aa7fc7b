"""True spatial range join (extension beyond the reference, which joins on a
foreign key and only then intersects — reference spark_job/process_geodata.py:101.
SURVEY.md §2.2 calls for the real thing: pairs whose *geometries* overlap).

Strategy = Sedona's partitioned spatial join re-expressed in DataFrame ops:
explode both sides to covering grid cells → equi-join on cell id (this is the
shuffle key, so the join is hash-partitioned, never a cross join) → exact
rectangle-overlap predicate → dropDuplicates on the pair key (a pair can meet
in several cells).

At 100 TB the grid size trades replication (small cells → more exploded rows)
against selectivity (big cells → more false candidates); GRID=16 matches the
fixture's 15-unit regions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import fixtures

GRID = 16

def _cells(df: DataFrame, x1: str, y1: str, x2: str, y2: str) -> DataFrame:
    """Explode rows to the grid cells their rect covers (coords are integers;
    x2/y2 exclusive, so the last covered cell is floor((x2-1)/G))."""
    return (
        df.withColumn(
            "cx",
            F.explode(F.sequence(F.floor(F.col(x1) / GRID),
                                 F.floor((F.col(x2) - 1) / GRID))),
        )
        .withColumn(
            "cy",
            F.explode(F.sequence(F.floor(F.col(y1) / GRID),
                                 F.floor((F.col(y2) - 1) / GRID))),
        )
    )

def spatial_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every region, how many land-use parcels *spatially* overlap it
    (strict interior overlap, not just FK membership)."""
    lu = fixtures.land_use_areas(spark, sf_dir)
    regions = fixtures.geographic_regions(spark, sf_dir)
    lu_cells = _cells(lu.select("property_id", "x1", "y1", "x2", "y2"),
                      "x1", "y1", "x2", "y2")
    rg_cells = _cells(regions.select("id", "gx1", "gy1", "gx2", "gy2"),
                      "gx1", "gy1", "gx2", "gy2")
    pairs = (
        lu_cells.join(rg_cells, ["cx", "cy"])
        .where(
            (F.col("x1") < F.col("gx2")) & (F.col("gx1") < F.col("x2"))
            & (F.col("y1") < F.col("gy2")) & (F.col("gy1") < F.col("y2"))
        )
        .select("id", "property_id")
        .dropDuplicates(["id", "property_id"])
    )
    return pairs.groupBy("id").agg(F.count("*").alias("n_overlapping"))

# count(DISTINCT ...) because property_id is not unique in the synthetic
# fixture (the driver's lineitem has duplicate (orderkey, linenumber) pairs)
SPATIAL_RANGE_JOIN_ORACLE = f"""
WITH {fixtures.LAND_USE_CTE.strip()},
{fixtures.REGIONS_CTE.strip()}
SELECT r.id, count(DISTINCT lu.property_id) AS n_overlapping
FROM regions r
JOIN land_use lu
  ON lu.x1 < r.gx2 AND r.gx1 < lu.x2
 AND lu.y1 < r.gy2 AND r.gy1 < lu.y2
GROUP BY r.id
"""

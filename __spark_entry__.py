"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship crop-analytics pipeline on sf0.001 (smoke check).
queries()    — every implemented operator from SURVEY.md §2 + extensions.
oracle_sql() — DuckDB-equivalent SQL per query (omitted only for the
               non-SQL-expressible polyconic-reprojection variant).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import pipeline
from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import (
    ORACLES,
    QUERIES,
)

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return pipeline.crop_analytics(spark, "/root/testdata/sf0.001")

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)

def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

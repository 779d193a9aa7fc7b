"""Pure-Python geometry kernel.

Replaces the JVM geometry engine the reference gets from Apache Sedona
(reference airflow_dag/dag_geo_pipeline.py:20 registers SedonaSqlExtensions;
spark_job/process_geodata.py:102-139 invokes ST_* via F.expr). Our engine keeps
the same function surface but executes it in vectorized Arrow pandas UDFs over
this kernel, so the relational plan above stays pure Catalyst.
"""

from .geom import (  # noqa: F401
    GeomError,
    area,
    bounds,
    clip_convex,
    make_valid,
    normalize,
    parse_wkt,
    rect_clip,
    to_wkt,
    union_area_rectilinear,
)
from .transform import mercator_to_polyconic  # noqa: F401

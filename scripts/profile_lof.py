"""LOF stage attribution (r10 verdict item 2): time each pass of
local_outlier_factor cumulatively at a given SF — the exploded frame,
+kdist, +lrd, and the full query — so the dominant pass is measured,
not guessed. localCheckpoint(eager=False) means each _stage run pays
its own upstream, so stage deltas are honest.

Usage: python scripts/profile_lof.py <sf_dir> [runs]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.operators.outlier import (
        local_outlier_factor,
    )
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.session import get_spark
    spark = get_spark("profile_lof")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32_000).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long").selectExpr("sum(id)").collect()
    best = {}
    for phase in ["warm"] + ["m"] * runs:
        for stage in ("ex", "kd", "lrd", None):
            label = stage or "full"
            t0 = time.perf_counter()
            local_outlier_factor(spark, sf_dir, _stage=stage) \
                .write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if phase == "m" and (label not in best or dt < best[label]):
                best[label] = dt
    prev = 0.0
    for label in ("ex", "kd", "lrd", "full"):
        print(f"{label}: cumulative {best[label]:.2f}s "
              f"delta {best[label] - prev:.2f}s")
        prev = best[label]


if __name__ == "__main__":
    main()

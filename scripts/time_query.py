"""Focused per-query timing probe: bench.py methodology (noop sink, warm
pass + min of 3) for a named subset. Usage:
    python scripts/time_query.py <sf_dir> <query> [query ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans.registry import QUERIES
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.session import get_spark
    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32_000).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long").selectExpr("sum(id)").collect()
    best = {}
    for phase in ("warm", "m", "m", "m"):
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            if phase == "m" and (n not in best or dt < best[n]):
                best[n] = dt
    for n, v in best.items():
        print(f"{n}: {v}")


if __name__ == "__main__":
    main()

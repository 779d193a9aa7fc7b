"""Per-column attribution probe for the scalar parity batches: time each
selectExpr column of a registry query alone (property_id + that column,
noop sink, warm + min of 2). Usage:
    python scripts/profile_batch.py <sf_dir> <query>
The query must be one of the pipeline land_use batches (re-built here from
its source expressions so columns can run one at a time).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir, name = sys.argv[1], sys.argv[2]
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.plans import registry
    from geospatial_data_pipeline_spark_sedona_on_aws_spark.session import get_spark
    spark = get_spark("profile_batch")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(32_000).repartition(spark.sparkContext.defaultParallelism) \
        .mapInPandas(lambda it: it, "id long").selectExpr("sum(id)").collect()
    df = registry.QUERIES[name](spark, sf_dir)
    cols = df.columns
    base = df
    for phase in ("warm", "m", "m"):
        for c in cols:
            if c == "property_id":
                continue
            t0 = time.perf_counter()
            base.select("property_id", c).write.format("noop") \
                .mode("overwrite").save()
            dt = time.perf_counter() - t0
            if phase != "warm":
                k = f"col:{c}"
                prev = results.get(k)
                if prev is None or dt < prev:
                    results[k] = dt
        if phase == "warm":
            results = {}
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{k}: {v:.3f}")


if __name__ == "__main__":
    results = {}
    main()

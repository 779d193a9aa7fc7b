"""CLI entry point — the engine's counterpart of the reference's two
process entry points run in order (`python process_geodata.py <env>`,
reference spark_job/process_geodata.py:182-187, then
`python load_to_postgres.py`, ecs_loader/load_to_postgres.py:293-304):
extract → spatial transform → CSV interchange sink → snapshot publish
(blue-green view swap + retention), as one synchronous refresh.

    python -m geospatial_data_pipeline_spark_sedona_on_aws_spark \
        [sf_dir] [--date YYYY-MM-DD] [--csv PATH]
"""

from __future__ import annotations

import argparse
import datetime
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001",
                    help="testdata scale-factor directory (parquet tables)")
    ap.add_argument("--date", default=datetime.date.today().isoformat(),
                    help="snapshot date (YYYY-MM-DD); versions the table")
    ap.add_argument("--csv", default=None,
                    help="optional CSV interchange sink path (the reference's "
                         "S3 handoff, spark_job/process_geodata.py:146-160)")
    args = ap.parse_args(argv)

    from .plans.catalog import run_pipeline
    from .session import get_spark

    spark = get_spark("refresh")
    spark.sparkContext.setLogLevel("WARN")
    name = run_pipeline(spark, args.sf_dir, args.date, csv_path=args.csv)
    n = spark.table(name).count()
    view = "vw_crop_analytics"
    print(f"published {name} ({n} rows); view {view} repointed")
    return 0


if __name__ == "__main__":
    sys.exit(main())

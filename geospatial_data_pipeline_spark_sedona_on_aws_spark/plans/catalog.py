"""Blue-green snapshot catalog: versioned tables + atomic view swap +
retention — the reference's publish machinery (SURVEY.md §2.1 S7-S9)
re-expressed on the Spark catalog.

Reference semantics reproduced:
  - snapshot table per run, named {table}_{YYYY_MM_DD}
    (ecs_loader/load_to_postgres.py:121-128);
  - grain uniqueness asserted on (region_id, season_id, land_type_id) —
    Spark has no unique indexes, so the loader's unique-index backstop
    (ecs_loader/load_to_postgres.py:134-136) becomes an explicit check;
  - consumers read the stable view vw_{table}, atomically repointed with
    CREATE OR REPLACE VIEW (ecs_loader/load_to_postgres.py:234-247);
  - retention drops the oldest snapshot only when ≥2 exist
    (ecs_loader/load_to_postgres.py:269-291).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_DATE_RE = re.compile(r"_(\d{4}_\d{2}_\d{2})$")

class GrainViolation(ValueError):
    pass

def snapshot_name(table: str, date: str) -> str:
    return f"{table}_{date.replace('-', '_')}"

def assert_unique_grain(df: DataFrame, keys: list[str]) -> None:
    """Engine-side stand-in for the reference's unique composite index."""
    dup = df.groupBy(*keys).count().filter("count > 1").limit(1).collect()
    if dup:
        raise GrainViolation(f"duplicate grain {keys}: {dup[0]}")

def _clear_orphaned_location(spark: SparkSession, name: str) -> None:
    """A killed session leaves the managed table's directory on disk while the
    (in-memory) catalog forgets the table; the next CREATE then fails with
    LOCATION_ALREADY_EXISTS. If the catalog does not know the table but its
    warehouse location exists, remove the orphan (scheme-agnostic Hadoop FS).

    Only safe for the default in-memory catalog, where "not in this session's
    catalog" implies "no live owner". With a shared metastore (hive) another
    session/database may legitimately own the location, so we refuse to touch
    the filesystem there and let CREATE surface the conflict instead."""
    if spark.conf.get("spark.sql.catalogImplementation", "in-memory") != "in-memory":
        return
    if spark.catalog.tableExists(name):
        return
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = spark._jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{name.lower()}")
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)

def publish_snapshot(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    date: str,
    grain: list[str] | None = None,
) -> str:
    """Write snapshot table → assert grain → atomically swap the view →
    retention. Returns the snapshot table name."""
    name = snapshot_name(table, date)
    if grain:
        assert_unique_grain(df, grain)
    _clear_orphaned_location(spark, name)
    df.write.mode("overwrite").saveAsTable(name)
    # overwriting an existing snapshot version (re-run of the same refresh)
    # must invalidate the cached file index, or readers of the view hit
    # FAILED_READ_FILE on the replaced part files; refresh both the table
    # and the view (view resolution caches the underlying relation)
    spark.catalog.refreshTable(name)
    spark.sql(f"CREATE OR REPLACE VIEW vw_{table} AS SELECT * FROM {name}")
    spark.catalog.refreshTable(f"vw_{table}")
    drop_old_snapshots(spark, table)
    return name

def list_snapshots(spark: SparkSession, table: str) -> list[str]:
    out = []
    for t in spark.catalog.listTables():
        if t.tableType == "VIEW":
            continue
        if t.name.startswith(table + "_") and _DATE_RE.search(t.name):
            out.append(t.name)
    return sorted(out)

def drop_old_snapshots(spark: SparkSession, table: str, keep: int = 1) -> list[str]:
    """Drop oldest snapshots while more than `keep` exist — the reference
    drops the min-dated table only when ≥2 exist
    (ecs_loader/load_to_postgres.py:285-288)."""
    snaps = list_snapshots(spark, table)
    dropped = []
    while len(snaps) > keep:
        oldest = snaps.pop(0)
        spark.sql(f"DROP TABLE IF EXISTS {oldest}")
        dropped.append(oldest)
    return dropped

def run_pipeline(spark: SparkSession, sf_dir: str, date: str,
                 csv_path: str | None = None) -> str:
    """End-to-end refresh = the reference's two entry points fused
    (SURVEY.md §3): flagship transform → CSV interchange sink (optional) →
    snapshot publish with grain check, view swap, retention."""
    from ..sources.io import write_csv_sink
    from .pipeline import crop_analytics

    result = crop_analytics(spark, sf_dir)
    if csv_path:
        write_csv_sink(result, csv_path)
    return publish_snapshot(
        spark, result, "crop_analytics", date,
        grain=["region_id", "season_id", "land_type_id"],
    )

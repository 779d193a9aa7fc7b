"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)

def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b or (pd.isna(a) and pd.isna(b))

def dtype_warnings(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Raw (pre-coercion) dtype differences between the engines. The driver's
    gate hashes values without the int-width coercion normalize() applies, so
    a Spark BIGINT vs DuckDB HUGEINT (r2's q12 red row) hash-mismatches at
    the driver while passing here. Surfaced as warnings, not failures: some
    width differences (e.g. int32 vs int64 keys) are hash-identical."""
    warns = []
    for c in sorted(set(sdf.columns) & set(odf.columns)):
        s_t, o_t = str(sdf[c].dtype), str(odf[c].dtype)
        if s_t != o_t:
            warns.append(f"{c}: spark={s_t} oracle={o_t}")
    return warns

def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns differ: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if len(sdf) != len(odf):
        problems.append(f"row count differs: spark={len(sdf)} oracle={len(odf)}")
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        n_bad = 0
        first = None
        for c in s.columns:
            neq = [
                i for i, (x, y) in enumerate(zip(s[c], o[c]))
                if not values_equal(x, y)
            ]
            if neq:
                n_bad += len(neq)
                if first is None:
                    i = neq[0]
                    first = f"col {c} row {i}: spark={s[c][i]!r} oracle={o[c][i]!r}"
        if n_bad:
            problems.append(f"{n_bad} value mismatches; first: {first}")
    return problems

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E

    # Deliberately a BARE session (not session.py's get_spark): the driver's
    # gate supplies its own SparkSession without our builder confs, so the
    # local replica must prove every query works on one too — round 1's
    # events-family failure (nanosAsLong only in the builder) was invisible
    # locally precisely because this script used get_spark().
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-gate-sim")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    passed = failed = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle (rows-only) — {len(sdf)} rows")
            skipped += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            failed += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            print(f"FAIL {name}: " + " | ".join(problems))
            failed += 1
        else:
            warns = dtype_warnings(sdf, odf)
            suffix = f"  [DTYPE {'; '.join(warns)}]" if warns else ""
            print(f"PASS {name} ({len(sdf)} rows){suffix}")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only")
    if failed:
        sys.exit(1)

if __name__ == "__main__":
    main()

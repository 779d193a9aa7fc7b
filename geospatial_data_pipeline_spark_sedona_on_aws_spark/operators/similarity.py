"""Similarity search over the `embeddings` table (array<float> column):
brute-force cosine top-k baseline + an LSH-bucketed ANN variant for the scale
path (north-star extension, BASELINE.json).

Determinism contract with the DuckDB oracle: dot products are computed as a
*sequential left fold* over the vector in both engines (Spark
F.aggregate(F.zip_with(...)), DuckDB list_reduce) — identical IEEE-754
operation order → bitwise-identical doubles, no tolerance needed.

Scale design: the brute-force path broadcasts the (small) query side and
keeps the candidate side partitioned — at 100 TB you'd cap the query batch
and let candidates stream. The LSH path buckets both sides first so the join
never goes all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOPK = 10
N_QUERY_VECS = 100  # brute-force path: the N lowest vec_ids are the queries
LSH_PLANES = 8      # axis-projection LSH: sign of dims 1, 9, 17, ... 57
LSH_TOPK = 5

def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )

def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))

def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))

def topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for each of the 100 lowest vec_ids,
    searched against the full table. Query side broadcast; ranking via
    row_number with a vec_id tie-break for determinism."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    pairs = (
        emb.alias("c")
        .join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )

_DOT_SQL = """list_reduce(
    list_prepend(0.0, list_transform(range(1, len({a}) + 1),
        i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)),
    (acc, x) -> acc + x)"""

def _cos_sql(a: str, b: str) -> str:
    return (f"({_DOT_SQL.format(a=a, b=b)} / "
            f"(sqrt({_DOT_SQL.format(a=a, b=a)}) * sqrt({_DOT_SQL.format(a=b, b=b)})))")

TOPK_COSINE_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qv
    FROM embeddings WHERE vec_id < {N_QUERY_VECS}
),
pairs AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_cos_sql('q.qv', 'c.embedding')} AS cos_sim
    FROM q JOIN embeddings c ON c.vec_id != q.query_id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim
FROM ranked WHERE rank <= {TOPK}
"""

def _bucket(v: Column) -> Column:
    """Axis-projection LSH bucket: bit p = (v[p*8 + 1] >= 0)."""
    out = None
    for p in range(LSH_PLANES):
        bit = F.when(F.element_at(v, p * 8 + 1) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("long")

def lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors: candidates restricted to the query's LSH
    bucket (2^8 buckets), then exact cosine within the bucket. This is the
    join shape that survives 100 TB: equi-join on bucket, never all-pairs."""
    from pyspark.sql import Window

    emb = _emb(spark, sf_dir).select(
        "vec_id", "embedding", _bucket(F.col("embedding")).alias("bucket")
    )
    a, b = emb.alias("a"), emb.alias("b")
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LSH_TOPK)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )

_BUCKET_SQL = " + ".join(
    f"CASE WHEN embedding[{p * 8 + 1}] >= 0 THEN {1 << p} ELSE 0 END"
    for p in range(LSH_PLANES)
)

LSH_ANN_ORACLE = f"""
WITH bucketed AS (
    SELECT vec_id, embedding, CAST({_BUCKET_SQL} AS BIGINT) AS bucket
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id != b.vec_id
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
    FROM pairs
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cos_sim
FROM ranked WHERE rank <= {LSH_TOPK}
"""

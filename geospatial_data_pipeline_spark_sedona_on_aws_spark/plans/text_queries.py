"""Text-analysis queries over `documents` (north-star extension): token
stats, fingerprinting, quality scoring, language-ID — every one expressed in
native Column functions (functions/text.py) with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")

def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TXT.n_tokens(t).alias("n_tokens"),
        TXT.n_unique_tokens(t).alias("n_unique_tokens"),
        TXT.type_token_ratio(t).alias("ttr"),
        TXT.avg_token_len(t).alias("avg_token_len"),
        TXT.stopword_count(t).alias("n_stopwords"),
        TXT.fingerprint(t).alias("fingerprint"),
    )

TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique_tokens,
       len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr,
       list_aggregate(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT)), 'sum')
           / len(string_split(text, ' ')) AS avg_token_len,
       CAST(len(list_filter(string_split(text, ' '),
           t -> list_contains({list(TXT.LANG_STOPWORDS['en'])}, t))) AS BIGINT) AS n_stopwords,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * 31 + c) % {TXT.FINGERPRINT_MOD}) AS fingerprint
FROM documents
"""

def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select("doc_id", TXT.quality_score(F.col("text")).alias("quality"))

_SW = list(TXT.LANG_STOPWORDS["en"])
QUALITY_ORACLE = f"""
WITH m AS (
    SELECT doc_id,
           len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) AS ttr,
           len(list_filter(string_split(text, ' '), t -> list_contains({_SW}, t)))
               / len(string_split(text, ' ')) AS swr,
           list_aggregate(list_transform(string_split(text, ' '), t -> CAST(length(t) AS BIGINT)), 'sum')
               / len(string_split(text, ' ')) AS atl
    FROM documents
)
SELECT doc_id,
       ttr * 0.4 + least(swr * 5.0, 1.0) * 0.3
           + (CASE WHEN atl >= 3.0 AND atl <= 8.0 THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
FROM m
"""

def lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TXT.detect_lang(F.col("text")).alias("detected_lang"),
    )

def _score_sql(code: str) -> str:
    ws = list(TXT.LANG_STOPWORDS[code])
    return f"len(list_filter(string_split(text, ' '), t -> list_contains({ws}, t)))"

# argmax with ties going to the alphabetically-first language — mirrors the
# strictly-greater fold in functions/text.py detect_lang (fold order de,en,es,fr)
LANG_DETECT_ORACLE = f"""
WITH s AS (
    SELECT doc_id, lang AS labeled_lang,
           {_score_sql('de')} AS s_de, {_score_sql('en')} AS s_en,
           {_score_sql('es')} AS s_es, {_score_sql('fr')} AS s_fr
    FROM documents
)
SELECT doc_id, labeled_lang,
       CASE WHEN s_de >= greatest(s_en, s_es, s_fr) THEN 'de'
            WHEN s_en >= greatest(s_es, s_fr) THEN 'en'
            WHEN s_es >= s_fr THEN 'es'
            ELSE 'fr' END AS detected_lang
FROM s
"""

# BPE-ish subword tokenization: letter runs, single digits, single
# punctuation marks — the GPT-2-style pre-tokenizer shape, expressible
# identically in Java regex (Spark) and RE2 (DuckDB)
BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish subword units
    (the pre-tokenizer count an LLM-data pipeline budgets by)."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        TXT.n_tokens(t).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_PATTERN), F.lit(0)))
            .cast("long").alias("bpe_tokens"),
    )

TOKEN_COUNTS_ORACLE = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}')) AS BIGINT) AS bpe_tokens
FROM documents
"""

"""Corpus-statistics retrieval queries over `documents`: an in-corpus bigram
language model for fluency scoring and a positional inverted index answering
phrase queries — the retrieval/quality layer of an LLM training-data
pipeline (companion to plans/text_queries.py's per-document scores).

Cross-engine exactness contract: every probability is quantized through
INTEGER arithmetic (`num div den` in Spark == `num // den` in DuckDB on
non-negative BIGINTs), so no libm log/exp and no float fold order can
diverge — the oracle hash-matches bit-for-bit.

Scale notes (100 TB):
- the bigram/prefix count tables are vocab-bounded (|V|² worst case, Zipf
  much smaller in practice); the plan joins on the bigram key and lets AQE
  convert to broadcast when the counts side is small — no hand-collected
  model, no driver bottleneck;
- the postings build is one projection+explode pass with the term filter
  applied BEFORE the shuffle, so only the queried terms' postings move;
- every per-document aggregate partitions by doc_id once and reuses that
  exchange for the final group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

from ..functions import text as TXT
from .text_queries import BPE_PATTERN as TXT_BPE_PATTERN

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row-group testdata yields ONE scan split; fan out before the
    # per-row text work so it parallelizes (no-op on multi-split tables)
    from ..sources.io import spread_scan

    return spread_scan(_rpc(spark, f"{sf_dir}/documents.parquet"))

# --------------------------------------------------------------- bigram LM

#: probability quantization scale: qprob = (SCALE * (c2+1)) div (c1 + |V|),
#: i.e. the add-one-smoothed bigram probability in units of 1e-9. BIGINT-safe:
#: SCALE * (c2+1) stays < 2^63 while the corpus has < ~9.2e9 bigram positions
#: per distinct bigram (beyond that, bump to DECIMAL(38,0) partials).
LM_SCALE = 1_000_000_000

def lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-corpus bigram-LM fluency scoring — the perplexity-style filter a
    training-data pipeline uses to rank documents by how "expected" their
    token stream is under a model of the corpus itself (CCNet-style, with
    the corpus as its own LM).

    Three relations, each one aggregation pass over the exploded bigram
    stream: bigram counts c2(w1,w2), prefix counts c1(w1), vocabulary size
    |V|. Each bigram position scores the add-one-smoothed probability
    (c2+1)/(c1+|V|), quantized to integers (LM_SCALE units) so Spark and
    DuckDB agree exactly — a log-space sum would hit libm last-ulp drift.
    Per document: bigram count, total and minimum quantized probability
    (min = the most surprising transition, the span a quality filter would
    flag).

    Plan: explode once, reuse for both count tables; join doc-bigrams to
    c2 on (w1,w2) and to c1 on w1 (AQE broadcasts the count sides when
    vocab-small); one final group-by doc_id.
    """
    return lm_bigram_score_df(_docs(spark, sf_dir))

def lm_bigram_score_df(d: DataFrame) -> DataFrame:
    """DataFrame-level core of lm_bigram_score (docs needs doc_id, text)."""
    toks = d.select("doc_id", TXT.tokens(F.col("text")).alias("t"))
    tcol = F.col("t")
    pairs = F.transform(
        F.slice(tcol, 1, F.greatest(F.size(tcol) - 1, F.lit(0))),
        lambda w, i: F.struct(
            w.alias("w1"),
            F.element_at(tcol, (i + F.lit(2)).cast("int")).alias("w2"),
        ),
    )
    big = toks.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))

    c2 = big.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = big.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").alias("vocab"))
    )

    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"({LM_SCALE} * (c2 + 1)) div (c1 + vocab)").alias("qprob"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum("qprob").alias("sum_qprob"),
        F.min("qprob").alias("min_qprob"),
    )

LM_BIGRAM_SCORE_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
big AS (
    SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
    FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t) - 1)) AS i
          FROM toks)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1),
v AS (
    SELECT count(DISTINCT w) AS vocab
    FROM (SELECT unnest(t) AS w FROM toks)
),
scored AS (
    SELECT b.doc_id,
           ({LM_SCALE} * (c2.c2 + 1)) // (c1.c1 + v.vocab) AS qprob
    FROM big b
    JOIN c2 USING (w1, w2)
    JOIN c1 USING (w1)
    CROSS JOIN v
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(qprob) AS BIGINT) AS sum_qprob,
       CAST(min(qprob) AS BIGINT) AS min_qprob
FROM scored
GROUP BY doc_id
"""

# --------------------------------------------------- positional phrase search

#: the fixed demo phrase; three tokens so the match needs TWO adjacency
#: joins, not one (the general n-term shape).
PHRASE = ("row", "column", "sort")

def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-inverted-index phrase search: build (term, doc_id, pos)
    postings for the query's terms only (filter pushed BEFORE the explode
    output shuffles — non-query terms never leave the scan stage), then
    chain adjacency self-joins posting[k].pos = posting[0].pos + k.

    Per matching document: match count and first match position — the
    retrieval shape behind "find documents containing this exact span"
    (e.g. benchmark-contamination span lookup with positions, where the
    shingle-hash contamination_check only gives membership).

    Scale: postings are keyed (doc_id, pos); each adjacency join shuffles
    on that compound key — never on the (hot) term key — so a frequent
    term cannot skew a partition. k-term phrases chain k-1 such joins and
    AQE broadcasts whichever side has the rarest term.
    """
    return phrase_search_df(_docs(spark, sf_dir), PHRASE)

def phrase_search_df(d: DataFrame, phrase: tuple[str, ...]) -> DataFrame:
    """DataFrame-level core of phrase_search for an arbitrary phrase."""
    toks = d.select(
        "doc_id", F.posexplode(TXT.tokens(F.col("text"))).alias("pos", "term")
    )
    # 1-based positions to match the SQL oracle's list indexing
    toks = toks.select("doc_id", (F.col("pos") + 1).alias("pos"), "term")

    posting0 = toks.filter(F.col("term") == phrase[0]).select("doc_id", "pos")
    matched = posting0
    for k, term in enumerate(phrase[1:], start=1):
        pk = (
            toks.filter(F.col("term") == term)
            .select("doc_id", (F.col("pos") - k).alias("pos"))
        )
        matched = matched.join(pk, ["doc_id", "pos"])

    return matched.groupBy("doc_id").agg(
        F.count("*").alias("n_matches"),
        F.min("pos").cast("long").alias("first_pos"),
    )

_PHRASE_JOINS = "\n    ".join(
    f"JOIN p{k} ON p{k}.doc_id = p0.doc_id AND p{k}.pos = p0.pos + {k}"
    for k in range(1, len(PHRASE))
)
_PHRASE_CTES = ",\n".join(
    f"p{k} AS (SELECT doc_id, i AS pos FROM toks WHERE t[i] = '{term}')"
    for k, term in enumerate(PHRASE)
)

PHRASE_SEARCH_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
{_PHRASE_CTES}
SELECT p0.doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p0.pos) AS BIGINT) AS first_pos
FROM p0
    {_PHRASE_JOINS}
GROUP BY p0.doc_id
"""

# ------------------------------------------------------------ doc chunking

#: chunk geometry: 64-token windows advancing by 48 (16-token overlap) —
#: the RAG/embedding-prep shape (overlap keeps context at boundaries).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48

def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the fan-out step before
    embedding in a retrieval pipeline: each document becomes
    ceil(max(n - overlap, 1) / stride) chunks of <= CHUNK_TOKENS tokens at
    CHUNK_STRIDE spacing, each carrying its position and a portable
    content hash (the chunk-level dedup / cache key).

    Entirely row-local (sequence + transform + explode inside one
    projection, whole-stage codegen): ZERO shuffles at any scale — the
    chunk stream inherits the scan's partitioning, which is exactly what
    the downstream embedding stage wants to consume.
    """
    d = _docs(spark, sf_dir)
    toks = TXT.tokens(F.col("text"))
    n = F.size(toks)
    # 1-based chunk start positions: 1, 1+stride, ... while start <= n - overlap
    # (equivalently: ceil(max(n - overlap, 1) / stride) chunks)
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    starts = F.sequence(
        F.lit(1),
        F.greatest(n - F.lit(overlap), F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    chunks = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("chunk_id"),
            s.cast("long").alias("start_pos"),
            F.least(F.lit(CHUNK_TOKENS), n - s + 1).cast("long")
                .alias("n_chunk_tokens"),
            TXT.portable_hash60(
                F.concat_ws(" ", F.slice(toks, s, F.lit(CHUNK_TOKENS)))
            ).alias("chunk_hash"),
        ),
    )
    return (
        d.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_id", "c.start_pos",
                "c.n_chunk_tokens", "c.chunk_hash")
    )

CHUNK_DOCUMENTS_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
starts AS (
    SELECT doc_id, t,
           unnest(generate_series(
               1, greatest(len(t) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS s,
           unnest(generate_series(
               0, (greatest(len(t) - {CHUNK_TOKENS - CHUNK_STRIDE}, 1) - 1)
                  // {CHUNK_STRIDE})) AS cid
    FROM toks
)
SELECT doc_id,
       CAST(cid AS BIGINT) AS chunk_id,
       CAST(s AS BIGINT) AS start_pos,
       CAST(least({CHUNK_TOKENS}, len(t) - s + 1) AS BIGINT) AS n_chunk_tokens,
       ('0x' || substr(md5(array_to_string(
            t[s : s + {CHUNK_TOKENS} - 1], ' ')), 1, 15))::BIGINT AS chunk_hash
FROM starts
"""

# ------------------------------------------------------- SQL-defined UDFs

def sql_udf_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk planning via Spark 4 SQL-DEFINED functions — the declarative
    UDF surface (CREATE FUNCTION ... RETURN <expr>) where the function body
    lives in the catalog and inlines into the calling plan (NO Python
    worker, unlike every other UDF shape the engine exercises):

    - a scalar SQL UDF (token_budget) computing the BPE-ish token count;
    - a table-valued SQL UDF (chunk_starts) generating the chunk-start
      positions, consumed in a LATERAL join.

    Because the bodies inline, the whole query stays in whole-stage
    codegen — the plan is identical to writing the expressions in place,
    which is exactly the point: SQL UDFs give reuse without a UDF tax.
    Per doc: chunk count, last chunk start, and the scalar budget.
    """
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY FUNCTION token_budget(t STRING)
        RETURNS BIGINT
        RETURN CAST(size(regexp_extract_all(t, '{TXT_BPE_PATTERN}', 0)) AS BIGINT)
    """)
    spark.sql(f"""
        CREATE OR REPLACE TEMPORARY FUNCTION chunk_starts(n BIGINT)
        RETURNS TABLE(start BIGINT)
        RETURN SELECT explode(sequence(
            CAST(1 AS BIGINT),
            greatest(n - {CHUNK_TOKENS - CHUNK_STRIDE}, CAST(1 AS BIGINT)),
            CAST({CHUNK_STRIDE} AS BIGINT))) AS start
    """)
    _docs(spark, sf_dir).createOrReplaceTempView("__sql_udf_docs")
    return spark.sql("""
        SELECT d.doc_id,
               count(*) AS n_chunks,
               max(c.start) AS last_start,
               any_value(token_budget(d.text)) AS bpe_tokens
        FROM __sql_udf_docs d,
             LATERAL chunk_starts(CAST(size(split(d.text, ' ')) AS BIGINT)) c
        GROUP BY d.doc_id
    """)

SQL_UDF_CHUNK_PLAN_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, text, len(string_split(text, ' ')) AS n FROM documents
),
starts AS (
    SELECT doc_id, text,
           unnest(generate_series(
               1, greatest(n - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS start
    FROM toks
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(max(start) AS BIGINT) AS last_start,
       CAST(len(regexp_extract_all(any_value(text), '{TXT_BPE_PATTERN}')) AS BIGINT)
           AS bpe_tokens
FROM starts
GROUP BY doc_id
"""

# ------------------------------------------------- end-to-end pipeline query

#: quality floor for the end-to-end report (same score as quality_scores)
PIPE_QUALITY_FLOOR = 0.5

def llm_pipeline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preparation pipeline as ONE dataflow — quality floor →
    exact dedup (first doc per content hash) → chunk planning → per-language
    accounting — the end-to-end shape a training-data run executes, here as
    a single oracle-checked query so the composition itself is under test,
    not just the stages.

    Plan: one projection computes quality + content hash + token count
    (all JVM-side); the dedup winner is a row_number window on the hash
    (ONE shuffle); chunk totals fold over the starts array WITHOUT
    exploding (F.aggregate — per-doc closed form, no row fan-out); the
    final per-language rollup is the second and last shuffle.
    """
    d = _docs(spark, sf_dir)
    toks = TXT.tokens(F.col("text"))
    base = d.select(
        "doc_id", "lang",
        TXT.quality_score(F.col("text")).alias("q"),
        F.md5("text").alias("h"),
        F.size(toks).alias("n"),
    ).where(F.col("q") >= PIPE_QUALITY_FLOOR)
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = base.withColumn("__rn", F.row_number().over(w)) \
               .where(F.col("__rn") == 1)
    overlap = CHUNK_TOKENS - CHUNK_STRIDE
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n") - overlap, F.lit(1)),
        F.lit(CHUNK_STRIDE))
    chunked = kept.select(
        "lang", "n",
        F.size(starts).cast("long").alias("n_chunks"),
        F.aggregate(
            starts, F.lit(0).cast("long"),
            lambda acc, s: acc + F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                (F.col("n") - s + 1).cast("long")),
        ).alias("chunk_tokens"),
    )
    return chunked.groupBy("lang").agg(
        F.count("*").alias("kept_docs"),
        F.sum("n").alias("kept_tokens"),
        F.sum("n_chunks").alias("chunks"),
        F.sum("chunk_tokens").alias("chunk_tokens"),
    )

_PIPE_SW = list(TXT.LANG_STOPWORDS["en"])

LLM_PIPELINE_REPORT_ORACLE = f"""
WITH scored AS (
    SELECT doc_id, lang, text, md5(text) AS h,
           len(string_split(text, ' ')) AS n,
           len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) * 0.4
           + least(len(list_filter(string_split(text, ' '),
                 t -> list_contains({_PIPE_SW}, t)))
                 / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3
           + (CASE WHEN list_aggregate(list_transform(string_split(text, ' '),
                       t -> CAST(length(t) AS BIGINT)), 'sum')
                       / len(string_split(text, ' ')) BETWEEN 3.0 AND 8.0
              THEN 1.0 ELSE 0.5 END) * 0.3 AS q
    FROM documents
),
kept AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM scored WHERE q >= {PIPE_QUALITY_FLOOR}
    ) WHERE rn = 1
),
chunked AS (
    SELECT lang, n,
           len(generate_series(1, greatest(n - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
               {CHUNK_STRIDE})) AS n_chunks,
           list_aggregate(list_transform(
               generate_series(1, greatest(n - {CHUNK_TOKENS - CHUNK_STRIDE}, 1),
                               {CHUNK_STRIDE}),
               s -> least({CHUNK_TOKENS}, n - s + 1)), 'sum') AS chunk_tokens
    FROM kept
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS kept_docs,
       CAST(sum(n) AS BIGINT) AS kept_tokens,
       CAST(sum(n_chunks) AS BIGINT) AS chunks,
       CAST(sum(chunk_tokens) AS BIGINT) AS chunk_tokens
FROM chunked
GROUP BY lang
"""

"""Text-analysis queries over `documents` (north-star extension): token
stats, fingerprinting, quality scoring, language-ID — every one expressed in
native Column functions (functions/text.py) with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import read_parquet_cached as _rpc
from pyspark.sql import functions as F

from ..functions import text as TXT

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-row-group testdata yields ONE scan split; fan out before the
    # per-row text work so it parallelizes (no-op on multi-split tables)
    from ..sources.io import spread_scan

    return spread_scan(_rpc(spark, f"{sf_dir}/documents.parquet"))

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

# ------------------------------------------------------------ BM25 scoring

BM25_TERMS = ("spark", "query", "table")
BM25_K1 = 1.2
BM25_B = 0.75

def bm25_term_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(document, term) BM25 relevance for a fixed query term set — the
    retrieval-quality scoring a training-data pipeline uses to mine
    domain-relevant documents.

    Kept per-term (no sum over terms) deliberately: every factor — tf, df,
    the Robertson idf ratio (N - df + 0.5)/(df + 0.5), the length
    normalization — is +,-,*,/ arithmetic, so Spark and DuckDB agree
    bit-for-bit. A cross-term sum would fold doubles in engine-dependent
    order; log()-based idf would hit libm last-ulp drift. (The idf ratio is
    the standard BM25 idf before the log — monotone in it, so rankings per
    term are identical.)

    Scale: one pass builds per-doc tf for all query terms at once (array
    filter sizes, no explode), one 3-row df aggregate joins back broadcast.
    """
    d = _docs(spark, sf_dir)
    toks = TXT.tokens(F.col("text"))
    base = d.select(
        "doc_id", toks.alias("__t"), F.size(toks).alias("dl")
    )
    avgdl = base.agg(
        (F.sum("dl") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf_cols = [
        F.size(F.filter(F.col("__t"), lambda t: t == F.lit(term))).alias(f"tf_{i}")
        for i, term in enumerate(BM25_TERMS)
    ]
    tfs = base.select("doc_id", "dl", *tf_cols)
    # document frequency per term: one tiny aggregate, broadcast back
    dfs = tfs.agg(*[
        F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
        for i in range(len(BM25_TERMS))
    ])
    joined = tfs.crossJoin(F.broadcast(dfs)).crossJoin(F.broadcast(avgdl))
    rows = []
    for i, term in enumerate(BM25_TERMS):
        tf = F.col(f"tf_{i}").cast("double")
        dfc = F.col(f"df_{i}").cast("double")
        n = F.col("n_docs").cast("double")
        idf = (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        denom = tf + F.lit(BM25_K1) * (
            F.lit(1.0) - F.lit(BM25_B)
            + F.lit(BM25_B) * F.col("dl").cast("double") / F.col("avgdl")
        )
        score = idf * (tf * F.lit(BM25_K1 + 1.0)) / denom
        rows.append(F.struct(
            F.lit(term).alias("term"),
            F.when(tf > 0, score).otherwise(F.lit(0.0)).alias("bm25"),
        ))
    return (
        joined.select("doc_id", F.explode(F.array(*rows)).alias("s"))
        .select("doc_id", F.col("s.term").alias("term"), F.col("s.bm25").alias("bm25"))
    )

def _bm25_sql_term(i: int, term: str) -> str:
    tf = f"CAST(len(list_filter(string_split(text, ' '), t -> t = '{term}')) AS DOUBLE)"
    return f"""
    SELECT doc_id, '{term}' AS term,
           CASE WHEN {tf} > 0 THEN
             ((n_docs - df_{i} + 0.5) / (df_{i} + 0.5))
             * ({tf} * {BM25_K1 + 1.0!r})
             / ({tf} + {BM25_K1!r} * (1.0 - {BM25_B!r} + {BM25_B!r}
                * CAST(len(string_split(text, ' ')) AS DOUBLE) / avgdl))
           ELSE 0.0 END AS bm25
    FROM documents, stats
    """

BM25_ORACLE = f"""
WITH stats AS (
    SELECT sum(len(string_split(text, ' '))) / count(*) AS avgdl,
           CAST(count(*) AS DOUBLE) AS n_docs,
           {", ".join(
               f"CAST(sum(CASE WHEN len(list_filter(string_split(text, ' '), "
               f"t -> t = '{term}')) > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
               for i, term in enumerate(BM25_TERMS)
           )}
    FROM documents
)
{" UNION ALL ".join(_bm25_sql_term(i, t) for i, t in enumerate(BM25_TERMS))}
"""

# ------------------------------------------------------------- Python UDTF

def udtf_token_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize via a Python UDTF (Spark 4 user-defined TABLE function) in a
    LATERAL join — the one UDF shape the engine had not yet exercised
    (scalar pandas UDFs: functions/spatial.py; grouped-map: dissolve;
    mapInPandas: multimodal). UDTFs run row-at-a-time in Python, so this is
    API-surface parity, NOT a hot path — the engine's native tokenizer
    (functions/text.py tokens()) is the production form; capped here to 50
    docs to keep the correctness gate cheap."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, tok: string")
    class TokenExplode:
        def eval(self, text: str):
            # text='' yields one (0, '') row — ''.split(' ') == [''] —
            # matching DuckDB string_split and the module's tokenization
            # law (empty text is one empty token, never zero rows, which
            # would also LATERAL-drop the document)
            if text is not None:
                for i, t in enumerate(text.split(" ")):
                    yield i, t

    spark.udtf.register("token_explode", TokenExplode)
    _docs(spark, sf_dir).where(F.col("doc_id") < 50) \
        .createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos AS pos, t.tok AS tok "
        "FROM __udtf_docs, LATERAL token_explode(text) t"
    )

UDTF_TOKEN_EXPLODE_ORACLE = """
SELECT doc_id, s.pos AS pos, s.tok AS tok
FROM (
    SELECT doc_id,
           unnest(list_transform(
               range(1, len(string_split(text, ' ')) + 1),
               i -> {'pos': CAST(i - 1 AS BIGINT),
                     'tok': string_split(text, ' ')[i]})) AS s
    FROM documents WHERE doc_id < 50
)
"""

# -------------------------------------------------- training-mix pipeline

MIX_QUALITY_MIN = 0.55
# per-language keep rates (permille) — the "data mixture" a training run
# dials in; shared literals with the oracle
MIX_PERMILLE = {"en": 800, "de": 500, "fr": 500, "es": 500}
MIX_DEFAULT_PERMILLE = 200

def training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition a training-data pipeline actually runs, as
    ONE Spark plan: exact-dedup (keep the min doc_id per content hash) →
    quality floor → per-language deterministic downsampling to the target
    mixture. Every stage is a primitive this engine already ships
    (exact_dedup, quality_scores, hash_sample) — this query is their
    end-to-end composition, oracle-checked as a whole.

    Plan shape: one window over md5(text) for the dedup (no self-join),
    row-local quality + sampling predicates (no shuffle after the window),
    so the whole mixture materializes in a single pass over documents.
    """
    d = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        d.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .withColumn("quality", TXT.quality_score(F.col("text")))
        .where(F.col("quality") >= MIX_QUALITY_MIN)
    )
    rate = F.lit(MIX_DEFAULT_PERMILLE)
    for lang, pm in MIX_PERMILLE.items():
        rate = F.when(F.col("lang") == lang, pm).otherwise(rate)
    sampled = kept.where(
        F.pmod(TXT.portable_hash60(F.col("doc_id").cast("string")), F.lit(1000)) < rate
    )
    return sampled.select("doc_id", "lang", "quality")

_MIX_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {pm}" for lang, pm in MIX_PERMILLE.items()
) + f" ELSE {MIX_DEFAULT_PERMILLE} END"

TRAINING_MIX_ORACLE = f"""
WITH dedup AS (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
),
q AS (
    SELECT doc_id, lang,
           len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' ')) * 0.4
           + least(len(list_filter(string_split(text, ' '), t -> list_contains({_SW}, t)))
                   / len(string_split(text, ' ')) * 5.0, 1.0) * 0.3
           + (CASE WHEN list_aggregate(list_transform(string_split(text, ' '),
                        t -> CAST(length(t) AS BIGINT)), 'sum')
                        / len(string_split(text, ' ')) BETWEEN 3.0 AND 8.0
               THEN 1.0 ELSE 0.5 END) * 0.3 AS quality
    FROM dedup WHERE rn = 1
)
SELECT doc_id, lang, quality
FROM q
WHERE quality >= {MIX_QUALITY_MIN}
  AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000
      < {_MIX_RATE_SQL}
"""

# --------------------------------------------------------- funnel analysis

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_MIN = 120

def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: per user, did a view happen, then a click
    after it, then a purchase after that (each within 2h of the previous
    step)? Returns per-step user counts — the product-analytics query every
    event pipeline serves.

    One bounded aggregation pass PER STEP (the r4 form collect_list'd every
    click/purchase timestamp into a single per-user array — a hot user with
    millions of events materialized them all in one aggregation buffer):
    step 1 is min(view ts) per user; step k joins the step-(k-1) frame back
    to the events co-partitioned on user_id and takes the conditional min —
    per-user state is one timestamp per step, O(1) regardless of event
    count, and every shuffle keys on user_id so the partitioning is reused.
    Funnel depth K costs K passes, never K× memory."""
    from ..streaming.events import _events

    ev = _events(spark, sf_dir)
    ev_us = ev.select(
        "user_id", "event_type", F.unix_micros(F.col("ts")).alias("t"))
    win_us = FUNNEL_WINDOW_MIN * 60 * 1_000_000

    frames = []
    prev = (
        ev_us.where(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id").agg(F.min("t").alias("t_prev"))
    )
    frames.append(prev)
    for typ in FUNNEL_STEPS[1:]:
        prev = (
            ev_us.where(F.col("event_type") == typ)
            .join(prev.select("user_id", "t_prev"), "user_id")
            .where((F.col("t") > F.col("t_prev"))
                   & (F.col("t") <= F.col("t_prev") + win_us))
            .groupBy("user_id").agg(F.min("t").alias("t_prev"))
        )
        frames.append(prev)
    counts = [
        frame.agg(F.count("*").alias(f"n_{typ}"))
        for typ, frame in zip(FUNNEL_STEPS, frames)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)  # 1-row scalar aggregates
    return out

EVENT_FUNNEL_ORACLE = f"""
WITH per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t1
    FROM events GROUP BY user_id
),
s2 AS (
    SELECT p.user_id, p.t1,
           min(CASE WHEN e.event_type = 'click' AND epoch_us(e.ts) > p.t1
                     AND epoch_us(e.ts) <= p.t1 + {FUNNEL_WINDOW_MIN * 60 * 1_000_000}
                THEN epoch_us(e.ts) END) AS t2
    FROM per_user p LEFT JOIN events e ON e.user_id = p.user_id
    GROUP BY p.user_id, p.t1
),
s3 AS (
    SELECT s.user_id, s.t1, s.t2,
           min(CASE WHEN e.event_type = 'purchase' AND epoch_us(e.ts) > s.t2
                     AND epoch_us(e.ts) <= s.t2 + {FUNNEL_WINDOW_MIN * 60 * 1_000_000}
                THEN epoch_us(e.ts) END) AS t3
    FROM s2 s LEFT JOIN events e ON e.user_id = s.user_id
    GROUP BY s.user_id, s.t1, s.t2
)
SELECT CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
FROM s3
"""

# ------------------------------------------- repetition (Gopher-style) rules

def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (the Gopher-rules family):
    fraction of all bigrams taken by the single most frequent bigram, and
    fraction of duplicate tokens. Catching boilerplate/spam by repetition is
    a standard LLM-corpus filter.

    Scale shape: bigrams explode ~n_tokens rows/doc, then reduce through TWO
    hash aggregates keyed by doc_id(+bigram) — both get map-side partial
    aggregation, and the second input is already one row per distinct
    (doc, bigram). No window over the exploded set, no self-join.
    """
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    bigrams = F.expr(BIGRAMS_SQL)
    per_bigram = (
        d.select("doc_id", toks.alias("tk"))
        .where(F.size(F.col("tk")) >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"),
                (F.size(F.col("tk")) - F.size(F.array_distinct(F.col("tk"))))
                .alias("n_dup_tokens"),
                F.size(F.col("tk")).alias("n_tokens"))
        .groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("cnt"),
             F.first("n_dup_tokens").alias("n_dup_tokens"),
             F.first("n_tokens").alias("n_tokens"))
    )
    return (
        per_bigram.groupBy("doc_id")
        .agg(
            (F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac"),
            (F.first("n_dup_tokens") / F.first("n_tokens"))
            .alias("dup_token_frac"),
        )
    )

REPETITION_SCORES_ORACLE = """
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    WHERE len(string_split(text, ' ')) >= 2
),
idx AS (
    SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM toks
),
bg AS (
    SELECT doc_id,
           tk[i] || ' ' || tk[i + 1] AS bigram,
           len(tk) - len(list_distinct(tk)) AS n_dup_tokens,
           len(tk) AS n_tokens
    FROM idx
),
per_bigram AS (
    SELECT doc_id, bigram, count(*) AS cnt,
           any_value(n_dup_tokens) AS n_dup_tokens,
           any_value(n_tokens) AS n_tokens
    FROM bg GROUP BY doc_id, bigram
)
SELECT doc_id,
       max(cnt) / sum(cnt) AS top_bigram_frac,
       any_value(n_dup_tokens) / any_value(n_tokens) AS dup_token_frac
FROM per_bigram GROUP BY doc_id
"""

# ----------------------------------------------- corpus-level top-k n-grams

NGRAM_TOPK = 50

def ngram_topk_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide bigram frequency top-k: the frequency table behind
    contamination screens and tokenizer diagnostics. ONE hash aggregate
    (map-side combined — the shuffle carries distinct bigrams per task, not
    the exploded stream) then a driver-side k-row limit; ties broken by the
    bigram itself so the result set is deterministic."""
    d = _docs(spark, sf_dir)
    bigrams = F.expr(BIGRAMS_SQL)
    return (
        d.select(F.split(F.col("text"), " ").alias("tk"))
        .where(F.size(F.col("tk")) >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(NGRAM_TOPK)
    )

NGRAM_TOPK_CORPUS_ORACLE = f"""
WITH toks AS (
    SELECT string_split(text, ' ') AS tk FROM documents
    WHERE len(string_split(text, ' ')) >= 2
),
idx AS (
    SELECT tk, unnest(range(1, len(tk))) AS i FROM toks
),
bg AS (
    SELECT tk[i] || ' ' || tk[i + 1] AS bigram FROM idx
)
SELECT bigram, count(*) AS n
FROM bg GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT {NGRAM_TOPK}
"""

# --------------------------------------------------------- PII redaction

# patterns restricted to syntax with IDENTICAL semantics in Java regex
# (Spark) and RE2 (DuckDB): literal classes, bounded repeats, \\d, \\b
PII_EMAIL = r"[a-z0-9.]+@[a-z0-9.]+\.[a-z]+"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{4}\b"

def redact_pii(text: F.Column) -> F.Column:
    """Email → IP → phone, in that order (emails may contain digit runs and
    dots that the later patterns would otherwise bite into)."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_IP, "<IP>")
    return F.regexp_replace(out, PII_PHONE, "<PHONE>")

def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII scrub (email/IP/phone) with per-class counts.

    The synthetic corpus contains no PII-shaped strings, so the query first
    APPENDS deterministic doc_id-derived contact lines — the redaction is
    then real work on every row and stays exactly reproducible in the
    oracle. All JVM-side (regexp_replace/regexp_count): codegen'd, no
    Python boundary, scales embarrassingly (row-local, zero shuffles)."""
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"),
        F.lit("@mail"), F.pmod(F.col("doc_id"), F.lit(10)), F.lit(".example"),
        F.lit(" ip 10.0."), F.pmod(F.col("doc_id"), F.lit(256)),
        F.lit("."), F.pmod(F.col("doc_id") * 7, F.lit(256)),
        F.lit(" tel 555-"), F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)), 4, "0"),
    )
    return d.select(
        "doc_id",
        redact_pii(aug).alias("redacted"),
        # cast to long: regexp_count is INT in Spark, len() is BIGINT in
        # DuckDB — keep both engines' dtypes identical for the driver hash
        F.regexp_count(aug, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(
            F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"), F.lit(PII_IP)
        ).cast("long").alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(aug, PII_EMAIL, "<EMAIL>"), PII_IP, "<IP>"),
            F.lit(PII_PHONE),
        ).cast("long").alias("n_phones"),
    )

_PII_AUG_SQL = (
    "text || ' contact user' || doc_id || '@mail' || (doc_id % 10) || '.example'"
    " || ' ip 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)"
    " || ' tel 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

PII_REDACT_ORACLE = rf"""
WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
SELECT doc_id,
       regexp_replace(
           regexp_replace(
               regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IP}', '<IP>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g') AS redacted,
       len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(
           regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'), '{PII_IP}'))
           AS n_ips,
       len(regexp_extract_all(
           regexp_replace(
               regexp_replace(t, '{PII_EMAIL}', '<EMAIL>', 'g'),
               '{PII_IP}', '<IP>', 'g'), '{PII_PHONE}')) AS n_phones
FROM aug
"""

# ---------------------------------------------------- sequence packing

PACK_CTX = 512  # context-window token budget per pack

def token_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-data assembly: documents are
    concatenated per language stream in doc_id order and split into
    PACK_CTX-token context windows; each document is assigned to the pack
    where its FIRST token lands (streaming concat packing — the standard
    high-throughput alternative to per-pack bin-packing, which needs no
    global optimization and is deterministic under re-runs).

    Output: (doc_id, lang, stream_offset, pack_id, pack_docs, pack_tokens)
    — per-doc placement plus per-pack occupancy so a loader can both slice
    windows and audit fill rates.

    Scale shape: ONE shuffle (window partition by lang); the running sum,
    pack assignment, and per-pack stats all reuse that partitioning.
    At 100 TB the lang streams are independent — skewed languages can be
    sub-salted by (lang, date-bucket) with offsets rebased per bucket,
    the standard sharded-packing layout."""
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy("doc_id") \
        .rowsBetween(Window.unboundedPreceding, -1)
    placed = d.select(
        "doc_id", "lang", TXT.n_tokens(F.col("text")).alias("n_tokens"),
    ).withColumn(
        "stream_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)),
    ).withColumn(
        "pack_id", (F.col("stream_offset") / F.lit(PACK_CTX)).cast("bigint"),
    )
    pw = Window.partitionBy("lang", "pack_id")
    return placed.select(
        "doc_id", "lang", "stream_offset", "pack_id",
        F.count("*").over(pw).alias("pack_docs"),
        F.sum("n_tokens").over(pw).alias("pack_tokens"),
    )

TOKEN_PACKING_ORACLE = f"""
WITH placed AS (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(coalesce(sum(len(string_split(text, ' '))) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS stream_offset
    FROM documents
)
SELECT doc_id, lang, stream_offset,
       stream_offset // {PACK_CTX} AS pack_id,
       CAST(count(*) OVER (PARTITION BY lang, stream_offset // {PACK_CTX})
            AS BIGINT) AS pack_docs,
       CAST(sum(n_tokens) OVER (PARTITION BY lang, stream_offset // {PACK_CTX})
            AS BIGINT) AS pack_tokens
FROM placed
"""

# ----------------------------------------------------- training-data export

N_SHARDS = 64
# Knuth multiplicative hash, overflow-safe for EVERY bigint doc_id: the
# pre-reduction keeps the product <= (1e9)·(2.65e9) ≈ 2.7e18 < 2^63. A raw
# doc_id * 2654435761 overflows at doc_id ≳ 3.5e9 — where Spark wraps but
# DuckDB (and ANSI mode) throw, i.e. silent engine divergence at corpus
# scale.
_SHARD_HASH = "((doc_id % 1000000007) * 2654435761) % 1000000007"

def doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export accounting: assign every document to one of
    N_SHARDS shards by a deterministic multiplicative hash (NOT the
    engine's hash(), so any engine — or the oracle — reproduces the
    assignment), then emit the per-shard manifest a dataloader consumes:
    doc count, token budget, byte size, doc_id range.

    Scale: one hash aggregate with map-side combine into 64 groups — the
    shuffle carries 64 rows per upstream partition regardless of corpus
    size. The same shard expression feeds repartitionByRange + write for
    the physical export (see tests), keeping manifest and shard files
    byte-consistent by construction."""
    d = _docs(spark, sf_dir)
    return (
        d.selectExpr(
            f"CAST({_SHARD_HASH} % {N_SHARDS} AS BIGINT) AS shard",
            "doc_id",
            "size(split(text, ' ')) AS n_tokens",
            "length(text) AS n_bytes",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_bytes").cast("bigint").alias("n_bytes"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )

DOC_SHARD_MANIFEST_ORACLE = f"""
SELECT CAST({_SHARD_HASH} % {N_SHARDS} AS BIGINT) AS shard,
       count(*) AS n_docs,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(sum(length(text)) AS BIGINT) AS n_bytes,
       min(doc_id) AS min_doc_id,
       max(doc_id) AS max_doc_id
FROM documents
GROUP BY 1
"""

# tokenizer-coverage vocab: fixed published list (a real pipeline ships its
# tokenizer's vocab the same way — as data, not engine state)
OOV_VOCAB = [
    "a", "agg", "batch", "column", "customer", "data", "fast", "filter",
    "hash", "join", "key", "line", "merge", "order", "part", "query",
    "row", "scan", "slow", "small", "spark", "table", "the", "value",
    "window",
]

def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary coverage: per-document out-of-vocabulary token
    count and rate against the fixed OOV_VOCAB list. Pure JVM-side array
    higher-order functions (split → filter → size); the vocab rides the
    plan as a literal array (at a real vocab size it would be a broadcast
    join against a vocab table instead — same shape, documented in
    SCALING.md)."""
    d = _docs(spark, sf_dir)
    vocab = ", ".join(f"'{w}'" for w in OOV_VOCAB)
    return d.selectExpr(
        "doc_id",
        "CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens",
        f"CAST(size(filter(split(text, ' '),"
        f" t -> NOT array_contains(array({vocab}), t))) AS BIGINT) AS n_oov",
    ).selectExpr(
        "doc_id", "n_tokens", "n_oov",
        "CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate",
    )

VOCAB_OOV_RATE_ORACLE = f"""
WITH m AS (
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
               t -> NOT list_contains({OOV_VOCAB}, t))) AS BIGINT) AS n_oov
    FROM documents
)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / n_tokens AS oov_rate
FROM m
"""

# -------------------------------------------------------------- mini BPE

BPE_ROUNDS = 4

# adjacent-bigram array over a token-array column named `tk` — the ONE
# n-gram-building expression shared by repetition_scores and
# ngram_topk_corpus (previously duplicated verbatim; a semantics fix must
# not be appliable to only one of them)
BIGRAMS_SQL = ("transform(sequence(1, size(tk) - 1),"
               " i -> concat(element_at(tk, i), ' ', element_at(tk, i + 1)))")


def _sql_str(text: str) -> str:
    """SQL single-quoted literal with quotes and backslashes escaped, so a
    corpus symbol containing ' or \\ cannot break (or inject into) the
    generated replace() expression."""
    return "'" + text.replace("\\", "\\\\").replace("'", "''") + "'"


def _check_symbol(sym: str) -> str:
    """Reject merge symbols containing the [ ] sentinel characters — they
    would corrupt the bracket state encoding silently in BOTH engines."""
    if "[" in sym or "]" in sym:
        raise ValueError(
            f"BPE symbol {sym!r} contains the [ ] sentinel characters; "
            "the bracket state encoding cannot represent it")
    return sym


def _bpe_pair_counts(states: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol pair counts over (word-state, freq) rows.
    state is the word's current segmentation with each symbol individually
    bracket-wrapped ('[k][e][y]') — adjacent pair occurrences then share NO
    characters, which is what makes replace()-based merge application
    exactly classic greedy-left BPE (a space-delimited encoding shares the
    boundary space between occurrences, so 'a a a a' under merge (a,a)
    would miss the second pair — caught by the overlap unit test)."""
    return (
        states.selectExpr(
            "freq",
            r"split(trim(BOTH '[]' FROM state), '\\]\\[') AS syms",
        )
        .selectExpr(
            "freq",
            "filter(transform(syms, (s, i) ->"
            " struct(s AS l, try_element_at(syms, i + 2) AS r)),"
            " p -> p.r IS NOT NULL) AS pairs",
        )
        .selectExpr("freq", "explode(pairs) AS p")
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )

def bpe_merge_train(spark: SparkSession, sf_dir: str,
                    rounds: int = BPE_ROUNDS) -> DataFrame:
    """Byte-pair-encoding merge training, the tokenizer-building primitive:
    start from character segmentations of the corpus vocabulary (word,
    freq), and for `rounds` rounds pick the most frequent adjacent symbol
    pair (ties: lexicographic on left then right — fully deterministic)
    and merge it everywhere via left-to-right non-overlapping replacement
    (exactly classic BPE's greedy-leftmost application; replace() has the
    same contract in Spark and DuckDB).

    Output: one row per learned merge (round, left, right, merged,
    pair_count) — what a tokenizer ships as its merges.txt.

    Scale: each round is ONE pair-count aggregate (map-side combined; the
    alphabet of live pairs is tiny compared to the corpus) plus a 1-row
    argmax collect to the driver — the same bounded iterative-driver shape
    as Lloyd's k-means (operators/similarity.py). The corpus-sized state
    (word segmentations) stays distributed; only the winning pair ever
    crosses to the driver."""
    d = _docs(spark, sf_dir)
    words = (
        d.selectExpr("explode(split(text, ' ')) AS w")
        .where("w != ''")
        .groupBy("w").agg(F.count("*").cast("bigint").alias("freq"))
        # initial state: characters, each bracket-wrapped: '[k][e][y]'
        .selectExpr(
            "freq",
            "concat('[', array_join(split(w, ''), ']['), ']') AS state",
        )
    )
    states = words
    out_rows = []
    for rnd in range(1, rounds + 1):
        tops = (
            _bpe_pair_counts(states)
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not tops:
            break  # corpus fully merged (every word a single symbol)
        top = tops[0]
        l, r, cnt = top["l"], top["r"], top["cnt"]
        out_rows.append((rnd, l, r, l + r, cnt))
        _check_symbol(l), _check_symbol(r)
        lit_pair = _sql_str(f"[{l}][{r}]")
        lit_merged = _sql_str(f"[{l}{r}]")
        states = states.selectExpr(
            "freq",
            f"replace(state, {lit_pair}, {lit_merged}) AS state",
        )
    return spark.createDataFrame(
        out_rows, "round int, left string, right string,"
                  " merged string, pair_count bigint")

def _bpe_oracle(rounds: int = BPE_ROUNDS) -> str:
    """The identical training loop unrolled as chained CTEs: per round a
    pair-count aggregate, a 1-row argmax with the same tie-break, and the
    same sentinel-delimited replace applied to every word state."""
    sql = ["""
states0 AS (
    SELECT count(*) AS freq,
           '[' || array_to_string(string_split(w, ''), '][') || ']' AS state
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w != ''
    GROUP BY w
)"""]
    # the unnest(range(1, 200)) index spine bounds word length at 200
    # symbols — far above any whitespace-delimited corpus token; the Spark
    # side carries no such cap (transform() walks the real array)
    for i in range(1, rounds + 1):
        p = i - 1
        sql.append(f"""
pairs{i} AS (
    SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
    FROM (SELECT freq, string_split(trim(state, '[]'), '][') AS syms
          FROM states{p}),
         (SELECT unnest(range(1, 200)) AS i)
    WHERE i < len(syms)
    GROUP BY 1, 2
),
top{i} AS (
    SELECT {i} AS round, l, r, l || r AS merged, cnt
    FROM pairs{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
),
states{i} AS (
    SELECT s.freq,
           replace(s.state, '[' || t.l || '][' || t.r || ']',
                   '[' || t.l || t.r || ']') AS state
    FROM states{p} s, top{i} t
)""")
    tops = " UNION ALL ".join(
        f"SELECT round, l AS \"left\", r AS \"right\", merged, cnt AS pair_count FROM top{i}"
        for i in range(1, rounds + 1))
    return "WITH " + ",".join(sql) + "\n" + tops


def _bpe_oracle_parts(rounds: int = BPE_ROUNDS) -> tuple[str, str]:
    """(with_block, final_select) of the training oracle, so consumers
    (e.g. _bpe_apply_oracle) can extend the WITH block without re-parsing
    the concatenated SQL string."""
    whole = _bpe_oracle(rounds)
    cut = whole.rindex("\nSELECT round,")
    return whole[:cut], whole[cut + 1:]

BPE_MERGE_TRAIN_ORACLE = _bpe_oracle()

# ------------------------------------------------------ fuzzy token join

def fuzzy_token_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy self-join: corpus vocabulary tokens within
    edit distance 2, found WITHOUT an all-pairs comparison. Blocking is
    SOUND for (ed <= 2, |len diff| <= 2) by the classical q-gram count
    lemma — ed(x,y) <= k implies the pair shares at least
    max(|x|,|y|) - 1 - 2k bigrams — so:

      * every token emits its distinct character bigrams as block keys
        (for max-len >= 6 the lemma guarantees >= 1 shared bigram);
      * tokens of length <= 5 additionally emit a single short-token
        block 'S' (pairs where both sides are short may share no bigram:
        'abc' vs 'aXbYc' is ed 2 with disjoint bigrams).

    Candidates meeting in several blocks are deduped AFTER the cheap
    length filter and the levenshtein check (distinct on the pair).

    Scale: bigram blocks are vocabulary-per-bigram sized; the 'S' block
    is the short-token vocabulary — both bounded and independent of
    corpus row count. The oracle states the same join declaratively
    (DuckDB may nested-loop a 31-token vocab; we must not at a 10M-token
    one)."""
    d = _docs(spark, sf_dir)
    toks = (
        d.selectExpr("explode(split(text, ' ')) AS w")
        .where("w != ''").distinct()
    )
    keyed = toks.selectExpr(
        "w",
        "array_distinct(concat("
        "  CASE WHEN length(w) <= 5 THEN array('S') ELSE array() END,"
        "  filter(transform(split(w, ''),"
        "         (c, i) -> substring(w, i + 1, 2)),"
        "         g -> length(g) = 2))) AS keys",
    ).selectExpr("w", "explode(keys) AS blk")
    a = keyed.selectExpr("w AS a", "blk")
    b = keyed.selectExpr("w AS b", "blk")
    return (
        a.join(b, "blk")
        .where("a < b AND abs(length(a) - length(b)) <= 2"
               " AND levenshtein(a, b) <= 2")
        .selectExpr("a", "b", "CAST(levenshtein(a, b) AS BIGINT) AS dist")
        .distinct()
    )

FUZZY_TOKEN_JOIN_ORACLE = """
WITH toks AS (
    SELECT DISTINCT w
    FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    WHERE w != ''
)
SELECT t1.w AS a, t2.w AS b,
       CAST(levenshtein(t1.w, t2.w) AS BIGINT) AS dist
FROM toks t1
JOIN toks t2
  ON abs(length(t1.w) - length(t2.w)) <= 2
 AND t1.w < t2.w
WHERE levenshtein(t1.w, t2.w) <= 2
"""

def bpe_tokenize_apply(spark: SparkSession, sf_dir: str,
                       rounds: int = BPE_ROUNDS) -> DataFrame:
    """Apply the BPE merges learned by bpe_merge_train to tokenize the
    corpus: per document, every word is bracket-encoded, the learned
    merges replace in training order, and the document's subword-token
    count is the sum of surviving segments. Output per doc: character
    count (pre-BPE token count), post-merge subword count, and the
    saving. Closes the tokenizer loop — train on the corpus, tokenize the
    corpus — with the merges entering the plan as literals exactly like a
    shipped merges.txt.

    Scale: application is row-local string replacement (no shuffle but
    the final per-doc aggregate); training cost is the bounded iterative
    loop documented on bpe_merge_train."""
    merges = [(r["left"], r["right"])
              for r in bpe_merge_train(spark, sf_dir, rounds).collect()]
    d = _docs(spark, sf_dir)
    enc = ("transform(filter(split(text, ' '), w -> w != ''),"
           " w -> concat('[', array_join(split(w, ''), ']['), ']'))")
    applied = enc
    for l, r in merges:
        _check_symbol(l), _check_symbol(r)
        lit_pair = _sql_str(f"[{l}][{r}]")
        lit_merged = _sql_str(f"[{l}{r}]")
        applied = (f"transform({applied},"
                   f" s -> replace(s, {lit_pair}, {lit_merged}))")
    return d.selectExpr(
        "doc_id",
        f"aggregate(transform({enc}, s -> size(split(s, '\\\\]\\\\['))),"
        " 0L, (a, b) -> a + CAST(b AS BIGINT)) AS n_char_tokens",
        f"aggregate(transform({applied}, s -> size(split(s, '\\\\]\\\\['))),"
        " 0L, (a, b) -> a + CAST(b AS BIGINT)) AS n_bpe_tokens",
    ).selectExpr(
        "doc_id", "n_char_tokens", "n_bpe_tokens",
        "n_char_tokens - n_bpe_tokens AS tokens_saved",
    )

def _bpe_apply_oracle(rounds: int = BPE_ROUNDS) -> str:
    """Training CTEs (shared generator) + per-word application chain.

    Two edge guards (r5 review): (1) the chain cross-joins every top{i}
    CTE, so a corpus that exhausts its merges before `rounds` would
    silently collapse the oracle to zero rows while the Spark side breaks
    early and returns real counts — the merge_guard error()s loudly
    instead; (2) documents whose text contains no non-empty word have no
    docwords rows but the Spark side emits (doc_id, 0, 0, 0) — the final
    select LEFT JOINs from documents with coalesce."""
    # reuse the WITH block of the training oracle without its final SELECT
    with_block, _ = _bpe_oracle_parts(rounds)
    apply_chain = "enc"
    for i in range(1, rounds + 1):
        apply_chain = (f"replace({apply_chain},"
                       f" '[' || t{i}.l || '][' || t{i}.r || ']',"
                       f" '[' || t{i}.l || t{i}.r || ']')")
    froms = ", ".join(f"top{i} t{i}" for i in range(1, rounds + 1))
    return f"""{with_block},
merge_guard AS (
    SELECT CASE WHEN (SELECT count(*) FROM top{rounds}) = 1 THEN 1
           ELSE CAST(error('corpus exhausted its merges before round '
                           || {rounds} || '; unrolled oracle invalid')
                     AS BIGINT) END AS ok
),
docwords AS (
    SELECT doc_id,
           '[' || array_to_string(string_split(w, ''), '][') || ']' AS enc
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
          FROM documents),
         merge_guard
    WHERE ok = 1 AND w != ''
),
applied AS (
    SELECT doc_id,
           len(string_split(trim(enc, '[]'), '][')) AS n_char,
           len(string_split(trim({apply_chain}, '[]'), '][')) AS n_bpe
    FROM docwords, {froms}
),
per_doc AS (
    SELECT doc_id,
           CAST(sum(n_char) AS BIGINT) AS n_char_tokens,
           CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens
    FROM applied
    GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_char_tokens, 0) AS n_char_tokens,
       coalesce(p.n_bpe_tokens, 0) AS n_bpe_tokens,
       coalesce(p.n_char_tokens - p.n_bpe_tokens, 0) AS tokens_saved
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id
"""

BPE_TOKENIZE_APPLY_ORACLE = _bpe_apply_oracle()

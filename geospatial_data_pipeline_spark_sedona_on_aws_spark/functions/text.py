"""Text-analysis function surface for the LLM-data-pipeline extension
(BASELINE.json north star: language-ID, quality scoring, token counting,
document fingerprinting).

Everything here is built from native pyspark.sql.functions Column expressions —
JVM-side, whole-stage-codegen friendly, no Python UDFs in the hot path. Each
helper has an exactly-equivalent ANSI/DuckDB SQL formulation (see
plans/oracles.py) so the driver's DuckDB gate can hash-match values.

Portability contract: cross-engine-deterministic hashing uses
md5-hex → first 15 hex chars → 60-bit integer, identical in Spark
(conv(...,16,10) cast bigint) and DuckDB (('0x'||...)::BIGINT).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language function-word lists for the n-gram/stopword language
# heuristic. Deliberately small and hard-coded so the SQL oracle can embed
# the identical literals.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "en", "que", "por"),
}

FINGERPRINT_MOD = 1_000_000_007

def tokens(text: Column) -> Column:
    """Whitespace tokenization (single-space split — matches DuckDB
    string_split(text, ' ') exactly, including empty tokens on runs)."""
    return F.split(text, " ")

def n_tokens(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")

def n_unique_tokens(text: Column) -> Column:
    return F.size(F.array_distinct(tokens(text))).cast("long")

def type_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return n_unique_tokens(text) / n_tokens(text)

def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks)

def stopword_count(text: Column, lang: str = "en") -> Column:
    words = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(text), lambda t: F.array_contains(words, t))
    ).cast("long")

def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return stopword_count(text, lang) / n_tokens(text)

def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0, 1]: blend of lexical diversity,
    stopword presence, and a mean-token-length sweet spot (3-8 chars)."""
    ttr = type_token_ratio(text)
    sw = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    atl = avg_token_len(text)
    len_ok = F.when((atl >= 3.0) & (atl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return ttr * 0.4 + sw * 0.3 + len_ok * 0.3

def detect_lang(text: Column) -> Column:
    """Stopword-overlap language heuristic: argmax over LANG_STOPWORDS of
    in-vocabulary token count (ties broken by language-code order)."""
    toks = tokens(text)

    def lang_score(ws: tuple[str, ...]) -> Column:
        vocab = F.array(*[F.lit(w) for w in ws])
        return F.size(
            F.filter(toks, lambda t: F.array_contains(vocab, t))
        ).cast("long")

    scored = F.array(*[
        F.struct(lang_score(ws).alias("score"), F.lit(code).alias("lang"))
        for code, ws in sorted(LANG_STOPWORDS.items())
    ])
    # max by (score, then reversed-lang so that on score ties the
    # alphabetically-first language wins)
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).cast("long").alias("score"), F.lit("").alias("lang")),
        lambda acc, x: F.when(x["score"] > acc["score"], x).otherwise(acc),
    )
    return best["lang"]

def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over the character stream:
    h = fold(h * 31 + ascii(c) mod 1e9+7). Cross-engine exact (bigint)."""
    chars = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % FINGERPRINT_MOD,
    )

def portable_hash60(col: Column) -> Column:
    """Deterministic 60-bit hash identical in Spark and DuckDB (md5-derived).
    The cross-engine-safe replacement for xxhash64/F.hash in every operator
    that the DuckDB oracle must reproduce (minhash, simhash, LSH)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")

def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (space-joined) from a *materialized* token
    array column. Callers must pass a named array column (select the token
    split into its own column first): passing tokens(text) directly would
    re-split the whole text for every element_at — O(len²) per document."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )

def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of a text column — the dedup unit for
    minhash / jaccard near-dup detection. Prefer the two-step
    tokens → shingles_from_tokens form in hot paths (see that docstring)."""
    return shingles_from_tokens(tokens(text), k)

def register_text_functions(spark) -> None:  # pragma: no cover - thin veneer
    """Text helpers are pure Column builders (no UDFs) — nothing to register;
    kept for API symmetry with register_spatial_functions."""
    return None

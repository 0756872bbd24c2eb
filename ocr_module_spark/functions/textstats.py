"""Text analysis over the ``documents`` table — token counting, quality
scoring, language-ID heuristic, document fingerprinting.

All computations are native column expressions (JVM-side, codegen'd): at
100 TB these run at scan speed with full predicate pushdown; no Python
touches the hot path. Each query has a DuckDB oracle with identical
semantics (same regex class, same rounding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")
_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS_EN)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _words(col: str = "text"):
    # whitespace tokenizer, empty-safe; mirrored 1:1 in the oracle SQL
    return F.when(F.length(F.trim(F.col(col))) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(F.trim(F.col(col)), r"\s+"))


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting (A4 analogue at corpus scale)."""
    return (_docs(spark, sf_dir)
            .select("doc_id", F.size(_words()).alias("n_tokens")))


SQL_TOKEN_COUNT = """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
FROM documents
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, punctuation density, stopword ratio.

    The boilerplate-scoring idea of the extraction classifier applied as a
    per-document quality signal for training-data filtering.
    """
    d = _docs(spark, sf_dir).withColumn("w", _words())
    n_words = F.size("w")
    n_stop = F.size(F.expr(
        f"filter(w, x -> lower(x) IN ({_SW_LIST}))"))
    n_punct = F.size(F.regexp_extract_all("text", F.lit(r"[.!?]"), 0))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(F.length("text") / F.greatest(n_words, F.lit(1)), 4)
        .alias("avg_word_len"),
    )


SQL_QUALITY_SCORE = f"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       len(w) AS n_words,
       len(regexp_extract_all(text, '[.!?]')) AS n_punct,
       round(len(list_filter(w, x -> lower(x) IN ({_SW_LIST})))
             / greatest(len(w), 1), 4) AS stopword_ratio,
       round(length(text) / greatest(len(w), 1), 4) AS avg_word_len
FROM d
"""


def q_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: stopword-hit-rate threshold, audited against
    the labeled ``lang`` column (accuracy-style rollup)."""
    d = _docs(spark, sf_dir).withColumn("w", _words())
    ratio = (F.size(F.expr(f"filter(w, x -> lower(x) IN ({_SW_LIST}))"))
             / F.greatest(F.size("w"), F.lit(1)))
    guessed = (F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("und")))
    return (d.select("lang", guessed.alias("guessed"))
            .groupBy("lang", "guessed").agg(F.count("*").alias("n")))


SQL_LANG_GUESS = f"""
WITH d AS (
  SELECT lang,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), g AS (
  SELECT lang,
         CASE WHEN len(list_filter(w, x -> lower(x) IN ({_SW_LIST})))
                   / greatest(len(w), 1) >= 0.03
              THEN 'en' ELSE 'und' END AS guessed
  FROM d
)
SELECT lang, guessed, count(*) AS n FROM g GROUP BY lang, guessed
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowered text plus
    a coarse length band — the cheap first-stage near-dup key."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("fingerprint"),
        (F.floor(F.length("text") / 64) * 64).cast("long").alias("len_band"),
    )


SQL_FINGERPRINT = """
SELECT doc_id,
       md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS fingerprint,
       (length(text) // 64) * 64 AS len_band
FROM documents
"""


REGISTRY = {
    "text_token_count": (q_token_count, SQL_TOKEN_COUNT),
    "text_quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "text_lang_guess": (q_lang_guess, SQL_LANG_GUESS),
    "text_fingerprint": (q_fingerprint, SQL_FINGERPRINT),
}

"""Model-based quality scoring: a broadcast weights-table join.

The CCNet/LLaMA-recipe quality gate is a trained linear classifier
(fastText-style) scored over every document — at Spark scale that is a
JOIN shape, not a UDF shape: the model's weights live in a small table
(word → weight, ~10^5–10^6 rows ≈ a few MB), the corpus tokens equi-join
it broadcast-side, and the per-document score is one aggregation. This
module pins that shape with a deterministic pseudo-model so both engines
agree bit-for-bit:

* weights = the corpus's top-K vocabulary weighted by
  ``hex4(md5(word)) % 2001`` (0..2000, 1000 = neutral) — a stand-in
  with the exact storage/join/OOV profile of trained weights (a real
  deployment reads the trained table instead; nothing else changes);
* scoring = explode(lower(tokens)) → LEFT broadcast join (OOV words hit
  the neutral prior 1000, and are counted — the OOV rate is itself a
  quality signal) → one groupBy(doc_id) with map-side partial
  aggregation soaking up the explode;
* score = integer mean weight ×1000 (floor division on non-negative
  sums, so Spark ``div`` and DuckDB ``//`` agree), keep = score above
  the neutral line.

Scale notes: the corpus side never shuffles tokens — the join is
broadcast, the aggregation reduces map-side to one row per (partition,
doc) before the only exchange. The weights build here scans the corpus
(demo: the "training set" is the corpus itself); in production the
weights table is a parquet read, making the whole gate one scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import hex4_col, hex4_sql_duck

W_VOCAB_K = 256        # pseudo-model vocabulary size
W_MOD = 2001           # weights 0..2000; 1000 = neutral prior
W_NEUTRAL = 1000


def _tokens(docs: DataFrame) -> DataFrame:
    w = F.when(F.length(F.trim("text")) == 0,
               F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim("text"), r"\s+"))
    return docs.select("doc_id", F.explode(w).alias("word")) \
        .select("doc_id", F.lower("word").alias("word"))


def weights_frame(docs: DataFrame, k: int = W_VOCAB_K) -> DataFrame:
    """(word, w_x1000) pseudo-model weights over the top-k vocabulary
    (ties broken by word — deterministic across engines/runs)."""
    counts = _tokens(docs).groupBy("word") \
        .agg(F.count("*").alias("n_occurrences"))
    top = counts.orderBy(F.col("n_occurrences").desc(), "word").limit(k)
    return top.select(
        "word",
        (hex4_col(F.md5(F.col("word").cast("binary"))) % W_MOD)
        .alias("w_x1000"))


def score_frame(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Per-document classifier score: (doc_id, n_tokens, n_oov,
    score_x1000, keep). Only docs with ≥1 token score (empty/NULL text
    has no token stream to classify — the length gate upstream owns
    those)."""
    t = _tokens(docs)
    j = t.join(F.broadcast(weights), "word", "left")
    s = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("w_x1000").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"),
        F.sum(F.coalesce("w_x1000", F.lit(W_NEUTRAL)))
        .cast("long").alias("sum_w"))
    score = F.expr("sum_w div n_tokens")
    return s.select(
        "doc_id", "n_tokens", "n_oov",
        score.cast("long").alias("score_x1000"),
        (score > W_NEUTRAL).alias("keep"))


def q_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return score_frame(d, weights_frame(d))


_W_HEX = hex4_sql_duck("md5(word)")

SQL_MODEL_SCORE = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), t AS (
  SELECT doc_id, lower(u.word) AS word
  FROM d, unnest(w) AS u(word)
), v AS (
  SELECT word, count(*) AS n_occurrences
  FROM t GROUP BY 1
  ORDER BY n_occurrences DESC, word LIMIT {W_VOCAB_K}
), wt AS (
  SELECT word, {_W_HEX} % {W_MOD} AS w_x1000 FROM v
), s AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN wt.word IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov,
         sum(coalesce(wt.w_x1000, {W_NEUTRAL}))::BIGINT AS sum_w
  FROM t LEFT JOIN wt ON t.word = wt.word
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, n_oov,
       (sum_w // n_tokens)::BIGINT AS score_x1000,
       (sum_w // n_tokens) > {W_NEUTRAL} AS keep
FROM s
"""


REGISTRY = {
    "text_model_score": (q_model_score, SQL_MODEL_SCORE),
}

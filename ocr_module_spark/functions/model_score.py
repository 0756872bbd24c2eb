"""Model-based quality scoring: train the weights, score as a join.

The CCNet/LLaMA-recipe quality gate is a trained linear classifier
(fastText-style) scored over every document — at Spark scale both halves
are relational shapes, not UDF shapes:

* TRAIN — the CCNet bootstrap: label every document with the heuristic
  Gopher gate (``textstats.quality_label_frame`` — the stand-in for
  "Wikipedia-referenced pages" positives), then one token explode +
  one groupBy(word) learns a Naive-Bayes count-ratio weight per word::

      w_x1000 = (2000 * (n_pos + 1)) div (n + 2)     # add-one smoothing

  Integer arithmetic end-to-end (counts are longs, division is floor
  div), so the trained weights are BIT-identical across partitionings,
  retries, parallelism levels, and engines — the same fixed-point
  determinism discipline as ``train_ivf_centroids``. Weights live in
  0..2000 with 1000 the balanced-evidence midpoint; a word seen only in
  gate-passing documents trains toward 2000, only in gate-failing ones
  toward 0. The vocabulary is the top-``W_VOCAB_K`` words by total
  count (ties by word — deterministic).

* SCORE — the weights table is model-sized (~10^5-10^6 rows ≈ a few
  MB): explode(lower(tokens)) → LEFT broadcast join (OOV words hit the
  neutral prior 1000 and are counted — the OOV rate is itself a quality
  signal) → one groupBy(doc_id) with map-side partial aggregation
  soaking up the explode; score = integer mean weight ×1000 (floor
  division on non-negative sums, so Spark ``div`` and DuckDB ``//``
  agree), keep = score above the neutral line.

Scale notes: the corpus side never shuffles tokens — the scoring join
is broadcast, the aggregation reduces map-side to one row per
(partition, doc) before the only exchange. Training scans the corpus
once more (the demo trains on the corpus it scores; production trains
on a hash sample — ``sample_stratified_hash`` — and persists the
weights table to parquet, making the gate itself one scan + one
broadcast join).

Reference tie: generalizes the role-classification dispatch of
``pylatex_generate_pdf_repository.py:100-112`` to a trained,
corpus-scale gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import quality_label_frame, sql_quality_label_expr

W_VOCAB_K = 256        # model vocabulary size
W_NEUTRAL = 1000       # OOV prior; 2000 = certain-positive, 0 = negative


def _tokens(docs: DataFrame) -> DataFrame:
    w = F.when(F.length(F.trim("text")) == 0,
               F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim("text"), r"\s+"))
    return docs.select("doc_id", F.explode(w).alias("word")) \
        .select("doc_id", F.lower("word").alias("word"))


def train_weights(docs: DataFrame, labels: DataFrame,
                  k: int = W_VOCAB_K) -> DataFrame:
    """(word, w_x1000): Naive-Bayes count-ratio weights over the top-k
    vocabulary, trained against ``labels`` (doc_id, label ∈ {0, 1}).
    One explode + one partial-aggregated groupBy + a k-row TakeOrdered —
    the trainer never shuffles document text, and every weight is an
    integer function of (n_pos, n) so training is bit-deterministic."""
    t = _tokens(docs).join(labels, "doc_id")
    counts = t.groupBy("word").agg(
        F.count("*").alias("n"),
        F.sum("label").cast("long").alias("n_pos"))
    top = counts.orderBy(F.col("n").desc(), "word").limit(k)
    return top.select(
        "word",
        F.expr("(2000 * (n_pos + 1)) div (n + 2)")
        .cast("long").alias("w_x1000"))


def weights_frame(docs: DataFrame, k: int = W_VOCAB_K) -> DataFrame:
    """Trained weights over the corpus's own heuristic labels (the CCNet
    bootstrap). Kept as the one-call surface score_frame consumers use;
    pass precomputed labels via train_weights directly."""
    return train_weights(docs, quality_label_frame(docs), k)


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


SQL_MODEL_SCORE = f"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), lab AS (
  SELECT doc_id, {sql_quality_label_expr()} AS label FROM d
), t AS (
  SELECT doc_id, lower(u.word) AS word
  FROM d, unnest(w) AS u(word)
), v AS (
  SELECT word, count(*)::BIGINT AS n, sum(lab.label)::BIGINT AS n_pos
  FROM t JOIN lab ON t.doc_id = lab.doc_id
  GROUP BY word
  ORDER BY count(*) DESC, word LIMIT {W_VOCAB_K}
), wt AS (
  SELECT word, (2000 * (n_pos + 1)) // (n + 2) AS w_x1000 FROM v
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


def auc_frame(scored: DataFrame, labels: DataFrame,
              score_col: str = "score_x1000") -> DataFrame:
    """Exact tie-aware ROC-AUC of a score column against binary labels
    — the "measure, don't guess" eval for the model gate (does the
    classifier's score actually rank gate-passing documents above
    gate-failing ones?). One row out: ``(n_pos, n_neg, u_times2,
    auc_x1000000)``.

    Mann-Whitney rank form, INTEGER end-to-end (bit-identical across
    partitionings/engines): with per-score-value groups g ordered by
    score, average-rank×2 of group g is ``2·cum_below + n_g + 1``, so

        2·R_pos = Σ_g n_pos_g · (2·cum_below_g + n_g + 1)
        2·U     = 2·R_pos − n_pos·(n_pos+1)           # ∈ [0, 2·n_pos·n_neg]
        auc_x1e6 = (2U · 500000) div (n_pos·n_neg)    # ties count 1/2

    Scale shape: the corpus reduces FIRST — one partial-aggregated
    groupBy(score) census — and only then does the one-partition
    running-sum window run, over the score GRID, not the corpus: the
    model emits quantized integer scores (0..2000 for the count-ratio
    weights), so the window input is ≤2001 rows at any corpus size.
    Degenerate single-class inputs yield NULL auc (n_pos·n_neg = 0).
    """
    from pyspark.sql.window import Window
    sc = (scored.select("doc_id",
                        F.col(score_col).cast("long").alias("score"))
          .join(labels, "doc_id"))
    g = sc.groupBy("score").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("label").cast("long").alias("n_pos"))
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = g.withColumn("cum_below",
                     F.coalesce(F.sum("n").over(w), F.lit(0)))
    agg = c.agg(
        F.sum(F.col("n_pos")
              * (2 * F.col("cum_below") + F.col("n") + 1))
        .cast("long").alias("r2"),
        F.sum("n_pos").cast("long").alias("np"),
        F.sum(F.col("n") - F.col("n_pos")).cast("long").alias("nn"))
    u2 = F.col("r2") - F.col("np") * (F.col("np") + 1)
    return agg.select(
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        u2.cast("long").alias("u_times2"),
        F.when((F.col("np") > 0) & (F.col("nn") > 0),
               F.expr("((r2 - np * (np + 1)) * 500000)"
                      " div (np * nn)"))
        .cast("long").alias("auc_x1000000"))


def q_model_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: AUC of the bootstrap-trained model's score against
    the heuristic quality labels it was trained on (training-set AUC —
    the gate-calibration sanity number; production evaluates on a
    held-out labeled sample through the same frame)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return auc_frame(score_frame(d, weights_frame(d)),
                     quality_label_frame(d))


SQL_MODEL_AUC = SQL_MODEL_SCORE.rsplit("\nSELECT", 1)[0] + """,
sc AS (
  SELECT s.doc_id, (sum_w // n_tokens)::BIGINT AS score, lab.label
  FROM s JOIN lab ON s.doc_id = lab.doc_id
), g AS (
  SELECT score, count(*)::BIGINT AS n, sum(label)::BIGINT AS n_pos
  FROM sc GROUP BY score
), c AS (
  SELECT score, n, n_pos,
         coalesce(sum(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_below
  FROM g
), agg AS (
  SELECT CAST(sum(n_pos * (2 * cum_below + n + 1)) AS BIGINT) AS r2,
         CAST(sum(n_pos) AS BIGINT) AS np,
         CAST(sum(n - n_pos) AS BIGINT) AS nn
  FROM c
)
SELECT np AS n_pos, nn AS n_neg,
       (r2 - np * (np + 1))::BIGINT AS u_times2,
       CAST(CASE WHEN np > 0 AND nn > 0
            THEN ((r2 - np * (np + 1)) * 500000) // (np * nn)
       END AS BIGINT) AS auc_x1000000
FROM agg
"""


AUC_HOLDOUT_MOD = 5    # demo fold: doc_id % 5 == 0 held out, rest trains


def q_model_auc_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out AUC — the honest generalization number next to
    ``q_model_auc``'s training-set reading: the bootstrap model trains
    ONLY on the 4/5 train fold (``doc_id % 5 != 0``) and is scored +
    evaluated ONLY on the held-out fold. Production composes
    ``auc_frame`` with the host-keyed ``splits.split_assignments``
    (leakage-safe); the demo folds on doc_id because the sf corpora
    have ~20 hosts, so a 2%-of-hosts val fold is empty — a
    doc-grain fold keeps the demo discriminative while exercising the
    identical train/score/evaluate composition. Scale shape unchanged:
    the fold predicates are scan filters ahead of the model-score
    shapes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    labels = quality_label_frame(d)
    fold = F.pmod(F.col("doc_id"), F.lit(AUC_HOLDOUT_MOD))
    w = train_weights(d.where(fold != 0), labels)
    held = d.where(fold == 0)
    return auc_frame(score_frame(held, w), labels)


SQL_MODEL_AUC_HOLDOUT = f"""
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), lab AS (
  SELECT doc_id, {sql_quality_label_expr()} AS label FROM d
), t AS (
  SELECT doc_id, lower(u.word) AS word
  FROM d, unnest(w) AS u(word)
), v AS (
  SELECT word, count(*)::BIGINT AS n, sum(lab.label)::BIGINT AS n_pos
  FROM t JOIN lab ON t.doc_id = lab.doc_id
  WHERE t.doc_id % {AUC_HOLDOUT_MOD} <> 0
  GROUP BY word
  ORDER BY count(*) DESC, word LIMIT {W_VOCAB_K}
), wt AS (
  SELECT word, (2000 * (n_pos + 1)) // (n + 2) AS w_x1000 FROM v
), s AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_tokens,
         sum(coalesce(wt.w_x1000, {W_NEUTRAL}))::BIGINT AS sum_w
  FROM t LEFT JOIN wt ON t.word = wt.word
  WHERE t.doc_id % {AUC_HOLDOUT_MOD} = 0
  GROUP BY t.doc_id
), sc AS (
  SELECT s.doc_id, (sum_w // n_tokens)::BIGINT AS score, lab.label
  FROM s JOIN lab ON s.doc_id = lab.doc_id
), g AS (
  SELECT score, count(*)::BIGINT AS n, sum(label)::BIGINT AS n_pos
  FROM sc GROUP BY score
), c AS (
  SELECT score, n, n_pos,
         coalesce(sum(n) OVER (ORDER BY score
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_below
  FROM g
), agg AS (
  SELECT CAST(sum(n_pos * (2 * cum_below + n + 1)) AS BIGINT) AS r2,
         CAST(sum(n_pos) AS BIGINT) AS np,
         CAST(sum(n - n_pos) AS BIGINT) AS nn
  FROM c
)
SELECT np AS n_pos, nn AS n_neg,
       (r2 - np * (np + 1))::BIGINT AS u_times2,
       CAST(CASE WHEN np > 0 AND nn > 0
            THEN ((r2 - np * (np + 1)) * 500000) // (np * nn)
       END AS BIGINT) AS auc_x1000000
FROM agg
"""


REGISTRY = {
    "text_model_score": (q_model_score, SQL_MODEL_SCORE),
    "text_model_auc": (q_model_auc, SQL_MODEL_AUC),
    "text_model_auc_holdout": (q_model_auc_holdout,
                               SQL_MODEL_AUC_HOLDOUT),
}

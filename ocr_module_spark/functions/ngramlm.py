"""Trained n-gram LM perplexity gate (the CCNet KenLM analogue).

CCNet's defining quality signal is a language-model perplexity: train a
KenLM on Wikipedia, score every crawl document, and bucket each
language's documents into head/middle/tail perplexity terciles. This
module is that recipe as relational shapes — no UDFs, no external
model: a **Stupid Backoff** trigram LM (Brants et al. 2007, "Large
Language Models in Machine Translation" — the backoff designed FOR
web-scale distributed counting: no discounting, one fixed backoff
penalty, scores are plain count ratios), trained on the corpus's own
Gopher-gate positives (``textstats.quality_label_frame`` — the same
in-corpus stand-in for "Wikipedia-like" text that ``model_score``
bootstraps from) and scored over everything.

* TRAIN (``train_ngram_lm``) — ONE in-row trigram construction over
  the sample's token arrays (``transform(sequence(..))`` → explode: no
  array duplication per exploded row) feeds three partial-aggregated
  groupBys (uni/bi/tri counts, each keyed on the n-gram — the Brants
  map-side-combine shape), then model-sized joins compute the Stupid
  Backoff relative frequencies as fixed-point logs::

      lp3 = round(log10(c(w1w2w3) / c(w1w2)) * 10^4)    # ≤ 0
      lp2 = round(log10(c(w2w3)   / c(w2))   * 10^4)
      lp1 = round(log10(c(w3)     / T)       * 10^4)
      unk = round(log10(1         / (T + 1)) * 10^4)

  The one float op per model row (log10 + HALF-UP round to 4dp) is the
  established cross-engine discipline (simsearch's 4dp cosine): Spark's
  ``Math.log10`` and DuckDB's libm agree to well under the rounding
  grain except within ~1 ulp of a .00005 boundary (odds ≈ 2^-40 per
  row, pinned continuously by the parity gate). Everything after the
  table is integer. The model ships as ONE union frame
  ``(ord ∈ {3,2,1,0}, w1, w2, w3, lp_x10000)`` — persistable to a
  single parquet, broadcastable whole.

* SCORE (``score_ngram_lm``) — the corpus side never shuffles tokens:
  in-row trigram construction → three LEFT **broadcast** joins (tri on
  (w1,w2,w3), bi on (w2,w3), uni on w3) + the 1-row unk floor → the
  position-aware backoff chain in one CASE (a document's first two
  tokens back off for MISSING context, not failed context, so they pay
  no penalty)::

      pos 1:  lp1                     | unk
      pos 2:  lp2 | lp1 + BO          | unk + BO
      pos ≥3: lp3 | lp2 + BO | lp1 + 2·BO | unk + 2·BO

  with BO = round(log10(0.4)·10^4) = -3979 (the canonical Stupid
  Backoff α = 0.4), then ONE groupBy(doc_id) whose map-side partial
  aggregation soaks the explode. Per-doc score is the mean negative
  log10-likelihood in fixed point, ``mean_nll_x10000 = (-Σlp) div n``
  (all-integer; Σlp ≤ 0 so the floor division operands are
  non-negative and Spark ``div`` == DuckDB ``//``). Lower = more like
  the training text. ``n_oov`` (tokens with no unigram row) rides the
  same aggregation — the OOV-rate quality signal for free.

* TIER (``q_lm_perplexity``) — CCNet buckets per LANGUAGE:
  ``row_number`` over (lang | mean_nll ASC, doc_id ASC — a total
  order, deterministic on both engines) against the partition count,
  ``3·rn ≤ cnt`` → head, ``3·rn ≤ 2·cnt`` → middle, else tail. Pure
  integer comparisons — no percent_rank floats.

Scale notes (100 TB): training scans a SAMPLE (here the gate-positive
docs; production: ``sample_stratified_hash`` or a curated reference
corpus) so the count shuffles are sample-sized; ``prune_min`` drops
singleton bi/trigrams — Brants prunes exactly this way to keep
web-scale models bounded. Scoring is scan + 3 broadcast joins + one
doc-grain exchange. The per-lang tercile window shuffles ONE ROW PER
DOC (never tokens); at 10^12 docs the window form here is the demo —
production samples per-lang nll quantiles and broadcasts the two
thresholds back (the budget_mix decomposition), which changes no
numbers, only the exchange.

Reference tie: the trained generalization of the reference's
role-classification dispatch (pylatex_generate_pdf_repository.py:
100-112), third sibling of ``model_score`` (linear NB) and ``langid``
(trigram posterior voting) — this one models SEQUENCE structure, which
is what separates fluent prose from keyword stuffing that beats
bag-of-words gates.

Gate: ``text_lm_perplexity`` DuckDB full-twin parity (trainer + scorer
+ tiers in one SQL) on sf + hostile corpora via tests/
test_hostile_parity.py, plan discipline in the registry sweep, and
tests/test_ngramlm.py (hand-computed counts, pure-Python twin on
planted corpora, backoff-chain policy pins, fuzz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

BO_X10000 = -3979          # round(log10(0.4) * 1e4): Stupid Backoff α
LM_ORDER = 3               # trigram (the classic web-scale order)


def _gram_stream(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(doc_id[, extra...], pos, w1, w2, w3): per-token trigram rows.

    Tokens are the shared corpus convention (lowercased ``\\s+`` split,
    model_score._tokens); w1/w2 are NULL where the context window runs
    off the document start (pos 1-2), which the scorer's CASE reads as
    "back off without penalty". The struct array is built IN-ROW
    (guarded: ``sequence(1, 0)`` runs descending, so empty docs short-
    circuit to an empty array) and exploded once — the token array is
    never duplicated across exploded rows and never shuffles."""
    toks = F.when(F.length(F.trim("text")) == 0,
                  F.array().cast("array<string>")) \
        .otherwise(F.expr(r"transform(split(trim(text), '\\s+'),"
                          " x -> lower(x))"))
    grams = F.expr(
        "CASE WHEN size(w) = 0 THEN "
        "  array()::array<struct<pos:int,w1:string,w2:string,w3:string>>"
        " ELSE transform(sequence(1, size(w)), i -> struct("
        "   i AS pos,"
        "   CASE WHEN i >= 3 THEN element_at(w, i - 2) END AS w1,"
        "   CASE WHEN i >= 2 THEN element_at(w, i - 1) END AS w2,"
        "   element_at(w, i) AS w3)) END")
    return (docs.select("doc_id", *extra_cols, toks.alias("w"))
            .select("doc_id", *extra_cols, F.explode(grams).alias("g"))
            .select("doc_id", *extra_cols, "g.*"))


def _lp(ratio_num, ratio_den):
    """Fixed-point log-frequency: round(log10(num/den) * 1e4) as long —
    the one float op in the model, HALF-UP-rounded to the 4dp grain on
    both engines (module docstring: cross-engine discipline)."""
    return F.round(F.log10(ratio_num.cast("double")
                           / ratio_den.cast("double")) * 10000) \
        .cast("long")


def train_ngram_lm(docs: DataFrame, prune_min: int = 1) -> DataFrame:
    """(ord, w1, w2, w3, lp_x10000): the Stupid-Backoff model as one
    union frame — ord 3/2/1 are the count-ratio log-frequencies, ord 0
    is the single unknown-word floor row (carrying T, so the model is
    self-contained). ``prune_min`` drops bi/trigrams seen fewer times
    (Brants-style pruning; unigrams always survive — they are the
    backoff of last resort)."""
    g = _gram_stream(docs)
    uni = g.groupBy("w3").agg(F.count("*").alias("n1"))
    bi = (g.where("pos >= 2").groupBy("w2", "w3")
          .agg(F.count("*").alias("n2"))
          .where(F.col("n2") >= prune_min))
    tri = (g.where("pos >= 3").groupBy("w1", "w2", "w3")
           .agg(F.count("*").alias("n3"))
           .where(F.col("n3") >= prune_min))
    total = uni.agg(F.coalesce(F.sum("n1"), F.lit(0)).alias("t"))

    uni_lp = (uni.crossJoin(F.broadcast(total))
              .select(F.lit(1).alias("ord"),
                      F.lit(None).cast("string").alias("w1"),
                      F.lit(None).cast("string").alias("w2"), "w3",
                      _lp(F.col("n1"), F.col("t")).alias("lp_x10000")))
    # denominator of p(w3|w2) is c(w2) — the unigram count of the
    # CONTEXT word, which counts every occurrence incl. document-final
    bi_lp = (bi.join(uni.withColumnRenamed("w3", "w2")
                     .withColumnRenamed("n1", "n_ctx"), "w2")
             .select(F.lit(2).alias("ord"),
                     F.lit(None).cast("string").alias("w1"), "w2", "w3",
                     _lp(F.col("n2"), F.col("n_ctx")).alias("lp_x10000")))
    # denominator of p(w3|w1w2) is the PAIR count c(w1w2) — the bigram
    # table keyed (prev, cur) = (w1, w2), unpruned so every observed
    # trigram keeps its true context mass
    pair = (g.where("pos >= 2").groupBy(
        F.col("w2").alias("w1"), F.col("w3").alias("w2"))
        .agg(F.count("*").alias("n_ctx")))
    tri_lp = (tri.join(pair, ["w1", "w2"])
              .select(F.lit(3).alias("ord"), "w1", "w2", "w3",
                      _lp(F.col("n3"), F.col("n_ctx")).alias("lp_x10000")))
    unk_lp = total.select(
        F.lit(0).alias("ord"),
        F.lit(None).cast("string").alias("w1"),
        F.lit(None).cast("string").alias("w2"),
        F.lit(None).cast("string").alias("w3"),
        _lp(F.lit(1), F.col("t") + 1).alias("lp_x10000"))
    return uni_lp.unionByName(bi_lp).unionByName(tri_lp) \
        .unionByName(unk_lp)


def score_ngram_lm(docs: DataFrame, model: DataFrame,
                   *extra_cols: str) -> DataFrame:
    """(doc_id[, extra...], n_tokens, n_oov, mean_nll_x10000): per-doc
    mean negative log10-likelihood under the model, all-integer after
    the broadcast joins. Docs with no token stream (NULL/empty/
    whitespace text) produce no row — the upstream length gate owns
    those (the langid 'und' convention)."""
    g = _gram_stream(docs, *extra_cols)
    m3 = model.where("ord = 3").select(
        "w1", "w2", "w3", F.col("lp_x10000").alias("lp3"))
    m2 = model.where("ord = 2").select(
        "w2", "w3", F.col("lp_x10000").alias("lp2"))
    m1 = model.where("ord = 1").select(
        "w3", F.col("lp_x10000").alias("lp1"))
    m0 = model.where("ord = 0").select(
        F.col("lp_x10000").alias("lp_unk"))
    j = (g.join(F.broadcast(m3), ["w1", "w2", "w3"], "left")
         .join(F.broadcast(m2), ["w2", "w3"], "left")
         .join(F.broadcast(m1), ["w3"], "left")
         .crossJoin(F.broadcast(m0)))
    bo = F.lit(BO_X10000)
    lp = (F.when(F.col("pos") == 1,
                 F.coalesce("lp1", "lp_unk"))
          .when(F.col("pos") == 2,
                F.coalesce(F.col("lp2"), F.col("lp1") + bo,
                           F.col("lp_unk") + bo))
          .otherwise(F.coalesce(F.col("lp3"), F.col("lp2") + bo,
                                F.col("lp1") + 2 * bo,
                                F.col("lp_unk") + 2 * bo)))
    agg = j.groupBy("doc_id", *extra_cols).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.when(F.col("lp1").isNull(), 1).otherwise(0))
        .cast("long").alias("n_oov"),
        F.sum(lp).cast("long").alias("sum_lp"))
    return agg.select(
        "doc_id", *extra_cols, "n_tokens", "n_oov",
        F.expr("(-sum_lp) div n_tokens").cast("long")
        .alias("mean_nll_x10000"))


def with_ppl_tiers(scored: DataFrame,
                   part_col: str = "lang") -> DataFrame:
    """``scored`` + ``ppl_tier`` ∈ {head, middle, tail}: CCNet's
    per-``part_col`` perplexity terciles — ``row_number`` against the
    partition count over the total order (mean_nll ASC, doc_id ASC),
    pure integer comparisons. The window shuffles doc-grain rows only;
    at 10^12 docs production samples per-partition nll thresholds and
    broadcasts them back instead (the budget_mix decomposition — same
    numbers, different exchange)."""
    w = Window.partitionBy(part_col) \
        .orderBy(F.col("mean_nll_x10000").asc(), F.col("doc_id").asc())
    cw = Window.partitionBy(part_col)
    rn, cnt = F.row_number().over(w), F.count(F.lit(1)).over(cw)
    tier = (F.when(3 * rn <= cnt, "head")
            .when(3 * rn <= 2 * cnt, "middle").otherwise("tail"))
    return scored.withColumn("ppl_tier", tier)


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demo query: self-train on the corpus's Gopher-gate positives
    (the CCNet bootstrap), score every doc, and assign each language's
    perplexity terciles (head/middle/tail) with integer window math."""
    from .textstats import quality_label_frame
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "text")
    labels = quality_label_frame(d.select("doc_id", "text"))
    train = d.join(labels.where("label = 1"), "doc_id") \
        .select("doc_id", "text")
    scored = score_ngram_lm(d, train_ngram_lm(train), "lang")
    return with_ppl_tiers(scored).select(
        "doc_id", "lang", "n_tokens", "n_oov",
        "mean_nll_x10000", "ppl_tier")


# one SQL twin: trainer CTEs + scorer joins + integer tercile window.
# w[i] is 1-based in DuckDB; the gram CTEs mirror _gram_stream exactly
# (pos 1/2 rows carry NULL context, empty/NULL text yields no rows).
from .textstats import sql_quality_label_expr  # noqa: E402

SQL_LM_PERPLEXITY = f"""
WITH d AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE list_transform(string_split_regex(trim(text), '\\s+'),
                                  x -> lower(x)) END AS w,
         text
  FROM documents
), lab AS (
  SELECT doc_id, {sql_quality_label_expr()} AS label FROM d
), g AS (
  SELECT doc_id, lang,
         unnest(generate_series(1, len(w))) AS pos, w
  FROM d
), grams AS (
  SELECT doc_id, lang, pos,
         CASE WHEN pos >= 3 THEN w[pos - 2] END AS w1,
         CASE WHEN pos >= 2 THEN w[pos - 1] END AS w2,
         w[pos] AS w3
  FROM g
), tg AS (      -- training stream: gate-positive docs only
  SELECT grams.* FROM grams JOIN lab ON grams.doc_id = lab.doc_id
  WHERE lab.label = 1
), uni AS (
  SELECT w3, count(*)::BIGINT AS n1 FROM tg GROUP BY w3
), tot AS (
  SELECT coalesce(sum(n1), 0)::BIGINT AS t FROM uni
), bi AS (
  SELECT w2, w3, count(*)::BIGINT AS n2 FROM tg
  WHERE pos >= 2 GROUP BY w2, w3
), tri AS (
  SELECT w1, w2, w3, count(*)::BIGINT AS n3 FROM tg
  WHERE pos >= 3 GROUP BY w1, w2, w3
), m1 AS (
  SELECT w3, CAST(round(log10(n1::DOUBLE / t) * 10000) AS BIGINT)
         AS lp1
  FROM uni, tot
), m2 AS (
  SELECT bi.w2, bi.w3,
         CAST(round(log10(bi.n2::DOUBLE / u.n1) * 10000) AS BIGINT)
         AS lp2
  FROM bi JOIN uni u ON bi.w2 = u.w3
), m3 AS (
  SELECT tri.w1, tri.w2, tri.w3,
         CAST(round(log10(tri.n3::DOUBLE / p.n_ctx) * 10000) AS BIGINT)
         AS lp3
  FROM tri JOIN (SELECT w2 AS w1, w3 AS w2, count(*)::BIGINT AS n_ctx
                 FROM tg WHERE pos >= 2 GROUP BY 1, 2) p
       ON tri.w1 = p.w1 AND tri.w2 = p.w2
), m0 AS (
  SELECT CAST(round(log10(1.0 / (t + 1)) * 10000) AS BIGINT) AS lp_unk
  FROM tot
), s AS (
  SELECT grams.doc_id, grams.lang,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN m1.lp1 IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_oov,
         sum(CASE
             WHEN pos = 1 THEN coalesce(m1.lp1, m0.lp_unk)
             WHEN pos = 2 THEN coalesce(m2.lp2,
                                        m1.lp1 + ({BO_X10000}),
                                        m0.lp_unk + ({BO_X10000}))
             ELSE coalesce(m3.lp3,
                           m2.lp2 + ({BO_X10000}),
                           m1.lp1 + 2 * ({BO_X10000}),
                           m0.lp_unk + 2 * ({BO_X10000}))
             END)::BIGINT AS sum_lp
  FROM grams
  LEFT JOIN m3 ON grams.w1 = m3.w1 AND grams.w2 = m3.w2
              AND grams.w3 = m3.w3
  LEFT JOIN m2 ON grams.w2 = m2.w2 AND grams.w3 = m2.w3
  LEFT JOIN m1 ON grams.w3 = m1.w3
  CROSS JOIN m0
  GROUP BY grams.doc_id, grams.lang
), scored AS (
  SELECT doc_id, lang, n_tokens, n_oov,
         ((-sum_lp) // n_tokens)::BIGINT AS mean_nll_x10000
  FROM s
)
SELECT doc_id, lang, n_tokens, n_oov, mean_nll_x10000,
       CASE WHEN 3 * row_number() OVER wl <= count(*) OVER wc
            THEN 'head'
            WHEN 3 * row_number() OVER wl <= 2 * count(*) OVER wc
            THEN 'middle' ELSE 'tail' END AS ppl_tier
FROM scored
WINDOW wl AS (PARTITION BY lang
              ORDER BY mean_nll_x10000 ASC, doc_id ASC),
       wc AS (PARTITION BY lang)
"""

REGISTRY = {
    "text_lm_perplexity": (q_lm_perplexity, SQL_LM_PERPLEXITY),
}

"""Trained language identification: char-trigram voting, integer math.

The heuristic ``guessed_lang`` in :mod:`textstats` is the inference-only
stand-in (stopword hit-rate); THIS module is the trained half a CCNet-
style pipeline actually runs — a fastText-lang-ID analogue learned from
the crawl's own labeled ``lang`` column and applied corpus-wide to
verify/repair those labels. Both halves are relational shapes, no UDFs:

* TRAIN — one char-trigram explode over the labeled sample + one
  partial-aggregated groupBy(gram, lang), a top-``VOCAB_K`` vocabulary
  (ties by gram — deterministic), and the FULL gram x lang weight grid
  (small constant-key broadcast joins; never a cartesian plan)::

      w_x1000 = (1000 * (n_gl + 1)) div (n_g + n_langs)

  This is the add-one-smoothed posterior P(lang | gram) in fixed point:
  per gram the weights sum to ~1000 across languages. Integer counts,
  floor division — the trained model is BIT-identical across
  partitionings, retries, and engines (the ``train_ivf_centroids`` /
  ``model_score.train_weights`` determinism discipline). Materializing
  the full grid (VOCAB_K x n_langs rows, model-sized) keeps scoring
  sums comparable across languages — a language missing a gram's row
  would otherwise silently skip that gram's smoothed floor vote.

* SCORE — per-gram posterior voting: explode the document's trigrams,
  LEFT broadcast-join the weight grid (an in-vocabulary gram fans out
  to exactly n_langs rows; an out-of-vocabulary gram keeps one NULL-lang
  row so OOV is counted, mirroring ``model_score``'s OOV discipline),
  one groupBy(doc_id, lang) with map-side partial aggregation, then one
  window over doc_id ranks languages by (sum_w DESC, lang ASC) — a total
  order, so the argmax is deterministic on both engines. Documents whose
  every gram is out-of-vocabulary have no language row to win and are
  absent from the score frame; the eval rollup coalesces them to 'und'
  (same contract as empty/short text, which produces no trigram at all).

Scale notes: document text never shuffles — the only exchanges are the
narrow (doc_id, lang, sum_w) frame's aggregation and window (~n_langs
rows per doc). Training scans the labeled sample once; production
trains on a hash sample (``textstats.sample_stratified_hash``) and
persists the grid to parquet, making corpus-wide scoring one scan + one
broadcast join. The demo query self-trains on the corpus it scores.

Reference tie: generalizes the role-classification dispatch of
``pylatex_generate_pdf_repository.py:100-112`` to a trained multi-class
gate over the crawl table's ``lang`` column (``corpus.py`` input shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

GRAM_N = 3          # char trigrams — the classic lang-ID feature
VOCAB_K = 512       # model vocabulary (grams); grid is VOCAB_K x n_langs
SCALE = 1000        # fixed-point: per-gram posteriors sum to ~SCALE


def _gram_frame(docs: DataFrame, with_label: bool) -> DataFrame:
    """(doc_id[, lang], gram) — char GRAM_N-grams of whitespace-collapsed
    lowercased text. substring() is character-based (not byte) on both
    Spark and DuckDB, so CJK trigrams align across engines. Docs shorter
    than GRAM_N chars (incl. NULL/empty text) yield no rows."""
    cols = ["doc_id", "lang"] if with_label else ["doc_id"]
    s = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    d = docs.select(*cols, s.alias("s"))
    grams = F.expr(
        f"CASE WHEN s IS NULL OR length(s) < {GRAM_N} "
        "THEN array() "
        f"ELSE transform(sequence(1, length(s) - {GRAM_N - 1}), "
        f"i -> substring(s, i, {GRAM_N})) END")
    return d.select(*cols, F.explode(grams).alias("gram"))


def train_langid_weights(docs: DataFrame, k: int = VOCAB_K) -> DataFrame:
    """(gram, lang, w_x1000): the full smoothed posterior grid over the
    top-k trigram vocabulary, trained on rows with a non-NULL ``lang``
    label. Every join is a broadcast of a model-sized frame (vocab,
    language list, 1-row language count) — the grid build is
    constant-key equi-joins, not a cartesian plan."""
    g = _gram_frame(docs, with_label=True).where(F.col("lang").isNotNull())
    c = g.groupBy("gram", "lang").agg(F.count("*").alias("n_gl"))
    v = c.groupBy("gram").agg(F.sum("n_gl").cast("long").alias("n_g")) \
        .orderBy(F.col("n_g").desc(), "gram").limit(k)
    langs = c.select("lang").distinct()
    nl = langs.agg(F.count("*").cast("long").alias("n_langs"))
    # vocab x language-list x 1-row-count: deliberate broadcast-bounded
    # nested-loop joins (the grid IS a cross product of model-sized
    # frames; both build sides are broadcast — BNLJ_OK class in the
    # registry plan sweep, like ann_recall_eval's 1-row combines)
    grid = v.crossJoin(F.broadcast(langs)).crossJoin(F.broadcast(nl))
    cv = c.join(F.broadcast(v.select("gram")), "gram")   # counts, in-vocab
    return (grid.join(F.broadcast(cv), ["gram", "lang"], "left")
            .select("gram", "lang",
                    F.expr(f"({SCALE} * (coalesce(n_gl, 0) + 1)) "
                           "div (n_g + n_langs)")
                    .cast("long").alias("w_x1000")))


def langid_score_frame(docs: DataFrame, weights: DataFrame) -> DataFrame:
    """Per-document prediction: (doc_id, n_grams, n_oov, pred_lang,
    score_x1000). score is the winning language's mean per-gram
    posterior (0..SCALE); n_grams counts trigram instances, n_oov those
    outside the trained vocabulary. Documents with no in-vocabulary
    gram produce no row (callers coalesce to 'und')."""
    g = _gram_frame(docs, with_label=False)
    j = g.join(F.broadcast(weights), "gram", "left")
    pl = j.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("w_x1000").cast("long").alias("sum_w"))
    w = Window.partitionBy("doc_id")
    pl = pl.select(
        "*",
        F.sum(F.when(F.col("lang").isNull(), F.col("n"))
              .otherwise(F.lit(0))).over(w).alias("n_oov"))
    rank = Window.partitionBy("doc_id") \
        .orderBy(F.col("sum_w").desc(), F.col("lang").asc())
    return (pl.where(F.col("lang").isNotNull())
            .withColumn("rn", F.row_number().over(rank))
            .where(F.col("rn") == 1)
            .select("doc_id",
                    (F.col("n") + F.col("n_oov")).cast("long")
                    .alias("n_grams"),
                    F.col("n_oov").cast("long"),
                    F.col("lang").alias("pred_lang"),
                    F.expr("sum_w div n").cast("long")
                    .alias("score_x1000")))


def q_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion rollup of the self-trained classifier against the
    corpus's own labels: (lang, pred_lang, n_docs). Unscorable docs
    (no in-vocab trigram) predict 'und'."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text", "lang")
    preds = langid_score_frame(d, train_langid_weights(d))
    return (d.join(preds.select("doc_id", "pred_lang"), "doc_id", "left")
            .groupBy("lang",
                     F.coalesce("pred_lang", F.lit("und"))
                     .alias("pred_lang"))
            .agg(F.count("*").cast("long").alias("n_docs")))


SQL_LANGID_EVAL = f"""
WITH d AS (
  SELECT doc_id, lang,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
  FROM documents
), g AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN s IS NULL OR length(s) < {GRAM_N}
                THEN []::VARCHAR[]
                ELSE [substr(s, CAST(i AS INTEGER), {GRAM_N})
                      for i in generate_series(1, length(s) - {GRAM_N - 1})]
                END) AS gram
  FROM d
), c AS (
  SELECT gram, lang, count(*)::BIGINT AS n_gl
  FROM g WHERE lang IS NOT NULL GROUP BY gram, lang
), v AS (
  SELECT gram, sum(n_gl)::BIGINT AS n_g
  FROM c GROUP BY gram ORDER BY sum(n_gl) DESC, gram LIMIT {VOCAB_K}
), l AS (
  SELECT DISTINCT lang FROM c
), nl AS (
  SELECT count(*)::BIGINT AS n_langs FROM l
), wt AS (
  SELECT v.gram, l.lang,
         ({SCALE} * (coalesce(c.n_gl, 0) + 1)) // (v.n_g + nl.n_langs)
           AS w_x1000
  FROM v CROSS JOIN l CROSS JOIN nl
  LEFT JOIN c ON c.gram = v.gram AND c.lang = l.lang
), pl AS (
  SELECT g.doc_id, wt.lang, sum(wt.w_x1000)::BIGINT AS sum_w
  FROM g LEFT JOIN wt ON g.gram = wt.gram
  GROUP BY g.doc_id, wt.lang
), p AS (
  SELECT doc_id, lang AS pred_lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY sum_w DESC, lang ASC) AS rn
  FROM pl WHERE lang IS NOT NULL
), pr AS (
  SELECT doc_id, pred_lang FROM p WHERE rn = 1
)
SELECT d.lang, coalesce(pr.pred_lang, 'und') AS pred_lang,
       count(*)::BIGINT AS n_docs
FROM d LEFT JOIN pr USING (doc_id)
GROUP BY d.lang, coalesce(pr.pred_lang, 'und')
"""


REGISTRY = {
    "text_langid_eval": (q_langid_eval, SQL_LANGID_EVAL),
}

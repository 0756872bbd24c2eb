"""Temperature-sampled mixture: epochs per corpus group, deterministic
per-document repeats.

The budget-mix operator (textstats.q_budget_mix) fills per-tier token
budgets by TRUNCATION — docs past the cutoff drop. The complementary
mixture discipline re-WEIGHTS groups: sample group i with probability
proportional to ``(n_tokens_i)^alpha`` (alpha < 1 flattens the natural
distribution — the multilingual/多-source upsampling recipe), which at
the data layer means each group is consumed for a fractional number of
EPOCHS — some groups repeat (upsample), some are subsampled below one
pass. This module computes that plan and realizes it per document,
RNG-free.

All arithmetic that crosses rows is integer, so the plan is bit-exact
across engines, partitionings, and retries:

* alpha is hard-wired to 0.5: ``sqrt`` is correctly rounded in IEEE 754
  (both JVM and DuckDB), so ``s_i = floor(sqrt(n_tokens_i) * 1000)`` is
  the same long on both engines — a general ``pow(x, alpha)`` is NOT
  correctly rounded and could flip a floor across engines;
* ``S = sum(s_i)`` is a long sum (associative — safe under any
  aggregation order); ``target_tokens_i = (BUDGET * s_i) div S``;
* ``epochs_x1000_i = min((target_tokens_i * 1000) div n_tokens_i,
  EPOCH_CAP_X1000)`` — the cap bounds upsampling of tiny groups (a
  50-token group must not repeat 10^6 times just because the formula
  says so);
* per doc: ``n_repeats = epochs_x1000 div 1000 + (hex4(md5(doc_id)) %
  1000 < epochs_x1000 % 1000)`` — the fractional epoch is a
  deterministic hash lottery (the q_sample_stratified_hash discipline),
  so realized tokens concentrate on the target with zero RNG state.

Scale shape: the doc grain NEVER shuffles — both passes over it are
scan-speed projections feeding partial-aggregated groupBys down to
group grain (~tiers × langs rows); the mixture plan itself is
broadcast-sized by construction and rejoins the docs as a broadcast
hash join. No windows, no doc-grain exchange, no Python.

Reference tie: the translation chunk LIMIT of the reference
(``usecase/translate_section_formula_id.py:56``) is a per-unit budget
constant; this is the corpus-curation generalization the brief's
training-pipeline axis asks for (data-mixture reweighting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import doc_lottery_col, doc_lottery_sql_duck
from .textstats import _SW_LIST  # noqa: F401  (tier SQL mirror below)
from .textstats import (QF_MAX_AVG_WLEN, QF_MAX_WORDS, QF_MIN_AVG_WLEN,
                        QF_MIN_STOPWORD_RATIO, QF_MIN_WORDS,
                        TIER_HI_MIN_WORDS, TIER_HI_STOP_PCT, _docs, _words,
                        tier_expr)

TEMP_BUDGET = 40_000          # token budget across the whole mixture
EPOCH_CAP_X1000 = 8_000       # ≤ 8 epochs of any one group
SQRT_SCALE = 1_000            # milli-units for the sqrt weight


def mixture_plan(stats: DataFrame,
                 budget: int = TEMP_BUDGET,
                 cap_x1000: int = EPOCH_CAP_X1000) -> DataFrame:
    """Group-grain mixture plan over any ``(*group_cols, n_docs,
    n_tokens)`` frame (``n_tokens > 0`` rows): adds ``target_tokens``
    and ``epochs_x1000``. The weight total comes from a single-partition
    window — legitimate ONLY because the frame is group-grain (a few
    dozen rows at any corpus scale; the same discipline as
    budget_select's per-tier offset frame), never doc-grain."""
    from pyspark.sql import Window
    s = stats.withColumn(
        "sw", F.floor(F.sqrt(F.col("n_tokens").cast("double"))
                      * SQRT_SCALE).cast("long"))
    return (s.withColumn("sw_total", F.sum("sw").over(Window.partitionBy()))
            .withColumn("target_tokens",
                        F.expr(f"(CAST({budget} AS BIGINT) * sw)"
                               " div sw_total"))
            .withColumn("epochs_x1000",
                        F.least(
                            F.expr("(target_tokens * 1000) div n_tokens"),
                            F.lit(cap_x1000).cast("long")))
            .drop("sw", "sw_total"))


def repeat_expr(epochs_col: str = "epochs_x1000",
                id_col: str = "doc_id"):
    """Per-document repeat count: whole epochs for everyone, the
    fractional epoch by deterministic hash lottery."""
    lottery = F.pmod(
        doc_lottery_col(id_col),
        F.lit(1000))
    return F.expr(f"{epochs_col} div 1000") + \
        F.when(lottery < F.pmod(F.col(epochs_col), F.lit(1000)), 1) \
         .otherwise(0)


def doc_repeats(docs: DataFrame, group_cols: tuple[str, ...],
                budget: int = TEMP_BUDGET,
                cap_x1000: int = EPOCH_CAP_X1000,
                checkpoint: bool = False) -> DataFrame:
    """Doc-grain realization: input ``(doc_id, *group_cols, n_tokens)``
    plus passthrough columns → the same rows with ``epochs_x1000`` and
    ``n_repeats``. ``checkpoint=True`` localCheckpoints the doc frame so
    the stats pass and the rejoin share one materialization (the
    budget_select discipline — Spark doesn't dedupe common subplans);
    the default keeps the registry form fully declarative."""
    base = docs.where(F.col("n_tokens") > 0)
    if checkpoint:
        base = base.localCheckpoint(eager=False)
    stats = (base.groupBy(*group_cols)
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum("n_tokens").cast("long").alias("n_tokens")))
    plan = mixture_plan(stats, budget, cap_x1000).select(
        *[F.col(c).alias(f"_p_{c}") for c in group_cols],
        "target_tokens", "epochs_x1000")
    # NULL-safe equi-join (a NULL lang is a legitimate mixture group on
    # real crawls — hostile-corpus regression); EqualNullSafe keys still
    # broadcast-hash, and every base group has a plan row by
    # construction, so the inner join loses nothing
    cond = None
    for c in group_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_p_{c}"))
        cond = eq if cond is None else (cond & eq)
    return (base.join(F.broadcast(plan), cond)
            .drop(*[f"_p_{c}" for c in group_cols])
            .withColumn("n_repeats", repeat_expr()))


def epoch_assignments(repeats: DataFrame) -> DataFrame:
    """Explode a doc_repeats frame to training-pass grain: one row per
    (doc, epoch_no in 0..n_repeats-1) — what the packer consumes when a
    mixture upsamples. Zero-repeat docs vanish (the subsampled tail);
    the explode is a zero-shuffle projection."""
    return (repeats.where(F.col("n_repeats") > 0)
            .withColumn("epoch_no", F.explode(
                F.sequence(F.lit(0).cast("long"),
                           F.col("n_repeats") - 1))))


def pack_base_from_epochs(repeats: DataFrame,
                          source_col: str = "source") -> DataFrame:
    """Mixture → packing bridge: explode a doc_repeats frame (which must
    carry ``source_col`` as a passthrough column) to training-pass grain
    and re-key each pass as its own packing item — ``doc_id#epoch_no``,
    the same composite-id discipline multimodal packing uses — so
    :func:`packing.pack_assignments` consumes the REWEIGHTED corpus
    directly: an upsampled document enters the token stream once per
    epoch (at a hash-distinct position each time, since the packing
    order hashes the item id), a subsampled-out one never enters. Pure
    projections on both sides of the explode; the plan's only shuffle
    stays packing's one window exchange."""
    return (epoch_assignments(repeats)
            .select(F.concat_ws("#", F.col("doc_id").cast("string"),
                                F.col("epoch_no")).alias("doc_id"),
                    F.col(source_col).alias("source"), "n_tokens"))


def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry over ``documents``: mixture groups are (tier, lang)
    with the low tier excluded (quality gate first, mixture second);
    output is the group-grain plan with its REALIZED token mass —
    ``realized_tokens = Σ n_tokens · n_repeats`` — so the oracle checks
    the per-doc lottery through the aggregate, not just the plan
    formula. Columns: (tier, lang, n_docs, n_tokens, target_tokens,
    epochs_x1000, realized_tokens)."""
    d = _docs(spark, sf_dir).withColumn("w", _words())
    base = d.select(
        "doc_id", "lang", tier_expr().alias("tier"),
        F.coalesce(F.size("w"), F.lit(0)).cast("long").alias("n_tokens")) \
        .where(F.col("tier") != "low")
    rep = doc_repeats(base, ("tier", "lang"))
    return (rep.groupBy("tier", "lang")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.max("target_tokens").alias("target_tokens"),
                 F.max("epochs_x1000").alias("epochs_x1000"),
                 F.sum(F.col("n_tokens") * F.col("n_repeats"))
                 .cast("long").alias("realized_tokens")))


_LOTTERY = doc_lottery_sql_duck() + " % 1000"

SQL_MIXTURE_EPOCHS = f"""
WITH d AS (
  SELECT doc_id, lang, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), sig AS (
  SELECT doc_id, lang, len(w) AS n_words,
         length(text) * 10 / greatest(len(w), 1) AS avg_wlen_x10,
         len(list_filter(w, x -> lower(x) IN ({_SW_LIST}))) AS n_stop
  FROM d
), t AS (
  SELECT doc_id, lang, coalesce(n_words, 0)::BIGINT AS n_tokens,
         CASE WHEN coalesce(
                n_words < {QF_MIN_WORDS} OR n_words > {QF_MAX_WORDS}
                OR avg_wlen_x10 < {QF_MIN_AVG_WLEN * 10}
                OR avg_wlen_x10 > {QF_MAX_AVG_WLEN * 10}
                OR n_stop * 100 < n_words * {int(QF_MIN_STOPWORD_RATIO * 100)},
                true)
              THEN 'low'
              WHEN n_words >= {TIER_HI_MIN_WORDS}
                   AND n_stop * 100 >= n_words * {TIER_HI_STOP_PCT}
              THEN 'high' ELSE 'mid' END AS tier
  FROM sig
), base AS (
  SELECT * FROM t WHERE tier <> 'low' AND n_tokens > 0
), stats AS (
  SELECT tier, lang, count(*)::BIGINT AS n_docs,
         sum(n_tokens)::BIGINT AS n_tokens,
         CAST(floor(sqrt(CAST(sum(n_tokens) AS DOUBLE)) * {SQRT_SCALE})
              AS BIGINT) AS s
  FROM base GROUP BY tier, lang
), plan AS (
  SELECT tier, lang, n_docs, n_tokens,
         CAST(({TEMP_BUDGET}::BIGINT * s)
              // (SELECT sum(s) FROM stats) AS BIGINT) AS target_tokens,
         CAST(least((({TEMP_BUDGET}::BIGINT * s)
                     // (SELECT sum(s) FROM stats) * 1000) // n_tokens,
                    {EPOCH_CAP_X1000}) AS BIGINT) AS epochs_x1000
  FROM stats
), rep AS (
  SELECT b.tier, b.lang, b.n_tokens,
         p.epochs_x1000 // 1000
           + CASE WHEN {_LOTTERY} < p.epochs_x1000 % 1000
                  THEN 1 ELSE 0 END AS n_repeats
  FROM base b JOIN plan p
    ON b.tier = p.tier AND b.lang IS NOT DISTINCT FROM p.lang
)
SELECT p.tier, p.lang, p.n_docs, p.n_tokens,
       p.target_tokens, p.epochs_x1000,
       (SELECT CAST(coalesce(sum(r.n_tokens * r.n_repeats), 0) AS BIGINT)
        FROM rep r WHERE r.tier = p.tier AND r.lang IS NOT DISTINCT FROM p.lang)
         AS realized_tokens
FROM plan p
"""


REGISTRY = {
    "curate_mixture_epochs": (q_mixture_epochs, SQL_MIXTURE_EPOCHS),
}

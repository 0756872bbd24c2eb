"""DSIR data selection: hashed n-gram importance resampling, in-engine.

The LLM-corpus curation step this suite still lacked: given a TARGET
domain (here: the English slice, ``lang = 'en'`` — stand-in for
"looks like Wikipedia") pick the raw-web documents whose hashed-n-gram
distribution best matches it. The recipe is DSIR (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS): featurize every document as hashed uni+bi-gram counts, fit
bag-of-ngrams models on the target slice and on the raw corpus, weight
each document by its log importance ratio, and resample top-k under
Gumbel noise (Gumbel-top-k == sampling without replacement ∝ weight).

Determinism is the house rule, and DSIR's two transcendental steps
(log-probabilities, Gumbel noise) would normally break it — libm's
``ln`` is not bit-contracted across engines. Both are replaced by a
FIXED-POINT BINARY LOGARITHM computed with integer arithmetic only
(``log2fix``): normalize n to a 31-bit mantissa, then the classic
repeated-squaring digit recurrence — square the mantissa, emit one
fraction bit per `>= 2` test, rescale by an integer shift — unrolled
``LOG_BITS`` times. Every intermediate is a BIGINT; truncation is part
of the spec, so Spark and DuckDB produce the SAME integer for every
input, and the whole operator (weights, scores, Gumbel keys, the
selected set) is bit-identical across partitionings, retries, and
engines. Division only ever sees non-negative operands (Spark ``div``
truncates toward zero, DuckDB ``//`` floors — they agree only there;
one documented offset keeps the Gumbel step positive).

Numbers are in "millibits": value ≈ round(1024 * log2(x)). The Gumbel
key reuses the portable 16-bit md5 (functions/hashing) as the uniform:
u = (h+1)/65537 ∈ (0,1), g = −ln(−ln u) via two nested ``log2fix``
calls — noise quality needs ~10 bits, determinism needs exactness,
and this has both.

Shape (the 100-TB plan): one gram explode → groupBy(doc_id, bucket)
with map-side partial aggregation soaking the explode — gram STRINGS
hash to integer buckets before the exchange, so document text never
shuffles. The model is two ≤``DSIR_DIM``-row bucket rollups (+ 1-row
totals via the broadcast-crossJoin convention) joined into a log-ratio
table that BROADCASTS back onto the doc-bucket frame; scoring is one
groupBy(doc_id). Gumbel + selection key are a zero-exchange projection;
the final top-k is TakeOrdered, never a global sort. Docs with no token
stream produce no row (the langid/model_score convention).

Reference tie: the reference hard-codes its corpus (whatever PDFs the
RPC adapters are pointed at, e.g. ``azure_ocr_repository.py``); at
10^12 crawled docs the corpus must instead be CHOSEN, and DSIR is the
published recipe for choosing it against a target domain.

Gate: full DuckDB twin (same integer log2, same hash arithmetic) via
the hostile gate + tools/parity_check.py; tests/test_dsir.py pins the
log2fix recurrence against a pure-Python twin (hypothesis fuzz),
plants a separable corpus (target-vocabulary docs must outrank
off-domain docs), and checks partitioning invariance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import hex4_sql_duck, hex4_sql_spark

DSIR_DIM = 1024        # hashed n-gram buckets
LOG_BITS = 10          # fraction bits of the fixed-point log2 (scale 1024)
LOG_SCALE = 1 << LOG_BITS
LN2_FIX = 710          # round(ln 2 * 1024): millibits → milli-nats
GUMBEL_OFFSET = 64 * LOG_SCALE   # keeps the final Gumbel div non-negative
DSIR_TOP_K = 50        # registry query's selection budget (a parameter)


# --------------------------------------------------------------------------
# fixed-point binary log, dual-dialect
# --------------------------------------------------------------------------

def log2fix_py(n: int, bits: int = LOG_BITS) -> int:
    """Pure-Python twin of the SQL recurrence (the test oracle).

    floor-with-truncation approximation of ``2**bits * log2(n)`` for
    n >= 1; every step mirrors the SQL exactly (31-bit mantissa,
    truncating shifts)."""
    if n < 1:
        raise ValueError("log2fix needs n >= 1")
    e = n.bit_length() - 1
    p = n << (30 - e) if e <= 30 else n >> (e - 30)
    frac = 0
    for _ in range(bits):
        q = p * p
        frac <<= 1
        if q >= 1 << 61:
            frac |= 1
            p = q >> 31
        else:
            p = q >> 30
    return e * (1 << bits) + frac


def log2fix_levels(col: str, out: str, dialect: str, carry: list[str],
                   bits: int = LOG_BITS) -> list[list[str]]:
    """The recurrence as CONSTANT-WIDTH projection levels: each level is
    an explicit select list referencing only the level below it (running
    accumulator, numbered scratch names — no lateral aliases, no
    ``SELECT *``). Both engines choke on the naive forms: 140 stacked
    ``SELECT *`` levels exhaust DuckDB's parser, and a single SELECT of
    mutually-referencing lateral aliases inlines ``p*p`` exponentially.
    Width stays ``len(carry) + 3``, depth ``bits + 4``.

    ``col`` must be a BIGINT expression >= 1; ``carry`` columns ride
    through unchanged; the last level emits ``carry + [out]``."""
    if dialect == "spark":
        def shr(x, k):
            return f"shiftright({x}, {k})"
        shl = "shiftleft({x}, {k})"
    else:
        def shr(x, k):
            return f"(({x}) >> ({k}))"
        shl = "(({x}) << ({k}))"

    x, e = f"{out}_x", f"{out}_e"
    levels = [
        carry + [f"cast({col} as bigint) AS {x}"],
        carry + [x, f"cast(length(bin({x})) - 1 as int) AS {e}"],
        carry + [
            e,
            (f"CASE WHEN {e} <= 30 THEN {shl.format(x=x, k=f'30 - {e}')} "
             f"ELSE {shr(x, f'{e} - 30')} END AS {out}_p0"),
            f"cast(0 as bigint) AS {out}_a0",
        ],
    ]
    for i in range(1, bits + 1):
        p, q = f"{out}_p{i - 1}", f"{out}_p{i - 1} * {out}_p{i - 1}"
        levels.append(carry + [
            e,
            (f"CASE WHEN {q} >= {1 << 61} THEN {shr(f'({q})', 31)}"
             f" ELSE {shr(f'({q})', 30)} END AS {out}_p{i}"),
            (f"{out}_a{i - 1} * 2 + CASE WHEN {q} >= {1 << 61}"
             f" THEN 1 ELSE 0 END AS {out}_a{i}"),
        ])
        _ = p
    levels.append(carry + [f"{e} * {1 << bits} + {out}_a{bits} AS {out}"])
    return levels


def _apply_spark(df: DataFrame, levels: list[list[str]]) -> DataFrame:
    for sel in levels:
        df = df.selectExpr(*sel)
    return df


def _apply_duck(base_sql: str, levels: list[list[str]]) -> str:
    sql = base_sql
    for sel in levels:
        sql = f"SELECT {', '.join(sel)} FROM ({sql})"
    return sql


# --------------------------------------------------------------------------
# hashed n-gram featurization
# --------------------------------------------------------------------------

def bucket_counts(docs: DataFrame, dim: int = DSIR_DIM) -> DataFrame:
    """(doc_id, lang, bucket, c): hashed uni+bi-gram occurrence counts.

    Gram strings become integer buckets BEFORE the exchange; the
    groupBy's map-side partial aggregation soaks the explode."""
    words = ("CASE WHEN length(trim(text)) = 0 THEN array()"
             " ELSE split(lower(trim(text)), '\\\\s+') END")
    bigrams = (f"CASE WHEN size({words}) < 2 THEN array()"
               f" ELSE zip_with(slice({words}, 1, size({words}) - 1),"
               f" slice({words}, 2, size({words}) - 1),"
               " (a, b) -> concat(a, ' ', b)) END")
    grams = f"concat({words}, {bigrams})"
    g = docs.selectExpr("doc_id", "lang", f"explode({grams}) AS gram")
    bucket = hex4_sql_spark("md5(cast(concat('d|', gram) as binary))")
    return (g.selectExpr("doc_id", "lang", f"{bucket} % {dim} AS bucket")
            .groupBy("doc_id", "lang", "bucket")
            .agg(F.count("*").cast("long").alias("c")))


def dsir_logratio(bc: DataFrame, target_lang: str = "en",
                  dim: int = DSIR_DIM) -> DataFrame:
    """(bucket, lr): per-bucket fixed-point log importance ratio
    (millibits), add-one smoothed::

        lr[b] = [log2fix(ct_b+1) - log2fix(Tt+dim)]
              - [log2fix(cr_b+1) - log2fix(Tr+dim)]

    Model-sized (<= dim rows + a 1-row totals crossJoin) — broadcast it."""
    raw = bc.groupBy("bucket").agg(F.sum("c").alias("cr"))
    tgt = (bc.where(F.col("lang") == target_lang)
           .groupBy("bucket").agg(F.sum("c").alias("ct")))
    per = raw.join(tgt, "bucket", "left") \
        .selectExpr("bucket", "cr", "coalesce(ct, 0L) AS ct")
    totals = per.agg(
        (F.sum("ct") + dim).alias("tt"), (F.sum("cr") + dim).alias("tr"))
    j = per.crossJoin(F.broadcast(totals))
    carry = ["bucket", "cr", "ct", "tt", "tr"]
    for col, out in (("(ct + 1)", "l_ct"), ("(cr + 1)", "l_cr"),
                     ("tt", "l_tt"), ("tr", "l_tr")):
        j = _apply_spark(j, log2fix_levels(col, out, "spark", carry))
        carry = carry + [out]
    return j.selectExpr(
        "bucket", "(l_ct - l_tt) - (l_cr - l_tr) AS lr")


def dsir_scores(bc: DataFrame, lr: DataFrame) -> DataFrame:
    """(doc_id, logw): fixed-point log importance weight per document —
    one broadcast join + one groupBy(doc_id). ``logw`` is millibits of
    log2 w(x); any bucket a document touches exists in ``lr`` (raw
    counts dominate), so the join is inner by construction."""
    return (bc.join(F.broadcast(lr), "bucket")
            .groupBy("doc_id")
            .agg(F.sum(F.col("c") * F.col("lr")).cast("long").alias("logw")))


def dsir_gumbel_key(scores: DataFrame) -> DataFrame:
    """(doc_id, logw, key): selection key = logw + Gumbel(doc_id), all
    integer (milli-nats folded into millibits — a monotone mix is all
    top-k needs). u = (h+1)/65537 from the portable 16-bit md5;
    −ln u and −ln(−ln u) via nested log2fix; the one subtraction that
    can go negative is shifted by ``GUMBEL_OFFSET`` before its div so
    both engines' integer division agree (non-negative operands)."""
    h = hex4_sql_spark("md5(cast(concat('g|', cast(doc_id as string))"
                       " as binary))")
    d = scores.selectExpr(
        "doc_id", "logw",
        f"cast({65537 * LOG_SCALE} div ({h} + 1) as bigint) AS rfix")
    d = _apply_spark(d, log2fix_levels("rfix", "l_r", "spark",
                                       ["doc_id", "logw"]))
    d = d.selectExpr(
        "doc_id", "logw",
        f"greatest(l_r - {16 * LOG_SCALE}, 1L) AS lu")          # −log2 u
    d = d.selectExpr(
        "doc_id", "logw",
        f"greatest((lu * {LN2_FIX}) div {LOG_SCALE}, 1L) AS nl")  # −ln u
    d = _apply_spark(d, log2fix_levels("nl", "l_nl", "spark",
                                       ["doc_id", "logw"]))
    d = d.selectExpr(
        "doc_id", "logw",
        f"((({LOG_BITS * LOG_SCALE} - l_nl) + {GUMBEL_OFFSET})"
        f" * {LN2_FIX}) div {LOG_SCALE}"
        f" - {(GUMBEL_OFFSET * LN2_FIX) // LOG_SCALE} AS gumbel")
    return d.selectExpr("doc_id", "logw", "logw + gumbel AS key")


def dsir_select(docs: DataFrame, target_lang: str = "en",
                k: int = DSIR_TOP_K, dim: int = DSIR_DIM,
                checkpoint: bool = False) -> DataFrame:
    """Top-k DSIR selection (Gumbel-top-k == sample-without-replacement
    ∝ importance weight). TakeOrdered, never a global sort.

    ``checkpoint=True`` localCheckpoints the doc-bucket frame so the
    model branches (raw/target rollups) and the scoring branch share ONE
    gram explode (the mixture/budget_select convention); the registry
    form stays declarative and re-derives."""
    bc = bucket_counts(docs, dim)
    if checkpoint:
        bc = bc.localCheckpoint()
    lr = dsir_logratio(bc, target_lang, dim)
    keyed = dsir_gumbel_key(dsir_scores(bc, lr))
    return (keyed.orderBy(F.col("key").desc(), F.col("doc_id"))
            .limit(k)
            .select("doc_id", "logw", "key"))


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "text")
    return dsir_select(d)


# --------------------------------------------------------------------------
# DuckDB twin
# --------------------------------------------------------------------------

def _sql_log2fix_duck(base: str, pairs: list[tuple[str, str]],
                      carry: list[str]) -> str:
    sql = base
    cols = list(carry)
    for col, out in pairs:
        sql = _apply_duck(sql, log2fix_levels(col, out, "duck", cols))
        cols = cols + [out]
    return sql


def _sql_dsir_select(target_lang: str = "en", k: int = DSIR_TOP_K,
                     dim: int = DSIR_DIM) -> str:
    bucket = hex4_sql_duck("md5('d|' || gram)")
    h = hex4_sql_duck("md5('g|' || CAST(doc_id AS VARCHAR))")
    lr_base = f"""
WITH dw AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS w
  FROM documents
), grams AS (
  SELECT doc_id, lang, u.gram
  FROM dw, unnest(list_concat(w,
       list_transform(w[:len(w) - 1], (x, i) -> x || ' ' || w[i + 1])))
       AS u(gram)
), bc AS (
  SELECT doc_id, lang, ({bucket}) % {dim} AS bucket, count(*)::BIGINT AS c
  FROM grams GROUP BY doc_id, lang, bucket
), raw AS (SELECT bucket, sum(c)::BIGINT AS cr FROM bc GROUP BY bucket),
tgt AS (SELECT bucket, sum(c)::BIGINT AS ct FROM bc
        WHERE lang = '{target_lang}' GROUP BY bucket),
per AS (
  SELECT raw.bucket, raw.cr, coalesce(tgt.ct, 0)::BIGINT AS ct
  FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket
), tot AS (
  SELECT (sum(ct) + {dim})::BIGINT AS tt, (sum(cr) + {dim})::BIGINT AS tr
  FROM per
)
SELECT per.*, tot.tt, tot.tr FROM per, tot"""
    lr_sql = _sql_log2fix_duck(
        lr_base, [("(ct + 1)", "l_ct"), ("(cr + 1)", "l_cr"),
                  ("tt", "l_tt"), ("tr", "l_tr")],
        carry=["bucket", "cr", "ct", "tt", "tr"])
    score_base = f"""
WITH dw AS (
  SELECT doc_id, lang,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(lower(trim(text)), '\\s+') END AS w
  FROM documents
), grams AS (
  SELECT doc_id, lang, u.gram
  FROM dw, unnest(list_concat(w,
       list_transform(w[:len(w) - 1], (x, i) -> x || ' ' || w[i + 1])))
       AS u(gram)
), bc AS (
  SELECT doc_id, lang, ({bucket}) % {dim} AS bucket, count(*)::BIGINT AS c
  FROM grams GROUP BY doc_id, lang, bucket
), lrt AS (
  SELECT bucket, (l_ct - l_tt) - (l_cr - l_tr) AS lr FROM ({lr_sql})
), sc AS (
  SELECT bc.doc_id, sum(bc.c * lrt.lr)::BIGINT AS logw
  FROM bc JOIN lrt ON bc.bucket = lrt.bucket
  GROUP BY bc.doc_id
)
SELECT doc_id, logw,
       (({65537 * LOG_SCALE}) // (({h}) + 1))::BIGINT AS rfix
FROM sc"""
    keyed = _apply_duck(score_base.strip(),
                        log2fix_levels("rfix", "l_r", "duck",
                                       ["doc_id", "logw"]))
    keyed = (f"SELECT doc_id, logw,"
             f" greatest(l_r - {16 * LOG_SCALE}, 1)::BIGINT AS lu"
             f" FROM ({keyed})")
    keyed = (f"SELECT doc_id, logw,"
             f" greatest((lu * {LN2_FIX}) // {LOG_SCALE}, 1)::BIGINT"
             f" AS nl FROM ({keyed})")
    keyed = _apply_duck(keyed, log2fix_levels("nl", "l_nl", "duck",
                                              ["doc_id", "logw"]))
    keyed = (
        f"SELECT doc_id, logw,"
        f" ((({LOG_BITS * LOG_SCALE} - l_nl) + {GUMBEL_OFFSET})"
        f" * {LN2_FIX}) // {LOG_SCALE}"
        f" - {(GUMBEL_OFFSET * LN2_FIX) // LOG_SCALE} AS gumbel"
        f" FROM ({keyed})")
    return (f"SELECT doc_id, logw, logw + gumbel AS key FROM ({keyed})"
            f" ORDER BY key DESC, doc_id LIMIT {k}")


SQL_DSIR_SELECT = _sql_dsir_select()

# millibit log2 of the smoothing constant sanity pin (import-time cheap)
assert log2fix_py(1) == 0 and log2fix_py(2) == LOG_SCALE
assert abs(log2fix_py(3) / LOG_SCALE - math.log2(3)) < 0.002

REGISTRY = {
    "text_dsir_select": (q_dsir_select, SQL_DSIR_SELECT),
}

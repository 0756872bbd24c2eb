"""Corpus datacard — the one-pass datasheet rollup every published
web-scale corpus ships (C4's paper tables, Dolma's data sheet,
RefinedWeb/FineWeb's dataset cards): how many documents, hosts, tokens
and characters, and how they distribute over language and over
document-length decades.

One operator, three grains, ONE scan: the per-document frame reduces to
a narrow (lang, host, n_tokens, n_chars, len_digits) projection —
document text is dropped before any exchange — and a single
GROUPING SETS aggregation ``((), (lang), (len_digits))`` produces the
corpus-total row, the per-language rows and the length-histogram rows
together. ``len_digits`` (the decimal-digit count of the token count)
is the order-of-magnitude length histogram: bucket boundaries are exact
integer string lengths, so both engines agree without any float log.

Output rows ``(dim, value, n_docs, n_hosts, n_tokens, n_chars)``:

* ``dim='total', value=''`` — corpus totals (1 row);
* ``dim='lang', value=<lang>`` — per-language accounting (NULL lang
  reads ``'und'``, the langid convention);
* ``dim='len_digits', value=<1..>`` — docs with a d-digit token count
  (1 = 0-9 tokens, 2 = 10-99, ... — the survival curve curation gates
  act on).

Scale shape: the narrow projection is scan-speed; GROUPING SETS is one
Expand (×3 on ~50 B rows, never text) feeding a partial-aggregated
groupBy — the distinct-host count adds the standard two-phase distinct
aggregate, still join-free. At 10^12 documents the result is
|langs| + ~12 + 1 rows: the classic "reduce everything in one pass,
ship kilobytes" report. Reference tie: generalizes the run-level usage
counters of ``report_usage`` (SURVEY A6/A7, ``main.py:117-131``) from
one extraction run's counters to the corpus-curation datasheet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import _docs, _words


def corpus_datacard(docs: DataFrame, lang_col: str = "lang",
                    host_col: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Datasheet rollup of any (text, lang, host) document frame —
    rows ``(dim, value, n_docs, n_hosts, n_tokens, n_chars)``."""
    w = _words(text_col)
    d = docs.select(
        F.coalesce(F.col(lang_col), F.lit("und")).alias("lang_c"),
        F.coalesce(F.col(host_col), F.lit("")).alias("host"),
        F.coalesce(F.size(w), F.lit(0)).cast("long").alias("nt"),
        F.coalesce(F.length(F.col(text_col)), F.lit(0)).cast("long")
        .alias("nc"))
    d = d.withColumn("len_digits",
                     F.length(F.col("nt").cast("string")).cast("int"))
    g = (d.groupingSets([[], ["lang_c"], ["len_digits"]],
                        "lang_c", "len_digits")
         .agg(F.grouping("lang_c").cast("int").alias("g_lang"),
              F.grouping("len_digits").cast("int").alias("g_len"),
              F.count(F.lit(1)).cast("long").alias("n_docs"),
              F.countDistinct("host").cast("long").alias("n_hosts"),
              F.sum("nt").cast("long").alias("n_tokens"),
              F.sum("nc").cast("long").alias("n_chars")))
    total = (F.col("g_lang") == 1) & (F.col("g_len") == 1)
    return g.select(
        F.when(total, F.lit("total"))
        .when(F.col("g_lang") == 0, F.lit("lang"))
        .otherwise(F.lit("len_digits")).alias("dim"),
        F.when(total, F.lit(""))
        .when(F.col("g_lang") == 0, F.col("lang_c"))
        .otherwise(F.col("len_digits").cast("string")).alias("value"),
        "n_docs", "n_hosts", "n_tokens", "n_chars")


def q_text_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the datacard of the ``documents`` table."""
    return corpus_datacard(_docs(spark, sf_dir))


SQL_TEXT_DATACARD = """
WITH d AS (
  SELECT coalesce(lang, 'und') AS lang_c,
         coalesce(source, '') AS host,
         coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+'))
                  END, 0) AS nt,
         coalesce(length(text), 0) AS nc
  FROM documents
), b AS (
  SELECT lang_c, host, nt, nc,
         CAST(length(CAST(nt AS VARCHAR)) AS INTEGER) AS len_digits
  FROM d
), g AS (
  SELECT GROUPING(lang_c) AS g_lang, GROUPING(len_digits) AS g_len,
         lang_c, len_digits,
         count(*)::BIGINT AS n_docs,
         count(DISTINCT host)::BIGINT AS n_hosts,
         CAST(sum(nt) AS BIGINT) AS n_tokens,
         CAST(sum(nc) AS BIGINT) AS n_chars
  FROM b GROUP BY GROUPING SETS ((), (lang_c), (len_digits))
)
SELECT CASE WHEN g_lang = 1 AND g_len = 1 THEN 'total'
            WHEN g_lang = 0 THEN 'lang'
            ELSE 'len_digits' END AS dim,
       CASE WHEN g_lang = 1 AND g_len = 1 THEN ''
            WHEN g_lang = 0 THEN lang_c
            ELSE CAST(len_digits AS VARCHAR) END AS value,
       n_docs, n_hosts, n_tokens, n_chars
FROM g
"""


EX_K = 3          # exemplars per datasheet group
EX_BUCKETS = 64   # top-k window decomposition (no single-reducer group)


def datacard_exemplars(docs: DataFrame, k: int = EX_K,
                       lang_col: str = "lang",
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Deterministic exemplar documents per datasheet group — the
    "examples" column every published dataset card carries (C4/Dolma/
    FineWeb cards all quote sample documents per slice). For each
    :func:`corpus_datacard` group (the corpus total, each language,
    each token-length decade) emit the ``k`` documents that win the
    portable hash lottery: ascending ``(hex4(md5(doc_id)), doc_id)`` —
    RNG-free, bit-stable across engines, partitionings and retries,
    and a fresh crawl snapshot re-elects mostly the same exemplars.
    (Complementary to textstats.q_sample_stratified_hash, which THINS
    a corpus by per-stratum rate: this picks EXACTLY k per card group
    however small or large the group.)

    Scale shape (the reason this isn't one window per group):

    * the lottery rides a NARROW ``(dim, value, hk, doc_id, nt)``
      frame — text/preview never enter the window shuffles, and the
      token count computed here is CARRIED through the winners (the
      enrich side reads only the preview substring, so the corpus is
      tokenized exactly once);
    * top-k is exact and two-phase: per ``(group, hk % EX_BUCKETS)``
      bucket window first (every bucket holds ~1/64 of the group, so
      the corpus-sized 'total' group never lands on one reducer),
      then a second window over the <= 64 k surviving rows per group;
    * the winners (<= 3 dims x k per group) BROADCAST back onto a
      ``(doc_id, n_tokens, preview)`` projection of the corpus —
      the corpus streams map-side through that join, zero text shuffle.

    Rows: ``(dim, value, rank, doc_id, n_tokens, preview)`` with
    ``preview = substr(text, 1, 160)``; kilobytes out at any scale.
    """
    from pyspark.sql import Window

    from .hashing import doc_lottery_col
    w = _words(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(F.col(lang_col), F.lit("und")).alias("lang_c"),
        F.coalesce(F.size(w), F.lit(0)).cast("long").alias("nt"))
    d = (d.withColumn("len_digits",
                      F.length(F.col("nt").cast("string")).cast("int"))
         .withColumn("hk", doc_lottery_col()))
    dims = F.expr(
        "array(named_struct('dim', 'total', 'value', ''), "
        "named_struct('dim', 'lang', 'value', lang_c), "
        "named_struct('dim', 'len_digits', 'value', "
        "cast(len_digits as string)))")
    e = (d.select("doc_id", "hk", "nt", F.explode(dims).alias("dv"))
         .select(F.col("dv.dim").alias("dim"),
                 F.col("dv.value").alias("value"), "doc_id", "hk",
                 "nt"))
    w1 = (Window.partitionBy("dim", "value", F.col("hk") % EX_BUCKETS)
          .orderBy("hk", "doc_id"))
    w2 = Window.partitionBy("dim", "value").orderBy("hk", "doc_id")
    winners = (e.withColumn("rn", F.row_number().over(w1))
               .where(F.col("rn") <= k).drop("rn")
               .withColumn("rank", F.row_number().over(w2))
               .where(F.col("rank") <= k)
               .withColumnRenamed("nt", "n_tokens"))
    enrich = docs.select(
        F.col(id_col).alias("doc_id"),
        F.substring(F.col(text_col), 1, 160).alias("preview"))
    return (enrich.join(F.broadcast(winners), "doc_id")
            .select("dim", "value", F.col("rank").cast("int").alias("rank"),
                    "doc_id", "n_tokens", "preview"))


def q_text_datacard_exemplars(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Driver entry: exemplar documents per datacard group."""
    return datacard_exemplars(_docs(spark, sf_dir))


def _sql_exemplars() -> str:
    from .hashing import doc_lottery_sql_duck
    hk = doc_lottery_sql_duck()
    return f"""
WITH d AS (
  SELECT doc_id,
         coalesce(lang, 'und') AS lang_c,
         coalesce(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\\s+'))
                  END, 0)::BIGINT AS nt,
         substr(text, 1, 160) AS preview
  FROM documents
), b AS (
  SELECT doc_id, lang_c, nt, preview,
         CAST(length(CAST(nt AS VARCHAR)) AS INTEGER) AS len_digits,
         {hk} AS hk
  FROM d
), e AS (
  SELECT 'total' AS dim, '' AS value, doc_id, nt, preview, hk FROM b
  UNION ALL
  SELECT 'lang', lang_c, doc_id, nt, preview, hk FROM b
  UNION ALL
  SELECT 'len_digits', CAST(len_digits AS VARCHAR), doc_id, nt,
         preview, hk FROM b
), r AS (
  SELECT dim, value, doc_id, nt AS n_tokens, preview,
         row_number() OVER (PARTITION BY dim, value
                            ORDER BY hk, doc_id) AS rank
  FROM e
)
SELECT dim, value, CAST(rank AS INTEGER) AS rank, doc_id, n_tokens,
       preview
FROM r WHERE rank <= {EX_K}
"""


SQL_TEXT_DATACARD_EXEMPLARS = _sql_exemplars()


REGISTRY = {
    "text_datacard": (q_text_datacard, SQL_TEXT_DATACARD),
    "text_datacard_exemplars": (q_text_datacard_exemplars,
                                SQL_TEXT_DATACARD_EXEMPLARS),
}

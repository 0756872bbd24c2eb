"""Host-level reputation: per-host quality rollup and crawl blocklist.

The RefinedWeb/C4-style host curation step: crawl-host skew means a
handful of hosts contribute a disproportionate share of documents, and
host-level quality is strongly autocorrelated — a host whose sampled
documents overwhelmingly fail the gates should be skipped at the NEXT
crawl snapshot's scan, before extraction spends anything on it. Both
halves are pure relational shapes:

* ROLLUP — one partial-aggregated groupBy over the host (or ``source``)
  key: document counts, gate-pass counts, distinct-text counts (the
  within-host exact-dup signal, hashed so full text never rides the
  aggregation), and the integer keep rate::

      kept_rate_x1000 = (1000 * n_kept) div n_docs
      blocked = n_docs >= HOST_MIN_DOCS and kept_rate_x1000 < HOST_KEEP_FLOOR

  The evidence floor keeps a 1-document host from being condemned by
  its only sample. Integer floor division — the verdict is
  bit-identical across partitionings and engines. The output is
  host-grain: broadcast-sized at any corpus scale (10^12 docs is ~10^7
  hosts), which is what makes the enforcement join free.

* ENFORCE — :func:`apply_host_blocklist`: one broadcast LEFT ANTI join
  of the pages table against the blocked-host frame. The pages side
  never shuffles; at the next snapshot this runs BEFORE extraction, so
  blocked hosts cost one hash probe per row, not a parse.

The curation-chain form (:func:`host_stats_from_audit`) rolls up the
audit's existing per-stage verdicts instead of re-deriving the gate, so
its counters provably sum to ``curate.stage_counters``'s globals.

Reference tie: the per-batch usage counters of ``sinks.py`` (SURVEY
A6/A7) generalized from run-grain to host-grain with a feedback
decision attached.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import _docs, quality_label_frame, sql_quality_label_expr

HOST_MIN_DOCS = 5            # evidence floor before a host can block
HOST_KEEP_FLOOR_X1000 = 200  # block below a 20% gate-pass rate


def host_reputation_frame(docs: DataFrame,
                          host_col: str = "source") -> DataFrame:
    """(host, n_docs, n_kept, n_unique_texts, kept_rate_x1000, blocked)
    over any (doc_id, text, <host_col>) frame — the Gopher gate and the
    rollup share ONE scan (quality_label_frame carries the host key
    through its projection). Text is md5-hashed before the distinct
    count so the aggregation shuffles 16-byte digests, never documents;
    NULL text hashes to NULL and is excluded from the distinct on both
    engines."""
    lab = quality_label_frame(docs, extra_cols=(host_col, "text"))
    rate = F.expr("(1000 * n_kept) div n_docs")
    return (lab.groupBy(F.col(host_col).alias("host"))
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("label").cast("long").alias("n_kept"),
                 F.countDistinct(F.md5(F.col("text").cast("binary")))
                 .cast("long").alias("n_unique_texts"))
            .select("host", "n_docs", "n_kept", "n_unique_texts",
                    rate.cast("long").alias("kept_rate_x1000"),
                    ((F.col("n_docs") >= HOST_MIN_DOCS)
                     & (rate < HOST_KEEP_FLOOR_X1000)).alias("blocked")))


def host_stats_from_audit(audit: DataFrame) -> DataFrame:
    """Host rollup of the curation audit's per-stage verdicts:
    (url_host, n_docs, n_kept, dropped_quality, dropped_duplicate,
    dropped_contaminated, kept_rate_x1000, blocked). Drop-stage
    conditions mirror curate.stage_counters exactly, so summing any
    column across hosts reproduces the global counter."""
    from ..pipeline import with_host
    rate = F.expr("(1000 * n_kept) div n_docs")

    def n(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(name)

    return (with_host(audit).groupBy("url_host")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 n(F.col("kept"), "n_kept"),
                 n(~F.col("quality_keep"), "dropped_quality"),
                 n(F.col("quality_keep") & ~F.col("dup_keep"),
                   "dropped_duplicate"),
                 n(F.col("quality_keep") & F.col("dup_keep")
                   & F.col("contaminated"), "dropped_contaminated"))
            .select("*", rate.cast("long").alias("kept_rate_x1000"),
                    ((F.col("n_docs") >= HOST_MIN_DOCS)
                     & (rate < HOST_KEEP_FLOOR_X1000)).alias("blocked")))


def apply_host_blocklist(pages: DataFrame, host_stats: DataFrame,
                         host_col: str = "url_host") -> DataFrame:
    """Drop every page whose host is blocked: one broadcast LEFT ANTI
    join — the pages side never shuffles, the blocklist is host-grain
    (broadcast-sized by construction). Run ahead of extraction on the
    next crawl snapshot. A pages frame that already carries ``url_host``
    keeps its own column (joined on as-is, schema untouched); only a
    url-only frame gets the derived key, which is dropped again."""
    from ..pipeline import with_host
    blocked = host_stats.where("blocked") \
        .select(F.col("host" if "host" in host_stats.columns
                      else host_col).alias("url_host"))
    if "url_host" in pages.columns:
        return pages.join(F.broadcast(blocked), "url_host", "left_anti")
    return (with_host(pages)
            .join(F.broadcast(blocked), "url_host", "left_anti")
            .drop("url_host"))


def q_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry over the documents table (``source`` is the
    host-analogue key the synthetic corpus carries)."""
    return host_reputation_frame(
        _docs(spark, sf_dir).select("doc_id", "text", "source"))


SQL_HOST_REPUTATION = f"""
WITH d AS (
  SELECT doc_id, source, text,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), lab AS (
  SELECT doc_id, source AS host, text,
         {sql_quality_label_expr()} AS label
  FROM d
)
SELECT host, count(*)::BIGINT AS n_docs,
       sum(label)::BIGINT AS n_kept,
       count(DISTINCT md5(text))::BIGINT AS n_unique_texts,
       ((1000 * sum(label)) // count(*))::BIGINT AS kept_rate_x1000,
       (count(*) >= {HOST_MIN_DOCS}
        AND (1000 * sum(label)) // count(*) < {HOST_KEEP_FLOOR_X1000})
         AS blocked
FROM lab GROUP BY host
"""


REGISTRY = {
    "host_reputation": (q_host_reputation, SQL_HOST_REPUTATION),
}

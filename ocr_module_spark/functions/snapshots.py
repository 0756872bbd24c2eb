"""Snapshot diff: what changed between two crawl snapshots, per key.

Common-Crawl-style corpora arrive as monthly snapshots; the crawl-ops
question before any re-curation run is "what is actually new?" —
additions drive incremental dedup (``dedup.incremental``), removals
drive index compaction (``dedup.compact_dedup_index``), and the
changed/unchanged ratio decides whether a host is worth re-extracting
at all (``hostrep``). The diff is one relational shape:

* each side reduces to ``(key, fingerprint)`` — the fingerprint is an
  md5 of the content, so the FULL OUTER equi-join on the key shuffles
  ~48 bytes per document, never text or html;
* presence is tracked with explicit marker columns, NOT fingerprint
  NULL-ness — a document that exists with NULL text has a NULL
  fingerprint on both sides and must diff as ``unchanged``, which the
  null-safe equality (``<=>`` / IS NOT DISTINCT FROM) delivers::

      added      in new only
      removed    in old only
      changed    in both, fingerprints differ
      unchanged  in both, fingerprints null-safe-equal

At 10^12-document scale both snapshot scans prune to two columns, the
single exchange is the join's hash partitioning on the key, and
bucketing both snapshot tables on the key makes even that exchange
disappear (a sort-merge over co-located buckets). The demo query
synthesizes the two snapshots from one documents scan with the portable
md5-derived hash (the cross-engine stand-in for xxhash64, same
convention as sample_stratified_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import doc_lottery_col, doc_lottery_sql_duck
from .textstats import _docs


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key: str = "doc_id", fp: str = "fp") -> DataFrame:
    """(key, fp_old, fp_new, status) — full-outer diff of two
    ``(key, fp)`` snapshot frames. One equi-join exchange; the inputs
    should already be fingerprint-reduced (never join raw content)."""
    o = old.select(F.col(key), F.col(fp).alias("fp_old"),
                   F.lit(True).alias("in_old"))
    n = new.select(F.col(key), F.col(fp).alias("fp_new"),
                   F.lit(True).alias("in_new"))
    status = (F.when(F.col("in_old").isNull(), "added")
              .when(F.col("in_new").isNull(), "removed")
              .when(F.expr("fp_old <=> fp_new"), "unchanged")
              .otherwise("changed"))
    return (o.join(n, key, "full_outer")
            .select(key, "fp_old", "fp_new", status.alias("status")))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: two synthetic snapshots carved from the documents
    table with the portable hash (old = hash%3 != 0, new = hash%3 != 1,
    so the overlap carries adds AND removes), content changes simulated
    on hash%5 == 2 rows of the new side (NULL text stays NULL through
    the perturbation on both engines → those diff unchanged). Output:
    per-status counts + key extrema."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    hb = doc_lottery_col()
    d = d.select("doc_id", "text", hb.alias("hb"))
    fp_old = F.md5(F.col("text").cast("binary"))
    fp_new = F.when(F.col("hb") % 5 == 2,
                    F.md5(F.concat(F.col("text"), F.lit("!"))
                          .cast("binary"))) \
        .otherwise(fp_old)
    old = d.where(F.col("hb") % 3 != 0).select("doc_id",
                                               fp_old.alias("fp"))
    new = d.where(F.col("hb") % 3 != 1).select("doc_id",
                                               fp_new.alias("fp"))
    return (snapshot_diff(old, new)
            .groupBy("status")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.min("doc_id").alias("first_key"),
                 F.max("doc_id").alias("last_key")))


SQL_SNAPSHOT_DIFF = f"""
WITH d AS (
  SELECT doc_id, text,
         {doc_lottery_sql_duck()} AS hb
  FROM documents
), old AS (
  SELECT doc_id, md5(text) AS fp, TRUE AS in_old
  FROM d WHERE hb % 3 != 0
), new AS (
  SELECT doc_id,
         CASE WHEN hb % 5 = 2 THEN md5(text || '!') ELSE md5(text) END
           AS fp,
         TRUE AS in_new
  FROM d WHERE hb % 3 != 1
), j AS (
  SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
         CASE WHEN in_old IS NULL THEN 'added'
              WHEN in_new IS NULL THEN 'removed'
              WHEN old.fp IS NOT DISTINCT FROM new.fp THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT status, count(*)::BIGINT AS n_docs,
       min(doc_id) AS first_key, max(doc_id) AS last_key
FROM j GROUP BY status
"""


REGISTRY = {
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
}

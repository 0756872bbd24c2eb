"""Salted-repartition skew evidence (north_rule: crawl-host skew handled
explicitly). The synthetic corpus puts ~20% of documents on one host; these
tests show what that does to partition balance and that the salt fixes it."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_module_spark import corpus, pipeline


def _partition_sizes(df, num_partitions, *cols):
    sized = df.repartition(num_partitions, *cols) \
        .withColumn("pid", F.spark_partition_id())
    return [r["n"] for r in
            sized.groupBy("pid").agg(F.count("*").alias("n")).collect()]


def test_corpus_is_host_skewed(spark):
    """Precondition: the generator really produces Zipf-ish host skew."""
    pages = pipeline.with_host(corpus.pages_df(spark, 2000))
    top = (pages.groupBy("url_host").agg(F.count("*").alias("n"))
           .orderBy(F.col("n").desc()).first())
    assert top["n"] >= 2000 * 0.18, top  # ~20% on one host


def test_salting_defeats_host_skew(spark):
    """Partitioning by host alone puts ~20% of the corpus in one task;
    the salted (host, salt) key spreads the hot host over SALT_BUCKETS
    tasks. Max partition size must drop by >= 2x and land within 2.5x of
    the perfectly-balanced ideal."""
    pages = pipeline.with_host(corpus.pages_df(spark, 2000)).cache()
    n_parts = 16
    by_host = _partition_sizes(pages, n_parts, F.col("url_host"))
    salt = F.pmod(F.xxhash64("url"), F.lit(pipeline.SALT_BUCKETS))
    by_salted = _partition_sizes(pages, n_parts, F.col("url_host"), salt)
    pages.unpersist()
    assert max(by_host) >= 2000 * 0.18       # hot host dominates one task
    assert max(by_salted) * 2 <= max(by_host), (by_host, by_salted)
    assert max(by_salted) <= 2.5 * (2000 / n_parts), by_salted


def test_salted_repartition_preserves_rows(spark):
    pages = corpus.pages_df(spark, 500)
    out = pipeline.salted_repartition(pages, 16)
    assert out.count() == 500
    assert "url_host" not in out.columns  # helper column dropped

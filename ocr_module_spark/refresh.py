"""Crawl-refresh orchestration: the monthly-snapshot operational loop.

Common-Crawl-style corpora arrive as snapshots; the expensive mistake
at 10^12 documents is re-running ANYTHING over the ~90% of pages that
did not change. This module composes the engine's incremental pieces
into that loop, one epoch per snapshot:

    1. fingerprint the new snapshot   (url, md5(html)) — 48 B/doc
    2. diff against the stored prior  (snapshots.snapshot_diff —
       added / removed / changed / unchanged, one equi-join exchange)
    3. re-extract ONLY added+changed  (sinks.run_extraction into a
       per-epoch sink dir: same lineage manifests, same resume
       anti-join within the epoch)
    4. tombstone removed urls         (per-epoch parquet)
    5. dedup the fresh docs against the cross-snapshot signature index
       (dedup.dedup_against_index, exclude_self — torn-epoch
       idempotent) and append their index rows
    6. commit: overwrite the fingerprint table, then write the
       epoch's ``_refresh_complete.json`` marker (the commit point)

``refresh_corpus`` is the reader: per-epoch extraction outputs collapse
to the LATEST revision per url (greatest-epoch struct — one shuffle of
doc-grain rows) with tombstones honored epoch-aware (a url removed in
epoch 3 and re-added in epoch 5 is alive). This parquet-epoch layout is
the sandbox twin of ONE Iceberg ``MERGE INTO`` per refresh
(sinks.iceberg_merge_sql) plus snapshot expiry; the layout changes,
the dataflow — diff, route, merge-on-key — does not.

Crash recovery: every step is either per-epoch-overwrite (decisions,
index shard, tombstones), run_extraction-resumable (the extraction
sink's own anti-join), or last-write-wins (the fingerprint table,
written at the very end). An epoch directory without its
``_refresh_complete.json`` marker is a torn refresh — the next run
REUSES that epoch id and replays it to the identical state
(test-pinned), never leaving a half-applied snapshot behind.

Scale notes: the diff and fingerprint frames are ~48 B/doc; extraction
work is proportional to |added| + |changed|, dedup work to the same
(the index is ~0.3% of corpus bytes and the stored text is never
rescanned); the only full-snapshot pass is the fingerprint projection
itself, which prunes to (url, html) and is the unavoidable "read the
new snapshot once". ``compact_index`` (dedup.compact_dedup_index +
tombstone anti-join) runs BETWEEN refreshes, exactly like Iceberg
OPTIMIZE.

Reference tie: the reference's resume seam is per-document existence
checks against its store (ocr_module usecase flow); this is that idea
at snapshot grain, where existence alone is not enough — content
fingerprints decide re-processing.

Gate: tests/test_refresh.py — the incremental==from-scratch invariant
(refresh_corpus text byte-identical to a full extraction of the live
snapshot, every epoch), exact diff counters, work proportionality,
idempotent re-run, torn-refresh replay, tombstone/re-add liveness,
index hygiene after compaction.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import sinks
from .functions.dedup import (build_dedup_index, compact_dedup_index,
                              dedup_against_index)
from .functions.snapshots import snapshot_diff

_MARKER = "_refresh_complete.json"


def snapshot_fingerprints(pages: DataFrame) -> DataFrame:
    """(url, fp): md5 of the raw html bytes — the 48 B/doc change
    detector. NULL html stays a NULL fp; the diff's null-safe equality
    treats two NULL-html revisions of a url as unchanged."""
    return pages.select("url", F.md5("html").alias("fp"))


def _epoch_dirs(state_dir: str) -> list:
    root = os.path.join(state_dir, "epochs")
    if not os.path.isdir(root):
        return []
    return sorted(d for d in os.listdir(root) if d.startswith("e"))


def _next_epoch(state_dir: str) -> int:
    """Next epoch id — or the LAST one again if its commit marker is
    missing (a torn refresh is replayed, not abandoned)."""
    dirs = _epoch_dirs(state_dir)
    if not dirs:
        return 0
    last = int(dirs[-1][1:])
    marker = os.path.join(state_dir, "epochs", dirs[-1], _MARKER)
    return last if not os.path.exists(marker) else last + 1


def refresh(spark: SparkSession, pages_new: DataFrame, state_dir: str,
            num_partitions: Optional[int] = None) -> Dict:
    """Run one snapshot refresh; returns the epoch's counter dict (also
    persisted as the epoch's commit marker)."""
    epoch = _next_epoch(state_dir)
    edir = os.path.join(state_dir, "epochs", f"e{epoch:06d}")
    fp_dir = os.path.join(state_dir, "fingerprints")

    new_fp = snapshot_fingerprints(pages_new)
    if os.path.isdir(fp_dir):
        old_fp = spark.read.parquet(fp_dir)
    else:
        old_fp = spark.createDataFrame([], "url string, fp string")
    # materialize the diff before anything overwrites its inputs
    diff = snapshot_diff(old_fp, new_fp, key="url") \
        .localCheckpoint(eager=True)
    counters: Dict = {"epoch": epoch}
    for r in diff.groupBy("status").count().collect():
        counters[f"docs_{r['status']}"] = int(r["count"])
    for s in ("added", "removed", "changed", "unchanged"):
        counters.setdefault(f"docs_{s}", 0)

    # 3. re-extract only what the diff routed (added + changed); the
    # epoch sink keeps run_extraction's own lineage + resume semantics
    todo = pages_new.join(
        diff.where(F.col("status").isin("added", "changed"))
        .select("url"), "url")
    metrics = sinks.run_extraction(spark, todo, edir,
                                   num_partitions=num_partitions)
    for k in ("docs_in", "docs_out", "docs_failed", "wall_sec"):
        if k in metrics:
            counters[f"extract_{k}"] = metrics[k]

    # 4. tombstones (per-epoch overwrite: replay-idempotent)
    diff.where("status = 'removed'").select("url") \
        .write.mode("overwrite").parquet(os.path.join(edir, "removed"))

    # 5. incremental dedup of the fresh docs against the index; the
    # epoch's decisions and index shard are per-epoch overwrites, and
    # exclude_self keeps a replayed epoch's decisions identical even
    # after its own index shard landed. A no-op epoch (nothing added or
    # changed) wrote no parquet part files — schema inference would
    # fail, and there is nothing to dedup
    docs = _read_epoch_docs(spark, edir)
    index = _read_index(spark, state_dir)
    dec = dedup_against_index(docs, index, exclude_self=True) \
        .withColumn("epoch", F.lit(epoch)) \
        .localCheckpoint(eager=True)
    dec.write.mode("overwrite").parquet(
        os.path.join(state_dir, "decisions", f"e{epoch:06d}"))
    kept = docs.join(dec.where("keep").select("doc_id"), "doc_id")
    shard = build_dedup_index(kept).withColumn("epoch", F.lit(epoch)) \
        .localCheckpoint(eager=True)
    shard.write.mode("overwrite").parquet(
        os.path.join(state_dir, "index", f"e{epoch:06d}"))
    agg = dec.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.col("exact_dup").cast("long")), F.lit(0))
        .alias("x"),
        F.coalesce(F.sum(F.col("near_dup").cast("long")), F.lit(0))
        .alias("nd"),
        F.coalesce(F.sum(F.col("keep").cast("long")), F.lit(0))
        .alias("k")).first()
    counters.update(dedup_docs=int(agg["n"]), dedup_exact=int(agg["x"]),
                    dedup_near=int(agg["nd"]), dedup_kept=int(agg["k"]),
                    index_rows_appended=shard.count())

    # 6. commit: fingerprints last-write-wins, then the marker
    new_fp.write.mode("overwrite").parquet(fp_dir)
    with open(os.path.join(edir, _MARKER), "w") as fh:
        json.dump(counters, fh)
    return counters


def _read_epoch_docs(spark: SparkSession, edir: str) -> DataFrame:
    """(doc_id, text) of one epoch's extraction output; empty frame for
    a no-op epoch (an empty write leaves no part files to infer from)."""
    try:
        return (spark.read.parquet(os.path.join(edir, "data"))
                .select(F.col("url").alias("doc_id"), "text")
                .localCheckpoint(eager=True))
    except Exception:
        return spark.createDataFrame([], "doc_id string, text string")


def _read_index(spark: SparkSession, state_dir: str) -> DataFrame:
    root = os.path.join(state_dir, "index")
    empty = "doc_id string, norm_md5 string, sig array<string>, epoch int"
    if not os.path.isdir(root) or not os.listdir(root):
        return spark.createDataFrame([], empty)
    try:
        return (spark.read.option("recursiveFileLookup", "true")
                .parquet(root))
    except Exception:      # every shard so far was a no-op epoch's
        return spark.createDataFrame([], empty)


def _tombstones(spark: SparkSession, state_dir: str) -> DataFrame:
    """(url, rm_epoch): every removal ever recorded, with its epoch."""
    frames = []
    for d in _epoch_dirs(state_dir):
        p = os.path.join(state_dir, "epochs", d, "removed")
        if os.path.isdir(p):
            frames.append(spark.read.parquet(p)
                          .withColumn("rm_epoch", F.lit(int(d[1:]))))
    if not frames:
        return spark.createDataFrame([], "url string, rm_epoch int")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def refresh_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """The live corpus: latest extracted revision per url across all
    committed epochs, minus urls whose latest event is a removal. One
    groupBy per side on doc-grain rows (text rides the shuffle once —
    the Iceberg deployment replaces this reader with the table itself,
    because MERGE already materialized latest-revision rows)."""
    frames = []
    for d in _epoch_dirs(state_dir):
        marker = os.path.join(state_dir, "epochs", d, _MARKER)
        data = os.path.join(state_dir, "epochs", d, "data")
        if not (os.path.exists(marker) and os.path.isdir(data)):
            continue
        try:
            df = spark.read.parquet(data)   # no-op epoch: no part files
        except Exception:
            continue
        frames.append(df.withColumn("epoch", F.lit(int(d[1:]))))
    if not frames:
        raise ValueError(f"no committed epochs under {state_dir}")
    allrows = frames[0]
    for f in frames[1:]:
        allrows = allrows.unionByName(f)
    cols = [c for c in allrows.columns if c != "url"]
    latest = (allrows.groupBy("url")
              .agg(F.max(F.struct(F.col("epoch").alias("_e"),
                                  *[F.col(c) for c in cols])).alias("m"))
              .select("url", "m.*").drop("_e"))
    tomb = (_tombstones(spark, state_dir)
            .groupBy("url").agg(F.max("rm_epoch").alias("rm_epoch")))
    return (latest.join(tomb, "url", "left")
            .where(F.col("rm_epoch").isNull()
                   | (F.col("rm_epoch") < F.col("epoch")))
            .drop("rm_epoch"))


def compact_index(spark: SparkSession, state_dir: str,
                  ttl_min_epoch: Optional[int] = None) -> Dict:
    """Between-refresh index maintenance (the Iceberg OPTIMIZE seat):
    drop rows for urls whose latest event is a removal, then
    dedup.compact_dedup_index (replay merge + superseded-revision
    collapse on the canonical-URL key + optional epoch TTL). Rewrites
    the index as one compacted shard."""
    index = _read_index(spark, state_dir)
    before = index.count()
    tomb = (_tombstones(spark, state_dir)
            .groupBy("url").agg(F.max("rm_epoch").alias("rm_epoch")))
    live = (index.join(tomb, index["doc_id"] == tomb["url"], "left")
            .where(tomb["rm_epoch"].isNull()
                   | (tomb["rm_epoch"] < index["epoch"]))
            .select(*index.columns))
    compacted = compact_dedup_index(
        live, url_keyed=True, order_col="epoch",
        ttl_min_order=ttl_min_epoch).localCheckpoint(eager=True)
    after = compacted.count()
    root = os.path.join(state_dir, "index")
    shutil.rmtree(root, ignore_errors=True)
    compacted.write.mode("overwrite").parquet(
        os.path.join(root, "compacted"))
    return {"index_rows_before": before, "index_rows_after": after}

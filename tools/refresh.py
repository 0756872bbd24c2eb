"""Snapshot-refresh CLI: the monthly crawl-ops entry point.

    spark-submit --py-files pkg.zip tools/refresh.py \\
        --snapshot new_pages.parquet --state /data/crawl_state

Each run is one epoch of ocr_module_spark.refresh.refresh():
fingerprint-diff the snapshot against the stored state, re-extract
ONLY added+changed pages (per-epoch resumable sink with lineage
manifests), tombstone removals, dedup the fresh docs against the
cross-snapshot signature index, commit. Prints ONE JSON counters line
(the same dict persisted as the epoch's _refresh_complete.json).

    --compact        run index maintenance after the refresh
                     (tombstone scrub + replay merge + superseded-
                     revision collapse; the Iceberg OPTIMIZE seat)
    --ttl-epochs N   with --compact: expire index rows older than
                     (current epoch - N)
    --show-corpus    also report the live-corpus row count via
                     refresh_corpus (a full latest-revision read —
                     skip it on big states)

A torn run (crash before the commit marker) is replayed into the same
epoch on the next invocation — rerunning this CLI is always safe.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

# driver-side import path when run without --py-files (local smoke);
# executors get the package via deploy.ensure_pyfiles below
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser(
        description="one crawl-snapshot refresh epoch")
    ap.add_argument("--snapshot", required=True,
                    help="pages parquet (url, warc_ts, html, text, lang)")
    ap.add_argument("--state", required=True,
                    help="refresh state dir (fingerprints/, epochs/, "
                         "index/, decisions/)")
    ap.add_argument("--partitions", type=int, default=0,
                    help="extraction repartition override")
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--ttl-epochs", type=int, default=0, metavar="N")
    ap.add_argument("--show-corpus", action="store_true")
    args = ap.parse_args()
    if args.ttl_epochs and not args.compact:
        ap.error("--ttl-epochs requires --compact")

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("refresh").getOrCreate()
    from ocr_module_spark.deploy import ensure_pyfiles
    ensure_pyfiles(spark)
    from ocr_module_spark.refresh import (compact_index, refresh,
                                          refresh_corpus)

    pages = spark.read.parquet(args.snapshot)
    counters = refresh(spark, pages, args.state,
                       num_partitions=args.partitions or None)
    if args.compact:
        ttl = (counters["epoch"] - args.ttl_epochs
               if args.ttl_epochs else None)
        counters.update(compact_index(spark, args.state,
                                      ttl_min_epoch=ttl))
    if args.show_corpus:
        counters["corpus_docs"] = refresh_corpus(spark, args.state).count()
    print(json.dumps(counters))
    return 0


if __name__ == "__main__":
    sys.exit(main())

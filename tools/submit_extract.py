"""Cluster job entry point — the ``spark-submit --py-files`` contract
(north_rule: "launched via spark-submit --py-files on a multi-executor
cluster").

Build the artifact and submit::

    python -c "from ocr_module_spark.deploy import build_zip; print(build_zip('dist/ocr_module_spark.zip'))"
    spark-submit \\
        --py-files dist/ocr_module_spark.zip \\
        --conf spark.sql.adaptive.enabled=true \\
        --conf spark.sql.execution.arrow.pyspark.enabled=true \\
        tools/submit_extract.py \\
        --input  <pages parquet/Iceberg path> \\
        --output <sink dir> \\
        [--repartition N]   # only for skew-laid-out inputs; default scan-aligned

The job is resumable: re-submitting with the same --output processes only
urls not yet committed (sinks.run_extraction anti-join + manifest); metrics
for each batch land in <output>/_manifest/.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

# on a cluster the package arrives via --py-files; for local smoke runs
# resolve it from the repo checkout (same convention as tools/parity_check)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="web-scale main-content extraction")
    ap.add_argument("--input", required=True,
                    help="pages table path (url, warc_ts, html, text, lang)")
    ap.add_argument("--input-format", choices=("parquet", "warc"),
                    default="parquet",
                    help="'warc' ingests raw .warc/.warc.gz containers "
                         "(sources/warc.py: HTTP-200 text/html responses "
                         "become pages rows) instead of a pages table")
    ap.add_argument("--output", required=True, help="sink directory")
    ap.add_argument("--repartition", type=int, default=None,
                    help="salted repartition width for skew-laid-out inputs "
                         "(default: scan-aligned, no pre-parse shuffle)")
    ap.add_argument("--sink", choices=("parquet", "iceberg"),
                    default="parquet",
                    help="iceberg needs --table and the runtime jar "
                         "(see sinks.py header for the spark-submit conf)")
    ap.add_argument("--table", default=None,
                    help="Iceberg table identifier (catalog.db.table)")
    ap.add_argument("--lineage", action="store_true",
                    help="after the run, print a per-partition lineage "
                         "summary for this batch (skew + failure "
                         "distribution; aggregated engine-side, never a "
                         "full partition list on the driver)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ocr_module_spark import sinks

    # on a cluster, master/executors come from spark-submit; local fallback
    # keeps the script runnable for smoke tests
    spark = SparkSession.builder.appName("ocr-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.input_format == "warc":
        from ocr_module_spark.sources.warc import read_warc, warc_pages
        pages = warc_pages(read_warc(spark, args.input))
    else:
        pages = spark.read.parquet(args.input)
    metrics = sinks.run_extraction(spark, pages, args.output,
                                   num_partitions=args.repartition,
                                   sink=args.sink, table=args.table)
    print(json.dumps(metrics))
    if args.lineage and args.sink == "parquet" and metrics.get("docs_out"):
        from pyspark.sql import functions as F
        lin = sinks.partition_lineage(spark, args.output,
                                      batch_id=metrics["batch_id"])
        summary = lin.agg(
            F.count(F.lit(1)).alias("partitions"),
            F.min("docs").alias("docs_min"),
            F.expr("percentile_approx(docs, 0.5)").alias("docs_median"),
            F.max("docs").alias("docs_max"),
            F.sum("docs_failed").alias("docs_failed"),
            F.sum("docs_mismatched").alias("docs_mismatched"),
        ).collect()[0].asDict()
        print(json.dumps({"lineage": summary}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

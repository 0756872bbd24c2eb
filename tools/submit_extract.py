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
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="web-scale main-content extraction")
    ap.add_argument("--input", required=True,
                    help="pages table path (url, warc_ts, html, text, lang)")
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
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ocr_module_spark import sinks

    # on a cluster, master/executors come from spark-submit; local fallback
    # keeps the script runnable for smoke tests
    spark = SparkSession.builder.appName("ocr-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.input)
    metrics = sinks.run_extraction(spark, pages, args.output,
                                   num_partitions=args.repartition,
                                   sink=args.sink, table=args.table)
    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())

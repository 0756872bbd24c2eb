"""Two-parallelism-level determinism check (SURVEY.md §5.2 item 5).

Runs the full extraction over the same deterministic corpus in two
separate JVMs at different parallelism levels (local[4] vs local[16],
different shuffle-partition counts too) and compares an order-insensitive
corpus-wide digest: xor-free sum of per-url sha256 prefixes over
(url, text, mismatch_flag). Byte-identical per url ⇒ equal digests.

    python tools/determinism_check.py [n_docs]
    python tools/determinism_check.py worker CORES SHUFFLE N
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DEFAULT = 20000


def worker(cores: int, shuffle: int, n_docs: int) -> None:
    from pyspark.sql import functions as F

    from ocr_module_spark import corpus, pipeline
    from ocr_module_spark.session import get_spark

    spark = get_spark(f"det-{cores}", cores=cores, shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")
    out = pipeline.extract(corpus.pages_df(spark, n_docs),
                           num_partitions=cores * 3)
    digest = out.select(
        F.conv(F.substring(F.sha2(F.concat_ws(
            "\x00", "url", "text", F.col("mismatch_flag").cast("string")),
            256), 1, 15), 16, 10).cast("decimal(38,0)").alias("h")
    ).agg(F.sum("h").cast("string").alias("digest")).collect()[0]["digest"]
    n = out.count()
    spark.stop()
    print(json.dumps({"cores": cores, "n": n, "digest": digest}))


def main(n_docs: int) -> int:
    results = []
    for cores, shuffle in ((4, 16), (16, 64)):
        proc = subprocess.run(
            [sys.executable, __file__, "worker", str(cores), str(shuffle),
             str(n_docs)],
            capture_output=True, text=True, cwd=str(REPO), timeout=900)
        line = proc.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(results[-1])
    ok = (results[0]["digest"] == results[1]["digest"]
          and results[0]["n"] == results[1]["n"] == n_docs)
    print(json.dumps({"metric": "determinism_across_parallelism",
                      "equal": ok, "n_docs": n_docs}))
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT))

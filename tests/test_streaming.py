"""Streaming extension tests: incremental drain, checkpointed progress,
idempotence under replay, watermarked window metrics."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from ocr_module_spark import corpus
from ocr_module_spark.streaming import (
    run_incremental_extraction,
    stream_crawl_metrics,
    stream_pages,
)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="ocr_stream_")
    paths = {k: os.path.join(base, k) for k in ("landing", "out", "ckpt")}
    os.makedirs(paths["landing"])
    yield paths
    shutil.rmtree(base, ignore_errors=True)


def _drop_batch(spark, landing: str, start: int, n: int, name: str) -> None:
    pdf = __import__("pandas").DataFrame.from_records(
        list(corpus.rows(n, start=start)),
        columns=["url", "warc_ts", "html", "text", "lang"])
    from ocr_module_spark.schemas import PAGES_SCHEMA
    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(landing, name))


def test_incremental_extraction_drains_and_resumes(spark, dirs):
    _drop_batch(spark, dirs["landing"], 0, 60, "b0")
    run_incremental_extraction(spark, dirs["landing"], dirs["out"],
                               checkpoint_dir=dirs["ckpt"])
    out1 = spark.read.parquet(os.path.join(dirs["out"], "data"))
    assert out1.count() == 60

    # second drop: only the new docs are processed (checkpoint skips b0's
    # files; the sink's anti-join would also dedupe a replay)
    _drop_batch(spark, dirs["landing"], 60, 40, "b1")
    run_incremental_extraction(spark, dirs["landing"], dirs["out"],
                               checkpoint_dir=dirs["ckpt"])
    out2 = spark.read.parquet(os.path.join(dirs["out"], "data"))
    assert out2.count() == 100
    assert out2.select("url").distinct().count() == 100

    # byte-identity holds through the streaming path
    from ocr_module_spark import oracle
    got = {r["url"]: r["text"] for r in out2.collect()}
    for i in (0, 7, 63, 99):
        row = corpus.row_for(i)
        assert got[row["url"]] == oracle.extract_document(
            row["url"], row["html"])["text"]


def test_replay_is_idempotent(spark, dirs):
    """Blowing away the checkpoint replays all files; the sink's url
    anti-join keeps the output exactly-once anyway."""
    _drop_batch(spark, dirs["landing"], 0, 50, "b0")
    run_incremental_extraction(spark, dirs["landing"], dirs["out"],
                               checkpoint_dir=dirs["ckpt"])
    shutil.rmtree(dirs["ckpt"])  # simulate lost checkpoint
    run_incremental_extraction(spark, dirs["landing"], dirs["out"],
                               checkpoint_dir=dirs["ckpt"])
    out = spark.read.parquet(os.path.join(dirs["out"], "data"))
    assert out.count() == 50
    assert out.select("url").distinct().count() == 50


def test_windowed_metrics_with_watermark(spark, dirs):
    _drop_batch(spark, dirs["landing"], 0, 80, "b0")
    metrics = stream_crawl_metrics(stream_pages(spark, dirs["landing"]))
    q = (metrics.writeStream.format("memory").queryName("crawl_metrics")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    q.stop()
    rows = spark.sql(
        "SELECT sum(docs) AS docs FROM crawl_metrics").collect()
    # warc_ts advances 137 s/doc: 80 docs span ~3 windows; append mode
    # emits only windows closed by the watermark — the final (open)
    # window is retained in state, so emitted docs < 80 but > 0
    assert rows[0]["docs"] is not None and 0 < rows[0]["docs"] <= 80
    w = spark.sql("SELECT window_start, window_end, lang, docs, bytes_in "
                  "FROM crawl_metrics").collect()
    for r in w:
        assert r["bytes_in"] > 0
        assert r["window_end"] > r["window_start"]


def test_stream_dedup_first_seen_across_restarts(spark, dirs):
    """Cross-batch stateful dedup (applyInPandasWithState): duplicates of
    content seen in a PREVIOUS run (state restored from the checkpoint)
    are suppressed; each fingerprint is emitted exactly once with a
    deterministic (min-url) winner."""
    import pandas as pd
    from pyspark.sql import functions as F
    from ocr_module_spark.schemas import PAGES_SCHEMA
    from ocr_module_spark.streaming import stream_dedup_first_seen, stream_pages

    def drop(name, recs):
        pdf = pd.DataFrame.from_records(
            recs, columns=["url", "warc_ts", "html", "text", "lang"])
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(
                os.path.join(dirs["landing"], name))

    def row(url, i):
        r = corpus.row_for(i)
        r["url"] = url
        return r

    out_dir = os.path.join(dirs["out"], "dedup")

    def drain():
        q = (stream_dedup_first_seen(stream_pages(spark, dirs["landing"]))
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", dirs["ckpt"])
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()

    # run 1: 20 distinct payloads, each under two urls (in-epoch dups)
    drop("b0", [row(f"https://a.example/d{i}", i) for i in range(20)]
         + [row(f"https://b.example/d{i}", i) for i in range(20)])
    drain()
    got1 = spark.read.parquet(out_dir)
    assert got1.count() == 20
    # deterministic winner: min url (a.example sorts before b.example)
    assert all(r["url"].startswith("https://a.example/")
               for r in got1.collect())

    # run 2: same 20 payloads again under new urls (cross-run dups,
    # must be suppressed by checkpointed state) + 5 genuinely new docs
    drop("b1", [row(f"https://c.example/d{i}", i) for i in range(20)]
         + [row(f"https://c.example/n{i}", 1000 + i) for i in range(5)])
    drain()
    got2 = spark.read.parquet(out_dir)
    assert got2.count() == 25, got2.collect()
    new_urls = {r["url"] for r in got2.collect()} - \
        {r["url"] for r in got1.collect()}
    assert all("c.example/n" in u for u in new_urls)


def test_stream_decon_flags_matches_batch_formula(spark, dirs):
    """Streaming decontamination (stream-static broadcast join, zero
    state): flags for streamed pages equal the batch formula computed
    directly, and a contaminated page is flagged the epoch it arrives."""
    import pandas as pd
    from pyspark.sql import functions as F
    from ocr_module_spark.functions.decontam import DECON_FRAC_X100
    from ocr_module_spark.schemas import PAGES_SCHEMA
    from ocr_module_spark.streaming import stream_decon_flags, stream_pages

    bench_rows = [
        (100, "alpha beta gamma delta epsilon zeta eta theta"),
        (101, "iota kappa lombda mu nu xi omicron pi"),
    ]
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")

    def page(url, text, i):
        r = corpus.row_for(i)
        r["url"] = url
        r["text"] = text
        return r

    pages = [
        # exact copy of a benchmark doc -> contaminated
        page("https://s.example/contam", bench_rows[0][1], 0),
        # half-overlap (4 of ~6 shingles replaced) -> below threshold
        page("https://s.example/partial",
             "alpha beta gamma QQ WW EE RR TT", 1),
        # disjoint vocabulary -> clean
        page("https://s.example/clean",
             "one two three four five six seven eight", 2),
        # too short for a shingle -> n_shingles 0, never contaminated
        page("https://s.example/short", "hi there", 3),
    ]
    pdf = pd.DataFrame.from_records(
        pages, columns=["url", "warc_ts", "html", "text", "lang"])
    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(
            os.path.join(dirs["landing"], "b0"))

    out_dir = os.path.join(dirs["out"], "decon")
    q = (stream_decon_flags(stream_pages(spark, dirs["landing"]), bench)
         .writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", dirs["ckpt"])
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    q.stop()

    got = {r["url"]: r for r in spark.read.parquet(out_dir).collect()}
    assert len(got) == 4
    assert got["https://s.example/contam"]["contaminated"] is True
    assert got["https://s.example/clean"]["contaminated"] is False
    assert got["https://s.example/clean"]["n_hits"] == 0
    assert got["https://s.example/short"]["n_shingles"] == 0
    assert got["https://s.example/short"]["contaminated"] is False
    for r in got.values():  # the formula itself, re-checked per row
        expect = (r["n_shingles"] > 0 and
                  r["n_hits"] * 100 >= r["n_shingles"] * DECON_FRAC_X100)
        assert r["contaminated"] == expect, r


def test_stream_decon_flags_incremental_epochs(spark, dirs):
    """A second batch dropped after the first drain is flagged on the
    next drain from the same checkpoint — incremental, append-only, and
    earlier epochs are not recomputed (zero streaming state)."""
    import pandas as pd
    from ocr_module_spark.schemas import PAGES_SCHEMA
    from ocr_module_spark.streaming import stream_decon_flags, stream_pages

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")

    def page(url, text, i):
        r = corpus.row_for(i)
        r["url"] = url
        r["text"] = text
        return r

    def drop(name, pages):
        pdf = pd.DataFrame.from_records(
            pages, columns=["url", "warc_ts", "html", "text", "lang"])
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(
                os.path.join(dirs["landing"], name))

    out_dir = os.path.join(dirs["out"], "decon_inc")

    def drain():
        q = (stream_decon_flags(stream_pages(spark, dirs["landing"]), bench)
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", dirs["ckpt"])
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        q.stop()

    drop("b0", [page("https://s.example/early-clean",
                     "one two three four five six", 0)])
    drain()
    assert spark.read.parquet(out_dir).count() == 1

    drop("b1", [page("https://s.example/late-contam",
                     "alpha beta gamma delta epsilon zeta eta theta", 1)])
    drain()
    got = {r["url"]: r["contaminated"]
           for r in spark.read.parquet(out_dir).collect()}
    assert got == {"https://s.example/early-clean": False,
                   "https://s.example/late-contam": True}


def test_run_incremental_dedup_grows_index_across_epochs(spark, dirs):
    """Cross-snapshot dedup as a drain: epoch 2's batch is deduped
    against epoch 1's KEPT docs via the on-disk signature index — no
    corpus rescan, decisions parquet carries the verdicts."""
    import datetime

    import pandas as pd

    from ocr_module_spark.schemas import PAGES_SCHEMA
    from ocr_module_spark.streaming import run_incremental_dedup

    t1 = ("the quick brown fox jumps over the lazy dog while the cat "
          "watches from the warm stone wall near the garden gate today")
    t2 = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi")
    ts = datetime.datetime(2026, 1, 1)

    def drop(name, rows):
        pdf = pd.DataFrame.from_records(
            [(u, ts, b"", t, "en") for u, t in rows],
            columns=["url", "warc_ts", "html", "text", "lang"])
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1) \
            .write.mode("overwrite").parquet(
                os.path.join(dirs["landing"], name))

    idx_dir = os.path.join(dirs["out"], "index")
    dec_dir = os.path.join(dirs["out"], "decisions")

    drop("b0", [("u1", t1), ("u2", t2)])
    run_incremental_dedup(spark, dirs["landing"], idx_dir, dec_dir,
                          checkpoint_dir=dirs["ckpt"], timeout_sec=120)
    drop("b1", [("u3", "  " + t1.upper() + " "),       # exact dup of u1
                ("u4", t2.replace("alpha", "A2").replace("pi", "pie")),
                ("u5", "completely fresh words about broadcast joins "
                       "and shuffle partitions in a spark data engine")])
    run_incremental_dedup(spark, dirs["landing"], idx_dir, dec_dir,
                          checkpoint_dir=dirs["ckpt"], timeout_sec=120)

    dec = {r["doc_id"]: r
           for r in spark.read.parquet(dec_dir + "/data").collect()}
    assert dec["u1"]["keep"] and dec["u2"]["keep"]
    assert dec["u3"]["exact_dup"] and not dec["u3"]["keep"]
    assert dec["u4"]["near_dup"] and not dec["u4"]["keep"]
    assert dec["u4"]["matched_doc"] == "u2"
    assert dec["u5"]["keep"]
    # index holds exactly the kept docs' signature rows
    idx_ids = {r["doc_id"] for r in spark.read.parquet(idx_dir).collect()}
    assert idx_ids == {"u1", "u2", "u5"}
    # re-drain with nothing new: checkpoint makes it a no-op
    run_incremental_dedup(spark, dirs["landing"], idx_dir, dec_dir,
                          checkpoint_dir=dirs["ckpt"], timeout_sec=120)
    assert spark.read.parquet(dec_dir + "/data").count() == 5

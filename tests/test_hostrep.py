"""host_reputation — per-host quality rollup + crawl blocklist.
Pure-Python twin, audit-rollup counters summing to the global stage
counters, broadcast anti-join enforcement, plan shape, DuckDB parity
(testdata here, hostile corpus via the hostile gate)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.hostrep import (HOST_KEEP_FLOOR_X1000,
                                                HOST_MIN_DOCS,
                                                apply_host_blocklist,
                                                host_reputation_frame,
                                                host_stats_from_audit,
                                                q_host_reputation)
from ocr_module_spark.functions.textstats import (QF_MAX_AVG_WLEN,
                                                  QF_MAX_WORDS,
                                                  QF_MIN_AVG_WLEN,
                                                  QF_MIN_STOPWORD_RATIO,
                                                  QF_MIN_WORDS,
                                                  STOPWORDS_EN)


def _label(text: str | None) -> int:
    """Pure-Python twin of the Gopher gate (quality_label_frame).
    NULL text labels 1 on BOTH engines — every reason comparison sees
    NULL and falls to its ELSE 0 (the documented bitmask-sum-not-AND
    NULL propagation); the twin mirrors that."""
    if text is None:
        return 1
    w = [] if not text.strip() else re.split(r"\s+", text.strip())
    nw = len(w)
    ns = sum(1 for x in w if x.lower() in STOPWORDS_EN)
    awl10 = (len(text) * 10) / max(nw, 1)
    r = 0
    if nw < QF_MIN_WORDS or nw > QF_MAX_WORDS:
        r |= 1
    if awl10 < QF_MIN_AVG_WLEN * 10 or awl10 > QF_MAX_AVG_WLEN * 10:
        r |= 2
    if ns * 100 < nw * int(QF_MIN_STOPWORD_RATIO * 100):
        r |= 4
    return 1 if r == 0 else 0


GOOD = ("the quick brown fox jumps over the lazy dog and runs on "
        "through the field to the old barn by the river every day") * 2
JUNK = "zzzz qqqq xxxx"

DOCS = (
    [(i, GOOD, "good.example") for i in range(6)]
    + [(10 + i, JUNK, "spam.example") for i in range(10)]
    + [(30, JUNK, "tiny.example")]          # under the evidence floor
    + [(31, GOOD, "tiny.example")]
    + [(32, None, "spam.example")]          # NULL text: label 1 (see twin)
    + [(33, GOOD, "spam.example")]          # one good doc on a bad host
)


@pytest.fixture(scope="module")
def rep(spark):
    d = spark.createDataFrame(DOCS,
                              "doc_id long, text string, source string")
    return {r["host"]: r for r in
            host_reputation_frame(d).collect()}


def test_rollup_matches_pure_python_twin(rep):
    hosts: dict = {}
    for _i, text, src in DOCS:
        n, k, texts = hosts.get(src, (0, 0, set()))
        if text is not None:
            texts = texts | {text}
        hosts[src] = (n + 1, k + _label(text), texts)
    assert set(rep) == set(hosts)
    for h, (n, k, texts) in hosts.items():
        r = rep[h]
        assert (r["n_docs"], r["n_kept"], r["n_unique_texts"]) == \
            (n, k, len(texts))
        assert r["kept_rate_x1000"] == (1000 * k) // n
        assert r["blocked"] == (n >= HOST_MIN_DOCS
                                and (1000 * k) // n < HOST_KEEP_FLOOR_X1000)


def test_planted_hosts_block_correctly(rep):
    assert rep["spam.example"]["blocked"]            # 2/12 kept = 166
    assert not rep["good.example"]["blocked"]        # all kept
    assert not rep["tiny.example"]["blocked"]        # evidence floor


def test_blocklist_enforcement_is_broadcast_anti(spark, rep):
    d = spark.createDataFrame(DOCS,
                              "doc_id long, text string, source string")
    stats = host_reputation_frame(d)
    pages = spark.createDataFrame(
        [(f"https://{src}/p{i}", f"t{i}") for i, _t, src in DOCS],
        "url string, text string")
    out = apply_host_blocklist(pages, stats)
    kept_hosts = {r["url"].split("/")[2] for r in out.collect()}
    assert kept_hosts == {"good.example", "tiny.example"}
    assert out.columns == pages.columns                # key col dropped
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    # the only exchange is the blocklist BUILD side's own rollup (on the
    # stats frame's host key); the pages side never shuffles on its key
    assert "hashpartitioning(url_host" not in plan


def test_audit_rollup_sums_to_stage_counters(spark):
    from ocr_module_spark import corpus, curate, pipeline
    pages = corpus.pages_df(spark, 150)
    bench = (pipeline.extract(pages).select("url", "text")
             .where(F.xxhash64("url") % 11 == 3)
             .select(F.xxhash64("url").alias("doc_id"), "text")
             .localCheckpoint(eager=True))
    _cur, audit = curate.curate(spark, pages, bench)
    audit = audit.localCheckpoint(eager=True)
    g = curate.stage_counters(audit)
    hosts = host_stats_from_audit(audit).collect()
    assert sum(r["n_docs"] for r in hosts) == g["docs_extracted"]
    assert sum(r["n_kept"] for r in hosts) == g["docs_kept"]
    for col in ("dropped_quality", "dropped_duplicate",
                "dropped_contaminated"):
        assert sum(r[col] for r in hosts) == g[col]


def test_rollup_plan_is_single_scan(spark, sf_dir):
    plan = (q_host_reputation(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan                          # one scan, no join
    assert plan.count("Scan parquet") == 1


def test_duckdb_parity_on_testdata(spark, sf_dir):
    import duckdb

    from ocr_module_spark.functions.hostrep import SQL_HOST_REPUTATION
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    s = sorted(tuple(r) for r in q_host_reputation(spark, sf_dir).collect())
    d = sorted(tuple(r) for r in con.sql(SQL_HOST_REPUTATION).fetchall())
    con.close()
    assert s == d

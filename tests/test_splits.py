"""curate_split — leakage-safe grouped train/val/test split.

Pure-Python reference twin, the no-straddle invariant (the property the
operator exists for), rollup conservation, and plan shape. DuckDB value
parity runs in tools/parity_check.py and tests/test_hostile_parity.py.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from ocr_module_spark.functions.splits import (SPLIT_TEST_PERMILLE,
                                               SPLIT_VAL_PERMILLE,
                                               q_split_rollup,
                                               split_assignments)


def ref_split(group: str | None) -> str:
    b = int(hashlib.md5((group or "").encode()).hexdigest()[:4], 16) % 1000
    if b < SPLIT_TEST_PERMILLE:
        return "test"
    if b < SPLIT_TEST_PERMILLE + SPLIT_VAL_PERMILLE:
        return "val"
    return "train"


def test_reference_twin(spark):
    rows = [(i, g) for i, g in enumerate(
        ["a.com", "b.org", None, "c.net", "a.com", "host%d"] +
        [f"h{k}" for k in range(200)])]
    df = split_assignments(
        spark.createDataFrame(rows, "doc_id long, source string"))
    got = {r["doc_id"]: r["split"] for r in df.collect()}
    assert got == {i: ref_split(g) for i, g in rows}
    assert {ref_split(f"h{k}") for k in range(200)} == \
        {"train", "val", "test"}  # all three splits reachable


def test_no_group_straddles(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_group = (split_assignments(d)
                 .groupBy("source")
                 .agg({"split": "collect_set"})
                 .collect())
    for r in per_group:
        assert len(r["collect_set(split)"]) == 1, r["source"]


def test_rollup_conserves_corpus(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = q_split_rollup(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == d.count()
    assert (sum(r["n_groups"] for r in rows)
            == d.select("source").distinct().count())


def test_cross_parallelism_determinism(spark):
    rows = [(i, f"h{i % 37}") for i in range(300)]
    base = spark.createDataFrame(rows, "doc_id long, source string")

    def labels(df):
        return sorted((r["doc_id"], r["split"])
                      for r in split_assignments(df).collect())
    assert labels(base.coalesce(1)) == labels(base.repartition(13))


def test_plan_shape(spark, sf_dir):
    plan = (q_split_rollup(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one groupBy (partial + final) — countDistinct expands to two
    # aggregate exchanges; nothing else may shuffle
    assert plan.count("Exchange") <= 2 * 2, plan


def test_leakage_audit_constructed(spark):
    """Two cross-host exact-dup pairs: the pair whose hosts land in
    different splits is reported straddling; the same-split pair is
    not. Hosts are picked via the reference hash so the fixture can't
    rot if the permille bounds move."""
    hosts = [f"h{k}.example" for k in range(400)]
    by_split = {}
    for h in hosts:
        by_split.setdefault(ref_split(h), []).append(h)
    train_a, train_b = by_split["train"][:2]
    test_a = by_split["test"][0]
    dup1 = "alpha beta gamma delta epsilon zeta eta theta"     # straddles
    dup2 = "one two three four five six seven eight nine ten"  # same split
    docs = spark.createDataFrame(
        [(1, dup1, train_a), (2, dup1, test_a),
         (3, dup2, train_a), (4, dup2, train_b),
         (5, "totally unrelated singleton text here", train_a)],
        "doc_id long, text string, source string")
    from ocr_module_spark.functions.splits import split_leakage_frame
    per = {r["label"]: r for r in split_leakage_frame(docs).collect()}
    assert len(per) == 2                      # singleton joins no cluster
    straddle = sorted(r["n_splits"] for r in per.values())
    assert straddle == [1, 2]
    for r in per.values():
        assert r["n_docs"] == 2


def test_split_repair_routes_straddlers(spark):
    """Repair = audit's action: the straddling pair converges on the
    canonical (min doc_id) member's split, the same-split pair and the
    singleton stay untouched, and the repaired labels re-audit clean."""
    hosts = [f"h{k}.example" for k in range(400)]
    by_split = {}
    for h in hosts:
        by_split.setdefault(ref_split(h), []).append(h)
    train_a, train_b = by_split["train"][:2]
    test_a = by_split["test"][0]
    dup1 = "alpha beta gamma delta epsilon zeta eta theta"
    dup2 = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, dup1, train_a), (2, dup1, test_a),
         (3, dup2, train_a), (4, dup2, train_b),
         (5, "totally unrelated singleton text here", test_a)],
        "doc_id long, text string, source string")
    from ocr_module_spark.functions.splits import split_repair_assignments
    rep = {r["doc_id"]: r for r in
           split_repair_assignments(docs).collect()}
    assert len(rep) == 5
    # straddler: doc 2 (test host) routed to doc 1's (canonical) train
    assert (rep[1]["split"], rep[1]["split_repaired"]) == ("train", False)
    assert (rep[2]["split"], rep[2]["split_repaired"]) == ("train", True)
    # same-split cluster and the singleton: untouched
    for d in (3, 4):
        assert (rep[d]["split"], rep[d]["split_repaired"]) == \
            ("train", False)
    assert (rep[5]["split"], rep[5]["split_repaired"]) == ("test", False)
    # post-repair invariant: both clusters span exactly one split
    assert len({rep[1]["split"], rep[2]["split"]}) == 1
    assert len({rep[3]["split"], rep[4]["split"]}) == 1


def test_assignment_is_projection(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (split_assignments(d)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan, plan

"""curate_budget_mix — token-budget mixture selection.

Constructed-corpus semantics (cap truncation, exact budget boundary,
low-tier drop) plus plan-shape assertions: the budget cutoff must be the
bucketed two-phase prefix sum (broadcast offset join, no tier-only window
— 3 reducers for the corpus is the scale-killer it exists to avoid).

Cross-engine value parity vs the naive single-window SQL formulation is
covered by tools/parity_check.py and the hostile-corpus gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.textstats import (MIX_BUDGET_HIGH,
                                                  MIX_BUDGET_MID,
                                                  MIX_SRC_CAP, q_budget_mix)

HIGH_TOK, MID_TOK, LOW_TOK = 50, 20, 6


def _doc(n_pairs: int) -> str:
    # "the data" * n: 50% stopwords, avg word len 4.5 — tier is then
    # purely a function of word count (>=40 high, >=15 mid, else low)
    return ("the data " * n_pairs).strip()


@pytest.fixture(scope="module")
def mix_dir(spark, tmp_path_factory):
    rows = []
    doc_id = 0

    def add(n_docs, n_pairs, source):
        nonlocal doc_id
        for _ in range(n_docs):
            text = _doc(n_pairs)
            rows.append((doc_id, text, "en", source, len(text)))
            doc_id += 1

    add(30, HIGH_TOK // 2, "hot")            # high tier, capped 30 -> 18
    for i in range(10):
        add(7, HIGH_TOK // 2, f"a{i}")       # high tier, under cap
    for i in range(20):
        add(10, MID_TOK // 2, f"m{i}")       # mid tier: 200 docs x 20 tok
    add(30, LOW_TOK // 2, "junk")            # low tier: never selected
    dst = tmp_path_factory.mktemp("mixcorpus")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{dst}/documents.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def selected(spark, mix_dir):
    return q_budget_mix(spark, mix_dir).collect()


def test_low_tier_never_selected(selected):
    assert {r["tier"] for r in selected} == {"high", "mid"}


def test_source_cap_truncates_hot_source(spark, mix_dir, selected):
    docs = spark.read.parquet(f"{mix_dir}/documents.parquet")
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    per_src = {}
    for r in selected:
        per_src[src[r["doc_id"]]] = per_src.get(src[r["doc_id"]], 0) + 1
    assert per_src["hot"] == MIX_SRC_CAP          # 30 -> 18, rest budgeted in
    assert max(per_src.values()) <= MIX_SRC_CAP


def test_high_tier_fits_budget_entirely(selected):
    high = [r for r in selected if r["tier"] == "high"]
    # 18 capped hot docs + 70 a* docs, 50 tokens each = 4400 <= 12000
    assert len(high) == MIX_SRC_CAP + 70
    assert sum(r["n_tokens"] for r in high) == (MIX_SRC_CAP + 70) * HIGH_TOK
    assert sum(r["n_tokens"] for r in high) <= MIX_BUDGET_HIGH


def test_mid_tier_cut_exactly_at_budget(selected):
    mid = [r for r in selected if r["tier"] == "mid"]
    # 200 equal 20-token docs vs a 3000 budget: exactly 150 kept, and the
    # boundary doc (cum == budget) is KEPT — <=, not <
    assert len(mid) == MIX_BUDGET_MID // MID_TOK
    assert sum(r["n_tokens"] for r in mid) == MIX_BUDGET_MID
    assert max(r["cum_tokens"] for r in mid) == MIX_BUDGET_MID


def test_cum_tokens_is_consistent(selected):
    for tier in ("high", "mid"):
        rows = sorted((r for r in selected if r["tier"] == tier),
                      key=lambda r: r["cum_tokens"])
        total = 0
        for r in rows:
            total += r["n_tokens"]
            assert r["cum_tokens"] == total


def test_plan_shape(spark, sf_dir):
    plan = q_budget_mix(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan          # offset frame broadcast
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # every per-row window is keyed by (tier, bucket)/(source[, salt]) —
    # never tier alone (the single-reducer prefix-sum shape); the only
    # tier-partitioned window runs on the 192-row bucket-totals frame,
    # downstream of the (tier, bucket) aggregation
    import re
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        if spec.startswith("tier") and "bucket" not in spec:
            pytest.fail(f"tier-only row window in plan: {spec}")


def _py_budget_select(rows, budgets, cap):
    """Brute-force reference: single-pass cap + cumulative budget in the
    exact (bucket, h, doc_id) selection order — no salting, no bucketed
    prefix decomposition. budget_select must match it row-for-row."""
    import hashlib

    def h(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)

    by_src = {}
    for r in rows:
        if r[3] > 0:
            by_src.setdefault(r[1], []).append(r)
    capped = []
    for rs in by_src.values():
        rs.sort(key=lambda r: (h(r[0]), r[0]))
        capped += rs[:cap]
    by_tier = {}
    for r in capped:
        by_tier.setdefault(r[2], []).append(r)
    sel = []
    for tier, rs in by_tier.items():
        rs.sort(key=lambda r: (h(r[0]) % 64, h(r[0]), r[0]))
        cum = 0
        for r in rs:
            cum += r[3]
            if cum <= budgets[tier]:
                sel.append((r[0], tier, r[3], cum))
    return sel


from hypothesis import given, settings, strategies as st  # noqa: E402

_docs_strategy = st.lists(
    st.tuples(st.sampled_from("abcd"),                  # source
              st.sampled_from(["high", "mid", "low"]),  # tier
              st.integers(0, 40)),                      # n_tokens (0 = out)
    min_size=1, max_size=60)


@settings(max_examples=30, deadline=None)
@given(_docs_strategy, st.integers(0, 300), st.integers(0, 150))
def test_fuzz_matches_python_reference(spark, docs, budget_high, budget_mid):
    """Random corpora, tiny cap (3) so the salted two-phase cap and the
    bucketed prefix-sum cutoff both truncate constantly; every selected
    row and its running total must equal the brute-force reference."""
    from ocr_module_spark.functions.textstats import budget_select

    rows = [(i, src, tier, n) for i, (src, tier, n) in enumerate(docs)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, tier string, n_tokens long")
    budgets = {"high": budget_high, "mid": budget_mid, "low": 0}
    got = sorted((r["doc_id"], r["tier"], r["n_tokens"], r["cum_tokens"])
                 for r in budget_select(df, budgets, cap=3).collect())
    assert got == sorted(_py_budget_select(rows, budgets, cap=3))

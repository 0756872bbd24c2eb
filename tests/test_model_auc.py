"""text_model_auc — exact tie-aware ROC-AUC of the model-score gate.

Pair-counting reference twin (incl. tie blocks), the closed-form
endpoints (perfect / inverted separation), degenerate single-class
NULL, hypothesis fuzz, and the census-before-window plan shape.
DuckDB value parity runs in tools/parity_check.py and
tests/test_hostile_parity.py.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_module_spark.functions.model_score import auc_frame, q_model_auc


def ref_auc(pairs):
    """(2U, n_pos, n_neg) by brute pair counting: each (pos, neg) pair
    contributes 2 when pos scores higher, 1 on a tie."""
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    u2 = sum(2 if p > n else (1 if p == n else 0)
             for p in pos for n in neg)
    return u2, len(pos), len(neg)


def _run(spark, pairs):
    scored = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(pairs)],
        "doc_id long, score_x1000 long")
    labels = spark.createDataFrame(
        [(i, l) for i, (_, l) in enumerate(pairs)],
        "doc_id long, label int")
    [r] = auc_frame(scored, labels).collect()
    return r


def test_tie_blocks_reference(spark):
    pairs = [(10, 1), (10, 0), (10, 1), (5, 0), (5, 1), (20, 0),
             (20, 1), (1, 0), (1, 0), (30, 1)]
    r = _run(spark, pairs)
    u2, np_, nn = ref_auc(pairs)
    assert (r["u_times2"], r["n_pos"], r["n_neg"]) == (u2, np_, nn)
    assert r["auc_x1000000"] == (u2 * 500000) // (np_ * nn)


def test_separation_endpoints(spark):
    perfect = [(s, 1) for s in (7, 8, 9)] + [(s, 0) for s in (1, 2)]
    assert _run(spark, perfect)["auc_x1000000"] == 1_000_000
    inverted = [(s, 0) for s in (7, 8, 9)] + [(s, 1) for s in (1, 2)]
    assert _run(spark, inverted)["auc_x1000000"] == 0


def test_single_class_is_null(spark):
    r = _run(spark, [(3, 1), (9, 1)])
    assert r["n_neg"] == 0 and r["auc_x1000000"] is None


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 6), st.integers(0, 1)),
                min_size=2, max_size=40))
def test_fuzz_vs_pair_counting(spark, pairs):
    r = _run(spark, pairs)
    u2, np_, nn = ref_auc(pairs)
    assert r["u_times2"] == u2
    if np_ and nn:
        assert r["auc_x1000000"] == (u2 * 500000) // (np_ * nn)
    else:
        assert r["auc_x1000000"] is None


def test_holdout_composition(spark, sf_dir):
    """The holdout row accounts for exactly the held-out fold's
    scoreable docs, and its AUC reads below the training-set AUC on
    this corpus (the generalization gap the operator exists to
    expose)."""
    from pyspark.sql import functions as F

    from ocr_module_spark.functions.model_score import (
        AUC_HOLDOUT_MOD, q_model_auc_holdout)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    held_scoreable = d.where(
        (F.pmod("doc_id", F.lit(AUC_HOLDOUT_MOD)) == 0)
        & (F.length(F.trim(F.coalesce("text", F.lit("")))) > 0)).count()
    [h] = q_model_auc_holdout(spark, sf_dir).collect()
    assert h["n_pos"] + h["n_neg"] == held_scoreable
    [t] = q_model_auc(spark, sf_dir).collect()
    assert h["auc_x1000000"] < t["auc_x1000000"]


def test_plan_census_before_window(spark, sf_dir):
    plan = (q_model_auc(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the one-partition running-sum window consumes the groupBy(score)
    # census (bounded integer grid), never per-document rows: below the
    # Window there must be an aggregate keyed on score
    below = plan.split("Window", 1)[1]
    assert "HashAggregate(keys=[score" in below

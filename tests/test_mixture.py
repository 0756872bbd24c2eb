"""curate_mixture_epochs — temperature-sampled mixture.

Pure-Python integer twin for the plan math and the per-doc lottery,
hypothesis fuzz over group masses, epoch-explode invariants,
cross-parallelism determinism, and plan shape (broadcast-only joins,
no doc-grain window, no Python). DuckDB value parity runs in
tools/parity_check.py and tests/test_hostile_parity.py.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_module_spark.functions.mixture import (EPOCH_CAP_X1000, SQRT_SCALE,
                                                doc_repeats,
                                                epoch_assignments,
                                                mixture_plan,
                                                q_mixture_epochs)


def ref_plan(masses: dict[str, int], budget: int,
             cap: int = EPOCH_CAP_X1000) -> dict[str, tuple[int, int]]:
    """{group: (target_tokens, epochs_x1000)} — the same integer ops in
    the same order (floor of correctly-rounded sqrt, long sums, int
    division)."""
    sw = {g: math.floor(math.sqrt(float(n)) * SQRT_SCALE)
          for g, n in masses.items()}
    total = sum(sw.values())
    out = {}
    for g, n in masses.items():
        target = (budget * sw[g]) // total
        out[g] = (target, min((target * 1000) // n, cap))
    return out


def ref_repeats(doc_id: int, epochs_x1000: int) -> int:
    lottery = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4],
                  16) % 1000
    return epochs_x1000 // 1000 + (1 if lottery < epochs_x1000 % 1000
                                   else 0)


def _stats(spark, masses):
    return spark.createDataFrame(
        [(g, 1, n) for g, n in sorted(masses.items())],
        "grp string, n_docs long, n_tokens long")


def test_plan_twin(spark):
    masses = {"en/high": 50_000, "en/mid": 9_000, "de/high": 400,
              "fr/mid": 31}
    got = {r["grp"]: (r["target_tokens"], r["epochs_x1000"])
           for r in mixture_plan(_stats(spark, masses),
                                 budget=20_000).collect()}
    assert got == ref_plan(masses, 20_000)
    # the tiny group is upsampled but capped; the huge one subsampled
    assert got["fr/mid"][1] == EPOCH_CAP_X1000
    assert got["en/high"][1] < 1000


@settings(max_examples=20, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b", "c", "d", "e"]),
                       st.integers(1, 10**9), min_size=1),
       st.integers(1000, 10**7))
def test_fuzz_plan_vs_reference(spark, masses, budget):
    got = {r["grp"]: (r["target_tokens"], r["epochs_x1000"])
           for r in mixture_plan(_stats(spark, masses),
                                 budget=budget).collect()}
    assert got == ref_plan(masses, budget)


DOCS = [(i, ["a", "b", "c"][i % 3], 5 + (i * 7) % 90) for i in range(120)]


def _docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, grp string, n_tokens long")


def test_repeats_twin(spark):
    rep = doc_repeats(_docs_df(spark), ("grp",), budget=4_000)
    masses = {}
    for _i, g, n in DOCS:
        masses[g] = masses.get(g, 0) + n
    plan = ref_plan(masses, 4_000)
    rows = rep.collect()
    assert len(rows) == len(DOCS)
    for r in rows:
        want_t, want_e = plan[r["grp"]]
        assert (r["target_tokens"], r["epochs_x1000"]) == (want_t, want_e)
        assert r["n_repeats"] == ref_repeats(r["doc_id"], want_e)


def test_epoch_explode(spark):
    rep = doc_repeats(_docs_df(spark), ("grp",), budget=4_000)
    eps = epoch_assignments(rep).collect()
    by_doc = {}
    for r in eps:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch_no"])
    want = {r["doc_id"]: r["n_repeats"] for r in rep.collect()
            if r["n_repeats"] > 0}
    assert set(by_doc) == set(want)
    for d, es in by_doc.items():
        assert sorted(es) == list(range(want[d])), d


def test_cross_parallelism_determinism(spark):
    base = _docs_df(spark)

    def rows(df):
        return sorted(tuple(r) for r in
                      doc_repeats(df, ("grp",), budget=4_000).collect())
    assert rows(base.coalesce(1)) == rows(base.repartition(11))


def test_pack_base_from_epochs(spark):
    """Mixture→packing bridge: the packed stream carries each doc once
    per repeat (distinct item ids), token coverage matches the
    reweighted corpus exactly, and the composed plan still has only
    packing's single window exchange."""
    from collections import defaultdict

    from ocr_module_spark.functions.mixture import pack_base_from_epochs
    from ocr_module_spark.functions.packing import pack_assignments

    docs = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", f"s{i % 3}", 5 + (i * 7) % 90)
         for i in range(120)],
        "doc_id long, grp string, source string, n_tokens long")
    rep = doc_repeats(docs, ("grp",), budget=9_000,
                      checkpoint=True)
    base = pack_base_from_epochs(rep)
    want_tokens = sum(r["n_tokens"] * r["n_repeats"] for r in rep.collect())
    plan = pack_assignments(base, 64)
    rows = plan.collect()
    assert sum(r["tok_end"] - r["tok_start"] for r in rows) == want_tokens
    per_item = defaultdict(int)
    for r in rows:
        per_item[r["doc_id"]] += r["tok_end"] - r["tok_start"]
    by_doc = defaultdict(set)
    for item in per_item:
        d, e = item.rsplit("#", 1)
        by_doc[d].add(int(e))
    want = {str(r["doc_id"]): r["n_repeats"] for r in rep.collect()
            if r["n_repeats"] > 0}
    assert {d: len(es) for d, es in by_doc.items()} == want
    # composed plan: joins stay broadcast (the mixture rejoin), and the
    # only doc-grain window partitions on the packing source key — the
    # mixture's own window is the group-grain single-partition one
    pplan = plan._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in pplan, pplan
    assert "BatchEvalPython" not in pplan, pplan
    assert "hashpartitioning(source" in pplan, pplan


def test_plan_shape(spark, sf_dir):
    plan = (q_mixture_epochs(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan       # broadcast-only rejoin
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # exchanges: stats groupBy pair, the single-partition group-grain
    # window, the broadcast, the final groupBy pair
    assert plan.count("Exchange") <= 5 * 2, plan

"""snapshot_diff — cross-snapshot corpus diff on fingerprints.
Status semantics (incl. the NULL-fingerprint null-safe-equality cases),
pure-Python fuzz twin, plan shape, DuckDB parity (testdata here,
hostile corpus via the hostile gate)."""

from __future__ import annotations

import pytest

from ocr_module_spark.functions.snapshots import (q_snapshot_diff,
                                                  snapshot_diff)

OLD = [(1, "a"), (2, "b"), (3, None), (4, "d"), (5, None)]
NEW = [(2, "b"), (3, None), (4, "D"), (5, "now"), (6, "f")]
WANT = {1: "removed",        # old only
        2: "unchanged",      # same fp
        3: "unchanged",      # NULL fp both sides: null-safe equal
        4: "changed",        # fp differs
        5: "changed",        # NULL -> value is a change
        6: "added"}          # new only


@pytest.fixture(scope="module")
def diff(spark):
    o = spark.createDataFrame(OLD, "doc_id long, fp string")
    n = spark.createDataFrame(NEW, "doc_id long, fp string")
    return {r["doc_id"]: r for r in snapshot_diff(o, n).collect()}


def test_status_semantics(diff):
    assert {k: r["status"] for k, r in diff.items()} == WANT
    assert diff[1]["fp_new"] is None and diff[6]["fp_old"] is None


def _py_diff(old: dict, new: dict) -> dict:
    out = {}
    for k in set(old) | set(new):
        if k not in old:
            out[k] = "added"
        elif k not in new:
            out[k] = "removed"
        else:
            out[k] = "unchanged" if old[k] == new[k] else "changed"
    return out


from hypothesis import given, settings, strategies as st  # noqa: E402

_snap = st.dictionaries(st.integers(0, 15),
                        st.sampled_from(["x", "y", None]), max_size=12)


@settings(max_examples=25, deadline=None)
@given(_snap, _snap)
def test_fuzz_matches_python_twin(spark, old, new):
    o = spark.createDataFrame(list(old.items()) or [(None, None)],
                              "doc_id long, fp string") \
        .where("doc_id IS NOT NULL")
    n = spark.createDataFrame(list(new.items()) or [(None, None)],
                              "doc_id long, fp string") \
        .where("doc_id IS NOT NULL")
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(o, n).collect()}
    assert got == _py_diff(old, new)


def test_plan_is_one_equi_join(spark, sf_dir):
    plan = (q_snapshot_diff(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan                   # the one equi-join


def test_duckdb_parity_on_testdata(spark, sf_dir):
    import duckdb

    from ocr_module_spark.functions.snapshots import SQL_SNAPSHOT_DIFF
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    s = sorted(tuple(r) for r in q_snapshot_diff(spark, sf_dir).collect())
    d = sorted(tuple(r) for r in con.sql(SQL_SNAPSHOT_DIFF).fetchall())
    con.close()
    assert s == d
    assert {r[0] for r in s} == {"added", "removed", "changed",
                                 "unchanged"}    # all statuses exercised

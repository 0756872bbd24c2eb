"""text_model_score — broadcast weights-table classifier scoring.
Constructed-corpus math pins, OOV accounting under a forced vocabulary
cut, plan shape (broadcast join, no token shuffle), DuckDB parity on
testdata (hostile corpus via the hostile gate)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.model_score import (W_MOD, W_NEUTRAL,
                                                    q_model_score,
                                                    score_frame,
                                                    weights_frame)


def _w(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:4], 16) % W_MOD


DOCS = [(1, "aa bb aa"), (2, "aa zz"), (3, "  "), (4, None), (5, "CC cc")]


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    weights = weights_frame(d, k=3)  # top-3: aa(3), cc(2), bb(1) or zz(1)?
    return d, weights


def test_weights_are_top_k_with_stable_ties(frames):
    _d, weights = frames
    got = {r["word"]: r["w_x1000"] for r in weights.collect()}
    # counts: aa=3, cc=2, bb=1, zz=1 — tie at 1 breaks by word: bb wins
    assert set(got) == {"aa", "cc", "bb"}
    assert got == {w: _w(w) for w in got}


def test_score_math_and_oov(frames):
    d, weights = frames
    got = {r["doc_id"]: r for r in score_frame(d, weights).collect()}
    assert set(got) == {1, 2, 5}        # empty/NULL docs don't score
    r1 = got[1]                          # aa bb aa
    s1 = (2 * _w("aa") + _w("bb")) // 3
    assert (r1["n_tokens"], r1["n_oov"], r1["score_x1000"]) == (3, 0, s1)
    assert r1["keep"] == (s1 > W_NEUTRAL)
    r2 = got[2]                          # aa + OOV zz (neutral prior)
    s2 = (_w("aa") + W_NEUTRAL) // 2
    assert (r2["n_tokens"], r2["n_oov"], r2["score_x1000"]) == (2, 1, s2)
    r5 = got[5]                          # case-folded: CC == cc
    assert (r5["n_tokens"], r5["n_oov"], r5["score_x1000"]) == \
        (2, 0, _w("cc"))


def test_plan_broadcast_join_no_token_shuffle(spark, sf_dir):
    plan = q_model_score(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # partial aggregation reduces the exploded tokens before the one
    # per-doc exchange
    assert "partial_count" in plan or "HashAggregate" in plan


def test_duckdb_parity(spark, sf_dir):
    import pathlib
    import sys

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.model_score import SQL_MODEL_SCORE

    df = q_model_score(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_MODEL_SCORE)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) > 0
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)

"""text_model_score — trained count-ratio weights + broadcast scoring.
Trainer vs a pure-Python twin, planted-separable-corpus recovery,
bit-determinism across partitionings, score/OOV math, plan shape
(broadcast join, no token shuffle), DuckDB parity on testdata (hostile
corpus via the hostile gate)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.model_score import (W_NEUTRAL,
                                                    q_model_score,
                                                    score_frame,
                                                    train_weights,
                                                    weights_frame)


def _ref_weights(docs: list[tuple[int, str | None]],
                 labels: dict[int, int], k: int) -> dict[str, int]:
    """Pure-Python twin of train_weights (whitespace split, lowercase,
    top-k by count desc / word asc, add-one count-ratio)."""
    n: Counter = Counter()
    n_pos: Counter = Counter()
    for doc_id, text in docs:
        if text is None or not text.strip():
            continue
        for w in text.strip().split():
            w = w.lower()
            n[w] += 1
            n_pos[w] += labels[doc_id]
    top = sorted(n.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {w: (2000 * (n_pos[w] + 1)) // (cnt + 2) for w, cnt in top}


DOCS = [(1, "aa bb aa"), (2, "aa zz"), (3, "  "), (4, None), (5, "CC cc")]
LABELS = {1: 1, 2: 0, 3: 0, 4: 0, 5: 1}


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    lab = spark.createDataFrame(list(LABELS.items()),
                                "doc_id long, label int")
    return d, lab, train_weights(d, lab, k=3)


def test_trainer_matches_pure_python_twin(frames):
    _d, _lab, weights = frames
    got = {r["word"]: r["w_x1000"] for r in weights.collect()}
    # counts: aa=3, cc=2, bb=1, zz=1 — tie at 1 breaks by word: bb wins
    assert got == _ref_weights(DOCS, LABELS, 3)
    assert set(got) == {"aa", "cc", "bb"}
    # aa: n=3, n_pos=2 (docs 1×2 label 1, doc 2 label 0) → 2000*3//5
    assert got["aa"] == (2000 * 3) // 5
    # cc: both occurrences in label-1 doc 5 → 2000*3//4 (toward 2000)
    assert got["cc"] == (2000 * 3) // 4
    # bb: one occurrence, label 1 → 2000*2//3
    assert got["bb"] == (2000 * 2) // 3


def test_trainer_bit_deterministic_across_partitionings(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string")
    lab = spark.createDataFrame(list(LABELS.items()),
                                "doc_id long, label int")
    a = {r["word"]: r["w_x1000"] for r in
         train_weights(d.repartition(1), lab, k=4).collect()}
    b = {r["word"]: r["w_x1000"] for r in
         train_weights(d.repartition(7), lab.repartition(3), k=4).collect()}
    assert a == b


def test_planted_separable_corpus_recovery(spark):
    """Weights trained on heuristic labels must recover a planted
    separation: marker words live only in gate-passing docs, junk words
    only in gate-failing ones — trained weights split them, and
    score_frame separates held-out docs on the neutral line."""
    stop = "the a and of to in is it on for"      # 10 stopwords
    good = " ".join(f"signal{i}" for i in range(10)) + " " + stop
    # 20 words, avg len fine, 50% stopwords → passes the Gopher gate
    bad = "zz qq"                                  # 2 words → fails gate
    rows = [(i, good) for i in range(8)] + \
           [(100 + i, bad) for i in range(8)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    w = {r["word"]: r["w_x1000"]
         for r in weights_frame(d, k=64).collect()}
    assert all(w[f"signal{i}"] > 1500 for i in range(10))
    assert w["zz"] < 500 and w["qq"] < 500
    held_out = spark.createDataFrame(
        [(900, "signal0 signal1 signal2"), (901, "zz qq zz")],
        "doc_id long, text string")
    weights = weights_frame(d, k=64)
    got = {r["doc_id"]: r for r in
           score_frame(held_out, weights).collect()}
    assert got[900]["keep"] and got[900]["score_x1000"] > W_NEUTRAL
    assert not got[901]["keep"] and got[901]["score_x1000"] < W_NEUTRAL


def test_score_math_and_oov(frames):
    d, _lab, weights = frames
    ref = _ref_weights(DOCS, LABELS, 3)
    got = {r["doc_id"]: r for r in score_frame(d, weights).collect()}
    assert set(got) == {1, 2, 5}        # empty/NULL docs don't score
    r1 = got[1]                          # aa bb aa
    s1 = (2 * ref["aa"] + ref["bb"]) // 3
    assert (r1["n_tokens"], r1["n_oov"], r1["score_x1000"]) == (3, 0, s1)
    assert r1["keep"] == (s1 > W_NEUTRAL)
    r2 = got[2]                          # aa + OOV zz (neutral prior)
    s2 = (ref["aa"] + W_NEUTRAL) // 2
    assert (r2["n_tokens"], r2["n_oov"], r2["score_x1000"]) == (2, 1, s2)
    r5 = got[5]                          # case-folded: CC == cc
    assert (r5["n_tokens"], r5["n_oov"], r5["score_x1000"]) == \
        (2, 0, ref["cc"])


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

"""BPE merge training: planted-corpus merge order, equivalence with a
pure-Python reference trainer, word-boundary isolation, encoder twin,
determinism across partitionings, and plan shape."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.bpe import (END, encode_word,
                                            initial_symbols, top_pair,
                                            train_bpe_merges)


def ref_train(texts, n_merges):
    """Pure-Python BPE trainer with identical tie/boundary semantics."""
    docs = []
    for t in texts:
        syms = []
        for word in (t or "").lower().split():
            syms += list(word[:-1]) + [word[-1] + END]
        if syms:
            docs.append(syms)
    merges = []
    for _ in range(n_merges):
        counts = Counter()
        for syms in docs:
            for x, y in zip(syms, syms[1:]):
                if not x.endswith(END):
                    counts[(x, y)] += 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        for d, syms in enumerate(docs):
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            docs[d] = res
    return merges


TEXTS = ["the cat sat on the mat", "the bat and the cat chat",
         "  ", None, "aaaa aaaa aa", "THE The the"]


def _df(spark, texts=TEXTS, repartition=None):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    return df.repartition(repartition, "doc_id") if repartition else df


def test_matches_python_reference_trainer(spark):
    got = train_bpe_merges(_df(spark), n_merges=6)
    assert got == ref_train(TEXTS, 6)
    assert len(got) == 6                       # corpus has ≥6 viable merges


def test_first_merge_is_the_planted_top_pair(spark):
    # 'the' appears 8x (case-folded) -> (t,h) and (h,e▁) both count 8;
    # the deterministic tie-break picks the lexicographically smaller
    got = train_bpe_merges(_df(spark), n_merges=1)
    assert got == [("h", "e" + END)]


def test_merges_never_cross_word_boundaries(spark):
    # 'a b' repeated: the only cross-word pair is (a▁, b▁); no
    # in-word pair exists, so training stops immediately
    df = _df(spark, ["a b a b a b a b"])
    assert train_bpe_merges(df, n_merges=3) == []


def test_deterministic_across_partitionings(spark):
    a = train_bpe_merges(_df(spark), n_merges=5)
    b = train_bpe_merges(_df(spark, repartition=7), n_merges=5)
    assert a == b


def test_encoder_twin_matches_trained_frame(spark):
    from ocr_module_spark.functions.bpe import apply_merge

    merges = train_bpe_merges(_df(spark), n_merges=6)
    frame = initial_symbols(_df(spark))
    for a, b in merges:
        frame = apply_merge(frame, a, b)
    got = {r["doc_id"]: list(r["syms"]) for r in frame.collect()}
    for i, t in enumerate(TEXTS):
        if not t or not t.strip():
            assert i not in got
            continue
        expect = []
        for w in t.lower().split():
            expect += encode_word(w, merges)
        assert got[i] == expect, i


def test_count_plan_shape(spark):
    frame = initial_symbols(_df(spark))
    pairs = frame.select(F.explode(F.expr(
        "filter(zip_with(syms, slice(syms, 2, size(syms) - 1),"
        " (a, b) -> struct(a, b)), p -> p.b IS NOT NULL"
        f" AND NOT endswith(p.a, '{END}'))")).alias("p"))
    agg = pairs.groupBy("p").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan        # counting is pure JVM
    assert "partial_count" in plan or "HashAggregate" in plan

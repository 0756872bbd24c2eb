"""text_langid_eval — trained char-trigram language-ID.
Trainer + scorer vs a pure-Python twin, planted-separable-language
recovery on held-out docs, bit-determinism across partitionings,
OOV/'und' semantics on hostile text, plan shape (broadcast grid, no
cartesian). DuckDB value parity runs in the hostile gate
(tests/test_hostile_parity.py) and on testdata below."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.langid import (GRAM_N, SCALE, VOCAB_K,
                                               langid_score_frame,
                                               q_langid_eval,
                                               train_langid_weights)


def _grams(text: str | None) -> list[str]:
    """Twin of _gram_frame's normalization: space-only trim (Spark/DuckDB
    trim semantics), ASCII-\\s collapse, lowercase, char trigrams."""
    if text is None:
        return []
    s = re.sub(r"[ \t\n\r\f\v]+", " ", text.strip(" ").lower())
    if len(s) < GRAM_N:
        return []
    return [s[i:i + GRAM_N] for i in range(len(s) - GRAM_N + 1)]


def _ref_weights(docs: list[tuple[int, str | None, str | None]],
                 k: int = VOCAB_K):
    """Pure-Python twin of train_langid_weights: (gram,lang) counts over
    labeled docs, top-k vocab by (total desc, gram asc), full smoothed
    posterior grid in integer fixed point."""
    c: Counter = Counter()
    for _id, text, lang in docs:
        if lang is None:
            continue
        for g in _grams(text):
            c[(g, lang)] += 1
    tot: Counter = Counter()
    for (g, _l), n in c.items():
        tot[g] += n
    vocab = sorted(tot.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    langs = sorted({l for (_g, l) in c})
    return {(g, l): (SCALE * (c[(g, l)] + 1)) // (n_g + len(langs))
            for g, n_g in vocab for l in langs}, langs


def _ref_preds(docs, wt, langs):
    """Pure-Python twin of langid_score_frame."""
    out = {}
    for doc_id, text, _lang in docs:
        sums: dict = {}
        n_in = n_oov = 0
        for g in _grams(text):
            if any((g, l) in wt for l in langs):
                n_in += 1
                for l in langs:
                    sums[l] = sums.get(l, 0) + wt[(g, l)]
            else:
                n_oov += 1
        if not sums:
            continue
        lang, sum_w = sorted(sums.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        out[doc_id] = (n_in + n_oov, n_oov, lang, sum_w // n_in)
    return out


DOCS = [
    (1, "aba bab aba", "aa"),
    (2, "xyz zyx xyz zyx", "xx"),
    (3, "aba xyz", "aa"),
    (4, "  ", "aa"),           # too short after trim: no grams
    (5, None, "xx"),           # NULL text
    (6, "aba bab", None),      # unlabeled: excluded from training
    (7, "qqq www qqq", "aa"),  # in-test OOV source when k is small
]


@pytest.fixture(scope="module")
def frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    return d, train_langid_weights(d)


def test_trainer_matches_pure_python_twin(frames):
    _d, weights = frames
    got = {(r["gram"], r["lang"]): r["w_x1000"] for r in weights.collect()}
    want, langs = _ref_weights(DOCS)
    assert got == want
    assert langs == ["aa", "xx"]
    # full grid: every vocab gram has a row for EVERY language
    grams = {g for (g, _l) in got}
    assert all((g, l) in got for g in grams for l in langs)
    # per-gram posteriors sum to ~SCALE (within floor-division slack)
    for g in grams:
        s = sum(got[(g, l)] for l in langs)
        assert SCALE - len(langs) <= s <= SCALE


def test_scorer_matches_pure_python_twin(frames):
    d, weights = frames
    got = {r["doc_id"]: (r["n_grams"], r["n_oov"], r["pred_lang"],
                         r["score_x1000"])
           for r in langid_score_frame(d, weights).collect()}
    wt, langs = _ref_weights(DOCS)
    assert got == _ref_preds(DOCS, wt, langs)
    # gram-less docs are absent, everything else predicted
    assert set(got) == {1, 2, 3, 6, 7}
    assert got[1][2] == "aa" and got[2][2] == "xx"


def test_bit_determinism_across_partitionings(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, text string, lang string")
    a = {(r["gram"], r["lang"]): r["w_x1000"]
         for r in train_langid_weights(d.repartition(1)).collect()}
    b = {(r["gram"], r["lang"]): r["w_x1000"]
         for r in train_langid_weights(d.repartition(7)).collect()}
    assert a == b


def test_planted_separable_languages_recovered(spark):
    """Three synthetic languages with disjoint character inventories:
    train on one half, predict the held-out half perfectly; an
    alien-alphabet doc is all-OOV and rolls up to 'und'."""
    vocab = {"al": ["aba", "bcb", "cac", "abc"],
             "be": ["fgf", "ghg", "hfh", "fgh"],
             "ga": ["123", "231", "312", "132"]}
    rows = []
    i = 0
    for lang, words in vocab.items():
        for rep in range(6):
            text = " ".join(words[(rep + j) % len(words)] for j in range(5))
            # half labeled (train), half labeled too but held out by id
            rows.append((i, text, lang))
            i += 1
    train = [r for r in rows if r[0] % 2 == 0]
    held = [r for r in rows if r[0] % 2 == 1]
    dtr = spark.createDataFrame(train,
                                "doc_id long, text string, lang string")
    dhe = spark.createDataFrame(held + [(99, "zzz yyy zzz", "al")],
                                "doc_id long, text string, lang string")
    w = train_langid_weights(dtr)
    preds = {r["doc_id"]: r for r in
             langid_score_frame(dhe, w).collect()}
    for doc_id, _text, lang in held:
        assert preds[doc_id]["pred_lang"] == lang, doc_id
        assert preds[doc_id]["n_oov"] == 0
    assert 99 not in preds                       # all grams alien → no row
    ev = (dhe.join(langid_score_frame(dhe, w)
                   .select("doc_id", "pred_lang"), "doc_id", "left")
          .select(F.coalesce("pred_lang", F.lit("und")).alias("p"))
          .where("p = 'und'").count())
    assert ev == 1                               # exactly the alien doc


def test_oov_counting_on_mixed_doc(spark):
    """A doc mixing in-vocab and out-of-vocab grams counts both sides;
    score divides by in-vocab grams only."""
    train = [(1, "aaaa", "aa")]                  # vocab = {'aaa'} (x2)
    dtr = spark.createDataFrame(train,
                                "doc_id long, text string, lang string")
    w = train_langid_weights(dtr)
    # 'aaab': grams aaa, aab, abn... -> 'aaa','aab' ; one hit, one miss
    dsc = spark.createDataFrame([(2, "aaab", "aa")],
                                "doc_id long, text string, lang string")
    r = langid_score_frame(dsc, w).collect()[0]
    assert (r["n_grams"], r["n_oov"]) == (2, 1)
    assert r["pred_lang"] == "aa"
    # single lang: w = SCALE*(n_gl+1) // (n_g + 1) = 1000*3 // 3
    assert r["score_x1000"] == SCALE


def test_eval_plan_has_no_scale_killers(spark, sf_dir):
    plan = (q_langid_eval(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # exactly the two deliberate grid cross-products (vocab x langs x
    # 1-row count), both broadcast-bounded model-sized build sides
    assert plan.count("BroadcastNestedLoopJoin") == 2
    assert "BroadcastHashJoin" in plan           # counts + scoring joins


from hypothesis import given, settings, strategies as st  # noqa: E402

# short texts over a tiny alphabet incl. whitespace variety and a char
# above ASCII; lang labels incl. None (unlabeled rows)
_corpus_strategy = st.lists(
    st.tuples(st.text(alphabet="ab1 \tø", max_size=12),
              st.sampled_from(["aa", "xx", None])),
    min_size=1, max_size=14)


@settings(max_examples=25, deadline=None)
@given(_corpus_strategy, st.integers(1, 6))
def test_fuzz_matches_python_twin(spark, docs, k):
    """Random tiny corpora with a tiny vocabulary cap (so top-k
    truncation and its (count desc, gram asc) tie-break fire
    constantly): trained grid AND per-doc predictions must equal the
    pure-Python twin exactly."""
    rows = [(i, t, lang) for i, (t, lang) in enumerate(docs)]
    d = spark.createDataFrame(rows,
                              "doc_id long, text string, lang string")
    w = train_langid_weights(d, k=k)
    got_w = {(r["gram"], r["lang"]): r["w_x1000"] for r in w.collect()}
    want_w, langs = _ref_weights(rows, k=k)
    assert got_w == want_w
    got_p = {r["doc_id"]: (r["n_grams"], r["n_oov"], r["pred_lang"],
                           r["score_x1000"])
             for r in langid_score_frame(d, w).collect()}
    assert got_p == _ref_preds(rows, want_w, langs)


def test_duckdb_parity_on_testdata(spark, sf_dir):
    import duckdb

    from ocr_module_spark.functions.langid import SQL_LANGID_EVAL
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    s = sorted(tuple(r) for r in q_langid_eval(spark, sf_dir).collect())
    d = sorted(tuple(r) for r in con.sql(SQL_LANGID_EVAL).fetchall())
    con.close()
    assert s == d

"""text_badwords — C4-style policy-wordlist document filter.

Pure-Python twin on planted edges (NULL/empty text, case folding,
repeated words counted once, substrings NOT matched — whole-token
semantics), custom-list parameterization incl. quote escaping in the
SQL builder, and plan shape (zero exchanges, the list rides as a
constant). DuckDB value parity runs in tools/parity_check.py and
tests/test_hostile_parity.py.
"""

from __future__ import annotations

import duckdb

from ocr_module_spark.functions.badwords import (badwords_flags,
                                                 q_text_badwords, _sql)

PLANTED = [
    (1, "the DUP stream flows"),        # case-folded: dup + stream
    (2, "duplicate streams"),           # substrings only: clean
    (3, "dup dup dup"),                 # repeats count once
    (4, ""),                            # empty
    (5, None),                          # NULL
    (6, "skew"),                        # single exact token
]


def ref_flags(rows, words):
    out = {}
    for _id, text in rows:
        toks = set(text.lower().split()) if text and text.strip() else set()
        n = len(toks & set(words))
        out[_id] = (n, n > 0)
    return out


def test_reference_twin(spark):
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bad_words"], r["bad_flag"])
           for r in badwords_flags(df, ["dup", "stream", "skew"]).collect()}
    assert got == ref_flags(PLANTED, ["dup", "stream", "skew"])
    assert got[1] == (2, True)
    assert got[2] == (0, False)
    assert got[3] == (1, True)


def test_custom_list_and_sql_escaping(spark):
    words = ["o'brien", "streams"]
    df = spark.createDataFrame(PLANTED, "doc_id long, text string")
    got = {r["doc_id"]: r["bad_flag"]
           for r in badwords_flags(df, words).collect()}
    assert got == {i: f for i, (_, f) in ref_flags(PLANTED, words).items()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", PLANTED)
    drows = {r[0]: r[2] for r in con.execute(_sql(words)).fetchall()}
    assert drows == got


def test_demo_query_is_discriminative(spark, sf_dir):
    rows = q_text_badwords(spark, sf_dir).collect()
    flagged = sum(r["bad_flag"] for r in rows)
    assert 0 < flagged < len(rows)


def test_plan_zero_exchange(spark, sf_dir):
    plan = (q_text_badwords(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan

"""Gopher repetition signals + PII scrubbing on CONSTRUCTED corpora.

The synthetic testdata has no newlines and no PII, so the driver's
parity row exercises only the word-gram family. These tests plant the
missing structure — duplicated lines, dominant 2-grams, overlapping
5-gram repetition, emails/IPv4s/phones — assert the exact hand-computed
values, and re-run the same cross-engine DuckDB parity the driver uses
(value_hash over name-sorted columns) on each constructed corpus.
"""

from __future__ import annotations

import pathlib
import sys

import duckdb
import pandas as pd
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

from ocr_module_spark.functions import textstats  # noqa: E402


def _write_docs(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    return con


def _parity(spark_df, con, sql):
    from parity_check import value_hash
    s_cols, s_rows = spark_df.columns, [tuple(r) for r in spark_df.collect()]
    res = con.sql(sql)
    d_cols, d_rows = res.columns, res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert value_hash(s_rows, s_cols) == value_hash(d_rows, d_cols)
    return {r[0]: dict(zip(s_cols, r)) for r in s_rows}


REP_DOCS = [
    # 3 non-empty lines, one duplicated pair -> dup_line_x10k = 3333
    (0, "alpha beta gamma\nalpha beta gamma\nx y z", "en"),
    # dominant 2-gram "spam ham" x3 of 5 grams; 26 chars, covered 3*8=24
    (1, "spam ham spam ham spam ham", "en"),
    # all-unique words: top2_count 1, dup5 0
    (2, "one two three four five six seven", "en"),
    # extreme repetition: covered chars exceed n_chars -> capped at 10000
    (3, "x x x x x x x x", "en"),
    # degenerate sizes
    (4, "", "en"),
    (5, "word", "en"),
    (6, None, "en"),
    # 5-gram repetition: "a b c d e" twice (sliding windows overlap)
    (7, "a b c d e a b c d e", "en"),
]


def test_repetition_values_and_parity(spark, tmp_path):
    sf = _write_docs(tmp_path, REP_DOCS)
    df = textstats.q_repetition(spark, sf)
    got = _parity(df, _duck(sf), textstats.SQL_REPETITION)

    assert got[0]["n_lines"] == 3
    assert got[0]["dup_line_x10k"] == 3333          # 10000*1//3

    assert got[1]["top2_gram"] == "spam ham"
    assert got[1]["top2_count"] == 3
    assert got[1]["top2_char_x10k"] == 10000 * 24 // 26

    assert got[2]["top2_count"] == 1
    assert got[2]["dup5_char_x10k"] == 0

    assert got[3]["top2_char_x10k"] == 10000        # capped
    assert got[3]["top2_gram"] == "x x"

    assert got[4]["n_words"] == 0 and got[4]["top2_gram"] is None
    assert got[5]["top2_count"] == 0
    assert got[6]["n_words"] is None                # NULL text propagates

    # doc 7: 19 chars, 6 5-grams, "a b c d e" twice -> dupsum 2*9=18
    assert got[7]["dup5_char_x10k"] == 10000 * 18 // 19


def test_repetition_tiebreak_smallest_gram(spark, tmp_path):
    # "b a" and "a b" both occur twice; the winner must be the
    # lexicographically smallest max-count gram in BOTH engines
    sf = _write_docs(tmp_path, [(0, "b a b a b", "en")])
    df = textstats.q_repetition(spark, sf)
    got = _parity(df, _duck(sf), textstats.SQL_REPETITION)
    assert got[0]["top2_gram"] == "a b"
    assert got[0]["top2_count"] == 2


PII_DOCS = [
    (0, "contact alice.smith+x@example.co.uk or bob@test.io today", "en"),
    (1, "server at 10.0.0.1 and 192.168.255.254 rebooted", "en"),
    (2, "call +1 555-123-4567 or 020 7946 0958 now", "en"),
    (3, "mixed: a@b.io from 8.8.8.8 dial 555-867-5309", "en"),
    (4, "no pii here just words", "en"),
    (5, None, "en"),
    (6, "", "en"),
]


def test_pii_counts_and_parity(spark, tmp_path):
    sf = _write_docs(tmp_path, PII_DOCS)
    df = textstats.q_quality_score(spark, sf)
    got = _parity(df, _duck(sf), textstats.SQL_QUALITY_SCORE)

    assert got[0]["n_pii_email"] == 2
    assert got[1]["n_pii_ipv4"] == 2
    assert got[2]["n_pii_phone"] == 2
    assert (got[3]["n_pii_email"], got[3]["n_pii_ipv4"],
            got[3]["n_pii_phone"]) == (1, 1, 1)
    assert got[4]["n_pii_email"] == 0
    assert got[5]["n_pii_email"] is None            # NULL text propagates


def test_pii_scrub_redacts_in_order(spark, tmp_path):
    sf = _write_docs(tmp_path, PII_DOCS)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r["text"]
           for r in textstats.pii_scrub(docs).collect()}
    assert out[0] == "contact <EMAIL> or <EMAIL> today"
    assert out[1] == "server at <IP> and <IP> rebooted"
    assert out[2] == "call <PHONE> or <PHONE> now"
    assert out[3] == "mixed: <EMAIL> from <IP> dial <PHONE>"
    assert out[4] == "no pii here just words"
    assert out[5] is None and out[6] == ""


def test_curated_scrub_dial(spark, tmp_path):
    # curated_from_audit(scrub=True) redacts; n_tokens stays the
    # PRE-redaction count (token budget must not move with the dial)
    from ocr_module_spark.curate import curated_from_audit
    audit = spark.createDataFrame(
        [("u1", "mail me a@b.io now", True, True, False, True)],
        "url string, text string, quality_keep boolean, "
        "dup_keep boolean, contaminated boolean, kept boolean")
    raw = curated_from_audit(audit).first()
    scrubbed = curated_from_audit(audit, scrub=True).first()
    assert raw["text"] == "mail me a@b.io now"
    assert scrubbed["text"] == "mail me <EMAIL> now"
    assert raw["n_tokens"] == scrubbed["n_tokens"] == 4


def test_repetition_plan_shuffle_free(spark, sf_dir):
    plan = (textstats.q_repetition(spark, sf_dir)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

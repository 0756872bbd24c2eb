"""Unicode normalization + mojibake repair: kernel policy pins, a
hypothesis round-trip fuzz of the repair codec loop, Spark == pure-
Python-twin equality on an adversarial frame (incl. NULLs), an inline
DuckDB value oracle for the canon pass, and a zero-exchange plan pin.
The hostile corpus runs the same oracled query cross-engine through
tests/test_hostile_parity.py."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_module_spark.functions.textnorm import (
    SQL_TEXT_NORMALIZE, canon_str, normalize_docs, normalized_frame,
    q_text_normalize, repair_mojibake_str)

SF = "/root/testdata/sf0.001"


# -- canon kernel policy ------------------------------------------------

def test_canon_policy():
    # CRLF/CR -> LF, two-step (no double newline)
    assert canon_str("a\r\nb\rc") == "a\nb\nc"
    # C0 stripped except \t\n; DEL + C1 stripped
    assert canon_str("a\x00b\x08c\td\ne\x7ff\x93g") == "abc\td\nefg"
    # ZWSP + BOM stripped; ZWNJ/ZWJ kept (orthographic)
    assert canon_str("\ufeffa\u200bb\u200cc\u200dd") == "ab\u200cc\u200dd"
    # space zoo -> ASCII space, runs NOT collapsed, no trim
    assert canon_str(" x\u00a0y\u2003z\u3000 ") == " x y z  "
    # NFD -> NFC, after the strips (ZWSP between base+mark composes)
    assert canon_str("cafe\u0301") == "café"
    assert canon_str("e\u200b\u0301") == "\u00e9"
    assert canon_str(None) is None
    assert canon_str("") == ""
    # idempotent on its own output
    for s in ["a\r\nb", "cafe\u0301", " x\u00a0y ", "plain"]:
        once = canon_str(s)
        assert canon_str(once) == once


def test_repair_policy():
    # the classic: UTF-8 read as cp1252/latin-1
    assert repair_mojibake_str("cafÃ©") == ("café", True)
    # cp1252 punctuation mojibake (curly quote via 0x93-hole-free path)
    assert repair_mojibake_str("â€œquoteâ€\x9d") == ("“quote”", True)
    # doubly-encoded undoes twice
    double = "café".encode("utf-8").decode("latin-1") \
                   .encode("utf-8").decode("latin-1")
    assert repair_mojibake_str(double) == ("café", True)
    # genuine accented text never false-repairs (strict decode fails)
    for clean in ["déjà vu café", "naïve — résumé", "ascii only",
                  "日本語テキスト", "emoji 🚀 ok", ""]:
        assert repair_mojibake_str(clean) == (clean, False)
    assert repair_mojibake_str(None) == (None, False)


_SAFE = st.text(
    alphabet=st.sampled_from(
        list("abc XYZ0.,!?") + list("éüñßàç") + list("日本語中文한")
        + ["🚀", "🎉", "\u0301"]),
    min_size=0, max_size=40)


@settings(max_examples=200, deadline=None)
@given(_SAFE)
def test_repair_roundtrip_fuzz(s):
    # seeds that already look repairable are the mojibake themselves —
    # the round-trip property is defined on non-mojibake cleartext
    if repair_mojibake_str(s)[0] != s:
        return
    # latin-1 misdecode path (total: every byte decodes)
    m = s.encode("utf-8").decode("latin-1")
    assert repair_mojibake_str(m)[0] == s
    # cp1252 misdecode path (partial: skip seeds hitting the 5 holes)
    try:
        m2 = s.encode("utf-8").decode("cp1252")
    except UnicodeDecodeError:
        return
    assert repair_mojibake_str(m2)[0] == s


@settings(max_examples=100, deadline=None)
@given(_SAFE)
def test_canon_idempotent_fuzz(s):
    once = canon_str(s)
    assert canon_str(once) == once


# -- Spark == twin, inline DuckDB oracle, plan --------------------------

ROWS = [
    (0, "plain ascii"),
    (1, None),
    (2, ""),
    (3, "a\r\nb\rc\x00\x08\x7f\x93"),
    (4, "\ufeffcafe\u0301 over\u200bthere\u00a0now\u3000end"),
    (5, "cafÃ© â€” naÃ¯ve"),            # mojibake (repair path only)
    (6, "zw\u200cj\u200dkept"),
    (7, "x" * 2000 + "\u2003tail"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_normalized_frame_matches_twin(spark, frame):
    got = {r["doc_id"]: r for r in
           normalized_frame(frame, repair=False).collect()}
    assert len(got) == len(ROWS)
    for doc_id, s in ROWS:
        r = got[doc_id]
        if s is None:
            assert r["norm_text"] is None and r["changed"] is None \
                and r["n_removed"] is None and r["nfc_changed"] is None
            continue
        assert r["norm_text"] == canon_str(s)
        assert r["changed"] == (canon_str(s) != s)


def test_normalized_frame_repair_on(spark, frame):
    got = {r["doc_id"]: r["norm_text"] for r in
           normalized_frame(frame, repair=True).collect()}
    assert got[5] == canon_str(repair_mojibake_str(ROWS[5][1])[0]) \
        == "café — naïve"
    # repair is a no-op on clean rows: same as repair=False
    assert got[4] == canon_str(ROWS[4][1])


def test_normalize_docs_passthrough(spark):
    df = spark.createDataFrame(
        [(0, "cafÃ©", "en"), (1, "a\r\nb", "de"), (2, None, None)],
        "doc_id long, text string, lang string")
    rows = {r["doc_id"]: r for r in normalize_docs(df).collect()}
    assert rows[0]["text"] == "café" and rows[0]["norm_repaired"] \
        and rows[0]["norm_changed"] and rows[0]["lang"] == "en"
    assert rows[1]["text"] == "a\nb" and not rows[1]["norm_repaired"] \
        and rows[1]["norm_changed"] and rows[1]["lang"] == "de"
    assert rows[2]["text"] is None \
        and rows[2]["norm_repaired"] is None \
        and rows[2]["norm_changed"] is None


def test_inline_duckdb_oracle(spark, frame):
    """Spark (Python unicodedata/re) == DuckDB (utf8proc/RE2) on the
    adversarial frame — the same gate the hostile corpus runs, but on
    rows chosen to hit every canon step."""
    con = duckdb.connect()
    documents = pd.DataFrame(ROWS, columns=["doc_id", "text"])
    con.register("documents", documents)
    want = {r[0]: r for r in
            con.execute(SQL_TEXT_NORMALIZE
                        + " ORDER BY doc_id").fetchall()}
    got = {r["doc_id"]: r for r in
           normalized_frame(frame, repair=False).collect()}
    assert set(want) == set(got)
    for k, w in want.items():
        g = got[k]
        assert (g["norm_text"], g["n_removed"], g["nfc_changed"],
                g["changed"]) == (w[1], w[2], w[3], w[4]), k


def test_plan_zero_exchanges(spark):
    plan = q_text_normalize(spark, SF)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan   # Arrow runner, not row-UDF

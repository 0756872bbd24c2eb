"""Host-level boilerplate line stripping (functions/linededup.py).

The sf corpora carry no newlines, so the DuckDB parity there (hostile
gate + the q_ entry) pins only shape/NULL semantics; the DISCRIMINATIVE
gate is here — a planted-boilerplate corpus where Spark, DuckDB, and a
pure-Python twin must agree byte-for-byte, plus hypothesis fuzz of the
twin against DuckDB and plan pins (broadcast flag join, no SMJ/BNLJ on
the text side).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_module_spark.functions.linededup import (
    MIN_DOCS, MIN_PCT, SQL_BOILERPLATE_LINES, q_boilerplate_lines,
    strip_boilerplate_lines)

COOKIE = "We use cookies to improve your experience"
SHARE = "Share this article  "          # trailing spaces: trim-key match
UNIQ = "paragraph %02d of page %02d"


def _corpus():
    """3 hosts x 8 docs; hosts a/b plant boilerplate, host c is clean."""
    rows = []
    for h, host in enumerate(("a", "b", "c")):
        for d in range(8):
            lines = [UNIQ % (j, d) for j in range(3)]
            if host == "a":                     # 8/8 docs: flagged
                lines.insert(0, COOKIE)
                lines.append(SHARE)
            if host == "b" and d < 2:           # 2/8 docs: under min_docs
                lines.insert(1, COOKIE)
            lines.insert(2, "   ")              # whitespace line: kept
            rows.append((h * 100 + d, host, "\n".join(lines)))
    rows += [(900, "a", None), (901, None, COOKIE), (902, "a", "")]
    return rows


def twin(rows, min_docs=MIN_DOCS, min_pct=MIN_PCT):
    """Single-threaded reference. NOTE ``.strip(' ')`` — Spark/DuckDB
    ``trim`` removes SPACES only, not general whitespace."""
    grp_docs, line_docs = defaultdict(set), defaultdict(set)
    for did, src, text in rows:
        if src is not None and did is not None:
            grp_docs[src].add(did)
        if src is None or text is None or did is None:
            continue
        for l in set(text.split("\n")):
            t = l.strip(" ")
            if t:
                line_docs[(src, t)].add(did)
    flagged = {k for k, v in line_docs.items()
               if len(v) >= min_docs
               and len(v) * 100 >= min_pct * len(grp_docs[k[0]])}
    out = {}
    for did, src, text in rows:
        if text is None:
            out[did] = (None, None, None)
            continue
        lines = text.split("\n")
        kept = [l for l in lines
                if l.strip(" ") == "" or (src, l.strip(" ")) not in flagged]
        out[did] = (len(lines), len(kept), "\n".join(kept))
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["doc_id"]: r.asDict()
           for r in strip_boilerplate_lines(df).collect()}
    return rows, got


def test_spark_equals_twin_on_planted(planted):
    rows, got = planted
    want = twin(rows)
    assert set(got) == set(want)
    for did, (nl, nk, clean) in want.items():
        g = got[did]
        assert (g["n_lines"], g["n_lines_kept"], g["text_clean"]) \
            == (nl, nk, clean), did


def test_boilerplate_removed_uniques_kept(planted):
    rows, got = planted
    # host a: cookie + share stripped everywhere, uniques byte-identical
    for d in range(8):
        t = got[d]["text_clean"]
        assert COOKIE not in t and SHARE.strip(" ") not in t
        assert UNIQ % (0, d) in t and "   " in t     # whitespace line kept
    # host b: 2/8 docs under min_docs=3 — cookie SURVIVES there
    assert COOKIE in got[100]["text_clean"]
    # host c untouched
    assert got[200]["text_clean"] == rows[16][2]
    # NULL text / NULL source / empty text grain preserved
    assert got[900]["text_clean"] is None
    assert got[901]["text_clean"] == COOKIE         # NULL group: never flagged
    assert got[902]["text_clean"] == "" and got[902]["n_lines"] == 1


def test_duckdb_parity_on_planted(spark, planted, tmp_path):
    rows, got = planted
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    pq = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    oracle = {r[0]: r for r in con.execute(SQL_BOILERPLATE_LINES).fetchall()}
    con.close()
    import hashlib
    for did, g in got.items():
        o = oracle[did]
        omd5 = (hashlib.md5(g["text_clean"].encode()).hexdigest()
                if g["text_clean"] is not None else None)
        assert (g["n_lines"], g["n_lines_kept"], omd5) == (o[1], o[2], o[3])


_line = st.sampled_from(["boil", "x", "yy", " pad ", "\tq", ""])
_doc = st.lists(_line, min_size=0, max_size=5).map("\n".join)


@settings(max_examples=60, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["s1", "s2", None]),
              st.one_of(st.none(), _doc)),
    min_size=0, max_size=24))
def test_fuzz_twin_equals_duckdb(corpus):
    rows = [(i, src, text) for i, (src, text) in enumerate(corpus)]
    want = twin(rows)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, source VARCHAR,"
                " text VARCHAR)")
    if rows:
        con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    for did, nl, nk, _md5 in con.execute(SQL_BOILERPLATE_LINES).fetchall():
        assert (nl, nk) == want[did][:2], did
    con.close()


def test_chain_strip_boiler_stage(spark):
    """curated_from_audit(strip_boiler=True): host-grouped boilerplate
    lines leave the kept text and the token budget; per-doc unique
    lines and other hosts stay byte-identical."""
    from ocr_module_spark import curate
    banner = "subscribe banner"
    rows = [(f"https://h1.example/p{d}",
             f"{banner}\nunique h1 {d}", True) for d in range(4)]
    rows += [(f"https://h2.example/p{d}",
              f"{banner}\nunique h2 {d}", True) for d in range(2)]
    rows += [("https://h1.example/dropped", banner, False)]
    audit = spark.createDataFrame(
        [(u, t, k, k, False, k) for u, t, k in rows],
        "url string, text string, quality_keep boolean, dup_keep boolean,"
        " contaminated boolean, kept boolean")
    out = {r["url"]: r for r in curate.curated_from_audit(
        audit, strip_boiler=True).collect()}
    assert len(out) == 6                      # dropped doc stays dropped
    for d in range(4):                        # h1: 4/4 docs -> stripped
        r = out[f"https://h1.example/p{d}"]
        assert r["text"] == f"unique h1 {d}" and r["n_tokens"] == 3
    for d in range(2):                        # h2: 2 docs < min_docs=3
        r = out[f"https://h2.example/p{d}"]
        assert r["text"] == f"{banner}\nunique h2 {d}"


# -- line-quality filter (C4/RefinedWeb line-wise rules) ----------------------

from ocr_module_spark.functions.linededup import (  # noqa: E402
    DOC_DROP_PCT, LINE_MAX_DIGIT_PCT, LINE_MAX_UPPER_PCT, LINE_MIN_WORDS,
    POLICY_PHRASES, SQL_LINE_QUALITY, line_quality_filter, q_line_quality)


def _keep_twin(l: str) -> bool:
    import re
    t = l.strip(" ")
    if t == "":
        return True
    n_words = len(re.split(r"\s+", t))
    n_upper = len(re.sub("[^A-Z]", "", t))
    n_alpha = len(re.sub("[^A-Za-z]", "", t))
    n_digit = len(re.sub("[^0-9]", "", t))
    r1 = n_words < LINE_MIN_WORDS and t[-1] not in '.!?"'
    r2 = n_alpha > 0 and n_upper * 100 > LINE_MAX_UPPER_PCT * n_alpha
    r3 = n_digit * 100 > LINE_MAX_DIGIT_PCT * len(t)
    low = t.lower()
    r4 = any(p in low for p in POLICY_PHRASES)
    return not (r1 or r2 or r3 or r4)


def _filter_twin(text):
    if text is None:
        return (None, None, None, None)
    lines = text.split("\n")
    kept = [l for l in lines if _keep_twin(l)]
    nl, nk = len(lines), len(kept)
    return (nl, nk, (nl - nk) * 100 > DOC_DROP_PCT * nl, "\n".join(kept))


LQ_ROWS = [
    (1, "This is a fine sentence.\nHOME ABOUT CONTACT\n2024 12 31\n"
        "Sign in to continue\nshort frag\nGood ending!\n   \n"
        "Click here now"),
    (2, None),
    (3, ""),
    (4, "ok.\nOK!\na b c d e plain line without punct"),
    (5, "Home\nMenu\nSearch"),               # all nav fragments -> doc_drop
]


def test_line_quality_rules_and_twin(spark):
    df = spark.createDataFrame(LQ_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_quality_filter(df).collect()}
    for did, text in LQ_ROWS:
        nl, nk, dd, clean = _filter_twin(text)
        g = got[did]
        assert (g["n_lines"], g["n_lines_kept"], g["doc_drop"],
                g["text_filtered"]) == (nl, nk, dd, clean), did
    d1 = got[1]["text_filtered"]
    assert "HOME ABOUT" not in d1          # mainly-uppercase dropped
    assert "2024 12 31" not in d1          # mainly-digit dropped
    assert "Sign in" not in d1             # policy phrase dropped
    assert "short frag" not in d1          # short, no terminal punct
    assert "fine sentence." in d1 and "Good ending!" in d1
    assert "   " in d1                     # whitespace structure kept
    assert got[5]["doc_drop"] is True
    assert got[4]["doc_drop"] is False     # 1/3 dropped, under the bar


def test_line_quality_duckdb_parity_planted(spark, tmp_path):
    df = spark.createDataFrame(LQ_ROWS, "doc_id long, text string")
    pq = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    oracle = {r[0]: r for r in con.execute(SQL_LINE_QUALITY).fetchall()}
    con.close()
    import hashlib
    for did, text in LQ_ROWS:
        nl, nk, dd, clean = _filter_twin(text)
        want_md5 = (hashlib.md5(clean.encode()).hexdigest()
                    if clean is not None else None)
        assert oracle[did] == (did, nl, nk, dd, want_md5), did


_lq_line = st.sampled_from(
    ["A good long sentence here.", "NAV", "HOME ABOUT US", "12345",
     "sign in", "Read More Stories Daily", "x", "ok!", " pad  2 ", ""])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(
    st.none(), st.lists(_lq_line, max_size=5).map("\n".join)),
    min_size=0, max_size=16))
def test_fuzz_line_quality_twin_equals_duckdb(texts):
    rows = list(enumerate(texts))
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    if rows:
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    for did, nl, nk, dd, _md5 in con.execute(SQL_LINE_QUALITY).fetchall():
        assert (nl, nk, dd) == _filter_twin(texts[did])[:3], did
    con.close()


def test_chain_line_filter_stage(spark):
    """curated_from_audit(line_filter=True): junk lines leave the kept
    text, mostly-junk docs drop entirely, clean docs untouched."""
    from ocr_module_spark import curate
    rows = [
        ("a", "A clean paragraph stays intact.\nHOME ABOUT US", True),
        ("b", "Menu\nSearch\nHome", True),          # all junk -> doc drops
        ("c", "Another good sentence here.", True),
        ("d", "dropped upstream", False),
    ]
    audit = spark.createDataFrame(
        [(u, t, k, k, False, k) for u, t, k in rows],
        "url string, text string, quality_keep boolean, dup_keep boolean,"
        " contaminated boolean, kept boolean")
    out = {r["url"]: r for r in curate.curated_from_audit(
        audit, line_filter=True).collect()}
    assert sorted(out) == ["a", "c"]
    assert out["a"]["text"] == "A clean paragraph stays intact."
    assert out["a"]["n_tokens"] == 5
    assert out["c"]["text"] == "Another good sentence here."


def test_line_quality_plan_zero_exchanges(spark, sf_dir):
    plan = q_line_quality(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan          # pure in-row projection
    assert "BatchEvalPython" not in plan


def test_plan_broadcast_flags_no_text_shuffle_join(spark, sf_dir):
    plan = q_boilerplate_lines(
        spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan

"""Enrichment pipeline tests: exact greedy chunking (W3), chain
invariants (row preservation, order-correct positional zip, fallback),
and the pluggable enrichment seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.operators import enrichment as E


def test_greedy_chunk_ids_pure():
    # packs until the NEXT paragraph would exceed the limit
    assert E.greedy_chunk_ids_py([500, 500, 500, 500], 1500) == [0, 0, 0, 1]
    assert E.greedy_chunk_ids_py([1501, 10, 10], 1500) == [0, 1, 1]
    assert E.greedy_chunk_ids_py([], 1500) == []
    assert E.greedy_chunk_ids_py([1, 1499, 1], 1500) == [0, 0, 1]


def test_greedy_chunks_matches_pure(spark):
    rows = [("u", 0, i, "x" * ln) for i, ln in
            enumerate([700, 700, 200, 900, 1600, 10, 10])]
    df = spark.createDataFrame(
        rows, "url string, section_id int, paragraph_id int, content string") \
        .withColumn("clen", F.length("content"))
    out = E.greedy_chunks(df, ["url", "section_id"], "paragraph_id", "clen")
    got = {r["paragraph_id"]: r["chunk_id"] for r in out.collect()}
    expect = E.greedy_chunk_ids_py([700, 700, 200, 900, 1600, 10, 10])
    assert got == dict(enumerate(expect))


@pytest.fixture(scope="module")
def paras(spark):
    rows = []
    # section (u1, 0): long enough to be translated, multi-chunk
    for i in range(12):
        rows.append(("u1", 0, i, f"paragraph {i} body " * 8))
    # section (u1, 1): short -> skipped, identity fallback
    rows.append(("u1", 1, 100, "tiny"))
    # second url, one section with a formula tag to survive round-trip
    rows.append(("u2", 0, 0, "before <formula_0/> after " * 12))
    rows.append(("u2", 0, 1, "plain second paragraph " * 12))
    return spark.createDataFrame(
        rows, "url string, section_id int, paragraph_id int, content string")


def test_enrich_preserves_rows_and_ids(spark, paras):
    out = E.enrich_paragraphs(paras).collect()
    assert len(out) == paras.count()
    got = {(r["url"], r["paragraph_id"]): r for r in out}
    assert len(got) == len(out)  # no duplicated paragraphs


def test_enrich_endpoint_semantics(spark, paras):
    out = {(r["url"], r["paragraph_id"]): r
           for r in E.enrich_paragraphs(paras).collect()}
    # translated sections: upper(content), exactly
    for i in range(12):
        r = out[("u1", i)]
        assert r["translation"] == r["content"].upper(), i
    # skipped short section: identity fallback
    assert out[("u1", 100)]["translation"] == "tiny"
    # formula tag survives (uppercased by this enrich fn, position intact)
    r = out[("u2", 0)]
    assert r["translation"] == r["content"].upper()
    assert "<FORMULA_0/>" in r["translation"]


def test_enrich_content_with_blank_lines(spark):
    """Content containing '\\n\\n' must NOT fragment disassembly: the
    response is split only at separators followed by a marker line, and
    pieces are matched back BY PARAGRAPH ID, not position."""
    rows = [("u", 0, i, f"para {i} first line\n\nsecond block tail " * 4)
            for i in range(5)]
    df = spark.createDataFrame(
        rows, "url string, section_id int, paragraph_id int, content string")
    out = {r["paragraph_id"]: r for r in E.enrich_paragraphs(df).collect()}
    assert len(out) == 5
    for i in range(5):
        assert out[i]["translation"] == out[i]["content"].upper(), i


def test_enrich_split_branches_equivalent(spark, paras):
    """The RPC-shaped filter-split mode and the single-pass when() mode
    produce identical results."""
    a = {(r["url"], r["paragraph_id"]): r["translation"]
         for r in E.enrich_paragraphs(paras).collect()}
    b = {(r["url"], r["paragraph_id"]): r["translation"]
         for r in E.enrich_paragraphs(paras, split_branches=True).collect()}
    assert a == b


def test_enrich_null_content_roundtrip(spark):
    """NULL content: no prompt piece is emitted (format_string would
    inject the literal string 'null'), and the paragraph falls back to
    NULL — upper(NULL) oracle semantics."""
    rows = [("u", 0, 0, "real paragraph body here " * 12),
            ("u", 0, 1, None),
            ("u", 0, 2, "another real paragraph " * 12)]
    df = spark.createDataFrame(
        rows, "url string, section_id int, paragraph_id int, content string")
    out = {r["paragraph_id"]: r["translation"]
           for r in E.enrich_paragraphs(df).collect()}
    assert out[0] == ("real paragraph body here " * 12).upper()
    assert out[1] is None
    assert out[2] == ("another real paragraph " * 12).upper()


def test_enrich_custom_fn_marker_preserving(spark, paras):
    """The enrichment seam is pluggable: a marker-preserving reverse-ish
    fn (reverse each piece's body is hard in SQL, so use a tagging fn)."""
    tag = lambda c: F.concat(c, F.lit(""))  # identity via column fn
    out = {(r["url"], r["paragraph_id"]): r["translation"]
           for r in E.enrich_paragraphs(paras, enrich=tag).collect()}
    for i in range(12):
        # identity enrichment: round-trip must reproduce content exactly —
        # proves disassembly + zip lose nothing and strip only the marker
        assert out[("u1", i)] == f"paragraph {i} body " * 8

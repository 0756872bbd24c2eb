"""Golden-fixture + invariant tests for the pure extraction oracle.

These pin the executable spec (SURVEY.md §5.2 items 1 and 4): any change to
parse/classify/alignment semantics shows up as a byte diff against the
committed expected files.
"""

from __future__ import annotations

import json
import pathlib

import pytest

from ocr_module_spark import corpus, oracle
from ocr_module_spark.blocklist import make_blocklist_payload, parse_blocklist
from ocr_module_spark.htmlparse import parse_html

FIXTURES = pathlib.Path(__file__).resolve().parent / "fixtures"
CASES = sorted(p.stem.replace(".expected", "")
               for p in FIXTURES.glob("*.expected.json"))


def _payload(name: str) -> bytes:
    for ext in (".html", ".json"):
        p = FIXTURES / f"{name}{ext}"
        if p.exists():
            return p.read_bytes()
    raise FileNotFoundError(name)


@pytest.mark.parametrize("name", CASES)
def test_golden_byte_identity(name: str):
    expected = json.loads((FIXTURES / f"{name}.expected.json").read_text())
    got = oracle.extract_document(expected["url"], _payload(name))
    assert got["text"] == expected["text"]          # byte-identity surface
    assert got == expected                          # spans/sections/flags too


@pytest.mark.parametrize("i", range(48))
def test_ids_dense_and_ordered(i: int):
    """W1 invariant: paragraph ids dense, strictly increasing in
    (page_number, block_no) reading order."""
    row = corpus.row_for(i)
    res = oracle.extract_document(row["url"], row["html"])
    pids = [s["paragraph_id"] for s in res["spans"]]
    assert pids == list(range(len(pids)))
    order = [(s["page_number"], s["paragraph_id"]) for s in res["spans"]]
    assert order == sorted(order)


@pytest.mark.parametrize("i", range(48))
def test_text_is_join_of_spans(i: int):
    """F9 invariant: text == '\\n'.join(span contents in order)."""
    row = corpus.row_for(i)
    res = oracle.extract_document(row["url"], row["html"])
    assert res["text"] == "\n".join(s["content"] for s in res["spans"])


def test_placeholder_rewrite_order():
    """W2/J11: per-page running counter, order-sensitive replace-first."""
    assert oracle.rewrite_placeholders("a :formula: b :formula: c", 0) == \
        "a <formula_0/> b <formula_1/> c"
    assert oracle.rewrite_placeholders("x :formula: y", 5) == "x <formula_5/> y"
    assert oracle.rewrite_placeholders("no tokens", 3) == "no tokens"


def test_mismatch_flag():
    """A5: token count != payload count on a page flags the document."""
    ok = corpus.row_for(3)       # H4, balanced
    bad = corpus.row_for(27)     # H4 with a dangling token
    assert not oracle.extract_document(ok["url"], ok["html"])["mismatch_flag"]
    assert oracle.extract_document(bad["url"], bad["html"])["mismatch_flag"]


def test_orientation_normalization():
    """P3: landscape bbox -> (w - y1, x0, w - y0, x1); portrait unchanged."""
    payload = make_blocklist_payload([
        {"width": 10.0, "height": 20.0,
         "blocks": [[1.0, 2.0, 3.0, 4.0, "portrait", 0, 0]]},
        {"width": 20.0, "height": 10.0,
         "blocks": [[1.0, 2.0, 3.0, 4.0, "landscape", 0, 0]]},
    ])
    blocks = parse_blocklist(payload).blocks
    assert blocks[0].bbox == [1.0, 2.0, 3.0, 4.0]
    assert blocks[1].bbox == [20.0 - 4.0, 1.0, 20.0 - 2.0, 3.0]


def test_blocklist_no_doubling():
    """SURVEY.md §2.10: the reference's pymupdf path doubles every page's
    elements; the intended semantics (each block once, dense ids) are what
    we pin."""
    payload = make_blocklist_payload([
        {"width": 8.5, "height": 11.0,
         "blocks": [[0, 0, 1, 1, "a", 0, 0], [0, 1, 1, 2, "b", 1, 0]]},
        {"width": 8.5, "height": 11.0,
         "blocks": [[0, 0, 1, 1, "c", 0, 0]]},
    ])
    res = oracle.extract_document("u", payload)
    assert [s["content"] for s in res["spans"]] == ["a", "b", "c"]
    assert [s["paragraph_id"] for s in res["spans"]] == [0, 1, 2]


def test_boilerplate_roles_dropped():
    """P10: pageHeader/pageFooter/footnote/formulaBlock blocks never reach
    the text surface; high link density is stripped."""
    html = (b"<html><body>"
            b"<nav><li><a href='/'>home</a></li></nav>"
            b"<p><a href='/x'>all link text here</a></p>"
            b"<p class='footnote'>a footnote</p>"
            b"<footer><p>footer text</p></footer>"
            b"<p>real content stays</p>"
            b"</body></html>")
    res = oracle.extract_document("u", html)
    assert res["text"] == "real content stays"


def test_table_and_figure_entities():
    """P4/J4: tables become single table entities (cells tab-joined), never
    paragraphs; figures tracked in sections."""
    html = (b"<html><body><h1>t</h1>"
            b"<table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>"
            b"<img src='x.png' alt='pic'/>"
            b"<p>after</p></body></html>")
    res = oracle.extract_document("u", html)
    assert res["text"] == "t\nafter"
    sec = res["sections"][0]
    assert sec["table_ids"] == [0] and sec["figure_ids"] == [0]
    assert sec["paragraph_ids"] == [0, 1]


def test_sections_span_pages():
    """H5 semantics: a section can span synthetic pages (dual page/section
    view, reference get_translated_page.py:13-15)."""
    row = corpus.row_for(4)  # H5: 3 sections x 9 blocks, pages of 10 blocks
    res = oracle.extract_document(row["url"], row["html"])
    assert res["n_pages"] == 3
    assert [s["section_id"] for s in res["sections"]] == [1, 2, 3]
    pages_of_sec2 = {s["page_number"] for s in res["spans"]
                     if s["paragraph_id"] in res["sections"][1]["paragraph_ids"]}
    assert len(pages_of_sec2) > 1


def test_empty_and_null_payload():
    assert oracle.extract_document("u", None)["text"] == ""
    assert oracle.extract_document("u", b"")["n_pages"] == 0


def test_unicode_byte_identity():
    row = corpus.row_for(5)
    res = oracle.extract_document(row["url"], row["html"])
    assert "日本語のテキスト処理は楽しい。" in res["text"]
    assert "🚀" in res["text"]
    # round-trips utf-8 exactly
    assert res["text"].encode("utf-8").decode("utf-8") == res["text"]


def test_parse_html_link_density_counts():
    blocks = parse_html(b"<p>half <a href='/'>link</a></p>").blocks
    assert blocks[0].text == "half link"
    assert blocks[0].link_text_len == len("link")


# -- round-1 review fixes: parser edge semantics -----------------------------

def test_ignored_subtree_survives_void_and_stray_end_tags():
    """Void (<br/>) or stray (</bar>) end tags inside an ignored subtree
    must not end it early (review finding r1-1)."""
    from ocr_module_spark.htmlparse import parse_html
    r = parse_html(b"<body><svg><br/><p>SVG JUNK</p></svg><p>real</p></body>")
    assert [b.text for b in r.blocks] == ["real"]
    r = parse_html(b"<body><svg><foo></foo></bar><p>LEAK</p></svg>"
                   b"<p>real</p></body>")
    assert [b.text for b in r.blocks] == ["real"]
    # same-tag nesting still respected
    r = parse_html(b"<body><svg><svg></svg><p>inner</p></svg><p>ok</p></body>")
    assert [b.text for b in r.blocks] == ["ok"]


def test_nested_table_flattens_into_outer_cell():
    """Nested tables contribute their text to the enclosing cell instead
    of clobbering it (review finding r1-2)."""
    from ocr_module_spark.htmlparse import parse_html
    r = parse_html(
        b"<body><table><tr><td>OUTER-A<table><tr><td>INNER-B</td></tr>"
        b"</table>OUTER-C</td></tr></table></body>")
    assert len(r.blocks) == 1 and r.blocks[0].kind == "table"
    # no whitespace in the source between the fragments -> none injected
    assert r.blocks[0].text == "OUTER-AINNER-BOUTER-C"


def test_img_inside_open_block_emits_figure():
    """An inline <img> inside a paragraph still yields its figure block,
    anchored at the point of occurrence (review finding r1-3)."""
    from ocr_module_spark.htmlparse import parse_html
    r = parse_html(b'<body><p>before <img src="x" alt="ALT"> after</p></body>')
    kinds = [(b.kind, b.text) for b in r.blocks]
    assert ("figure", "ALT") in kinds
    assert ("paragraph", "before after") in kinds
    fig = next(b for b in r.blocks if b.kind == "figure")
    para = next(b for b in r.blocks if b.kind == "paragraph")
    assert fig.block_no < para.block_no  # anchored where it occurred


def test_url_host_regex_handles_pathless_and_uppercase():
    from ocr_module_spark import pipeline
    import re
    pat = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)")
    for url, host in [
        ("https://example.com", "example.com"),
        ("https://example.com?q=1", "example.com"),
        ("HTTPS://Host.example/x", "Host.example"),
        ("https://a.b/path", "a.b"),
    ]:
        m = pat.match(url)
        assert m and m.group(1) == host, url

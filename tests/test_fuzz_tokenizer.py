"""Hypothesis fuzzing: on ARBITRARY byte soup, the dispatching parse_html
must equal the stdlib reference path exactly — the fast tokenizer may only
ever accept-and-match or decline, never diverge."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_module_spark.htmlparse import parse_html, parse_html_stdlib

TAGS = ["p", "div", "a", "span", "h1", "li", "table", "tr", "td", "img",
        "nav", "footer", "section", "br", "script", "b", "svg", "head",
        "noscript", "template"]

_fragment = st.one_of(
    st.text(alphabet="ab <>/&\"'=;!-\n\t", max_size=12),
    st.sampled_from([f"<{t}>" for t in TAGS]),
    st.sampled_from([f"</{t}>" for t in TAGS]),
    st.sampled_from([
        '<p class="nav">', '<span class="formula" data-latex="x^2">',
        "<img alt='q'/>", "<img alt=\"q\"/>", "<!-- c -->", "<!doctype html>",
        "&amp;", "&#65;", "&bogus;", "&", "<", ">", "< p>", "<p/",
        '<a href="/x">', "<p data-x='1'>", '<td colspan="2">',
        ":formula:", "</p >", "<P Class=\"Nav\">",
        # specials-scanner stress: comment/doctype/PI/CDATA edges
        "<!--", "-->", "--  >", "<!-- <p>x</p> -->", "<!---->", "<!-->",
        '<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0//EN">', "<![CDATA[",
        "]]>", "<?", "?>", "<?xml version=\"1.0\"?>", "<!x>",
        "<script>", "</script>", "</SCRIPT >", "</scriptx>", "<script/>",
        '<script src="a.js">', "<style>", "</style>", "<scripty>",
        "</ script>", "var a < b;", "&amp",
        # widened attribute grammar edges
        "<p foo=bar>", "<p a=b/>", "<p a==b>", "<p a='b'c='d'>",
        "<a href=https://x/y>", "<p a = 'b'>", "<p a=''>", '<p a="">',
        "<img src=/x.png />", "<p xml:lang=en>", "<p -x=1>",
        "<script type=text/javascript>", "<p a='b", "a=b/>", "='x'",
        # literal-bracket data edges
        "1 < 2", "<<", "x<", "</ p>", "< !", "&amp<", "<3",
        # marked sections / bogus comments
        "<![CDATA[x]]>", "<![CDATA[", "]]>", "<![if !IE]>", "<![endif]>",
        "<![weird]]>", "<!bogus>", "<!>", "<![CDATA[<p>a</p>]]>",
    ]),
)


def _as_tuple(result):
    import dataclasses
    return ([dataclasses.astuple(b) for b in result.blocks],
            list(result.payloads))


@settings(max_examples=300, deadline=None)
@given(st.lists(_fragment, max_size=30))
def test_dispatcher_never_diverges(fragments):
    payload = "".join(fragments).encode("utf-8")
    assert _as_tuple(parse_html(payload)) == \
        _as_tuple(parse_html_stdlib(payload))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=200))
def test_dispatcher_never_diverges_raw_bytes(payload):
    assert _as_tuple(parse_html(payload)) == \
        _as_tuple(parse_html_stdlib(payload))

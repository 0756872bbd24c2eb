"""Equivalence proof-of-work for the fast HTML tokenizer: the fast path
must produce a ParseResult byte-identical to the stdlib html.parser path
on every document it accepts, and must decline (fall back) on every
construct whose stdlib semantics it does not replicate."""

from __future__ import annotations

import pytest

from ocr_module_spark import corpus
from ocr_module_spark.htmlparse import parse_html, parse_html_stdlib
from ocr_module_spark.htmlparse_fast import parse_html_fast


def _as_tuple(result):
    import dataclasses
    return ([dataclasses.astuple(b) for b in result.blocks],
            list(result.payloads))


def _assert_equivalent(payload: bytes):
    fast = parse_html_fast(payload)
    ref = parse_html_stdlib(payload)
    if fast is not None:
        assert _as_tuple(fast) == _as_tuple(ref)
    # dispatching entry point always equals the reference path
    assert _as_tuple(parse_html(payload)) == _as_tuple(ref)


def test_equivalence_over_full_corpus():
    """Every HTML shape × 500 variants: fast path == stdlib, byte-exact
    (block text, roles, ids, payloads, link lengths — everything)."""
    n_fast = 0
    for i in range(4000):
        if corpus.shape_for(i) == "P1":
            continue
        payload = corpus.payload_for(i)
        fast = parse_html_fast(payload)
        if fast is not None:
            n_fast += 1
            assert _as_tuple(fast) == _as_tuple(parse_html_stdlib(payload)), i
    # the corpus is well-formed: the fast path must actually take it
    assert n_fast >= 3000


ADVERSARIAL_ACCEPT = [
    b"<html><body><p>plain</p></body></html>",
    b"<html><body><p>a &amp; b &lt;tag&gt; &#65;</p></body></html>",
    b'<html><body><p class="x">self close<br/>more</p></body></html>',
    b'<html><body><img src="a.png" alt="pic &quot;q&quot;"/></body></html>',
    b"<html><body><p>unclosed <div><p>nested",  # well-formed tokens, bad nesting
    b'<html><body><P CLASS="NAV">case</P></body></html>',
    b'<html><body><p title="a > b">gt inside quotes</p></body></html>',
    b"<html><body><p>\xff\xfe invalid utf8</p></body></html>",
    b"",
    # Common-Crawl constructs the fast path now replicates exactly
    # (stdlib resume semantics pinned in htmlparse_fast module docstring):
    b"<!doctype html><html><body><p>doctype</p></body></html>",
    b'<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" '
    b'"http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">'
    b"<html><body><p>public doctype</p></body></html>",
    b"<html><body><!-- comment --><p>c</p></body></html>",
    b"<html><body><!--  weird --  ><p>inside</p>--><p>after</p></body></html>",
    b"<html><body><script>var x = '<p>';</script><p>s</p></body></html>",
    b'<html><body><script type="text/javascript">if (a < b) '
    b"{ alert('</scriptx>'); }</script><p>s</p></body></html>",
    b"<html><body><SCRIPT>x</SCRIPT ><p>case-insensitive close</p></body></html>",
    b"<html><body><script>unclosed swallows the rest <p>gone</p>",
    b"<html><body><style>p { color: red; }</style><p>s</p></body></html>",
    b"<html><body><script/><p>self-closing enters no CDATA</p></body></html>",
    b"<html><body><?php echo ?><p>pi</p></body></html>",
    b'<?xml version="1.0"?><html><body><p>xhtml prolog</p></body></html>',
    # entity fragments may NOT merge across a removed construct: stdlib
    # chunks data at each '<', so '&amp' + ';' stays '&' + ';'
    b"<html><body><p>&amp<!-- c -->;</p></body></html>",
    b"<html><body><p>a&am<!-- c -->p;b</p></body></html>",
    b"<html><body><p>t</p><scripty>name boundary</scripty></body></html>",
    b"<html><body><table><!-- c --><tr><td>a<script>x</script></td></tr>"
    b"</table></body></html>",
    b'<html><body><p><span class="formula" data-latex="x"></span>'
    b"<!-- c -->t</p></body></html>",
    # widened attribute subset (stdlib parse_starttag order of operations:
    # lower name, strip quotes, unescape non-empty value):
    b"<html><body><p class='single'>single quotes</p></body></html>",
    b"<html><body><p data-x=\"a&amp;b\">entity in attr</p></body></html>",
    b"<html><body><p foo=bar>unquoted value</p></body></html>",
    b"<html><body><script type=text/javascript>var x;</script>"
    b"<p>bare mime value</p></body></html>",
    # stdlib swallows '/' after a bare value INTO the value - plain
    # starttag with value 'b/', never a self-close:
    b"<html><body><p a=b/>bare slash into value</p></body></html>",
    b"<html><body><a href=https://x.example/y>unquoted url</a>"
    b"<p>t</p></body></html>",
    b"<html><body><img src=/img/x.png alt='q' /><p>s</p></body></html>",
    b"<html><body><p a=''>empty single</p><p b=\"\">empty double</p>"
    b"</body></html>",
    b"<html><body><p xml:lang=en aria-hidden='true'>subset names</p>"
    b"</body></html>",
    # literal '<' in text: stdlib emits a '<' not followed by [a-zA-Z!?/]
    # as a one-char data chunk (surrounding text unescaped per-chunk)
    b"<html><body><p>stray < bracket</p></body></html>",
    b"<html><body><p>math: 1 < 2 < 3 and a << b</p></body></html>",
    b"<html><body><p>&amp< entity chunked before bracket</p></body></html>",
    b"<html><body><p>i <3 you</p></body></html>",
    b"<html><body><p>trailing<",
    # marked sections (unknown_decl no-op; ']\\s*]\\s*>' close) and MSIE
    # conditionals (']\\s*>'), bogus comments (first '>' from i+2)
    b"<html><body><p><![CDATA[raw <p>not a tag</p>]]>after</p></body></html>",
    b"<html><body><![if !IE]><p>msie cond</p><![endif]></body></html>",
    b"<html><body><!weird bogus comment><p>y</p></body></html>",
    b"<html><body><!><p>empty bogus</p></body></html>",
]

ADVERSARIAL_FALLBACK = [
    b"<html><body><p>a < b but c<d opens a tag</p></body></html>",
    b"<html><body><p>x</ p>whitespace end tag</p></body></html>",
    b"<html><body><p>a</p><![CDATA[unterminated",
    b"<html><body><![weird]]><p>unknown section name</p></body></html>",
    b"<html><body><!unterminated bogus",
    b"<html><body><p",  # truncated tag at EOF
    b"<html><body><p>x</p><!-- unterminated",
    b"<html><body><?pi with no close",
    b"<html><body><p a==b>multi-eq value indicator</p></body></html>",
    b"<html><body><p a='b'c='d'>attr not after whitespace</p></body></html>",
    b"<html><body><p -x=1>non-letter attr name</p></body></html>",
]


@pytest.mark.parametrize("payload", ADVERSARIAL_ACCEPT)
def test_adversarial_accepted_docs_match(payload):
    _assert_equivalent(payload)


@pytest.mark.parametrize("payload", ADVERSARIAL_FALLBACK)
def test_adversarial_hard_docs_fall_back(payload):
    """Constructs outside the subset must decline, and the dispatching
    parse_html must still equal the stdlib result exactly."""
    assert parse_html_fast(payload) is None
    _assert_equivalent(payload)


def test_fixture_corpus_equivalence():
    import json
    import pathlib
    fixtures = pathlib.Path(__file__).parent / "fixtures"
    for f in sorted(fixtures.glob("h*.html")):
        _assert_equivalent(f.read_bytes())


def test_parse_attrs_memo_semantics():
    """The attr-body memo is a pure-function cache: warm results equal
    cold ones (including the cached bail verdict), and the bound clears
    the table instead of growing it."""
    from ocr_module_spark import htmlparse_fast as hf

    cases = [
        ' class="nav" href="/x"', " a=b/", ' a="x"/', " a", "",
        " a==b",          # leaves the subset -> None, cached as BAIL
        " -x=1",          # non-letter name -> None
        ' x="1" y', " x='q' /",
    ]
    hf._ATTRS_CACHE.clear()
    cold = [hf._parse_attrs(c) for c in cases]
    warm = [hf._parse_attrs(c) for c in cases]
    assert cold == warm
    # a second cold pass (cache cleared again) also matches
    hf._ATTRS_CACHE.clear()
    assert [hf._parse_attrs(c) for c in cases] == cold
    # bail verdicts are cached too, still reported as None
    assert hf._ATTRS_CACHE.get(" a==b") is hf._ATTRS_BAIL
    assert hf._parse_attrs(" a==b") is None
    # the bound clears rather than grows
    hf._ATTRS_CACHE.clear()
    for i in range(hf._ATTRS_CACHE_MAX + 10):
        hf._parse_attrs(f' k="{i}"')
    assert len(hf._ATTRS_CACHE) <= hf._ATTRS_CACHE_MAX + 1
    hf._ATTRS_CACHE.clear()

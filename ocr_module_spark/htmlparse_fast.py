"""Fast tokenizer front-end for the HTML block parser.

``html.parser`` costs ~2/3 of per-document extraction time (profiled in
BENCH.md context: its goahead/parse_starttag machinery, not our handlers).
This module adds a regex-scanner tokenizer for the *well-formed subset* of
HTML and feeds the exact same ``_Extractor`` handler object as the stdlib
path — tokenization is the only thing that changes, every block/role/
section/payload rule stays in one implementation (htmlparse._Extractor).

Safety model — **fallback, never divergence**: the scanner first checks the
payload against a conservative subset definition; any construct whose
stdlib semantics we have not replicated bit-for-bit (comments, doctype,
CDATA, processing instructions, script/style raw text, stray ``<`` in
text, exotic attribute syntax) routes the WHOLE document to the stdlib
parser. ``tests/test_fast_tokenizer.py`` property-tests byte-equality of
the two paths over the full synthetic corpus and adversarial cases; the
golden-fixture byte-identity suite runs against the dispatching entry
point, so the contract is pinned end-to-end.
"""

from __future__ import annotations

import html as _html
import re
from typing import List, Optional, Tuple

# One token: start tag or end tag. Attribute body may contain quoted
# strings (which may contain '>' and '<'); names per the subset check.
_TOKEN_RE = re.compile(
    r"""<(?P<end>/?)(?P<name>[a-zA-Z][-a-zA-Z0-9]*)"""
    r"""(?P<attrs>(?:"[^"]*"|'[^']*'|[^'">])*)>""",
    re.S,
)

# Conservative subset for the attribute body we parse ourselves:
# whitespace-separated lowercase names, optionally ="..." with no & < >
# inside, optional trailing /.
_ATTRS_OK_RE = re.compile(
    r"""(?:\s+[a-zA-Z][-a-zA-Z0-9_]*(?:\s*=\s*"[^"<>&]*")?)*\s*/?$""")

_ATTR_RE = re.compile(
    r"""\s+([a-zA-Z][-a-zA-Z0-9_]*)(?:\s*=\s*"([^"]*)")?""")

# Constructs that route to the stdlib parser (semantics not replicated):
_HARD_RE = re.compile(r"<[!?]|<\s|<script|<style|<SCRIPT|<STYLE", re.I)


def tokenize_fast(text: str, extractor) -> bool:
    """Scan ``text`` and drive ``extractor``'s handler methods.

    Returns False (without side effects) when the document leaves the
    verified subset — the caller must then re-run via html.parser. The
    scan is two-phase (validate, then emit) precisely so a mid-document
    bail-out cannot leave half-emitted blocks behind.
    """
    if _HARD_RE.search(text):
        return False

    # single pass: validate as we emit. A mid-document bail-out is safe
    # because the caller discards this extractor entirely and re-parses
    # the whole document with the stdlib path on False.
    #
    # re.split with the 3 capturing groups yields
    # [data, end, name, attrs, data, end, name, attrs, ..., data]:
    # one flat list scan instead of per-token Match objects + .group()
    # calls (~10% of the whole parse in profiles).
    handle_data = extractor.handle_data
    handle_starttag = extractor.handle_starttag
    handle_endtag = extractor.handle_endtag
    unescape = _html.unescape
    parts = _TOKEN_RE.split(text)
    # re.split with 3 capturing groups yields
    # [data, end, name, attrs, data, ...]: after the leading data element
    # the rest is exact groups of 4, so zip-of-one-iterator strides the
    # list C-side — measured faster than manual index arithmetic, which
    # was ~10% of the whole parse in profiles.
    seg = parts[0]
    if seg:
        if "<" in seg:
            return False
        handle_data(unescape(seg) if "&" in seg else seg)
    it = iter(parts)
    next(it)
    for end, name, attrs_raw, seg in zip(it, it, it, it):
        if end:
            # end tags take no attributes in the subset
            if attrs_raw and attrs_raw.strip():
                return False
            handle_endtag(name.lower())
        elif attrs_raw:
            if not _ATTRS_OK_RE.fullmatch(attrs_raw):
                return False
            attrs = [
                (a.group(1).lower(),
                 unescape(a.group(2)) if a.group(2) is not None else None)
                for a in _ATTR_RE.finditer(attrs_raw)
            ]
            name = name.lower()
            handle_starttag(name, attrs)
            if attrs_raw.endswith("/"):
                # html.parser handle_startendtag default: start then end
                handle_endtag(name)
        else:
            handle_starttag(name.lower(), [])
        if seg:
            if "<" in seg:
                return False
            handle_data(unescape(seg) if "&" in seg else seg)
    return True


def parse_html_fast(payload: bytes) -> Optional[object]:
    """Fast-path parse; None if the document needs the stdlib parser."""
    from .htmlparse import _Extractor

    text = payload.decode("utf-8", errors="replace")
    p = _Extractor()
    try:
        if not tokenize_fast(text, p):
            return None
        p._flush_block()
    except Exception:
        return None
    return p.result

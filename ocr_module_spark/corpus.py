"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages`` input table mandated by BASELINE.json ``input_hint``:
``(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)``.
Document shapes H1-H7 (HTML) and P1 (PDF-derived block list) follow
FIXTURES.md §2-§3. Generation is a pure function of the row index ``i`` —
no RNG state — so it can run distributed (``spark.range(n)`` +
``mapInPandas``) and reproduces byte-identically at any parallelism.

Host distribution is skewed by construction (20% of rows on one host, the
rest spread over 49) to exercise the salted-repartition path the north_rule
demands for crawl-host skew.
"""

from __future__ import annotations

import datetime as _dt
from typing import Dict, Iterator, List, Optional

from .blocklist import make_blocklist_payload

EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

WORDS = [
    "stream", "window", "batch", "join", "filter", "group", "sort", "merge",
    "table", "scan", "shuffle", "broadcast", "partition", "skew", "salt",
    "parquet", "iceberg", "snapshot", "lineage", "arrow", "vector", "column",
    "schema", "codegen", "catalyst", "tungsten", "spill", "executor", "driver",
    "crawl",
]

HOSTS = ["site%02d.example" % k for k in range(50)]

SHAPES = ["H1", "H2", "H3", "H4", "H5", "H6", "H7", "P1"]


def _w(i: int, j: int) -> str:
    return WORDS[(i * 7 + j * 13 + (j * j) % 11) % len(WORDS)]


def _sentence(i: int, j: int, n: int) -> str:
    return " ".join(_w(i, j * 31 + k) for k in range(n))


def host_for(i: int) -> str:
    if i % 5 == 0:
        return HOSTS[0]
    return HOSTS[1 + (i * 2654435761) % 49]


def url_for(i: int) -> str:
    return f"https://{host_for(i)}/doc{i:06d}.html"


def shape_for(i: int) -> str:
    return SHAPES[i % len(SHAPES)]


# -- HTML shape builders ----------------------------------------------------

def _h1(i: int) -> str:
    paras = "".join(f"<p>{_sentence(i, j, 9)}.</p>" for j in range(1, 6))
    return f"<html><body><h1>{_sentence(i, 0, 4)}</h1>{paras}</body></html>"


def _h2(i: int) -> str:
    nav = "".join(f'<li><a href="/x{j}">{_w(i, j)}</a></li>' for j in range(6))
    side = "".join(f'<p><a href="/s{j}">{_sentence(i, 40 + j, 3)}</a></p>'
                   for j in range(3))
    art = "".join(f"<p>{_sentence(i, 10 + j, 12)}.</p>" for j in range(4))
    return (
        "<html><body>"
        f"<nav><ul>{nav}</ul></nav>"
        f'<div class="nav sidebar">{side}</div>'
        f"<article><h1>{_sentence(i, 9, 5)}</h1>{art}</article>"
        f"<footer><p>copyright {_w(i, 99)} {2000 + i % 25}</p></footer>"
        "</body></html>"
    )


def _h3(i: int) -> str:
    rows = "".join(
        "<tr>" + "".join(f"<td>{_w(i, 3 * r + c)} {r}{c}</td>" for c in range(3)) + "</tr>"
        for r in range(3)
    )
    paras = "".join(f"<p>{_sentence(i, 20 + j, 10)}.</p>" for j in range(3))
    return (
        f"<html><body><h1>{_sentence(i, 1, 4)}</h1>{paras}"
        f"<table>{rows}</table>"
        f"<p>{_sentence(i, 30, 8)}.</p></body></html>"
    )


def _h4(i: int) -> str:
    # paragraphs with :formula: placeholders + sidecar payload spans;
    # every 4th H4 doc has one extra token with no payload (mismatch case)
    mismatch = (i // len(SHAPES)) % 4 == 3
    p1 = f"<p>energy {_sentence(i, 2, 5)} :formula: equals {_w(i, 8)} :formula: end.</p>"
    p2 = f"<p>second {_sentence(i, 3, 6)} :formula: tail.</p>"
    p3 = f"<p>third {_sentence(i, 4, 6)}{' :formula: dangling' if mismatch else ''}.</p>"
    payloads = (
        f'<span class="formula" data-latex="E=mc^{i % 9}"></span>'
        f'<span class="formula" data-latex="\\sum_k a_{i % 7}"></span>'
        f'<span class="formula" data-latex="x_{i % 5}"></span>'
    )
    return f"<html><body><h1>math {_w(i, 1)}</h1>{p1}{p2}{payloads}{p3}</body></html>"


def _h5(i: int) -> str:
    secs = []
    for s in range(3):
        paras = "".join(
            f"<p>{_sentence(i, 100 * s + j, 8)}.</p>" for j in range(8)
        )
        secs.append(f"<section><h2>part {_w(i, s)} {s}</h2>{paras}</section>")
    return "<html><body>" + "".join(secs) + "</body></html>"


def _h6(i: int) -> str:
    jp = "日本語のテキスト処理は楽しい。形態素解析と分散処理。"
    return (
        "<html><body>"
        f"<h1>多言語 {_w(i, 5)} ページ</h1>"
        f"<p>{jp}これは{i % 100}番目の文書です 🚀 émojis and NBSP.</p>"
        f"<p>mixed 中文字符 and ascii {_sentence(i, 6, 5)}.</p>"
        "</body></html>"
    )


def _h7(i: int) -> str:
    variant = (i // len(SHAPES)) % 3
    if variant == 0:
        return "<html><body></body></html>"
    if variant == 1:
        return f"<html><body><p>unclosed {_sentence(i, 7, 6)}<div><p>nested {_w(i, 2)}"
    return (
        "<html><body>"
        f'<img src="a.png" alt="chart {_w(i, 3)}"/><img src="b.png" alt=""/>'
        "</body></html>"
    )


def _p1(i: int) -> bytes:
    # two pages: portrait + landscape, with figures and formula payloads
    page0 = {
        "width": 8.5, "height": 11.0,
        "blocks": [
            [1.0, 1.0, 7.5, 1.5, f"Title {_sentence(i, 11, 3)}", 0, 0],
            [1.0, 2.0, 7.5, 3.0, f"{_sentence(i, 12, 14)}.", 1, 0],
            [1.0, 3.2, 4.0, 5.0, "", 2, 1],
            [1.0, 5.2, 7.5, 6.0, f"after figure {_sentence(i, 13, 9)} :formula: done.", 3, 0],
        ],
        "formulas": [f"\\alpha_{i % 6}"],
    }
    page1 = {
        "width": 11.0, "height": 8.5,
        "blocks": [
            [1.0, 1.0, 9.0, 1.6, f"landscape head {_w(i, 14)}", 0, 0],
            [1.0, 2.0, 9.0, 4.0, f"{_sentence(i, 15, 12)}.", 1, 0],
            [5.0, 4.5, 8.0, 6.5, "", 2, 1],
        ],
        "formulas": [],
    }
    return make_blocklist_payload([page0, page1])


_HTML_BUILDERS = {
    "H1": _h1, "H2": _h2, "H3": _h3, "H4": _h4,
    "H5": _h5, "H6": _h6, "H7": _h7,
}


def _chrome(i: int, doc: str) -> str:
    """Wrap a shape in the page chrome every real crawled page carries:
    doctype, <head> with title/meta/stylesheet/inline script, comments,
    and an analytics <script> before </body>.

    None of it reaches the extracted output — head/script/style are
    ignored subtrees and comments/doctype are parser no-ops — so golden
    fixtures are unaffected; what changes is that the corpus now
    exercises the CDATA/comment/doctype paths of the tokenizer on every
    document, the way a Common-Crawl scan would."""
    head = (
        f"<head><title>doc {i:06d}</title>"
        '<meta charset="utf-8"/>'
        '<meta name="viewport" content="width=device-width, initial-scale=1"/>'
        '<link rel="stylesheet" href="/static/main.css"/>'
        "<style>body{margin:0;font:14px/1.4 serif}"
        "nav a:hover{color:#00f}</style>"
        "<script>window.dataLayer=window.dataLayer||[];"
        "function gtag(){dataLayer.push(arguments);}"
        f"gtag('js', {i % 97});</script>"
        "</head>")
    analytics = (
        '<script type="text/javascript">var _paq=_paq||[];'
        "if(0<_paq.length){_paq.push(['trackPageView'])}"
        "// strings may hide markup: '</div>' \"<p>\"</script>")
    doc = doc.replace(
        "<html><body>",
        f"<!DOCTYPE html><html>{head}<body><!-- rendered page {i:06d} -->",
        1)
    return doc.replace("</body></html>", f"{analytics}</body></html>", 1)


def payload_for(i: int) -> bytes:
    shape = shape_for(i)
    if shape == "P1":
        return _p1(i)
    return _chrome(i, _HTML_BUILDERS[shape](i)).encode("utf-8")


def row_for(i: int) -> Dict:
    """One deterministic pages-table row for index i."""
    raw_text: Optional[str] = None if i % 20 == 0 else _sentence(i, 77, 20)
    return {
        "url": url_for(i),
        "warc_ts": EPOCH + _dt.timedelta(seconds=137 * i),
        "html": payload_for(i),
        "text": raw_text,
        "lang": ["en", "ja", "de", "fr", "und"][i % 5],
    }


def rows(n: int, start: int = 0) -> Iterator[Dict]:
    for i in range(start, start + n):
        yield row_for(i)


def pages_df(spark, n: int):
    """Distributed deterministic pages DataFrame of n rows (no driver loop)."""
    import pandas as pd

    from .deploy import ensure_pyfiles
    from .schemas import PAGES_SCHEMA
    ensure_pyfiles(spark)

    def gen(batches):
        for pdf in batches:
            recs = [row_for(int(i)) for i in pdf["id"]]
            yield pd.DataFrame.from_records(
                recs, columns=["url", "warc_ts", "html", "text", "lang"])

    n_parts = max(1, min(64, n // 2000 + 1))
    return (spark.range(0, n, 1, n_parts)
            .mapInPandas(gen, schema=PAGES_SCHEMA))

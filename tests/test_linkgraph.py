"""Host-level link graph: harvest policy pins, Spark == pure-kernel
byte identity, fixed-point centrality vs the pure-Python twin (exact
integer equality, partitioning-proof), and the DuckDB value oracle.
The hostile NULL/empty corpus runs the same demo query through
tests/test_hostile_parity.py."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.linkgraph import (
    RANK_SCALE, SQL_LINK_CENTRALITY, centrality_py, extract_links,
    host_centrality, host_link_graph, links_one, q_link_centrality)

SF = "/root/testdata/sf0.001"


# -- harvest kernel policy ---------------------------------------------------

def test_links_one_policy():
    html = (b'<html><head><base href="https://b.example.com/sub/">'
            b'<base href="https://second-base.ignored/"></head><body>'
            b'<a href="page.html" rel="NOFOLLOW external"> an  chor </a>'
            b'<a href="//cdn.other.org:443/x">proto-rel</a>'
            b'<a href="https://WWW.Example.com:443/a#frag">abs</a>'
            b'<a href="HTTP://UP.example.NET:80/p">caps</a>'
            b'<a href="mailto:x@y.z">mail</a>'
            b'<a href="javascript:void(0)">js</a>'
            b'<a>no href</a>'
            b'<a href="/root">open<a href="/nested">second')
    got = links_one("https://src.net/p", html)
    assert got == [
        # first <base> wins; ws-normalized anchor; nofollow case-insensitive
        ("https://b.example.com/sub/page.html", "b.example.com",
         "an chor", True),
        # protocol-relative inherits base scheme; default port stripped
        # from the HOST key, never from the url
        ("https://cdn.other.org:443/x", "cdn.other.org", "proto-rel", False),
        # host lowercased, www. stripped, :443 stripped under https
        ("https://WWW.Example.com:443/a#frag", "example.com", "abs", False),
        ("HTTP://UP.example.NET:80/p", "up.example.net", "caps", False),
        # a second <a> implicitly closes an open one (spec forbids
        # nesting; crawls contain it); EOF flushes the last anchor
        ("https://b.example.com/root", "b.example.com", "open", False),
        ("https://b.example.com/nested", "b.example.com", "second", False),
    ]


def test_links_one_no_base_resolves_against_page_url():
    got = links_one("https://www.Host.ORG:443/dir/page.html",
                    b'<a href="../up.html">u</a><a href="?q=1">q</a>')
    assert got == [
        ("https://www.Host.ORG:443/up.html", "host.org", "u", False),
        ("https://www.Host.ORG:443/dir/page.html?q=1", "host.org",
         "q", False)]


def test_links_one_entity_anchor_and_charrefs():
    got = links_one(
        "https://s.net/", b'<a href="/x">a &amp; b &#233;</a>')
    assert got == [("https://s.net/x", "s.net", "a & b é", False)]


def test_links_one_hostile_payloads():
    assert links_one("u", None) == []
    assert links_one("u", b"") == []
    assert links_one("u", b"\xff\xfe\x00<<a href=") == []
    assert links_one("u", b"<a href='/x' <<>> junk") == []
    # non-http(s) page url with relative href -> invalid scheme dropped
    assert links_one("ftp://h/x", b'<a href="r.html">r</a>') == []


# -- Spark harvest == pure kernel (byte identity by construction) -----------

def test_extract_links_identity(spark):
    from ocr_module_spark import corpus
    pages = corpus.pages_df(spark, 120)
    got = sorted(
        (r["url"], r["dst_url"], r["dst_host"], r["anchor"], r["nofollow"])
        for r in extract_links(pages).collect())
    expect = sorted(
        (u, du, dh, a, nf)
        for u, h in ((r["url"], r["html"])
                     for r in pages.select("url", "html").collect())
        for du, dh, a, nf in links_one(u, h))
    assert got == expect
    assert len(got) > 0


def test_extract_links_plan_scan_aligned(spark):
    from ocr_module_spark import corpus
    plan = (extract_links(corpus.pages_df(spark, 50))
            ._jdf.queryExecution().executedPlan().toString())
    # one Arrow stage, no exchange: the harvest must not shuffle html
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


# -- host graph build --------------------------------------------------------

@pytest.fixture(scope="module")
def links_frame(spark):
    rows = [
        ("https://a.com/1", "a.com", "https://b.com/x", "b.com", "t", False),
        ("https://a.com/1", "a.com", "https://b.com/y", "b.com", "t", False),
        ("https://a.com/2", "a.com", "https://b.com/x", "b.com", "t", False),
        ("https://a.com/2", "a.com", "https://a.com/1", "a.com", "t", False),
        ("https://a.com/3", "a.com", "https://c.com/", "c.com", "t", True),
        ("https://b.com/1", "b.com", "https://c.com/", "c.com", "t", False),
        ("https://b.com/1", "b.com", "", "", "t", False),
    ]
    return spark.createDataFrame(
        rows, "url string, src_host string, dst_url string, "
              "dst_host string, anchor string, nofollow boolean")


def test_host_link_graph_semantics(links_frame):
    got = {(r["src_host"], r["dst_host"]): (r["n_links"], r["n_pages"])
           for r in host_link_graph(links_frame).collect()}
    # self-edge a->a dropped, nofollow a->c dropped, empty dst dropped
    assert got == {("a.com", "b.com"): (3, 2), ("b.com", "c.com"): (1, 1)}
    with_nf = {(r["src_host"], r["dst_host"])
               for r in host_link_graph(
                   links_frame, include_nofollow=True).collect()}
    assert ("a.com", "c.com") in with_nf
    with_self = {(r["src_host"], r["dst_host"])
                 for r in host_link_graph(
                     links_frame, drop_self=False).collect()}
    assert ("a.com", "a.com") in with_self


# -- fixed-point centrality: twin equality, partitioning-proof ---------------

FIXTURE_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "a"),
    ("a", "c"), ("f", "c"), ("c", "f"),
    # g is dangling (in-links only): exercises the dm redistribution
    ("a", "g"), ("b", "g"),
]


def _spark_ranks(spark, edges, parts, **kw):
    ef = spark.createDataFrame(
        edges, "src_host string, dst_host string").repartition(parts)
    return {r["host"]: (r["rank_x"], r["in_hosts"], r["out_hosts"])
            for r in host_centrality(ef, **kw).collect()}


def test_centrality_matches_twin_exactly(spark):
    got = _spark_ranks(spark, FIXTURE_EDGES, 7)
    twin = centrality_py(FIXTURE_EDGES)
    assert {h: v[0] for h, v in got.items()} == twin
    # degree columns
    assert got["g"][1:] == (2, 0)       # two in-edges, dangling
    assert got["a"][1:] == (3, 3)
    # the dangling host's absorbed mass is fed back: every rank positive
    assert all(v[0] > 0 for v in got.values())


def test_centrality_partitioning_proof(spark):
    assert _spark_ranks(spark, FIXTURE_EDGES, 1) == \
        _spark_ranks(spark, FIXTURE_EDGES, 13)


def test_centrality_checkpoint_and_lazy_identical(spark):
    assert _spark_ranks(spark, FIXTURE_EDGES, 5, checkpoint=True) == \
        _spark_ranks(spark, FIXTURE_EDGES, 5, checkpoint=False)


def test_centrality_twin_random_graphs(spark):
    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        n = rng.randint(2, 18)
        hosts = [f"h{i}" for i in range(n)]
        edges = sorted({(rng.choice(hosts), rng.choice(hosts))
                        for _ in range(rng.randint(1, 40))})
        edges = [(s, d) for s, d in edges if s != d]
        if not edges:
            continue
        got = _spark_ranks(spark, edges, rng.randint(1, 9))
        assert {h: v[0] for h, v in got.items()} == centrality_py(edges), \
            f"trial {trial}: {edges}"


def test_centrality_twin_mass_and_order_invariance():
    # mass conserved up to floor-division loss, permutation-invariant
    base = centrality_py(FIXTURE_EDGES)
    shuffled = list(FIXTURE_EDGES)
    random.Random(7).shuffle(shuffled)
    assert centrality_py(shuffled) == base
    lost_max = 2 * len(base) * (1 + 3)  # per-host floor losses x rounds
    assert RANK_SCALE - sum(base.values()) <= lost_max * 1000


def test_centrality_empty_edges(spark):
    ef = spark.createDataFrame([], "src_host string, dst_host string")
    assert host_centrality(ef).collect() == []


# -- cross-engine value oracle (pinned testdata; hostile corpus runs in
#    test_hostile_parity) ----------------------------------------------------

def test_q_link_centrality_duckdb_parity(spark):
    got = [tuple(r) for r in q_link_centrality(spark, SF).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(SQL_LINK_CENTRALITY).fetchall()
    con.close()
    assert got == want
    # the two-generator demo graph must actually discriminate
    assert len({r[1] for r in got}) >= 3


def test_demo_plan_no_scale_killers(spark):
    plan = (q_link_centrality(spark, SF)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_host_anchor_texts_production_path(spark):
    """Planted pages -> extract_links -> host_anchor_texts equals the
    pure-Python rollup over links_one; nofollow/same-host/empty anchors
    excluded; rank order total (count desc, src-host fanout desc,
    anchor asc)."""
    from collections import Counter

    from ocr_module_spark.functions.linkgraph import (extract_links,
                                                      host_anchor_texts)
    mk = lambda links: ("<html><body>" + "".join(
        f'<a href="{h}"{" rel=nofollow" if nf else ""}>{a}</a>'
        for h, a, nf in links) + "</body></html>").encode()
    pages = [
        ("https://a.example/p1", mk([
            ("https://t.example/x", "Great Docs", False),
            ("https://t.example/y", "Great Docs", False),
            ("https://t.example/z", "api reference", False),
            ("https://t.example/n", "paid link", True),      # nofollow
            ("https://a.example/self", "nav", False),        # same-host
            ("https://t.example/e", "", False),              # empty
        ])),
        ("https://b.example/p2", mk([
            ("https://t.example/x", "Great Docs", False),
            ("https://u.example/1", "other site", False),
        ])),
    ]
    df = spark.createDataFrame(pages, "url string, html binary")
    got = [tuple(r) for r in
           host_anchor_texts(extract_links(df))
           .orderBy("dst_host", "rnk").collect()]
    # pure-Python expectation via the shared kernel
    cnt, srcs = Counter(), {}
    for url, payload in pages:
        src_host = url.split("/")[2]
        for _, dh, a, nf in links_one(url, payload):
            if nf or not a or dh == src_host:
                continue
            cnt[(dh, a)] += 1
            srcs.setdefault((dh, a), set()).add(src_host)
    want = []
    per_host = {}
    for (dh, a), n in cnt.items():
        per_host.setdefault(dh, []).append((a, n, len(srcs[(dh, a)])))
    for dh, rows in sorted(per_host.items()):
        rows.sort(key=lambda r: (-r[1], -r[2], r[0]))
        for i, (a, n, s) in enumerate(rows, 1):
            want.append((dh, a, n, s, i))
    assert got == want
    assert got[0][:2] == ("t.example", "great docs") or \
        got[0][:2] == ("t.example", "Great Docs")

"""URL canonicalization — constructed-case policy pins plus cross-engine
value parity. The hostile NULL/empty corpus runs the same query through
tests/test_hostile_parity.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.urls import (canonical_url_cols,
                                             q_url_canonicalize)

CASES = [
    # (raw, canon, valid, host)
    ("https://WWW.Example.COM:443/A/b/?b=2&utm_source=x&a=1#frag",
     "https://example.com/A/b?a=1&b=2", True, "example.com"),
    ("http://example.com:80/", "http://example.com", True, "example.com"),
    ("http://example.com:443/x",                    # non-default port kept
     "http://example.com:443/x", True, "example.com:443"),
    ("https://example.com:80/x",                    # non-default port kept
     "https://example.com:80/x", True, "example.com:80"),
    ("https://example.com/a?utm_a=1&utm_b=2&fbclid=z&gclid=1&msclkid=m",
     "https://example.com/a", True, "example.com"),  # tracking-only query
    ("https://example.com/a?z=9&a=1&a=0&ref=r&",
     "https://example.com/a?a=0&a=1&z=9", True, "example.com"),
    ("  https://example.com/pad  ",                 # whitespace trim
     "https://example.com/pad", True, "example.com"),
    ("https://example.com/a/refs?refx=1&ref=2",     # ref only as whole key
     "https://example.com/a/refs?refx=1", True, "example.com"),
    ("example.com/no-scheme", None, False, None),
    ("ftp://example.com/file", None, False, None),
    ("", None, False, None),
    (None, None, False, None),
]


@pytest.fixture(scope="module")
def got(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, *_rest) in enumerate(CASES)],
        "i long, url string")
    return {r["i"]: r for r in
            df.select("i", *canonical_url_cols()).collect()}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_policy(got, i):
    _raw, canon, valid, host = CASES[i]
    r = got[i]
    assert (r["canon_url"], r["url_valid"], r["canon_host"]) == \
        (canon, valid, host)


def test_zero_exchange_projection(spark, sf_dir):
    plan = q_url_canonicalize(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "Project" in plan


def test_duckdb_parity(spark, sf_dir):
    import pathlib
    import sys

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.urls import SQL_URL_CANONICALIZE

    df = q_url_canonicalize(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_URL_CANONICALIZE)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) > 0
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)


def test_latest_revision_collapses_revisits(spark, sf_dir):
    """One row per canonical URL, max doc_id wins, counts match the
    canonicalized frame; DuckDB parity."""
    import pathlib
    import sys
    from collections import Counter, defaultdict

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.urls import (SQL_URL_LATEST_REVISION,
                                                 q_url_latest_revision)

    df = q_url_latest_revision(spark, sf_dir)
    rows = df.collect()
    canon = q_url_canonicalize(spark, sf_dir).where("url_valid").collect()
    counts = Counter(r["canon_url"] for r in canon)
    latest = defaultdict(int)
    for r in canon:
        latest[r["canon_url"]] = max(latest[r["canon_url"]], r["doc_id"])
    assert {r["canon_url"]: r["n_revisions"] for r in rows} == dict(counts)
    assert {r["canon_url"]: r["latest_doc_id"] for r in rows} == \
        dict(latest)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_URL_LATEST_REVISION)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    s_rows = [tuple(r) for r in rows]
    assert len(s_rows) == len(d_rows) > 0
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)


# ---------------------------------------------------------------------------
# idempotence fuzz: canonical(canonical(u)) == canonical(u)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_scheme = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""])
_host = st.sampled_from(["Example.COM", "www.Example.com", "a.b.c",
                         "example.com:80", "example.com:443",
                         "example.com:8080"])
_path = st.sampled_from(["", "/", "/A/b", "/a/b/", "/x//y", "/%7Euser"])
_query = st.sampled_from(["", "?a=1", "?utm_source=x", "?b=2&a=1&a=0",
                          "?utm_a=1&z=9&", "?ref=r&refx=1", "?&&"])
_frag = st.sampled_from(["", "#f", "#a?b=1"])


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_scheme, _host, _path, _query, _frag),
                min_size=1, max_size=20))
def test_canonicalization_is_idempotent(spark, parts):
    urls = [(i, (f"{s}://{h}{p}{q}{f}" if s else f"{h}{p}{q}{f}"))
            for i, (s, h, p, q, f) in enumerate(parts)]
    df = spark.createDataFrame(urls, "i long, url string")
    once = df.select("i", *canonical_url_cols()).collect()
    valid = [(r["i"], r["canon_url"]) for r in once if r["url_valid"]]
    for r in once:  # canonical output never carries tracking params
        if r["canon_url"]:
            assert "utm_" not in r["canon_url"]
            assert "#" not in r["canon_url"]
    if not valid:
        return
    again = spark.createDataFrame(valid, "i long, url string") \
        .select("i", *canonical_url_cols()).collect()
    got = {r["i"]: r["canon_url"] for r in again}
    for i, c in valid:
        assert got[i] == c, (i, c, got[i])
        assert all(r["url_valid"] for r in again)

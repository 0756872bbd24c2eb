"""URL canonicalization — the key-normalization step ahead of url-level
dedup and crawl joins.

A crawl sees the same page many times under syntactically different URLs
(scheme/host case, default ports, ``www.`` aliases, tracking params,
fragments, param order). Canonicalizing BEFORE url-keyed dedup/joins is
what makes url the reference invariant's key ("byte-identical extracted
text per url") stable across crawls — the reference assumes its input ids
are already canonical; a Common-Crawl-scale pipeline has to make them so.

Policy (documented, deterministic, both engines):

1. strip the fragment (``#…``);
2. lowercase scheme and host; strip a leading ``www.``; strip the
   scheme's default port (``:80`` http / ``:443`` https);
3. drop tracking params (``utm_*``, ``fbclid``, ``gclid``, ``msclkid``,
   ``ref``) and empty params; SORT the survivors (param order is not
   semantics on the wire);
4. drop one trailing ``/`` from a non-root path; root path ``/`` drops
   to empty (host root);
5. non-http(s) / scheme-less inputs canonicalize to NULL and flag
   ``url_valid = false`` — the gate row a curation pipeline drops or
   routes to a repair step.

Everything is JVM/regex/array column arithmetic — one projection, zero
shuffles, zero Python — with a 1:1 DuckDB mirror for the value-hash
oracle (same split → filter → sort → rebuild algebra, list_* dialect).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"
_TRACKING_RE = "^(utm_[^=&]*|fbclid|gclid|msclkid|ref)(=|$)"


def canonical_url_cols(url_col: str = "url") -> list[Column]:
    """``canon_url`` (string, NULL when unparseable) and ``url_valid``
    (bool) Columns from a raw URL column."""
    u = F.trim(F.col(url_col))
    scheme = F.lower(F.regexp_extract(u, f"({_SCHEME_RE})", 1))
    valid = scheme.isin("http://", "https://")
    nofrag = F.regexp_replace(u, "#.*$", "")
    hostport = F.lower(F.regexp_extract(nofrag, f"{_SCHEME_RE}([^/?#]+)", 1))
    host = F.regexp_replace(hostport, "^www\\.", "")
    host = F.when(scheme == "http://",
                  F.regexp_replace(host, ":80$", "")) \
        .otherwise(F.regexp_replace(host, ":443$", ""))
    path = F.regexp_extract(nofrag, f"{_SCHEME_RE}[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, "/$", "")
    rawq = F.regexp_extract(nofrag, "\\?([^#]*)", 1)
    parts = F.array_sort(F.filter(
        F.split(rawq, "&"),
        lambda x: (x != "") & ~x.rlike(_TRACKING_RE)))
    query = F.array_join(parts, "&")
    canon = F.concat(
        scheme, host, path,
        F.when(query == "", "").otherwise(F.concat(F.lit("?"), query)))
    return [
        F.when(valid, canon).alias("canon_url"),
        F.coalesce(valid, F.lit(False)).alias("url_valid"),
        F.when(valid, host).alias("canon_host"),
    ]


def canonical_url_sql_duck(url_expr: str = "url") -> dict[str, str]:
    """DuckDB mirror of :func:`canonical_url_cols` — returns the three
    output expressions keyed by column name (1:1 algebra, list_*
    dialect; regexp_extract('', …) and no-match both yield '' in both
    engines for these patterns)."""
    u = f"trim({url_expr})"
    scheme = f"lower(regexp_extract({u}, '({_SCHEME_RE})', 1))"
    nofrag = f"regexp_replace({u}, '#.*$', '')"
    hostport = (f"lower(regexp_extract({nofrag}, "
                f"'{_SCHEME_RE}([^/?#]+)', 1))")
    host0 = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (f"CASE WHEN {scheme} = 'http://' "
            f"THEN regexp_replace({host0}, ':80$', '') "
            f"ELSE regexp_replace({host0}, ':443$', '') END")
    path = (f"regexp_replace(regexp_extract({nofrag}, "
            f"'{_SCHEME_RE}[^/?#]+([^?#]*)', 1), '/$', '')")
    rawq = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    query = (f"list_aggregate(list_sort(list_filter("
             f"string_split({rawq}, '&'), "
             f"x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE}'))), "
             f"'string_agg', '&')")
    qpart = (f"CASE WHEN coalesce({query}, '') = '' THEN '' "
             f"ELSE '?' || {query} END")
    valid = f"({scheme} IN ('http://', 'https://'))"
    return {
        "canon_url": (f"CASE WHEN {valid} THEN "
                      f"{scheme} || {host} || {path} || {qpart} END"),
        "url_valid": f"coalesce({valid}, false)",
        "canon_host": f"CASE WHEN {valid} THEN {host} END",
    }


# ---------------------------------------------------------------------------
# driver/oracle surface: testdata has no URL column, so both engines
# synthesize the SAME varied URL per document (templates keyed on
# doc_id % 6 exercise every canonicalization branch: case folding,
# default ports, www-strip, tracking-strip, param sort, root path,
# trailing slash, fragment, scheme-less reject)
# ---------------------------------------------------------------------------

_SYNTH_URL = """
CASE doc_id % 6
  WHEN 0 THEN 'https://WWW.' || source ||
              '.Example.COM:443/a/' || doc_id ||
              '/?b=2&utm_source=x&a=1#frag'
  WHEN 1 THEN 'http://' || source || '.example.com:80/'
  WHEN 2 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.com/Path/' ||
              doc_id || '?utm_a=1&utm_b=2&fbclid=z&gclid=1'
  WHEN 3 THEN source || '.example.com/no-scheme'
  WHEN 4 THEN 'https://' || source || '.example.com/a?z=9&a=1&a=0&ref=r&'
  ELSE 'ftp://' || source || '.example.com/rejected'
END
"""


def q_url_canonicalize(spark, sf_dir: str):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id", F.expr(_SYNTH_URL).alias("url")) \
        .select("doc_id", "url", *canonical_url_cols())


_DUCK = canonical_url_sql_duck()

SQL_URL_CANONICALIZE = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL} AS url
  FROM documents
)
SELECT doc_id, url,
       {_DUCK["canon_url"]} AS canon_url,
       {_DUCK["url_valid"]} AS url_valid,
       {_DUCK["canon_host"]} AS canon_host
FROM u
"""


def q_url_latest_revision(spark, sf_dir: str):
    """The canonicalizer's consumer: a crawl sees one page under many
    spellings and across many snapshots — collapse to ONE row per
    canonical URL, keeping the latest revision (here: max doc_id, the
    corpus's monotonic stamp; a real crawl orders by warc_ts the same
    way). One aggregation shuffled on the canonical key; invalid URLs
    drop (they never reach the url-keyed pipeline). n_revisions is the
    revisit-rate signal crawl scheduling feeds on."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    canon = d.select("doc_id", F.expr(_SYNTH_URL).alias("url")) \
        .select("doc_id", *canonical_url_cols()) \
        .where("url_valid")
    return canon.groupBy("canon_url").agg(
        F.max("doc_id").alias("latest_doc_id"),
        F.count("*").alias("n_revisions"))


SQL_URL_LATEST_REVISION = f"""
WITH u AS (
  SELECT doc_id, {_SYNTH_URL} AS url
  FROM documents
), c AS (
  SELECT doc_id,
         {_DUCK["canon_url"]} AS canon_url,
         {_DUCK["url_valid"]} AS url_valid
  FROM u
)
SELECT canon_url, max(doc_id) AS latest_doc_id,
       count(*) AS n_revisions
FROM c WHERE url_valid
GROUP BY canon_url
"""


REGISTRY = {
    "fn_url_canonicalize": (q_url_canonicalize, SQL_URL_CANONICALIZE),
    "fn_url_latest_revision": (q_url_latest_revision,
                               SQL_URL_LATEST_REVISION),
}

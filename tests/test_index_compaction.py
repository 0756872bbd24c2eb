"""Dedup-index maintenance: compact_dedup_index (merge replayed
appends, collapse superseded canonical-URL revisions, optional TTL).
Pinned: rows shrink, dedup DECISIONS are preserved (flag columns),
compaction is idempotent, and the drain path is untouched (compaction
is a between-drains maintenance op)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_module_spark.functions.dedup import (build_dedup_index,
                                              compact_dedup_index,
                                              dedup_against_index)

TEXT_A = "alpha beta gamma delta epsilon zeta eta theta"
TEXT_B = "one two three four five six seven eight nine ten"

# two crawls of the same canonical page (tracking param / case alias),
# same content; one unrelated page; one unparseable id
CORPUS = [
    ("http://a.com/page?utm_source=x", TEXT_A),
    ("http://A.COM/page", TEXT_A),
    ("https://b.org/other", TEXT_B),
    ("not a url", "totally distinct content here okay"),
]


def _index(spark, replay: int = 1):
    d = spark.createDataFrame(CORPUS * replay, "doc_id string, text string")
    return build_dedup_index(d)


def test_compaction_shrinks_rows_and_is_idempotent(spark):
    raw = _index(spark, replay=3)           # replayed appends
    assert raw.count() == 12
    merged = compact_dedup_index(raw)       # per-doc merge only
    assert merged.count() == 4
    collapsed = compact_dedup_index(raw, url_keyed=True)
    # the two revisions of a.com/page collapse to one row; the invalid
    # id keeps its raw key
    assert collapsed.count() == 3
    keys = {r["doc_id"] for r in collapsed.collect()}
    assert "not a url" in keys and "https://b.org/other" in keys
    assert len(keys & {"http://a.com/page?utm_source=x",
                       "http://A.COM/page"}) == 1
    again = compact_dedup_index(collapsed, url_keyed=True)
    assert sorted(map(tuple, again.collect())) == \
        sorted(map(tuple, collapsed.collect()))


def test_decisions_preserved_after_compaction(spark):
    raw = _index(spark, replay=2)
    compacted = compact_dedup_index(raw, url_keyed=True)
    new_docs = spark.createDataFrame(
        [("http://a.com/page?utm_medium=y", TEXT_A),        # re-crawl
         ("https://b.org/other", TEXT_B),                    # exact
         ("https://c.net/new", "fresh never seen words entirely")],
        "doc_id string, text string")
    cols = ["doc_id", "exact_dup", "near_dup", "keep"]

    def flags(index):
        return sorted(
            tuple(r) for r in
            dedup_against_index(new_docs, index).select(*cols).collect())

    assert flags(raw) == flags(compacted)
    got = {r[0]: r for r in flags(raw)}
    assert got["http://a.com/page?utm_medium=y"][1:] == (True, True, False)
    assert got["https://b.org/other"][1:] == (True, True, False)
    assert got["https://c.net/new"][1:] == (False, False, True)


def test_ttl_expires_old_epochs(spark):
    idx = _index(spark).withColumn(
        "epoch", (F.length("doc_id") % 3).cast("long"))
    out = compact_dedup_index(idx, order_col="epoch", ttl_min_order=1)
    assert out.count() == idx.where("epoch >= 1").count() > 0
    assert set(out.columns) == {"doc_id", "norm_md5", "sig", "epoch"}
    # order_col required for TTL
    import pytest
    with pytest.raises(ValueError):
        compact_dedup_index(idx.drop("epoch"), ttl_min_order=1)


def test_latest_revision_wins_on_order_col(spark):
    """With an epoch stamp, the canonical collapse keeps the NEWEST
    revision's row, not the lexicographically-greatest id."""
    rows = [("http://a.com/page?utm_source=x", "old words " * 8, 1),
            ("http://A.COM/page", "new words entirely different " * 4, 9)]
    d = spark.createDataFrame(
        [(u, t) for u, t, _e in rows], "doc_id string, text string")
    idx = build_dedup_index(d).join(
        spark.createDataFrame([(u, e) for u, _t, e in rows],
                              "doc_id string, epoch long"), "doc_id")
    out = compact_dedup_index(idx, url_keyed=True, order_col="epoch")
    got = out.collect()
    assert len(got) == 1 and got[0]["doc_id"] == "http://A.COM/page"

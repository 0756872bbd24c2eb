"""C4-style exact span dedup (`span_dedup_frame`) on a constructed corpus
with planted duplicate spans — pins keep-first canonical semantics, the
reassembly bytes, corpus-grain preservation, and the scale shape of the
plan (equi-joins only, partial aggregation before the decision shuffle).

C4 rule: "we discard all but one of any three-sentence span occurring
more than once in the data set" — here at SPAN_K-word granularity.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_module_spark.functions.dedup import (SPAN_K, q_dedup_spans,
                                              span_dedup_frame)

# one exactly-10-word span, planted verbatim in several docs
BOILER = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
UNIQ_A = "aa0 aa1 aa2 aa3 aa4 aa5 aa6 aa7 aa8 aa9"
UNIQ_B = "bb0 bb1 bb2 bb3 bb4 bb5 bb6 bb7 bb8 bb9"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def span_out(spark):
    rows = [
        # doc 0: boiler at span 0 (the canonical occurrence), then unique
        (0, f"{BOILER} {UNIQ_A} tail0 tail1"),
        # doc 1: unique, then boiler at span 1 — duplicate, dropped
        (1, f"{UNIQ_B} {BOILER}"),
        # doc 2: ONLY the boiler span — everything dropped
        (2, BOILER),
        # doc 3: shorter than one span — untouched, tail-only
        (3, "short doc under ten words"),
        # doc 4: empty and NULL-ish grains preserved
        (4, ""),
        (5, None),
        # doc 6: two copies of the same span INSIDE one doc — second drops
        (6, f"{BOILER} {BOILER} leftover"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_dedup_frame(df)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_corpus_grain_preserved(span_out):
    # every input doc — including empty/NULL text — has one verdict row
    assert sorted(span_out) == [0, 1, 2, 3, 4, 5, 6]


def test_keep_first_canonical(span_out):
    # doc 0 holds the canonical (min doc_id, span_no) occurrence: keeps all
    d0 = span_out[0]
    assert d0["n_spans"] == 2 and d0["n_dropped_spans"] == 0
    assert d0["n_dup_spans"] == 1          # boiler is duplicated corpus-wide
    assert d0["kept_md5"] == _md5(f"{BOILER} {UNIQ_A} tail0 tail1")

    # doc 1's copy drops; unique span and word order survive
    d1 = span_out[1]
    assert d1["n_spans"] == 2 and d1["n_dropped_spans"] == 1
    assert d1["kept_md5"] == _md5(UNIQ_B)
    assert d1["n_kept_words"] == 10


def test_fully_deduped_doc_goes_empty(span_out):
    d2 = span_out[2]
    assert d2["n_spans"] == 1 and d2["n_dropped_spans"] == 1
    assert d2["n_kept_words"] == 0
    assert d2["kept_md5"] == _md5("")


def test_sub_span_docs_untouched(span_out):
    d3 = span_out[3]
    assert d3["n_spans"] == 0 and d3["n_dropped_spans"] == 0
    assert d3["kept_md5"] == _md5("short doc under ten words")
    for i in (4, 5):
        assert span_out[i]["n_spans"] == 0
        assert span_out[i]["n_kept_words"] == 0
        assert span_out[i]["kept_md5"] == _md5("")


def test_intra_doc_duplicate_drops_second(span_out):
    d6 = span_out[6]
    assert d6["n_spans"] == 2 and d6["n_dropped_spans"] == 2
    # doc 0 is canonical for BOILER, so BOTH of doc 6's copies drop;
    # the sub-span tail survives
    assert d6["kept_md5"] == _md5("leftover")
    assert d6["n_kept_words"] == 2 * SPAN_K + 1 - 2 * SPAN_K


def test_word_conservation_on_testdata(spark, sf_dir):
    """Over the real table: kept + dropped words account for every word,
    and dropped spans are a subset of duplicated spans."""
    out = q_dedup_spans(spark, sf_dir)
    bad = out.where(
        (F.col("n_dropped_spans") > F.col("n_dup_spans"))
        | (F.col("n_kept_words") < 0)).count()
    assert bad == 0
    # at least one duplicate span exists in the synthetic corpus (the
    # 30-word vocabulary guarantees span collisions at sf>=0.001)
    assert out.agg(F.sum("n_dropped_spans")).first()[0] > 0


def _py_span_dedup(corpus: dict[int, str | None], k: int) -> dict[int, str]:
    """Pure-Python reference: same keep-first semantics, brutally simple."""
    spans = {}          # span text -> (count, first (doc_id, span_no))
    words = {}
    for doc_id in sorted(corpus):
        text = corpus[doc_id]
        w = [] if text is None or not text.strip() else text.strip().split()
        words[doc_id] = w
        for i in range(len(w) // k):
            s = " ".join(w[i * k:(i + 1) * k])
            cnt, first = spans.get(s, (0, (doc_id, i)))
            spans[s] = (cnt + 1, min(first, (doc_id, i)))
    out = {}
    for doc_id, w in words.items():
        kept = []
        for i in range(len(w) // k):
            s = " ".join(w[i * k:(i + 1) * k])
            cnt, first = spans[s]
            if cnt == 1 or first == (doc_id, i):
                kept.append(s)
        tail = " ".join(w[(len(w) // k) * k:])
        out[doc_id] = " ".join(p for p in kept + [tail] if p)
    return out


# small vocab + short docs force heavy span collisions; k=3 so even short
# docs carry several spans
_doc = st.lists(st.sampled_from("aa bb cc dd".split()), max_size=14) \
    .map(" ".join)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_fuzz_matches_python_reference(spark, docs):
    corpus = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(list(corpus.items()),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["kept_md5"]
           for r in span_dedup_frame(df, k=3).collect()}
    want = {d: _md5(t) for d, t in _py_span_dedup(corpus, 3).items()}
    assert got == want


def test_span_dedup_plan_shape(spark, sf_dir):
    plan = q_dedup_spans(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the duplicate decision must partial-aggregate before its exchange
    assert "partial_count" in plan or "partial_min" in plan

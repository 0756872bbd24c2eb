"""curate_pack_sequences — concat-and-split sequence packing.

Planted-corpus invariants (full doc coverage, exact sequence fill,
slice contiguity, cross-parallelism determinism), hypothesis fuzz vs a
pure-Python reference, plan shape (one exchange, bounded explode, no
BNLJ), and DuckDB value parity on the pinned testdata. The hostile
corpus (NULL/empty text, NULL source) runs through the same query via
tests/test_hostile_parity.py.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ocr_module_spark.functions.packing import (SEQ_LEN, pack_assignments,
                                                q_pack_sequences)


def _h(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)


def ref_pack(rows, L):
    """Pure-Python packing reference: rows = (doc_id, source, n_tokens)."""
    by_src = defaultdict(list)
    for doc_id, src, n in rows:
        if n > 0:
            by_src[src].append((_h(doc_id), doc_id, n))
    out = []
    for src, docs in by_src.items():
        docs.sort()
        off = 0
        for _, doc_id, n in docs:
            start, end = off, off + n
            for seq in range(start // L, (end - 1) // L + 1):
                lo, hi = max(start, seq * L), min(end, (seq + 1) * L)
                out.append((src, seq, doc_id,
                            lo - start, hi - start, lo - seq * L))
            off = end
    return sorted(out)


def _pack(spark, rows, L=SEQ_LEN):
    base = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long")
    return sorted(tuple(r) for r in pack_assignments(base, L).collect())


# ---------------------------------------------------------------------------
# planted-corpus semantics
# ---------------------------------------------------------------------------

ROWS = [(1, "a", 10), (2, "a", 64), (3, "a", 100), (4, "a", 1),
        (5, "b", 200), (6, "b", 0), (7, "b", 3),
        (8, "c", 64)]


@pytest.fixture(scope="module")
def packed(spark):
    return _pack(spark, ROWS)


def test_matches_python_reference(packed):
    assert packed == ref_pack(ROWS, SEQ_LEN)


def test_every_token_packed_exactly_once(packed):
    got = defaultdict(list)
    for _src, _seq, doc, lo, hi, _off in packed:
        got[doc].append((lo, hi))
    n_by_doc = {d: n for d, _s, n in ROWS if n > 0}
    assert set(got) == set(n_by_doc)
    for doc, pieces in got.items():
        pieces.sort()
        # doc-relative slices tile [0, n_tokens) with no gap or overlap
        assert pieces[0][0] == 0 and pieces[-1][1] == n_by_doc[doc]
        for (_, a_hi), (b_lo, _) in zip(pieces, pieces[1:]):
            assert a_hi == b_lo


def test_sequences_fill_exactly_except_last(packed):
    fill = defaultdict(int)
    for src, seq, _doc, lo, hi, _off in packed:
        fill[(src, seq)] += hi - lo
    last = {}
    for src, seq in fill:
        last[src] = max(last.get(src, -1), seq)
    for (src, seq), f in fill.items():
        if seq < last[src]:
            assert f == SEQ_LEN, (src, seq)
        else:
            assert 0 < f <= SEQ_LEN
    # sequence numbering is dense from 0 per source
    per_src = defaultdict(set)
    for src, seq in fill:
        per_src[src].add(seq)
    for src, seqs in per_src.items():
        assert seqs == set(range(last[src] + 1))


def test_slices_tile_each_sequence(packed):
    by_seq = defaultdict(list)
    for src, seq, _doc, lo, hi, off in packed:
        by_seq[(src, seq)].append((off, off + (hi - lo)))
    for pieces in by_seq.values():
        pieces.sort()
        assert pieces[0][0] == 0
        for (_, a_hi), (b_lo, _) in zip(pieces, pieces[1:]):
            assert a_hi == b_lo


def test_deterministic_across_parallelism(spark, packed):
    base = spark.createDataFrame(
        ROWS, "doc_id long, source string, n_tokens long") \
        .repartition(7, "doc_id")
    assert sorted(tuple(r) for r in
                  pack_assignments(base).collect()) == packed


def test_zero_token_doc_packs_nothing(packed):
    assert all(doc != 6 for _s, _q, doc, *_ in packed)


# ---------------------------------------------------------------------------
# fuzz vs the reference
# ---------------------------------------------------------------------------

@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.sampled_from("abc"),
                          st.integers(min_value=0, max_value=40)),
                min_size=0, max_size=25),
       st.sampled_from([1, 3, 16]))
def test_fuzz_matches_reference(spark, docs, L):
    rows = [(i, src, n) for i, (src, n) in enumerate(docs)]
    assert _pack(spark, rows, L) == ref_pack(rows, L)


# ---------------------------------------------------------------------------
# plan shape
# ---------------------------------------------------------------------------

def test_plan_one_exchange_no_bnlj(spark, sf_dir):
    plan = q_pack_sequences(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1          # the source window, only
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan          # no join at all
    assert "Generate" in plan                   # the bounded explode


# ---------------------------------------------------------------------------
# cross-engine parity on the pinned testdata (hostile corpus parity runs
# in test_hostile_parity.py)
# ---------------------------------------------------------------------------

def test_duckdb_parity(spark, sf_dir):
    import pathlib
    import sys

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.packing import SQL_PACK_SEQUENCES

    df = q_pack_sequences(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_PACK_SEQUENCES)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)


# ---------------------------------------------------------------------------
# materialized sink: packed_sequences / q_pack_materialize
# ---------------------------------------------------------------------------

def test_materialized_streams_match_reference(spark):
    """Every sequence's token stream is exactly the reference plan's
    slices assembled in seq_off order."""
    from ocr_module_spark.functions.packing import packed_sequences

    docs = [(i, src, " ".join(f"w{i}_{j}" for j in range(n)))
            for i, (src, n) in enumerate(
                [("a", 10), ("a", 64), ("a", 100), ("a", 1),
                 ("b", 200), ("b", 0), ("b", 3)])]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {(r["source"], r["seq_no"]):
           (r["n_fill"], list(r["tokens"]), list(r["doc_starts"]))
           for r in packed_sequences(df).collect()}

    words = {i: t.split() if t else [] for i, _s, t in docs}
    rows = [(i, s, len(words[i])) for i, s, _t in docs]
    expect = defaultdict(list)
    starts = defaultdict(list)
    for src, seq, doc, lo, hi, off in sorted(
            ref_pack(rows, SEQ_LEN), key=lambda r: (r[0], r[1], r[5])):
        expect[(src, seq)].extend(words[doc][lo:hi])
        if lo == 0:  # a NEW document begins here (not a continuation)
            starts[(src, seq)].append(off)
    assert {k: v[1] for k, v in got.items()} == dict(expect)
    for (src, seq), (n_fill, toks, dstarts) in got.items():
        assert n_fill == len(toks)
        assert dstarts == starts[(src, seq)]
    # the 200-token doc spans sequences: its continuation sequences must
    # NOT report offset 0 as a boundary
    assert any(dstarts == [] or dstarts[0] > 0
               for _n, _t, dstarts in got.values())


def test_materialize_duckdb_parity(spark, sf_dir):
    import pathlib
    import sys

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.packing import (SQL_PACK_MATERIALIZE,
                                                    q_pack_materialize)

    df = q_pack_materialize(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_PACK_MATERIALIZE)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) > 0
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)


def test_materialize_plan_shape(spark, sf_dir):
    from ocr_module_spark.functions.packing import q_pack_materialize

    plan = q_pack_materialize(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # plan-window exchange + doc_id join + (source, seq_no) assembly agg;
    # text rides only the equi-join, never the window
    assert plan.count("Exchange") <= 5


# ---------------------------------------------------------------------------
# hot-host salt dial
# ---------------------------------------------------------------------------

def test_salted_packing_partitions_hot_host(spark):
    """salt_buckets splits one giant host into independent exact
    streams: per-(host, salt) the packing invariants hold, every doc is
    covered exactly once, and the salt matches the portable hash."""
    rows = [(i, "hot", 10) for i in range(200)] + [(900, "cold", 5)]
    base = spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long")
    got = pack_assignments(base, 16, salt_buckets=4).collect()

    per_doc = defaultdict(int)
    fill = defaultdict(int)
    for r in got:
        assert r["pack_salt"] == _h(r["doc_id"]) % 4
        per_doc[r["doc_id"]] += r["tok_end"] - r["tok_start"]
        fill[(r["source"], r["pack_salt"], r["seq_no"])] += \
            r["tok_end"] - r["tok_start"]
    assert per_doc == {i: n for i, _s, n in rows}
    # hot host genuinely split across all 4 buckets
    assert {k[1] for k in fill if k[0] == "hot"} == {0, 1, 2, 3}
    # exact fill per bucket stream except its own tail
    last = defaultdict(int)
    for src, salt, seq in fill:
        last[(src, salt)] = max(last[(src, salt)], seq)
    for (src, salt, seq), f in fill.items():
        assert f == 16 or seq == last[(src, salt)]
    # dense numbering from 0 within each bucket
    for (src, salt), mx in last.items():
        assert {k[2] for k in fill if k[:2] == (src, salt)} == \
            set(range(mx + 1))


def test_salted_duckdb_parity(spark, sf_dir):
    import pathlib
    import sys

    import duckdb
    sys.path.insert(0, str(
        pathlib.Path(__file__).resolve().parents[1] / "tools"))
    from parity_check import value_hash

    from ocr_module_spark.functions.packing import (
        SQL_PACK_SEQUENCES_SALTED, q_pack_sequences_salted)

    df = q_pack_sequences_salted(spark, sf_dir)
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{sf_dir}/documents.parquet'")
    res = con.sql(SQL_PACK_SEQUENCES_SALTED)
    d_cols, d_rows = res.columns, res.fetchall()
    con.close()
    assert sorted(df.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows) > 0
    assert value_hash(s_rows, df.columns) == value_hash(d_rows, d_cols)

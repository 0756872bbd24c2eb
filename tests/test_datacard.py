"""text_datacard — one-pass corpus datasheet (GROUPING SETS rollup).

Pure-Python reference twin on a planted corpus (NULL/empty edges
included), conservation invariants (every dim partitions the corpus),
cross-parallelism determinism, and plan shape (text never rides the
Expand or any exchange; join-free). DuckDB value parity runs in
tools/parity_check.py and tests/test_hostile_parity.py.
"""

from __future__ import annotations

from collections import defaultdict

from ocr_module_spark.functions.datacard import (corpus_datacard,
                                                 q_text_datacard)

PLANTED = [
    # (doc_id, text, lang, source)
    (1, "one two three", "en", "a.com"),
    (2, "vier fünf", "de", "a.com"),
    (3, " ".join(f"w{i}" for i in range(12)), "en", "b.org"),
    (4, "", "en", "b.org"),            # empty text: 0 tokens, 0 chars
    (5, None, None, None),             # all-NULL row: und / '' host
    (6, "solo", "en", None),           # NULL host joins the '' group
    (7, "  padded   spacing  ", "fr", "c.net"),
]


def _twin_nt(text):
    """Byte-exact mirror of the engine's token count: split(trim(text),
    '\\s+') via exactsubstr._twin_words (space-only trim, ASCII \\s,
    leading/trailing empty strings kept) — NOT Python str.split(), which
    diverges on tab/newline-led text."""
    from ocr_module_spark.functions.exactsubstr import _twin_words
    return len(_twin_words(text))


def ref_datacard(rows):
    per = []
    for _id, text, lang, source in rows:
        nt = _twin_nt(text)
        nc = len(text) if text is not None else 0
        per.append((lang or "und", source or "", nt, nc,
                    len(str(nt))))
    out = {}
    for dim, key in (("total", lambda r: ""),
                     ("lang", lambda r: r[0]),
                     ("len_digits", lambda r: str(r[4]))):
        g = defaultdict(lambda: [0, set(), 0, 0])
        for r in per:
            a = g[key(r)]
            a[0] += 1
            a[1].add(r[1])
            a[2] += r[2]
            a[3] += r[3]
        for v, a in g.items():
            out[(dim, v)] = (a[0], len(a[1]), a[2], a[3])
    return out


def test_reference_twin(spark):
    df = spark.createDataFrame(
        PLANTED, "doc_id long, text string, lang string, source string")
    got = {(r["dim"], r["value"]):
           (r["n_docs"], r["n_hosts"], r["n_tokens"], r["n_chars"])
           for r in corpus_datacard(df).collect()}
    assert got == ref_datacard(PLANTED)


def test_dims_partition_corpus(spark, sf_dir):
    rows = q_text_datacard(spark, sf_dir).collect()
    by_dim = defaultdict(list)
    for r in rows:
        by_dim[r["dim"]].append(r)
    [total] = by_dim["total"]
    assert total["value"] == ""
    for dim in ("lang", "len_digits"):
        assert sum(r["n_docs"] for r in by_dim[dim]) == total["n_docs"]
        assert sum(r["n_tokens"] for r in by_dim[dim]) \
            == total["n_tokens"]
        assert sum(r["n_chars"] for r in by_dim[dim]) == total["n_chars"]
        # hosts span categories, so per-dim distinct counts bound the
        # corpus total from above but each is at most the total docs
        assert all(1 <= r["n_hosts"] <= total["n_docs"]
                   for r in by_dim[dim])


def test_curate_chain_mirror(spark):
    """Mirrors tools/curate.py --datacard plumbing: host derived from
    the curated output's url, crawl lang left-joined from pages (NULL
    lang lands in 'und')."""
    from ocr_module_spark.pipeline import with_host
    curated = spark.createDataFrame(
        [("http://a.com/x", "w1 w2"), ("http://b.org/y", "w3")],
        "url string, text string")
    pages = spark.createDataFrame(
        [("http://a.com/x", "en"), ("http://b.org/y", None)],
        "url string, lang string")
    base = with_host(curated).join(pages, "url", "left")
    rows = {(r["dim"], r["value"]): (r["n_docs"], r["n_tokens"])
            for r in corpus_datacard(base, host_col="url_host")
            .collect()}
    assert rows[("total", "")] == (2, 3)
    assert rows[("lang", "en")] == (1, 2)
    assert rows[("lang", "und")] == (1, 1)
    assert rows[("len_digits", "1")] == (2, 3)


def test_cross_parallelism_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"tok{i} " * (i % 23), ["en", "de", "fr"][i % 3],
          f"h{i % 11}") for i in range(400)],
        "doc_id long, text string, lang string, source string")
    a = sorted(map(tuple, corpus_datacard(df).collect()))
    b = sorted(map(tuple, corpus_datacard(
        df.repartition(13, "lang")).collect()))
    assert a == b


def test_plan_shape(spark, sf_dir):
    plan = (q_text_datacard(spark, sf_dir)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Expand" in plan                      # grouping sets, 1 pass
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    # text is consumed by the narrow projection before the Expand and
    # before any exchange: neither multiplies nor shuffles document text
    for line in plan.splitlines():
        if "Expand" in line or "Exchange" in line:
            assert "text#" not in line, line


# --- exemplar documents per card group (datacard_exemplars) ------------

def _ex_twin(rows, k=3):
    """Pure-Python mirror: k smallest (hex4(md5(doc_id)), doc_id) per
    (dim, value) group."""
    import hashlib
    per = []
    for _id, text, lang, source in rows:
        nt = _twin_nt(text)
        hk = int(hashlib.md5(str(_id).encode()).hexdigest()[:4], 16)
        per.append((_id, lang or "und", nt, len(str(nt)), hk,
                    text[:160] if text is not None else None))
    groups = {}
    for _id, lang, nt, ld, hk, prev in per:
        for dim, val in (("total", ""), ("lang", lang),
                         ("len_digits", str(ld))):
            groups.setdefault((dim, val), []).append(
                (hk, _id, nt, prev))
    out = {}
    for g, lst in groups.items():
        for rank, (hk, _id, nt, prev) in enumerate(sorted(lst)[:k], 1):
            out[(g[0], g[1], rank)] = (_id, nt, prev)
    return out


def test_exemplars_match_twin(spark):
    from ocr_module_spark.functions.datacard import datacard_exemplars
    rows = [(i, f"tok{i} " * (i % 29) or None,
             ["en", "de", None][i % 3], f"h{i % 7}") for i in range(120)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    got = {(r["dim"], r["value"], r["rank"]):
           (r["doc_id"], r["n_tokens"], r["preview"])
           for r in datacard_exemplars(df).collect()}
    assert got == _ex_twin(rows)


def test_exemplars_exactly_k_and_partitioning_invariant(spark):
    from ocr_module_spark.functions.datacard import datacard_exemplars
    rows = [(i, f"w{i} " * (i % 13), ["en", "fr"][i % 2], "h")
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    a = sorted(map(tuple, datacard_exemplars(df, k=2).collect()))
    b = sorted(map(tuple, datacard_exemplars(
        df.repartition(17, "doc_id"), k=2).collect()))
    assert a == b
    from collections import Counter
    c = Counter((r[0], r[1]) for r in a)
    # every group has exactly min(k, group size) exemplars; here all
    # groups exceed k=2
    assert set(c.values()) == {2}


def test_exemplars_small_group_keeps_all(spark):
    from ocr_module_spark.functions.datacard import datacard_exemplars
    df = spark.createDataFrame(
        [(1, "only swahili doc", "sw", "h"),
         (2, "one two", "en", "h"), (3, "three four", "en", "h"),
         (4, "five six", "en", "h"), (5, "seven eight", "en", "h")],
        "doc_id long, text string, lang string, source string")
    out = [r for r in datacard_exemplars(df).collect()
           if (r["dim"], r["value"]) == ("lang", "sw")]
    assert len(out) == 1 and out[0]["rank"] == 1 and out[0]["doc_id"] == 1


def test_exemplars_plan_shape(spark, sf_dir):
    from ocr_module_spark.functions.datacard import (
        q_text_datacard_exemplars)
    plan = (q_text_datacard_exemplars(spark, sf_dir)._jdf
            .queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan           # winners broadcast back
    # document text never rides a window/sort exchange — only the
    # narrow lottery frame does; text appears solely in the scan-side
    # projection feeding the broadcast join
    for line in plan.splitlines():
        if "Window" in line or "Sort" in line:
            assert "text#" not in line, line


def test_exemplars_url_keyed_cli_mirror(spark):
    """Mirrors tools/curate.py --datacard exemplar plumbing: url-keyed
    lottery (id_col='url'), NULL lang to 'und', string ids sort
    deterministically."""
    from ocr_module_spark.functions.datacard import datacard_exemplars
    base = spark.createDataFrame(
        [("http://a.com/x", "w1 w2", "en"),
         ("http://b.org/y", "w3", None),
         ("http://c.net/z", "w4 w5 w6", "en")],
        "url string, text string, lang string")
    out = datacard_exemplars(base, lang_col="lang", id_col="url")
    rows = {(r["dim"], r["value"], r["rank"]): r["doc_id"]
            for r in out.collect()}
    # total group quotes all 3 docs (k=3), each exactly once
    assert sorted(v for (d, _, _), v in rows.items() if d == "total") \
        == sorted(["http://a.com/x", "http://b.org/y", "http://c.net/z"])
    assert rows[("lang", "und", 1)] == "http://b.org/y"


def test_exemplars_twin_fuzz(spark):
    """Randomized corpora (NULL text/lang, duplicate-free ids) — the
    engine must match the pure-Python twin on every (group, rank)."""
    from hypothesis import given, settings, strategies as st

    from ocr_module_spark.functions.datacard import datacard_exemplars

    # tab/newline included: they are \s to the engine's split but NOT
    # stripped by its space-only trim, the exact class where a naive
    # str.split() twin diverges (leading/trailing empty tokens)
    TXT = st.one_of(st.none(), st.text(
        alphabet="ab c\t\n", min_size=0, max_size=30))
    LANG = st.sampled_from([None, "en", "de", "fr"])

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(TXT, LANG), min_size=1, max_size=25))
    def run(doc_specs):
        rows = [(i, t, lang, "h") for i, (t, lang) in
                enumerate(doc_specs)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string")
        got = {(r["dim"], r["value"], r["rank"]):
               (r["doc_id"], r["n_tokens"], r["preview"])
               for r in datacard_exemplars(df).collect()}
        assert got == _ex_twin(rows), rows

    run()

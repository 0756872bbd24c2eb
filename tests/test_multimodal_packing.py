"""Multimodal sequence packing: text docs + fixed-cost image items in
one packed stream, with modality-tagged boundary masks. Reference-twin
over a planted corpus + plan shape (1 exchange, no BNLJ)."""

from __future__ import annotations

import hashlib
from collections import defaultdict

from ocr_module_spark.functions.packing import (IMG_TOKEN_COST,
                                                multimodal_pack_base,
                                                packed_multimodal_sequences)

DOCS = [
    (1, "s1", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
    (2, "s1", "a b c"),
    (3, "s2", "only text in s2"),
    (4, "s1", "   "),                    # no tokens -> packs nothing
]
MEDIA = [
    ("p1", "s1"),
    ("p2", "s1"),
    ("p3", "s3"),                        # image-only source
]
L = 8


def _h(item_id: str) -> int:
    return int(hashlib.md5(item_id.encode()).hexdigest()[:4], 16)


def _ref(img_cost: int):
    """Concat-and-split over modality-prefixed items in hash order."""
    items = defaultdict(list)
    for doc_id, src, text in DOCS:
        words = text.strip().split()
        if words:
            iid = f"txt:{doc_id}"
            items[src].append((_h(iid), iid, "text", words))
    for item_id, src in MEDIA:
        iid = f"img:{item_id}"
        slots = [f"<img:{item_id}:{j}>" for j in range(1, img_cost + 1)]
        items[src].append((_h(iid), iid, "image", slots))
    chunks, starts = {}, defaultdict(list)
    for src, its in items.items():
        its.sort()
        flat = []
        for _hh, _iid, mod, toks in its:
            starts[(src, len(flat) // L)].append((len(flat) % L, mod))
            flat.extend(toks)
        for s in range((len(flat) + L - 1) // L):
            chunks[(src, s)] = flat[s * L:(s + 1) * L]
    return chunks, starts


def _frames(spark):
    d = spark.createDataFrame(DOCS, "doc_id long, source string, text string")
    m = spark.createDataFrame(MEDIA, "item_id string, source string")
    return d, m


def test_multimodal_sequences_match_reference(spark):
    d, m = _frames(spark)
    got = {(r["source"], r["seq_no"]): r
           for r in packed_multimodal_sequences(d, m, seq_len=L).collect()}
    chunks, starts = _ref(IMG_TOKEN_COST)
    assert set(got) == set(chunks)
    for k, chunk in chunks.items():
        r = got[k]
        assert list(r["tokens"]) == chunk, k
        assert r["n_fill"] == len(chunk), k
        exp = sorted(starts[k])
        assert list(r["doc_starts"]) == [o for o, _m in exp], k
        assert list(r["start_modalities"]) == [m_ for _o, m_ in exp], k


def test_image_only_source_packs_placeholder_stream(spark):
    d, m = _frames(spark)
    rows = [r for r in
            packed_multimodal_sequences(d, m, seq_len=L).collect()
            if r["source"] == "s3"]
    toks = [t for r in sorted(rows, key=lambda r: r["seq_no"])
            for t in r["tokens"]]
    assert toks == [f"<img:p3:{j}>" for j in range(1, IMG_TOKEN_COST + 1)]
    assert all(set(r["start_modalities"]) <= {"image"} for r in rows)


def test_modalities_interleave_and_ids_never_collide(spark):
    """The hash order interleaves modalities within a source (not
    all-text-then-all-image), and prefixed ids are disjoint even when a
    media item_id textually equals a doc_id."""
    d = spark.createDataFrame([(7, "s", "x y z")],
                              "doc_id long, source string, text string")
    m = spark.createDataFrame([("7", "s")], "item_id string, source string")
    base = multimodal_pack_base(d, m)
    ids = [r["doc_id"] for r in base.collect()]
    assert sorted(ids) == ["img:7", "txt:7"]


def test_plan_single_window_exchange_no_bnlj(spark):
    d, m = _frames(spark)
    df = packed_multimodal_sequences(d, m, seq_len=L)
    df.collect()
    plan = (df._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

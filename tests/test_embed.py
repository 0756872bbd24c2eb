"""Feature-hash embeddings: hand-computed vectors via the pure-Python
twin of the portable hash, exact twin equality on planted + fuzzed
corpora, sign-sum invariant, partitioning determinism, and the closed
loop: embed text → cosine ranks an exact token-copy first. Cross-engine
value parity runs on sf + hostile corpora via test_hostile_parity."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_module_spark.functions.embed import EMB_DIM, embed_hashing

# -- pure-Python twin ----------------------------------------------------

_DIGITS = "0123456789abcdef"


def _hex4(s: str) -> int:
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    return sum((_DIGITS.index(h[p])) * 16 ** (3 - p) for p in range(4))


def embed_py(texts, dim=EMB_DIM):
    out = {}
    for doc_id, t in texts.items():
        if t is None or not t.strip():
            continue
        v = [0] * dim
        for w in t.strip().split():
            w = w.lower()
            b = _hex4("b|" + w) % dim
            v[b] += 1 if _hex4("s|" + w) % 2 == 0 else -1
        out[doc_id] = v
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")


def _collect(df):
    return {r["doc_id"]: list(r["emb"]) for r in df.collect()}


def test_hand_computed_single_doc(spark):
    got = _collect(embed_hashing(_docs(spark, {0: "a a B b c"})))
    v = [0] * EMB_DIM
    for w, n in (("a", 2), ("b", 2), ("c", 1)):
        v[_hex4("b|" + w) % EMB_DIM] += \
            n * (1 if _hex4("s|" + w) % 2 == 0 else -1)
    assert got == {0: v}
    # the sign-sum invariant: sum(emb) == sum of per-token signs
    assert sum(got[0]) == sum(
        (1 if _hex4("s|" + w) % 2 == 0 else -1)
        for w in "a a b b c".split())


def test_empty_and_null_docs_absent(spark):
    got = _collect(embed_hashing(_docs(
        spark, {0: "", 1: "   ", 2: None, 3: "word"})))
    assert set(got) == {3}


PLANTED = {
    0: "the cat sat on the mat",
    1: "THE CAT SAT ON THE MAT",      # case-folds to an exact copy of 0
    2: "a completely different sentence about spark shuffles",
    3: "the cat sat on the mat today",
    4: "x " * 30 + "y",
    5: "单 词 中文 处理 空格",
}


def test_twin_equality_planted(spark):
    assert _collect(embed_hashing(_docs(spark, PLANTED))) \
        == embed_py(PLANTED)


_text = st.lists(
    st.sampled_from(["a", "b", "tok", "the", "Ü", "日本", "x1"]),
    min_size=0, max_size=15).map(" ".join)


@settings(max_examples=10, deadline=None)
@given(st.dictionaries(st.integers(0, 20), _text, max_size=6))
def test_twin_equality_fuzz(spark, texts):
    assert _collect(embed_hashing(_docs(spark, texts))) \
        == embed_py(texts)


def test_deterministic_across_parallelism(spark):
    texts = {i: PLANTED[i % len(PLANTED)] for i in range(40)}
    a = _collect(embed_hashing(_docs(spark, texts).repartition(1)))
    b = _collect(embed_hashing(_docs(spark, texts).repartition(8)))
    assert a == b


def test_cosine_loop_ranks_copy_first(spark):
    """The closed lifecycle: embeddings derived from text feed cosine
    similarity — a doc's case-folded exact copy scores cosine 1.0,
    strictly above every other doc."""
    emb = _collect(embed_hashing(_docs(spark, PLANTED)))

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), \
            math.sqrt(sum(y * y for y in b))
        return num / (na * nb)

    sims = {k: cos(emb[0], v) for k, v in emb.items() if k != 0}
    assert abs(sims[1] - 1.0) < 1e-12          # exact copy
    assert sims[1] > max(v for k, v in sims.items() if k != 1)
    # the near-copy (one extra token) beats the unrelated sentence
    assert sims[3] > sims[2]

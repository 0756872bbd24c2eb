"""The MinHash-LSH banding dial exercised on a DISCRIMINATIVE corpus.

The driver testdata has a 30-word vocabulary, which makes ~94% of all
pairs genuine near-dups — banding cannot demonstrate candidate pruning
there (r=2 was measured to trim only ~35%, VERDICT r2 §5). This fixture
corpus has a realistic vocabulary (4,000 distinct words, ~60-word docs,
seeded & deterministic) with planted near-dup pairs, so the (r, b) dial
shows its real behavior: r=2 banding prunes the candidate universe to a
small fraction of all-pairs while keeping every planted near-dup pair.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.dedup import (banded_candidate_pairs,
                                              minhash_band_keys)

N_DOCS = 240
DOC_WORDS = 60
VOCAB = 4000
N_PLANTED = 12          # near-dup pairs: copy with ~8% of words replaced


def _fixture_rows():
    rng = random.Random(42)
    vocab = [f"w{i:05d}" for i in range(VOCAB)]
    rows = []
    for i in range(N_DOCS - N_PLANTED):
        words = rng.sample(vocab, DOC_WORDS)
        rows.append((i, " ".join(words)))
    planted = []
    for j in range(N_PLANTED):
        base_id, base_text = rows[j * 3]
        words = base_text.split()
        for pos in rng.sample(range(DOC_WORDS), max(1, DOC_WORDS // 12)):
            words[pos] = rng.choice(vocab)
        dup_id = N_DOCS - N_PLANTED + j
        rows.append((dup_id, " ".join(words)))
        planted.append((base_id, dup_id))
    return rows, planted


@pytest.fixture(scope="module")
def fixture_docs(spark):
    rows, planted = _fixture_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.localCheckpoint(eager=True)
    return df, planted


def test_r2_banding_prunes_candidates_keeps_true_pairs(fixture_docs):
    """r=2 candidates are <10% of all-pairs AND contain every planted
    near-dup pair — the S-curve shift is pruning noise, not signal."""
    df, planted = fixture_docs
    cands = {(r["doc_a"], r["doc_b"])
             for r in banded_candidate_pairs(df, r=2, b=4).collect()}
    all_pairs = N_DOCS * (N_DOCS - 1) // 2
    ratio = len(cands) / all_pairs
    assert ratio < 0.10, f"r=2 pruning failed: {len(cands)}/{all_pairs}"
    for pair in planted:
        assert pair in cands, f"planted near-dup pair {pair} lost"


def test_r2_strictly_prunes_vs_r1_same_budget(fixture_docs):
    """At the same total hash budget (r*b = 8), r=2 yields strictly
    fewer candidates than r=1: longer band keys demand agreement on two
    minhashes at once, which random (non-dup) pairs rarely do."""
    df, planted = fixture_docs
    c1 = banded_candidate_pairs(df, r=1, b=8).count()
    c2 = banded_candidate_pairs(df, r=2, b=4).count()
    assert c2 < c1, (c1, c2)


def test_band_keys_shape(fixture_docs):
    """b bands per doc; r=2 keys are two concatenated md5 hex digests."""
    df, _ = fixture_docs
    keys = minhash_band_keys(df, r=2, b=4)
    per_doc = (keys.groupBy("doc_id").agg(F.count("*").alias("n"))
               .select(F.min("n"), F.max("n")).first())
    assert tuple(per_doc) == (4, 4)
    assert keys.select(F.min(F.length("key")),
                       F.max(F.length("key"))).first() == (64, 64)

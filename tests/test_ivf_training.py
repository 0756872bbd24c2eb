"""Distributed IVF k-means training (train_ivf_centroids): planted
cluster recovery, bit-determinism across partitionings (the fixed-point
accumulation property), empty-cell retention, and probe integration."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.simsearch import (CENT_SCALE, ivf_assign,
                                                  train_ivf_centroids)

# three well-separated planted clusters in 4-d; the first 3 vec_ids (the
# deterministic seeds) each sit in a different cluster
CLUSTERS = [
    [1.0, 0.0, 0.0, 0.0],
    [0.0, 1.0, 0.0, 0.0],
    [0.0, 0.0, 1.0, 0.0],
]


def _corpus(spark, repartition=None):
    rows = []
    for i in range(30):
        c = i % 3
        base = CLUSTERS[c]
        jitter = [((i * 7 + j * 13) % 10 - 5) / 100.0 for j in range(4)]
        rows.append((i, f"c{c}", [b + e for b, e in zip(base, jitter)]))
    df = spark.createDataFrame(
        rows, "vec_id long, label string, vec array<double>")
    return df.repartition(repartition, "vec_id") if repartition else df


def test_recovers_planted_clusters(spark):
    e = _corpus(spark)
    cents = train_ivf_centroids(e, k=3, rounds=3)
    got = {r["vec_id"]: r["cid"]
           for r in ivf_assign(e, cents).collect()}
    # every cluster is pure: all members of planted cluster c share a cid
    by_planted = {c: {got[i] for i in range(30) if i % 3 == c}
                  for c in range(3)}
    assert all(len(cids) == 1 for cids in by_planted.values())
    assert len({next(iter(c)) for c in by_planted.values()}) == 3
    # each centroid is near its planted center (jitter is <= 0.05/dim)
    for c in range(3):
        cid = next(iter(by_planted[c]))
        diff = max(abs(a - b) for a, b in zip(cents[cid], CLUSTERS[c]))
        assert diff < 0.06


def test_bit_deterministic_across_partitionings(spark):
    a = train_ivf_centroids(_corpus(spark), k=3, rounds=3)
    b = train_ivf_centroids(_corpus(spark, repartition=7), k=3, rounds=3)
    assert a == b  # exact equality — fixed-point sums are associative
    # and every component sits on the 1e-6 fixed-point grid
    for vec in a.values():
        for v in vec:
            assert abs(v * CENT_SCALE - round(v * CENT_SCALE)) < 1e-9


def test_empty_cell_keeps_previous_centroid(spark):
    # seed 2 (vec_id 2) is immediately outdrawn: all mass sits in two
    # far clusters, so after round 1 its cell can empty — training must
    # carry the old centroid instead of dropping the cell
    rows = [(0, "a", [1.0, 0.0]), (1, "b", [0.0, 1.0]),
            (2, "far", [100.0, 100.0])] + \
           [(i, "a" if i % 2 else "b",
             [1.0, 0.0] if i % 2 else [0.0, 1.0]) for i in range(3, 20)]
    e = spark.createDataFrame(
        rows, "vec_id long, label string, vec array<double>")
    cents = train_ivf_centroids(e, k=3, rounds=2)
    assert set(cents) == {0, 1, 2}
    assert all(len(v) == 2 for v in cents.values())


def test_trained_quantizer_plugs_into_probe_shape(spark, sf_dir):
    from ocr_module_spark.functions.simsearch import NLIST, _emb

    e = _emb(spark, sf_dir)
    cents = train_ivf_centroids(e, k=NLIST, rounds=2)
    assigned = ivf_assign(e, cents)
    # the assignment stays the zero-exchange projection
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    dist = assigned.groupBy("cid").count().collect()
    assert sum(r["count"] for r in dist) == e.count()
    # training should spread the corpus over multiple cells
    assert len(dist) >= 2

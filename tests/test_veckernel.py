"""veckernel bit-identity: the numpy fold kernels must produce the SAME
doubles as the interpreted zip_with/aggregate fold — not merely close.
The 4dp HALF_UP rounding that pins cross-engine parity happens JVM-side
on those doubles, so bit-equality here IS the parity guarantee for every
query that swapped kernels (knn / ivf / cosine-dedup / decon-knn /
recall-eval).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_module_spark.functions.simsearch import _dot
from ocr_module_spark.functions.veckernel import fold_dot_matrix, fold_dots


def _hostile_vec_frame(spark):
    """Vectors exercising every null/shape seam zip_with+aggregate has:
    plain, negative/denormal-ish magnitudes, the zero vector, a length
    mismatch (zip_with pads with NULL -> NULL fold), a NULL array, a
    NULL element, and values whose products hit rounding boundaries."""
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0], [0.5, -0.25, 0.125, 2.0]),
        (1, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
        (2, [1e-300, 1e300, -1e-300, 1.0], [1e300, 1e-300, 1e300, -1.0]),
        (3, [0.1, 0.2, 0.3, 0.4], [0.7, 0.11, 0.13, 0.17]),
        (4, [1.0, 2.0], [1.0, 2.0, 3.0, 4.0]),        # ragged -> NULL
        (5, None, [1.0, 2.0, 3.0, 4.0]),              # NULL array
        (6, [1.0, None, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),  # NULL element
        (7, [0.00005, 0.00015, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
        # long vector: exercises the vectorized matrix path's fold order
        (8, [float(i) * 0.001 - 0.3 for i in range(4)],
            [math.sin(i) for i in range(4)]),
    ]
    return spark.createDataFrame(
        rows, "id int, a array<double>, b array<double>")


def test_fold_dots_bit_identical_to_hof(spark):
    df = _hostile_vec_frame(spark)
    got = {r["id"]: r["d"]
           for r in fold_dots(df, [("a", "b", "d")]).collect()}
    want = {r["id"]: r["d"]
            for r in df.select("id", _dot("a", "b").alias("d")).collect()}
    assert set(got) == set(want)
    for i in want:
        if want[i] is None:
            assert got[i] is None, i
        else:
            # bit equality, not approx: struct the doubles
            assert math.isnan(want[i]) and math.isnan(got[i]) or \
                want[i].hex() == got[i].hex(), (i, want[i], got[i])


def test_fold_dots_self_pair_and_multi(spark):
    df = _hostile_vec_frame(spark).where("id < 4")
    out = fold_dots(df, [("a", "a", "na"), ("a", "b", "ab"),
                         ("b", "b", "nb")])
    want = df.select(
        "id", _dot("a", "a").alias("na"), _dot("a", "b").alias("ab"),
        _dot("b", "b").alias("nb"))
    got = {r["id"]: (r["na"], r["ab"], r["nb"]) for r in out.collect()}
    exp = {r["id"]: (r["na"], r["ab"], r["nb"]) for r in want.collect()}
    for i in exp:
        for g, w in zip(got[i], exp[i]):
            assert (g is None) == (w is None)
            if w is not None:
                assert g.hex() == w.hex(), (i, g, w)


def test_fold_dot_matrix_bit_identical_to_hof(spark):
    mat = [[0.5, -0.25, 0.125, 2.0],
           [1.0, 1.0, 1.0, 1.0],
           [0.1, 0.2, 0.3, 0.4]]
    df = _hostile_vec_frame(spark).select("id", "a")
    out = fold_dot_matrix(df, "a", mat, "cdots", keep=("id",))
    got = {r["id"]: r["cdots"] for r in out.collect()}
    lit = "array(" + ", ".join(
        "array(" + ", ".join(f"{v!r}D" for v in row) + ")"
        for row in mat) + ")"
    hof = df.select("id", F.expr(
        f"transform({lit}, c -> aggregate(zip_with(a, c, (x, y) -> x * y),"
        " cast(0.0 as double), (acc, v) -> acc + v))").alias("cdots"))
    exp = {r["id"]: r["cdots"] for r in hof.collect()}
    assert set(got) == set(exp)
    for i in exp:
        if exp[i] is None:
            # HOF transform(NULL array) -> NULL; kernel mirrors
            assert got[i] is None, i
            continue
        assert got[i] is not None and len(got[i]) == len(exp[i]), i
        for g, w in zip(got[i], exp[i]):
            assert (g is None) == (w is None), (i, g, w)
            if w is not None:
                assert g.hex() == w.hex(), (i, g, w)


def test_fold_dot_matrix_empty_batches(spark):
    """Zero-row input must yield zero rows, not a numpy broadcast error:
    _to_matrix returns a (0, 0) matrix for an empty batch, which the
    kernel must not multiply against a (d,) centroid. Exercised with an
    empty frame AND a many-partition frame (empty partitions)."""
    mat = [[0.5, -0.25, 0.125, 2.0], [1.0, 1.0, 1.0, 1.0]]
    empty = spark.createDataFrame([], "id int, a array<double>")
    assert fold_dot_matrix(empty, "a", mat, "cdots").collect() == []
    sparse = _hostile_vec_frame(spark).where("id = 0") \
        .repartition(16).select("id", "a")
    got = fold_dot_matrix(sparse, "a", mat, "cdots",
                          keep=("id",)).collect()
    assert len(got) == 1 and len(got[0]["cdots"]) == 2
    assert fold_dots(empty.withColumnRenamed("a", "a").selectExpr(
        "id", "a AS a", "a AS b"), [("a", "b", "d")]).collect() == []


def test_fold_dot_matrix_float_input_matches_double_cast(spark, sf_dir):
    """Feeding the raw float embedding column must equal casting to
    double first — float32→float64 widening is exact on both paths."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
    ed = e.withColumn("vec", F.expr(
        "transform(embedding, x -> cast(x as double))"))
    mat = [r["vec"] for r in ed.select("vec").limit(3).collect()]
    a = {r["vec_id"]: r["cdots"] for r in fold_dot_matrix(
        e, "embedding", mat, "cdots", keep=("vec_id",)).collect()}
    b = {r["vec_id"]: r["cdots"] for r in fold_dot_matrix(
        ed, "vec", mat, "cdots", keep=("vec_id",)).collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert [x.hex() for x in a[k]] == [x.hex() for x in b[k]], k


@pytest.mark.parametrize("qname", ["knn_brute_cosine", "ann_ivf_probe"])
def test_kernel_queries_zero_hash_exchanges(spark, sf_dir, qname):
    """The kernel swap must not add exchanges: the probe stays a map
    stage + TakeOrdered, brute knn shuffles nothing but the final
    top-k."""
    from ocr_module_spark.functions import simsearch as S
    q = {"knn_brute_cosine": S.q_knn_brute_cosine,
         "ann_ivf_probe": S.q_ann_ivf_probe}[qname]
    plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

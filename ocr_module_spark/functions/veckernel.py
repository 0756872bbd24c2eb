"""Vectorized left-fold dot-product kernels (numpy inside mapInArrow).

Spark's higher-order array functions (``zip_with``/``aggregate``) never
enter whole-stage codegen: every embedding dot product written as
``aggregate(zip_with(a, b, (x, y) -> x*y), 0.0D, (acc, v) -> acc + v)``
runs on the interpreted expression evaluator — measured as most of
``ann_ivf_probe``'s cost and a tax on every knn / cosine-dedup /
decontamination query (BENCH.md §-1, round 3).

These kernels move the fold into numpy inside a ZERO-EXCHANGE
``mapInArrow`` stage while staying **bit-identical** to the HOF form:

* elementwise products first (``a * b`` — each product is the same
  IEEE-754 double multiply the JVM performs), then
* accumulation dimension-by-dimension in index order over the whole
  batch (``acc += prods[:, d]`` for d = 0..D-1) — for every output row
  this performs ``((0.0 + p0) + p1) + ...`` in exactly the JVM fold's
  operation order, so the resulting double is bit-equal;
* the 4dp HALF_UP rounding that pins cross-engine parity **stays
  JVM-side** on the emitted raw doubles — the kernel never rounds.

Null / ragged semantics mirror ``zip_with``+``aggregate``: a NULL array,
a NULL element, or a length mismatch (zip_with pads the shorter side
with NULL) poisons the fold to NULL.

Scale notes: the stage is a pure map over Arrow batches — no shuffle, no
driver traffic; a constant centroid/query matrix rides the closure (the
moral equivalent of a broadcast, k×dim doubles). At 10^12 vectors this
is the same plan as the interpreted form, minus ~100× of per-element
interpreter overhead.

Reference tie: the dot-product scoring this accelerates generalizes the
per-page relevance math of ocr_module's analyze step (the engine itself
has no vector path — this module exists for the training-data suite).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType


def _to_matrix(arr, n_rows: int):
    """(n, d) float64 matrix from an Arrow list array, or None when the
    vectorized path cannot represent it exactly (nulls / ragged rows —
    the caller falls back to the per-row fold)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        return None
    if n_rows == 0:
        return np.empty((0, 0), dtype=np.float64)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    d = int(lens[0])
    if not (lens == d).all():
        return None
    flat = arr.flatten()          # respects slicing offsets
    if flat.null_count:
        return None               # a NULL element poisons its row's fold
    vals = flat.to_numpy(zero_copy_only=False)
    # float32 -> float64 widening is exact (same doubles the JVM's
    # cast(float as double) produces)
    return vals.astype("float64", copy=False).reshape(n_rows, d)


def _fold_mat(prods):
    """Left-fold accumulate over the dimension axis: bit-equal, per row,
    to the JVM's sequential ``acc + v`` fold (numpy elementwise addition
    is per-element IEEE-754; the loop fixes the operation order)."""
    import numpy as np
    n, d = prods.shape
    acc = np.zeros(n, dtype=np.float64)
    for j in range(d):
        acc += prods[:, j]
    return acc


def _fold_row(a, b) -> float | None:
    """Per-row fallback with zip_with/aggregate null semantics."""
    if a is None or b is None or len(a) != len(b):
        return None
    acc = 0.0
    for x, y in zip(a, b):
        if x is None or y is None:
            return None
        acc += float(x) * float(y)
    return acc


def fold_dots(df: DataFrame,
              pairs: Sequence[tuple[str, str, str]]) -> DataFrame:
    """Append one raw-double column per ``(a_col, b_col, out_col)`` —
    the left-fold dot of the two array columns — in ONE zero-exchange
    mapInArrow stage. Round/compare JVM-side afterwards."""
    from ..deploy import ensure_pyfiles
    ensure_pyfiles(df.sparkSession)
    in_names = df.columns
    pair_spec = [(in_names.index(a), in_names.index(b), out)
                 for a, b, out in pairs]
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out, DoubleType()) for _a, _b, out in pairs])

    def batches(it):
        import numpy as np
        import pyarrow as pa
        for batch in it:
            n = batch.num_rows
            cols = list(batch.columns)
            mats: dict[int, object] = {}
            for ia, ib, _out in pair_spec:
                for i in (ia, ib):
                    if i not in mats:
                        mats[i] = _to_matrix(cols[i], n)
            extra = []
            for ia, ib, _out in pair_spec:
                ma, mb = mats[ia], mats[ib]
                if (ma is not None and mb is not None
                        and ma.shape == mb.shape):
                    extra.append(pa.array(_fold_mat(ma * mb),
                                          type=pa.float64()))
                elif (ma is not None and mb is not None and n > 0):
                    # rectangular but different widths: zip_with pads
                    # with NULL -> every fold is NULL
                    extra.append(pa.nulls(n, type=pa.float64()))
                else:
                    la = cols[ia].to_pylist()
                    lb = cols[ib].to_pylist()
                    extra.append(pa.array(
                        [_fold_row(a, b) for a, b in zip(la, lb)],
                        type=pa.float64()))
            yield pa.RecordBatch.from_arrays(
                cols + extra,
                names=in_names + [out for _a, _b, out in pair_spec])

    return df.mapInArrow(batches, schema=out_schema)


def fold_dot_matrix(df: DataFrame, vec_col: str,
                    matrix: Iterable[Sequence[float]], out_col: str,
                    keep: Sequence[str] | None = None) -> DataFrame:
    """Append ``out_col: array<double>`` where ``out_col[i]`` is the raw
    left-fold dot of ``vec_col`` against ``matrix[i]`` (a small constant
    k×dim matrix — IVF centroids, a query batch — riding the closure).
    One zero-exchange mapInArrow stage; ``keep`` trims the passthrough
    columns (default: all input columns)."""
    import numpy as np

    from ..deploy import ensure_pyfiles
    ensure_pyfiles(df.sparkSession)
    if keep is not None:
        df = df.select(*dict.fromkeys(list(keep) + [vec_col]))
    in_names = df.columns
    vec_idx = in_names.index(vec_col)
    mat = np.array([list(r) for r in matrix], dtype=np.float64)
    k, d = mat.shape
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(DoubleType()))])

    def batches(it):
        import numpy as np
        import pyarrow as pa
        for batch in it:
            n = batch.num_rows
            cols = list(batch.columns)
            m = _to_matrix(cols[vec_idx], n)
            if m is not None and (n == 0 or m.shape[1] == d):
                # dots[:, i] = fold(vec * mat[i]) in index order: the
                # per-centroid elementwise product then the same
                # sequential accumulate as the JVM fold. n == 0 must
                # skip the product loop — _to_matrix returns a (0, 0)
                # matrix whose broadcast against a (d,) centroid raises
                dots = np.empty((n, k), dtype=np.float64)
                if n:
                    for i in range(k):
                        dots[:, i] = _fold_mat(m * mat[i])
                arr = pa.ListArray.from_arrays(
                    pa.array(np.arange(0, (n + 1) * k, k, dtype="int32")),
                    pa.array(dots.ravel(), type=pa.float64()))
            else:
                # transform(<matrix>, c -> aggregate(zip_with(v, c, ...)))
                # over a NULL v yields an array of NULL dots (the
                # transform maps the non-null matrix), not a NULL array
                rows = cols[vec_idx].to_pylist()
                arr = pa.array(
                    [[_fold_row(v, list(c)) for c in mat] for v in rows],
                    type=pa.list_(pa.float64()))
            yield pa.RecordBatch.from_arrays(
                cols + [arr], names=in_names + [out_col])

    return df.mapInArrow(batches, schema=out_schema)

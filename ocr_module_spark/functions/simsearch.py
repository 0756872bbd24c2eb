"""Similarity search over the ``embeddings`` table (``array<float>``).

* brute-force cosine top-k — the correctness baseline: one broadcast of the
  query vector, dot products evaluated JVM-side with higher-order array
  functions (``zip_with`` + ``aggregate``) — no Python, no shuffle except
  the final top-k.
* sign-LSH buckets — the scale path: an 8-bit hyperoctant key from the
  signs of the leading dimensions turns ANN into an equi-join; at 10^12
  vectors the bucket key is the shuffle key and each bucket is a small
  local top-k.

Embeddings in the test corpus are L2-normalized (dot == cosine); both
engines compute in float64 and round to 4 decimals so the hash compare is
stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

TOP_K = 10
QUERY_VEC_ID = 0
SIGN_BITS = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .withColumn("vec", F.expr(
                "transform(embedding, x -> cast(x as double))")))


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)")


def q_knn_brute_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k neighbors of the query vector by cosine, brute force."""
    e = _emb(spark, sf_dir)
    q = (e.where(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("vec").alias("qvec")))
    # try_divide: a zero-norm vector yields cosine NULL (exactly DuckDB's
    # float division-by-zero semantics) instead of an ANSI
    # DIVIDE_BY_ZERO failing the whole job — zero vectors are routine in
    # real embedding corpora (hostile-corpus regression)
    scored = (e.where(F.col("vec_id") != QUERY_VEC_ID)
              .crossJoin(F.broadcast(q))
              .select("vec_id", "label",
                      F.round(F.try_divide(
                          _dot("vec", "qvec"),
                          F.sqrt(_dot("vec", "vec")) *
                          F.sqrt(_dot("qvec", "qvec"))), 4).alias("cosine")))
    return (scored.orderBy(F.col("cosine").desc(), F.col("vec_id"))
            .limit(TOP_K))


SQL_KNN_BRUTE_COSINE = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), scored AS (
  SELECT e.vec_id, e.label,
         round(list_dot_product(e.embedding::DOUBLE[], q.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(q.qvec, q.qvec))), 4) AS cosine
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, label, cosine FROM scored
ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
"""


def _sign_bucket(vec: str, bits: int = SIGN_BITS, offset: int = 0):
    """Sign-LSH bucket key from ``bits`` consecutive dims starting at
    ``offset``. ``bits`` is the recall/cost dial: each extra bit halves
    the expected bucket population (so in-bucket pair counts stay bounded
    as the corpus grows — size bits ~ log2(n_vectors / target_bucket)),
    at the cost of splitting true neighbor pairs across buckets; banding
    over multiple offsets (see dedup_embedding_cosine) buys the recall
    back without re-inflating any single bucket."""
    cols = [
        F.when(F.element_at(F.col(vec), offset + b + 1) >= 0,
               F.lit(2 ** b)).otherwise(0)
        for b in range(bits)
    ]
    out = F.lit(0)
    for b in cols:
        out = out + b
    return out.cast("int")


def q_ann_sign_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperoctant LSH bucketing: 8-bit sign key over leading dims."""
    e = _emb(spark, sf_dir)
    return (e.select(_sign_bucket("vec").alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_vecs")))


SQL_ANN_SIGN_BUCKETS = (
    "WITH b AS (SELECT ("
    + " + ".join(
        f"CASE WHEN embedding[{b + 1}] >= 0 THEN {2 ** b} ELSE 0 END"
        for b in range(SIGN_BITS))
    + ")::INTEGER AS bucket FROM embeddings)\n"
    "SELECT bucket, count(*) AS n_vecs FROM b GROUP BY bucket"
)


def q_ann_bucketed_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN: top-k within the query's sign bucket only (the equi-join
    candidate set), cosine-ranked. Recall < 1.0 by design; the bucket key
    is what makes the join shuffle-bounded at scale."""
    e = _emb(spark, sf_dir).withColumn("bucket", _sign_bucket("vec"))
    q = (e.where(F.col("vec_id") == QUERY_VEC_ID)
         .select(F.col("vec").alias("qvec"), F.col("bucket").alias("qbucket")))
    cands = (e.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
             .where(F.col("vec_id") != QUERY_VEC_ID))
    scored = cands.select(
        "vec_id", "label",
        F.round(_dot("vec", "qvec"), 4).alias("dot"))
    return scored.orderBy(F.col("dot").desc(), F.col("vec_id")).limit(TOP_K)


SQL_ANN_BUCKETED_KNN = (
    "WITH b AS (SELECT vec_id, label, embedding, ("
    + " + ".join(
        f"CASE WHEN embedding[{b + 1}] >= 0 THEN {2 ** b} ELSE 0 END"
        for b in range(SIGN_BITS))
    + f""")::INTEGER AS bucket FROM embeddings),
q AS (SELECT embedding::DOUBLE[] AS qvec, bucket AS qbucket FROM b
      WHERE vec_id = {QUERY_VEC_ID})
SELECT vec_id, label,
       round(list_dot_product(embedding::DOUBLE[], q.qvec), 4) AS dot
FROM b JOIN q ON b.bucket = q.qbucket
WHERE vec_id <> {QUERY_VEC_ID}
ORDER BY dot DESC, vec_id LIMIT {TOP_K}
"""
)


NLIST = 16                  # IVF coarse centroids (deterministic: first 16 vecs)
NPROBE = 4                  # cells probed per query


def _cents_sql(cents: dict[int, list[float]]) -> str:
    """The centroid matrix as ONE parsed SQL array-of-arrays literal
    (17-sig-digit exponent form round-trips every double exactly).
    Building it as thousands of individual F.lit Columns costs seconds of
    py4j/Catalyst overhead; a single expression string parses once.
    Centroid i of the sorted dict sits at array index i, so the transform
    index IS the cell id (asserted by the caller)."""
    return "array(" + ", ".join(
        "array(" + ", ".join(f"{float(v):.17e}D" for v in cvec) + ")"
        for _cid, cvec in sorted(cents.items())) + ")"


def ivf_assign(e: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """Coarse-quantize every vector to its nearest centroid as a SINGLE
    shuffle-free projection: the per-row cell id is the argmax over
    (rounded dot, -cid) structs — lexicographic ``array_max`` picks the
    highest dot, lowest cid on ties. The previous shape (crossJoin
    against the centroid table + a row_number window partitioned by
    vec_id) was a NLIST× row blowup plus a full shuffle of every vector
    just to compute a per-row argmax; this is zero exchanges and zero
    extra rows (plan-asserted in tests), which at 10^12 vectors is the
    difference between a map stage and the biggest shuffle in the job.
    Centroids arrive as a driver-side dict (the 'trained' coarse
    quantizer — NLIST rows, the moral equivalent of a broadcast)."""
    assert sorted(cents) == list(range(len(cents))), "dense centroid ids"
    best = F.expr(
        f"array_max(transform({_cents_sql(cents)}, (c, i) -> struct("
        "round(aggregate(zip_with(vec, c, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v), 4) AS cdot, "
        "-i AS negcid)))")
    return e.select("vec_id", "label", "vec",
                    (-best["negcid"]).cast("int").alias("cid"))


def q_ann_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat ANN: coarse-quantize every vector to its nearest of NLIST
    centroids (one shuffle-free argmax projection — the inverted-file
    build, see ivf_assign), then search only the NPROBE cells nearest the
    query. At 10^12 vectors the cell id is the partition/shuffle key and
    the probed fraction bounds the work; the centroid 'training' is
    deterministic (first NLIST vectors) so both engines agree exactly.
    Ranking uses dots rounded to 4dp with id tie-breaks — FP-stable
    across engines."""
    e = _emb(spark, sf_dir)
    cents = {r["vec_id"]: list(r["vec"]) for r in
             e.where(F.col("vec_id") < NLIST)
              .select("vec_id", "vec").collect()}
    assigned = ivf_assign(e, cents)
    # the query's NPROBE nearest cells: same literal-centroid dots, sorted
    # ascending by (-qdot, cid) == descending qdot with cid tie-break
    probe_cells = F.expr(
        f"transform(slice(array_sort(transform({_cents_sql(cents)}, "
        "(c, i) -> struct("
        "-round(aggregate(zip_with(vec, c, (x, y) -> x * y), "
        "cast(0.0 as double), (acc, v) -> acc + v), 4) AS nqdot, "
        f"i AS cid))), 1, {NPROBE}), s -> s.cid)")
    qcells = (e.where(F.col("vec_id") == QUERY_VEC_ID)
              .select(F.col("vec").alias("qvec"),
                      F.explode(probe_cells).alias("cid")))
    cands = (assigned.join(F.broadcast(qcells), "cid")
             .where(F.col("vec_id") != QUERY_VEC_ID))
    return (cands.select("vec_id", "label", "cid",
                         F.round(_dot("vec", "qvec"), 4).alias("dot"))
            .orderBy(F.col("dot").desc(), F.col("vec_id"))
            .limit(TOP_K))


SQL_ANN_IVF_PROBE = f"""
WITH e AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id < {NLIST}
), scored AS (
  SELECT e.vec_id, e.label, e.v, c.cid,
         round(list_dot_product(e.v, c.cvec), 4) AS cdot
  FROM e CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, label, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY cdot DESC, cid) AS rk
    FROM scored) WHERE rk = 1
), qcells AS (
  SELECT a.v AS qvec, c.cid,
         round(list_dot_product(a.v, c.cvec), 4) AS qdot
  FROM assigned a CROSS JOIN cents c
  WHERE a.vec_id = {QUERY_VEC_ID}
  ORDER BY qdot DESC, c.cid LIMIT {NPROBE}
)
SELECT a.vec_id, a.label, a.cid,
       round(list_dot_product(a.v, q.qvec), 4) AS dot
FROM assigned a JOIN qcells q ON a.cid = q.cid
WHERE a.vec_id <> {QUERY_VEC_ID}
ORDER BY dot DESC, a.vec_id LIMIT {TOP_K}
"""


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation: recall@k of the bucketed ANN against the
    brute-force ground truth — 'measure, don't guess' as an operator.
    A pipeline tuning SIGN_BITS/bands reruns exactly this on a sample; at
    scale the brute-force side runs on a small sampled query set while
    the ANN side is the production index, so the evaluation cost is
    bounded by the sample, not the corpus."""
    truth = q_knn_brute_cosine(spark, sf_dir).select("vec_id")
    approx = q_ann_bucketed_knn(spark, sf_dir).select("vec_id")
    hits = truth.join(approx, "vec_id")
    return hits.agg(
        F.lit(TOP_K).alias("k"),
        F.count("*").cast("long").alias("n_hits"),
        F.round(F.count("*") / TOP_K, 4).alias("recall_at_k"))


SQL_ANN_RECALL_EVAL = f"""
WITH truth AS (
  {SQL_KNN_BRUTE_COSINE.strip()}
), approx AS (
  {SQL_ANN_BUCKETED_KNN.strip()}
)
SELECT {TOP_K} AS k,
       count(*)::BIGINT AS n_hits,
       round(count(*) / {TOP_K}, 4) AS recall_at_k
FROM truth t JOIN approx a ON t.vec_id = a.vec_id
"""


REGISTRY = {
    "ann_recall_eval": (q_ann_recall_eval, SQL_ANN_RECALL_EVAL),
    "knn_brute_cosine": (q_knn_brute_cosine, SQL_KNN_BRUTE_COSINE),
    "ann_ivf_probe": (q_ann_ivf_probe, SQL_ANN_IVF_PROBE),
    "ann_sign_buckets": (q_ann_sign_buckets, SQL_ANN_SIGN_BUCKETS),
    "ann_bucketed_knn": (q_ann_bucketed_knn, SQL_ANN_BUCKETED_KNN),
}

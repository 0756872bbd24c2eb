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

from pyspark.sql import DataFrame, SparkSession
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
    scored = (e.where(F.col("vec_id") != QUERY_VEC_ID)
              .crossJoin(F.broadcast(q))
              .select("vec_id", "label",
                      F.round(_dot("vec", "qvec") /
                              (F.sqrt(_dot("vec", "vec")) *
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


def _sign_bucket(vec: str):
    bits = [
        F.when(F.element_at(F.col(vec), b + 1) >= 0, F.lit(2 ** b)).otherwise(0)
        for b in range(SIGN_BITS)
    ]
    out = F.lit(0)
    for b in bits:
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


REGISTRY = {
    "knn_brute_cosine": (q_knn_brute_cosine, SQL_KNN_BRUTE_COSINE),
    "ann_sign_buckets": (q_ann_sign_buckets, SQL_ANN_SIGN_BUCKETS),
    "ann_bucketed_knn": (q_ann_bucketed_knn, SQL_ANN_BUCKETED_KNN),
}

"""Feature-hashing document embeddings (the hashing trick, in-engine).

The similarity-search suite (simsearch), embedding-cosine dedup and
embedding-kNN decontamination all consume an ``embedding`` column; this
module closes the lifecycle by DERIVING one from text with no external
model: signed feature hashing (Weinberger et al. 2009, "Feature Hashing
for Large Scale Multitask Learning") — every token hashes to one of
``EMB_DIM`` buckets with a ±1 sign from an independent hash, and the
document's vector is the signed count per bucket. Inner products of
these vectors are unbiased estimates of token-multiset inner products,
which is exactly what cosine-kNN / IVF probing need; no vocabulary, no
training, no OOV.

Determinism is the design constraint: buckets and signs come from the
repo's portable 16-bit md5 arithmetic (functions/hashing — bit-exact
in Spark and DuckDB, swapped for xxhash64 in one place at deployment),
and the vector entries are signed INTEGER counts — the embedding table
is bit-identical across partitionings, retries, and engines. Float
enters only downstream where it always did (cosine normalization in
veckernel), never in the stored artifact.

Shape: one token explode → groupBy(doc_id, bucket) with map-side
partial aggregation soaking the explode → groupBy(doc_id) assembling
the dense vector via a bucket→value map lookup over
``sequence(0, D-1)`` (order-independent, so the collect_list
nondeterminism cannot leak into the artifact). Two narrow exchanges
(doc_id+bucket+count longs); document text never shuffles. Docs with
no token stream produce no row (the langid/model_score convention).

Reference tie: the corpus-side feature extraction the reference's
fixed-schema AnalyzeResult never needed — at 10^12 docs the embedding
must be derivable from the table itself, not fetched from a service
(the anti-pattern the reference's RPC OCR adapters embody).

Gate: ``text_embed_hash`` full DuckDB twin (hash arithmetic + signed
counts + dense assembly) on sf + hostile corpora via the hostile gate;
tests/test_embed.py (hand-computed vectors, twin equality, zero-sum
cancellation, determinism, and the end-to-end loop: embed → veckernel
cosine kNN ranks a doc's near-duplicate first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashing import hex4_col, hex4_sql_duck

EMB_DIM = 64          # matches the corpus embeddings table dimension


def _tokens(docs: DataFrame) -> DataFrame:
    w = F.when(F.length(F.trim("text")) == 0,
               F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim("text"), r"\s+"))
    return docs.select("doc_id", F.explode(w).alias("word")) \
        .select("doc_id", F.lower("word").alias("word"))


def embed_hashing(docs: DataFrame, dim: int = EMB_DIM) -> DataFrame:
    """(doc_id, emb array<long>): signed-count feature-hash embedding.

    bucket = hex4(md5('b|' || word)) mod dim; sign = ±1 from the
    independent 's|' salt — one md5 pair per token, integer end-to-end.
    """
    t = _tokens(docs)
    bucket = (hex4_col(F.md5(F.concat(F.lit("b|"), F.col("word"))
                             .cast("binary"))) % dim).alias("bucket")
    sign = (F.when(hex4_col(F.md5(F.concat(F.lit("s|"), F.col("word"))
                                  .cast("binary"))) % 2 == 0, 1)
            .otherwise(-1)).alias("sign")
    s = (t.select("doc_id", bucket, sign)
         .groupBy("doc_id", "bucket")
         .agg(F.sum("sign").cast("long").alias("v")))
    m = (s.groupBy("doc_id")
         .agg(F.map_from_entries(
             F.collect_list(F.struct("bucket", "v"))).alias("m")))
    dense = F.expr(
        f"transform(sequence(0, {dim - 1}),"
        " i -> coalesce(element_at(m, cast(i as bigint)), 0L))")
    return m.select("doc_id", dense.alias("emb"))


def q_text_embed_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    return embed_hashing(d)


_B = hex4_sql_duck("md5('b|' || word)")
_S = hex4_sql_duck("md5('s|' || word)")

SQL_TEXT_EMBED_HASH = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
), t AS (
  SELECT doc_id, lower(u.word) AS word FROM d, unnest(w) AS u(word)
), s AS (
  SELECT doc_id,
         ({_B}) % {EMB_DIM} AS bucket,
         sum(CASE WHEN ({_S}) % 2 = 0 THEN 1 ELSE -1 END)::BIGINT AS v
  FROM t GROUP BY doc_id, bucket
), grid AS (
  SELECT ids.doc_id, gs.i
  FROM (SELECT DISTINCT doc_id FROM s) ids,
       generate_series(0, {EMB_DIM - 1}) AS gs(i)
)
SELECT grid.doc_id,
       list(coalesce(s.v, 0) ORDER BY grid.i) AS emb
FROM grid LEFT JOIN s ON grid.doc_id = s.doc_id AND grid.i = s.bucket
GROUP BY grid.doc_id
"""

REGISTRY = {
    "text_embed_hash": (q_text_embed_hash, SQL_TEXT_EMBED_HASH),
}

"""Per-span enrichment pipeline — the reference's second entry point
(``TranslateClient.translate_document``, SURVEY.md §3.2) re-expressed as
one lazy Spark chain:

    chunk (W3) → batch-prompt assembly (A8) → enrichment fn → response
    disassembly (A9) → positional zip join (J9) → identity-fallback
    left join (J6), with the empty/short-section short-circuit (Q2).

No external translation service exists in this engine (SURVEY.md §7.3);
the enrichment slot is pluggable and ships with deterministic local
functions. The driver query uses ``upper()`` so the DuckDB oracle can
verify the END-TO-END semantics independently: it does not replay the
chunk/prompt machinery, it states the contract — every paragraph of a
translated section comes back enriched, every skipped-section paragraph
falls back to its own content, row count preserved. Any bug anywhere in
the chain (lost paragraph, wrong zip order, marker corruption) breaks
that endpoint.

Reference citations: chunking usecase/translate_section_formula_id.py:
124-140 (LIMIT=1500); prompt format openai_translate_section_repository.
py:64-69; response split :147-164; positional zip :219-229; fallback
usecase/get_translated_page.py:33-63; empty short-circuit
translate_section_formula_id.py:111-122.
"""

from __future__ import annotations

from typing import Callable, Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

CHUNK_LIMIT = 1500
MIN_SECTION_LEN = 200       # Q2: sections shorter than this are skipped
MARKER = "### Paragraph "


def greedy_chunk_ids_py(lengths: List[int], limit: int = CHUNK_LIMIT) -> List[int]:
    """Exact greedy packing (the reference's loop): start a new chunk when
    adding the next paragraph would exceed ``limit``; an oversized single
    paragraph still gets its own chunk. Pure function — the spec for the
    applyInPandas variant below."""
    out, cur, acc = [], 0, 0
    for n in lengths:
        if acc and acc + n > limit:
            cur += 1
            acc = 0
        acc += n
        out.append(cur)
    return out


def greedy_chunks(paras: DataFrame, group_cols: List[str],
                  order_col: str, len_col: str,
                  limit: int = CHUNK_LIMIT) -> DataFrame:
    """W3 exact-greedy chunk ids per group via applyInPandas (SURVEY.md
    §7.2 hard part (c): the window prefix-sum only approximates greedy;
    the reference's packing is stateful, so it runs per-group in Arrow
    batches — groups are single sections, never large)."""
    from ..deploy import ensure_pyfiles
    ensure_pyfiles(paras.sparkSession)
    schema_str = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in paras.schema.fields
    ) + ", chunk_id int"

    def assign(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pdf["chunk_id"] = greedy_chunk_ids_py(list(pdf[len_col]), limit)
        return pdf

    return paras.groupBy(*group_cols).applyInPandas(assign, schema=schema_str)


def enrich_paragraphs(paras: DataFrame,
                      enrich: Callable[[Column], Column] = F.upper,
                      limit: int = CHUNK_LIMIT,
                      min_section_len: int = MIN_SECTION_LEN) -> DataFrame:
    """Run the full enrichment chain over ``(url, section_id,
    paragraph_id, content)`` rows; returns the input columns plus
    ``translation`` (enriched, or = content for skipped sections).

    Scale shape: two shuffles total — one to group paragraphs into chunk
    prompts, one to join the disassembled responses back; both keyed by
    (url, section_id), the natural enrichment-batch key. The enrichment
    callable runs on whole chunk prompts (the reference amortizes its RPC
    the same way).
    """
    w_sec = W.partitionBy("url", "section_id")
    sized = paras.withColumn("sec_len",
                             F.sum(F.length("content")).over(w_sec))
    todo = sized.where(F.col("sec_len") >= min_section_len)
    skipped = sized.where(F.col("sec_len") < min_section_len)

    # W3: chunk ids (window form; chunk boundaries only affect batching,
    # not the per-paragraph result — exact greedy is greedy_chunks above)
    w_ord = (W.partitionBy("url", "section_id").orderBy("paragraph_id")
             .rowsBetween(W.unboundedPreceding, 0))
    chunked = todo.withColumn(
        "chunk_id",
        F.floor((F.sum(F.length("content")).over(w_ord)
                 - F.length("content")) / limit))

    # A8: ordered batch prompt '### Paragraph <id> ###\n<content>'
    piece = F.format_string(MARKER + "%d ###\n%s",
                            F.col("paragraph_id"), F.col("content"))
    ordered = F.array_sort(F.collect_list(F.struct(
        F.col("paragraph_id"), piece.alias("piece"))))
    prompts = (chunked.groupBy("url", "section_id", "chunk_id")
               .agg(F.array_join(
                   F.transform(ordered, lambda x: x["piece"]), "\n\n")
                   .alias("prompt")))

    # the enrichment slot (deterministic local fn; RPC-shaped seam)
    responses = prompts.withColumn("response", enrich(F.col("prompt")))

    # A9 + J9: split the response back into per-paragraph pieces; the
    # k-th piece belongs to the k-th paragraph of the chunk (positional
    # zip); the piece's marker line is stripped (content after first \n)
    resp_piece = F.posexplode(F.split("response", "\n\n")) \
        .alias("pos", "piece")
    resp_rows = (responses.select("url", "section_id", "chunk_id", resp_piece)
                 .select("url", "section_id", "chunk_id", "pos",
                         F.expr("substring(piece, instr(piece, '\n') + 1)")
                         .alias("translation")))
    para_pos = chunked.withColumn(
        "pos",
        F.row_number().over(W.partitionBy("url", "section_id", "chunk_id")
                            .orderBy("paragraph_id")) - 1)
    zipped = para_pos.join(resp_rows,
                           ["url", "section_id", "chunk_id", "pos"])

    # J6/Q3: skipped sections pass through with translation = content
    out_cols = ["url", "section_id", "paragraph_id", "content", "translation"]
    return (zipped.select(*out_cols)
            .unionByName(skipped.withColumn("translation", F.col("content"))
                         .select(*out_cols)))


# -- driver query + oracle ---------------------------------------------------

def _paras_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic paragraph frame both engines can build: documents grouped
    into sections of 5 by doc_id, content = leading text slice."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("source").alias("url"),
        (F.col("doc_id") % 7).alias("section_id"),
        F.col("doc_id").alias("paragraph_id"),
        F.substring("text", 1, 120).alias("content"))


def q_enrich_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end enrichment chain; oracle states the endpoint contract."""
    out = enrich_paragraphs(_paras_from_documents(spark, sf_dir))
    return out.select("url", "section_id", "paragraph_id",
                      "content", "translation")


SQL_ENRICH_ROUNDTRIP = f"""
WITH paras AS (
  SELECT source AS url, doc_id % 7 AS section_id, doc_id AS paragraph_id,
         substr(text, 1, 120) AS content
  FROM documents
), sized AS (
  SELECT *, sum(length(content)) OVER (PARTITION BY url, section_id)
            AS sec_len
  FROM paras
)
SELECT url, section_id, paragraph_id, content,
       CASE WHEN sec_len >= {MIN_SECTION_LEN} THEN upper(content)
            ELSE content END AS translation
FROM sized
"""


REGISTRY = {
    "enrich_roundtrip": (q_enrich_roundtrip, SQL_ENRICH_ROUNDTRIP),
}

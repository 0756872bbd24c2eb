"""Per-span enrichment pipeline — the reference's second entry point
(``TranslateClient.translate_document``, SURVEY.md §3.2) re-expressed as
one lazy Spark chain:

    chunk (W3) → batch-prompt assembly (A8) → enrichment fn → KEYED
    response disassembly (A9; pieces matched back by the paragraph-id
    parsed from their marker — J8-style map join, with J9's positional
    zip certified separately by q_join_positional_zip) →
    identity-fallback (J6), with the empty/short-section short-circuit
    (Q2) as a per-chunk ``when()`` (or a literal branch split for
    RPC-shaped seams, ``split_branches=True``).

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

from typing import Callable, List

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


# split the response ONLY at separators followed by a marker line (the
# "\n\n" joiner), so content containing blank lines can never fragment a
# piece; case-insensitive because enrich fns may case-fold the marker
_SEP_RE = r"\n\n(?=(?i:### Paragraph \d+ ###\n))"
_PID_RE = r"^(?i)### Paragraph (\d+) ###"


def _disassemble_keyed(grouped: DataFrame, qualifies: Column) -> DataFrame:
    """A9 + J8-style keyed disassembly: each response piece carries its
    own ``### Paragraph <id> ###`` marker; the piece is matched to its
    paragraph BY ID (parsed from the marker), never by position — an
    enrich fn that emits extra blank lines cannot shift assignments
    (positional zip was a silent misalignment hazard). The match runs
    per-chunk with array higher-order functions: zero extra shuffles,
    no join. A paragraph whose piece went missing falls back to its own
    content (J6 identity-fallback, get_translated_page.py:54-63)."""
    ex = grouped.select(
        "url", "section_id", "sec_len",
        F.split("response", _SEP_RE).alias("rp"),
        F.explode("parts").alias("part"))

    def _pid(p: Column) -> Column:
        s = F.regexp_extract(p, _PID_RE, 1)
        return F.when(s != "", s.cast("int"))

    matched = F.try_element_at(
        F.filter(F.col("rp"),
                 lambda p: _pid(p) == F.col("part.paragraph_id")),
        F.lit(1))
    ex = ex.withColumn("m", matched)
    stripped = F.expr("substring(m, instr(m, '\n') + 1)")
    translation = F.when(~qualifies, F.col("part.content")) \
        .otherwise(F.coalesce(stripped, F.col("part.content")))
    return ex.select(
        "url", "section_id",
        F.col("part.paragraph_id").alias("paragraph_id"),
        F.col("part.content").alias("content"),
        translation.alias("translation"))


def _enrich_chain(sized: DataFrame, enrich: Callable[[Column], Column],
                  limit: int, qualifies_grouped: Column,
                  conditional: bool) -> DataFrame:
    """chunk (W3) → prompt assembly (A8) → enrich → keyed disassembly."""
    # W3: chunk ids (window form; chunk boundaries only affect batching,
    # not the per-paragraph result — exact greedy is greedy_chunks above).
    # Same partition key as the sec_len window: no second exchange.
    w_ord = (W.partitionBy("url", "section_id").orderBy("paragraph_id")
             .rowsBetween(W.unboundedPreceding, 0))
    chunked = sized.withColumn(
        "chunk_id",
        F.floor((F.sum(F.length("content")).over(w_ord)
                 - F.length("content")) / limit))

    # A8: ordered batch prompt '### Paragraph <id> ###\n<content>';
    # groupBy keys are a superset of the window partitioning, so the
    # aggregation reuses the existing distribution — still one exchange.
    # NULL content gets a NULL piece (format_string would render the
    # string "null" into the prompt): array_join skips NULL elements, the
    # keyed disassembly then finds no piece for that id and falls back to
    # content — i.e. NULL in, NULL out, matching the SQL oracle's
    # upper(NULL) semantics.
    piece = F.when(
        F.col("content").isNotNull(),
        F.format_string(MARKER + "%d ###\n%s",
                        F.col("paragraph_id"), F.col("content")))
    grouped = (chunked.groupBy("url", "section_id", "chunk_id")
               .agg(F.array_sort(F.collect_list(F.struct(
                   F.col("paragraph_id"), F.col("content"),
                   piece.alias("piece")))).alias("parts"),
                   F.min("sec_len").alias("sec_len")))
    prompt = F.array_join(
        F.transform("parts", lambda x: x["piece"]), "\n\n")
    grouped = grouped.withColumn("prompt", prompt)

    # the enrichment slot (deterministic local fn; RPC-shaped seam)
    response = enrich(F.col("prompt"))
    if conditional:
        response = F.when(qualifies_grouped, response)
    grouped = grouped.withColumn("response", response)
    return _disassemble_keyed(grouped, qualifies_grouped)


def enrich_paragraphs(paras: DataFrame,
                      enrich: Callable[[Column], Column] = F.upper,
                      limit: int = CHUNK_LIMIT,
                      min_section_len: int = MIN_SECTION_LEN,
                      split_branches: bool = False) -> DataFrame:
    """Run the full enrichment chain over ``(url, section_id,
    paragraph_id, content)`` rows; returns the input columns plus
    ``translation`` (enriched, or = content for skipped sections).

    Scale shape (default, ``split_branches=False``): ONE scan of the
    source and ONE shuffle total — the (url, section_id) window exchange
    is reused by the chunk-id window and the prompt aggregation (superset
    grouping keys), disassembly is keyed array logic with no join, and
    the Q2 short-circuit is a per-chunk ``when()`` so the skipped branch
    needs no second pass (the previous branch-split plan scanned the
    source three times — measured in PLANS.md r1).

    ``split_branches=True`` restores the literal filter-split: skipped
    sections never reach the enrichment callable at all — use this when
    ``enrich`` is an RPC-shaped pandas UDF (a ``when()`` guard does not
    prevent Spark from invoking a UDF on non-qualifying rows), at the
    cost of a second scan of the source subtree. Both modes produce
    identical results (tests assert it).
    """
    w_sec = W.partitionBy("url", "section_id")
    sized = paras.withColumn("sec_len",
                             F.sum(F.length("content")).over(w_sec))
    qualifies = F.col("sec_len") >= min_section_len
    out_cols = ["url", "section_id", "paragraph_id", "content", "translation"]

    if split_branches:
        todo = sized.where(qualifies)
        skipped = sized.where(~qualifies)
        enriched = _enrich_chain(todo, enrich, limit,
                                 qualifies_grouped=qualifies,
                                 conditional=False)
        # J6/Q3: skipped sections pass through with translation = content
        return (enriched.select(*out_cols)
                .unionByName(skipped
                             .withColumn("translation", F.col("content"))
                             .select(*out_cols)))

    return _enrich_chain(sized, enrich, limit,
                         qualifies_grouped=qualifies,
                         conditional=True).select(*out_cols)


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

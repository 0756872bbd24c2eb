"""Extraction-pipeline queries for the driver contract.

The extraction input (the ``pages`` table) is synthesized deterministically
by corpus.py — the DuckDB side cannot run the HTML parse, so these entries
have no ``oracle_sql`` (the driver records rows-only checks; the full
byte-identity gate lives in pytest against the committed golden fixtures).
The row counts scale with the sf dir so the driver exercises them at every
scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import corpus, pipeline

_N_BY_SF = {"sf0.001": 200, "sf0.01": 1000, "sf0.1": 16000}


def _n_docs(sf_dir: str) -> int:
    return _N_BY_SF.get(os.path.basename(sf_dir.rstrip("/")), 500)


def q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full extraction (fast path) over the synthetic crawl;
    stable scalar projection of the result."""
    pages = corpus.pages_df(spark, _n_docs(sf_dir))
    out = pipeline.extract(pages)
    return out.select(
        "url",
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
        F.size("spans").alias("n_spans"),
        F.size("sections").alias("n_sections"),
        "n_pages", "mismatch_flag")


def q_extract_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-level relational path: parse → classify, rolled up per kind/role
    (block detection P1 + classification P2/P10 as inspectable rows)."""
    pages = corpus.pages_df(spark, _n_docs(sf_dir))
    nodes = pipeline.classify_nodes(pipeline.parse_nodes(pages))
    return (nodes.groupBy("kind", "role", "keep")
            .agg(F.count("*").alias("n_blocks"),
                 F.sum("text_len").alias("total_text_len")))


def q_extract_sections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Section membership (J1-J3) over the synthetic crawl."""
    pages = corpus.pages_df(spark, _n_docs(sf_dir))
    secs = pipeline.sections_df(pipeline.parse_nodes(pages))
    return secs.select(
        "url", "section_id",
        F.size("paragraph_ids").alias("n_paragraphs"),
        F.size("table_ids").alias("n_tables"),
        F.size("figure_ids").alias("n_figures"))


def q_extract_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decomposed relational pipeline (parse → classify → window ids →
    placeholder alignment → grouped reassembly — one Spark operator per
    SURVEY §2 row) end-to-end; tests assert it matches the fast path
    byte-for-byte, this entry exposes it to the driver."""
    pages = corpus.pages_df(spark, _n_docs(sf_dir) // 2)
    out = pipeline.extract_relational(pages)
    return out.select(
        "url",
        F.sha2(F.col("text").cast("binary"), 256).alias("text_sha256"),
        F.length("text").alias("text_len"),
        "mismatch_flag")


REGISTRY = {
    "extract_text": (q_extract_text, None),
    "extract_relational": (q_extract_relational, None),
    "extract_nodes": (q_extract_nodes, None),
    "extract_sections": (q_extract_sections, None),
}

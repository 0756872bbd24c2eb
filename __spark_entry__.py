"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction over the deterministic
synthetic crawl; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 plus the training-data-pipeline suites
(dedup / similarity search / text analysis) with DuckDB oracles where the
semantics are SQL-expressible. Extraction queries (HTML parse inside
Arrow-batched UDFs) have no SQL oracle — their correctness gate is the
byte-identity pytest suite against committed golden fixtures.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full main-content extraction at smoke scale."""
    from ocr_module_spark.operators.extraction import q_extract_text
    return q_extract_text(spark, "/root/testdata/sf0.001")


def _registry():
    from ocr_module_spark.functions import registry as fn_registry
    from ocr_module_spark.operators import registry as op_registry
    reg = {}
    reg.update(op_registry())
    reg.update(fn_registry())
    return reg


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items()
            if sql is not None}

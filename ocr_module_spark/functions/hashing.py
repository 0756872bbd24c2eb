"""Shared portable-hash helpers (cross-engine verifiable md5 arithmetic).

The training-data suites key several operators (SimHash bit mixing,
rolling fingerprints, deterministic hash sampling) on the first 4 hex
chars of an md5 — 16 bits of hash as an integer, computed with arithmetic
that is bit-exact in both Spark and DuckDB so every oracle compare is
byte-stable. One definition, three surfaces: a Column builder, a Spark-SQL
string form (for use inside ``transform(...)`` lambda strings), and the
DuckDB mirror. A production deployment swaps md5 for ``xxhash64`` in one
place — here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_DIGITS = "0123456789abcdef"


def hex4_col(col):
    """First 4 hex chars of a hex-string Column as a LONG (16 bits)."""
    total = F.lit(0)
    for pos in range(4):
        total = total + (F.instr(F.lit(_DIGITS),
                                 F.substring(col, pos + 1, 1)) - 1) \
            * (16 ** (3 - pos))
    return total.cast("long")


def hex4_sql_spark(expr: str) -> str:
    """Same 16-bit value as a Spark SQL string expression over ``expr``."""
    parts = [
        f"(instr('{_DIGITS}', substring({expr}, {p + 1}, 1)) - 1)"
        f" * {16 ** (3 - p)}"
        for p in range(4)
    ]
    return "(" + " + ".join(parts) + ")"


def doc_lottery_col(id_col: str = "doc_id"):
    """The house doc-grain hash lottery key as a Column: 16 portable
    bits of md5 over the decimal/string form of the id. One definition
    for every sampler (stratified thinning, datacard exemplars, probe
    sampling) so the lotteries can never drift apart across engines."""
    return hex4_col(F.md5(F.col(id_col).cast("string").cast("binary")))


def doc_lottery_sql_duck(expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`doc_lottery_col`."""
    return hex4_sql_duck(f"md5(CAST({expr} AS VARCHAR))")


def hex4_sql_duck(expr: str) -> str:
    """DuckDB mirror of :func:`hex4_sql_spark` (strpos/substr dialect)."""
    parts = [
        f"(strpos('{_DIGITS}', substr({expr}, {p + 1}, 1)) - 1)"
        f" * {16 ** (3 - p)}"
        for p in range(4)
    ]
    return "(" + " + ".join(parts) + ")"

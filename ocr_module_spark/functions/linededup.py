"""Host-level boilerplate line stripping (CCNet-style "local dedup").

DOM-based extraction (pipeline.py) strips chrome the markup identifies;
what survives on real crawls is boilerplate the markup does NOT mark —
cookie banners, subscribe prompts, share bars — repeated verbatim on
most pages of a host. CCNet/RefinedWeb remove these corpus-side: a line
that appears in many documents of the same group is boilerplate
everywhere it appears. This module is that pass, Spark-first:

1. ``line_stats``  — explode ``split(text, '\\n')`` (position kept),
   normalize by space-trim, and count DISTINCT docs per (group, line):
   one partial-agg-friendly aggregation; document text itself never
   rides this shuffle (only the exploded lines do, once — the canonical
   CCNet pass over the corpus).
2. ``flagged_lines`` — keep lines hitting BOTH dials: ``min_docs``
   absolute and ``min_pct`` percent of the group's documents (integer
   math — ``cnt*100 >= pct*n_docs`` — so cross-engine parity is exact).
   The result is a small per-group array frame (bounded: at most
   ``100/min_pct`` boilerplate lines exist per average document).
3. ``strip_boilerplate_lines`` — broadcast-join the flag arrays back on
   the group key and remove flagged lines IN-ROW with native
   ``filter``/``array_join`` (kept lines keep their original bytes;
   whitespace-only lines are structure and never flagged nor removed).
   Zero shuffles touch the document text.

Scale notes (100 TB): the flag frame is one row per GROUP (host), so
broadcast holds far beyond any realistic boilerplate volume for a
single-crawl host census (~10^6-10^7 hosts x a handful of lines); if a
deployment's census outgrows the broadcast ceiling, flip
``broadcast_flags=False`` and the join degrades to a hash join on the
group key — the text shuffles once, nothing else changes. For raw-byte
savings at the stats stage, production can group on ``xxhash64(line)``
instead of the line string; the string form is kept here because the
DuckDB oracle must replay it exactly (hash algorithms differ across
engines).

Reference tie: the role-based DROP of navigation/footer content this
generalizes is the reference's section classifier dispatch
(ocr_module/usecase/translate_section.py role gating); the corpus-level
statistical form has no reference twin — it exists because 10^12
documents make repetition itself the signal.

Gate: ``q_boilerplate_lines``/``SQL_BOILERPLATE_LINES`` (DuckDB parity,
hostile + sf corpora) and tests/test_linededup.py (planted-boilerplate
corpus, Spark==DuckDB on it, hypothesis fuzz vs a pure-Python twin).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_DOCS = 3     # absolute: a line in >= 3 docs of a group
MIN_PCT = 30     # relative: ... and >= 30% of the group's docs

_NL = "\n"


def line_stats(docs: DataFrame, group_col: str = "source",
               key_col: str = "doc_id",
               text_col: str = "text") -> Tuple[DataFrame, DataFrame]:
    """(per-(group, line) distinct-doc counts, per-group doc counts).

    Lines are space-trimmed for counting; whitespace-only lines are
    excluded (they are document structure, not boilerplate). NULL group
    keys survive the aggregations but can never be flagged — the
    flag join is inner on the group key and SQL NULL joins to nothing
    (pinned by the hostile gate's all-NULL source rows).
    """
    lines = (docs
             .select(group_col, key_col,
                     F.explode(F.split(F.col(text_col), _NL)).alias("raw"))
             .select(group_col, key_col, F.trim("raw").alias("line"))
             .where(F.col("line") != ""))
    stats = (lines.groupBy(group_col, "line")
             .agg(F.countDistinct(key_col).alias("n_docs_with_line")))
    grp = (docs.groupBy(group_col)
           .agg(F.countDistinct(key_col).alias("n_docs")))
    return stats, grp


def flagged_lines(docs: DataFrame, group_col: str = "source",
                  key_col: str = "doc_id", text_col: str = "text",
                  min_docs: int = MIN_DOCS,
                  min_pct: int = MIN_PCT) -> DataFrame:
    """Per-group sorted array of boilerplate lines (small, broadcastable)."""
    stats, grp = line_stats(docs, group_col, key_col, text_col)
    return (stats.join(grp, group_col)
            .where((F.col("n_docs_with_line") >= min_docs)
                   & (F.col("n_docs_with_line") * 100
                      >= min_pct * F.col("n_docs")))
            .groupBy(group_col)
            .agg(F.array_sort(F.collect_list("line")).alias("boiler_lines")))


def strip_boilerplate_lines(docs: DataFrame, group_col: str = "source",
                            key_col: str = "doc_id", text_col: str = "text",
                            min_docs: int = MIN_DOCS, min_pct: int = MIN_PCT,
                            broadcast_flags: bool = True,
                            flags: DataFrame | None = None) -> DataFrame:
    """Input grain + ``text_clean``/``n_lines``/``n_lines_kept``.

    Kept lines keep their ORIGINAL bytes (normalization is only the
    match key); NULL text stays NULL with NULL counts — the caller's
    corpus grain is preserved row-for-row.

    ``flags`` accepts a precomputed (checkpointed) :func:`flagged_lines`
    frame so a caller that also reports flag counters runs the
    exploded-lines census ONCE, not once per consumer.
    """
    if flags is None:
        flags = flagged_lines(docs, group_col, key_col, text_col,
                              min_docs, min_pct)
    if broadcast_flags:
        flags = F.broadcast(flags)
    boiler = F.coalesce(F.col("boiler_lines"),
                        F.array().cast("array<string>"))
    lines = F.split(F.col(text_col), _NL)
    kept = F.filter(
        lines, lambda x: (F.trim(x) == "")
        | ~F.array_contains(boiler, F.trim(x)))
    return (docs.join(flags, group_col, "left")
            .withColumn("n_lines", F.size(lines).cast("int"))
            .withColumn("n_lines_kept", F.size(kept).cast("int"))
            .withColumn("text_clean", F.array_join(kept, _NL))
            .drop("boiler_lines"))


def q_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract form over the documents table: doc grain with the
    clean-text digest (md5 keeps the value-hash compare byte-exact
    without shipping megabytes of text through the compare)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = strip_boilerplate_lines(docs)
    return out.select(
        "doc_id", "n_lines", "n_lines_kept",
        F.md5(F.col("text_clean").cast("binary")).alias("clean_md5"))


SQL_BOILERPLATE_LINES = f"""
WITH lines AS (
    SELECT source, doc_id, trim(l) AS line
    FROM (SELECT source, doc_id,
                 unnest(string_split(text, chr(10))) AS l
          FROM documents)
    WHERE trim(l) <> ''
), grp AS (
    SELECT source, count(DISTINCT doc_id) AS n_docs
    FROM documents GROUP BY source
), flags AS (
    SELECT s.source,
           list_sort(list(s.line)) AS boiler_lines
    FROM (SELECT source, line,
                 count(DISTINCT doc_id) AS n_docs_with_line
          FROM lines GROUP BY source, line) s
    JOIN grp USING (source)
    WHERE s.n_docs_with_line >= {MIN_DOCS}
      AND s.n_docs_with_line * 100 >= {MIN_PCT} * grp.n_docs
    GROUP BY s.source
)
SELECT d.doc_id,
       CAST(len(string_split(d.text, chr(10))) AS INT) AS n_lines,
       CAST(len(list_filter(string_split(d.text, chr(10)),
            x -> trim(x) = '' OR NOT list_contains(
                     coalesce(f.boiler_lines, []), trim(x)))) AS INT)
           AS n_lines_kept,
       md5(CASE WHEN d.text IS NULL THEN NULL ELSE
           -- coalesce: DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' (the all-lines-removed doc)
           coalesce(array_to_string(list_filter(
               string_split(d.text, chr(10)),
               x -> trim(x) = '' OR NOT list_contains(
                        coalesce(f.boiler_lines, []), trim(x))),
               chr(10)), '') END)
           AS clean_md5
FROM documents d LEFT JOIN flags f USING (source)
"""

# -- line-quality filtering (C4/RefinedWeb line-wise rules) -------------------

LINE_MIN_WORDS = 3        # R1: shorter fragments need terminal punctuation
LINE_MAX_UPPER_PCT = 60   # R2: mainly-uppercase lines (menus, SHOUTING nav)
LINE_MAX_DIGIT_PCT = 50   # R3: mainly-digit lines (counters, timestamps)
DOC_DROP_PCT = 50         # doc verdict: most of the doc was junk lines
TERMINAL = (".", "!", "?", '"')
POLICY_PHRASES = ("sign in", "sign up", "click here", "read more",
                  "accept cookies", "all rights reserved")


def _keep_line(x):
    """Keep-verdict for one line — the C4/RefinedWeb line-wise rules as
    native JVM expressions (evaluated inside ONE in-row ``filter`` — no
    explode, no shuffle). Whitespace-only lines are document structure
    and always kept, same convention as the boilerplate strip. ASCII
    character classes on BOTH engines keep the ratios byte-portable."""
    t = F.trim(x)
    n_upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    n_alpha = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(t, "[^0-9]", ""))
    n_words = F.size(F.split(t, r"\s+"))
    last = F.substring(t, -1, 1)
    r1 = (n_words < LINE_MIN_WORDS) & ~last.isin(*TERMINAL)
    r2 = (n_alpha > 0) & (n_upper * 100 > LINE_MAX_UPPER_PCT * n_alpha)
    r3 = n_digit * 100 > LINE_MAX_DIGIT_PCT * F.length(t)
    low = F.lower(t)
    r4 = F.lit(False)
    for p in POLICY_PHRASES:
        r4 = r4 | low.contains(p)
    return (t == "") | ~(r1 | r2 | r3 | r4)


def line_quality_filter(docs: DataFrame,
                        text_col: str = "text") -> DataFrame:
    """Input grain + ``text_filtered``/``n_lines``/``n_lines_kept``/
    ``doc_drop`` — the line-wise cleanup pass (drop nav fragments,
    mainly-uppercase/digit lines, policy phrases) C4/RefinedWeb apply
    after boilerplate stripping. A pure zero-exchange projection: every
    rule is integer math over the split array in-row. ``doc_drop``
    (> {DOC_DROP_PCT}% of lines removed) is the RefinedWeb whole-doc
    verdict, emitted as a flag — dropping is downstream policy."""
    lines = F.split(F.col(text_col), _NL)
    kept = F.filter(lines, _keep_line)
    n_lines = F.size(lines).cast("int")
    n_kept = F.size(kept).cast("int")
    return (docs
            .withColumn("n_lines", n_lines)
            .withColumn("n_lines_kept", n_kept)
            .withColumn("doc_drop",
                        (n_lines - n_kept) * 100 > DOC_DROP_PCT * n_lines)
            .withColumn("text_filtered", F.array_join(kept, _NL)))


def q_line_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = line_quality_filter(docs)
    return out.select(
        "doc_id", "n_lines", "n_lines_kept", "doc_drop",
        F.md5(F.col("text_filtered").cast("binary")).alias("filtered_md5"))


_KEEP_SQL = (
    "trim(x) = '' OR NOT ("
    f"(len(string_split_regex(trim(x), '\\s+')) < {LINE_MIN_WORDS}"
    " AND right(trim(x), 1) NOT IN ('.', '!', '?', '\"'))"
    " OR (length(regexp_replace(trim(x), '[^A-Za-z]', '', 'g')) > 0"
    "     AND length(regexp_replace(trim(x), '[^A-Z]', '', 'g')) * 100"
    f"        > {LINE_MAX_UPPER_PCT} *"
    "          length(regexp_replace(trim(x), '[^A-Za-z]', '', 'g')))"
    " OR length(regexp_replace(trim(x), '[^0-9]', '', 'g')) * 100"
    f"      > {LINE_MAX_DIGIT_PCT} * length(trim(x))"
    + "".join(f" OR contains(lower(trim(x)), '{p}')"
              for p in POLICY_PHRASES)
    + ")")

SQL_LINE_QUALITY = f"""
SELECT doc_id,
       CAST(len(string_split(text, chr(10))) AS INT) AS n_lines,
       CAST(len(list_filter(string_split(text, chr(10)),
                x -> {_KEEP_SQL})) AS INT) AS n_lines_kept,
       (len(string_split(text, chr(10)))
        - len(list_filter(string_split(text, chr(10)), x -> {_KEEP_SQL})))
         * 100 > {DOC_DROP_PCT} * len(string_split(text, chr(10)))
         AS doc_drop,
       md5(CASE WHEN text IS NULL THEN NULL ELSE
           -- coalesce: array_to_string([]) is NULL in DuckDB, '' in Spark
           coalesce(array_to_string(list_filter(string_split(text, chr(10)),
               x -> {_KEEP_SQL}), chr(10)), '') END) AS filtered_md5
FROM documents
"""

REGISTRY = {
    "text_boilerplate_lines": (q_boilerplate_lines, SQL_BOILERPLATE_LINES),
    "text_line_quality": (q_line_quality, SQL_LINE_QUALITY),
}

"""Policy-wordlist document filter — the C4 "blocklist words" stage
(Raffel et al. 2020 removed any page containing a word from a public
profanity blocklist; Dolma/RefinedWeb ship the same stage with their
own lists). The operator is LIST-PARAMETERIZED: the engine ships no
word list of its own — production supplies its policy file
(``tools/curate.py --badwords FILE``), tests and the registry demo use
neutral corpus-derived tokens. Flagging, not judging, is the engine's
job; which list to enforce is a deployment policy.

Semantics (C4's): a document is flagged when ANY list word appears as
a whitespace token of its lowercased text; ``n_bad_words`` counts the
DISTINCT list words present (set-intersection size — order-free, so
Spark's ``array_intersect`` and DuckDB's ``list_intersect`` agree
byte-for-byte without an order pin).

Scale shape: the list is a few hundred words — it rides the plan as an
ARRAY LITERAL (broadcast-by-constant: no join, no shuffle, no Python),
and the whole operator is a zero-exchange scan-speed projection.
``array_intersect`` builds its hash set once per row from the constant;
for the ~200-word C4 list that is microseconds against the parse cost.
Reference tie: the role-dispatch DROP set of ``classify.py`` (SURVEY
P10) applied at the corpus-policy axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .textstats import _docs

# neutral demo list for the registry/test surface (mid-frequency tokens
# of the synthetic corpus — discriminative: some docs match, most don't)
DEMO_WORDS = ["dup", "stream", "skew"]


def _toks(text_col: str):
    low = F.trim(F.lower(F.col(text_col)))
    return (F.when(F.length(low) == 0, F.array().cast("array<string>"))
            .otherwise(F.split(low, r"\s+")))


def badwords_flags(docs: DataFrame, words: list[str],
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Per-document policy verdict: ``(id, n_bad_words, bad_flag)``.
    ``words`` must be lowercase; matching is whole-token on the
    lowercased whitespace tokenization (the C4 rule)."""
    lst = F.array(*[F.lit(w) for w in words])
    n_bad = F.coalesce(F.size(F.array_intersect(_toks(text_col), lst)),
                       F.lit(0))
    return docs.select(
        F.col(id_col),
        n_bad.cast("long").alias("n_bad_words"),
        (n_bad > 0).alias("bad_flag"))


def q_text_badwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the demo-list verdict over ``documents``."""
    return badwords_flags(_docs(spark, sf_dir), DEMO_WORDS)


def _sql(words: list[str]) -> str:
    lst = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(lower(text))) = 0 THEN []
              ELSE string_split_regex(trim(lower(text)), '\\s+')
         END AS toks
  FROM documents
)
SELECT doc_id,
       coalesce(len(list_intersect(toks, [{lst}])), 0)::BIGINT
         AS n_bad_words,
       coalesce(len(list_intersect(toks, [{lst}])), 0) > 0 AS bad_flag
FROM d
"""


SQL_TEXT_BADWORDS = _sql(DEMO_WORDS)


REGISTRY = {
    "text_badwords": (q_text_badwords, SQL_TEXT_BADWORDS),
}

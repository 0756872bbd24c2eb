"""Boilerplate classification rules (pure, shared by oracle and Spark plan).

An Arc90/Readability-style keep/drop decision per block: text density and
link density plus the reference's role-based dispatch, where boilerplate
roles (pageHeader / pageFooter / footnote / formulaBlock) are dropped just
as the reference's renderer drops them
(reference: ocr_module/adapters/infra/pylatex/pylatex_generate_pdf_repository.py:100-112
— P10 in SURVEY.md §2.2).

The constants and the predicate below are THE spec. ``pipeline.classify_nodes``
re-expresses the same predicate as native Spark column expressions (JVM-side,
whole-stage-codegen); tests assert both agree on every fixture block.

Rule (integer arithmetic only, so the SQL re-expression is exact):

* paragraphs: keep iff ``text_len >= MIN_TEXT_LEN`` and ``role`` is not a
  boilerplate role and ``2 * link_text_len <= text_len`` (link density
  ≤ 0.5 without float division);
* tables: keep iff non-empty text;
* figures: always kept (as figure entities; never part of main text).
"""

from __future__ import annotations

from typing import Optional

MIN_TEXT_LEN = 1
DROP_ROLES = frozenset({"pageHeader", "pageFooter", "footnote", "formulaBlock"})
KEEP_ROLES = frozenset({"sectionHeading"})  # kept AND counted into main text


def keep_block(kind: str, role: Optional[str], text_len: int,
               link_text_len: int) -> bool:
    """True iff the block survives boilerplate stripping."""
    if kind == "figure":
        return True
    if kind == "table":
        return text_len > 0
    if role in DROP_ROLES:
        return False
    if text_len < MIN_TEXT_LEN:
        return False
    return 2 * link_text_len <= text_len

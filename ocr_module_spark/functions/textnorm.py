"""Unicode text normalization + mojibake repair (ftfy-lite, CCNet stage).

Real crawls are full of encoding damage the DOM extractor faithfully
preserves: UTF-8 bytes decoded as cp1252/latin-1 upstream ("Ã©" where
"é" was written — and doubly so when the damage loops), NFD combining
sequences from Mac-origin pages, C0/C1 control bytes, BOMs and
zero-width spaces pasted mid-word, and the unicode space zoo (NBSP,
en/em/thin/ideographic spaces) that breaks whitespace tokenization,
line-grain dedup and quality ratios downstream. CCNet/C4-style
pipelines normalize BEFORE quality gating and dedup so that "café" and
"cafe\\u0301" and "cafÃ©" count as the same token stream. Two halves:

* ``normalize_text`` — the deterministic, SQL-expressible canon pass,
  in this exact order (order matters and is pinned by the DuckDB
  oracle, which replays it verbatim):

  1. CRLF → LF, lone CR → LF (two-step: plain ``\\r``→``\\n`` would
     turn CRLF into a double newline);
  2. strip C0 controls except ``\\t``/``\\n`` and ALL of C1+DEL
     (``[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]``);
  3. strip ZWSP (U+200B) and BOM/ZWNBSP (U+FEFF). ZWNJ/ZWJ are
     deliberately KEPT — they are orthographic in Persian/Hindi and
     glue emoji families; stripping them destroys text;
  4. map the unicode space zoo to ASCII space (NBSP U+00A0,
     U+2000–U+200A, U+202F, U+205F, U+3000). Runs are NOT collapsed
     and nothing is trimmed — line structure is data (linededup keys
     on verbatim lines);
  5. NFC-normalize last (after the strips: a zero-width char between
     base and combining mark would otherwise block composition).

  Steps 1–4 are pure codepoint maps; step 5 is Unicode NFC —
  Python ``unicodedata`` (UCD 15) and DuckDB ``nfc_normalize``
  (utf8proc) agree on every assigned codepoint this corpus class can
  contain, which the cross-engine gate pins continuously.

* ``repair_mojibake_str`` — the encoding-repair half, NOT
  SQL-expressible (needs codec round-trips), gated by a pure-Python
  reference twin + hypothesis round-trip fuzz instead (tests/
  test_textnorm.py — the BPE-trainer convention for non-SQL ops).
  Algorithm (ftfy's core loop, minus its language model): while the
  string contains a plausible misdecoded UTF-8 lead byte
  (U+00C2–U+00F4 — the cp1252/latin-1 images of lead bytes
  0xC2–0xF4), re-encode it with "sloppy" cp1252 (ftfy's trick: a raw
  C1 codepoint — cp1252's five holes, or any latin-1-misdecode
  leftover — encodes as its own byte; anything non-latin still fails
  the encode, so real text is never touched) and
  STRICT-decode the bytes as UTF-8; accept only a complete, changed
  round-trip, up to ``_MAX_FIX`` times for multiply-encoded text.
  Strictness is the correctness argument: genuine "déjà vu" text
  re-encodes to bytes that are NOT valid UTF-8 (0xE9 followed by an
  ASCII byte), so it never false-repairs; bytes that DO strict-decode
  are, by construction, exactly the mojibake pattern.

Spark side: ONE ``mapInPandas`` Arrow stage computes repair + all five
canon steps + the per-row counters in the same batch — zero exchanges,
text never shuffles (and the counters live inside the batch because
projections adjacent to a Python runner run interpreted). The Python
here is unavoidable (NFC and codec round-trips have no JVM expression),
which is the documented bar for leaving whole-stage codegen.

Scale notes (100 TB): a per-row map with no state, no joins, no
aggregation — embarrassingly parallel, AQE-irrelevant. In the curation
chain it runs fused into the same stage that already parses HTML, so
it adds zero scans. The stage is opt-in there (``normalize=True``):
the extraction invariant (byte-identical text per url vs the
reference, BASELINE.json) is defined on RAW extracted bytes, so the
default path stays byte-exact and normalization is a curation policy.

Reference tie: the reference hard-codes ``errors="ignore"`` byte
cleanup at its API seam (ocr_module/infrastructure/
azure_ocr_repository.py text handling); this module is the
corpus-side generalization a 10^12-page crawl needs instead.

Gate: ``q_text_normalize``/``SQL_TEXT_NORMALIZE`` (DuckDB parity on
hostile + sf corpora — repair OFF, SQL can't express codecs) plus the
reference-twin/fuzz suite for the repair half.
"""

from __future__ import annotations

import codecs
import re
import unicodedata
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

# -- shared codepoint classes (literal chars so Python re and DuckDB RE2
#    parse the identical set; \x escapes below are processed by PYTHON,
#    the SQL template re-spells them in RE2 syntax) ---------------------
_CTRL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f-\x9f]")
_ZW = "\u200b\ufeff"                # ZWSP + BOM; ZWNJ/ZWJ kept
_SPACES = ("\u00a0"
           + "".join(chr(c) for c in range(0x2000, 0x200B))
           + "\u202f\u205f\u3000")
_ZW_RE = re.compile("[" + _ZW + "]")
_SPACE_RE = re.compile("[" + _SPACES + "]")

# misdecoded UTF-8 lead bytes (0xC2-0xF4) as cp1252/latin-1 chars —
# the cheap pre-filter; correctness comes from the strict round-trip
_MOJIBAKE_MARK = re.compile("[Â-ô]")
_MAX_FIX = 3                               # bounded multi-encoding undo


def _latin_fallback(err: UnicodeError):
    """ftfy's "sloppy windows-1252": a char cp1252 cannot encode but
    whose codepoint IS a byte (the C1 range landing in cp1252's five
    holes, or raw C1 from a latin-1 misdecode) encodes as that byte;
    anything else re-raises — real non-latin text must keep FAILING
    the encode so it can never be "repaired"."""
    chunk = err.object[err.start:err.end]          # type: ignore[attr-defined]
    if all(ord(c) <= 0xFF for c in chunk):
        return bytes(ord(c) for c in chunk), err.end   # type: ignore[attr-defined]
    raise err


codecs.register_error("ocr_module_spark_sloppy1252", _latin_fallback)


def canon_str(s: str | None) -> str | None:
    """Steps 1-5 on one string (the pure-Python oracle twin)."""
    if s is None:
        return None
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL_RE.sub("", s)
    s = _ZW_RE.sub("", s)
    s = _SPACE_RE.sub(" ", s)
    return unicodedata.normalize("NFC", s)


def repair_mojibake_str(s: str | None) -> tuple[str | None, bool]:
    """(repaired text, was_repaired). Strict-round-trip ftfy-lite."""
    if s is None:
        return None, False
    out, fixed = s, False
    for _ in range(_MAX_FIX):
        if not _MOJIBAKE_MARK.search(out):
            break
        try:
            raw = out.encode("cp1252", "ocr_module_spark_sloppy1252")
        except UnicodeEncodeError:
            break
        try:
            dec = raw.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == out:
            break
        out, fixed = dec, True
    return out, fixed


_NORM_SCHEMA = ("doc_id long, norm_text string, n_removed int, "
                "nfc_changed boolean, changed boolean")


def normalized_frame(docs: DataFrame, repair: bool = False,
                     key_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(key, norm_text, n_removed, nfc_changed, changed) — one Arrow
    stage, zero exchanges. ``n_removed`` counts chars deleted by steps
    1-4 (NFC's own length changes are composition, not removal);
    ``nfc_changed``/``changed`` are NULL for NULL text (NULL has no
    normal form). ``repair=True`` prepends mojibake repair — the
    non-SQL half, so the oracled query keeps it off."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            keys, norms, n_rm, nfc_ch, ch = [], [], [], [], []
            for k, s in zip(pdf[key_col], pdf[text_col]):
                keys.append(k)
                if s is None:
                    norms.append(None)
                    n_rm.append(None)
                    nfc_ch.append(None)
                    ch.append(None)
                    continue
                base = repair_mojibake_str(s)[0] if repair else s
                pre = base.replace("\r\n", "\n").replace("\r", "\n")
                pre = _CTRL_RE.sub("", pre)
                pre = _ZW_RE.sub("", pre)
                pre = _SPACE_RE.sub(" ", pre)
                norm = unicodedata.normalize("NFC", pre)
                norms.append(norm)
                n_rm.append(len(base) - len(pre))
                nfc_ch.append(pre != norm)
                ch.append(s != norm)
            yield pd.DataFrame({"doc_id": keys, "norm_text": norms,
                                "n_removed": pd.array(n_rm,
                                                      dtype="Int32"),
                                "nfc_changed": pd.array(
                                    nfc_ch, dtype="boolean"),
                                "changed": pd.array(ch,
                                                    dtype="boolean")})

    return docs.select(key_col, text_col).mapInPandas(
        batches, schema=_NORM_SCHEMA)


def normalize_docs(docs: DataFrame, repair: bool = True,
                   key_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """``docs`` with ``text_col`` replaced by its normal form, plus
    ``norm_changed``/``norm_repaired`` flag columns — the curation-
    chain entry point (curate.py ``normalize=True``). Same single
    Arrow stage; all other columns ride through untouched."""
    fields = [f for f in docs.schema.fields]
    names = [f.name for f in fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in fields]
        + ["norm_changed boolean", "norm_repaired boolean"])

    def batches(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            texts, chs, reps = [], [], []
            for s in pdf[text_col]:
                if s is None:
                    texts.append(None)
                    chs.append(None)
                    reps.append(None)
                    continue
                base, fixed = (repair_mojibake_str(s) if repair
                               else (s, False))
                norm = canon_str(base)
                texts.append(norm)
                chs.append(norm != s)
                reps.append(fixed)
            out = pdf.copy()
            out[text_col] = texts
            out["norm_changed"] = pd.array(chs, dtype="boolean")
            out["norm_repaired"] = pd.array(reps, dtype="boolean")
            yield out

    return docs.select(*names).mapInPandas(batches, schema=out_schema)


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver/hostile-gate query: the canon pass (repair OFF — codec
    round-trips have no SQL form) over the documents table."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return normalized_frame(docs, repair=False)


# RE2 spellings of the same classes: \x{...} for codepoints > ASCII
# (RE2 has no \uXXXX), literal chars interpolated for the space/zw sets
# so both engines compile the identical set. Order replays steps 1-5.
_SQL_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]"
SQL_TEXT_NORMALIZE = f"""
WITH pre AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(
             replace(replace(text, chr(13)||chr(10), chr(10)),
                     chr(13), chr(10)),
             '{_SQL_CTRL}', '', 'g'),
             '[{_ZW}]', '', 'g'),
             '[{_SPACES}]', ' ', 'g') AS pre_text,
         text
  FROM documents
)
SELECT doc_id,
       nfc_normalize(pre_text) AS norm_text,
       CAST(length(text) - length(pre_text) AS INTEGER) AS n_removed,
       pre_text <> nfc_normalize(pre_text) AS nfc_changed,
       text <> nfc_normalize(pre_text) AS changed
FROM pre
"""

REGISTRY = {
    "text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
}

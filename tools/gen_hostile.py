"""Build the hostile parity corpus at ``.localdata/sf0.001``.

The driver's own sf0.01 corpus contains document rows the pinned
``/root/testdata`` corpora do not — NULL text, empty/whitespace-only text,
non-ASCII text — and round 1 shipped two queries whose NULL-group
semantics diverged between Spark and DuckDB *only* on that corpus class
(`agg_content_length`, `agg_mismatch_audit`, VERDICT.md r1). This tool
reproduces the class locally: it copies every sf0.001 table and appends
adversarial rows to ``documents`` (including one (lang, source) group
whose every row has NULL text — the exact all-NULL-group aggregation
case), so ``tools/parity_check.py .localdata/sf0.001`` exercises the same
divergence surface the driver does.

The directory is named ``sf0.001`` so the extraction queries' corpus-size
mapping (operators/extraction._N_BY_SF) and the golden extraction oracles
(keyed by the orders-table row count) stay mutually consistent.

Usage::

    python tools/gen_hostile.py           # writes .localdata/sf0.001
"""

from __future__ import annotations

import pathlib
import shutil
import sys

import duckdb

REPO = pathlib.Path(__file__).resolve().parents[1]
SRC = pathlib.Path("/root/testdata/sf0.001")
DST = REPO / ".localdata" / "sf0.001"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"]

# (text, lang, source, n_chars) — n_chars deliberately wrong for some rows
# (mismatch-audit true branch) and right for others; doc_ids continue the
# existing 0..499 range. lang='xx' / source='srcnull' exists ONLY with NULL
# text => an all-NULL aggregation group on every (lang, source) rollup.
HOSTILE_ROWS = [
    (None, "xx", "srcnull", 17),          # NULL text, bogus n_chars
    (None, "xx", "srcnull", 0),           # NULL text, zero n_chars
    (None, "en", "src0", 42),             # NULL text inside a mixed group
    ("", "en", "src1", 0),                # empty text, consistent n_chars
    ("", "de", "src2", 5),                # empty text, mismatching n_chars
    ("   ", "fr", "src3", 3),             # whitespace-only
    ("\n\t \n", "es", "src4", 4),         # whitespace incl newlines/tabs
    ("日本語のテキスト処理 これは 形態素 解析", "zh", "src5", 21),
    ("naïve café résumé — déjà vu", "fr", "src6", 27),
    ("emoji 🚀 and combining é accents", "en", "src7", 33),
    ("mixed ascii und 中文 zusammen", "de", "src8", 27),
    ("single", "en", "src9", 6),          # one word (< RH_K window)
    ("a b c", "en", "src10", 5),          # 3 words (< RH_K=4 window)
    ("the the the the the", "en", "src11", 19),   # all-stopword doc
    ("x" * 5000, "en", "src12", 5000),    # long single token
    ("tab\tseparated\twords here", "en", "src13", 24),
    # giant many-token doc: spans dozens of packing sequences, trips
    # budget cutoffs mid-doc, stresses repetition/window paths
    (" ".join(f"w{i % 97}t{i % 13}" for i in range(3000)),
     "en", "src14", 0),
    # exactly 64 tokens (SEQ_LEN): the packing boundary where a doc's
    # end lands on a sequence edge — (end-1) div L, not end div L
    (" ".join(f"b{i}" for i in range(64)), "en", "src15", 0),
    # 128 tokens = exactly two full sequences from one doc
    (" ".join(f"c{i}" for i in range(128)), "en", "src16", 0),
    # multi-line docs (r4): the line-grain ops' divergence surface —
    # srcboiler is a NEW 4-doc source sharing a banner line (4/4 ≥ the
    # min_docs=3 / 30% dials, so the boilerplate census FLAGS it), and
    # one doc is ONLY the banner: the all-lines-removed reassembly where
    # DuckDB's array_to_string([]) is NULL but Spark's array_join([]) is
    # '' (the divergence the r4 line-op oracles coalesce)
    ("We use cookies\nUnique seventeen content line stays here fine.",
     "en", "srcboiler", 0),
    ("We use cookies\nAnother unique line with enough words to live.",
     "en", "srcboiler", 0),
    ("We use cookies\nThird unique body line keeps this doc alive.",
     "en", "srcboiler", 0),
    ("We use cookies", "en", "srcboiler", 0),   # all lines removed
    # every line-quality rule in one doc + a survivor line
    ("HOME ABOUT US\n2024 12 31\nSign in now\nGood sentence stays here.",
     "en", "src18", 0),
    # CRLF line endings: '\r' survives the '\n' split AND space-only trim
    # on BOTH engines — pinned so neither side 'helpfully' strips it
    ("line with trailing CR\r\nsecond line\r", "en", "src18", 0),
    ("\nleading and trailing newlines\n", "en", "src19", 0),
    # encoding damage (r4): the textnorm divergence surface — NFD
    # combining sequences, C0/C1 controls, BOM/ZWSP (ZWNJ/ZWJ must
    # SURVIVE), the unicode space zoo, and latin-1/cp1252 mojibake
    # incl. a double-encoded row (repair path; canon oracle ignores it)
    # NFD combining accents
    ('NFD cafe\u0301 et de\u0301ja\u0300 vu',
     'fr', 'src20', 0),
    # C0/C1 controls; tab+newline survive
    ('ctrl\x00ed\x08 text\x1f keeps\ttab\x7fand\x93newline\n',
     'en', 'src20', 0),
    # BOM/ZWSP strip, ZWNJ/ZWJ survive
    ('\ufeffbom lead zw\u200bsplit zwnj\u200cstays zwj\u200dstays',
     'en', 'src20', 0),
    # unicode space zoo
    ('nb\xa0sp en\u2002sp em\u2003sp thin\u2009sp nnbsp\u202fideo\u3000end',
     'en', 'src20', 0),
    # latin-1 mojibake incl. C1 bytes
    ('caf\xc3\xa9 \xe2\x80\x94 na\xc3\xafve \xe2\x80\x9cmojibake\xe2\x80\x9d',
     'en', 'src21', 0),
    # doubly-encoded mojibake
    ('double caf\xc3\x83\xc2\xa9 encoded',
     'en', 'src21', 0),
    # every damage class in one row
    ('CRLF\r\nmix\rwith mojibake \xc3\xa9 and NFD e\u0301 plus\x85C1',
     'en', 'src21', 0),
]


def main() -> int:
    DST.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        shutil.copyfile(SRC / f"{t}.parquet", DST / f"{t}.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs AS SELECT * FROM read_parquet(?)",
        [str(SRC / "documents.parquet")])
    base = con.execute("SELECT max(doc_id) FROM docs").fetchone()[0]
    for k, (text, lang, source, n_chars) in enumerate(HOSTILE_ROWS):
        con.execute("INSERT INTO docs VALUES (?, ?, ?, ?, ?)",
                    [base + 1 + k, text, lang, source, n_chars])
    out = str(DST / "documents.parquet").replace("'", "''")
    con.execute(f"COPY docs TO '{out}' (FORMAT PARQUET)")

    # hostile embeddings: an exact duplicate of vec 0 (cosine-1.0 pair),
    # an all-zero vector (zero norm — division/sign-bucket edge), and a
    # tiny-magnitude vector; dimension stays uniform (64)
    con.execute(
        "CREATE TABLE emb AS SELECT * FROM read_parquet(?)",
        [str(SRC / "embeddings.parquet")])
    ebase = con.execute("SELECT max(vec_id) FROM emb").fetchone()[0]
    con.execute(
        "INSERT INTO emb SELECT ? AS vec_id, embedding, 99 AS label "
        "FROM emb WHERE vec_id = 0", [ebase + 1])
    con.execute(
        "INSERT INTO emb VALUES (?, ?, 99)",
        [ebase + 2, [0.0] * 64])
    con.execute(
        "INSERT INTO emb VALUES (?, ?, 99)",
        [ebase + 3, [1e-6] * 64])
    eout = str(DST / "embeddings.parquet").replace("'", "''")
    con.execute(f"COPY emb TO '{eout}' (FORMAT PARQUET)")

    # hostile events: NULL / malformed / key-missing JSON props, NULL
    # value, NULL user_id, NULL event_type — exercises every events-driven
    # aggregation's NULL-group semantics
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM read_parquet(?)",
        [str(SRC / "events.parquet")])
    vbase = con.execute("SELECT max(event_id) FROM ev").fetchone()[0]
    hostile_events = [
        (None, "click", 12.5, None),              # NULL user + NULL props
        (7, None, None, "not json at all"),       # NULL type, NULL value
        (8, "hostile", 3.25, '{"other": 1}'),     # valid json, key missing
        (8, "hostile", -1.0, '{"k": "notint"}'),  # non-numeric k
        (None, None, None, None),                 # everything NULL
        (9, "hostile", 0.0, '{"k": 42}'),
        # decimal / scientific k: the class where string->INT casts
        # DISAGREE across engines (Spark try_cast NULLs '1.5', DuckDB
        # rounds to 2) — the JSON-pointer queries must cast to DOUBLE
        (9, "hostile", 1.0, '{"k": 1.5}'),
        (9, "hostile", 2.0, '{"k": 1e2}'),
        (8, "hostile", 3.0, '{"k": -0.25}'),
    ]
    for k, (uid, etype, val, props) in enumerate(hostile_events):
        con.execute(
            "INSERT INTO ev VALUES (?, TIMESTAMP '2024-06-01 00:00:00', "
            "?, ?, ?, ?)", [vbase + 1 + k, uid, etype, val, props])
    vout = str(DST / "events.parquet").replace("'", "''")
    con.execute(f"COPY ev TO '{vout}' (FORMAT PARQUET)")
    n = con.execute("SELECT count(*) FROM docs").fetchone()[0]
    print(f"wrote {DST} (documents: {n} rows, "
          f"{len(HOSTILE_ROWS)} hostile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Generate the committed golden-result parquet for the extraction
queries (``golden/*.parquet``).

DuckDB cannot parse HTML, so the extraction queries' driver oracles are
golden results materialized by the PURE-PYTHON oracle (oracle.py +
corpus.rows — no Spark involved): the driver's side-by-side compare then
checks the distributed pipeline (Arrow batching, partitioning,
determinism at any parallelism) against a single-threaded independent
computation of the same spec.

Each parquet carries every supported scale under a ``corpus_tag`` column
= the row count of the sf dir's ``orders`` table (the one table whose
count discriminates all three sfs — documents has 500 rows at BOTH
sf0.001 and sf0.01). The oracle SQL self-selects its slice with
``WHERE corpus_tag = (SELECT count(*) FROM orders)``, so the same static
SQL is correct at sf0.001 / sf0.01 / sf0.1 (and the hostile
``.localdata/sf0.001`` copy). The n_docs per tag mirrors
operators/extraction._N_BY_SF.

Regenerate after ANY parser/classifier/oracle change::

    python tools/gen_golden.py

(tests/test_golden_fresh.py fails if the committed goldens are stale.)
"""

from __future__ import annotations

import hashlib
import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ocr_module_spark import corpus, oracle  # noqa: E402
from ocr_module_spark.classify import keep_block  # noqa: E402
from ocr_module_spark.functions.multimodal import extract_image_region  # noqa: E402

GOLDEN_DIR = REPO / "golden"

# orders-table row count -> extraction corpus size (see _N_BY_SF)
TAG_TO_N = {1500: 200, 15000: 1000, 150000: 16000}


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def compute_rows(n: int):
    """One pass over the n-doc corpus -> per-query golden row lists."""
    text_rows, rel_rows, sec_rows, json_rows = [], [], [], []
    region_rows = []
    node_agg: dict = {}
    for i in range(n):
        url, payload = corpus.url_for(i), corpus.payload_for(i)
        r = oracle.extract_document(url, payload)
        text_rows.append((url, _sha(r["text"]), len(r["text"]),
                          len(r["spans"]), len(r["sections"]),
                          r["n_pages"], r["mismatch_flag"]))
        if i < n // 2:
            rel_rows.append((url, _sha(r["text"]), len(r["text"]),
                             r["mismatch_flag"]))
        for s in r["sections"]:
            sec_rows.append((url, s["section_id"],
                             len(s["paragraph_ids"]), len(s["table_ids"]),
                             len(s["figure_ids"])))
        j = oracle.document_to_json(r)
        json_rows.append((url, _sha(j), len(j)))
        # extract_nodes: ALL parsed blocks (not only kept), grouped by
        # (kind, role, keep) with count + sum(text_len) — the classify
        # predicate is the same shared keep_block the Spark plan compiles
        # to native expressions
        for b in oracle.parse_payload(payload).blocks:
            keep = keep_block(b.kind, b.role, b.text_len, b.link_text_len)
            k = (b.kind, b.role, keep)
            cnt, tot = node_agg.get(k, (0, 0))
            node_agg[k] = (cnt + 1, tot + b.text_len)
            # S5: region extraction for bboxed figure blocks
            if b.kind == "figure" and b.bbox is not None:
                rb = extract_image_region(payload, b.page_number, b.bbox)
                region_rows.append((url, b.page_number, b.block_no,
                                    hashlib.sha256(rb).hexdigest(),
                                    len(rb)))
    node_rows = [(k, role, keep, cnt, tot)
                 for (k, role, keep), (cnt, tot) in sorted(
                     node_agg.items(), key=lambda kv: (
                         kv[0][0], kv[0][1] or "", kv[0][2]))]
    return {
        "extract_text": text_rows,
        "extract_relational": rel_rows,
        "extract_sections": sec_rows,
        "extract_document_json": json_rows,
        "extract_nodes": node_rows,
        "extract_regions": region_rows,
    }


SCHEMAS = {
    "extract_text": pa.schema([
        ("url", pa.string()), ("text_sha256", pa.string()),
        ("text_len", pa.int32()), ("n_spans", pa.int32()),
        ("n_sections", pa.int32()), ("n_pages", pa.int32()),
        ("mismatch_flag", pa.bool_()), ("corpus_tag", pa.int64())]),
    "extract_relational": pa.schema([
        ("url", pa.string()), ("text_sha256", pa.string()),
        ("text_len", pa.int32()), ("mismatch_flag", pa.bool_()),
        ("corpus_tag", pa.int64())]),
    "extract_sections": pa.schema([
        ("url", pa.string()), ("section_id", pa.int32()),
        ("n_paragraphs", pa.int32()), ("n_tables", pa.int32()),
        ("n_figures", pa.int32()), ("corpus_tag", pa.int64())]),
    "extract_document_json": pa.schema([
        ("url", pa.string()), ("json_sha256", pa.string()),
        ("json_len", pa.int32()), ("corpus_tag", pa.int64())]),
    "extract_nodes": pa.schema([
        ("kind", pa.string()), ("role", pa.string()), ("keep", pa.bool_()),
        ("n_blocks", pa.int64()), ("total_text_len", pa.int64()),
        ("corpus_tag", pa.int64())]),
    "extract_regions": pa.schema([
        ("url", pa.string()), ("page_number", pa.int32()),
        ("block_no", pa.int32()), ("region_sha256", pa.string()),
        ("region_len", pa.int32()), ("corpus_tag", pa.int64())]),
}


def main() -> int:
    GOLDEN_DIR.mkdir(exist_ok=True)
    all_rows: dict = {q: [] for q in SCHEMAS}
    for tag, n in sorted(TAG_TO_N.items()):
        per_q = compute_rows(n)
        for q, rows in per_q.items():
            all_rows[q].extend(r + (tag,) for r in rows)
    for q, schema in SCHEMAS.items():
        cols = list(zip(*all_rows[q]))
        table = pa.Table.from_arrays(
            [pa.array(list(c), type=f.type)
             for c, f in zip(cols, schema)], schema=schema)
        pq.write_table(table, GOLDEN_DIR / f"{q}.parquet")
        print(f"golden/{q}.parquet: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Regenerate golden-document fixtures (FIXTURES.md §2-§3).

Writes one canonical payload per shape plus edge-case variants to
tests/fixtures/, together with the oracle's expected extraction result
(`<name>.expected.json`, byte-exact text inside). Run from repo root:

    python tools/gen_fixtures.py

The expected files are committed; tests fail if the oracle's behavior
drifts from them (spec pinning), and the Spark pipeline must reproduce them
byte-for-byte.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ocr_module_spark import corpus, oracle  # noqa: E402

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures"

# name -> corpus row index (shape cycle is SHAPES[i % 8])
CASES = {
    "h1_plain_article": 0,
    "h2_boilerplate": 1,
    "h3_table": 2,
    "h4_placeholders": 3,
    "h5_multisection": 4,
    "h6_cjk_unicode": 5,
    "h7_empty": 6,
    "p1_blocklist": 7,
    "h4_mismatch": 27,      # H4 with a dangling :formula: token (i//8 % 4 == 3)
    "h7_malformed": 14,     # H7 variant 1: unclosed tags
    "h7_images_only": 22,   # H7 variant 2: only <img> blocks
}


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    for name, i in CASES.items():
        row = corpus.row_for(i)
        payload = row["html"]
        ext = ".json" if payload.lstrip().startswith(b'{"format"') else ".html"
        (OUT / f"{name}{ext}").write_bytes(payload)
        res = oracle.extract_document(row["url"], payload)
        (OUT / f"{name}.expected.json").write_text(
            json.dumps(res, ensure_ascii=False, indent=1, sort_keys=True))
        print(f"{name:18s} i={i:3d} spans={len(res['spans']):3d} "
              f"pages={res['n_pages']} mismatch={res['mismatch_flag']}")


if __name__ == "__main__":
    main()

"""Golden-oracle freshness guard: the committed ``golden/*.parquet``
must equal what tools/gen_golden.py would produce from the CURRENT
parser/classifier/oracle code. A parser change without a golden
regeneration would otherwise surface only as a confusing driver hash
mismatch — this fails fast with the query name instead.

(Checks the smallest tag only — 200 docs, sub-second; the other tags are
produced by the same code path in the same run.)
"""

from __future__ import annotations

import pathlib
import sys

import duckdb

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

SMALL_TAG = 1500  # sf0.001's orders count -> n=200


def test_goldens_match_current_oracle():
    import gen_golden as G
    fresh = G.compute_rows(G.TAG_TO_N[SMALL_TAG])
    con = duckdb.connect()
    for q, rows in fresh.items():
        path = G.GOLDEN_DIR / f"{q}.parquet"
        assert path.exists(), f"missing golden for {q} - run tools/gen_golden.py"
        ncols = len(G.SCHEMAS[q].names) - 1  # minus corpus_tag
        got = con.execute(
            f"SELECT * EXCLUDE (corpus_tag) FROM read_parquet(?) "
            f"WHERE corpus_tag = ?", [str(path), SMALL_TAG]).fetchall()
        key = repr  # None-safe total order
        assert sorted(map(tuple, got), key=key) == sorted(
            (tuple(r[:ncols]) for r in rows), key=key), \
            f"stale golden for {q} - run tools/gen_golden.py"

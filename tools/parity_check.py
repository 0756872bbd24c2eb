"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same parquet dir,
compare row count, column names, and an order-insensitive value hash.

    python tools/parity_check.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import hashlib
import pathlib
import sys
import time

import duckdb

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, int):
        return str(v)
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as entry_mod
    from ocr_module_spark.session import get_spark

    spark = get_spark("parity-check", cores=16, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = dict(entry_mod.queries())
    oracles = dict(entry_mod.oracle_sql())
    # oracled operators living OUTSIDE the 50-row driver window (the
    # registry is pinned at 50 so every driver row stays green; these
    # get the identical gate here and in tests/test_hostile_parity.py)
    from ocr_module_spark.functions import (badwords, datacard, dsir,
                                            embed, hostrep, langid,
                                            linededup, linkgraph, mixture,
                                            model_score, multimodal,
                                            ngramlm, packing, snapshots,
                                            splits, textnorm, textstats,
                                            urls)
    for mod in (packing, urls, model_score, langid, hostrep, snapshots,
                splits, mixture, linededup, linkgraph, textnorm, ngramlm,
                embed, dsir, datacard, badwords,
                # round-5 rotation: mm_frame_sample /
                # text_rolling_fingerprint left the driver window; their
                # module REGISTRYs keep the entries, setdefault restores
                # the identical gate here
                multimodal, textstats):
        for name, (fn, sql) in mod.REGISTRY.items():
            qs.setdefault(name, fn)
            if sql is not None:
                oracles.setdefault(name, sql)
    qs.setdefault("curate_pack_materialize", packing.q_pack_materialize)
    oracles.setdefault("curate_pack_materialize",
                       packing.SQL_PACK_MATERIALIZE)
    # rotated out of the driver window in round 4 (slot taken by
    # text_dsir_select); identical value gate here + hostile parity
    from ocr_module_spark.functions import dedup
    qs.setdefault("dedup_jaccard_pairs", dedup.q_dedup_jaccard_pairs)
    oracles.setdefault("dedup_jaccard_pairs", dedup.SQL_DEDUP_JACCARD_PAIRS)
    # rotated out of the driver window in round 4 (slots taken by
    # curate_pack_sequences / fn_url_canonicalize)
    from ocr_module_spark.operators import relational
    for name, fn, sql in (
            ("proj_bbox_reduction_units", relational.q_bbox_reduction_units,
             relational.SQL_BBOX_REDUCTION_UNITS),
            ("fn_token_split_count", relational.q_token_split_count,
             relational.SQL_TOKEN_SPLIT_COUNT),
            # rotated out in round 5 (slots taken by the r4 flagships);
            # identical value gate here + hostile parity, and the first
            # two are column-folded into agg_usage_stats /
            # agg_mismatch_audit on the same scans
            ("agg_content_length", relational.q_content_length,
             relational.SQL_CONTENT_LENGTH),
            ("json_pointer_extract", relational.q_json_pointer_extract,
             relational.SQL_JSON_POINTER_EXTRACT),
            ("join_positional_zip", relational.q_positional_zip_join,
             relational.SQL_POSITIONAL_ZIP_JOIN)):
        qs.setdefault(name, fn)
        oracles.setdefault(name, sql)
    failures = []
    for name, fn in sorted(qs.items()):
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows={len(s_rows):7d} (rows-only) "
                  f"spark={t_spark:5.1f}s")
            if not s_rows and not name.startswith("dedup_lsh"):
                failures.append((name, "empty result"))
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        d_cols = res.columns
        d_rows = res.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(s_cols) == sorted(d_cols)
        ok_rows = len(s_rows) == len(d_rows)
        hs = value_hash(s_rows, s_cols)
        hd = value_hash(d_rows, d_cols)
        ok_hash = hs == hd
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(f"  {name:32s} rows={len(s_rows):7d}/{len(d_rows):7d} "
              f"cols={'=' if ok_cols else '≠'} hash={'=' if ok_hash else '≠'} "
              f"spark={t_spark:5.1f}s duck={t_duck:4.1f}s  {status}")
        if status == "FAIL":
            failures.append((name, f"cols={ok_cols} rows={ok_rows} hash={ok_hash}"))
            if not ok_cols:
                print(f"    spark cols: {s_cols}\n    duck  cols: {d_cols}")
            elif s_rows and d_rows:
                key = lambda r: tuple(_norm_cell(v) for v in r)  # noqa: E731
                ss = sorted(s_rows, key=key)[:2]
                dd = sorted(d_rows, key=key)[:2]
                print(f"    spark sample: {ss}\n    duck  sample: {dd}")
    spark.stop()
    if failures:
        print("\nFAILURES:", failures)
        return 1
    print("\nall parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())

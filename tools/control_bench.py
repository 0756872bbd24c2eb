"""No-framework scaling control (north_rule evidence, BENCH.md §2/§-1).

Runs the IDENTICAL per-document extraction (``pipeline._extract_one`` —
the exact function the Spark pipeline's Arrow stage calls per row,
fast-tokenizer path included) over the IDENTICAL synthetic corpus
(ocr_module_spark.corpus.row_for) with plain ``multiprocessing.Pool`` —
no Spark, no Arrow, no JVM. Whatever N→4N efficiency THIS program
measures is the hardware's answer for any framework on this
single-socket VM: the work is embarrassingly parallel, the only shared
resource is the memory subsystem. Matching the production per-doc
function matters: a faster parser touches more bytes per second per
core, so its bandwidth ceiling is LOWER than a slow twin's — a control
run on the slower oracle path overstates the achievable efficiency
(the round-3 control did exactly that; pass ``oracle`` to reproduce it).

Usage::

    python tools/control_bench.py [n_docs] [workers ...] [oracle]
    # default: 200000 docs, levels 8 32, production parse fn

Prints one JSON line with per-level wall/rate/per-worker-rate and the
pairwise efficiencies of consecutive levels.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

def _gen(n_docs: int) -> list[tuple[str, bytes]]:
    """Deterministic corpus (corpus.row_for), pickle-cached in tmpfs so
    repeated matched-window invocations skip the ~single-core-minute of
    generation (the cache load is a ~1s tmpfs read). The cache key
    includes a fingerprint of corpus.py — a generator change must
    invalidate the cache, or the control would silently parse
    yesterday's corpus while Spark parses today's (breaking the
    'IDENTICAL corpus' premise the ratio rests on)."""
    import hashlib
    import pickle
    src = (REPO / "ocr_module_spark" / "corpus.py").read_bytes()
    tag = hashlib.md5(src).hexdigest()[:8]
    cache = pathlib.Path(f"/dev/shm/ocr_control_docs_{n_docs}_{tag}.pkl")
    if cache.is_file():
        with cache.open("rb") as fh:
            return pickle.load(fh)
    from ocr_module_spark.corpus import row_for
    out = []
    for i in range(n_docs):
        r = row_for(i)
        out.append((r["url"], r["html"]))
    try:
        with cache.open("wb") as fh:
            pickle.dump(out, fh, protocol=5)
    except OSError:
        pass
    return out


USE_ORACLE = False


def _work(chunk: list[tuple[str, bytes]]) -> int:
    if USE_ORACLE:
        from ocr_module_spark.oracle import extract_document as one
    else:
        from ocr_module_spark.pipeline import _extract_one as one
    n = 0
    for url, payload in chunk:
        one(url, payload)
        n += 1
    return n


def _run_level(docs: list[tuple[str, bytes]], workers: int,
               reps: int = 3) -> dict:
    chunks = [docs[i::workers * 4] for i in range(workers * 4)]
    best = float("inf")
    with mp.get_context("fork").Pool(workers) as pool:
        pool.map(_work, chunks[:workers])          # warm-up (imports)
        for _ in range(reps):
            t0 = time.time()
            done = sum(pool.map(_work, chunks))
            best = min(best, time.time() - t0)
            assert done == len(docs)
    rate = len(docs) / best
    return {"workers": workers, "wall_sec": round(best, 3),
            "docs_per_sec": round(rate, 1),
            "per_worker_docs_per_sec": round(rate / workers, 1)}


def main() -> int:
    global USE_ORACLE
    argv = list(sys.argv[1:])
    if argv and argv[-1] == "oracle":
        USE_ORACLE = True
        argv.pop()
    n_docs = int(argv[0]) if argv else 200000
    levels = [int(a) for a in argv[1:]] or [8, 32]
    print(f"generating {n_docs} docs (single process)...", flush=True)
    docs = _gen(n_docs)
    out = {"metric": "control_no_framework", "n_docs": n_docs,
           "per_doc_fn": "oracle.extract_document" if USE_ORACLE
                         else "pipeline._extract_one",
           "load_1m_start": os.getloadavg()[0], "levels": []}
    for w in levels:
        res = _run_level(docs, w)
        out["levels"].append(res)
        print(res, flush=True)
    effs = {}
    for lo in out["levels"]:
        for hi in out["levels"]:
            if hi["workers"] == 4 * lo["workers"]:
                effs[f"{lo['workers']}_to_{hi['workers']}"] = round(
                    (hi["docs_per_sec"] / lo["docs_per_sec"]) / 4, 3)
    out["efficiencies"] = effs
    out["load_1m_end"] = os.getloadavg()[0]
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())

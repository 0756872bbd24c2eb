"""Executor-side packaging (the ``spark-submit --py-files`` contract).

UDF closures reference this package by module name; Python workers on
executors must therefore be able to import ``ocr_module_spark``. On a real
cluster the job ships a zip via ``spark-submit --py-files`` (north_rule);
for sessions created without it (driver harnesses, notebooks),
``ensure_pyfiles`` builds the same zip on the fly and registers it with
``SparkContext.addPyFile`` — idempotent per session (a sentinel attr on
the SparkContext guards repeat calls).
"""

from __future__ import annotations

import os
import pathlib
import tempfile
import zipfile

_SENTINEL_ATTR = "_ocr_module_spark_pyfiles"


def build_zip(dest: str | None = None) -> str:
    """Zip the package source tree (stable order, no timestamps in names)."""
    pkg_dir = pathlib.Path(__file__).resolve().parent
    if dest is None:
        dest = os.path.join(tempfile.gettempdir(),
                            f"ocr_module_spark-{os.getuid()}.zip")
    tmp = f"{dest}.{os.getpid()}.tmp"  # per-process tmp: concurrent
    # drivers each build their own then atomically publish via replace
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in sorted(pkg_dir.rglob("*.py")):
            zf.write(path, arcname=str(
                pathlib.Path("ocr_module_spark") / path.relative_to(pkg_dir)))
    os.replace(tmp, dest)
    return dest


def ensure_pyfiles(spark) -> None:
    """Make the package importable on executor Python workers."""
    sc = spark.sparkContext
    if getattr(sc, _SENTINEL_ATTR, False):
        return
    sc.addPyFile(build_zip())
    setattr(sc, _SENTINEL_ATTR, True)

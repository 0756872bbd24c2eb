from __future__ import annotations

from . import extraction, relational


def registry():
    out = {}
    out.update(relational.REGISTRY)
    out.update(extraction.REGISTRY)
    return out

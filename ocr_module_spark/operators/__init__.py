from __future__ import annotations

from . import enrichment, extraction, relational


def registry():
    out = {}
    out.update(relational.REGISTRY)
    out.update(enrichment.REGISTRY)
    out.update(extraction.REGISTRY)
    return out

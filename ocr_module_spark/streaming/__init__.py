"""Structured Streaming extension (SURVEY.md §2.8).

The reference is strictly batch; continuous ingestion is the natural Spark
extension noted there: ``readStream`` over the landing directory feeding
the SAME transform stack via ``foreachBatch``, with checkpoint-tracked
exactly-once file progress.
"""

from .incremental import (  # noqa: F401
    run_incremental_dedup,
    run_incremental_extraction,
    stream_crawl_metrics,
    stream_decon_flags,
    stream_dedup_first_seen,
    stream_pages,
)

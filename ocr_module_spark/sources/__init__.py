"""Container-format sources feeding the canonical ``pages`` table.

The reference ingests documents as path -> bytes -> analyze
(adapters/infra/azure/azure_client.py:52-62); at Common-Crawl scale the
bytes live inside WARC containers, so the graft's source layer is a WARC
reader whose output is exactly the BASELINE.json ``input_hint`` shape.
"""

from .warc import (  # noqa: F401
    build_cdx,
    build_warc_gz,
    iter_warc_stream,
    parse_warc_stream,
    read_warc,
    read_warc_offsets,
    read_wet,
    split_gzip_members,
    warc_pages,
    write_wet,
)

"""Structured Streaming incremental ingest & index refresh."""

from .ingest import (  # noqa: F401
    incremental_counts,
    run_incremental_refresh,
    stream_ndjson_raw,
    streaming_dedup,
)
from .stateful import streaming_sessionize  # noqa: F401
from .delta_sink import write_stream_to_delta  # noqa: F401
from .index_refresh import postings_stream, refresh_postings, bm25_from_postings  # noqa: F401

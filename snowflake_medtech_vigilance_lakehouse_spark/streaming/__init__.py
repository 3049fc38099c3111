"""Structured Streaming incremental ingest & index refresh."""

from .ingest import stream_ndjson_raw, incremental_counts, run_incremental_refresh  # noqa: F401
from .stateful import streaming_sessionize  # noqa: F401
from .index_refresh import postings_stream, refresh_postings, bm25_from_postings  # noqa: F401

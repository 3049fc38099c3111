"""Structured Streaming incremental ingest & index refresh."""

from .ingest import (  # noqa: F401
    incremental_counts,
    run_incremental_refresh,
    stream_ndjson_raw,
    streaming_dedup,
)
from .stateful import streaming_sessionize  # noqa: F401
from .delta_sink import write_stream_to_delta  # noqa: F401
from .index_refresh import (  # noqa: F401
    assign_ivf_lists,
    bm25_from_postings,
    compact_index_ticks,
    corpus_stats_from_sidecar,
    maintain_ivf_index,
    postings_stream,
    prune_term_buckets,
    refresh_ivf_index,
    refresh_postings,
    with_term_buckets,
)

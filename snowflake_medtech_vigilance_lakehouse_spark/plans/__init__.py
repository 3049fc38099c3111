"""Model DAG (medallion layers) and the analytics query library."""

from .medallion import (  # noqa: F401
    stg_maude,
    fact_adverse_events,
    ae_counts_q,
    v_ae_early_signals,
)

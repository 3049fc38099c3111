"""Custom stateful streaming operator: gap-based session tracking via
``applyInPandasWithState`` (the SURVEY.md custom-operator tier (b):
Pandas-UDF-backed state machine when built-ins can't express the
semantics — Spark's built-in ``session_window`` can't carry session
counters across restarts the way this state does).

Each key's state is (last event epoch, sessions seen so far); every
micro-batch emits one summary row per active key. The state store is
checkpointed, so an availableNow run picks up exactly where the last
one stopped — sessions continue across scheduled refreshes (the
target_lag cadence) instead of resetting.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StructField, StructType,
)

SESSION_OUTPUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_sessions", LongType()),     # sessions seen so far (total)
    StructField("n_events_batch", LongType()),  # events in this batch
])

SESSION_STATE = StructType([
    StructField("last_ts_us", LongType()),
    StructField("n_sessions", LongType()),
])


def streaming_sessionize(events: DataFrame, *, key: str = "user_id",
                         ts: str = "ts",
                         gap_minutes: int = 30) -> DataFrame:
    """events (streaming DF with key + timestamp) -> per-key session
    summaries, state persisted across micro-batches and restarts."""
    gap_us = gap_minutes * 60 * 1_000_000

    def track(key_tuple: Any, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key_tuple
        last_ts_us, n_sessions = state.get if state.exists else (None, 0)
        # a key's batch arrives as MULTIPLE Arrow chunks with no global
        # order — concat and sort once, or timestamps regress across
        # chunk boundaries and re-trigger the gap test
        chunks = [pdf[ts] for pdf in pdfs]
        stamps = pd.concat(chunks).sort_values() if chunks else pd.Series([], dtype="datetime64[ns]")
        n_events = 0
        for t in stamps:
            t_us = int(t.value // 1_000)  # pandas ns -> us
            if last_ts_us is None or t_us - last_ts_us > gap_us:
                n_sessions += 1
            last_ts_us = t_us
            n_events += 1
        state.update((last_ts_us, n_sessions))
        yield pd.DataFrame({
            "user_id": [user_id],
            "n_sessions": [n_sessions],
            "n_events_batch": [n_events],
        })

    return (
        events.groupBy(key)
        .applyInPandasWithState(
            track,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            # append: each emitted per-batch summary row is final, so
            # file sinks (append-only) can consume the stream directly
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

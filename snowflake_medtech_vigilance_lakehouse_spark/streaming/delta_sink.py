"""Structured Streaming -> Delta publication with exactly-once
contents.

``foreachBatch`` + a checkpoint gives AT-LEAST-ONCE batch delivery: a
crash between the sink write and the checkpoint commit re-delivers the
same (batch_id, rows) on restart. The Delta protocol's transaction
identifier (``txn`` action, delta_lite.write_delta(txn=...)) closes
the gap: every micro-batch commit is stamped (app_id, batch_id), and a
re-delivered batch whose id is already in the log is a no-op — so the
TABLE is exactly-once even though the stream is not. This is the same
mechanism the real delta-spark sink uses.

At 100 TB this is the continuous half of the medallion build: the raw
stream appends micro-batches to the bronze Delta table, scheduled
``availableNow`` runs advance the checkpoint (target_lag analog), and
downstream marts rebuild incrementally via
``plans.runbook.incremental_publish``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources.delta_lite import write_delta


def write_stream_to_delta(stream: DataFrame, path: str, checkpoint: str, *,
                          app_id: str,
                          partition_by: list[str] | None = None) -> StreamingQuery:
    """Append a stream to a delta_lite table, one idempotent commit
    per micro-batch, processing everything pending and stopping
    (availableNow). A crash between the table write and the
    checkpoint commit re-delivers the same (batch_id, rows) on
    restart; the ``txn`` stamp makes that re-delivery a no-op.

    ``app_id`` is the identity of THIS checkpoint lineage — batch ids
    are only meaningful within one checkpoint, so if the checkpoint is
    lost/deleted, restart with a NEW app_id (the ids restart at 0 with
    different contents; reusing the old app_id would silently skip
    them). The real delta-spark sink scopes its txn appId the same
    way."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        write_delta(batch_df, path, mode="append",
                    partition_by=partition_by, txn=(app_id, batch_id))

    return (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )

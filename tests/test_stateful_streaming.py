"""Stateful streaming sessionizer: session counters must survive
across availableNow runs via the checkpointed state store."""

from __future__ import annotations

import json

from snowflake_medtech_vigilance_lakehouse_spark.streaming import streaming_sessionize


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, in_dir, out_dir, ckpt):
    ev = spark.readStream.schema("user_id long, ts timestamp").json(str(in_dir))
    sess = streaming_sessionize(ev, gap_minutes=30)
    q = (
        sess.writeStream.format("parquet")
        .option("path", out_dir).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)


def test_sessions_continue_across_runs(spark, tmp_path):
    in_dir = tmp_path / "in"; in_dir.mkdir()
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # run 1: two sessions for user 7 (65-minute gap between pairs)
    _write(in_dir / "a.ndjson", [
        {"user_id": 7, "ts": "2024-01-01T10:00:00"},
        {"user_id": 7, "ts": "2024-01-01T10:10:00"},
        {"user_id": 7, "ts": "2024-01-01T11:15:00"},
    ])
    _run(spark, in_dir, out_dir, ckpt)
    first = {r["user_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert first[7]["n_sessions"] == 2 and first[7]["n_events_batch"] == 3

    # run 2: one event 10 min after the last -> SAME session (state
    # carried over), one event 2 hours later -> new session
    _write(in_dir / "b.ndjson", [
        {"user_id": 7, "ts": "2024-01-01T11:25:00"},
        {"user_id": 7, "ts": "2024-01-01T13:30:00"},
    ])
    _run(spark, in_dir, out_dir, ckpt)
    rows = [r for r in spark.read.parquet(out_dir).collect() if r["n_events_batch"] == 2]
    assert len(rows) == 1
    assert rows[0]["n_sessions"] == 3  # 2 carried + 1 new, NOT 4


def test_multi_chunk_batch_sorts_globally(spark, tmp_path):
    """A key's batch arrives as multiple Arrow chunks with no global
    order; chunk-local sorting would re-trigger the gap test on every
    backwards chunk boundary and inflate n_sessions."""
    in_dir = tmp_path / "in"; in_dir.mkdir()
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    # two true sessions (10:00-10:19 and 12:00-12:19), events
    # INTERLEAVED so every chunk mixes both: chunk-local sorting makes
    # the tail of each chunk jump ahead 2h, the head of the next chunk
    # jump back, and the next in-chunk sort re-crosses the 2h gap —
    # counting a fresh session per chunk instead of 2 total
    rows = []
    for m in range(20):
        rows.append({"user_id": 9, "ts": f"2024-01-01T12:{m:02d}:00"})
        rows.append({"user_id": 9, "ts": f"2024-01-01T10:{m:02d}:00"})
    _write(in_dir / "a.ndjson", rows)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        _run(spark, in_dir, out_dir, ckpt)
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    out = {r["user_id"]: r for r in spark.read.parquet(out_dir).collect()}
    assert out[9]["n_events_batch"] == 40
    assert out[9]["n_sessions"] == 2

"""Incremental BM25 index refresh: postings grow append-only across
refresh ticks, and scoring from the postings table matches the
batch bm25 operator on the same corpus."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators.text import bm25_scores
from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
    bm25_from_postings, refresh_postings,
)

DOCS_A = [(1, "spark join table"), (2, "spark spark stream")]
DOCS_B = [(3, "join stream merge spark")]


def _write(path, rows):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def test_incremental_index_matches_batch_bm25(spark, tmp_path):
    in_dir = tmp_path / "docs"; in_dir.mkdir()
    idx, ckpt = str(tmp_path / "postings"), str(tmp_path / "ckpt")

    def refresh():
        stream = spark.readStream.schema("doc_id long, text string").json(str(in_dir))
        refresh_postings(stream, idx, ckpt).awaitTermination(120)

    _write(in_dir / "a.ndjson", DOCS_A)
    refresh()
    first = spark.read.parquet(idx)
    assert set(r["doc_id"] for r in first.select("doc_id").distinct().collect()) == {1, 2}

    # tick 2: only the new doc's postings are appended
    _write(in_dir / "b.ndjson", DOCS_B)
    refresh()
    postings = spark.read.parquet(idx)
    assert postings.filter(F.col("doc_id") == 3).count() == 4  # 4 distinct terms
    assert postings.count() == first.count() + 4

    # scoring from the incrementally-built index == batch operator on
    # the full corpus
    from_index = {r["doc_id"]: r["bm25"]
                  for r in bm25_from_postings(postings, ("spark", "merge")).collect()}
    corpus = spark.createDataFrame(DOCS_A + DOCS_B, "doc_id long, text string")
    batch = {r["doc_id"]: r["bm25"]
             for r in bm25_scores(corpus, ("spark", "merge")).collect()}
    assert from_index == batch

"""Round-13 optimization internals: the driver-direct sidecar writer
(`sources.writers.write_local_sidecar`) and the shared MinHash
exploded base (`operators.dedup.minhash_store_frames(base=)`).

Both replaced hot-path formulations (a per-commit
createDataFrame+coalesce(1) sidecar rewrite; a second shingle+md5
derivation per curation commit) — these tests pin that the
replacements produce byte-identical layouts/frames."""
from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.operators.dedup import (
    minhash_exploded_base, minhash_store_frames)
from snowflake_medtech_vigilance_lakehouse_spark.sources.writers import (
    write_local_sidecar)


def test_local_sidecar_matches_spark_writer_layout(spark, tmp_path):
    """pyarrow-written sidecar reads back with the same schema and
    rows as the Spark writer it replaced (int -> int32 nullable,
    double -> float64 nullable)."""
    rows = [(0, 0.25), (1, None), (2, 3.5)]
    a, b = str(tmp_path / "pa"), str(tmp_path / "spark")
    write_local_sidecar(spark, rows,
                        [("list_id", "int"), ("rad", "double")], a)
    (spark.createDataFrame(rows, "list_id int, rad double")
     .coalesce(1).write.mode("overwrite").parquet(b))
    da, db = spark.read.parquet(a), spark.read.parquet(b)
    assert [(f.name, f.dataType.simpleString()) for f in da.schema] == \
        [(f.name, f.dataType.simpleString()) for f in db.schema]
    assert sorted(map(tuple, da.collect())) == \
        sorted(map(tuple, db.collect()))


def test_local_sidecar_array_and_overwrite(spark, tmp_path):
    """array<double> columns (the centroid sidecar shape) round-trip,
    and a second write OVERWRITES — no stale files survive."""
    p = str(tmp_path / "ctr")
    write_local_sidecar(spark, [(0, [1.0, 2.0]), (1, [0.5, -0.5])],
                        [("list_id", "int"), ("_ctr", "array<double>")], p)
    first = {r["list_id"]: r["_ctr"] for r in spark.read.parquet(p).collect()}
    assert first == {0: [1.0, 2.0], 1: [0.5, -0.5]}
    write_local_sidecar(spark, [(7, [9.0])],
                        [("list_id", "int"), ("_ctr", "array<double>")], p)
    out = spark.read.parquet(p).collect()
    assert len(out) == 1 and out[0]["list_id"] == 7
    # exactly one data file — the single-file layout serving expects
    files = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert len(files) == 1


def test_local_sidecar_spark_fallback_without_pyarrow(spark, tmp_path,
                                                      monkeypatch):
    """With pyarrow unimportable the writer falls back to the 1-slice
    Spark write (round-13 VERDICT robustness note: the fallback caught
    only OSError, so a missing pyarrow raised instead of falling
    through) — same rows, same overwrite semantics."""
    import builtins

    real_import = builtins.__import__

    def no_pyarrow(name, *a, **k):
        if name.startswith("pyarrow"):
            raise ImportError(f"{name} blocked for the fallback test")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_pyarrow)
    p = str(tmp_path / "fallback")
    write_local_sidecar(spark, [(0, 0.25), (1, None)],
                        [("list_id", "int"), ("rad", "double")], p)
    monkeypatch.undo()
    out = {r["list_id"]: r["rad"] for r in spark.read.parquet(p).collect()}
    assert out == {0: 0.25, 1: None}


def test_local_sidecar_empty_rows(spark, tmp_path):
    p = str(tmp_path / "empty")
    write_local_sidecar(spark, [],
                        [("list_id", "int"), ("rad", "double")], p)
    df = spark.read.parquet(p)
    assert df.count() == 0
    assert [f.name for f in df.schema] == ["list_id", "rad"]


@pytest.mark.parametrize("bands,num_hashes", [(32, 64), (16, 64)])
def test_store_frames_from_base_identical(spark, sf_dir, bands, num_hashes):
    """frames(base=materialized exploded base) == frames derived from
    the docs directly — the equivalence the curation loop's
    single-derivation optimization rests on; also pins the kept-subset
    filter path (filtering by id commutes with the aggregations)."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text").limit(40))
    direct_b, direct_h = minhash_store_frames(
        docs, num_hashes=num_hashes, bands=bands)
    base = minhash_exploded_base(docs).localCheckpoint(eager=True)
    via_b, via_h = minhash_store_frames(
        docs, num_hashes=num_hashes, bands=bands, base=base)
    assert sorted(map(tuple, direct_b.collect())) == \
        sorted(map(tuple, via_b.collect()))
    assert sorted((r["_id"], tuple(sorted(r["_h"])))
                  for r in direct_h.collect()) == \
        sorted((r["_id"], tuple(sorted(r["_h"])))
               for r in via_h.collect())
    # kept-subset path: filter the base by id == frames of the subset
    keep = docs.filter(F.col("doc_id") % 2 == 0)
    sub_b, sub_h = minhash_store_frames(
        keep, num_hashes=num_hashes, bands=bands)
    fb = base.join(
        F.broadcast(keep.select(F.col("doc_id").alias("_id"))), "_id")
    via_sb, via_sh = minhash_store_frames(
        keep, num_hashes=num_hashes, bands=bands, base=fb)
    assert sorted(map(tuple, sub_b.collect())) == \
        sorted(map(tuple, via_sb.collect()))
    assert sorted((r["_id"], tuple(sorted(r["_h"])))
                  for r in sub_h.collect()) == \
        sorted((r["_id"], tuple(sorted(r["_h"])))
               for r in via_sh.collect())

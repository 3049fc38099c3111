"""Dual-format (UniForm-analog) publication: one parquet copy, both a
Delta log and an Iceberg metadata tree; read_delta and read_iceberg
must return identical frames over the identical file set."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl
from snowflake_medtech_vigilance_lakehouse_spark.sources import iceberg_lite as il
from snowflake_medtech_vigilance_lakehouse_spark.sources.uniform import (
    publish_uniform, uniform_file_sets)


def _orders(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/orders.parquet")
            .withColumn("yyyy", F.year("o_orderdate")))


def _frames_identical(a, b, key):
    assert a.schema == b.schema
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # order-insensitive value hash, the CORRECTNESS-gate style check
    cols = sorted(a.columns)
    ha = a.select(*cols).orderBy(*key).collect()
    hb = b.select(*cols).orderBy(*key).collect()
    assert ha == hb


def test_uniform_one_copy_two_planes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "uni")
    o = _orders(spark, sf_dir).limit(300)
    v, sid = publish_uniform(o, path, partition_by=["yyyy"])

    d = dl.read_delta(spark, path)
    i = il.read_iceberg(spark, path)
    _frames_identical(d.select(*sorted(d.columns)),
                      i.select(*sorted(i.columns)), ["o_orderkey"])

    # literally one copy: both planes reference the same rel paths,
    # and there is no second data directory
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files and d_files
    assert not os.path.isdir(os.path.join(path, "data"))
    # both metadata planes present
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    assert os.path.isdir(os.path.join(path, "metadata"))
    assert il.table_metadata(path)["current-snapshot-id"] == sid
    assert dl._list_versions(path)[-1] == v


def test_uniform_append_advances_both_planes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "uni_app")
    o = _orders(spark, sf_dir).limit(120).select(
        "o_orderkey", "o_totalprice", "yyyy")
    publish_uniform(o, path, partition_by=["yyyy"])
    publish_uniform(o, path, mode="append", partition_by=["yyyy"])

    d = dl.read_delta(spark, path)
    i = il.read_iceberg(spark, path)
    assert d.count() == i.count() == 240
    assert (d.agg(F.sum("o_orderkey")).first()[0]
            == i.agg(F.sum("o_orderkey")).first()[0])
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files

    # each plane kept its own history: delta time travel to v0 and
    # iceberg time travel to the first snapshot see the same 120 rows
    assert dl.read_delta(spark, path, version=0).count() == 120
    first_sid = il.table_metadata(path)["snapshots"][0]["snapshot-id"]
    assert il.read_iceberg(spark, path, snapshot_id=first_sid).count() == 120


def test_uniform_overwrite_replaces_both_planes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "uni_ow")
    o = _orders(spark, sf_dir).limit(200)
    publish_uniform(o, path, partition_by=["yyyy"])
    sub = o.filter(F.col("yyyy") == 1995)
    publish_uniform(sub, path, partition_by=["yyyy"])

    n = sub.count()
    assert dl.read_delta(spark, path).count() == n
    assert il.read_iceberg(spark, path).count() == n
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files

    # pruning works on both planes over the shared files
    pruned_i = il.read_iceberg(spark, path, partition_filter={"yyyy": "1995"})
    pruned_d = dl.read_delta(spark, path, predicates=[("yyyy", "==", 1995)])
    assert pruned_i.count() == pruned_d.count() == n


def test_uniform_rejects_bad_mode(spark, sf_dir, tmp_path):
    with pytest.raises(ValueError, match="unsupported mode"):
        publish_uniform(_orders(spark, sf_dir).limit(5),
                        str(tmp_path / "x"), mode="merge")


def test_uniform_refusal_leaves_both_planes_untouched(spark, sf_dir, tmp_path):
    """A publish the Iceberg plane would refuse (schema drift,
    partition-spec change) must fail BEFORE the Delta plane commits —
    a half-committed publish would permanently diverge the planes the
    uniform invariant promises equal."""
    path = str(tmp_path / "uni_refuse")
    o = _orders(spark, sf_dir).limit(40)
    publish_uniform(o, path, partition_by=["yyyy"])
    v0 = dl._list_versions(path)[-1]
    s0 = il.table_metadata(path)["current-snapshot-id"]
    d0, i0 = uniform_file_sets(path)
    assert d0 == i0

    with pytest.raises(ValueError, match="partition_by"):
        publish_uniform(o, path, mode="append", partition_by=[])
    with pytest.raises(ValueError, match="schema mismatch"):
        publish_uniform(o.drop("yyyy"), path, mode="append",
                        partition_by=["yyyy"])

    # neither plane moved, file sets still equal
    assert dl._list_versions(path)[-1] == v0
    assert il.table_metadata(path)["current-snapshot-id"] == s0
    assert uniform_file_sets(path) == (d0, i0)


def test_uniform_merge_mirrors_into_iceberg(spark, sf_dir, tmp_path):
    """Delta-plane maintenance on a uniform table must reach Iceberg
    readers: MERGE rewrites data files in the Delta plane, and without
    the mirror the Iceberg CURRENT snapshot would list removed files —
    wrong data (or missing-file errors) for every Iceberg reader."""
    path = str(tmp_path / "uni_merge")
    o = _orders(spark, sf_dir).limit(100).select(
        "o_orderkey", "o_totalprice", "yyyy")
    publish_uniform(o, path, partition_by=["yyyy"])

    src = o.limit(10).withColumn("o_totalprice", F.lit(0.0))
    dl.merge_delta(spark, path, src, on=["o_orderkey"],
                   when_matched="update", when_not_matched=None)

    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files and d_files
    d = dl.read_delta(spark, path)
    i = il.read_iceberg(spark, path)
    _frames_identical(d.select(*sorted(d.columns)),
                      i.select(*sorted(i.columns)), ["o_orderkey"])
    assert i.filter(F.col("o_totalprice") == 0.0).count() == 10


def test_uniform_compact_and_restore_mirror(spark, sf_dir, tmp_path):
    path = str(tmp_path / "uni_maint")
    o = _orders(spark, sf_dir).limit(60).select(
        "o_orderkey", "o_totalprice", "yyyy")
    publish_uniform(o.repartition(6), path)
    publish_uniform(o.limit(20), path, mode="append")

    dl.compact_delta(spark, path, target_file_bytes=1 << 30)
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files
    assert il.read_iceberg(spark, path).count() == 80

    dl.restore_delta(path, 0)
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files
    assert il.read_iceberg(spark, path).count() == 60


def test_uniform_direct_write_delta_mirrors(spark, sf_dir, tmp_path):
    """A direct write_delta on a uniform table path (not via
    publish_uniform) must keep the planes equal too — a documented
    trap is still a trap."""
    path = str(tmp_path / "uni_direct")
    o = _orders(spark, sf_dir).limit(50).select("o_orderkey", "yyyy")
    publish_uniform(o, path)
    s0 = il.table_metadata(path)["current-snapshot-id"]

    dl.write_delta(o.limit(5), path, mode="append")
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files
    assert il.read_iceberg(spark, path).count() == 55
    assert il.table_metadata(path)["current-snapshot-id"] != s0

    # the plane's validations still gate a drifted direct write BEFORE
    # the Delta commit (nothing diverges even transiently)
    with pytest.raises(ValueError):
        dl.write_delta(
            o.withColumn("extra", F.lit(1)), path, mode="append",
            merge_schema=True)
    assert uniform_file_sets(path) == (d_files, i_files)


def test_uniform_vacuum_protects_iceberg_snapshots(spark, sf_dir, tmp_path):
    """vacuum_delta must never physically delete a file any RETAINED
    Iceberg snapshot references, whatever its Delta tombstone age;
    after expire_snapshots shrinks the Iceberg horizon the same
    vacuum may reclaim it."""
    path = str(tmp_path / "uni_vac")
    o = _orders(spark, sf_dir).limit(40).select("o_orderkey", "yyyy")
    publish_uniform(o, path)
    first_files = set(dl._live_files(path, 0))
    publish_uniform(o.limit(10), path)  # overwrite: v0 files tombstoned

    # tombstones are old enough to reclaim by Delta's clock alone
    future = int(__import__("time").time() * 1000) + 10 * 24 * 3600 * 1000
    deleted = dl.vacuum_delta(path, retention_ms=0, now_ms=future)
    assert not set(deleted) & first_files
    for rel in first_files:
        assert os.path.exists(os.path.join(path, rel))
    # the overwritten snapshot is still readable through Iceberg
    first_sid = il.table_metadata(path)["snapshots"][0]["snapshot-id"]
    assert il.read_iceberg(spark, path, snapshot_id=first_sid).count() == 40

    il.expire_snapshots(path, retain_last=1)
    deleted = dl.vacuum_delta(path, retention_ms=0, now_ms=future)
    assert first_files <= set(deleted)


def test_uniform_random_op_sequences_keep_planes_equal(spark, sf_dir, tmp_path):
    """Property tier for the maintenance mirror: a seeded random
    sequence of publish/append/merge/compact/restore/direct-append
    ops on a uniform table must leave the planes file-set-equal and
    content-identical after EVERY step — the invariant no single-op
    test can exhaust."""
    import random

    base = (_orders(spark, sf_dir).limit(80)
            .select("o_orderkey", "o_totalprice", "yyyy"))
    rng = random.Random(20260814)

    for trial in range(2):
        path = str(tmp_path / f"uni_fuzz{trial}")
        publish_uniform(base, path)
        delta_versions = [0]
        for step in range(7):
            op = rng.choice(["append", "merge_update", "merge_delete",
                             "compact", "restore", "direct_append"])
            n = rng.randrange(5, 25)
            seed_rows = base.orderBy(F.rand(rng.randrange(1 << 16))).limit(n)
            if op == "append":
                v, _ = publish_uniform(seed_rows, path, mode="append")
            elif op == "merge_update":
                src = seed_rows.withColumn(
                    "o_totalprice", F.col("o_totalprice") * 2).dropDuplicates(
                    ["o_orderkey"])
                v = dl.merge_delta(spark, path, src, on=["o_orderkey"],
                                   when_matched="update")
            elif op == "merge_delete":
                src = seed_rows.dropDuplicates(["o_orderkey"])
                v = dl.merge_delta(spark, path, src, on=["o_orderkey"],
                                   when_matched="delete",
                                   when_not_matched=None)
            elif op == "compact":
                v = dl.compact_delta(spark, path, target_file_bytes=1 << 30)
            elif op == "restore":
                v = dl.restore_delta(path, rng.choice(delta_versions))
            else:
                v = dl.write_delta(seed_rows, path, mode="append")
            delta_versions.append(v)

            d_files, i_files = uniform_file_sets(path)
            assert d_files == i_files, (trial, step, op)
            d = dl.read_delta(spark, path)
            i = il.read_iceberg(spark, path)
            assert d.count() == i.count(), (trial, step, op)
            assert d.exceptAll(i).count() == 0, (trial, step, op)
            assert i.exceptAll(d).count() == 0, (trial, step, op)


def test_uniform_streaming_sink_mirrors_each_batch(spark, sf_dir, tmp_path):
    """The exactly-once streaming sink targets write_delta, so a
    uniform table fed by a stream must mirror EVERY micro-batch into
    the Iceberg plane (as fast-appends — pure-add commits)."""
    import json as _json

    from snowflake_medtech_vigilance_lakehouse_spark.streaming import (
        write_stream_to_delta)

    path = str(tmp_path / "uni_stream")
    o = _orders(spark, sf_dir).limit(30).select("o_orderkey", "yyyy")
    publish_uniform(o, path)

    in_dir = tmp_path / "in"; in_dir.mkdir()
    o.limit(10).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "yyyy"
    ).write.mode("overwrite").parquet(str(in_dir))
    stream = spark.readStream.schema("o_orderkey long, yyyy int")\
        .parquet(str(in_dir))
    write_stream_to_delta(
        stream, path, checkpoint=str(tmp_path / "ck"),
        app_id="uni_stream_test").awaitTermination(120)

    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files
    assert il.read_iceberg(spark, path).count() == 40
    # the mirrored commit is a fast-append (operation 'append'), not a
    # full overwrite resync
    last = il.table_metadata(path)["snapshots"][-1]
    assert last["summary"]["operation"] == "append"


def test_uniform_mirror_idempotent_and_self_healing(spark, sf_dir, tmp_path):
    """The fast-append mirror must keep the old overwrite-mirror's two
    safety properties: re-invoking at an already-mirrored head is a
    no-op (never a double-append), and a MISSED mirror (crash between
    a Delta commit and its mirror, or a txn-deduped replay that skips
    it) heals on the next mirror call instead of diverging forever."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources.uniform import (
        mirror_delta_head_into_iceberg)

    path = str(tmp_path / "uni_heal")
    o = _orders(spark, sf_dir).limit(40).select("o_orderkey", "yyyy")
    publish_uniform(o, path)

    v, _ = publish_uniform(o.limit(10), path, mode="append")
    sid = il.table_metadata(path)["current-snapshot-id"]
    # idempotent: mirroring an already-mirrored append head is a no-op
    assert mirror_delta_head_into_iceberg(path) == sid
    assert il.table_metadata(path)["current-snapshot-id"] == sid
    assert il.read_iceberg(spark, path).count() == 50

    # mirror GAP: a Delta append whose mirror never ran...
    dl.write_delta(o.limit(5), path, mode="append", mirror_iceberg=False)
    d_files, i_files = uniform_file_sets(path)
    assert d_files != i_files  # diverged (the simulated crash window)
    # ...heals on the NEXT mirrored commit (fast-append precondition
    # fails -> full resync), with no file double-counted
    dl.write_delta(o.limit(3), path, mode="append")
    d_files, i_files = uniform_file_sets(path)
    assert d_files == i_files
    assert il.read_iceberg(spark, path).count() == 58
    assert dl.read_delta(spark, path).count() == 58

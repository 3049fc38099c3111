"""iceberg_lite (S7 tail): table-spec v2 metadata tree — snapshots,
Avro manifests, field-id schemas, put-if-absent commits, metadata
pruning. Manifests/manifest lists are real Avro object-container
files (see test_avro_lite.py for the independent-decoder bit-level
round-trip); everything asserted here is spec structure."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import delta_lite as dl
from snowflake_medtech_vigilance_lakehouse_spark.sources import iceberg_lite as il


def _orders(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("yyyy", F.year("o_orderdate"))
    )


def test_iceberg_roundtrip_and_append(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice")
    o = _orders(spark, sf_dir).limit(200)
    s1 = il.write_iceberg(o, path)
    assert il.read_iceberg(spark, path).count() == 200

    s2 = il.write_iceberg(o, path, mode="append")
    assert s2 != s1
    back = il.read_iceberg(spark, path)
    assert back.count() == 400
    # values, not just counts
    src_sum = o.agg(F.sum("o_orderkey")).first()[0]
    assert back.agg(F.sum("o_orderkey")).first()[0] == 2 * src_sum


def test_iceberg_overwrite_and_time_travel(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_tt")
    o = _orders(spark, sf_dir).limit(300)
    s1 = il.write_iceberg(o, path)
    sub = o.filter(F.col("yyyy") == 1995)
    s2 = il.write_iceberg(sub, path, mode="overwrite")

    assert il.read_iceberg(spark, path).count() == sub.count()
    # old snapshot still readable: overwrite unreferences, never deletes
    assert il.read_iceberg(spark, path, snapshot_id=s1).count() == 300
    meta = il.table_metadata(path)
    assert meta["current-snapshot-id"] == s2
    snap_ids = [s["snapshot-id"] for s in meta["snapshots"]]
    assert snap_ids == [s1, s2]
    # lineage recorded per spec
    s2_entry = meta["snapshots"][1]
    assert s2_entry["parent-snapshot-id"] == s1
    assert s2_entry["summary"]["operation"] == "overwrite"

    with pytest.raises(ValueError, match="not in table"):
        il.read_iceberg(spark, path, snapshot_id=999)


def test_iceberg_schema_field_ids_unique_and_nested(spark):
    df_schema = (
        spark.createDataFrame(
            [(1, "a", [1.0], {"k": 2}, (3, "z"))],
            "id long, s string, arr array<double>, m map<string,long>, "
            "st struct<x:long,y:string>",
        ).schema.json()
    )
    schema, last_col = il.iceberg_schema(df_schema)

    ids: list[int] = []

    def walk(t):
        if isinstance(t, str):
            return
        if t["type"] == "struct":
            for f in t["fields"]:
                ids.append(f["id"])
                walk(f["type"])
        elif t["type"] == "list":
            ids.append(t["element-id"])
            walk(t["element"])
        elif t["type"] == "map":
            ids.append(t["key-id"])
            ids.append(t["value-id"])
            walk(t["key"])
            walk(t["value"])

    walk(schema)
    assert len(ids) == len(set(ids)), "field ids must be unique"
    assert max(ids) == last_col
    # spot the spec type mapping
    by_name = {f["name"]: f for f in schema["fields"]}
    assert by_name["id"]["type"] == "long"
    assert by_name["arr"]["type"]["type"] == "list"
    assert by_name["m"]["type"]["type"] == "map"
    assert by_name["st"]["type"]["fields"][0]["type"] == "long"


def test_iceberg_metadata_structure_and_counts(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_meta")
    o = _orders(spark, sf_dir).limit(150)
    sid = il.write_iceberg(o, path, partition_by=["yyyy"])
    meta = il.table_metadata(path)
    assert meta["format-version"] == 2
    assert meta["partition-specs"][0]["fields"][0]["transform"] == "identity"
    # partition source-id must reference the schema field id
    yyyy_id = next(f["id"] for f in meta["schemas"][0]["fields"]
                   if f["name"] == "yyyy")
    assert meta["partition-specs"][0]["fields"][0]["source-id"] == yyyy_id
    assert meta["partition-specs"][0]["fields"][0]["field-id"] == 1000

    snap = meta["snapshots"][-1]
    assert snap["manifest-list"].endswith(".avro")
    manifests = il._read_manifest_list(path, snap["manifest-list"])
    added_rows = sum(m["added_rows_count"] for m in manifests)
    assert added_rows == 150  # parquet-footer record counts, not guesses
    # every manifest entry carries the hive partition tuple
    assert manifests[0]["manifest_path"].endswith(".avro")
    entries = il._read_manifest(path, manifests[0]["manifest_path"])
    assert all("yyyy" in e["data_file"]["partition"] for e in entries)
    assert all(e["sequence_number"] == snap["sequence-number"] for e in entries)


def test_iceberg_append_carries_manifests_forward(spark, sf_dir, tmp_path):
    """Fast append per the spec: the new manifest list references the
    prior manifests verbatim plus exactly one new manifest — commit
    work is O(new files), independent of table history."""
    path = str(tmp_path / "ice_fast")
    o = _orders(spark, sf_dir).limit(50)
    il.write_iceberg(o, path)
    il.write_iceberg(o, path, mode="append")
    il.write_iceberg(o, path, mode="append")
    meta = il.table_metadata(path)
    lists = []
    for s in meta["snapshots"]:
        lists.append(il._read_manifest_list(path, s["manifest-list"]))
    assert [len(m) for m in lists] == [1, 2, 3]
    # earlier entries are byte-identical carried-forward references
    assert lists[2][:2] == lists[1]


def test_iceberg_concurrent_writer_loses(spark, sf_dir, tmp_path, monkeypatch):
    path = str(tmp_path / "ice_race")
    o = _orders(spark, sf_dir).limit(50)
    il.write_iceberg(o, path)
    # winner publishes v2...
    winner = os.path.join(path, "metadata", "v2.metadata.json")
    with open(winner, "w") as f:
        json.dump({"winner": True}, f)
    before = open(winner).read()
    # ...loser listed versions before the winner's commit appeared
    monkeypatch.setattr(il, "_list_meta_versions", lambda p: [1])
    with pytest.raises(il.IcebergCommitError, match="another writer"):
        il.write_iceberg(o, path, mode="append")
    assert open(winner).read() == before
    assert not [f for f in os.listdir(os.path.join(path, "metadata"))
                if f.endswith(".tmp")]


def test_iceberg_partition_pruning_metadata_and_plan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_prune")
    o = _orders(spark, sf_dir)
    il.write_iceberg(o, path, partition_by=["yyyy"])

    # metadata-level pruning: the file list handed to Spark shrinks
    meta = il.table_metadata(path)
    all_files = il._snapshot_files(path, meta, meta["current-snapshot-id"])
    pruned_files = il._snapshot_files(
        path, meta, meta["current-snapshot-id"], {"yyyy": "1995"}
    )
    assert 0 < len(pruned_files) < len(all_files)

    want = o.filter(F.col("yyyy") == 1995).count()
    got = il.read_iceberg(spark, path, partition_filter={"yyyy": "1995"})
    assert got.count() == want

    # and the plain read still prunes in-plan through basePath
    pruned = il.read_iceberg(spark, path).filter(F.col("yyyy") == 1995)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.index("PartitionFilters"):].split("]")[0]
    assert "1995" in pf
    assert pruned.count() == want


def test_iceberg_schema_and_spec_guards(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_guard")
    o = _orders(spark, sf_dir).limit(20)
    il.write_iceberg(o, path, partition_by=["yyyy"])
    with pytest.raises(ValueError, match="schema mismatch"):
        il.write_iceberg(o.drop("yyyy"), path, mode="append")
    with pytest.raises(ValueError, match="partition_by"):
        il.write_iceberg(o, path, mode="append", partition_by=[])


def test_iceberg_empty_snapshot_keeps_schema(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_empty")
    o = _orders(spark, sf_dir).limit(20).select("o_orderkey", "o_totalprice")
    il.write_iceberg(o, path)
    il.write_iceberg(o.filter(F.lit(False)), path, mode="overwrite")
    back = il.read_iceberg(spark, path)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["o_orderkey", "o_totalprice"]
    assert dict((f.name, f.dataType.simpleString()) for f in back.schema.fields) \
        == {"o_orderkey": "bigint", "o_totalprice": "double"}


def test_iceberg_readable_by_independent_engine(spark, sf_dir, tmp_path):
    """Cross-engine read WITHOUT read_iceberg: an independent walk of
    the metadata tree (test-local code, spec field names only) +
    DuckDB scanning the referenced parquet must reproduce the source —
    the offline stand-in for a real Iceberg-reader interop check."""
    import duckdb

    path = str(tmp_path / "ice_interop")
    o = _orders(spark, sf_dir).select("o_orderkey", "o_totalprice", "yyyy")
    il.write_iceberg(o, path, partition_by=["yyyy"])
    il.write_iceberg(o.filter(F.col("yyyy") == 1995), path,
                     mode="overwrite", partition_by=["yyyy"])

    meta_dir = os.path.join(path, "metadata")
    latest = max(
        int(f[1:-len(".metadata.json")])
        for f in os.listdir(meta_dir)
        if f.startswith("v") and f.endswith(".metadata.json")
    )
    with open(os.path.join(meta_dir, f"v{latest}.metadata.json")) as f:
        meta = json.load(f)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    manifests = il._read_manifest_list(path, cur["manifest-list"])
    files = []
    for m in manifests:
        for e in il._read_manifest(path, m["manifest_path"]):
            if e["status"] != 2:
                files.append(os.path.join(path, e["data_file"]["file_path"]))
    assert files

    con = duckdb.connect()
    got = con.execute(
        "SELECT count(*), sum(o_orderkey), round(sum(o_totalprice), 2) "
        "FROM read_parquet(?, hive_partitioning=true)", [sorted(files)]
    ).fetchone()
    src = o.filter(F.col("yyyy") == 1995).agg(
        F.count(F.lit(1)), F.sum("o_orderkey"), F.round(F.sum("o_totalprice"), 2)
    ).first()
    assert (got[0], got[1], float(got[2])) == (src[0], src[1], float(src[2]))


def test_compact_iceberg_replace_snapshot(spark, sf_dir, tmp_path):
    """rewrite_data_files: appends fragment the table; compaction
    commits a REPLACE snapshot with fewer files and identical rows,
    and the pre-compaction snapshot stays time-travelable."""
    path = str(tmp_path / "ice_compact")
    o = _orders(spark, sf_dir).limit(200)
    il.write_iceberg(o.repartition(4), path, partition_by=["yyyy"])
    pre = il.write_iceberg(o.repartition(4), path, mode="append",
                           partition_by=["yyyy"])
    meta = il.table_metadata(path)
    n_before = len(il._snapshot_files(path, meta, pre))

    sid = il.compact_iceberg(spark, path, target_file_bytes=1 << 30)
    meta2 = il.table_metadata(path)
    assert meta2["current-snapshot-id"] == sid
    files_after = il._snapshot_files(path, meta2, sid)
    assert len(files_after) < n_before
    assert not (set(files_after) & set(il._snapshot_files(path, meta2, pre)))

    snap = next(s for s in meta2["snapshots"] if s["snapshot-id"] == sid)
    assert snap["summary"]["operation"] == "replace"

    assert il.read_iceberg(spark, path).count() == 400
    assert il.read_iceberg(spark, path, snapshot_id=pre).count() == 400


def test_expire_snapshots_deletes_only_unreachable(spark, sf_dir, tmp_path):
    path = str(tmp_path / "ice_expire")
    o = _orders(spark, sf_dir).limit(150)
    il.write_iceberg(o.repartition(3), path)
    old = il.table_metadata(path)["current-snapshot-id"]
    il.compact_iceberg(spark, path, target_file_bytes=1 << 30)

    # retaining everything is a no-op (no commit, no deletes)
    assert il.expire_snapshots(path, retain_last=10) == []

    deleted = il.expire_snapshots(path, retain_last=1)
    assert deleted  # old snapshot's data files + manifests + list
    meta = il.table_metadata(path)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [meta["current-snapshot-id"]]
    # head still reads; expired snapshot is gone from the metadata
    assert il.read_iceberg(spark, path).count() == 150
    with pytest.raises(ValueError):
        il.read_iceberg(spark, path, snapshot_id=old)
    # nothing reachable from the head was removed
    live = set(il._snapshot_files(path, meta, meta["current-snapshot-id"]))
    assert not (set(deleted) & live)
    assert live <= il._data_files(path)


def test_iceberg_rejected_write_orphans_no_files(spark, sf_dir, tmp_path):
    """A write the commit would refuse must fail with NOTHING written:
    data files written first and refused later would be unreferenced
    by any snapshot and unreclaimable by expire_snapshots."""
    path = str(tmp_path / "ice_orphan")
    o = _orders(spark, sf_dir).limit(20)
    il.write_iceberg(o, path, partition_by=["yyyy"])
    before = il._data_files(path)
    with pytest.raises(ValueError, match="schema mismatch"):
        il.write_iceberg(o.drop("yyyy"), path, mode="append",
                         partition_by=["yyyy"])
    with pytest.raises(ValueError, match="partition_by"):
        il.write_iceberg(o, path, mode="append", partition_by=[])
    assert il._data_files(path) == before


def test_manifests_carry_column_stats_and_pruning_is_lossless(
        spark, sf_dir, tmp_path):
    """data_file's optional stats fields (value_counts 108,
    null_value_counts 110, lower_bounds 125, upper_bounds 128) must be
    REAL: bounds in the spec's single-value binary serialization keyed
    by field id, and read_iceberg(predicates=...) must skip files from
    them losslessly — the Iceberg-plane twin of
    test_add_actions_carry_stats_and_pruning_is_lossless."""
    path = str(tmp_path / "ice_stats")
    o = _orders(spark, sf_dir).orderBy("o_orderkey").repartitionByRange(
        4, "o_orderkey")
    il.write_iceberg(o.sortWithinPartitions("o_orderkey"), path)

    meta = il.table_metadata(path)
    fields = {f["name"]: (f["id"], f["type"])
              for f in meta["schemas"][0]["fields"]}
    snap = meta["snapshots"][-1]
    entries = []
    for m in il._read_manifest_list(path, snap["manifest-list"]):
        entries.extend(il._read_manifest(path, m["manifest_path"]))
    assert len(entries) >= 4
    okey_id, okey_t = fields["o_orderkey"]
    lows, highs = [], []
    for e in entries:
        dfd = e["data_file"]
        vc = {x["key"]: x["value"] for x in dfd["value_counts"]}
        assert vc[okey_id] == dfd["record_count"]
        nc = {x["key"]: x["value"] for x in dfd["null_value_counts"]}
        assert nc.get(okey_id) == 0
        lb = {x["key"]: x["value"] for x in dfd["lower_bounds"]}
        ub = {x["key"]: x["value"] for x in dfd["upper_bounds"]}
        assert isinstance(lb[okey_id], bytes)
        lo = il._decode_bound(okey_t, lb[okey_id])
        hi = il._decode_bound(okey_t, ub[okey_id])
        assert lo <= hi
        lows.append(lo)
        highs.append(hi)
        # string + date bounds decode to their native domains too
        d_id, d_t = fields["o_orderdate"]
        pr_id, pr_t = fields["o_orderpriority"]
        import datetime
        assert isinstance(
            il._decode_bound(d_t, {x["key"]: x["value"]
                                   for x in dfd["lower_bounds"]}[d_id]),
            datetime.date)
        assert isinstance(
            il._decode_bound(pr_t, {x["key"]: x["value"]
                                    for x in dfd["lower_bounds"]}[pr_id]),
            str)
    # range layout: file bounds are disjoint-ish, so a point predicate
    # proves most files empty
    probe = min(lows) + 1
    preds = [("o_orderkey", "<=", probe)]
    full = il.read_iceberg(spark, path).filter(F.col("o_orderkey") <= probe)
    pruned = il.read_iceberg(spark, path, predicates=preds)
    assert pruned.count() == full.count() > 0
    assert len(pruned.inputFiles()) < len(entries)

    # conservative rules: type mismatch and unknown column never prune
    e0 = entries[0]["data_file"]
    assert il._bounds_can_skip(e0, okey_id, okey_t, ">=", "zzz") is False
    assert il._bounds_can_skip(e0, 99999, "int", "==", 1) is False
    with pytest.raises(ValueError, match="unsupported predicate op"):
        il.read_iceberg(spark, path, predicates=[("o_orderkey", "!=", 1)])


def test_uniform_tables_get_iceberg_stats_too(spark, sf_dir, tmp_path):
    """The uniform publication path commits through commit_data_files,
    so the Iceberg plane over Delta-owned files must carry the same
    prunable bounds."""
    from snowflake_medtech_vigilance_lakehouse_spark.sources.uniform import (
        publish_uniform)

    path = str(tmp_path / "uni_stats")
    o = _orders(spark, sf_dir).orderBy("o_orderkey").repartitionByRange(
        4, "o_orderkey").sortWithinPartitions("o_orderkey")
    publish_uniform(o, path)
    probe = il.read_iceberg(spark, path).agg(
        F.min("o_orderkey")).first()[0] + 1
    pruned = il.read_iceberg(
        spark, path, predicates=[("o_orderkey", "<=", probe)])
    full = il.read_iceberg(spark, path).filter(F.col("o_orderkey") <= probe)
    assert pruned.count() == full.count() > 0
    assert len(pruned.inputFiles()) < 4


def test_timestamp_as_of_travel(spark, sf_dir, tmp_path):
    """TIMESTAMP AS OF via the snapshot-log: the instant resolves to
    the LAST snapshot committed at or before it; pre-history instants
    error loudly; snapshot_id and timestamp are mutually exclusive."""
    import pytest as _pt

    path = str(tmp_path / "tt")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(60)
    il.write_iceberg(o.limit(40), path)
    il.write_iceberg(o.limit(60), path, mode="append")
    log = il.table_metadata(path)["snapshot-log"]
    t0, t1 = log[0]["timestamp-ms"], log[1]["timestamp-ms"]

    assert il.read_iceberg(spark, path,
                           as_of_timestamp_ms=t0).count() == 40
    assert il.read_iceberg(spark, path,
                           as_of_timestamp_ms=t1 + 10_000).count() == 100
    with _pt.raises(ValueError, match="at or before"):
        il.read_iceberg(spark, path, as_of_timestamp_ms=t0 - 1)
    with _pt.raises(ValueError, match="not both"):
        il.read_iceberg(spark, path, snapshot_id=1,
                        as_of_timestamp_ms=t0)

"""avro_lite: the from-scratch Avro binary encoder behind Iceberg
manifests. The decoder here (`_ind_*`) is an INDEPENDENT test-local
implementation of the public Avro 1.11 spec — it shares no code with
avro_lite, so an encoder bug mirrored by the production decoder cannot
hide: files must decode identically through both."""

from __future__ import annotations

import json
import os
import struct

import pytest
from pyspark.sql import functions as F

from snowflake_medtech_vigilance_lakehouse_spark.sources import avro_lite as av
from snowflake_medtech_vigilance_lakehouse_spark.sources import iceberg_lite as il


# ---------------------------------------------------- independent decoder

def _ind_varint(buf, pos):
    """(value, new_pos) — base-128 varint, then zig-zag undo."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if (byte & 0x80) == 0:
            break
        shift += 7
    return (result >> 1) ^ -(result & 1), pos


def _ind_decode(schema, buf, pos):
    """(value, new_pos) for one datum of ``schema`` at ``pos``."""
    if isinstance(schema, list):  # union
        idx, pos = _ind_varint(buf, pos)
        return _ind_decode(schema[idx], buf, pos)
    name = schema if isinstance(schema, str) else schema["type"]
    if name == "null":
        return None, pos
    if name == "boolean":
        return buf[pos] != 0, pos + 1
    if name in ("int", "long"):
        return _ind_varint(buf, pos)
    if name == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if name == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if name in ("bytes", "string"):
        ln, pos = _ind_varint(buf, pos)
        raw = bytes(buf[pos:pos + ln])
        return (raw.decode("utf-8") if name == "string" else raw), pos + ln
    if name == "fixed":
        return bytes(buf[pos:pos + schema["size"]]), pos + schema["size"]
    if name == "enum":
        i, pos = _ind_varint(buf, pos)
        return schema["symbols"][i], pos
    if name == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _ind_decode(f["type"], buf, pos)
        return rec, pos
    if name == "array":
        out = []
        while True:
            n, pos = _ind_varint(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _ind_varint(buf, pos)  # skip block byte size
            for _ in range(n):
                item, pos = _ind_decode(schema["items"], buf, pos)
                out.append(item)
    if name == "map":
        out = {}
        while True:
            n, pos = _ind_varint(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _ind_varint(buf, pos)
            for _ in range(n):
                k, pos = _ind_decode("string", buf, pos)
                out[k], pos = _ind_decode(schema["values"], buf, pos)
    raise AssertionError(f"independent decoder: unknown type {name!r}")


def _ind_read_container(path):
    """Independent object-container reader: (schema, records, meta)."""
    buf = open(path, "rb").read()
    assert buf[:4] == b"Obj\x01", "bad magic"
    pos = 4
    meta = {}
    while True:
        n, pos = _ind_varint(buf, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = _ind_varint(buf, pos)
        for _ in range(n):
            kl, pos = _ind_varint(buf, pos)
            k = buf[pos:pos + kl].decode("utf-8")
            pos += kl
            vl, pos = _ind_varint(buf, pos)
            meta[k] = bytes(buf[pos:pos + vl])
            pos += vl
    assert meta["avro.codec"] == b"null"
    schema = json.loads(meta["avro.schema"])
    sync = buf[pos:pos + 16]
    pos += 16
    records = []
    while pos < len(buf):
        count, pos = _ind_varint(buf, pos)
        _size, pos = _ind_varint(buf, pos)
        for _ in range(count):
            rec, pos = _ind_decode(schema, buf, pos)
            records.append(rec)
        assert buf[pos:pos + 16] == sync, "sync marker mismatch"
        pos += 16
    return schema, records, meta


# ------------------------------------------------------------- fixtures

_KITCHEN_SINK_SCHEMA = {
    "type": "record", "name": "sink",
    "fields": [
        {"name": "b", "type": "boolean"},
        {"name": "i", "type": "int"},
        {"name": "l", "type": "long"},
        {"name": "f", "type": "float"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "by", "type": "bytes"},
        {"name": "opt", "type": ["null", "long"], "default": None},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "nested", "type": {
            "type": "record", "name": "inner",
            "fields": [{"name": "x", "type": "string"},
                       {"name": "y", "type": ["null", "double"],
                        "default": None}]}},
    ],
}

_KITCHEN_SINK_ROWS = [
    {"b": True, "i": 0, "l": 0, "f": 1.5, "d": -2.25, "s": "", "by": b"",
     "opt": None, "arr": [], "m": {},
     "nested": {"x": "a", "y": None}},
    {"b": False, "i": -1, "l": (1 << 62) - 1, "f": -0.5, "d": 1e300,
     "s": "héllo ☃ 世界", "by": b"\x00\xff\x7f",
     "opt": -(1 << 62), "arr": [1, -2, 3, 64, -65, 1 << 40],
     "m": {"k1": "v1", "κλειδί": "τιμή"},
     "nested": {"x": "züricher straße", "y": 3.14159}},
    {"b": True, "i": 2147483647, "l": -9007199254740993, "f": 0.0,
     "d": -0.0, "s": "json\"quote\\slash", "by": bytes(range(16)),
     "opt": 42, "arr": [0], "m": {"": ""},
     "nested": {"x": "", "y": -1e-300}},
]


def test_container_roundtrip_through_independent_decoder(tmp_path):
    """encode -> independent decoder == original records, and the
    production decoder agrees bit-for-bit with the independent one."""
    p = str(tmp_path / "sink.avro")
    av.write_object_container(p, _KITCHEN_SINK_SCHEMA, _KITCHEN_SINK_ROWS,
                              metadata={"custom-key": "custom-val"})

    schema_i, recs_i, meta_i = _ind_read_container(p)
    schema_p, recs_p, meta_p = av.read_object_container(p)

    assert schema_i == _KITCHEN_SINK_SCHEMA == schema_p
    assert meta_i["custom-key"] == b"custom-val"

    def norm(rows):
        # float32 round-trips through struct.pack lose python-double
        # precision identically in both decoders; compare via repacking
        out = []
        for r in rows:
            r = dict(r)
            r["f"] = struct.unpack("<f", struct.pack("<f", r["f"]))[0]
            out.append(r)
        return out

    assert recs_i == recs_p == norm(_KITCHEN_SINK_ROWS)


def test_encode_decode_value_edge_longs(tmp_path):
    """Zig-zag varints across the full int64 range, including the
    wraparound extremes."""
    schema = {"type": "record", "name": "n",
              "fields": [{"name": "v", "type": "long"}]}
    vals = [0, 1, -1, 63, 64, -64, -65, 2**31 - 1, -(2**31),
            2**63 - 1, -(2**63)]
    p = str(tmp_path / "longs.avro")
    av.write_object_container(p, schema, [{"v": v} for v in vals])
    _, recs, _ = _ind_read_container(p)
    assert [r["v"] for r in recs] == vals


def test_iceberg_manifests_are_real_avro(spark, sf_dir, tmp_path):
    """A written iceberg table's manifest list and manifest decode
    through the INDEPENDENT Avro reader, carry the spec's field-ids
    and file-metadata keys, and reference the actual data files."""
    path = str(tmp_path / "ice_avro")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")).limit(120))
    sid = il.write_iceberg(o, path, partition_by=["yyyy"])
    meta = il.table_metadata(path)
    snap = meta["snapshots"][-1]

    # manifest list: independent decode
    ml_schema, manifests, ml_meta = _ind_read_container(
        os.path.join(path, snap["manifest-list"]))
    assert ml_schema["name"] == "manifest_file"
    ids = {f["name"]: f["field-id"] for f in ml_schema["fields"]}
    assert ids["manifest_path"] == 500 and ids["added_snapshot_id"] == 503
    assert ml_meta["format-version"] == b"2"
    assert ml_meta["snapshot-id"] == str(sid).encode()
    assert sum(m["added_rows_count"] for m in manifests) == 120

    # manifest: independent decode
    mf_schema, entries, mf_meta = _ind_read_container(
        os.path.join(path, manifests[0]["manifest_path"]))
    assert mf_schema["name"] == "manifest_entry"
    top_ids = {f["name"]: f["field-id"] for f in mf_schema["fields"]}
    assert top_ids == {"status": 0, "snapshot_id": 1, "sequence_number": 3,
                       "file_sequence_number": 4, "data_file": 2}
    df_schema = next(f["type"] for f in mf_schema["fields"]
                     if f["name"] == "data_file")
    df_ids = {f["name"]: f["field-id"] for f in df_schema["fields"]}
    assert df_ids["file_path"] == 100 and df_ids["partition"] == 102
    # required manifest header keys per spec
    assert {"schema", "partition-spec", "partition-spec-id",
            "format-version", "content"} <= set(mf_meta)
    assert json.loads(mf_meta["schema"]) == meta["schemas"][0]

    # entries reference real files with typed partition values
    for e in entries:
        assert e["status"] == 1
        f = e["data_file"]
        assert os.path.exists(os.path.join(path, f["file_path"]))
        assert isinstance(f["partition"]["yyyy"], int)  # typed, not str
        assert f["record_count"] > 0

    # and the production read path sees the identical content
    assert {e["data_file"]["file_path"] for e in entries} == set(
        il._snapshot_files(path, meta, sid))


def test_iceberg_reader_still_parses_legacy_json_manifests(spark, sf_dir,
                                                           tmp_path):
    """Tables written by the pre-Avro iceberg_lite (JSON manifests)
    must stay readable: the reader branches on the file extension."""
    path = str(tmp_path / "ice_legacy")
    o = (spark.read.parquet(f"{sf_dir}/orders.parquet")
         .withColumn("yyyy", F.year("o_orderdate")).limit(80))
    sid = il.write_iceberg(o, path, partition_by=["yyyy"])
    meta = il.table_metadata(path)
    snap = meta["snapshots"][-1]

    # transcribe the avro manifests into the legacy JSON layout
    manifests = il._read_manifest_list(path, snap["manifest-list"])
    legacy_manifests = []
    for m in manifests:
        entries = il._read_manifest(path, m["manifest_path"])
        # the pre-Avro layout predates column stats (binary bounds are
        # not JSON-representable); legacy entries never carried them
        for e in entries:
            e["data_file"] = {
                k: v for k, v in e["data_file"].items()
                if k not in ("value_counts", "null_value_counts",
                             "lower_bounds", "upper_bounds")}
        mrel = m["manifest_path"].replace(".avro", ".manifest.json")
        with open(os.path.join(path, mrel), "w") as f:
            json.dump({"spec-id": 0, "entries": entries}, f)
        legacy_manifests.append(dict(m, manifest_path=mrel))
    mlrel = snap["manifest-list"].replace(".avro", ".manifest-list.json")
    with open(os.path.join(path, mlrel), "w") as f:
        json.dump({"manifests": legacy_manifests}, f)
    # point the snapshot at the JSON copies through a new metadata file
    versions = il._list_meta_versions(path)
    meta2 = json.loads(json.dumps(meta))
    meta2["snapshots"][-1]["manifest-list"] = mlrel
    with open(il._meta_path(path, versions[-1] + 1), "w") as f:
        json.dump(meta2, f)

    got = il.read_iceberg(spark, path)
    assert got.count() == 80
    assert got.agg(F.sum("o_orderkey")).first()[0] == \
        o.agg(F.sum("o_orderkey")).first()[0]


def test_partition_date_and_special_values_roundtrip(spark, tmp_path):
    """Date partition values ride as Avro date logical ints and come
    back as ISO strings; special characters in string partition values
    survive the hive-dir percent-encoding."""
    import datetime
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 3, 1), "a b%c"),
         (2, datetime.date(2024, 3, 2), "plain")],
        "id long, d date, seg string")
    path = str(tmp_path / "ice_dates")
    il.write_iceberg(df, path, partition_by=["d", "seg"])
    meta = il.table_metadata(path)
    snap = meta["snapshots"][-1]
    manifests = il._read_manifest_list(path, snap["manifest-list"])
    parts = [e["data_file"]["partition"]
             for m in manifests
             for e in il._read_manifest(path, m["manifest_path"])]
    assert {p["d"] for p in parts} == {"2024-03-01", "2024-03-02"}
    assert {p["seg"] for p in parts} == {"a b%c", "plain"}
    # metadata-level pruning matches on decoded values
    pruned = il.read_iceberg(spark, path,
                             partition_filter={"seg": "a b%c"})
    assert [r["id"] for r in pruned.collect()] == [1]

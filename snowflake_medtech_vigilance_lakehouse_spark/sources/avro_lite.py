"""Minimal Apache Avro binary encoder/decoder (object container files).

Implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that Iceberg
manifests and manifest lists need — written from the spec text, no
vendored code. Supported types: null, boolean, int, long, float,
double, bytes, string, fixed, enum, record, array, map, and unions.
Codec is always "null" (uncompressed); Iceberg readers accept that.

Why hand-rolled: this environment ships no avro/fastavro package, and
the Iceberg spec REQUIRES manifests to be Avro (a JSON stand-in is not
readable by any real engine). The encoder and decoder here are
independent code paths (the decoder does not call encoder internals),
and ``tests/test_avro_lite.py`` additionally round-trips files through
a third, test-local decoder so a shared encode/decode bug cannot hide.

Binary encoding rules used (spec "Binary Encoding"):
- int/long: zig-zag then little-endian base-128 varint
- float/double: 4/8 bytes little-endian IEEE-754
- bytes/string: long length prefix + raw/UTF-8 bytes
- record: field values in schema order, no framing
- enum: int position;  fixed: raw bytes, no length
- array/map: blocks (count, items, ..., 0 terminator); negative count
  means abs(count) items preceded by a long byte size (decoded, never
  encoded here)
- union: long index of the branch, then the value

Object container (spec "Object Container Files"): magic ``Obj\\x01``,
file-metadata map (``avro.schema`` JSON + ``avro.codec``), a 16-byte
sync marker, then data blocks of (record count, byte size, records,
sync marker).
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


# ------------------------------------------------------------- encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (((-n) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def encode_long(n: int) -> bytes:
    u = _zigzag(int(n))
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _schema_type(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch(schema: list, value) -> int:
    """Pick the union branch for a Python value: None -> the 'null'
    branch, anything else -> the single non-null branch (the only
    union shape Iceberg metadata uses)."""
    if value is None:
        for i, b in enumerate(schema):
            if _schema_type(b) == "null":
                return i
        raise ValueError("union has no null branch for None value")
    for i, b in enumerate(schema):
        if _schema_type(b) != "null":
            return i
    raise ValueError("union has no non-null branch")


def encode_value(schema, value, out: io.BytesIO) -> None:
    t = _schema_type(schema)
    if t == "union":
        idx = _union_branch(schema, value)
        out.write(encode_long(idx))
        encode_value(schema[idx], value, out)
    elif t == "null":
        if value is not None:
            raise ValueError(f"expected None for null schema, got {value!r}")
    elif t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        out.write(encode_long(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        b = bytes(value)
        out.write(encode_long(len(b)))
        out.write(b)
    elif t == "string":
        b = str(value).encode("utf-8")
        out.write(encode_long(len(b)))
        out.write(b)
    elif t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out.write(b)
    elif t == "enum":
        out.write(encode_long(schema["symbols"].index(value)))
    elif t == "record":
        for f in schema["fields"]:
            if f["name"] in value:
                fv = value[f["name"]]
            elif "default" in f:
                fv = f["default"]
            else:
                raise ValueError(f"record value missing field {f['name']!r}")
            encode_value(f["type"], fv, out)
    elif t == "array":
        items = list(value)
        if items:
            out.write(encode_long(len(items)))
            for it in items:
                encode_value(schema["items"], it, out)
        out.write(encode_long(0))
    elif t == "map":
        entries = dict(value)
        if entries:
            out.write(encode_long(len(entries)))
            for k, v in entries.items():
                encode_value("string", k, out)
                encode_value(schema["values"], v, out)
        out.write(encode_long(0))
    else:
        raise ValueError(f"avro_lite: unsupported schema type {t!r}")


# ------------------------------------------------------------- decoding

class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise EOFError("avro_lite: truncated input")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(acc)
            shift += 7
            if shift > 70:
                raise ValueError("avro_lite: varint too long")


def decode_value(schema, r: _Reader):
    t = _schema_type(schema)
    if t == "union":
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise ValueError(f"avro_lite: union index {idx} out of range")
        return decode_value(schema[idx], r)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "record":
        return {f["name"]: decode_value(f["type"], r) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(decode_value(schema["items"], r))
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = decode_value("string", r)
                out[k] = decode_value(schema["values"], r)
    raise ValueError(f"avro_lite: unsupported schema type {t!r}")


# ----------------------------------------------------- container files

def write_object_container(path: str, schema: dict, records: list[dict],
                           metadata: dict[str, str] | None = None) -> None:
    """Write ``records`` as a single-block Avro object container file
    with the ``null`` codec. ``metadata`` adds extra file-metadata
    entries next to ``avro.schema``/``avro.codec`` (Iceberg stores
    e.g. ``format-version`` and the partition spec there)."""
    sync = uuid.uuid4().bytes  # any 16 bytes; readers only compare
    body = io.BytesIO()
    for rec in records:
        encode_value(schema, rec, body)
    payload = body.getvalue()

    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": b"null"}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)

    out = io.BytesIO()
    out.write(MAGIC)
    out.write(encode_long(len(meta)))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        out.write(encode_long(len(kb)))
        out.write(kb)
        out.write(encode_long(len(v)))
        out.write(v)
    out.write(encode_long(0))
    out.write(sync)
    if records:
        out.write(encode_long(len(records)))
        out.write(encode_long(len(payload)))
        out.write(payload)
        out.write(sync)

    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_object_container(path: str) -> tuple[dict, list[dict], dict[str, bytes]]:
    """Read an Avro object container file written with the ``null``
    codec. Returns ``(schema, records, file_metadata)``."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read(4) != MAGIC:
        raise ValueError(f"not an Avro object container: {path}")
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read(r.read_long()).decode("utf-8")
            meta[k] = bytes(r.read(r.read_long()))
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"avro_lite: unsupported codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = r.read(16)
    records: list[dict] = []
    while r.pos < len(r.data):
        count = r.read_long()
        r.read_long()  # block byte size (unused with null codec)
        for _ in range(count):
            records.append(decode_value(schema, r))
        if r.read(16) != sync:
            raise ValueError(f"avro_lite: sync marker mismatch in {path}")
    return schema, records, meta

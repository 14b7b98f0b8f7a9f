"""Pure-Python Avro Object Container File (OCF) writer/reader.

Implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/ — binary encoding
and the object-container-file framing) needed to land Spark rows as
standard .avro files and read them back, covering the reference's
primary serialization format (Tier 2 #17 AvroConverter,
/root/reference/bin/submit_config.sh:17-18) in an environment where the
spark-avro DataSource jar cannot be deployed (no network, external
package).  Files written here are byte-level standard OCF: any stock
Avro reader (avro-tools, fastavro, spark-avro) consumes them.

Scope: null codec, flat record schemas over the primitive types Spark's
fixture tables need — long, int, double, string, boolean, bytes — each
wrapped nullable as the union ["null", T] (Spark columns are nullable
by default; spark-avro emits the same unions).  Logical type `date`
(int days since epoch) is supported for DateType columns.

This module is plain bytes-in/bytes-out and runs INSIDE executor tasks
(mapInPandas) — one container file per partition on write, one decode
per file on read — so the sink/source stays fully distributed; nothing
here touches the driver.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
from datetime import date, timedelta

MAGIC = b"Obj\x01"
_EPOCH = date(1970, 1, 1)

# records per OCF block; real writers flush ~16-64K-byte blocks — the
# constant only affects framing, not the decoded contents
BLOCK_RECORDS = 4096


# ---------------------------------------------------------------- encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    n = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def read_bytes(buf: io.BytesIO) -> bytes:
    n = read_long(buf)
    return buf.read(n)


def _write_value(buf: io.BytesIO, typ: str, v) -> None:
    """Encode one non-null value of primitive/logical type `typ`."""
    if typ in ("long", "int"):
        write_long(buf, int(v))
    elif typ == "double":
        buf.write(struct.pack("<d", float(v)))
    elif typ == "string":
        write_bytes(buf, str(v).encode("utf-8"))
    elif typ == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    elif typ == "bytes":
        write_bytes(buf, bytes(v))
    elif typ == "date":
        write_long(buf, (v - _EPOCH).days)
    else:
        raise ValueError(f"unsupported avro type {typ!r}")


def _read_value(buf: io.BytesIO, typ: str):
    if typ in ("long", "int"):
        return read_long(buf)
    if typ == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if typ == "string":
        return read_bytes(buf).decode("utf-8")
    if typ == "boolean":
        return buf.read(1) == b"\x01"
    if typ == "bytes":
        return read_bytes(buf)
    if typ == "date":
        return _EPOCH + timedelta(days=read_long(buf))
    raise ValueError(f"unsupported avro type {typ!r}")


# ------------------------------------------------------------------ schema

def record_schema(name: str, fields: list[tuple[str, str]]) -> dict:
    """Avro record schema with every field nullable (union ["null", T]),
    mirroring what spark-avro emits for nullable Spark columns.
    `fields` is [(field_name, type)] with type in long/int/double/string/
    boolean/bytes/date."""

    def ftype(t: str):
        if t == "date":
            return {"type": "int", "logicalType": "date"}
        return t

    return {
        "type": "record",
        "name": name,
        "fields": [{"name": n, "type": ["null", ftype(t)]} for n, t in fields],
    }


def _field_types(schema: dict) -> list[tuple[str, str]]:
    """Extract [(name, primitive-or-date)] back out of a nullable-union
    record schema (ours or spark-avro's)."""
    out = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # union — find the non-null branch
            t = next(x for x in t if x != "null")
        if isinstance(t, dict):
            t = "date" if t.get("logicalType") == "date" else t["type"]
        out.append((f["name"], t))
    return out


# ------------------------------------------------------------- file writer

def write_ocf(rows: list[tuple], schema: dict) -> bytes:
    """Serialize rows (tuples in schema field order; None = null) into one
    Avro OCF byte string.  The 16-byte sync marker is derived from the
    schema so output is deterministic (bit-identical re-runs)."""
    schema_json = json.dumps(schema, separators=(",", ":"), sort_keys=True)
    sync = hashlib.md5(schema_json.encode()).digest()
    types = _field_types(schema)

    out = io.BytesIO()
    out.write(MAGIC)
    # file metadata map: one block of 2 entries, then end-of-map
    write_long(out, 2)
    write_bytes(out, b"avro.schema")
    write_bytes(out, schema_json.encode())
    write_bytes(out, b"avro.codec")
    write_bytes(out, b"null")
    write_long(out, 0)
    out.write(sync)

    for start in range(0, len(rows), BLOCK_RECORDS):
        chunk = rows[start : start + BLOCK_RECORDS]
        body = io.BytesIO()
        for row in chunk:
            for (_, typ), v in zip(types, row):
                if v is None:
                    write_long(body, 0)  # union branch 0 = null
                else:
                    write_long(body, 1)  # union branch 1 = value
                    _write_value(body, typ, v)
        payload = body.getvalue()
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


# ------------------------------------------------------------- file reader

def read_ocf(data: bytes) -> tuple[dict, list[tuple]]:
    """Parse one OCF byte string -> (schema, rows as tuples in field
    order, None for nulls).  Validates magic, codec and per-block sync
    markers."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            read_long(buf)
        for _ in range(n):
            k = read_bytes(buf).decode()
            meta[k] = read_bytes(buf)
    codec = meta.get("avro.codec", b"null")
    if codec != b"null":
        raise ValueError(f"unsupported avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"])
    types = _field_types(schema)
    sync = buf.read(16)

    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n_rec = read_long(buf)
        n_bytes = read_long(buf)
        block = io.BytesIO(buf.read(n_bytes))
        for _ in range(n_rec):
            row = []
            for _, typ in types:
                branch = read_long(block)
                row.append(None if branch == 0 else _read_value(block, typ))
            rows.append(tuple(row))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, rows

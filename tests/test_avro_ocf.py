"""Unit tests for the pure-Python Avro OCF codec (formats/avro_ocf.py)
against hand-built expectations from the public Avro 1.11 spec, plus the
distributed snk_avro round trip."""

from __future__ import annotations

import io
import json
from datetime import date

import pytest

from kafka_connect_sse_spark.formats.avro_ocf import (
    MAGIC,
    read_bytes,
    read_long,
    read_ocf,
    record_schema,
    write_long,
    write_ocf,
)

SCHEMA = record_schema(
    "t",
    [
        ("k", "long"),
        ("s", "string"),
        ("x", "double"),
        ("b", "boolean"),
        ("d", "date"),
    ],
)

ROWS = [
    (1, "hello", 1.5, True, date(1997, 8, 20)),
    (-42, "naïve ünïcode", -0.0, False, date(1970, 1, 1)),
    (2**62, "", 1e300, True, date(2049, 12, 31)),
    (None, None, None, None, None),
]


def test_zigzag_varint_spec_vectors():
    """Spec: 0->00, -1->01, 1->02, -2->03, 2->04; -64->7f, 64->80 01."""
    vectors = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03",
               2: b"\x04", -64: b"\x7f", 64: b"\x80\x01"}
    for n, expect in vectors.items():
        buf = io.BytesIO()
        write_long(buf, n)
        assert buf.getvalue() == expect, n
        assert read_long(io.BytesIO(expect)) == n


def test_roundtrip_values_and_nulls():
    schema, rows = read_ocf(write_ocf(ROWS, SCHEMA))
    assert rows == ROWS
    assert schema["fields"][4]["type"][1]["logicalType"] == "date"


def test_container_framing_is_spec_shaped():
    data = write_ocf(ROWS, SCHEMA)
    buf = io.BytesIO(data)
    assert buf.read(4) == MAGIC
    # metadata map: block count 2, then the two entries
    assert read_long(buf) == 2
    meta = {}
    for _ in range(2):
        k = read_bytes(buf).decode()
        meta[k] = read_bytes(buf)
    assert read_long(buf) == 0  # end of map
    assert meta["avro.codec"] == b"null"
    assert json.loads(meta["avro.schema"])["name"] == "t"
    sync = buf.read(16)
    n_rec = read_long(buf)
    n_bytes = read_long(buf)
    assert n_rec == len(ROWS)
    buf.read(n_bytes)
    assert buf.read(16) == sync  # block terminated by the sync marker
    assert buf.read() == b""  # single block for 4 rows


def test_deterministic_output():
    assert write_ocf(ROWS, SCHEMA) == write_ocf(ROWS, SCHEMA)


def test_block_split_roundtrip(monkeypatch):
    import kafka_connect_sse_spark.formats.avro_ocf as m

    monkeypatch.setattr(m, "BLOCK_RECORDS", 2)
    data = m.write_ocf(ROWS, SCHEMA)
    _, rows = m.read_ocf(data)
    assert rows == ROWS


def test_corrupt_sync_detected():
    data = bytearray(write_ocf(ROWS, SCHEMA))
    data[-1] ^= 0xFF  # clobber last sync byte
    with pytest.raises(ValueError, match="sync"):
        read_ocf(bytes(data))


def test_snk_avro_files_are_real_ocf(tmp_path):
    """The sink op lands files any stock Avro reader would accept: magic,
    readable metadata, schema naming the orders fields."""
    from kafka_connect_sse_spark.io import scratch_dir
    from kafka_connect_sse_spark.operators.sinks import snk_avro
    from kafka_connect_sse_spark.session import get_spark
    import glob
    import os

    spark = get_spark(shuffle_partitions=8)
    out = snk_avro(spark, "/root/testdata/sf0.001")
    got = {r.o_orderstatus: r.n for r in out.collect()}
    assert sum(got.values()) > 0

    files = glob.glob(
        os.path.join(scratch_dir("kcss_snk_avro"), "*.avro")
    )
    assert files
    with open(files[0], "rb") as fh:
        schema, rows = read_ocf(fh.read())
    assert [f["name"] for f in schema["fields"]] == [
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
    ]
    assert rows and isinstance(rows[0][3], date)


# ---------------------------------------------------------- property-based

from hypothesis import given, settings
from hypothesis import strategies as st

_FIELD_TYPES = ["long", "int", "double", "string", "boolean", "bytes", "date"]


def _value_for(typ):
    if typ == "long":
        return st.integers(min_value=-(2**63), max_value=2**63 - 1)
    if typ == "int":
        return st.integers(min_value=-(2**31), max_value=2**31 - 1)
    if typ == "double":
        # NaN compares unequal to itself; allow inf and signed zeros
        return st.floats(allow_nan=False)
    if typ == "string":
        return st.text(max_size=40)
    if typ == "boolean":
        return st.booleans()
    if typ == "bytes":
        return st.binary(max_size=40)
    return st.dates(date(1, 1, 1), date(9999, 12, 31))


@st.composite
def _table(draw):
    types = draw(
        st.lists(st.sampled_from(_FIELD_TYPES), min_size=1, max_size=5)
    )
    fields = [(f"f{i}", t) for i, t in enumerate(types)]
    row = st.tuples(
        *[st.one_of(st.none(), _value_for(t)) for _, t in fields]
    )
    rows = draw(st.lists(row, max_size=30))
    return fields, rows


@given(_table())
@settings(max_examples=200, deadline=None)
def test_ocf_roundtrip_property(tbl):
    """write_ocf(read_ocf) is the identity for every field-type mix, null
    placement, zigzag boundary value (+-2^63), non-finite double, and
    empty-row-set edge the strategy can produce."""
    fields, rows = tbl
    schema = record_schema("prop", fields)
    back_schema, back_rows = read_ocf(write_ocf(rows, schema))
    assert back_rows == rows
    assert [f["name"] for f in back_schema["fields"]] == [n for n, _ in fields]

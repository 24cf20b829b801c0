"""Avro OCF reader/writer (functions/avro_io.py): spec vectors for the
zigzag varint table, roundtrips across codecs/nulls/types, sync-marker
and CRC tamper detection, scope gates, Hypothesis fuzz."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions.avro_io import (
    _zz_encode,
    avro_read,
    avro_write,
)

SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
        {"name": "score", "type": ["null", "double"]},
        {"name": "flag", "type": "boolean"},
        {"name": "blob", "type": ["null", "bytes"]},
        {"name": "small", "type": "int"},
    ],
}


def _rows(n):
    return [
        {
            "id": i * 99999999999 - 5,
            "name": None if i % 7 == 0 else f"row-é-{i}",
            "score": None if i % 5 == 0 else i * 0.25,
            "flag": i % 2 == 0,
            "blob": None if i % 3 == 0 else bytes([i % 256, 255 - i % 256]),
            "small": i - 500,
        }
        for i in range(n)
    ]


def test_zigzag_spec_vectors():
    # the table from the Avro specification's binary-encoding section
    assert _zz_encode(0) == b"\x00"
    assert _zz_encode(-1) == b"\x01"
    assert _zz_encode(1) == b"\x02"
    assert _zz_encode(-2) == b"\x03"
    assert _zz_encode(2) == b"\x04"
    assert _zz_encode(-64) == b"\x7f"
    assert _zz_encode(64) == b"\x80\x01"


@pytest.mark.parametrize("codec", ["null", "deflate", "snappy"])
@pytest.mark.parametrize("block_rows", [1, 300, 10000])
def test_roundtrip(codec, block_rows):
    rows = _rows(1500)
    buf = avro_write(SCHEMA, rows, codec=codec, block_rows=block_rows)
    schema, got = avro_read(buf)
    assert [f["name"] for f in schema["fields"]] == [
        f["name"] for f in SCHEMA["fields"]
    ]
    assert got == rows


def test_block_tamper_detected():
    buf = bytearray(avro_write(SCHEMA, _rows(400), codec="snappy", block_rows=100))
    buf[-30] ^= 0x10  # inside the last block's payload or sync
    with pytest.raises(ValueError):
        avro_read(bytes(buf))


def test_scope_gates():
    with pytest.raises(NotImplementedError, match="not in scope"):
        avro_write(
            {"type": "record", "name": "x",
             "fields": [{"name": "a", "type": {"type": "array", "items": "int"}}]},
            [],
        )
    with pytest.raises(NotImplementedError, match="union"):
        avro_write(
            {"type": "record", "name": "x",
             "fields": [{"name": "a", "type": ["null", "int", "long"]}]},
            [],
        )
    with pytest.raises(ValueError, match="non-nullable"):
        avro_write(
            {"type": "record", "name": "x",
             "fields": [{"name": "a", "type": "long"}]},
            [{"a": None}],
        )


def test_empty_and_single_row():
    for rows in ([], [{"id": 1, "name": "x", "score": None, "flag": True,
                       "blob": b"", "small": -1}]):
        buf = avro_write(SCHEMA, rows)
        _s, got = avro_read(buf)
        assert got == rows


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(-(2**63), 2**63 - 1),
            st.one_of(st.none(), st.text(max_size=30)),
            st.one_of(st.none(), st.floats(allow_nan=False)),
            st.booleans(),
        ),
        max_size=300,
    ),
    codec=st.sampled_from(["null", "deflate", "snappy"]),
)
def test_fuzz_roundtrip(data, codec):
    schema = {
        "type": "record",
        "name": "f",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "d", "type": ["null", "double"]},
            {"name": "b", "type": "boolean"},
        ],
    }
    rows = [{"i": i, "s": s, "d": d, "b": b} for i, s, d, b in data]
    _sch, got = avro_read(avro_write(schema, rows, codec=codec, block_rows=64))
    assert got == rows

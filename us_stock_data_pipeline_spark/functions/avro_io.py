"""REAL Avro Object Container File reader + writer, pure Python
(round 13) — the row-oriented landing format the environment's Spark
cannot read natively (no spark-avro jar, installs prohibited): the
engine ships its own byte-level implementation instead of leaving the
format gated.

Both directions implement the public Apache Avro 1.11 spec:

- container layout: ``Obj\\x01`` magic, file metadata map
  (``avro.schema`` JSON + ``avro.codec``), 16-byte sync marker, then
  data blocks of (row count, byte size, payload, sync) with the sync
  marker VERIFIED on every block (corruption/misalignment detection,
  and the split point a distributed reader parallelizes on);
- binary encoding: zigzag-varint ints/longs, little-endian IEEE
  float/double, length-prefixed string/bytes, 1-byte booleans, unions
  as (branch index, value) — the ``["null", T]`` nullable idiom
  supported on every field;
- codecs: ``null``, ``deflate`` (raw RFC-1951, stdlib zlib), and
  ``snappy`` (the in-repo compressor + the spec's trailing 4-byte
  big-endian CRC32 of the UNCOMPRESSED payload, verified on read).

Scope: flat record schemas over boolean / int / long / float / double
/ string / bytes, each optionally nullable. Arrays, maps, nested
records, enums and fixed raise NotImplementedError by schema
inspection up front.

Format reference: avro.apache.org/docs/1.11.1/specification/ (public).
Reference-repo scope note: sanantachat/us-stock-data-pipeline lands
REST JSON only; this extends SURVEY.md SS2B's source-format ladder.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"
_PRIMS = {"boolean", "int", "long", "float", "double", "string", "bytes"}


def _zz_encode(v: int) -> bytes:
    u = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def zz(self) -> int:
        u = 0
        shift = 0
        while True:
            b = self.byte()
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        if len(out) != n:
            raise ValueError("truncated Avro data")
        self.pos += n
        return out


def _field_type(f: dict) -> tuple[str, bool]:
    """(primitive type, nullable) for one schema field; rejects
    anything outside the flat-record scope loudly."""
    t = f["type"]
    if isinstance(t, str):
        if t not in _PRIMS:
            raise NotImplementedError(f"Avro type {t!r} not in scope")
        return t, False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) != 2 or "null" not in t or len(branches) != 1:
            raise NotImplementedError(f"Avro union {t!r} not in scope")
        if branches[0] not in _PRIMS:
            raise NotImplementedError(f"Avro type {branches[0]!r} not in scope")
        return branches[0], True
    raise NotImplementedError(f"Avro complex type {t!r} not in scope")


def _encode_value(v, typ: str) -> bytes:
    if typ == "boolean":
        return b"\x01" if v else b"\x00"
    if typ in ("int", "long"):
        return _zz_encode(int(v))
    if typ == "float":
        return struct.pack("<f", float(v))
    if typ == "double":
        return struct.pack("<d", float(v))
    if typ in ("string", "bytes"):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return _zz_encode(len(b)) + b
    raise NotImplementedError(typ)


def _decode_value(r: _Reader, typ: str):
    if typ == "boolean":
        return r.byte() != 0
    if typ in ("int", "long"):
        return r.zz()
    if typ == "float":
        return struct.unpack("<f", r.raw(4))[0]
    if typ == "double":
        return struct.unpack("<d", r.raw(8))[0]
    if typ == "string":
        return r.raw(r.zz()).decode("utf-8")
    if typ == "bytes":
        return bytes(r.raw(r.zz()))
    raise NotImplementedError(typ)


def avro_write(
    schema: dict,
    rows: list[dict],
    codec: str = "deflate",
    block_rows: int = 1000,
    sync: bytes | None = None,
) -> bytes:
    """Serialize `rows` (dicts keyed by field name; None for nulls)
    under the flat record `schema` into a complete OCF byte string."""
    if schema.get("type") != "record":
        raise NotImplementedError("only record schemas in scope")
    fields = [(f["name"], *_field_type(f)) for f in schema["fields"]]
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"Avro codec {codec!r} not in scope")
    sync = sync or os.urandom(16)
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, sort_keys=True).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    out += _zz_encode(len(meta))
    for k, v in sorted(meta.items()):
        kb = k.encode("utf-8")
        out += _zz_encode(len(kb)) + kb + _zz_encode(len(v)) + v
    out += _zz_encode(0)  # end of metadata map
    out += sync
    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        if not chunk:
            continue
        body = bytearray()
        for row in chunk:
            for name, typ, nullable in fields:
                v = row.get(name)
                if nullable:
                    if v is None:
                        body += _zz_encode(0)  # union branch 0 = null
                        continue
                    body += _zz_encode(1)
                elif v is None:
                    raise ValueError(f"null in non-nullable field {name!r}")
                body += _encode_value(v, typ)
        raw = bytes(body)
        if codec == "deflate":
            payload = zlib.compress(raw)[2:-4]  # raw RFC-1951, per spec
        elif codec == "snappy":
            from us_stock_data_pipeline_spark.functions.multimodal import (
                snappy_compress,
            )

            payload = snappy_compress(raw) + struct.pack(
                ">I", zlib.crc32(raw) & 0xFFFFFFFF
            )
        else:
            payload = raw
        out += _zz_encode(len(chunk))
        out += _zz_encode(len(payload))
        out += payload
        out += sync
    return bytes(out)


def avro_read(data: bytes) -> tuple[dict, list[dict]]:
    """Parse an OCF byte string -> (schema, rows). Verifies the magic,
    every block's sync marker, and the snappy codec's CRC32."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.zz()
        if n == 0:
            break
        if n < 0:  # negative block count: size follows (spec map form)
            r.zz()
            n = -n
        for _ in range(n):
            k = r.raw(r.zz()).decode("utf-8")
            meta[k] = bytes(r.raw(r.zz()))
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if schema.get("type") != "record":
        raise NotImplementedError("only record schemas in scope")
    fields = [(f["name"], *_field_type(f)) for f in schema["fields"]]
    if codec not in ("null", "deflate", "snappy"):
        raise NotImplementedError(f"Avro codec {codec!r} not in scope")
    sync = r.raw(16)
    rows: list[dict] = []
    while r.pos < len(data):
        count = r.zz()
        size = r.zz()
        payload = r.raw(size)
        if r.raw(16) != sync:
            raise ValueError("Avro block sync marker mismatch")
        if codec == "deflate":
            raw = zlib.decompress(payload, -15)
        elif codec == "snappy":
            from us_stock_data_pipeline_spark.functions.multimodal import (
                snappy_decompress,
            )

            raw = snappy_decompress(payload[:-4])
            (crc,) = struct.unpack(">I", payload[-4:])
            if zlib.crc32(raw) & 0xFFFFFFFF != crc:
                raise ValueError("Avro snappy block CRC mismatch")
        else:
            raw = payload
        br = _Reader(raw)
        for _ in range(count):
            row = {}
            for name, typ, nullable in fields:
                if nullable:
                    branch = br.zz()
                    if branch == 0:
                        row[name] = None
                        continue
                    if branch != 1:
                        raise ValueError("invalid Avro union branch")
                row[name] = _decode_value(br, typ)
            rows.append(row)
        if br.pos != len(raw):
            raise ValueError("Avro block decoded size mismatch")
    return schema, rows

"""REAL ORC reader, pure Python (round 13) — no JVM, no pyarrow on the
decode side. Completes the storage-format matrix next to the raw
parquet reader/writer, the Avro OCF codec, and the Arrow IPC pair.

Layers parsed from raw bytes:

- **Protobuf**: a minimal wire-format reader (varint / fixed64 /
  length-delimited / fixed32) for PostScript, Footer,
  StripeInformation, Type, StripeFooter, Stream, ColumnEncoding.
- **Compression framing**: ORC streams are chunked — 3-byte
  little-endian header ``(length << 1) | is_original`` then the chunk,
  DEFLATE (raw, wbits=-15) for ZLIB or the in-repo raw-Snappy codec;
  NONE passes through unframed.
- **Run-length codecs**: byte-RLE (runs of ``c+3`` / ``256-c``
  literals) for booleans and bytes, and **RLEv2** with all four
  sub-encodings — SHORT_REPEAT (big-endian packed value, count 3-10),
  DIRECT (5-bit width code, MSB-first bit packing), PATCHED_BASE
  (sign-bit base, packed values, gap+patch list re-OR-ing high bits),
  DELTA (varint base + signed delta base, fixed-delta when the width
  code is 0, packed delta magnitudes taking delta-base's sign) — with
  zigzag applied for signed streams.
- **Column assembly**: PRESENT bit-streams (MSB-first, 1 = non-null)
  interleaved with DATA/LENGTH/DICTIONARY_DATA streams per encoding:
  int/short/long/date (DIRECT_V2 signed RLEv2), double/float (IEEE LE),
  boolean (bit stream over byte-RLE), string/binary/char/varchar in
  BOTH DIRECT_V2 (data + lengths) and DICTIONARY_V2 (sorted dictionary
  + index stream) encodings, across MULTIPLE stripes.

Scope gates (NotImplementedError): ZSTD/LZO/LZ4 compression,
timestamp/decimal/union columns, nested types below the root struct.
Row indexes and bloom filters are skipped by construction (the reader
walks data streams only).

Format reference: the public Apache ORC specification (ORC v1,
orc_proto.proto + the run-length and stream-layout sections).
Reference-repo scope note: the reference reads only parquet
(`utils.py:7`); a lakehouse engine meets ORC constantly (Hive/Trino
warehouses), so the storage tier should speak it from raw bytes.
"""

from __future__ import annotations

import struct
import zlib

# -------------------------------------------------------------- protobuf


def _pb_parse(buf: bytes, start: int = 0, end: int | None = None) -> dict:
    """Wire-format walk -> {field_id: [values...]} (varints as ints,
    length-delimited as bytes)."""
    end = len(buf) if end is None else end
    out: dict[int, list] = {}
    pos = start
    while pos < end:
        tag = 0
        shift = 0
        while True:
            b = buf[pos]
            pos += 1
            tag |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        fid, wt = tag >> 3, tag & 7
        if wt == 0:
            v = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                v |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wt == 2:
            ln = 0
            shift = 0
            while True:
                b = buf[pos]
                pos += 1
                ln |= (b & 0x7F) << shift
                if not b & 0x80:
                    break
                shift += 7
            v = bytes(buf[pos : pos + ln])
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wt}")
        out.setdefault(fid, []).append(v)
    return out


def _pb1(msg: dict, fid: int, default=0):
    return msg[fid][0] if fid in msg else default


def _pb_uints(msg: dict, fid: int) -> list[int]:
    """Repeated uint field: handles BOTH the unpacked (one varint per
    entry) and packed (length-delimited run of varints) encodings."""
    out: list[int] = []
    for v in msg.get(fid, []):
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                u, pos = _varint(v, pos)
                out.append(u)
    return out


# ----------------------------------------------------------- compression

_COMP_NONE, _COMP_ZLIB, _COMP_SNAPPY = 0, 1, 2
_COMP_NAMES = {3: "LZO", 4: "LZ4", 5: "ZSTD"}


def _decompress_stream(raw: bytes, compression: int) -> bytes:
    """Undo ORC's chunked stream framing."""
    if compression == _COMP_NONE:
        return raw
    out = bytearray()
    pos = 0
    while pos + 3 <= len(raw):
        h = raw[pos] | (raw[pos + 1] << 8) | (raw[pos + 2] << 16)
        pos += 3
        ln = h >> 1
        chunk = raw[pos : pos + ln]
        if len(chunk) != ln:
            raise ValueError("truncated ORC compression chunk")
        pos += ln
        if h & 1:  # original (stored uncompressed)
            out += chunk
        elif compression == _COMP_ZLIB:
            out += zlib.decompress(chunk, -15)
        elif compression == _COMP_SNAPPY:
            from us_stock_data_pipeline_spark.functions.multimodal import (
                snappy_decompress,
            )

            out += snappy_decompress(bytes(chunk))
        else:
            raise NotImplementedError(
                f"ORC compression {_COMP_NAMES.get(compression, compression)}"
                " not in scope"
            )
    return bytes(out)


# ------------------------------------------------------------- run-length


def _byte_rle(data: bytes) -> bytes:
    """ORC byte-RLE: control < 128 -> run of control+3 of next byte;
    control >= 128 -> 256-control literal bytes."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        pos += 1
        if c < 128:
            out += bytes([data[pos]]) * (c + 3)
            pos += 1
        else:
            cnt = 256 - c
            out += data[pos : pos + cnt]
            pos += cnt
    return bytes(out)


def _bits_msb(data: bytes, count: int) -> list[bool]:
    return [bool(data[i >> 3] & (0x80 >> (i & 7))) for i in range(count)]


def _decode_width(code: int) -> int:
    if code <= 23:
        return code + 1
    return {24: 26, 25: 28, 26: 30, 27: 32, 28: 40, 29: 48, 30: 56, 31: 64}[code]


def _closest_fixed_bits(n: int) -> int:
    """ORC's getClosestFixedBits: widths are drawn from
    {1..24, 26, 28, 30, 32, 40, 48, 56, 64} — patch-list entries are
    packed at the ROUNDED width of (gap bits + patch bits)."""
    if n <= 1:
        return 1
    if n <= 24:
        return n
    for w in (26, 28, 30, 32, 40, 48, 56):
        if n <= w:
            return w
    return 64


class _BitReader:
    """MSB-first bit unpacker over a byte region."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, width: int) -> int:
        v = 0
        for _ in range(width):
            byte = self.data[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def align(self) -> int:
        if self.bit:
            self.bit = 0
            self.pos += 1
        return self.pos


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _rlev2(data: bytes, count: int, signed: bool) -> list[int]:
    """All four RLEv2 sub-encodings, `count` values total."""
    out: list[int] = []
    pos = 0
    while len(out) < count:
        b0 = data[pos]
        mode = b0 >> 6
        if mode == 0:  # SHORT_REPEAT
            width = ((b0 >> 3) & 0x7) + 1
            run = (b0 & 0x7) + 3
            v = int.from_bytes(data[pos + 1 : pos + 1 + width], "big")
            pos += 1 + width
            if signed:
                v = _unzigzag(v)
            out.extend([v] * run)
        elif mode == 1:  # DIRECT
            width = _decode_width((b0 >> 1) & 0x1F)
            length = (((b0 & 1) << 8) | data[pos + 1]) + 1
            br = _BitReader(data, pos + 2)
            vals = [br.read(width) for _ in range(length)]
            pos = br.align()
            if signed:
                vals = [_unzigzag(v) for v in vals]
            out.extend(vals)
        elif mode == 2:  # PATCHED_BASE
            width = _decode_width((b0 >> 1) & 0x1F)
            length = (((b0 & 1) << 8) | data[pos + 1]) + 1
            b2, b3 = data[pos + 2], data[pos + 3]
            base_bytes = ((b2 >> 5) & 0x7) + 1
            patch_width = _decode_width(b2 & 0x1F)
            patch_gap_width = ((b3 >> 5) & 0x7) + 1
            patch_count = b3 & 0x1F
            p = pos + 4
            base = int.from_bytes(data[p : p + base_bytes], "big")
            sign_bit = 1 << (base_bytes * 8 - 1)
            if base & sign_bit:
                base = -(base & (sign_bit - 1))
            p += base_bytes
            br = _BitReader(data, p)
            vals = [br.read(width) for _ in range(length)]
            p = br.align()
            br = _BitReader(data, p)
            entry_width = _closest_fixed_bits(patch_gap_width + patch_width)
            idx = 0
            for _ in range(patch_count):
                entry = br.read(entry_width)
                gap = entry >> patch_width
                patch = entry & ((1 << patch_width) - 1)
                # (gap=255, patch=0) entries extend gaps beyond 2^pgw-1;
                # plain accumulation handles them (OR of 0 is a no-op)
                idx += gap
                vals[idx] |= patch << width
            pos = br.align()
            out.extend(base + v for v in vals)
        else:  # DELTA
            wcode = (b0 >> 1) & 0x1F
            width = 0 if wcode == 0 else _decode_width(wcode)
            length = (((b0 & 1) << 8) | data[pos + 1]) + 1
            p = pos + 2
            raw_base, p = _varint(data, p)
            base = _unzigzag(raw_base) if signed else raw_base
            raw_delta, p = _varint(data, p)
            delta_base = _unzigzag(raw_delta)
            vals = [base]
            if length > 1:
                vals.append(base + delta_base)
            if width == 0:
                while len(vals) < length:
                    vals.append(vals[-1] + delta_base)
                pos = p
            else:
                br = _BitReader(data, p)
                sign = 1 if delta_base >= 0 else -1
                for _ in range(length - 2):
                    vals.append(vals[-1] + sign * br.read(width))
                pos = br.align()
            out.extend(vals)
    return out[:count]


# ----------------------------------------------------------------- reader

_K_BOOLEAN, _K_BYTE, _K_SHORT, _K_INT, _K_LONG = 0, 1, 2, 3, 4
_K_FLOAT, _K_DOUBLE, _K_STRING, _K_BINARY = 5, 6, 7, 8
_K_TIMESTAMP, _K_LIST, _K_MAP, _K_STRUCT = 9, 10, 11, 12
_K_DATE, _K_VARCHAR, _K_CHAR = 15, 16, 17
_KIND_NAMES = {9: "timestamp", 10: "list", 11: "map", 13: "union",
               14: "decimal", 18: "timestamp_instant"}

_S_PRESENT, _S_DATA, _S_LENGTH, _S_DICT_DATA = 0, 1, 2, 3
_S_ROW_INDEX, _S_BLOOM, _S_BLOOM_UTF8 = 6, 7, 8


def read_orc(buf: bytes) -> tuple[list[str], list[list]]:
    """Decode a flat-schema ORC file: (column_names, columns) with
    Python values (None for nulls), concatenated across stripes."""
    if buf[:3] != b"ORC":
        raise ValueError("not an ORC file (missing magic)")
    ps_len = buf[-1]
    ps = _pb_parse(buf, len(buf) - 1 - ps_len, len(buf) - 1)
    footer_len = _pb1(ps, 1)
    compression = _pb1(ps, 2, 0)
    if compression not in (_COMP_NONE, _COMP_ZLIB, _COMP_SNAPPY):
        raise NotImplementedError(
            f"ORC compression {_COMP_NAMES.get(compression, compression)}"
            " not in scope"
        )
    footer_raw = buf[len(buf) - 1 - ps_len - footer_len : len(buf) - 1 - ps_len]
    footer = _pb_parse(_decompress_stream(footer_raw, compression))
    types = [_pb_parse(t) for t in footer.get(4, [])]
    if not types or _pb1(types[0], 1, 0) != _K_STRUCT:
        raise ValueError("ORC root type must be a struct")
    sub = _pb_uints(types[0], 2)
    names = [n.decode("utf-8") for n in types[0].get(3, [])]
    kinds = []
    for tid in sub:
        k = _pb1(types[tid], 1, 0)
        if k in (_K_TIMESTAMP, _K_LIST, _K_MAP, _K_STRUCT, 13, 14, 18):
            raise NotImplementedError(
                f"ORC column type {_KIND_NAMES.get(k, k)!r} not in scope"
            )
        kinds.append(k)
    cols: list[list] = [[] for _ in sub]
    for sinfo_raw in footer.get(3, []):
        si = _pb_parse(sinfo_raw)
        offset = _pb1(si, 1)
        index_len = _pb1(si, 2)
        data_len = _pb1(si, 3)
        sf_len = _pb1(si, 4)
        n_rows = _pb1(si, 5)
        sf = _pb_parse(
            _decompress_stream(
                buf[offset + index_len + data_len : offset + index_len + data_len + sf_len],
                compression,
            )
        )
        streams = [_pb_parse(s) for s in sf.get(1, [])]
        encodings = [_pb_parse(e) for e in sf.get(2, [])]
        # cumulative stream offsets in listed order (index streams
        # occupy the first index_len bytes)
        pos = offset
        located: dict[tuple[int, int], bytes] = {}
        for s in streams:
            kind = _pb1(s, 1)
            col = _pb1(s, 2)
            ln = _pb1(s, 3)
            if kind not in (_S_ROW_INDEX, _S_BLOOM, _S_BLOOM_UTF8):
                located[(col, kind)] = buf[pos : pos + ln]
            pos += ln

        def stream(col: int, kind: int) -> bytes:
            raw = located.get((col, kind))
            return _decompress_stream(raw, compression) if raw is not None else b""

        for j, tid in enumerate(sub):
            kind = kinds[j]
            enc = _pb1(encodings[tid], 1, 0)
            present_raw = stream(tid, _S_PRESENT)
            present = (
                _bits_msb(_byte_rle(present_raw), n_rows)
                if present_raw
                else [True] * n_rows
            )
            n_vals = sum(present)
            data = stream(tid, _S_DATA)
            if kind in (_K_SHORT, _K_INT, _K_LONG, _K_DATE):
                vals = _rlev2(data, n_vals, signed=True)
            elif kind == _K_BYTE:
                raw = _byte_rle(data)
                vals = [v - 256 if v >= 128 else v for v in raw[:n_vals]]
            elif kind == _K_BOOLEAN:
                vals = _bits_msb(_byte_rle(data), n_vals)
            elif kind == _K_DOUBLE:
                vals = list(struct.unpack(f"<{n_vals}d", data[: 8 * n_vals]))
            elif kind == _K_FLOAT:
                vals = list(struct.unpack(f"<{n_vals}f", data[: 4 * n_vals]))
            elif kind in (_K_STRING, _K_BINARY, _K_VARCHAR, _K_CHAR):
                lengths_raw = stream(tid, _S_LENGTH)
                if enc in (1, 3):  # DICTIONARY / DICTIONARY_V2
                    dict_bytes = stream(tid, _S_DICT_DATA)
                    dict_n = _pb1(encodings[tid], 2, 0)
                    lens = _rlev2(lengths_raw, dict_n, signed=False)
                    entries = []
                    p = 0
                    for ln2 in lens:
                        entries.append(dict_bytes[p : p + ln2])
                        p += ln2
                    idx = _rlev2(data, n_vals, signed=False)
                    vals = [entries[i] for i in idx]
                else:  # DIRECT / DIRECT_V2
                    lens = _rlev2(lengths_raw, n_vals, signed=False)
                    vals = []
                    p = 0
                    for ln2 in lens:
                        vals.append(data[p : p + ln2])
                        p += ln2
                if kind != _K_BINARY:
                    vals = [v.decode("utf-8") for v in vals]
            else:
                raise NotImplementedError(f"ORC column kind {kind} not in scope")
            it = iter(vals)
            cols[j].extend(next(it) if p_ else None for p_ in present)
    return names, cols

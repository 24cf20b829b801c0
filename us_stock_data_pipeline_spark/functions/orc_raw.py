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


# --------------------------------------------------------------- writer
# The write side: emits spec-shaped ORC files — protobuf metadata,
# chunked-DEFLATE stream framing, byte-RLE booleans, RLEv2 integers
# (SHORT_REPEAT for short runs, DIRECT elsewhere, 512-value runs,
# closest-fixed-bits widths) — read back by pyarrow's C++ reader,
# Spark's Java reader, and this module's own read_orc.


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(fid: int, v: int) -> bytes:
    return _pb_varint(fid << 3) + _pb_varint(v)


def _pb_bytes(fid: int, b: bytes) -> bytes:
    return _pb_varint((fid << 3) | 2) + _pb_varint(len(b)) + b


def _compress_orc_stream(raw: bytes, compression: int) -> bytes:
    """Chunked stream framing: one chunk per 256 KiB window, stored
    uncompressed (is_original) when DEFLATE does not pay."""
    if compression == _COMP_NONE:
        return raw
    out = bytearray()
    for i in range(0, len(raw), 262144):
        chunk = raw[i : i + 262144]
        if compression == _COMP_ZLIB:
            comp = zlib.compress(chunk, 6)[2:-4]  # raw deflate
        else:
            from us_stock_data_pipeline_spark.functions.multimodal import (
                snappy_compress,
            )

            comp = snappy_compress(bytes(chunk))
        if len(comp) < len(chunk):
            h = len(comp) << 1
            out += bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + comp
        else:
            h = (len(chunk) << 1) | 1
            out += bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) + chunk
    return bytes(out)


def _byte_rle_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    lit_start = -1
    while i < n:
        j = i
        while j < n and j - i < 130 and data[j] == data[i]:
            j += 1
        run = j - i
        if run >= 3:
            if lit_start >= 0:
                seg = data[lit_start:i]
                out.append(256 - len(seg))
                out += seg
                lit_start = -1
            out.append(run - 3)
            out.append(data[i])
            i = j
        else:
            if lit_start < 0:
                lit_start = i
            i += 1
            if i - lit_start == 128:
                seg = data[lit_start:i]
                out.append(256 - len(seg))
                out += seg
                lit_start = -1
    if lit_start >= 0:
        seg = data[lit_start:n]
        out.append(256 - len(seg))
        out += seg
    return bytes(out)


def _bits_msb_pack(bits: list[bool]) -> bytes:
    out = bytearray((len(bits) + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            out[i >> 3] |= 0x80 >> (i & 7)
    return bytes(out)


_WIDTH_CODE = {w: w - 1 for w in range(1, 25)}
_WIDTH_CODE.update({26: 24, 28: 25, 30: 26, 32: 27, 40: 28, 48: 29, 56: 30, 64: 31})


class _BitWriterMSB:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, width: int) -> None:
        self.acc = (self.acc << width) | (v & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.buf)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _rlev2_encode(vals: list[int], signed: bool) -> bytes:
    """SHORT_REPEAT for runs of 3-10 equal values, DIRECT otherwise
    (512-value runs at the closest fixed width of the run's max) — a
    valid-by-construction subset of RLEv2's four modes."""
    out = bytearray()
    enc = [(_zigzag(v) if signed else v) for v in vals]
    i, n = 0, len(enc)
    while i < n:
        j = i
        while j < n and j - i < 10 and enc[j] == enc[i]:
            j += 1
        run = j - i
        if run >= 3:
            v = enc[i]
            width = max(1, (v.bit_length() + 7) // 8)
            out.append(((width - 1) << 3) | (run - 3))
            out += v.to_bytes(width, "big")
            i = j
            continue
        # DIRECT run: up to 512 values, stopping early at a long
        # equal-run boundary so the repeat encoder can take it
        k = i
        while k < n and k - i < 512:
            r = k
            while r < n and r - k < 10 and enc[r] == enc[k]:
                r += 1
            if r - k >= 3 and k > i:
                break
            k = r if r > k else k + 1
        seg = enc[i:k]
        width = _closest_fixed_bits(max(v.bit_length() for v in seg) or 1)
        bw = _BitWriterMSB()
        for v in seg:
            bw.write(v, width)
        code = _WIDTH_CODE[width]
        ln = len(seg) - 1
        out.append((0b01 << 6) | (code << 1) | (ln >> 8))
        out.append(ln & 0xFF)
        out += bw.done()
        i = k
    return bytes(out)


_WRITE_KINDS = {
    "long": _K_LONG,
    "int64": _K_LONG,
    "int": _K_INT,
    "int32": _K_INT,
    "double": _K_DOUBLE,
    "float": _K_FLOAT,
    "string": _K_STRING,
    "binary": _K_BINARY,
    "boolean": _K_BOOLEAN,
    "bool": _K_BOOLEAN,
}


def write_orc(
    names: list[str],
    types: list[str],
    columns: list[list],
    compression: str = "zlib",
    stripe_rows: int | None = None,
) -> bytes:
    """Serialize columns into a complete ORC file: 'ORC' header, one or
    more stripes (PRESENT byte-RLE bit-streams for nullable data, RLEv2
    integers, DIRECT_V2 strings, IEEE doubles/floats, byte-RLE
    booleans), per-stripe protobuf footers, file Footer + PostScript.
    Types: long/int/double/float/string/binary/boolean."""
    comp = {"none": _COMP_NONE, "zlib": _COMP_ZLIB, "snappy": _COMP_SNAPPY}[
        compression
    ]
    kinds = []
    for tp in types:
        if tp not in _WRITE_KINDS:
            raise NotImplementedError(f"ORC write type {tp!r} not in scope")
        kinds.append(_WRITE_KINDS[tp])
    n_rows = len(columns[0]) if columns else 0
    for nm, c in zip(names, columns):
        if len(c) != n_rows:
            raise ValueError(f"column {nm!r} length != {n_rows}")
    body = bytearray(b"ORC")
    stripes_info: list[bytes] = []
    step = stripe_rows if stripe_rows and stripe_rows > 0 else max(n_rows, 1)
    for start in range(0, max(n_rows, 1), step):
        stripe_n = min(step, n_rows - start) if n_rows else 0
        stream_meta: list[tuple[int, int, bytes]] = []  # (col, kind, raw)
        encodings: list[tuple[int, int]] = [(0, 0)]  # root: DIRECT
        for j, kind in enumerate(kinds):
            col = columns[j][start : start + step]
            cid = j + 1
            present = [v is not None for v in col]
            vals = [v for v in col if v is not None]
            if not all(present):
                stream_meta.append(
                    (
                        cid,
                        _S_PRESENT,
                        _byte_rle_encode(_bits_msb_pack(present)),
                    )
                )
            if kind in (_K_INT, _K_LONG):
                data = _rlev2_encode([int(v) for v in vals], signed=True)
                stream_meta.append((cid, _S_DATA, data))
                encodings.append((2, 0))  # DIRECT_V2
            elif kind == _K_DOUBLE:
                stream_meta.append(
                    (cid, _S_DATA, struct.pack(f"<{len(vals)}d", *vals))
                )
                encodings.append((0, 0))
            elif kind == _K_FLOAT:
                stream_meta.append(
                    (cid, _S_DATA, struct.pack(f"<{len(vals)}f", *vals))
                )
                encodings.append((0, 0))
            elif kind == _K_BOOLEAN:
                stream_meta.append(
                    (
                        cid,
                        _S_DATA,
                        _byte_rle_encode(_bits_msb_pack([bool(v) for v in vals])),
                    )
                )
                encodings.append((0, 0))
            else:  # string / binary: DIRECT_V2 data + lengths
                raw = bytearray()
                lens = []
                for v in vals:
                    bb = v.encode("utf-8") if isinstance(v, str) else bytes(v)
                    raw += bb
                    lens.append(len(bb))
                stream_meta.append((cid, _S_DATA, bytes(raw)))
                stream_meta.append(
                    (cid, _S_LENGTH, _rlev2_encode(lens, signed=False))
                )
                encodings.append((2, 0))  # DIRECT_V2
        stripe_offset = len(body)
        streams_pb = bytearray()
        data_len = 0
        for cid, skind, raw in stream_meta:
            framed = _compress_orc_stream(raw, comp)
            body += framed
            streams_pb += _pb_bytes(
                1,
                _pb_field(1, skind) + _pb_field(2, cid) + _pb_field(3, len(framed)),
            )
            data_len += len(framed)
        enc_pb = bytearray()
        for ekind, dsize in encodings:
            e = _pb_field(1, ekind)
            if dsize:
                e += _pb_field(2, dsize)
            enc_pb += _pb_bytes(2, e)
        sf_raw = bytes(streams_pb) + bytes(enc_pb)
        sf_framed = _compress_orc_stream(sf_raw, comp)
        body += sf_framed
        stripes_info.append(
            _pb_field(1, stripe_offset)
            + _pb_field(2, 0)  # indexLength: no row index
            + _pb_field(3, data_len)
            + _pb_field(4, len(sf_framed))
            + _pb_field(5, stripe_n)
        )
        if n_rows == 0:
            break
    # Footer: types (root struct + leaves), stripes, row count
    types_pb = bytearray()
    root = _pb_field(1, _K_STRUCT)
    for j in range(len(names)):
        root += _pb_field(2, j + 1)
    for nm in names:
        root += _pb_bytes(3, nm.encode("utf-8"))
    types_pb += _pb_bytes(4, root)
    for kind in kinds:
        types_pb += _pb_bytes(4, _pb_field(1, kind))
    footer_raw = (
        _pb_field(1, 3)  # headerLength ("ORC")
        + _pb_field(2, len(body))  # contentLength
        + b"".join(_pb_bytes(3, s) for s in stripes_info)
        + bytes(types_pb)
        + _pb_field(6, n_rows)
        + _pb_field(8, 0)  # rowIndexStride: none
    )
    footer_framed = _compress_orc_stream(footer_raw, comp)
    body += footer_framed
    ps = (
        _pb_field(1, len(footer_framed))
        + _pb_field(2, comp)
        + _pb_field(3, 262144)
        + _pb_bytes(4, _pb_varint(0) + _pb_varint(12))  # version 0.12 (packed)
        + _pb_field(5, 0)  # metadataLength
        + _pb_field(6, 9)  # writerVersion
        + _pb_bytes(8000, b"ORC")
    )
    body += ps
    body.append(len(ps))
    return bytes(body)

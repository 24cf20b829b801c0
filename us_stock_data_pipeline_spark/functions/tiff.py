"""REAL baseline TIFF codec, pure Python (round 13) — container and
all three Baseline-TIFF compressions, both byte orders, no external
libraries:

- Container: header (II/MM + magic 42), IFD walk (sorted tags, inline
  vs offset values, SHORT/LONG types), strip layout (StripOffsets /
  StripByteCounts / RowsPerStrip), grayscale (PhotometricInterpretation
  BlackIsZero, SamplesPerPixel 1) and RGB (SamplesPerPixel 3), 8 bits
  per sample.
- Compression 1 (none), 32773 (PackBits — validated against the
  public Apple/TIFF6 spec worked example), and 5 (LZW — the TIFF
  variant: MSB-first bit packing, Clear=256/EOI=257, EARLY code-width
  change at 510/1022/2046, table reset at 4094).
- Predictor 2 (horizontal differencing, per sample plane) for LZW
  strips.

`encode_tiff` emits spec-shaped files; `decode_tiff` parses any
combination of the above, raising the module-uniform ValueError on
truncated or out-of-scope input. TIFF's compressions are lossless, so
query oracles can enumerate expected pixels in closed form and check
decoded channel sums bit-exactly (the same scheme as the GIF/PNG/JPEG
rungs of the multimodal ladder).

Format references: the public TIFF 6.0 specification (Adobe, 1992) —
§7 PackBits pseudo-code and worked example, §13 LZW (including the
early-change note), §8 baseline fields. Reference-repo scope note: the
reference (sanantachat/us-stock-data-pipeline) has no media surface;
this extends SURVEY.md §2D's multimodal ladder with the dominant
scanned-document format in web crawls.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------- PackBits


def packbits_compress(data: bytes) -> bytes:
    """TIFF 6.0 §7 PackBits: literal runs (n-1 for n bytes, header
    0..127) and replicate runs (257-n header 129..255 for n repeats,
    n >= 2); 128 is a no-op never emitted. Greedy: replicate runs of
    >= 3 (or >= 2 when not breaking a literal), max run 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = -1
    while i < n:
        j = i
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        run = j - i
        # a 2-byte run inside literals is cheaper kept literal
        if run >= 3 or (run >= 2 and lit_start < 0):
            if lit_start >= 0:
                seg = data[lit_start:i]
                out.append(len(seg) - 1)
                out += seg
                lit_start = -1
            out.append(257 - run)
            out.append(data[i])
            i = j
        else:
            if lit_start < 0:
                lit_start = i
            i += 1
            if i - lit_start == 128:
                seg = data[lit_start:i]
                out.append(len(seg) - 1)
                out += seg
                lit_start = -1
    if lit_start >= 0:
        seg = data[lit_start:n]
        out.append(len(seg) - 1)
        out += seg
    return bytes(out)


def packbits_decompress(data: bytes, expected: int | None = None) -> bytes:
    """Inverse of §7's pseudo-code: n in 0..127 -> copy n+1 literal
    bytes; n in 129..255 -> repeat next byte 257-n times; 128 -> skip."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            if i + h + 1 > n:
                raise ValueError("truncated PackBits literal run")
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            if i >= n:
                raise ValueError("truncated PackBits replicate run")
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op
    if expected is not None and len(out) != expected:
        raise ValueError("PackBits output size mismatch")
    return bytes(out)


# ------------------------------------------------------------- TIFF LZW
# MSB-first variable-width codes; differs from GIF LZW (LSB-first) in
# bit order AND in the "early change": the code width grows when the
# NEXT free entry is 2^w - 1 (510/1022/2046), one code earlier than
# the naive scheme.

_LZW_CLEAR = 256
_LZW_EOI = 257


class _MSBBitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def done(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.buf)


def tiff_lzw_compress(data: bytes) -> bytes:
    """TIFF 6.0 §13 encoder: emit Clear, then standard LZW with the
    string table rebuilt at 4094 entries; code width grows when the
    next code to be assigned reaches 2^w - 1 (early change)."""
    w = _MSBBitWriter()
    width = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    w.write(_LZW_CLEAR, width)
    omega = b""
    for k in data:
        cand = omega + bytes([k])
        if cand in table:
            omega = cand
            continue
        w.write(table[omega], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        omega = bytes([k])
        if next_code >= 4094:
            w.write(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
    if omega:
        w.write(table[omega], width)
    w.write(_LZW_EOI, width)
    return w.done()


def tiff_lzw_decompress(data: bytes, expected: int | None = None) -> bytes:
    """§13 decoder: MSB-first codes, Clear/EOI, KwKwK, early width
    change after adding the entry that makes the next free code
    2^w - 1."""
    out = bytearray()
    pos_bits = 0
    total_bits = len(data) * 8
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal pos_bits
        if pos_bits + width > total_bits:
            raise ValueError("truncated TIFF LZW stream")
        byte0 = pos_bits // 8
        nbytes = (pos_bits % 8 + width + 7) // 8
        chunk = int.from_bytes(data[byte0 : byte0 + nbytes], "big")
        shift = nbytes * 8 - (pos_bits % 8) - width
        pos_bits += width
        return (chunk >> shift) & ((1 << width) - 1)

    while True:
        code = read_code()
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= 256:
                raise ValueError("invalid first TIFF LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError("TIFF LZW code out of range")
        out += entry
        prev = entry
        # early change: the decoder's table runs ONE entry behind the
        # encoder's, so it must grow when the table reaches 2^w - 2
        # (510/1022/2046) — growing at 2^w - 1 would desync exactly one
        # code after each boundary
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
        if expected is not None and len(out) >= expected:
            break
    if expected is not None and len(out) != expected:
        raise ValueError("TIFF LZW output size mismatch")
    return bytes(out)


# ------------------------------------------------------------ predictor


def _predictor_apply(rows: np.ndarray) -> np.ndarray:
    """Predictor 2 (horizontal differencing) per §14: each sample
    stores the delta to the previous pixel's SAME sample, mod 256.
    rows: (h, w, spp) uint8."""
    d = rows.astype(np.int16)
    d[:, 1:, :] -= rows[:, :-1, :].astype(np.int16)
    return (d % 256).astype(np.uint8)


def _predictor_undo(rows: np.ndarray) -> np.ndarray:
    return np.cumsum(rows.astype(np.int64), axis=1).astype(np.uint8)


# ------------------------------------------------------------ container

_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PREDICTOR = 317

_TYPE_SHORT = 3
_TYPE_LONG = 4


def encode_tiff(
    pixels: np.ndarray,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Emit a spec-shaped baseline TIFF: header, pixel strips (optionally
    PackBits- or LZW-compressed, optionally predictor-2 differenced),
    then one IFD with ascending tags; values >4 bytes go to an offset
    area after the IFD. pixels: (h, w) uint8 gray or (h, w, 3) uint8
    RGB."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, spp = pixels.shape
    if spp not in (1, 3):
        raise ValueError("SamplesPerPixel must be 1 or 3")
    if compression not in (1, 5, 32773):
        raise ValueError("compression must be 1, 5 (LZW) or 32773 (PackBits)")
    if predictor not in (1, 2):
        raise ValueError("predictor must be 1 or 2")
    if predictor == 2 and compression == 1:
        raise ValueError("predictor 2 requires a compression scheme")
    rps = rows_per_strip or h
    bo = ">" if big_endian else "<"
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        seg = pixels[y0 : y0 + rps]
        if predictor == 2:
            seg = _predictor_apply(seg)
        raw = seg.tobytes()
        if compression == 5:
            strips.append(tiff_lzw_compress(raw))
        elif compression == 32773:
            # §7: each ROW is compressed separately
            rows = [
                packbits_compress(seg[r].tobytes()) for r in range(seg.shape[0])
            ]
            strips.append(b"".join(rows))
        else:
            strips.append(raw)
    # layout: header(8) + strips + IFD + offset-area
    header = struct.pack(f"{bo}2sHI", b"MM" if big_endian else b"II", 42, 0)
    strip_offsets: list[int] = []
    pos = 8
    body = bytearray()
    for s in strips:
        strip_offsets.append(pos)
        body += s
        pos += len(s)
    ifd_offset = pos
    header = struct.pack(
        f"{bo}2sHI", b"MM" if big_endian else b"II", 42, ifd_offset
    )

    entries: list[tuple[int, int, int, object]] = [
        (_T_WIDTH, _TYPE_LONG, 1, w),
        (_T_LENGTH, _TYPE_LONG, 1, h),
        (_T_BITS, _TYPE_SHORT, spp, [8] * spp),
        (_T_COMPRESSION, _TYPE_SHORT, 1, compression),
        (_T_PHOTOMETRIC, _TYPE_SHORT, 1, 1 if spp == 1 else 2),
        (_T_STRIP_OFFSETS, _TYPE_LONG, len(strips), strip_offsets),
        (_T_SPP, _TYPE_SHORT, 1, spp),
        (_T_ROWS_PER_STRIP, _TYPE_LONG, 1, rps),
        (_T_STRIP_COUNTS, _TYPE_LONG, len(strips), [len(s) for s in strips]),
    ]
    if predictor == 2:
        entries.append((_T_PREDICTOR, _TYPE_SHORT, 1, 2))
    entries.sort()
    ifd = bytearray(struct.pack(f"{bo}H", len(entries)))
    extra = bytearray()
    extra_base = ifd_offset + 2 + 12 * len(entries) + 4
    for tag, typ, count, val in entries:
        vals = val if isinstance(val, list) else [val]
        fmt = "H" if typ == _TYPE_SHORT else "I"
        unit = 2 if typ == _TYPE_SHORT else 4
        packed = struct.pack(f"{bo}{len(vals)}{fmt}", *vals)
        if len(packed) <= 4:
            field = packed + b"\x00" * (4 - len(packed))
        else:
            field = struct.pack(f"{bo}I", extra_base + len(extra))
            extra += packed
            if len(extra) % 2:  # values must start on word boundaries
                extra += b"\x00"
        ifd += struct.pack(f"{bo}HHI", tag, typ, count) + field
        del unit
    ifd += struct.pack(f"{bo}I", 0)  # next-IFD pointer: none
    return header + bytes(body) + bytes(ifd) + bytes(extra)


def decode_tiff(payload: bytes) -> np.ndarray:
    """Parse a baseline TIFF (either byte order): IFD walk, strip
    reassembly, PackBits/LZW decompression, predictor-2 undo. Returns
    (h, w) uint8 for grayscale or (h, w, 3) uint8 for RGB."""
    if len(payload) < 8:
        raise ValueError("truncated TIFF payload")
    if payload[:2] == b"II":
        bo = "<"
    elif payload[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF payload")
    magic, ifd_offset = struct.unpack(f"{bo}HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF payload (bad magic)")

    def read_ifd(off: int) -> dict[int, list[int]]:
        if off + 2 > len(payload):
            raise ValueError("truncated TIFF IFD")
        (n,) = struct.unpack_from(f"{bo}H", payload, off)
        if off + 2 + 12 * n + 4 > len(payload):
            raise ValueError("truncated TIFF IFD")
        tags: dict[int, list[int]] = {}
        for i in range(n):
            tag, typ, count = struct.unpack_from(
                f"{bo}HHI", payload, off + 2 + 12 * i
            )
            fpos = off + 2 + 12 * i + 8
            if typ == _TYPE_SHORT:
                unit, fmt = 2, "H"
            elif typ == _TYPE_LONG:
                unit, fmt = 4, "I"
            elif typ == 1:  # BYTE
                unit, fmt = 1, "B"
            else:
                continue  # RATIONAL/ASCII/etc: not needed for baseline decode
            size = unit * count
            src = fpos
            if size > 4:
                (src,) = struct.unpack_from(f"{bo}I", payload, fpos)
            if src + size > len(payload):
                raise ValueError("truncated TIFF tag value")
            tags[tag] = list(struct.unpack_from(f"{bo}{count}{fmt}", payload, src))
        return tags

    tags = read_ifd(ifd_offset)
    try:
        w = tags[_T_WIDTH][0]
        h = tags[_T_LENGTH][0]
        offsets = tags[_T_STRIP_OFFSETS]
        counts = tags[_T_STRIP_COUNTS]
    except KeyError as e:
        raise ValueError(f"TIFF missing required tag {e}") from None
    spp = tags.get(_T_SPP, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    comp = tags.get(_T_COMPRESSION, [1])[0]
    pred = tags.get(_T_PREDICTOR, [1])[0]
    rps = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise ValueError("only 8-bit gray/RGB baseline TIFF in scope")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(f"TIFF compression {comp} not in scope")
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} not in scope")
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    out = np.zeros((h, w, spp), dtype=np.uint8)
    row = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            raise ValueError("truncated TIFF strip")
        seg_rows = min(rps, h - row)
        raw_len = seg_rows * w * spp
        blob = payload[off : off + cnt]
        if comp == 5:
            raw = tiff_lzw_decompress(blob, expected=raw_len)
        elif comp == 32773:
            raw = packbits_decompress(blob, expected=raw_len)
        else:
            raw = blob
            if len(raw) < raw_len:
                raise ValueError("short uncompressed TIFF strip")
            raw = raw[:raw_len]
        seg = np.frombuffer(raw, dtype=np.uint8).reshape(seg_rows, w, spp)
        if pred == 2:
            seg = _predictor_undo(seg)
        out[row : row + seg_rows] = seg
        row += seg_rows
    if row != h:
        raise ValueError("TIFF strips cover fewer rows than ImageLength")
    return out[:, :, 0] if spp == 1 else out

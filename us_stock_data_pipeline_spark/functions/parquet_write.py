"""REAL parquet page WRITER, pure Python (round 13).

The write-side twin of `parquet_raw.py`'s reader: emits a complete
parquet file from raw Python values — Thrift COMPACT-protocol metadata
(FileMetaData / SchemaElement / RowGroup / ColumnChunk / ColumnMetaData
/ PageHeader), v1 data pages with PLAIN values and RLE/bit-packed
definition levels, min/max column statistics, and per-page compression
via the in-repo SNAPPY and LZ4 block compressors (both proven
byte-interoperable with the Java codecs, tests/test_snappy.py /
test_lz4.py) or stdlib GZIP — no pyarrow, no JVM.

Like the reader, this is a correctness witness, not the production
write path (Spark's vectorized JVM writer owns that): the value is that
files THIS module writes are read back bit-identically by pyarrow, by
Spark's JVM reader, AND by the in-repo `parquet_raw.read_column` — a
three-way interop proof that the engine's byte-level understanding of
its own storage format runs in both directions. Scope: flat schemas,
INT32 / INT64 / DOUBLE / BYTE_ARRAY(UTF8) leaves, required or optional
repetition, multiple row groups (`row_group_rows`), PLAIN or
DICTIONARY encoding (`use_dictionary`: PLAIN_DICTIONARY dict page +
RLE/bit-packed index pages — the layout Spark's own writer defaults
to — with parquet-mr's fallback to PLAIN when cardinality stops
paying), DATA PAGE V1 or V2 (`page_version=2`: levels uncompressed
and un-prefixed ahead of the separately-compressed values section,
per-page num_nulls, RLE_DICTIONARY data-page encoding),
UNCOMPRESSED / SNAPPY / GZIP / LZ4_RAW codecs.

Format references: parquet-format/src/main/thrift/parquet.thrift,
Encodings.md, Compression.md (public Apache specs).
"""

from __future__ import annotations

import struct

from us_stock_data_pipeline_spark.functions.multimodal import (
    lz4_block_compress,
    snappy_compress,
)

# thrift compact type ids (write side)
_CT_TRUE = 1
_CT_FALSE = 2
_CT_I32 = 5
_CT_I64 = 6
_CT_BINARY = 8
_CT_LIST = 9
_CT_STRUCT = 12


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> bytes:
    return _varint((v << 1) ^ (v >> 63)) if v < 0 else _varint(v << 1)


class _Writer:
    """Thrift compact struct writer: fields must be appended in
    ascending field-id order (the short-form delta encoding relies on
    it, and every parquet implementation writes them that way)."""

    def __init__(self):
        self.buf = bytearray()
        self.last_fid = 0

    def _field(self, fid: int, ctype: int) -> None:
        delta = fid - self.last_fid
        if 0 < delta <= 15:
            self.buf.append((delta << 4) | ctype)
        else:
            self.buf.append(ctype)
            self.buf += _zigzag(fid)
        self.last_fid = fid

    def field_bool(self, fid: int, v: bool) -> None:
        self._field(fid, _CT_TRUE if v else _CT_FALSE)

    def field_i32(self, fid: int, v: int) -> None:
        self._field(fid, _CT_I32)
        self.buf += _zigzag(v)

    def field_i64(self, fid: int, v: int) -> None:
        self._field(fid, _CT_I64)
        self.buf += _zigzag(v)

    def field_binary(self, fid: int, v: bytes) -> None:
        self._field(fid, _CT_BINARY)
        self.buf += _varint(len(v))
        self.buf += v

    def field_list(self, fid: int, etype: int, items: list[bytes]) -> None:
        self._field(fid, _CT_LIST)
        if len(items) < 15:
            self.buf.append((len(items) << 4) | etype)
        else:
            self.buf.append(0xF0 | etype)
            self.buf += _varint(len(items))
        for it in items:
            self.buf += it

    def field_struct(self, fid: int, body: bytes) -> None:
        self._field(fid, _CT_STRUCT)
        self.buf += body

    def done(self) -> bytes:
        return bytes(self.buf) + b"\x00"  # STOP


def _i32_item(v: int) -> bytes:
    return _zigzag(v)


def _binary_item(v: bytes) -> bytes:
    return _varint(len(v)) + v


# parquet physical types / codecs (parquet.thrift enums)
PQ_INT32, PQ_INT64, PQ_DOUBLE, PQ_BYTE_ARRAY = 1, 2, 5, 6
CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP, CODEC_LZ4_RAW = 0, 1, 2, 7
_CONVERTED_UTF8 = 0  # ConvertedType.UTF8


def _compress(data: bytes, codec: int) -> bytes:
    if codec == CODEC_UNCOMPRESSED:
        return data
    if codec == CODEC_SNAPPY:
        return snappy_compress(data)
    if codec == CODEC_GZIP:
        import zlib

        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        return co.compress(data) + co.flush()
    if codec == CODEC_LZ4_RAW:
        return lz4_block_compress(data)
    raise NotImplementedError(f"parquet write codec {codec} not in scope")


def _plain_encode(vals: list, ptype: int) -> bytes:
    if ptype == PQ_INT32:
        return struct.pack(f"<{len(vals)}i", *vals)
    if ptype == PQ_INT64:
        return struct.pack(f"<{len(vals)}q", *vals)
    if ptype == PQ_DOUBLE:
        return struct.pack(f"<{len(vals)}d", *vals)
    if ptype == PQ_BYTE_ARRAY:
        out = bytearray()
        for v in vals:
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            out += struct.pack("<I", len(b)) + b
        return bytes(out)
    raise NotImplementedError(f"parquet write physical type {ptype} not in scope")


def _rle_def_levels(defs: list[int]) -> bytes:
    """Definition levels as ONE RLE/bit-packed hybrid stream, bit width 1
    (flat optional column). Runs of equal bits become RLE runs — the
    exact shape parquet-mr emits for mostly-non-null data."""
    out = bytearray()
    i, n = 0, len(defs)
    while i < n:
        j = i
        while j < n and defs[j] == defs[i]:
            j += 1
        run = j - i
        out += _varint(run << 1)  # LSB 0 -> RLE run
        out.append(defs[i])  # bit width 1 -> ceil(1/8)=1 value byte
        i = j
    return bytes(out)


def _rle_bp_write(values: list[int], bit_width: int) -> bytes:
    """General RLE/bit-packed hybrid writer (dictionary indices):
    greedy — equal-value runs of >=8 become RLE runs; everything else
    accumulates into bit-packed groups of 8 (only the FINAL group may
    be zero-padded, per Encodings.md: mid-stream padding would shift
    every later value)."""
    out = bytearray()
    nbytes = (bit_width + 7) // 8
    pending: list[int] = []

    def flush_pending() -> None:
        if not pending:
            return
        n_groups = (len(pending) + 7) // 8
        padded = pending + [0] * (n_groups * 8 - len(pending))
        out.extend(_varint((n_groups << 1) | 1))
        acc = 0
        for k, v in enumerate(padded):
            acc |= (v & ((1 << bit_width) - 1)) << (k * bit_width)
        out.extend(acc.to_bytes((n_groups * 8 * bit_width + 7) // 8, "little"))
        pending.clear()

    i, n = 0, len(values)
    while i < n:
        j = i
        while j < n and values[j] == values[i]:
            j += 1
        run = j - i
        # an RLE run can only start when pending is empty (the packed
        # group before it must be complete); top pending up to a
        # multiple of 8 from the run's head first
        if run >= 8 and pending and len(pending) % 8:
            take = min(8 - len(pending) % 8, run)
            pending.extend([values[i]] * take)
            i += take
            run -= take
        if run == 0:
            continue  # the top-up consumed the whole run
        if run >= 8 and len(pending) % 8 == 0:
            flush_pending()
            out.extend(_varint(run << 1))
            out.extend((values[i] & ((1 << max(bit_width, 1)) - 1)).to_bytes(nbytes, "little"))
        else:
            pending.extend([values[i]] * run)
        i += run
    flush_pending()
    return bytes(out)


def _stats(vals: list, ptype: int, n_nulls: int) -> bytes:
    """Statistics struct: min_value/max_value (fields 5/6, the modern
    pair readers trust) + null_count (field 3), PLAIN-encoded."""
    w = _Writer()
    present = [v for v in vals if v is not None]
    w.field_i64(3, n_nulls)
    if present:
        if ptype == PQ_BYTE_ARRAY:
            enc = [
                v.encode("utf-8") if isinstance(v, str) else bytes(v)
                for v in present
            ]
            mx, mn = max(enc), min(enc)
        else:
            mx, mn = max(present), min(present)
            mx = _plain_encode([mx], ptype)
            mn = _plain_encode([mn], ptype)
        if ptype == PQ_BYTE_ARRAY:
            w.field_binary(5, mx)
            w.field_binary(6, mn)
        else:
            w.field_binary(5, mx)
            w.field_binary(6, mn)
    return w.done()


def _write_chunk(
    body: bytearray,
    name: str,
    ptype: int,
    optional: bool,
    vals: list,
    codec: int,
    page_rows: int,
    use_dict: bool,
    page_version: int = 1,
) -> bytes:
    """Write one column chunk (optionally dictionary-encoded) at the
    current end of `body`; returns the serialized ColumnChunk struct."""
    n_rows = len(vals)
    first_page_offset = len(body)
    dict_page_offset = None
    chunk_comp = chunk_uncomp = 0
    encodings = [0, 3]  # PLAIN, RLE (levels)
    dictionary: dict | None = None
    if use_dict:
        uniq = []
        index_of: dict = {}
        for v in vals:
            if v is None:
                continue
            if v not in index_of:
                index_of[v] = len(uniq)
                uniq.append(v)
        # parquet-mr falls back to PLAIN when the dictionary stops
        # paying; mirror that with a simple cardinality cut
        if uniq and len(uniq) <= max(1, len(vals) // 2):
            dictionary = index_of
            dict_page_offset = len(body)
            raw = _plain_encode(uniq, ptype)
            comp = _compress(raw, codec)
            ph = _Writer()
            ph.field_i32(1, 2)  # PageType.DICTIONARY_PAGE
            ph.field_i32(2, len(raw))
            ph.field_i32(3, len(comp))
            dph = _Writer()
            dph.field_i32(1, len(uniq))
            dph.field_i32(2, 2)  # Encoding.PLAIN_DICTIONARY
            ph.field_struct(7, dph.done())
            hdr = ph.done()
            body += hdr
            body += comp
            chunk_comp += len(hdr) + len(comp)
            chunk_uncomp += len(hdr) + len(raw)
            encodings = [2 if page_version == 1 else 8, 3]  # *_DICTIONARY, RLE
            first_page_offset = len(body)
    for start in range(0, max(n_rows, 1), page_rows):
        page_vals = vals[start : start + page_rows]
        if not page_vals and n_rows:
            break
        defs = [0 if v is None else 1 for v in page_vals]
        present = [v for v in page_vals if v is not None]
        if not optional and any(d == 0 for d in defs):
            raise ValueError(f"nulls in required column {name!r}")
        values = bytearray()
        if dictionary is not None:
            # minimum width 1: a width-0 stream has no tokens at all,
            # which readers reject (they expect at least one RLE header)
            bw = max(max(len(dictionary) - 1, 0).bit_length(), 1)
            values.append(bw)
            values += _rle_bp_write([dictionary[v] for v in present], bw)
            enc = 2 if page_version == 1 else 8  # PLAIN_/RLE_DICTIONARY
        else:
            values += _plain_encode(present, ptype)
            enc = 0  # PLAIN
        if page_version == 2:
            # v2 layout: def levels UNCOMPRESSED and un-prefixed ahead
            # of the (separately compressed) values section
            lv = _rle_def_levels(defs) if optional else b""
            comp_vals = _compress(bytes(values), codec)
            raw_len = len(lv) + len(values)
            comp_len = len(lv) + len(comp_vals)
            ph = _Writer()
            ph.field_i32(1, 3)  # PageType.DATA_PAGE_V2
            ph.field_i32(2, raw_len)
            ph.field_i32(3, comp_len)
            dph = _Writer()
            dph.field_i32(1, len(page_vals))
            dph.field_i32(2, len(page_vals) - len(present))  # num_nulls
            dph.field_i32(3, len(page_vals))  # num_rows (flat schema)
            dph.field_i32(4, enc)
            dph.field_i32(5, len(lv))
            dph.field_i32(6, 0)  # no repetition levels (flat)
            if codec == CODEC_UNCOMPRESSED:
                dph.field_bool(7, False)  # is_compressed
            ph.field_struct(8, dph.done())
            header_bytes = ph.done()
            body += header_bytes
            body += lv
            body += comp_vals
            chunk_comp += len(header_bytes) + comp_len
            chunk_uncomp += len(header_bytes) + raw_len
            if n_rows == 0:
                break
            continue
        else:
            payload = bytearray()
            if optional:
                lv = _rle_def_levels(defs)
                payload += struct.pack("<I", len(lv)) + lv  # v1: length prefix
            payload += values
            raw = bytes(payload)
            comp = _compress(raw, codec)
            ph = _Writer()
            ph.field_i32(1, 0)  # PageType.DATA_PAGE
            ph.field_i32(2, len(raw))
            ph.field_i32(3, len(comp))
            dph = _Writer()
            dph.field_i32(1, len(page_vals))
            dph.field_i32(2, enc)
            dph.field_i32(3, 3)  # def levels: Encoding.RLE
            dph.field_i32(4, 3)  # rep levels: Encoding.RLE (absent, flat)
            ph.field_struct(5, dph.done())
            header_bytes = ph.done()
            body += header_bytes
            body += comp
        # chunk totals INCLUDE the page-header bytes (parquet.thrift:
        # "total byte size of all compressed pages ... including the
        # headers") — readers bound the chunk stream by them
        chunk_comp += len(header_bytes) + len(comp)
        chunk_uncomp += len(header_bytes) + len(raw)
        if n_rows == 0:
            break
    cm = _Writer()
    cm.field_i32(1, ptype)
    cm.field_list(2, _CT_I32, [_i32_item(e) for e in encodings])
    cm.field_list(3, _CT_BINARY, [_binary_item(name.encode("utf-8"))])
    cm.field_i32(4, codec)
    cm.field_i64(5, n_rows)
    cm.field_i64(6, chunk_uncomp)
    cm.field_i64(7, chunk_comp)
    cm.field_i64(9, first_page_offset)
    if dict_page_offset is not None:
        cm.field_i64(11, dict_page_offset)
    cm.field_struct(12, _stats(vals, ptype, sum(1 for v in vals if v is None)))
    cc = _Writer()
    cc.field_i64(2, dict_page_offset if dict_page_offset is not None else first_page_offset)
    cc.field_struct(3, cm.done())
    return cc.done()


def _list_entries(rows: list, col_optional: bool, elem_optional: bool):
    """Per-row Dremel (rep, def, value) entries for a 3-level LIST
    column: None row -> (0, 0); empty list -> (0, cumdef(col)); else one
    entry per element, rep 0 for the first and 1 after, def = max_def
    when the element is present."""
    base = 1 if col_optional else 0
    d_empty = base  # repeated node absent
    d_null_elem = base + 1  # repeated defined, element null
    max_def = base + 1 + (1 if elem_optional else 0)
    out: list[list[tuple[int, int, object]]] = []
    for row in rows:
        if row is None:
            if not col_optional:
                raise ValueError("null row in required list column")
            out.append([(0, 0, None)])
        elif len(row) == 0:
            out.append([(0, d_empty, None)])
        else:
            ents = []
            for i, e in enumerate(row):
                r = 0 if i == 0 else 1
                if e is None:
                    if not elem_optional:
                        raise ValueError("null element in required-element list")
                    ents.append((r, d_null_elem, None))
                else:
                    ents.append((r, max_def, e))
            out.append(ents)
    return out, max_def


def _write_list_chunk(
    body: bytearray,
    name: str,
    elem_ptype: int,
    col_optional: bool,
    elem_optional: bool,
    rows: list,
    codec: int,
    page_rows: int,
    use_dict: bool,
    page_version: int = 1,
) -> bytes:
    """Write one LIST column chunk (3-level encoding: optional group
    (LIST) -> repeated group "list" -> element): repetition levels at
    bit width 1, definition levels at their true width, one leaf entry
    per element (num_values counts ENTRIES, not rows). Pages split on
    ROW boundaries so records never straddle pages (required for v2,
    simplest for v1). Statistics are omitted for nested leaves."""
    row_entries, max_def = _list_entries(rows, col_optional, elem_optional)
    def_bw = max_def.bit_length()
    n_rows = len(rows)
    n_entries = sum(len(e) for e in row_entries)
    first_page_offset = len(body)
    dict_page_offset = None
    chunk_comp = chunk_uncomp = 0
    encodings = [0, 3]  # PLAIN, RLE (levels)
    dictionary: dict | None = None
    if use_dict:
        uniq: list = []
        index_of: dict = {}
        for ents in row_entries:
            for _r, d, v in ents:
                if d == max_def and v not in index_of:
                    index_of[v] = len(uniq)
                    uniq.append(v)
        if uniq and len(uniq) <= max(1, n_entries // 2):
            dictionary = index_of
            dict_page_offset = len(body)
            raw = _plain_encode(uniq, elem_ptype)
            comp = _compress(raw, codec)
            ph = _Writer()
            ph.field_i32(1, 2)  # PageType.DICTIONARY_PAGE
            ph.field_i32(2, len(raw))
            ph.field_i32(3, len(comp))
            dph = _Writer()
            dph.field_i32(1, len(uniq))
            dph.field_i32(2, 2)  # Encoding.PLAIN_DICTIONARY
            ph.field_struct(7, dph.done())
            hdr = ph.done()
            body += hdr
            body += comp
            chunk_comp += len(hdr) + len(comp)
            chunk_uncomp += len(hdr) + len(raw)
            encodings = [2 if page_version == 1 else 8, 3]
            first_page_offset = len(body)
    for start in range(0, max(n_rows, 1), page_rows):
        page = row_entries[start : start + page_rows]
        ents = [t for row in page for t in row]
        reps = [r for r, _d, _v in ents]
        defs = [d for _r, d, _v in ents]
        present = [v for _r, d, v in ents if d == max_def]
        values = bytearray()
        if dictionary is not None:
            bw = max(max(len(dictionary) - 1, 0).bit_length(), 1)
            values.append(bw)
            values += _rle_bp_write([dictionary[v] for v in present], bw)
            enc = 2 if page_version == 1 else 8
        else:
            values += _plain_encode(present, elem_ptype)
            enc = 0
        rl = _rle_bp_write(reps, 1)
        dl = _rle_bp_write(defs, def_bw)
        if page_version == 2:
            comp_vals = _compress(bytes(values), codec)
            raw_len = len(rl) + len(dl) + len(values)
            comp_len = len(rl) + len(dl) + len(comp_vals)
            ph = _Writer()
            ph.field_i32(1, 3)  # PageType.DATA_PAGE_V2
            ph.field_i32(2, raw_len)
            ph.field_i32(3, comp_len)
            dph = _Writer()
            dph.field_i32(1, len(ents))
            dph.field_i32(2, len(ents) - len(present))  # num_nulls
            dph.field_i32(3, len(page))  # num_rows
            dph.field_i32(4, enc)
            dph.field_i32(5, len(dl))
            dph.field_i32(6, len(rl))
            if codec == CODEC_UNCOMPRESSED:
                dph.field_bool(7, False)
            ph.field_struct(8, dph.done())
            hdr = ph.done()
            body += hdr
            body += rl
            body += dl
            body += comp_vals
            chunk_comp += len(hdr) + comp_len
            chunk_uncomp += len(hdr) + raw_len
        else:
            payload = bytearray()
            # v1 levels: repetition FIRST, each with a 4-byte length
            # prefix, compressed together with the values
            payload += struct.pack("<I", len(rl)) + rl
            payload += struct.pack("<I", len(dl)) + dl
            payload += values
            raw = bytes(payload)
            comp = _compress(raw, codec)
            ph = _Writer()
            ph.field_i32(1, 0)  # PageType.DATA_PAGE
            ph.field_i32(2, len(raw))
            ph.field_i32(3, len(comp))
            dph = _Writer()
            dph.field_i32(1, len(ents))
            dph.field_i32(2, enc)
            dph.field_i32(3, 3)  # def levels: Encoding.RLE
            dph.field_i32(4, 3)  # rep levels: Encoding.RLE
            ph.field_struct(5, dph.done())
            hdr = ph.done()
            body += hdr
            body += comp
            chunk_comp += len(hdr) + len(comp)
            chunk_uncomp += len(hdr) + len(raw)
        if n_rows == 0:
            break
    cm = _Writer()
    cm.field_i32(1, elem_ptype)
    cm.field_list(2, _CT_I32, [_i32_item(e) for e in encodings])
    cm.field_list(
        3,
        _CT_BINARY,
        [
            _binary_item(name.encode("utf-8")),
            _binary_item(b"list"),
            _binary_item(b"element"),
        ],
    )
    cm.field_i32(4, codec)
    cm.field_i64(5, n_entries)
    cm.field_i64(6, chunk_uncomp)
    cm.field_i64(7, chunk_comp)
    cm.field_i64(9, first_page_offset)
    if dict_page_offset is not None:
        cm.field_i64(11, dict_page_offset)
    cc = _Writer()
    cc.field_i64(
        2, dict_page_offset if dict_page_offset is not None else first_page_offset
    )
    cc.field_struct(3, cm.done())
    return cc.done()


def list_type(elem_ptype: int, elem_optional: bool = True) -> tuple:
    """Type spec for a LIST column in `write_parquet`'s column list:
    values are Python lists (None row = null list, None element = null
    element when `elem_optional`)."""
    return ("list", elem_ptype, elem_optional)


def write_parquet(
    columns: list[tuple[str, int, bool, list]],
    codec: int = CODEC_SNAPPY,
    page_rows: int = 1024,
    row_group_rows: int | None = None,
    use_dictionary: bool | set[str] = False,
    page_version: int = 1,
    created_by: str = "us-stock-data-pipeline-spark parquet_write",
) -> bytes:
    """Serialize `columns` = [(name, physical_type, optional, values)]
    (all value lists the same length; None marks a null in optional
    columns) into one complete parquet file: PAR1 magic, per-column v1
    data pages (`page_rows` rows per page, RLE def levels), PLAIN or —
    when `use_dictionary` is True or names the column — dictionary
    encoding (PLAIN_DICTIONARY dict page + RLE/bit-packed indices, the
    layout Spark's own writer defaults to, with parquet-mr's fallback
    to PLAIN when cardinality stops paying), `row_group_rows`-sized row
    groups (default: one), thrift-compact footer with min/max
    statistics and declared column orders. `page_version=2` emits
    DATA_PAGE_V2 pages (def levels uncompressed and un-prefixed ahead
    of the separately-compressed values section, per-page num_nulls,
    is_compressed honored — pyarrow's `data_page_version='2.0'`
    layout)."""
    if page_version not in (1, 2):
        raise ValueError("page_version must be 1 or 2")
    n_rows = len(columns[0][3]) if columns else 0
    for name, _t, _o, vals in columns:
        if len(vals) != n_rows:
            raise ValueError(f"column {name!r} length != {n_rows}")
    rg_rows = row_group_rows if row_group_rows and row_group_rows > 0 else max(n_rows, 1)
    body = bytearray(b"PAR1")
    rg_structs: list[bytes] = []
    for rg_start in range(0, max(n_rows, 1), rg_rows):
        chunk_metas: list[bytes] = []
        total_bytes = 0
        rg_n = min(rg_rows, n_rows - rg_start) if n_rows else 0
        for name, ptype, optional, vals in columns:
            use_dict = (
                use_dictionary is True
                or (isinstance(use_dictionary, set) and name in use_dictionary)
            )
            before = len(body)
            if isinstance(ptype, tuple) and ptype[0] == "list":
                chunk_metas.append(
                    _write_list_chunk(
                        body,
                        name,
                        ptype[1],
                        optional,
                        ptype[2],
                        vals[rg_start : rg_start + rg_rows],
                        codec,
                        page_rows,
                        use_dict,
                        page_version=page_version,
                    )
                )
            else:
                chunk_metas.append(
                    _write_chunk(
                        body,
                        name,
                        ptype,
                        optional,
                        vals[rg_start : rg_start + rg_rows],
                        codec,
                        page_rows,
                        use_dict,
                        page_version=page_version,
                    )
                )
            total_bytes += len(body) - before
        rg = _Writer()
        rg.field_list(1, _CT_STRUCT, chunk_metas)
        rg.field_i64(2, total_bytes)
        rg.field_i64(3, rg_n)
        rg_structs.append(rg.done())
        if n_rows == 0:
            break
    # schema elements: root + leaves
    root = _Writer()
    root.field_binary(4, b"schema")
    root.field_i32(5, len(columns))
    schema_items = [root.done()]
    for name, ptype, optional, _vals in columns:
        if isinstance(ptype, tuple) and ptype[0] == "list":
            # 3-level LIST encoding (LogicalTypes.md): optional group
            # name (LIST) -> repeated group "list" -> element
            _tag, elem_ptype, elem_optional = ptype
            grp = _Writer()
            grp.field_i32(3, 1 if optional else 0)
            grp.field_binary(4, name.encode("utf-8"))
            grp.field_i32(5, 1)  # num_children
            grp.field_i32(6, 3)  # ConvertedType.LIST
            schema_items.append(grp.done())
            mid = _Writer()
            mid.field_i32(3, 2)  # REPEATED
            mid.field_binary(4, b"list")
            mid.field_i32(5, 1)
            schema_items.append(mid.done())
            se = _Writer()
            se.field_i32(1, elem_ptype)
            se.field_i32(3, 1 if elem_optional else 0)
            se.field_binary(4, b"element")
            if elem_ptype == PQ_BYTE_ARRAY:
                se.field_i32(6, _CONVERTED_UTF8)
            schema_items.append(se.done())
            continue
        se = _Writer()
        se.field_i32(1, ptype)
        se.field_i32(3, 1 if optional else 0)  # OPTIONAL / REQUIRED
        se.field_binary(4, name.encode("utf-8"))
        if ptype == PQ_BYTE_ARRAY:
            se.field_i32(6, _CONVERTED_UTF8)
        schema_items.append(se.done())
    fmd = _Writer()
    fmd.field_i32(1, 2)  # format version
    fmd.field_list(2, _CT_STRUCT, schema_items)
    fmd.field_i64(3, n_rows)
    fmd.field_list(4, _CT_STRUCT, rg_structs)
    fmd.field_binary(6, created_by.encode("utf-8"))
    # column_orders (field 7): readers only trust min_value/max_value
    # statistics when the column's order is declared TYPE_ORDER
    order = _Writer()
    order.field_struct(1, b"\x00")  # ColumnOrder union: TYPE_ORDER {}
    fmd.field_list(7, _CT_STRUCT, [order.done()] * len(columns))
    footer = fmd.done()
    body += footer
    body += struct.pack("<I", len(footer))
    body += b"PAR1"
    return bytes(body)

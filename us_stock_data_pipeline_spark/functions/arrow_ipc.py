"""REAL Arrow IPC (stream + file/Feather-v2) reader, pure Python
(round 13) — no pyarrow, no JVM on the decode side.

Parses the three layers of the format from raw bytes:

1. **Flatbuffers**: a minimal generic reader for the subset Arrow's
   metadata uses — root offset, vtables (u16 size/table-size/per-field
   offsets), scalars with default-0 semantics, strings, vectors of
   offsets, vectors of inline structs, child tables, and (type, value)
   union field pairs.
2. **IPC framing**: encapsulated messages — 0xFFFFFFFF continuation,
   i32 metadata length, Message flatbuffer (version, header union,
   bodyLength), 8-byte alignment, then the body. The FILE format
   (Feather v2) wraps the same stream in ARROW1 magic; the reader
   walks messages sequentially so the trailing footer is not needed.
3. **Array assembly**: per-field FieldNodes (length, null_count) and
   Buffers (offset, length) consumed in the spec's order — validity
   bitmap then data for primitives, validity/offsets/data for utf8 —
   across MULTIPLE record batches.

Scope: Int 8/16/32/64 (signed + unsigned), Float32/Float64, Bool,
Utf8, Binary, and List<primitive/utf8> columns, any number of record
batches, both with and without validity bitmaps. Gated
NotImplementedError: dictionary-encoded fields, body compression
(LZ4_FRAME/ZSTD), Struct/Union/Map columns, big-endian payloads.

Format references: the public Apache Arrow Columnar Format spec
(Message.fbs / Schema.fbs / File.fbs) and the flatbuffers internals
document. Reference-repo scope note: the reference ships rows through
driver-side REST paging (`polygon_client.py`); Arrow IPC is the
interchange format a modern data service would hand back, so the
connector tier should speak it from raw bytes.
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------ flatbuffers


class _FB:
    """Minimal flatbuffers table reader. `pos` is the table position;
    field lookups go through the vtable with default-0 semantics."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        soffset = struct.unpack_from("<i", buf, pos)[0]
        self.vt = pos - soffset
        self.vt_size = struct.unpack_from("<H", buf, self.vt)[0]

    def _field_off(self, fid: int) -> int:
        """Byte offset of field `fid` relative to the table, 0 if absent."""
        slot = 4 + 2 * fid
        if slot >= self.vt_size:
            return 0
        return struct.unpack_from("<H", self.buf, self.vt + slot)[0]

    def scalar(self, fid: int, fmt: str, default=0):
        off = self._field_off(fid)
        if not off:
            return default
        return struct.unpack_from(f"<{fmt}", self.buf, self.pos + off)[0]

    def bool_(self, fid: int, default=False) -> bool:
        return bool(self.scalar(fid, "b", 1 if default else 0))

    def _indirect(self, fid: int) -> int:
        """Position a relative-offset field points at; 0 if absent."""
        off = self._field_off(fid)
        if not off:
            return 0
        p = self.pos + off
        return p + struct.unpack_from("<I", self.buf, p)[0]

    def string(self, fid: int) -> str | None:
        p = self._indirect(fid)
        if not p:
            return None
        n = struct.unpack_from("<I", self.buf, p)[0]
        return self.buf[p + 4 : p + 4 + n].decode("utf-8")

    def table(self, fid: int) -> "_FB | None":
        p = self._indirect(fid)
        return _FB(self.buf, p) if p else None

    def vector(self, fid: int) -> tuple[int, int]:
        """(count, element_start) of a vector field; (0, 0) if absent."""
        p = self._indirect(fid)
        if not p:
            return 0, 0
        n = struct.unpack_from("<I", self.buf, p)[0]
        return n, p + 4

    def vector_tables(self, fid: int) -> list["_FB"]:
        n, start = self.vector(fid)
        out = []
        for i in range(n):
            p = start + 4 * i
            out.append(_FB(self.buf, p + struct.unpack_from("<I", self.buf, p)[0]))
        return out

    def vector_structs(self, fid: int, size: int) -> list[int]:
        """Positions of inline structs of `size` bytes each."""
        n, start = self.vector(fid)
        return [start + size * i for i in range(n)]


# -------------------------------------------------------------- metadata
# Message.fbs header union members
_MSG_SCHEMA = 1
_MSG_DICTIONARY_BATCH = 2
_MSG_RECORD_BATCH = 3

# Schema.fbs Type union members (order defines the tags)
_T_INT = 2
_T_FLOAT = 3
_T_BINARY = 4
_T_UTF8 = 5
_T_BOOL = 6
_T_LIST = 12

_TYPE_NAMES = {
    1: "null", 2: "int", 3: "float", 4: "binary", 5: "utf8", 6: "bool",
    7: "decimal", 8: "date", 9: "time", 10: "timestamp", 11: "interval",
    12: "list", 13: "struct", 14: "union", 15: "fixed_size_binary",
    16: "fixed_size_list", 17: "map", 18: "duration", 19: "large_binary",
    20: "large_utf8", 21: "large_list",
}


def _parse_field(f: _FB) -> dict:
    """Field.fbs: name(0), nullable(1), type_type(2), type(3),
    dictionary(4), children(5)."""
    name = f.string(0)
    ttype = f.scalar(2, "B")
    tt = f.table(3)
    if f.table(4) is not None:
        raise NotImplementedError("dictionary-encoded IPC fields not in scope")
    children = [_parse_field(c) for c in f.vector_tables(5)]
    if ttype == _T_INT:
        spec = {
            "kind": "int",
            "bits": tt.scalar(0, "i") if tt else 0,
            "signed": tt.bool_(1) if tt else False,
        }
    elif ttype == _T_FLOAT:
        spec = {"kind": "float", "precision": tt.scalar(0, "h") if tt else 0}
    elif ttype == _T_UTF8:
        spec = {"kind": "utf8"}
    elif ttype == _T_BINARY:
        spec = {"kind": "binary"}
    elif ttype == _T_BOOL:
        spec = {"kind": "bool"}
    elif ttype == _T_LIST:
        if len(children) != 1:
            raise ValueError("List field must have exactly one child")
        spec = {"kind": "list"}
    else:
        raise NotImplementedError(
            f"Arrow type {_TYPE_NAMES.get(ttype, ttype)!r} not in scope"
        )
    return {"name": name, "spec": spec, "children": children}


def _walk_messages(buf: bytes):
    """Yield (header_type, header_table, body_bytes) for each
    encapsulated message; handles both the bare stream and the FILE
    wrapper (ARROW1 magic + footer, which sequential walking skips)."""
    pos = 0
    if buf[:6] == b"ARROW1":
        pos = 8  # 6-byte magic + 2 bytes padding
    while pos + 8 <= len(buf):
        (cont,) = struct.unpack_from("<I", buf, pos)
        if cont != 0xFFFFFFFF:
            return  # file footer / end of stream
        (mlen,) = struct.unpack_from("<i", buf, pos + 4)
        if mlen == 0:
            return  # end-of-stream marker
        meta_start = pos + 8
        root = meta_start + struct.unpack_from("<I", buf, meta_start)[0]
        msg = _FB(buf, root)
        # Message.fbs: version(0), header_type(1), header(2), bodyLength(3)
        htype = msg.scalar(1, "B")
        header = msg.table(2)
        body_len = msg.scalar(3, "q")
        body_start = meta_start + mlen
        body = buf[body_start : body_start + body_len]
        if len(body) != body_len:
            raise ValueError("truncated Arrow IPC body")
        yield htype, header, body
        pos = body_start + body_len


def _bitmap_get(bm: bytes, i: int) -> bool:
    return bool(bm[i >> 3] & (1 << (i & 7)))


_INT_FMT = {(8, True): "b", (8, False): "B", (16, True): "h", (16, False): "H",
            (32, True): "i", (32, False): "I", (64, True): "q", (64, False): "Q"}


class _BatchCursor:
    """Sequential consumer of a record batch's FieldNodes and Buffers."""

    def __init__(self, body: bytes, nodes: list[tuple[int, int]],
                 buffers: list[tuple[int, int]]):
        self.body = body
        self.nodes = nodes
        self.buffers = buffers
        self.ni = 0
        self.bi = 0

    def next_node(self) -> tuple[int, int]:
        n = self.nodes[self.ni]
        self.ni += 1
        return n

    def next_buf(self) -> bytes:
        off, ln = self.buffers[self.bi]
        self.bi += 1
        return self.body[off : off + ln]

    def read_array(self, field: dict) -> list:
        length, null_count = self.next_node()
        validity = self.next_buf()
        kind = field["spec"]["kind"]

        def valid(i: int) -> bool:
            return null_count == 0 or not validity or _bitmap_get(validity, i)

        if kind == "bool":
            data = self.next_buf()
            return [
                _bitmap_get(data, i) if valid(i) else None for i in range(length)
            ]
        if kind == "int":
            data = self.next_buf()
            fmt = _INT_FMT.get((field["spec"]["bits"], field["spec"]["signed"]))
            if not fmt:
                raise NotImplementedError(
                    f"int bit width {field['spec']['bits']} not in scope"
                )
            vals = struct.unpack_from(f"<{length}{fmt}", data, 0) if length else ()
            return [vals[i] if valid(i) else None for i in range(length)]
        if kind == "float":
            data = self.next_buf()
            prec = field["spec"]["precision"]  # 0=half, 1=single, 2=double
            if prec not in (1, 2):
                raise NotImplementedError("float16 not in scope")
            fmt = "f" if prec == 1 else "d"
            vals = struct.unpack_from(f"<{length}{fmt}", data, 0) if length else ()
            return [vals[i] if valid(i) else None for i in range(length)]
        if kind in ("utf8", "binary"):
            offsets = self.next_buf()
            data = self.next_buf()
            offs = struct.unpack_from(f"<{length + 1}i", offsets, 0) if length else (0,)
            out = []
            for i in range(length):
                if not valid(i):
                    out.append(None)
                    continue
                raw = data[offs[i] : offs[i + 1]]
                out.append(raw.decode("utf-8") if kind == "utf8" else bytes(raw))
            return out
        if kind == "list":
            offsets = self.next_buf()
            offs = struct.unpack_from(f"<{length + 1}i", offsets, 0) if length else (0,)
            child_vals = self.read_array(field["children"][0])
            out = []
            for i in range(length):
                if not valid(i):
                    out.append(None)
                else:
                    out.append(child_vals[offs[i] : offs[i + 1]])
            return out
        raise NotImplementedError(f"array kind {kind!r} not in scope")


def read_arrow_ipc(buf: bytes) -> tuple[list[str], list[list]]:
    """Decode an Arrow IPC stream or file (Feather v2): returns
    (column_names, columns) with Python values (None for nulls, lists
    for List columns), concatenated across every record batch.
    Truncated/corrupt payloads raise the module-uniform ValueError."""
    try:
        return _read_arrow_ipc(buf)
    except (struct.error, IndexError) as e:
        raise ValueError(f"truncated or corrupt Arrow IPC payload: {e}") from None


def _read_arrow_ipc(buf: bytes) -> tuple[list[str], list[list]]:
    fields: list[dict] | None = None
    cols: list[list] = []
    saw_batch = False
    for htype, header, body in _walk_messages(buf):
        if htype == _MSG_SCHEMA:
            fields = [_parse_field(f) for f in header.vector_tables(1)]
            cols = [[] for _ in fields]
        elif htype == _MSG_DICTIONARY_BATCH:
            raise NotImplementedError("dictionary batches not in scope")
        elif htype == _MSG_RECORD_BATCH:
            if fields is None:
                raise ValueError("record batch before schema")
            # RecordBatch.fbs: length(0), nodes(1: FieldNode structs,
            # 16B), buffers(2: Buffer structs, 16B), compression(3)
            if header.table(3) is not None:
                raise NotImplementedError(
                    "compressed IPC bodies (LZ4_FRAME/ZSTD) not in scope"
                )
            nodes = [
                struct.unpack_from("<qq", header.buf, p)
                for p in header.vector_structs(1, 16)
            ]
            buffers = [
                struct.unpack_from("<qq", header.buf, p)
                for p in header.vector_structs(2, 16)
            ]
            cur = _BatchCursor(body, nodes, buffers)
            for j, f in enumerate(fields):
                cols[j].extend(cur.read_array(f))
            saw_batch = True
    if fields is None:
        raise ValueError("no schema message in Arrow IPC payload")
    if not saw_batch and any(cols):
        raise ValueError("Arrow IPC payload had no record batches")
    return [f["name"] for f in fields], cols


# --------------------------------------------------------------- writer
# Flatbuffers EMISSION: parents are written before children (uoffsets
# point forward: target = field_pos + value), each table's vtable sits
# immediately before it (soffset = table_pos - vtable_pos > 0), and
# offset fields are written as placeholders then patched once the
# child's absolute position is known.


class _FBBuilder:
    def __init__(self):
        self.buf = bytearray()

    def _align(self, n: int) -> None:
        while len(self.buf) % n:
            self.buf.append(0)

    def table(self, fields: list[tuple[int, str, object]]) -> int:
        """Write a table. fields: (fid, kind, value) with kind in
        {'i8','i16','i32','i64','u8','bool','offset'} — 'offset' value
        is a callback writing the child and returning its position.
        Returns the table's absolute position."""
        fields = [f for f in fields if f is not None]
        max_fid = max((f[0] for f in fields), default=-1)
        sizes = {"i8": 1, "u8": 1, "bool": 1, "i16": 2, "i32": 4, "offset": 4,
                 "i64": 8}
        # table layout: 4-byte soffset, then fields in declaration order
        # (no reordering — simplicity beats packing here)
        offs: dict[int, int] = {}
        pos = 4
        for fid, kind, _v in fields:
            sz = sizes[kind]
            pos = (pos + sz - 1) // sz * sz
            offs[fid] = pos
            pos += sz
        table_size = pos
        vt_size = 4 + 2 * (max_fid + 1)
        # every scalar must be size-aligned ABSOLUTELY (flatbuffers
        # verifiers check this): align the table start to the largest
        # field size, since per-field offsets are already size-aligned
        max_align = max([sizes[k] for _f, k, _v in fields] or [4] + [4])
        max_align = max(max_align, 4)
        self._align(2)
        vt_pos = len(self.buf)
        self.buf += struct.pack("<HH", vt_size, table_size)
        for fid in range(max_fid + 1):
            self.buf += struct.pack("<H", offs.get(fid, 0))
        self._align(max_align)
        t_pos = len(self.buf)
        self.buf += struct.pack("<i", t_pos - vt_pos)
        self.buf += b"\x00" * (table_size - 4)
        patches: list[tuple[int, object]] = []
        for fid, kind, v in fields:
            p = t_pos + offs[fid]
            if kind == "offset":
                patches.append((p, v))
            elif kind == "bool" or kind == "u8":
                self.buf[p] = int(v) & 0xFF
            elif kind == "i8":
                struct.pack_into("<b", self.buf, p, v)
            elif kind == "i16":
                struct.pack_into("<h", self.buf, p, v)
            elif kind == "i32":
                struct.pack_into("<i", self.buf, p, v)
            elif kind == "i64":
                struct.pack_into("<q", self.buf, p, v)
        for p, writer in patches:
            child_pos = writer()
            struct.pack_into("<I", self.buf, p, child_pos - p)
        return t_pos

    def string(self, s: str) -> int:
        self._align(4)
        pos = len(self.buf)
        raw = s.encode("utf-8")
        self.buf += struct.pack("<I", len(raw)) + raw + b"\x00"
        return pos

    def vector_offsets(self, writers: list) -> int:
        """Vector of forward uoffsets to child tables."""
        self._align(4)
        pos = len(self.buf)
        self.buf += struct.pack("<I", len(writers))
        slots = []
        for _ in writers:
            slots.append(len(self.buf))
            self.buf += b"\x00\x00\x00\x00"
        for slot, w in zip(slots, writers):
            child = w()
            struct.pack_into("<I", self.buf, slot, child - slot)
        return pos

    def vector_structs(self, raw: bytes, count: int) -> int:
        # elements hold i64s: pad so the data (count prefix + 4) lands
        # on an 8-byte boundary
        while (len(self.buf) + 4) % 8:
            self.buf.append(0)
        pos = len(self.buf)
        self.buf += struct.pack("<I", count) + raw
        return pos


_WRITE_TYPES = {
    "int64": (_T_INT, [(0, "i32", 64), (1, "bool", 1)]),
    "int32": (_T_INT, [(0, "i32", 32), (1, "bool", 1)]),
    "float64": (_T_FLOAT, [(0, "i16", 2)]),
    "float32": (_T_FLOAT, [(0, "i16", 1)]),
    "bool": (_T_BOOL, []),
    "utf8": (_T_UTF8, []),
    "binary": (_T_BINARY, []),
}


def _field_writer(b: _FBBuilder, name: str, typ: str):
    """Callback writing one Field table (recursing for list<child>)."""

    def write() -> int:
        children: list = []
        if typ.startswith("list<") and typ.endswith(">"):
            inner = typ[5:-1]
            ttag, tfields = _T_LIST, []
            children = [_field_writer(b, "item", inner)]
        elif typ in _WRITE_TYPES:
            ttag, tfields = _WRITE_TYPES[typ]
        else:
            raise NotImplementedError(f"write type {typ!r} not in scope")
        return b.table(
            [
                (0, "offset", lambda: b.string(name)),
                (1, "bool", 1),  # nullable
                (2, "u8", ttag),  # type_type
                (3, "offset", lambda: b.table(tfields)),
                (5, "offset", lambda: b.vector_offsets(children))
                if children
                else None,
            ]
        )

    return write


def _message(header_type: int, header_writer, body_len: int) -> bytes:
    b = _FBBuilder()
    b.buf += b"\x00\x00\x00\x00"  # root uoffset placeholder
    root = b.table(
        [
            (0, "i16", 4),  # MetadataVersion V5
            (1, "u8", header_type),
            (2, "offset", lambda: header_writer(b)),
            (3, "i64", body_len),
        ]
    )
    struct.pack_into("<I", b.buf, 0, root)
    meta = bytes(b.buf)
    pad = (-(len(meta) + 8)) % 8
    meta += b"\x00" * pad
    return struct.pack("<Ii", 0xFFFFFFFF, len(meta)) + meta


def _pad8(x: bytes) -> bytes:
    return x + b"\x00" * ((-len(x)) % 8)


def _serialize_array(typ: str, vals: list, nodes: list, bufs: list) -> None:
    n = len(vals)
    null_count = sum(1 for v in vals if v is None)
    nodes.append((n, null_count))
    if null_count:
        bm = bytearray((n + 7) // 8)
        for i, v in enumerate(vals):
            if v is not None:
                bm[i >> 3] |= 1 << (i & 7)
        bufs.append(bytes(bm))
    else:
        bufs.append(b"")
    if typ == "bool":
        data = bytearray((n + 7) // 8)
        for i, v in enumerate(vals):
            if v:
                data[i >> 3] |= 1 << (i & 7)
        bufs.append(bytes(data))
    elif typ in ("int64", "int32", "float64", "float32"):
        fmt = {"int64": "q", "int32": "i", "float64": "d", "float32": "f"}[typ]
        zero = 0 if typ.startswith("int") else 0.0
        bufs.append(
            struct.pack(f"<{n}{fmt}", *[zero if v is None else v for v in vals])
        )
    elif typ in ("utf8", "binary"):
        offs = [0]
        data = bytearray()
        for v in vals:
            if v is not None:
                data += v.encode("utf-8") if isinstance(v, str) else bytes(v)
            offs.append(len(data))
        bufs.append(struct.pack(f"<{n + 1}i", *offs))
        bufs.append(bytes(data))
    elif typ.startswith("list<"):
        inner = typ[5:-1]
        offs = [0]
        flat: list = []
        for v in vals:
            if v is not None:
                flat.extend(v)
            offs.append(len(flat))
        bufs.append(struct.pack(f"<{n + 1}i", *offs))
        _serialize_array(inner, flat, nodes, bufs)
    else:
        raise NotImplementedError(f"write type {typ!r} not in scope")


def write_arrow_ipc(
    names: list[str], types: list[str], columns: list[list],
    batch_rows: int | None = None, file_format: bool = False,
) -> bytes:
    """Serialize columns into an Arrow IPC STREAM: Schema message,
    one RecordBatch message per `batch_rows` rows (default: one), and
    the end-of-stream marker — every flatbuffer byte emitted by this
    module. Types: int64/int32/float64/float32/bool/utf8/binary and
    list<...> of those. Readable by pyarrow (`pa.ipc.open_stream`) and
    by this module's own `read_arrow_ipc` — the two-decoder bar every
    writer here meets. `file_format=True` wraps the stream as an
    ARROW1 FILE (Feather v2): leading magic, trailing Footer
    flatbuffer (re-emitted schema + 24-byte Block structs locating
    every record-batch message), footer length, closing magic —
    readable by `pa.ipc.open_file` (which seeks via the footer, so the
    Blocks are load-bearing, not decorative)."""
    n_rows = len(columns[0]) if columns else 0
    for name, c in zip(names, columns):
        if len(c) != n_rows:
            raise ValueError(f"column {name!r} length != {n_rows}")

    def schema_writer(b: _FBBuilder) -> int:
        writers = [_field_writer(b, nm, tp) for nm, tp in zip(names, types)]
        return b.table(
            [
                (0, "i16", 0),  # endianness: little
                (1, "offset", lambda: b.vector_offsets(writers)),
            ]
        )

    out = bytearray(b"ARROW1\x00\x00" if file_format else b"")
    blocks: list[tuple[int, int, int]] = []  # (offset, meta_len, body_len)
    out += _message(_MSG_SCHEMA, schema_writer, 0)
    step = batch_rows if batch_rows and batch_rows > 0 else max(n_rows, 1)
    for start in range(0, max(n_rows, 1), step):
        nodes: list[tuple[int, int]] = []
        raw_bufs: list[bytes] = []
        for tp, col in zip(types, columns):
            _serialize_array(tp, col[start : start + step], nodes, raw_bufs)
        body = bytearray()
        buf_meta: list[tuple[int, int]] = []
        for rb in raw_bufs:
            buf_meta.append((len(body), len(rb)))
            body += _pad8(rb)
        nodes_raw = b"".join(struct.pack("<qq", ln, nc) for ln, nc in nodes)
        bufs_raw = b"".join(struct.pack("<qq", off, ln) for off, ln in buf_meta)
        n_batch = min(step, n_rows - start) if n_rows else 0

        def rb_writer(b: _FBBuilder) -> int:
            return b.table(
                [
                    (0, "i64", n_batch),
                    (1, "offset", lambda: b.vector_structs(nodes_raw, len(nodes))),
                    (2, "offset", lambda: b.vector_structs(bufs_raw, len(buf_meta))),
                ]
            )

        msg = _message(_MSG_RECORD_BATCH, rb_writer, len(body))
        blocks.append((len(out), len(msg), len(body)))
        out += msg
        out += body
        if n_rows == 0:
            break
    out += struct.pack("<Ii", 0xFFFFFFFF, 0)  # end of stream
    if not file_format:
        return bytes(out)
    # Footer flatbuffer (File.fbs): version, re-emitted Schema table,
    # empty dictionaries vector, Block structs (24 bytes: i64 offset,
    # i32 metaDataLength incl. the 8-byte prefix and padding, 4 bytes
    # struct padding, i64 bodyLength)
    blocks_raw = b"".join(
        struct.pack("<qi4xq", off, mlen, blen) for off, mlen, blen in blocks
    )
    fb = _FBBuilder()
    fb.buf += b"\x00\x00\x00\x00"
    root = fb.table(
        [
            (0, "i16", 4),  # MetadataVersion V5
            (1, "offset", lambda: schema_writer(fb)),
            (2, "offset", lambda: fb.vector_structs(b"", 0)),
            (3, "offset", lambda: fb.vector_structs(blocks_raw, len(blocks))),
        ]
    )
    struct.pack_into("<I", fb.buf, 0, root)
    footer = bytes(fb.buf)
    out += footer
    out += struct.pack("<i", len(footer))
    out += b"ARROW1"
    return bytes(out)

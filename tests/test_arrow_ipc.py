"""Pure-Python Arrow IPC reader (functions/arrow_ipc.py): byte-level
cross-checks against pyarrow's writer in BOTH framings (bare stream and
ARROW1 file/Feather-v2), multi-batch concatenation, every in-scope
type, validity bitmaps, scope gates, and a Hypothesis fuzz."""

from __future__ import annotations

import io

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions.arrow_ipc import read_arrow_ipc


def _dump(t: pa.Table, mode: str, chunk: int | None = None, **kw) -> bytes:
    buf = io.BytesIO()
    opener = pa.ipc.new_file if mode == "file" else pa.ipc.new_stream
    with opener(buf, t.schema, **kw) as w:
        for b in t.to_batches(max_chunksize=chunk):
            w.write_batch(b)
    return buf.getvalue()


def _full_table() -> pa.Table:
    return pa.table(
        {
            "i": pa.array([1, None, -5, 2**40, 0, 9], pa.int64()),
            "i32": pa.array([7, 8, None, -1, 2, 3], pa.int32()),
            "i8": pa.array([1, -2, None, 127, -128, 0], pa.int8()),
            "u16": pa.array([1, 2, 3, 65535, None, 0], pa.uint16()),
            "f": pa.array([1.5, None, -0.25, 3.0, 0.0, -0.0], pa.float64()),
            "f32": pa.array([0.5, 1.5, None, 2.5, 3.5, 4.5], pa.float32()),
            "b": pa.array([True, False, None, True, False, True]),
            "s": pa.array(["ab", None, "", "日本", "x", "yz"], pa.string()),
            "bin": pa.array([b"\x00\x01", None, b"", b"xyz", b"q", b"r"], pa.binary()),
            "l": pa.array(
                [[1, 2], None, [], [None, 5], [7], [8, 9, 10]],
                pa.list_(pa.int64()),
            ),
            "ls": pa.array(
                [["a", "b"], None, [None], [], ["z"], ["w", "v"]],
                pa.list_(pa.string()),
            ),
        }
    )


@pytest.mark.parametrize("mode", ["stream", "file"])
@pytest.mark.parametrize("chunk", [None, 1, 3])
def test_all_types_both_framings(mode, chunk):
    t = _full_table()
    names, cols = read_arrow_ipc(_dump(t, mode, chunk))
    assert names == t.column_names
    for name, col in zip(names, cols):
        assert col == t[name].to_pylist(), (mode, chunk, name)


def test_no_nulls_fast_path():
    t = pa.table({"i": pa.array(range(100), pa.int64())})
    _names, cols = read_arrow_ipc(_dump(t, "file"))
    assert cols[0] == list(range(100))


def test_empty_table():
    t = pa.table({"i": pa.array([], pa.int64())})
    names, cols = read_arrow_ipc(_dump(t, "stream"))
    assert names == ["i"] and cols == [[]]


def test_scope_gates():
    t = _full_table()
    comp = _dump(
        t, "file", options=pa.ipc.IpcWriteOptions(compression="lz4")
    )
    with pytest.raises(NotImplementedError):
        read_arrow_ipc(comp)
    td = pa.table({"d": pa.array(["a", "b", "a"]).dictionary_encode()})
    with pytest.raises(NotImplementedError):
        read_arrow_ipc(_dump(td, "file"))
    ts = pa.table({"x": pa.array([{"a": 1}], pa.struct([("a", pa.int64())]))})
    with pytest.raises(NotImplementedError):
        read_arrow_ipc(_dump(ts, "file"))
    with pytest.raises(ValueError):
        read_arrow_ipc(b"\xff\xff\xff\xff\x10\x00\x00\x00")


@settings(max_examples=25, deadline=None)
@given(
    ints=st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), max_size=150),
    texts=st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=150),
    mode=st.sampled_from(["stream", "file"]),
    chunk=st.sampled_from([1, 7, None]),
)
def test_fuzz_vs_pyarrow(ints, texts, mode, chunk):
    n = min(len(ints), len(texts))
    t = pa.table(
        {
            "i": pa.array(ints[:n], pa.int64()),
            "s": pa.array(texts[:n], pa.string()),
        }
    )
    names, cols = read_arrow_ipc(_dump(t, mode, chunk))
    assert cols[0] == t["i"].to_pylist()
    assert cols[1] == t["s"].to_pylist()


# ---------------------------------------------------------------- writer
from us_stock_data_pipeline_spark.functions.arrow_ipc import write_arrow_ipc

_W_NAMES = ["i", "f", "b", "s", "bin", "l", "ls"]
_W_TYPES = ["int64", "float64", "bool", "utf8", "binary", "list<int64>", "list<utf8>"]
_W_COLS = [
    [1, None, -5, 2**40, 0],
    [1.5, None, -0.25, 3.0, 0.0],
    [True, False, None, True, False],
    ["ab", None, "", "日本", "x"],
    [b"\x00\x01", None, b"", b"xyz", b"q"],
    [[1, 2], None, [], [None, 5], [7]],
    [["a", "b"], None, [None], [], ["z"]],
]


@pytest.mark.parametrize("batch_rows", [None, 2, 1])
def test_writer_two_decoders(batch_rows):
    buf = write_arrow_ipc(_W_NAMES, _W_TYPES, _W_COLS, batch_rows=batch_rows)
    t = pa.ipc.open_stream(io.BytesIO(buf)).read_all()
    assert t.column_names == _W_NAMES
    for nm, col in zip(_W_NAMES, _W_COLS):
        assert t[nm].to_pylist() == col, nm
    names, cols = read_arrow_ipc(buf)
    assert names == _W_NAMES and cols == _W_COLS


def test_writer_empty_and_validation():
    buf = write_arrow_ipc(["x"], ["int64"], [[]])
    assert pa.ipc.open_stream(io.BytesIO(buf)).read_all()["x"].to_pylist() == []
    with pytest.raises(ValueError):
        write_arrow_ipc(["a", "b"], ["int64", "int64"], [[1], [1, 2]])
    with pytest.raises(NotImplementedError):
        write_arrow_ipc(["a"], ["decimal"], [[1]])


@settings(max_examples=20, deadline=None)
@given(
    ints=st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)), max_size=120),
    lists=st.lists(
        st.one_of(
            st.none(),
            st.lists(st.one_of(st.none(), st.integers(-100, 100)), max_size=5),
        ),
        max_size=120,
    ),
    batch_rows=st.sampled_from([None, 1, 7]),
)
def test_writer_fuzz_two_decoders(ints, lists, batch_rows):
    n = min(len(ints), len(lists))
    cols = [ints[:n], lists[:n]]
    buf = write_arrow_ipc(["i", "l"], ["int64", "list<int64>"], cols, batch_rows)
    t = pa.ipc.open_stream(io.BytesIO(buf)).read_all()
    assert t["i"].to_pylist() == cols[0]
    assert t["l"].to_pylist() == cols[1]
    _names, rc = read_arrow_ipc(buf)
    assert rc == cols


@pytest.mark.parametrize("batch_rows", [None, 2])
def test_writer_file_format_footer_seeking(batch_rows):
    """file_format=True must satisfy pa.ipc.open_file, which seeks via
    the trailing Footer flatbuffer — the Block structs are load-bearing."""
    buf = write_arrow_ipc(
        _W_NAMES, _W_TYPES, _W_COLS, batch_rows=batch_rows, file_format=True
    )
    t = pa.ipc.open_file(io.BytesIO(buf)).read_all()
    for nm, col in zip(_W_NAMES, _W_COLS):
        assert t[nm].to_pylist() == col, nm
    names, cols = read_arrow_ipc(buf)
    assert names == _W_NAMES and cols == _W_COLS

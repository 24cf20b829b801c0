"""Pure-Python parquet WRITER (functions/parquet_write.py): files it
emits must be read back bit-identically by THREE independent readers —
pyarrow (C++), Spark's JVM vectorized reader, and the in-repo raw page
reader — across codecs, page sizes, null patterns, and a Hypothesis
fuzz of values; plus statistics visibility and scope gates."""

from __future__ import annotations

import io
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import parquet_raw as PR
from us_stock_data_pipeline_spark.functions.parquet_write import (
    CODEC_GZIP,
    CODEC_LZ4_RAW,
    CODEC_SNAPPY,
    CODEC_UNCOMPRESSED,
    PQ_BYTE_ARRAY,
    PQ_DOUBLE,
    PQ_INT32,
    PQ_INT64,
    write_parquet,
)


def _cols(n):
    return [
        ("i64", PQ_INT64, False, [k * 1000003 - 5 for k in range(n)]),
        ("i32", PQ_INT32, True, [None if k % 11 == 0 else (k % 300) - 150 for k in range(n)]),
        ("f64", PQ_DOUBLE, True, [None if k % 13 == 0 else k * 0.5 for k in range(n)]),
        ("s", PQ_BYTE_ARRAY, True, [None if k % 7 == 0 else f"v-{k}-é中" for k in range(n)]),
    ]


def _assert_pyarrow_roundtrip(buf: bytes, cols):
    t = pq.read_table(io.BytesIO(buf))
    for name, _pt, _opt, vals in cols:
        assert t.column(name).to_pylist() == vals, name
    assert t.schema.field("s").type == pa.string() if any(c[0] == "s" for c in cols) else True


def _assert_own_roundtrip(buf: bytes, cols):
    for name, ptype, _opt, vals in cols:
        got = PR.read_column(buf, name)
        if ptype == PQ_BYTE_ARRAY:
            got = [None if g is None else g.decode("utf-8") for g in got]
        assert got == vals, name


@pytest.mark.parametrize(
    "codec", [CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP, CODEC_LZ4_RAW]
)
@pytest.mark.parametrize("page_rows", [64, 1024, 100000])
def test_roundtrip_codecs_pages(codec, page_rows):
    cols = _cols(3000)
    buf = write_parquet(cols, codec=codec, page_rows=page_rows)
    _assert_pyarrow_roundtrip(buf, cols)
    _assert_own_roundtrip(buf, cols)


def test_spark_jvm_reads_our_files(spark):
    cols = _cols(4000)
    buf = write_parquet(cols, codec=CODEC_SNAPPY, page_rows=333)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "own.parquet")
        with open(path, "wb") as f:
            f.write(buf)
        df = spark.read.parquet(path)
        rows = df.orderBy("i64").collect()
        assert [r.i64 for r in rows] == cols[0][3]
        assert [r.i32 for r in rows] == cols[1][3]
        assert [r.f64 for r in rows] == cols[2][3]
        assert [r.s for r in rows] == cols[3][3]
        # schema fidelity: UTF8 converted type -> StringType, nullability
        assert dict(df.dtypes) == {
            "i64": "bigint",
            "i32": "int",
            "f64": "double",
            "s": "string",
        }


def test_statistics_visible_and_correct():
    cols = _cols(2000)
    buf = write_parquet(cols)
    md = pq.ParquetFile(io.BytesIO(buf)).metadata
    by_name = {
        md.row_group(0).column(i).path_in_schema: md.row_group(0).column(i).statistics
        for i in range(md.num_columns)
    }
    i64 = [v for v in cols[0][3]]
    assert by_name["i64"].min == min(i64) and by_name["i64"].max == max(i64)
    assert by_name["i64"].null_count == 0
    i32 = [v for v in cols[1][3] if v is not None]
    assert by_name["i32"].min == min(i32) and by_name["i32"].max == max(i32)
    assert by_name["i32"].null_count == sum(1 for v in cols[1][3] if v is None)
    s = [v for v in cols[3][3] if v is not None]
    assert by_name["s"].min == min(s) and by_name["s"].max == max(s)


def test_all_null_and_tiny_tables():
    cols = [
        ("a", PQ_INT64, True, [None, None, None]),
        ("b", PQ_BYTE_ARRAY, True, [None, "", None]),
    ]
    buf = write_parquet(cols, codec=CODEC_SNAPPY)
    _assert_pyarrow_roundtrip(buf, cols)
    one = [("x", PQ_DOUBLE, False, [1.5])]
    buf = write_parquet(one, codec=CODEC_GZIP)
    _assert_pyarrow_roundtrip(buf, one)
    _assert_own_roundtrip(buf, one)


def test_null_in_required_column_rejected():
    with pytest.raises(ValueError, match="required"):
        write_parquet([("a", PQ_INT64, False, [1, None, 3])])


def test_length_mismatch_rejected():
    with pytest.raises(ValueError, match="length"):
        write_parquet(
            [("a", PQ_INT64, False, [1, 2]), ("b", PQ_INT64, False, [1])]
        )


@settings(max_examples=25, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=True)),
            st.one_of(st.none(), st.text(max_size=40)),
        ),
        min_size=1,
        max_size=500,
    ),
    codec=st.sampled_from([CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP, CODEC_LZ4_RAW]),
    page_rows=st.sampled_from([7, 100, 4096]),
)
def test_fuzz_roundtrip_vs_pyarrow(data, codec, page_rows):
    cols = [
        ("i", PQ_INT64, True, [t[0] for t in data]),
        ("f", PQ_DOUBLE, True, [t[1] for t in data]),
        ("s", PQ_BYTE_ARRAY, True, [t[2] for t in data]),
    ]
    buf = write_parquet(cols, codec=codec, page_rows=page_rows)
    t = pq.read_table(io.BytesIO(buf))
    assert t.column("i").to_pylist() == cols[0][3]
    assert t.column("f").to_pylist() == cols[1][3]
    assert t.column("s").to_pylist() == cols[2][3]
    _assert_own_roundtrip(buf, cols)


@pytest.mark.parametrize("codec", [CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP])
@pytest.mark.parametrize("rg_rows", [None, 500, 1499])
def test_dictionary_and_row_groups(codec, rg_rows):
    n = 4000
    cols = [
        ("id", PQ_INT64, False, list(range(n))),
        ("cat", PQ_BYTE_ARRAY, True, [None if k % 13 == 0 else f"c{k % 7}" for k in range(n)]),
        ("code", PQ_INT32, False, [k % 30 for k in range(n)]),
        ("score", PQ_DOUBLE, True, [None if k % 5 == 0 else float(k % 11) for k in range(n)]),
    ]
    buf = write_parquet(cols, codec=codec, use_dictionary=True, row_group_rows=rg_rows)
    _assert_pyarrow_roundtrip(buf, cols)
    _assert_own_roundtrip(buf, cols)
    md = pq.ParquetFile(io.BytesIO(buf)).metadata
    if rg_rows:
        assert md.num_row_groups == -(-n // rg_rows)
    # high-cardinality id falls back to PLAIN; low-cardinality cols dict
    encs = {
        md.row_group(0).column(i).path_in_schema: md.row_group(0).column(i).encodings
        for i in range(md.num_columns)
    }
    assert "PLAIN_DICTIONARY" not in encs["id"]
    assert "PLAIN_DICTIONARY" in encs["cat"]


def test_dictionary_shrinks_low_cardinality():
    n = 4000
    cols = [("code", PQ_INT32, False, [k % 30 for k in range(n)])]
    plain = len(write_parquet(cols, codec=CODEC_UNCOMPRESSED))
    dicted = len(write_parquet(cols, codec=CODEC_UNCOMPRESSED, use_dictionary=True))
    assert dicted < plain // 2


def test_single_value_dictionary():
    one = [("k", PQ_BYTE_ARRAY, False, ["same"] * 100)]
    buf = write_parquet(one, use_dictionary=True)
    assert pq.read_table(io.BytesIO(buf)).column("k").to_pylist() == ["same"] * 100
    assert PR.read_column(buf, "k") == [b"same"] * 100


def test_spark_reads_dictionary_row_groups(spark):
    cols = _cols(3000)
    buf = write_parquet(cols, use_dictionary=True, row_group_rows=777, page_rows=250)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "own_dict.parquet")
        with open(path, "wb") as f:
            f.write(buf)
        rows = spark.read.parquet(path).orderBy("i64").collect()
        assert [r.i64 for r in rows] == cols[0][3]
        assert [r.s for r in rows] == cols[3][3]


@settings(max_examples=20, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(0, 5)), min_size=1, max_size=400
    ),
    page_rows=st.sampled_from([7, 64, 1000]),
    rg_rows=st.sampled_from([None, 37, 150]),
)
def test_fuzz_dictionary_rle_runs(vals, page_rows, rg_rows):
    # tiny domain -> long equal runs and mixed run/bit-pack segments in
    # the index stream, the _rle_bp_write greedy boundaries under test
    cols = [("v", PQ_INT64, True, vals)]
    buf = write_parquet(
        cols, use_dictionary=True, page_rows=page_rows, row_group_rows=rg_rows
    )
    assert pq.read_table(io.BytesIO(buf)).column("v").to_pylist() == vals
    assert PR.read_column(buf, "v") == vals


@pytest.mark.parametrize("codec", [CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP, CODEC_LZ4_RAW])
@pytest.mark.parametrize("use_dict", [False, True])
def test_v2_pages_roundtrip(codec, use_dict):
    cols = _cols(3500)
    buf = write_parquet(
        cols,
        codec=codec,
        page_version=2,
        use_dictionary=use_dict,
        page_rows=300,
        row_group_rows=1700,
    )
    _assert_pyarrow_roundtrip(buf, cols)
    _assert_own_roundtrip(buf, cols)


def test_v2_pages_spark_reads(spark):
    cols = _cols(2500)
    buf = write_parquet(cols, page_version=2, use_dictionary=True, page_rows=400)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "own_v2.parquet")
        with open(path, "wb") as f:
            f.write(buf)
        rows = spark.read.parquet(path).orderBy("i64").collect()
        assert [r.i64 for r in rows] == cols[0][3]
        assert [r.s for r in rows] == cols[3][3]


def test_bad_page_version_rejected():
    with pytest.raises(ValueError, match="page_version"):
        write_parquet([("a", PQ_INT64, False, [1])], page_version=3)


# ---------------------------------------------------------------- nested
# Round 13: LIST columns (3-level encoding, repetition + definition
# levels) through the same three-reader interop bar.

from us_stock_data_pipeline_spark.functions.parquet_write import list_type

_L_INT = [[1, 2, 3], None, [], [None, 5], [7], [None], [0, None, -9]]
_L_STR = [["ab", "cd"], None, [None], [], ["x"], ["y", "z", "w"], []]
_L_DBL = [[1.5, 2.5], [], None, [0.25], [-3.75], [1.0], [2.0, 3.0]]


def _nested_cols():
    return [
        ("a", list_type(PQ_INT64), True, _L_INT),
        ("s", list_type(PQ_BYTE_ARRAY), True, _L_STR),
        ("d", list_type(PQ_DOUBLE), True, _L_DBL),
        ("k", PQ_INT64, False, list(range(7))),
    ]


@pytest.mark.parametrize("page_version", [1, 2])
@pytest.mark.parametrize(
    "codec", [CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP, CODEC_LZ4_RAW]
)
@pytest.mark.parametrize("use_dict", [False, True])
def test_nested_list_three_readers(page_version, codec, use_dict):
    cols = _nested_cols()
    buf = write_parquet(
        cols,
        codec=codec,
        page_rows=3,
        row_group_rows=4,
        use_dictionary=use_dict,
        page_version=page_version,
    )
    t = pq.read_table(io.BytesIO(buf))
    assert t["a"].to_pylist() == _L_INT
    assert t["s"].to_pylist() == _L_STR
    assert t["d"].to_pylist() == _L_DBL
    assert t["k"].to_pylist() == list(range(7))
    assert PR.read_column(buf, "a") == _L_INT
    assert PR.read_column(buf, "d") == _L_DBL
    assert PR.read_column(buf, "s") == [
        None if v is None else [None if e is None else e.encode() for e in v]
        for v in _L_STR
    ]


def test_nested_list_spark_jvm_reads(spark):
    buf = write_parquet(
        _nested_cols(), codec=CODEC_SNAPPY, page_rows=3, page_version=1
    )
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.parquet")
        open(p, "wb").write(buf)
        df = spark.read.parquet(p).orderBy("k")
        rows = df.collect()
        assert [r["a"] for r in rows] == _L_INT
        assert [r["s"] for r in rows] == _L_STR
        assert [r["d"] for r in rows] == _L_DBL
        assert [str(f.dataType) for f in df.schema.fields if f.name == "a"] == [
            "ArrayType(LongType(), True)"
        ]


def test_nested_required_violations_rejected():
    with pytest.raises(ValueError):
        write_parquet(
            [("a", list_type(PQ_INT64, elem_optional=False), True, [[1, None]])]
        )
    with pytest.raises(ValueError):
        write_parquet([("a", list_type(PQ_INT64), False, [None])])


@settings(max_examples=20, deadline=None)
@given(
    lists=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.integers(-(2**40), 2**40)), max_size=7
            ),
        ),
        min_size=1,
        max_size=120,
    ),
    codec=st.sampled_from([CODEC_UNCOMPRESSED, CODEC_SNAPPY, CODEC_GZIP]),
    page_rows=st.sampled_from([3, 17, 1024]),
    rg_rows=st.sampled_from([None, 29]),
    pv=st.sampled_from([1, 2]),
    use_dict=st.booleans(),
)
def test_nested_fuzz_three_way(lists, codec, page_rows, rg_rows, pv, use_dict):
    buf = write_parquet(
        [("a", list_type(PQ_INT64), True, lists)],
        codec=codec,
        page_rows=page_rows,
        row_group_rows=rg_rows,
        use_dictionary=use_dict,
        page_version=pv,
    )
    assert pq.read_table(io.BytesIO(buf))["a"].to_pylist() == lists
    assert PR.read_column(buf, "a") == lists

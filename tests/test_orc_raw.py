"""Pure-Python ORC reader (functions/orc_raw.py): byte-level
cross-checks against TWO independent writers — pyarrow's C++ ORC
writer and Spark's Java ORC writer — across compressions, every
in-scope type, RLEv2 sub-encoding stress shapes (delta runs,
short-repeat, patched-base outliers), dictionary + direct strings,
multi-stripe files, and scope gates; plus a Hypothesis fuzz."""

from __future__ import annotations

import glob
import io
import os
import random
import tempfile

import pyarrow as pa
import pyarrow.orc as po
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions.orc_raw import read_orc


def _dump(t: pa.Table, **kw) -> bytes:
    buf = io.BytesIO()
    po.write_table(t, buf, **kw)
    return buf.getvalue()


def _full_table() -> pa.Table:
    return pa.table(
        {
            "i": pa.array([1, None, -5, 2**40, 0, 7, 8, 9], pa.int64()),
            "i32": pa.array([7, 8, None, -1, 2, 3, 4, 5], pa.int32()),
            "i16": pa.array([1, -2, None, 300, 5, 6, 7, 8], pa.int16()),
            "i8": pa.array([1, -2, None, 127, -128, 0, 3, 4], pa.int8()),
            "f": pa.array([1.5, None, -0.25, 3.0, 0.0, 1.0, 2.0, 3.0], pa.float64()),
            "f32": pa.array([0.5, 1.5, None, 2.5, 3.5, 4.5, 5.5, 6.5], pa.float32()),
            "b": pa.array([True, False, None, True, False, True, True, False]),
            "s": pa.array(["ab", None, "", "日本", "x", "yz", "ab", "ab"], pa.string()),
            "bin": pa.array(
                [b"\x00\x01", None, b"", b"xyz", b"q", b"r", b"s", b"t"],
                pa.binary(),
            ),
            "d": pa.array([0, 1, None, 18000, -3, 7, 8, 9], pa.date32()),
        }
    )


@pytest.mark.parametrize("comp", ["uncompressed", "zlib", "snappy"])
def test_all_types_vs_pyarrow(comp):
    t = _full_table()
    names, cols = read_orc(_dump(t, compression=comp))
    assert names == t.column_names
    for nm, col in zip(names, cols):
        if nm == "d":
            # dates come back as raw day counts (logical layer above)
            exp = t[nm].cast(pa.int32()).to_pylist()
        else:
            exp = t[nm].to_pylist()
        assert col == exp, (comp, nm)


def test_rlev2_shapes_and_multi_stripe():
    random.seed(0)
    n = 120000
    rnd = [random.randrange(-(10**12), 10**12) if i % 97 else None for i in range(n)]
    seq = list(range(n))  # DELTA runs
    rep = [42] * n  # SHORT_REPEAT
    outlier = [10 + (i % 7) if i % 1000 else 2**45 for i in range(n)]  # PATCHED_BASE
    strs = [random.choice(["aa", "bb", "cc", "dd", None]) for _ in range(n)]
    t = pa.table(
        {
            "rnd": pa.array(rnd, pa.int64()),
            "seq": pa.array(seq, pa.int64()),
            "rep": pa.array(rep, pa.int64()),
            "outlier": pa.array(outlier, pa.int64()),
            "s": pa.array(strs, pa.string()),
        }
    )
    for comp in ("zlib", "snappy"):
        _names, cols = read_orc(_dump(t, compression=comp, stripe_size=64 * 1024))
        assert cols[0] == rnd and cols[1] == seq and cols[2] == rep
        assert cols[3] == outlier and cols[4] == strs


def test_direct_strings_high_cardinality():
    # unique strings defeat the dictionary -> DIRECT_V2 length+data
    vals = [f"u-{i}-{i*i}" for i in range(5000)]
    t = pa.table({"s": pa.array(vals, pa.string())})
    _names, cols = read_orc(_dump(t, compression="zlib"))
    assert cols[0] == vals


def test_spark_jvm_writer(spark):
    df = spark.range(0, 30000).selectExpr(
        "id AS k",
        "CAST(id % 37 AS INT) AS small",
        "CASE WHEN id % 9 = 0 THEN NULL ELSE CAST(id AS DOUBLE) / 4.0 END AS x",
        "concat('s', CAST(id % 101 AS STRING)) AS s",
        "id % 3 = 0 AS flag",
    )
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "t")
        df.coalesce(1).write.mode("overwrite").option(
            "compression", "zlib"
        ).orc(out)
        (path,) = glob.glob(os.path.join(out, "*.orc"))
        buf = open(path, "rb").read()
        names, cols = read_orc(buf)
        t = po.read_table(path)
        assert names == t.column_names
        for nm, col in zip(names, cols):
            assert col == t[nm].to_pylist(), nm


def test_scope_gates():
    ts = pa.table({"t": pa.array([0], pa.timestamp("s"))})
    with pytest.raises(NotImplementedError):
        read_orc(_dump(ts))
    nested = pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))})
    with pytest.raises(NotImplementedError):
        read_orc(_dump(nested))
    zstd = _dump(pa.table({"i": pa.array([1], pa.int64())}), compression="zstd")
    with pytest.raises(NotImplementedError):
        read_orc(zstd)
    with pytest.raises(ValueError):
        read_orc(b"NOPE" + b"\x00" * 30)


@settings(max_examples=20, deadline=None)
@given(
    ints=st.lists(
        st.one_of(st.none(), st.integers(-(2**62), 2**62)), min_size=1, max_size=400
    ),
    texts=st.lists(
        st.one_of(st.none(), st.text(max_size=12)), min_size=1, max_size=400
    ),
    comp=st.sampled_from(["uncompressed", "zlib", "snappy"]),
)
def test_fuzz_vs_pyarrow(ints, texts, comp):
    n = min(len(ints), len(texts))
    t = pa.table(
        {
            "i": pa.array(ints[:n], pa.int64()),
            "s": pa.array(texts[:n], pa.string()),
        }
    )
    _names, cols = read_orc(_dump(t, compression=comp))
    assert cols[0] == t["i"].to_pylist()
    assert cols[1] == t["s"].to_pylist()


# ---------------------------------------------------------------- writer
from us_stock_data_pipeline_spark.functions.orc_raw import write_orc

_W_NAMES = ["i", "f", "b", "s", "bin"]
_W_TYPES = ["long", "double", "boolean", "string", "binary"]
_W_COLS = [
    [1, None, -5, 2**40, 0, 7, 7, 7, 7, 8],
    [1.5, None, -0.25, 3.0, 0.0, 1.0, 2.0, 3.0, 4.0, 5.0],
    [True, False, None, True, False, True, True, False, True, True],
    ["ab", None, "", "日本", "x", "yz", "ab", "ab", "q", "r"],
    [b"\x00\x01", None, b"", b"xyz", b"q", b"r", b"s", b"t", b"u", b"v"],
]


@pytest.mark.parametrize("comp", ["none", "zlib", "snappy"])
@pytest.mark.parametrize("stripe_rows", [None, 3])
def test_writer_own_and_pyarrow(comp, stripe_rows):
    buf = write_orc(_W_NAMES, _W_TYPES, _W_COLS, compression=comp,
                    stripe_rows=stripe_rows)
    names, cols = read_orc(buf)
    assert names == _W_NAMES and cols == _W_COLS
    t = po.read_table(io.BytesIO(buf))
    assert t.column_names == _W_NAMES
    for nm, col in zip(_W_NAMES, _W_COLS):
        assert t[nm].to_pylist() == col, nm


def test_writer_spark_jvm_reads(spark):
    buf = write_orc(_W_NAMES[:4], _W_TYPES[:4],
                    [c[:] for c in _W_COLS[:4]], compression="zlib",
                    stripe_rows=4)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.orc")
        open(p, "wb").write(buf)
        rows = spark.read.orc(p).collect()
        for j, nm in enumerate(_W_NAMES[:4]):
            assert [r[nm] for r in rows] == _W_COLS[j], nm


def test_writer_rlev2_run_shapes():
    # long equal runs (SHORT_REPEAT) interleaved with noise (DIRECT)
    vals = ([7] * 9 + [1, 2, 3] + [0] * 10 + [-(2**50), 2**50]) * 40
    buf = write_orc(["v"], ["long"], [vals], compression="zlib")
    _n, cols = read_orc(buf)
    assert cols[0] == vals
    assert po.read_table(io.BytesIO(buf))["v"].to_pylist() == vals


def test_writer_validation():
    with pytest.raises(ValueError):
        write_orc(["a", "b"], ["long", "long"], [[1], [1, 2]])
    with pytest.raises(NotImplementedError):
        write_orc(["a"], ["timestamp"], [[1]])


@settings(max_examples=20, deadline=None)
@given(
    ints=st.lists(st.one_of(st.none(), st.integers(-(2**62), 2**62)),
                  min_size=1, max_size=300),
    texts=st.lists(st.one_of(st.none(), st.text(max_size=10)),
                   min_size=1, max_size=300),
    comp=st.sampled_from(["none", "zlib", "snappy"]),
    stripe_rows=st.sampled_from([None, 37]),
)
def test_writer_fuzz_two_decoders(ints, texts, comp, stripe_rows):
    n = min(len(ints), len(texts))
    cols = [ints[:n], texts[:n]]
    buf = write_orc(["i", "s"], ["long", "string"], cols,
                    compression=comp, stripe_rows=stripe_rows)
    _names, rc = read_orc(buf)
    assert rc == cols
    t = po.read_table(io.BytesIO(buf))
    assert t["i"].to_pylist() == cols[0]
    assert t["s"].to_pylist() == cols[1]

"""Raw-Snappy codec: exact round trips, truncation uniformity, and
byte-level interoperability both directions with org.xerial.snappy —
the implementation Spark's own parquet/IO stack loads."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import multimodal as M


def _sample(kind: int, n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    if kind == 0:
        return bytes(rng.integers(0, 256, n, dtype=np.uint8))
    if kind == 1:
        return bytes(rng.integers(0, 5, n, dtype=np.uint8))
    if kind == 2:
        return (b"pack my box with five dozen jugs " * ((n // 33) + 1))[:n]
    return b"\x2a" * n


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=70_000),
    st.integers(min_value=0, max_value=2**31),
)
def test_snappy_roundtrip(kind, n, seed):
    data = _sample(kind, n, seed)
    assert M.snappy_decompress(M.snappy_compress(data)) == data


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=3), st.data())
def test_snappy_truncation_raises_valueerror(kind, data):
    payload = M.snappy_compress(_sample(kind, 700, 5))
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.snappy_decompress(payload[:cut])


def test_snappy_interop_with_xerial(spark):
    """Both directions against the reference: xerial decompresses OUR
    blocks; we decompress xerial's — including its 1-byte-offset copies
    and multi-byte literal lengths our encoder never emits."""
    S = spark.sparkContext._jvm.org.xerial.snappy.Snappy
    rng = np.random.default_rng(11)
    for t in range(14):
        n = int(rng.integers(0, 9000))
        data = _sample(t % 4, n, t)
        jc = bytes(S.compress(bytearray(data)))
        assert M.snappy_decompress(jc) == data, ("java->py", t)
        pc = M.snappy_compress(data)
        assert bytes(S.uncompress(bytearray(pc))) == data, ("py->java", t)


def test_snappy_declared_length_enforced():
    good = M.snappy_compress(b"abcdefgh")
    # corrupt the declared-length varint upward: output ends short
    bad = bytes([good[0] + 1]) + good[1:]
    with pytest.raises(ValueError):
        M.snappy_decompress(bad)

"""LZ4 block + frame codec and xxHash32: exact round trips, truncation
uniformity, and — the strong form — byte-level interoperability with the
REFERENCE lz4-java / xxhash implementations that ship inside Spark's own
JVM (net.jpountz.*), in both directions."""

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
        return (b"the quick brown fox jumps " * ((n // 26) + 1))[:n]
    return b"\x00" * n


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=6000),
    st.integers(min_value=0, max_value=2**31),
)
def test_block_and_frame_roundtrip(kind, n, seed):
    data = _sample(kind, n, seed)
    assert M.lz4_block_decompress(M.lz4_block_compress(data)) == data
    assert M.lz4_frame_decompress(M.lz4_frame_compress(data)) == data


def test_multiblock_frame_roundtrip():
    rng = np.random.default_rng(3)
    data = bytes(rng.integers(0, 7, 300_000, dtype=np.uint8))  # > 4 blocks
    fr = M.lz4_frame_compress(data)
    assert M.lz4_frame_decompress(fr) == data
    # LZ4 has no entropy stage, so low-alphabet RANDOM data barely
    # shrinks; repetitive data is where the match machinery shows
    runs = (b"header,value,12345\n" * 20_000)
    fr2 = M.lz4_frame_compress(runs)
    assert M.lz4_frame_decompress(fr2) == runs
    assert len(fr2) < len(runs) // 20


def test_xxh32_reference_vector():
    assert M.xxh32(b"") == 0x02CC5D05


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=3), st.data())
def test_frame_truncation_raises_valueerror(kind, data):
    payload = M.lz4_frame_compress(_sample(kind, 500, 7))
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.lz4_frame_decompress(payload[:cut])


def test_frame_checksum_detects_corruption():
    data = b"compressible compressible compressible " * 50
    fr = bytearray(M.lz4_frame_compress(data))
    fr[len(fr) // 2] ^= 0x40  # flip a bit in block data
    with pytest.raises(ValueError):
        M.lz4_frame_decompress(bytes(fr))


def test_interop_with_reference_lz4_java(spark):
    """Both directions against the real thing: lz4-java decompresses
    OUR blocks; we decompress lz4-java's; xxhash32 agrees bit-for-bit.
    This is the same library Spark itself uses for shuffle/IO, so our
    wire format is the production wire format."""
    jvm = spark.sparkContext._jvm
    fac = jvm.net.jpountz.lz4.LZ4Factory.fastestInstance()
    comp = fac.fastCompressor()
    dec = fac.safeDecompressor()
    h32 = jvm.net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
    for trial in range(12):
        data = _sample(trial % 4, 100 + 331 * trial, trial)
        jh = h32.hash(bytearray(data), 0, len(data), 0) & 0xFFFFFFFF
        assert jh == M.xxh32(data)
        assert M.lz4_block_decompress(bytes(comp.compress(bytearray(data)))) == data
        assert bytes(dec.decompress(bytearray(M.lz4_block_compress(data)), len(data))) == data

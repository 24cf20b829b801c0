"""Baseline TIFF codec (functions/tiff.py): PackBits against the TIFF
6.0 §7 worked example, TIFF-variant LZW (MSB-first, early change)
property-tested across width boundaries and table resets, predictor 2,
and full container round trips over both byte orders, both photometrics,
all three baseline compressions, and multi-strip layouts."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import tiff as T


def test_packbits_spec_worked_example():
    # TIFF 6.0 §7: the specification's own PackBits example
    comp = bytes.fromhex("FEAA02800A2AFDAA03800A2A22F7AA")
    exp = bytes.fromhex("AAAAAA800A2AAAAAAAAA800A2A22") + b"\xaa" * 10
    assert T.packbits_decompress(comp) == exp
    # and our compressor's output decodes to the same bytes
    assert T.packbits_decompress(T.packbits_compress(exp)) == exp


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=600))
def test_packbits_roundtrip(data):
    assert T.packbits_decompress(T.packbits_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(max_size=4000))
def test_lzw_roundtrip(data):
    assert T.tiff_lzw_decompress(T.tiff_lzw_compress(data)) == data


def test_lzw_width_boundaries_and_reset():
    """Data long enough to cross 9->10->11->12-bit code widths AND the
    4094-entry table reset — the early-change boundaries where a
    desynced decoder corrupts exactly one code."""
    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 256, 120000, dtype=np.uint8))
    assert T.tiff_lzw_decompress(T.tiff_lzw_compress(data)) == data
    # highly repetitive data grows the dictionary with long strings
    data2 = bytes([i % 9 for i in range(50000)])
    assert T.tiff_lzw_decompress(T.tiff_lzw_compress(data2)) == data2


def test_lzw_truncation_rejected():
    comp = T.tiff_lzw_compress(b"hello world, hello world")
    with pytest.raises(ValueError):
        T.tiff_lzw_decompress(comp[: len(comp) // 2], expected=24)


@pytest.mark.parametrize("spp", [1, 3])
@pytest.mark.parametrize("compression", [1, 5, 32773])
@pytest.mark.parametrize("big_endian", [False, True])
def test_container_roundtrip(spp, compression, big_endian):
    rng = np.random.default_rng(spp * 100 + compression)
    shape = (12, 20) if spp == 1 else (12, 20, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    for pred in (1, 2) if compression != 1 else (1,):
        for rps in (None, 5, 1):
            buf = T.encode_tiff(
                img,
                compression=compression,
                predictor=pred,
                rows_per_strip=rps,
                big_endian=big_endian,
            )
            back = T.decode_tiff(buf)
            assert back.shape == img.shape
            assert (back == img).all()


def test_container_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        T.decode_tiff(b"XX" + b"\x00" * 16)
    img = np.zeros((4, 4), dtype=np.uint8)
    buf = T.encode_tiff(img, compression=5, predictor=2)
    with pytest.raises(ValueError):
        T.decode_tiff(buf[: len(buf) - 10])
    with pytest.raises(NotImplementedError):
        # unknown compression id: patch the SHORT value in the IFD
        bad = bytearray(T.encode_tiff(img))
        idx = bad.find((259).to_bytes(2, "little"))
        bad[idx + 8] = 6  # Compression tag value -> old-style JPEG
        T.decode_tiff(bytes(bad))


def test_predictor_matches_manual_diff():
    img = np.array([[10, 20, 15], [200, 100, 255]], dtype=np.uint8)[:, :, None]
    d = T._predictor_apply(img)
    assert d[0, 0, 0] == 10 and d[0, 1, 0] == 10 and d[0, 2, 0] == 251
    assert (T._predictor_undo(d) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 9),
    w=st.integers(1, 9),
    spp=st.sampled_from([1, 3]),
    compression=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 2]),
    rps=st.sampled_from([None, 2, 3]),
    be=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_container_fuzz(h, w, spp, compression, pred, rps, be, seed):
    if compression == 1:
        pred = 1
    rng = np.random.default_rng(seed)
    shape = (h, w) if spp == 1 else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    buf = T.encode_tiff(
        img,
        compression=compression,
        predictor=pred,
        rows_per_strip=rps,
        big_endian=be,
    )
    assert (T.decode_tiff(buf) == img).all()

"""Round-trip and robustness tests for the pure-numpy baseline JPEG codec.

The oracle-checked query (`multimodal_jpeg_decode`) uses constant-block
cards where baseline JPEG is bit-exact; these tests cover the lossy AC
path (arbitrary images, long zero runs exercising ZRL, byte stuffing)
and the bounded-failure contract on corrupt streams.
"""

from __future__ import annotations

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_image,
    decode_jpeg_gray,
    encode_jpeg_card,
    encode_jpeg_gray,
)


def test_constant_block_cards_bit_exact():
    for d in (0, 1, 7, 123, 9999, 123457):
        img = decode_jpeg_gray(encode_jpeg_card(d))
        ys, xs = np.mgrid[0:2, 0:2]
        v = (d * 7 + xs * 13 + ys * 17) % 256
        exp = np.kron(v, np.ones((8, 8), dtype=np.int64)).astype(np.uint8)
        assert (img == exp).all()


def test_random_roundtrip_near_lossless():
    """With the all-ones quant table the only loss is DCT-coefficient
    rounding: reconstruction must stay within 1 gray level."""
    rng = np.random.default_rng(7)
    worst = 0
    for _ in range(10):
        img = rng.integers(0, 256, size=(16, 24), dtype=np.uint8)
        out = decode_jpeg_gray(encode_jpeg_gray(img))
        assert out.shape == img.shape
        worst = max(worst, int(np.abs(out.astype(int) - img.astype(int)).max()))
    assert worst <= 1


def test_gradient_exercises_long_runs_and_stuffing():
    img = (np.add.outer(np.arange(32) * 16, np.arange(64) * 8) % 256).astype(np.uint8)
    out = decode_jpeg_gray(encode_jpeg_gray(img))
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 1


def test_extreme_values_byte_stuffing():
    """All-255 images produce 0xFF-heavy entropy bytes — the stuffing path."""
    img = np.full((8, 16), 255, dtype=np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(img)) == img).all()
    img0 = np.zeros((8, 8), dtype=np.uint8)
    assert (decode_jpeg_gray(encode_jpeg_gray(img0)) == img0).all()


def test_decode_image_dispatches_jpeg():
    assert decode_image(encode_jpeg_card(5)).shape == (16, 16)


def test_corrupt_streams_raise_bounded():
    good = encode_jpeg_gray(np.zeros((8, 8), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xe0 fake")
    with pytest.raises(ValueError):
        decode_jpeg_gray(good[: len(good) // 2])  # truncated entropy data
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg at all")


def test_marker_walk_skips_appn():
    """APPn/COM segments before SOF must be skipped, as real camera
    files have them."""
    img = (np.arange(64, dtype=np.uint8)).reshape(8, 8)
    raw = encode_jpeg_gray(img)
    app0 = b"\xff\xe0" + (14).to_bytes(2, "big") + b"JFIF\x00" + bytes(7)
    patched = raw[:2] + app0 + raw[2:]
    assert int(np.abs(decode_jpeg_gray(patched).astype(int) - img.astype(int)).max()) <= 1

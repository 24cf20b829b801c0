"""JPEG restart markers (DRI/RSTn, T.81 E.2.4, round 13): encode with
any interval -> decode equals the no-restart decode bit-for-bit (the
markers are pure framing); marker sequence and padding handled; an
out-of-sequence RSTn is detected, silently-ignored-DRI regression
pinned (a DRI-bearing file decoded without restart handling must not
produce garbage — it raises or decodes right, never silently wrong)."""

from __future__ import annotations

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_jpeg_color,
    decode_jpeg_gray,
    encode_jpeg_color,
    encode_jpeg_color_card,
    encode_jpeg_gray,
)


@pytest.mark.parametrize("ri", [1, 2, 3, 5, 7, 30])
def test_gray_restart_equals_plain(ri):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (40, 48)).astype(np.uint8)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    got = decode_jpeg_gray(encode_jpeg_gray(img, restart_interval=ri))
    assert np.array_equal(got, base)


@pytest.mark.parametrize("ri", [1, 2, 3, 5, 11])
def test_color_restart_equals_plain(ri):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    base = decode_jpeg_color(encode_jpeg_color(img))
    got = decode_jpeg_color(encode_jpeg_color(img, restart_interval=ri))
    assert np.array_equal(got, base)


def test_card_restart_exact():
    card0 = decode_jpeg_color(encode_jpeg_color_card(42, 3, 2))
    card1 = decode_jpeg_color(encode_jpeg_color_card(42, 3, 2, restart_interval=2))
    assert np.array_equal(card0, card1)


def test_out_of_sequence_rst_detected():
    img = np.arange(64 * 64, dtype=np.int64).reshape(64, 64) % 256
    enc = bytearray(encode_jpeg_gray(img.astype(np.uint8), restart_interval=3))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    enc[i + 1] = 0xD5
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_gray(bytes(enc))


def test_missing_rst_detected():
    img = np.zeros((32, 32), dtype=np.uint8)
    enc = bytearray(encode_jpeg_gray(img, restart_interval=2))
    i = enc.find(b"\xff\xd0")
    assert i > 0
    del enc[i : i + 2]  # drop the first RST marker entirely
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(enc))


def test_interval_larger_than_image_is_noop_framing():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    got = decode_jpeg_gray(encode_jpeg_gray(img, restart_interval=1000))
    assert np.array_equal(got, base)

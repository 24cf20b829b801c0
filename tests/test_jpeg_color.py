"""Baseline 4:2:0 color JPEG codec (round 10, VERDICT r9 #8) plus the
odd-dimension MCU-padding fix for the grayscale decoder (advisor r9)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions import multimodal as M


def test_color_card_bit_exact_closed_form():
    """Constant 16x16 MCUs survive the full 4:2:0 pipeline bit-exactly,
    matching the closed-form fixed-point round trip the SQL oracle
    enumerates — for several doc_ids and card sizes."""
    for doc_id in (0, 1, 42, 255, 9999):
        img = M.decode_jpeg_color(M.encode_jpeg_color_card(doc_id, 3, 2))
        assert img.shape == (32, 48, 3)
        for my in range(2):
            for mx in range(3):
                r = (doc_id * 5 + mx * 11 + my * 3) % 256
                g = (doc_id * 9 + mx * 7 + my * 13) % 256
                b = (doc_id * 3 + mx * 17 + my * 5) % 256
                exp = M.jpeg_color_roundtrip_rgb(r, g, b)
                mcu = img[my * 16 : (my + 1) * 16, mx * 16 : (mx + 1) * 16]
                assert (mcu == mcu[0, 0]).all(), "MCU must stay constant"
                assert tuple(int(x) for x in mcu[0, 0]) == exp, (doc_id, mx, my)


def test_color_roundtrip_constant_within_one():
    """The fixed-point YCbCr round trip moves any CONSTANT color by at
    most 1 per channel (chroma subsampling is exact on constants)."""
    worst = 0
    for r in range(0, 256, 23):
        for g in range(0, 256, 29):
            for b in range(0, 256, 31):
                er, eg, eb = M.jpeg_color_roundtrip_rgb(r, g, b)
                worst = max(worst, abs(er - r), abs(eg - g), abs(eb - b))
    assert worst <= 1, worst


def test_color_roundtrip_smooth_gradient_tolerance():
    """A smooth gradient (the natural-image case 4:2:0 is built for)
    round-trips within a small per-channel tolerance."""
    yy, xx = np.mgrid[0:32, 0:48]
    img0 = np.stack(
        [(yy * 3 + xx) % 200 + 20, (xx * 2) % 180 + 40, (yy * 4) % 160 + 60], axis=2
    ).astype(np.uint8)
    img1 = M.decode_jpeg_color(M.encode_jpeg_color(img0))
    diff = np.abs(img0.astype(int) - img1.astype(int))
    assert diff.max() <= 16, diff.max()  # chroma edges of the modular wrap
    assert diff.mean() < 4.0, diff.mean()


def test_color_encoder_validates_shape():
    with pytest.raises(ValueError, match="multiples of 16"):
        M.encode_jpeg_color(np.zeros((8, 8, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="not a JPEG"):
        M.decode_jpeg_color(b"nope")


def test_decode_image_dispatches_on_sof_components():
    color = M.encode_jpeg_color_card(7, 2, 2)
    gray = M.encode_jpeg_card(7, 2, 2)
    assert M.decode_image(color).shape == (32, 32, 3)
    assert M.decode_image(gray).shape == (16, 16)


def _patch_sof_dims(payload: bytes, h: int, w: int, ncomp: int) -> bytes:
    """Rewrite SOF0's height/width in place (entropy stream untouched —
    exactly what an external odd-dimension, MCU-padded JPEG looks like)."""
    i, n = 2, len(payload)
    while i + 4 <= n:
        marker = struct.unpack(">H", payload[i : i + 2])[0]
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if marker == 0xFFC0:
            return payload[: i + 5] + struct.pack(">HH", h, w) + payload[i + 9 :]
        i += 2 + ln
    raise AssertionError("no SOF0")


def test_gray_odd_dimensions_decode_via_padded_canvas():
    """An external baseline JPEG with non-multiple-of-8 SOF dimensions
    (MCU-padded entropy stream) must decode and crop — not die with a
    numpy broadcast error (advisor r9)."""
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    payload = _patch_sof_dims(M.encode_jpeg_gray(img), 13, 11, 1)
    out = M.decode_jpeg_gray(payload)
    assert out.shape == (13, 11)
    # near-lossless quant: cropped region matches the source within DCT
    # round-off
    assert np.abs(out.astype(int) - img[:13, :11].astype(int)).max() <= 1


def test_color_odd_dimensions_decode_via_padded_canvas():
    card = M.encode_jpeg_color_card(3, 2, 2)  # 32x32
    out = M.decode_jpeg_color(_patch_sof_dims(card, 25, 19, 3))
    assert out.shape == (25, 19, 3)


def test_color_rejects_unsupported_sampling():
    """A 4:2:2 stream (Y 2x1) must raise the documented contract error,
    not mis-decode."""
    payload = bytearray(M.encode_jpeg_color_card(1, 2, 2))
    i = 2
    while i + 4 <= len(payload):
        marker = struct.unpack(">H", bytes(payload[i : i + 2]))[0]
        (ln,) = struct.unpack(">H", bytes(payload[i + 2 : i + 4]))
        if marker == 0xFFC0:
            payload[i + 11] = 0x21  # Y sampling 2x1
            break
        i += 2 + ln
    with pytest.raises(ValueError, match="unsupported chroma sampling"):
        M.decode_jpeg_color(bytes(payload))


def test_gray_codec_unchanged_round_trip():
    """Regression guard: the r9 grayscale path still round-trips after
    the shared-block refactor."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    out = M.decode_jpeg_gray(M.encode_jpeg_gray(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

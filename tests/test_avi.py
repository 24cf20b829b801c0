"""AVI/MJPEG container (functions/avi.py): chunk-tree roundtrip,
alignment, header cross-checks, and scope gates."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions.avi import (
    avi_mjpeg_read,
    avi_mjpeg_write,
)
from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_jpeg_color,
    encode_jpeg_color,
    encode_jpeg_color_card,
)


def test_roundtrip_and_frame_decode():
    frames = [encode_jpeg_color_card(i * 7 + 1, 3, 2) for i in range(6)]
    avi = avi_mjpeg_write(frames, 48, 32, fps=5)
    out = avi_mjpeg_read(avi)
    assert (out["width"], out["height"], out["fps"]) == (48, 32, 5)
    assert out["frames"] == frames
    for f in out["frames"]:
        assert decode_jpeg_color(f).shape == (32, 48, 3)


def test_odd_sized_frames_word_aligned():
    # the container layer is codec-agnostic: odd-length payloads must
    # come back exactly, with the pad byte consumed by the chunk walk
    odd = b"\xff\xd8" + b"x" * 301
    even = b"\xff\xd8" + b"y" * 300
    avi = avi_mjpeg_write([odd, even, odd], 16, 16)
    out = avi_mjpeg_read(avi)
    assert out["frames"] == [odd, even, odd]


def test_header_frame_count_cross_checked():
    frames = [encode_jpeg_color_card(3, 2, 2)]
    avi = bytearray(avi_mjpeg_write(frames, 32, 32))
    # corrupt dwTotalFrames in avih (offset: RIFF(12) + LIST hdr(12) +
    # avih hdr(8) + 4*4 bytes into avih body)
    i = avi.find(b"avih") + 8 + 16
    struct.pack_into("<I", avi, i, 99)
    with pytest.raises(ValueError, match="frame count mismatch"):
        avi_mjpeg_read(bytes(avi))


def test_non_mjpg_stream_gated():
    frames = [b"\x00" * 10]
    avi = bytearray(avi_mjpeg_write(frames, 8, 8))
    i = avi.find(b"MJPG")  # strh fourcc comes first
    avi[i : i + 4] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        avi_mjpeg_read(bytes(avi))


def test_not_avi_rejected():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_mjpeg_read(b"RIFF\x04\x00\x00\x00WAVE")

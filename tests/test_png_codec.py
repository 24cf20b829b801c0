"""PNG codec: round-trip fidelity vs the PPM twin, all five filter
types, and bounded failure on corrupt payloads (never hangs — the
advisor-r6 PPM finding, pinned for both codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_image,
    decode_png,
    decode_ppm,
    encode_png,
    encode_ppm,
)


@pytest.mark.parametrize("doc_id", [0, 1, 42, 9999])
@pytest.mark.parametrize("dims", [(8, 8), (16, 9), (5, 7), (1, 1), (3, 11)])
def test_png_roundtrip_matches_ppm(doc_id, dims):
    w, h = dims
    png = decode_png(encode_png(doc_id, w, h))
    ppm = decode_ppm(encode_ppm(doc_id, w, h))
    assert png.shape == (h, w, 3)
    assert np.array_equal(png, ppm)


def test_png_exercises_all_five_filters():
    # rows cycle filters y % 5; 6 rows => every filter type appears
    import zlib

    payload = encode_png(7, 4, 6)
    # IDAT starts after signature(8) + IHDR chunk(12+13)
    idat_data = payload[8 + 25 + 8 : -12 - 4]
    raw = zlib.decompress(idat_data)
    stride = 4 * 3 + 1
    assert sorted({raw[y * stride] for y in range(6)}) == [0, 1, 2, 3, 4]


def test_decode_image_routes_png_and_ppm():
    assert decode_image(encode_png(3, 4, 4)).shape == (4, 4, 3)
    assert decode_image(encode_ppm(3, 4, 4)).shape == (4, 4, 3)
    with pytest.raises(ValueError):  # r9: JPEG is real; truncated stream raises
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


@pytest.mark.parametrize(
    "corrupt",
    [
        b"\x89PNG\r\n\x1a\n",  # signature only
        b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR",  # truncated IHDR
        b"not a png at all",
    ],
)
def test_png_corrupt_raises(corrupt):
    with pytest.raises(ValueError):
        decode_png(corrupt)


def test_png_truncated_idat_raises():
    good = encode_png(1, 8, 8)
    with pytest.raises(Exception):  # zlib.error or ValueError, never a hang
        decode_png(good[: len(good) // 2])


@pytest.mark.parametrize(
    "corrupt",
    [b"P6", b"P6\n", b"P6\n8", b"P6\n# comment never ends", b"P6\n8 8\n255"],
)
def test_ppm_truncated_header_raises(corrupt):
    """Advisor-r6: header scans must be bounded — truncated payloads
    raise instead of spinning the executor task forever."""
    with pytest.raises(ValueError):
        decode_ppm(corrupt)

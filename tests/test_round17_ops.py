"""Round-17 tests: the real PPM codec path."""

from __future__ import annotations

import numpy as np

from us_stock_data_pipeline_spark import registry
from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_image,
    decode_ppm,
    encode_ppm,
)

SF = "/root/testdata/sf0.001"


def test_ppm_roundtrip_exact():
    for doc_id in (0, 7, 255, 9999):
        img = decode_ppm(encode_ppm(doc_id, 8, 8))
        assert img.shape == (8, 8, 3)
        assert img.dtype == np.uint8
        # spot-check a pixel against the generator formula
        x, y = 3, 5
        assert img[y, x, 0] == (doc_id * 7 + x * 13 + y * 17) % 256
        assert img[y, x, 1] == (doc_id * 11 + x * 3 + y * 5) % 256
        assert img[y, x, 2] == (doc_id * 13 + x * 19 + y * 23) % 256


def test_ppm_decoder_handles_comments_and_sizes():
    payload = b"P6\n# test card\n4 2\n255\n" + bytes(range(24))
    img = decode_ppm(payload)
    assert img.shape == (2, 4, 3)
    assert img[0, 0, 0] == 0 and img[1, 3, 2] == 23


def test_decode_image_dispatches_ppm_and_gates_rest():
    img = decode_image(encode_ppm(42))
    assert img.shape == (8, 8, 3)
    import pytest

    # round 7: PNG became a REAL codec — a PNG-signature payload now
    # routes to decode_png (and raises ValueError on garbage bytes, not
    # NotImplementedError); round 9: JPEG likewise (ValueError on a
    # truncated stream); only unknown magic stays gated.
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBPVP8 lossy is a video codec")
    with pytest.raises(ValueError):
        decode_image(b"RIFFxxxxWEBP not a codec we have")


def test_ppm_query_covers_all_sources(spark):
    rows = registry.queries()["multimodal_ppm_decode"](spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources
    for r in rows:
        assert r.n_bad_dimensions == 0
        assert r.n_images >= 1
        # channel sums bounded by n_images * 64 pixels * 255
        cap = r.n_images * 64 * 255
        assert 0 < r.sum_r <= cap and 0 < r.sum_g <= cap and 0 < r.sum_b <= cap

"""Round-trip and robustness tests for the BMP and PCM-WAV real codecs
(functions/multimodal.py) — pixel/sample-exact against the PPM twin and
the closed-form generator, plus bounded-failure on corrupt payloads."""

from __future__ import annotations

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions.multimodal import (
    decode_bmp24,
    decode_ppm,
    decode_wav_pcm16,
    encode_bmp24,
    encode_ppm,
    encode_wav_pcm16,
)


@pytest.mark.parametrize("doc_id,w,h", [(0, 7, 5), (123, 7, 5), (9, 4, 3), (77, 11, 2)])
def test_bmp_roundtrip_matches_ppm(doc_id, w, h):
    """BMP's bottom-up BGR padded layout must decode to the exact same
    RGB array as the PPM twin of the same test card."""
    bmp = decode_bmp24(encode_bmp24(doc_id, w, h))
    ppm = decode_ppm(encode_ppm(doc_id, w, h))
    assert bmp.shape == (h, w, 3)
    assert np.array_equal(bmp, ppm)


def test_bmp_padding_is_real():
    # width 7 -> 21-byte rows padded to 24: file larger than packed pixels
    payload = encode_bmp24(5, 7, 5)
    assert len(payload) == 14 + 40 + 24 * 5


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:30],  # truncated header
        lambda b: b"XX" + b[2:],  # bad magic
        lambda b: b[: 14 + 40 + 10],  # truncated pixels
    ],
)
def test_bmp_corrupt_raises(mutate):
    with pytest.raises(ValueError):
        decode_bmp24(mutate(encode_bmp24(1, 7, 5)))


@pytest.mark.parametrize("doc_id,n", [(0, 64), (42, 64), (7, 16)])
def test_wav_roundtrip_closed_form(doc_id, n):
    rate, s = decode_wav_pcm16(encode_wav_pcm16(doc_id, n))
    assert rate == 8000
    t = np.arange(n, dtype=np.int64)
    expect = (doc_id * 31 + t * 97) % 2001 - 1000
    assert np.array_equal(s.astype(np.int64), expect)


def test_wav_tolerates_extra_chunk():
    """RIFF chunk walk must skip unknown (odd-length, word-aligned)
    chunks between fmt and data."""
    payload = bytearray(encode_wav_pcm16(3, 8))
    # splice a 5-byte LIST chunk (odd length -> 1 pad byte) before data
    data_at = payload.index(b"data")
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    spliced = bytes(payload[:data_at]) + extra + bytes(payload[data_at:])
    rate, s = decode_wav_pcm16(spliced)
    assert rate == 8000 and s.size == 8


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated RIFF header
        lambda b: b"RIFX" + b[4:],  # bad magic
        lambda b: b[:-5],  # truncated data chunk
    ],
)
def test_wav_corrupt_raises(mutate):
    with pytest.raises(ValueError):
        decode_wav_pcm16(mutate(encode_wav_pcm16(1, 16)))

"""FLAC codec (functions/flac.py): lossless roundtrip across content
types, block sizes, bit depths and channel modes; hand-crafted streams
for the decoder-only paths (LPC subframes, 5-bit Rice method,
multi-partition residuals, wasted bits, escape partitions); CRC
tamper detection; Hypothesis fuzz."""

from __future__ import annotations

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    _zigzag,
    flac_decode,
    flac_encode,
)


def _roundtrip(channels, sr=16000, bps=16, block=1024):
    enc = flac_encode(channels, sample_rate=sr, bps=bps, block_size=block)
    dec = flac_decode(enc)
    assert dec["sample_rate"] == sr
    assert dec["bps"] == bps
    assert dec["channels"] == channels
    return enc


def test_mono_sine_compresses():
    sine = [int(8000 * math.sin(i * 0.02)) for i in range(5000)]
    enc = _roundtrip([sine])
    assert len(enc) < 0.3 * 2 * len(sine)  # FIXED predictors bite


def test_constant_and_silence():
    _roundtrip([[0] * 3000])
    _roundtrip([[-123] * 700], block=256)


def test_noise_verbatim_near_raw():
    import random

    random.seed(1)
    noise = [random.randint(-32768, 32767) for _ in range(3000)]
    enc = _roundtrip([noise])
    assert len(enc) < 2 * len(noise) + 300  # verbatim + bounded overhead


def test_stereo_modes_and_extremes():
    import random

    random.seed(2)
    left = [int(6000 * math.sin(i * 0.015)) + random.randint(-20, 20) for i in range(4000)]
    right = [l + random.randint(-15, 15) for l in left]
    _roundtrip([left, right])  # mid/side territory
    _roundtrip([[32767, -32768] * 600])
    _roundtrip([list(range(-1000, 1000))], block=333)  # odd tail block
    _roundtrip([[i % 100 - 50 for i in range(999)]] * 3, bps=8, block=192)


def test_crc_tamper_detected():
    enc = bytearray(flac_encode([[i % 50 for i in range(500)]]))
    enc[-3] ^= 0x40  # flip a bit inside the last frame body
    with pytest.raises(ValueError, match="CRC"):
        flac_decode(bytes(enc))


def _handcraft(subframe_bits, bs, bps=16, total=None):
    """Wrap one mono frame (built by `subframe_bits(bw)`) in a valid
    stream: STREAMINFO + header CRC-8 + frame CRC-16."""
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34])
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(0, 3)  # mono
    si.write(bps - 1, 5)
    si.write(total if total is not None else bs, 36)
    out += si.bytes() + b"\x00" * 16
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)  # 16-bit block size follows
    hdr.write(0, 4)  # sample rate from STREAMINFO
    hdr.write(0, 4)  # mono
    hdr.write(0b100, 3)  # 16 bps
    hdr.write(0, 1)
    hdr.align()
    head = bytearray(hdr.bytes()) + _utf8_coded(0) + struct.pack(">H", bs - 1)
    head.append(_crc8(bytes(head)))
    body = _BitWriter()
    subframe_bits(body)
    body.align()
    frame = bytes(head) + body.bytes()
    out += frame + struct.pack(">H", _crc16(frame))
    return bytes(out)


def test_decode_lpc_subframe():
    # LPC order 2, coeffs [3, -1], shift 1: pred = (3*a - b) >> 1
    warm = [100, 103]
    residual = [5, -2, 0, 7, -9, 1, 3, -4, 2, 0, 1, -1, 6, -6]
    bs = len(warm) + len(residual)

    def bits(bw):
        bw.write(0, 1)
        bw.write(32 + (2 - 1), 6)  # LPC, order 2
        bw.write(0, 1)  # no wasted bits
        for w in warm:
            bw.write_signed(w, 16)
        bw.write(12 - 1, 4)  # precision 12
        bw.write_signed(1, 5)  # shift 1
        bw.write_signed(3, 12)
        bw.write_signed(-1, 12)
        bw.write(0, 2)  # rice method 0
        bw.write(0, 4)  # partition order 0
        bw.write(2, 4)  # rice param 2
        for r in residual:
            u = _zigzag(r)
            bw.write_unary(u >> 2)
            bw.write(u & 3, 2)

    dec = flac_decode(_handcraft(bits, bs))
    expect = list(warm)
    for r in residual:
        expect.append(((3 * expect[-1] - 1 * expect[-2]) >> 1) + r)
    assert dec["channels"][0] == expect


def test_decode_rice2_multi_partition_and_wasted_bits():
    # FIXED order 1, wasted bits 2, 5-bit rice method, partition order 1
    bs = 8
    warm_eff = [25]  # effective (pre-shift) values
    res = [1, -2, 3, 0, -1, 2, -3]  # 7 residuals; partitions: 3 + 4

    def bits(bw):
        bw.write(0, 1)
        bw.write(0b001000 | 1, 6)  # FIXED order 1
        bw.write(1, 1)  # wasted bits flag
        bw.write(1, 2)  # unary 01 -> wasted = 2
        bw.write_signed(warm_eff[0], 14)  # bps 16 - wasted 2
        bw.write(1, 2)  # rice method 1 (5-bit params)
        bw.write(1, 4)  # partition order 1 -> 2 partitions
        bw.write(1, 5)  # partition 0 param (covers bs/2 - order = 3)
        for r in res[:3]:
            u = _zigzag(r)
            bw.write_unary(u >> 1)
            bw.write(u & 1, 1)
        bw.write(31, 5)  # partition 1: ESCAPE
        bw.write(6, 5)  # 6 raw bits each
        for r in res[3:]:
            bw.write_signed(r, 6)

    dec = flac_decode(_handcraft(bits, bs))
    eff = list(warm_eff)
    for r in res:
        eff.append(eff[-1] + r)
    assert dec["channels"][0] == [v << 2 for v in eff]


@settings(max_examples=30, deadline=None)
@given(
    data=st.lists(st.integers(-32768, 32767), min_size=1, max_size=700),
    block=st.sampled_from([64, 192, 256, 1000]),
    stereo=st.booleans(),
)
def test_fuzz_roundtrip(data, block, stereo):
    chans = [data, [(-v) & 0x7FFF for v in data]] if stereo else [data]
    _roundtrip(chans, block=block)


def test_encoder_picks_lpc_on_tonal_content():
    from us_stock_data_pipeline_spark.functions.flac import _lpc_analyze

    tone = [
        int(9000 * math.sin(i * 0.07) + 4000 * math.sin(i * 0.19 + 1.0))
        for i in range(4096)
    ]
    r = _lpc_analyze(tone)
    assert r is not None and 1 <= r[0] <= 8
    enc = _roundtrip([tone])
    assert len(enc) < 0.4 * 2 * len(tone)  # LPC-level compression


def test_lpc_roundtrip_matrix():
    import random

    random.seed(17)
    for chans, kw in [
        ([[2000 + int(100 * math.sin(i * 0.5)) for i in range(2000)]], dict(block=192)),
        (
            [
                [int(5000 * math.sin(i * 0.03)) for i in range(4000)],
                [int(5000 * math.sin(i * 0.03 + 0.2)) for i in range(4000)],
            ],
            {},
        ),
        ([[int(30000 * math.sin(i * 0.001)) for i in range(5000)]], {}),
    ]:
        _roundtrip(chans, **kw)

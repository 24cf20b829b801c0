"""Round-12 advisor fixes, pinned:

1. VP8L predictor 13 (ClampAddSubtractHalf) must use C division
   truncating toward ZERO (libwebp AddSubtractComponentHalf), not
   Python floor division — off by one whenever avg < TL with an odd
   difference.
2. VP8L last-column top-right fallback is the leftmost pixel of the
   CURRENT row (flat index (y-1)*w + w == (y, 0)), not the row above.
3. Progressive COLOR JPEG is valid-but-unsupported -> NotImplementedError
   (gate convention), not ValueError.
4. lz4_frame_compress derives the BD byte from block_size (blocks never
   exceed the declared maximum) and emits no blocks for empty input.

The predictor pins decode HAND-CRAFTED VP8L streams (residuals chosen by
the test) and compare against an INDEPENDENT pure-Python reference
reconstruction with C-truncating semantics, so an encoder/decoder bug
pair cannot cancel out the way a plain round trip would let it.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import multimodal as M


# ---------------------------------------------------------------- helpers
def _craft_predictor_stream(resid_argb: np.ndarray, mode: int) -> bytes:
    """Build a VP8L stream: one global predictor-transform cell `mode`
    (size_bits=9 -> a single 512x512 block) followed by the given
    residuals literal-coded. Residuals are in A,R,G,B channel order."""
    h, w, _ = resid_argb.shape
    bw = M._VP8LBitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(1, 1)  # transform present
    bw.put(0, 2)  # predictor transform
    bw.put(9 - 2, 3)  # size_bits = 9
    sub = np.zeros((1, 1, 4), dtype=np.uint8)
    sub[0, 0] = (255, 0, mode, 0)  # mode rides the green channel
    M._vp8l_write_entropy_image(bw, sub, allow_meta=False)
    bw.put(0, 1)  # no more transforms
    M._vp8l_write_entropy_image(bw, resid_argb.astype(np.uint8), allow_meta=True)
    body = b"\x2f" + bw.flush()
    padded = body + (b"\x00" if len(body) % 2 else b"")
    chunk = b"VP8L" + struct.pack("<I", len(body)) + padded
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _trunc_half(d: int) -> int:
    """C integer division by 2: truncates toward zero."""
    return d // 2 if d >= 0 else -((-d) // 2)


def _ref_reconstruct(resid_argb: np.ndarray, mode: int) -> np.ndarray:
    """Independent RFC 9649 / libwebp reference reconstruction, plain
    Python ints, per-channel, with the spec's flat-buffer neighbor
    definitions (TR of the last column = (y, 0) of the CURRENT row) and
    C-truncating arithmetic. Supports the modes the pins use."""
    h, w, _ = resid_argb.shape
    img = np.zeros((h, w, 4), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = tuple(int(v) for v in img[0, x - 1])
            elif x == 0:
                pred = tuple(int(v) for v in img[y - 1, 0])
            else:
                L = tuple(int(v) for v in img[y, x - 1])
                T = tuple(int(v) for v in img[y - 1, x])
                TL = tuple(int(v) for v in img[y - 1, x - 1])
                TR = (
                    tuple(int(v) for v in img[y - 1, x + 1])
                    if x + 1 < w
                    else tuple(int(v) for v in img[y, 0])
                )
                if mode == 3:
                    pred = TR
                elif mode == 5:
                    pred = tuple(((l + tr) // 2 + t) // 2 for l, t, tr in zip(L, T, TR))
                elif mode == 9:
                    pred = tuple((t + tr) // 2 for t, tr in zip(T, TR))
                elif mode == 13:
                    pred = tuple(
                        min(255, max(0, (l + t) // 2 + _trunc_half((l + t) // 2 - tl)))
                        for l, t, tl in zip(L, T, TL)
                    )
                else:  # pragma: no cover - guard for test-authoring mistakes
                    raise AssertionError(f"reference lacks mode {mode}")
            img[y, x] = [(int(r) + p) & 0xFF for r, p in zip(resid_argb[y, x], pred)]
    return img.astype(np.uint8)


def _decode_as_argb(payload: bytes) -> np.ndarray:
    rgba = M.decode_webp_lossless(payload)
    return rgba[:, :, [3, 0, 1, 2]]  # back to A,R,G,B for comparison


# ------------------------------------------------- predictor 13 (advice 1)
def test_predictor13_truncating_division_avg_lt_tl():
    """Hand-crafted stream: residuals force avg < TL with odd diffs.
    Row 0 seeds large values via L-chain; row 1 small ones. The decoded
    pixels must match the C-truncating reference — floor division is
    off by one here (e.g. avg=10, TL=13 -> 9, floor gives 8)."""
    resid = np.zeros((3, 4, 4), dtype=np.uint8)
    # row 0: (0,0)=12 then +1 -> 13, giving TL=12 / T=13 at pixel (1,1)
    resid[0, 0] = (0, 12, 12, 12)
    resid[0, 1] = (0, 1, 1, 1)
    # row 1: (1,0) fallback predicts from (0,0)=12; residual 254 -> 10
    resid[1, 0] = (0, 254, 254, 254)
    # => at (1,1): L=10, T=13, avg=11, TL=12, d=-1 (negative AND odd)
    payload = _craft_predictor_stream(resid, 13)
    got = _decode_as_argb(payload)
    want = _ref_reconstruct(resid, 13)
    assert (got == want).all(), f"\ngot:\n{got[:, :, 2]}\nwant:\n{want[:, :, 2]}"
    # sanity: the crafted image actually hits the avg<TL odd-diff branch
    # at (1,1): L=10, T=13 -> avg=11, TL=13 -> d=-2 even... check (1,2):
    # reconstruct by hand to make sure at least one odd negative d occurred
    hits = 0
    for y in range(1, 3):
        for x in range(1, 4):
            L = int(want[y, x - 1, 2])
            T = int(want[y - 1, x, 2])
            TL = int(want[y - 1, x - 1, 2])
            d = (L + T) // 2 - TL
            if d < 0 and d % 2 != 0:
                hits += 1
    assert hits > 0, "test vector failed to exercise the odd-negative branch"


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**31),
)
def test_predictor13_fuzz_vs_reference(h, w, seed):
    rng = np.random.default_rng(seed)
    resid = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    payload = _craft_predictor_stream(resid, 13)
    assert (_decode_as_argb(payload) == _ref_reconstruct(resid, 13)).all()


# --------------------------------------------- last-column TR (advice 2)
@pytest.mark.parametrize("mode", [3, 5, 9])
def test_last_column_tr_is_current_row_leftmost(mode):
    """Hand-crafted multi-column stream on the TR-using predictors: the
    last column's TR must read (y, 0) of the current row, which differs
    from img[y-1, 0] whenever column 0 changed between the rows."""
    resid = np.zeros((3, 3, 4), dtype=np.uint8)
    resid[0, 0] = (0, 40, 40, 40)
    resid[1, 0] = (0, 100, 100, 100)  # column 0 changes every row
    resid[2, 0] = (0, 77, 77, 77)
    resid[1, 2] = (0, 5, 9, 3)  # non-zero residual at a last-column pixel
    payload = _craft_predictor_stream(resid, mode)
    got = _decode_as_argb(payload)
    want = _ref_reconstruct(resid, mode)
    assert (got == want).all(), f"mode {mode}\ngot:\n{got[:, :, 2]}\nwant:\n{want[:, :, 2]}"


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=2, max_value=10),
    st.integers(min_value=0, max_value=2**31),
    st.sampled_from([3, 5, 9]),
)
def test_tr_predictors_fuzz_vs_reference(h, w, seed, mode):
    rng = np.random.default_rng(seed)
    resid = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    payload = _craft_predictor_stream(resid, mode)
    assert (_decode_as_argb(payload) == _ref_reconstruct(resid, mode)).all()


# ------------------------------------- all-mode encoder round trip (new)
@settings(max_examples=28, deadline=None)
@given(
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=2, max_value=12),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=13),
)
def test_roundtrip_every_predictor_mode(h, w, seed, mode):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    enc = M.encode_webp_lossless(img, transform="predictor", predictor_mode=mode)
    assert (M.decode_webp_lossless(enc) == img).all()


# ------------------------------------ progressive color JPEG (advice 3)
def test_progressive_color_jpeg_now_decodes_for_real():
    """Round 13 retires the r12 NotImplementedError gate: a valid SOF2
    3-component payload routes to decode_jpeg_color_progressive.
    A TRUNCATED stream (SOF but no SOS/EOI) is a ValueError — the gate
    convention now applies only to lossy VP8."""
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 2 + 1 + 2 + 2 + 1 + 3 * 3)
        + bytes([8])  # precision
        + struct.pack(">HH", 8, 8)  # height, width
        + bytes([3])  # 3 components
        + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):  # routed to the real decoder: no SOS
        M.decode_image(sof2)
    # a complete progressive color payload decodes end to end
    img = M.decode_image(M.encode_jpeg_progressive_color_card(3, 2, 2))
    assert img.shape == (32, 32, 3)
    # grayscale progressive still routes to the real decoder (and fails
    # later for this truncated stream with ValueError, not the gate)
    gray = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">H", 2 + 1 + 2 + 2 + 1 + 3)
        + bytes([8])
        + struct.pack(">HH", 8, 8)
        + bytes([1])
        + bytes([1, 0x11, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        M.decode_image(gray)


# ---------------------------------------------- LZ4 frame BD (advice 4)
def test_lz4_frame_bd_derived_from_block_size():
    src = bytes(range(256)) * 1200  # ~300 KB, incompressible-ish pattern
    for block_size, bd_id in ((1 << 16, 4), (100_000, 5), (1 << 18, 5), (1 << 20, 6), (1 << 22, 7)):
        frame = M.lz4_frame_compress(src, block_size=block_size)
        assert frame[5] == bd_id << 4, (block_size, frame[5])
        assert M.lz4_frame_decompress(frame) == src
    with pytest.raises(ValueError):
        M.lz4_frame_compress(b"x", block_size=(1 << 22) + 1)
    with pytest.raises(ValueError):
        M.lz4_frame_compress(b"x", block_size=0)


def test_lz4_frame_empty_input_has_no_blocks():
    frame = M.lz4_frame_compress(b"")
    # magic(4) + FLG + BD + HC + endmark(4) + content-checksum(4) = 15
    assert len(frame) == 15
    assert frame[7:11] == b"\x00\x00\x00\x00"  # end mark directly after header
    assert M.lz4_frame_decompress(frame) == b""

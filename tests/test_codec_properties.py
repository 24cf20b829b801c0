"""Hypothesis property tests for the round-10 codecs: LZW roundtrip on
arbitrary byte strings, IMA ADPCM vectorized-vs-scalar equivalence on
arbitrary states, mu-law expansion bounds, and FWHT linearity/Parseval
on arbitrary clips — the fuzz layer above the fixed-vector unit tests."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import multimodal as M


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=3000))
def test_lzw_roundtrip_arbitrary_bytes(data):
    back = M._lzw_decompress(M._lzw_compress(data, 8), 8, len(data))
    assert back.tobytes() == data


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=8),
    st.binary(min_size=1, max_size=400),
)
def test_lzw_roundtrip_small_alphabets(nsym, raw):
    # Repetitive small-alphabet data maximizes dictionary churn and the
    # KwKwK frequency; min_code_size stays 8 as in GIF with a 256 GCT.
    data = bytes(b % nsym for b in raw)
    back = M._lzw_decompress(M._lzw_compress(data, 8), 8, len(data))
    assert back.tobytes() == data


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=-32768, max_value=32767),
    st.integers(min_value=0, max_value=88),
    st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=128),
)
def test_adpcm_vectorized_equals_scalar(pred0, idx0, nibs):
    got = M.ima_adpcm_decode(pred0, idx0, np.array(nibs, dtype=np.int64))
    # independent scalar recurrence (same tables, explicit ifs)
    step_t = [int(x) for x in M._IMA_STEP_TABLE]
    idx_t = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]
    pred, idx = pred0, idx0
    exp = [pred]
    for nib in nibs:
        step = step_t[idx]
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = pred - diff if nib & 8 else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + idx_t[nib]))
        exp.append(pred)
    assert got.tolist() == exp
    assert (np.abs(got) <= 32768).all()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=256))
def test_ulaw_expansion_bounds_and_determinism(codes):
    arr = np.array(codes)
    out = M.ulaw_expand(arr)
    assert (np.abs(out) <= 32124).all()
    assert (out == M.ulaw_expand(arr)).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=-2000, max_value=2000), min_size=64, max_size=64),
        min_size=1,
        max_size=8,
    )
)
def test_fwht_parseval_and_linearity(clips):
    S = np.array(clips, dtype=np.int64)
    C = M.fwht_many(S)
    # Parseval: sum c^2 == N * sum s^2, exactly, per clip
    assert ((C * C).sum(axis=1) == 64 * (S * S).sum(axis=1)).all()
    # Linearity: FWHT(2s) == 2 FWHT(s)
    assert (M.fwht_many(2 * S) == 2 * C).all()
    # Involution up to N: FWHT(FWHT(s)) == N * s
    assert (M.fwht_many(C) == 64 * S).all()


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_gif_truncation_raises_valueerror_uniformly(doc_id, data):
    """Advisor r10: every decoder in the module promises ValueError on a
    truncated payload — decode_gif must never leak IndexError from its
    sub-block walk."""
    payload = M.encode_gif(doc_id)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.decode_gif(payload[:cut])


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=2**31),
)
def test_progressive_jpeg_equals_baseline_roundtrip(bh, bw, seed):
    """decode_progressive(encode_progressive(x)) must equal
    decode_baseline(encode_baseline(x)) BIT-FOR-BIT: both pipelines
    quantize the same DCT coefficients, so any divergence is a Huffman/
    EOBRUN/spectral-band bug, not rounding."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (8 * bh, 8 * bw)).astype(np.uint8)
    base = M.decode_jpeg_gray(M.encode_jpeg_gray(img))
    prog = M.decode_jpeg_gray_progressive(M.encode_jpeg_gray_progressive(img))
    assert (base == prog).all()
    # and the progressive decoder reads BASELINE layouts too
    assert (M.decode_jpeg_gray_progressive(M.encode_jpeg_gray(img)) == base).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_progressive_jpeg_truncation_raises_valueerror(doc_id, data):
    payload = M.encode_jpeg_progressive_card(doc_id)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.decode_jpeg_gray_progressive(payload[:cut])


def test_progressive_jpeg_band_splits_and_eobrun():
    """Multiple spectral-selection splits reconstruct identically, and
    the constant card's AC scans really do use multi-block EOBn runs
    (payload much smaller than a per-block-EOB encoding would be)."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (24, 16)).astype(np.uint8)
    want = M.decode_jpeg_gray(M.encode_jpeg_gray(img))
    for bands in [((1, 63),), ((1, 1), (2, 62), (63, 63)), ((1, 10), (11, 63))]:
        got = M.decode_jpeg_gray_progressive(
            M.encode_jpeg_gray_progressive(img, bands=bands)
        )
        assert (got == want).all(), bands


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31),
)
def test_progressive_jpeg_successive_approximation(bh, bw, seed):
    """Full SOF2 feature matrix: the 4-scan successive-approximation
    script (DC@Al=1, AC@Al=1, DC refine, AC refine with correction-bit
    buffering) must reconstruct bit-identically to the baseline round
    trip — any refinement desync shows as off-by-one coefficients."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (8 * bh, 8 * bw)).astype(np.uint8)
    base = M.decode_jpeg_gray(M.encode_jpeg_gray(img))
    sa = M.decode_jpeg_gray_progressive(M.encode_jpeg_gray_progressive_sa(img))
    assert (base == sa).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_sa_jpeg_truncation_raises_valueerror(doc_id, data):
    ys, xs = np.mgrid[0:16, 0:16]
    img = ((doc_id + xs * 3 + ys * 5) % 256).astype(np.uint8)
    payload = M.encode_jpeg_gray_progressive_sa(img)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.decode_jpeg_gray_progressive(payload[:cut])

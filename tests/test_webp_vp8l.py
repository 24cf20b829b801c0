"""Lossless WebP (VP8L) codec: exact round trips across every decoder
feature path (transforms, color cache, LZ77 incl. 2D distance codes,
simple/normal Huffman, meta-free sub-images), truncation uniformity, and
container dispatch."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from us_stock_data_pipeline_spark.functions import multimodal as M


def _rt(img, **kw):
    return M.decode_webp_lossless(M.encode_webp_lossless(img, **kw))


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**31),
    st.booleans(),
    st.sampled_from([0, 4, 8]),
    st.booleans(),
)
def test_roundtrip_literal_paths(h, w, seed, subtract_green, cache_bits, lz77):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    out = _rt(img, subtract_green=subtract_green, cache_bits=cache_bits, lz77=lz77)
    assert (out == img).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=2, max_value=20),
    st.integers(min_value=0, max_value=2**31),
    st.sampled_from(["predictor", "color"]),
)
def test_roundtrip_spatial_transforms(h, w, seed, transform):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    assert (_rt(img, transform=transform) == img).all()
    # transforms compose with cache + LZ77
    assert (_rt(img, transform=transform, cache_bits=5, lz77=True) == img).all()


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31),
    st.sampled_from([2, 3, 9, 17, 40]),
)
def test_roundtrip_palette_with_packing(h, w, seed, n_colors):
    """Color-indexing: n<=2 packs 8/px-byte, <=4 packs 4, <=16 packs 2,
    else unpacked — every packing width round-trips."""
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 4)).astype(np.uint8)
    idx = rng.integers(0, n_colors, (h, w))
    img = palette[idx]
    assert (_rt(img, transform="palette") == img).all()


def test_low_entropy_images_use_runs_and_cache():
    """Flat and striped images exercise LZ77 runs (incl. the vertical
    dist=w match through the 2D neighbor map) and cache hits."""
    flat = np.full((12, 12, 4), 200, np.uint8)
    stripes = np.tile(
        np.array([[10, 20, 30, 255], [40, 50, 60, 255]], np.uint8)[None, :, :],
        (10, 6, 1),
    )
    for img in (flat, stripes):
        for kw in (
            {"lz77": True},
            {"lz77": True, "cache_bits": 6},
            {"lz77": True, "subtract_green": True},
        ):
            assert (_rt(img, **kw) == img).all()


def test_vertical_match_emits_2d_distance_code():
    """A two-identical-rows image with LZ77 must produce a backref with
    dist == width, which the encoder maps through the 2D neighbor table
    (code 1 = (0, 1)) — decode proves the 2D path end to end."""
    rng = np.random.default_rng(5)
    row = rng.integers(0, 256, (1, 9, 4)).astype(np.uint8)
    img = np.vstack([row, row, row])
    assert (_rt(img, lz77=True) == img).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000), st.data())
def test_truncation_raises_valueerror(doc_id, data):
    payload = M.encode_webp_card(doc_id)
    cut = data.draw(st.integers(min_value=0, max_value=len(payload) - 1))
    with pytest.raises(ValueError):
        M.decode_webp_lossless(payload[:cut])


def test_dispatch_and_gates():
    card = M.encode_webp_card(3)
    assert M.decode_image(card).shape == (16, 16, 4)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"RIFFxxxxWEBPVP8 lossy")
    with pytest.raises(ValueError):
        M.decode_image(b"RIFFxxxxWEBPJUNKgarbage")


def test_card_matches_closed_form():
    img = M.decode_webp_lossless(M.encode_webp_card(7))
    ys, xs = np.mgrid[0:16, 0:16]
    assert (img[:, :, 0] == (7 * 7 + xs * 3 + ys * 11) % 256).all()
    assert (img[:, :, 1] == (7 * 13 + xs * 5 + ys * 17) % 256).all()
    assert (img[:, :, 2] == (7 * 3 + xs * 19 + ys * 7) % 256).all()
    assert (img[:, :, 3] == 255).all()


def test_distance_map_shape():
    """The 2D neighbor table: 120 unique in-range offsets, nearest
    first, (0,1) and (1,0) leading — the spec's generation rule."""
    m = M._VP8L_DIST_MAP
    assert len(m) == 120 and len(set(m)) == 120
    assert m[0] == (0, 1) and m[1] == (1, 0)
    d2 = [dx * dx + dy * dy for dx, dy in m]
    assert d2 == sorted(d2)
    assert all(0 <= dy <= 7 and -8 <= dx <= 8 for dx, dy in m)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=2, max_value=28),
    st.integers(min_value=2, max_value=28),
    st.integers(min_value=0, max_value=2**31),
    st.sampled_from([2, 3, 5]),
)
def test_roundtrip_meta_huffman_groups(h, w, seed, meta_bits):
    """Meta-Huffman: two entropy groups split left/right at block
    granularity — the decoder must dispatch each pixel to its block's
    group codes."""
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
    assert (_rt(img, meta_bits=meta_bits) == img).all()

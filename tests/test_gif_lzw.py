"""GIF87a / LZW codec property tests (round 10): variable-width code
schedule sync, KwKwK, deferred clear at 4096, container walk, and the
closed-form card/palette oracle contract."""

from __future__ import annotations

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions import multimodal as M


def test_card_roundtrip_matches_closed_form():
    for doc_id in (0, 1, 23, 999, 123456):
        img = M.decode_gif(M.encode_gif(doc_id, 24, 16))
        assert img.shape == (16, 24, 3)
        y, x = np.mgrid[0:16, 0:24]
        idx = (doc_id * 3 + x * 7 + y * 11) % 256
        assert (img == M._gif_palette(idx)).all()


def test_lzw_random_roundtrip_across_width_boundaries():
    rng = np.random.default_rng(42)
    # Sizes chosen so the dictionary crosses the 512/1024/2048/4096
    # boundaries (width 9 -> 10 -> 11 -> 12 -> deferred clear).
    for n in (300, 700, 1500, 3000, 8000, 70000):
        data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        back = M._lzw_decompress(M._lzw_compress(data, 8), 8, n)
        assert back.tobytes() == data


def test_lzw_small_alphabet_and_kwkwk():
    # 'abababab...' forces the KwKwK case (decoder reads the code it is
    # about to define); tiny alphabets grow long dictionary chains.
    for pattern in (b"ab" * 3000, b"aaaa" * 2000, bytes(range(4)) * 2500):
        back = M._lzw_decompress(M._lzw_compress(pattern, 8), 8, len(pattern))
        assert back.tobytes() == pattern


def test_lzw_kwkwk_minimal():
    # The canonical minimal KwKwK stream: the second emitted code equals
    # the decoder's next free slot exactly when input starts KwKwK with
    # the dictionary still fresh.
    data = b"\x01\x02\x01\x02\x01"
    back = M._lzw_decompress(M._lzw_compress(data, 8), 8, len(data))
    assert back.tobytes() == data


def test_lzw_compresses_repetitive_data():
    data = b"x" * 10_000
    lzw = M._lzw_compress(data, 8)
    assert len(lzw) < len(data) // 10  # real compression, not a passthrough


def test_lzw_error_paths():
    data = b"hello world hello world"
    lzw = M._lzw_compress(data, 8)
    with pytest.raises(ValueError, match="truncated"):
        M._lzw_decompress(lzw[:3], 8, len(data))
    with pytest.raises(ValueError, match="short of"):
        M._lzw_decompress(lzw, 8, len(data) + 5)
    with pytest.raises(ValueError, match="exceeds"):
        M._lzw_decompress(lzw, 8, len(data) - 5)


def test_gif_container_errors():
    good = M.encode_gif(7)
    with pytest.raises(ValueError, match="not a GIF"):
        M.decode_gif(b"JUNK" + good[4:])
    # Flip the GCT-present bit: decoder must refuse, not misparse.
    bad = bytearray(good)
    bad[10] &= 0x7F
    with pytest.raises(ValueError, match="global color table"):
        M.decode_gif(bytes(bad))


def test_gif89a_extension_blocks_are_skipped():
    # Splice a Graphic Control Extension (0x21 0xF9) before the image
    # descriptor and relabel as 89a: decoder must skip it cleanly.
    good = M.encode_gif(11)
    gct_end = 13 + 3 * 256
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = b"GIF89a" + good[6:gct_end] + ext + good[gct_end:]
    assert (M.decode_gif(spliced) == M.decode_gif(good)).all()


def test_gif_decode_batch_kernel():
    import pandas as pd

    ids = [0, 23, 46]
    pdf = pd.DataFrame({"doc_id": ids, "payload": [M.encode_gif(d) for d in ids]})
    out = next(M.gif_decode_batch(iter([pdf])))
    for _, row in out.iterrows():
        img = M.decode_gif(M.encode_gif(int(row["doc_id"]))).astype(np.int64)
        assert (row["width"], row["height"]) == (24, 16)
        assert row["sum_r"] == img[:, :, 0].sum()
        assert row["sum_g"] == img[:, :, 1].sum()
        assert row["sum_b"] == img[:, :, 2].sum()


# --------------------------------------------------------------------------
# Adam7 PNG (round 10 — lives here with the other round-10 codec tests)
# --------------------------------------------------------------------------


def test_png_adam7_roundtrip_all_shapes():
    """Adam7 must reproduce the card bit-exactly for shapes that
    exercise full, partial, and EMPTY passes (1x1 leaves only pass 1)."""
    for doc_id in (0, 7, 42, 991):
        for w, h in [(8, 8), (10, 6), (1, 1), (3, 9), (17, 13), (5, 2), (2, 1)]:
            card = M._png_card(doc_id, w, h)
            assert (M.decode_png(M.encode_png(doc_id, w, h, interlace=True)) == card).all()
            assert (M.decode_png(M.encode_png(doc_id, w, h)) == card).all()


def test_png_adam7_payload_is_actually_interlaced():
    # The interlaced stream must differ from the sequential one (the
    # pass serialization reorders rows), while decoding identically.
    a = M.encode_png(5, 10, 6, interlace=True)
    b = M.encode_png(5, 10, 6)
    assert a != b
    import struct
    ihdr = a[16:29]
    *_, interlace = struct.unpack(">IIBBBBB", ihdr)
    assert interlace == 1


def test_png_adam7_truncation_raises():
    import struct, zlib
    good = M.encode_png(3, 10, 6, interlace=True)
    # Corrupt: drop the last pass's bytes from the IDAT payload
    # (re-deflate a shortened raw stream) -> size-mismatch must raise.
    sig, rest = good[:8], good[8:]
    chunks = []
    i = 0
    while i < len(rest):
        (clen,) = struct.unpack(">I", rest[i : i + 4])
        ctype = rest[i + 4 : i + 8]
        data = rest[i + 8 : i + 8 + clen]
        chunks.append((ctype, data))
        i += 12 + clen
    raw = zlib.decompress(b"".join(d for t, d in chunks if t == b"IDAT"))
    bad_idat = zlib.compress(raw[:-5])
    out = bytearray(sig)
    for t, d in chunks:
        if t == b"IDAT":
            d = bad_idat
        out += struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )
    with pytest.raises(ValueError, match="mismatch"):
        M.decode_png(bytes(out))

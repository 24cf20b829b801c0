"""Compressed-audio codecs (round 10, VERDICT r9 What's-missing #4):
G.711 mu-law expansion + container, IMA/DVI ADPCM adaptive-step decode
+ container, and the DEFLATE text-payload roundtrip primitives.

The ADPCM reference below is an INDEPENDENT per-sample transcription of
the IMA Recommended Practices recurrence (scalar loop, explicit ifs) so
the vectorized production kernel is checked against a second
implementation, not against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from us_stock_data_pipeline_spark.functions import multimodal as M


# --------------------------------------------------------------------------
# G.711 mu-law
# --------------------------------------------------------------------------


def _ulaw_expand_scalar(code: int) -> int:
    """Independent scalar transcription of the CCITT G.711 decode."""
    uc = (~code) & 0xFF
    t = ((uc & 0x0F) << 3) + 0x84
    t <<= (uc & 0x70) >> 4
    return (0x84 - t) if (uc & 0x80) else (t - 0x84)


def test_ulaw_expand_all_256_codes():
    codes = np.arange(256)
    got = M.ulaw_expand(codes)
    exp = np.array([_ulaw_expand_scalar(c) for c in range(256)])
    assert (got == exp).all()


def test_ulaw_known_properties():
    # Two zero codes, symmetric max magnitude 32124, sign halves.
    assert M.ulaw_expand(np.array([0xFF]))[0] == 0
    assert M.ulaw_expand(np.array([0x7F]))[0] == 0
    assert M.ulaw_expand(np.array([0x00]))[0] == -32124
    assert M.ulaw_expand(np.array([0x80]))[0] == 32124
    got = M.ulaw_expand(np.arange(256))
    assert (got[:128] <= 0).all() and (got[128:] >= 0).all()
    # Each half is monotonic in code value: the negative half ascends
    # toward 0 (code 0x00 = -32124 ... 0x7F = 0), the positive half
    # descends toward 0 (0x80 = +32124 ... 0xFF = 0).
    assert (np.diff(got[:128]) >= 0).all()
    assert (np.diff(got[128:]) <= 0).all()


def test_ulaw_wav_roundtrip_matches_closed_form():
    for doc_id in (0, 1, 19, 4218):
        rate, s = M.decode_wav_ulaw(M.encode_wav_ulaw(doc_id, 64))
        assert rate == 8000 and s.shape == (64,)
        t = np.arange(64)
        codes = (doc_id * 13 + t * 29) % 256
        assert (s == M.ulaw_expand(codes)).all()


def test_ulaw_wav_container_errors():
    good = M.encode_wav_ulaw(7)
    with pytest.raises(ValueError, match="RIFF"):
        M.decode_wav_ulaw(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="truncated"):
        M.decode_wav_ulaw(good[:-5])
    # PCM16 WAV into the mu-law decoder must refuse, not reinterpret.
    with pytest.raises(ValueError, match="mu-law"):
        M.decode_wav_ulaw(M.encode_wav_pcm16(7))


# --------------------------------------------------------------------------
# IMA ADPCM
# --------------------------------------------------------------------------

_STEP = [int(x) for x in M._IMA_STEP_TABLE]
_IDX = [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_scalar(pred: int, idx: int, nibs) -> list[int]:
    """Independent scalar IMA recurrence (explicit ifs, no numpy)."""
    out = [pred]
    for nib in nibs:
        step = _STEP[idx]
        diff = step >> 3
        if nib & 4:
            diff += step
        if nib & 2:
            diff += step >> 1
        if nib & 1:
            diff += step >> 2
        pred = pred - diff if (nib & 8) else pred + diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + _IDX[nib]))
        out.append(pred)
    return out


def test_adpcm_vectorized_matches_scalar_reference():
    rng = np.random.default_rng(7)
    preds = rng.integers(-32768, 32768, size=40)
    idxs = rng.integers(0, 89, size=40)
    nibs = rng.integers(0, 16, size=(40, 64))
    got = M.ima_adpcm_decode_many(preds, idxs, nibs)
    for k in range(40):
        exp = _ima_decode_scalar(int(preds[k]), int(idxs[k]), nibs[k].tolist())
        assert got[k].tolist() == exp


def test_adpcm_clamp_paths():
    # All-add max-magnitude nibbles from a high predictor: +32767 clamp.
    hi = M.ima_adpcm_decode(32000, 88, np.full(16, 7, dtype=np.int64))
    assert hi.max() == 32767
    # All-subtract from a low predictor: -32768 clamp.
    lo = M.ima_adpcm_decode(-32000, 88, np.full(16, 15, dtype=np.int64))
    assert lo.min() == -32768
    # Index clamps at both ends: decodes stay finite and in range.
    z = M.ima_adpcm_decode(0, 0, np.zeros(32, dtype=np.int64))
    assert (np.abs(z) <= 32767).all()


def test_adpcm_wav_roundtrip_and_block_convention():
    for doc_id in (0, 13, 2002, 80808):
        payload = M.encode_wav_adpcm_ima(doc_id, 64)
        rate, s = M.decode_wav_adpcm_ima(payload)
        assert rate == 8000
        # MS-IMA convention: header predictor is sample 0, then one
        # sample per nibble -> samples_per_block = 1 + 2*(align-4).
        assert s.shape == (65,)
        assert s[0] == (doc_id * 17) % 2001 - 1000
        j = np.arange(64)
        nibs = (doc_id * 7 + j * 5) % 16
        exp = _ima_decode_scalar((doc_id * 17) % 2001 - 1000, doc_id % 89, nibs.tolist())
        assert s.tolist() == exp


def test_adpcm_fmt_declares_standard_samples_per_block():
    payload = M.encode_wav_adpcm_ima(5, 64)
    # fmt chunk at offset 12: id(4) size(4) then 20 bytes of fields.
    assert payload[12:16] == b"fmt "
    (size,) = struct.unpack("<I", payload[16:20])
    assert size == 20
    fields = struct.unpack("<HHIIHHHH", payload[20:40])
    fmt_tag, channels, _rate, _br, block_align, bits, cb, spb = fields
    assert (fmt_tag, channels, bits, cb) == (0x11, 1, 4, 2)
    assert spb == 1 + 2 * (block_align - 4)


def test_adpcm_container_errors():
    good = M.encode_wav_adpcm_ima(7)
    with pytest.raises(ValueError, match="IMA ADPCM"):
        M.decode_wav_adpcm_ima(M.encode_wav_pcm16(7))
    with pytest.raises(ValueError, match="truncated"):
        M.decode_wav_adpcm_ima(good[:-3])
    with pytest.raises(ValueError, match="even"):
        M.encode_wav_adpcm_ima(7, n_nibbles=9)
    # Corrupt step index > 88 in the block header must refuse.
    bad = bytearray(good)
    # data chunk starts after 12 (RIFF) + 28 (fmt) + 8 (data hdr) = 48;
    # block header byte 2 is the step index.
    assert bad[40:44] == b"data"
    bad[50] = 200
    with pytest.raises(ValueError, match="index"):
        M.decode_wav_adpcm_ima(bytes(bad))


def test_adpcm_batch_kernel_matches_single():
    import pandas as pd

    ids = [0, 13, 26, 39]
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [M.encode_wav_adpcm_ima(d) for d in ids]}
    )
    out = next(M.adpcm_decode_batch(iter([pdf])))
    for _, row in out.iterrows():
        _, s = M.decode_wav_adpcm_ima(M.encode_wav_adpcm_ima(int(row["doc_id"])))
        assert row["n_samples"] == s.size
        assert row["sum_s"] == s.sum()
        assert row["sum_abs"] == np.abs(s).sum()
        assert row["energy"] == (s * s).sum()


# --------------------------------------------------------------------------
# DEFLATE text payload
# --------------------------------------------------------------------------


def test_deflate_roundtrip_with_witness():
    text = "the quick brown fox " * 50
    raw = text.encode("utf-8")
    payload = zlib.compress(raw, 6)
    assert len(payload) < len(raw)  # actually compresses
    back = zlib.decompress(payload)
    assert back == raw
    assert zlib.adler32(back) == zlib.adler32(raw)


# --------------------------------------------------------------------------
# Walsh-Hadamard feature extraction (round 10)
# --------------------------------------------------------------------------


def test_fwht_matches_direct_matrix_and_parseval():
    rng = np.random.default_rng(11)
    S = rng.integers(-1000, 1001, size=(12, 64))
    C = M.fwht_many(S)
    t = np.arange(64)
    H = np.array([[(-1) ** bin(k & tt).count("1") for tt in t] for k in range(64)])
    assert (C == S @ H.T).all()
    assert ((C * C).sum(1) == 64 * (S * S).sum(1)).all()


def test_fwht_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        M.fwht_many(np.zeros((2, 48), dtype=np.int64))


def test_wav_hadamard_batch_kernel():
    import pandas as pd

    ids = [0, 31, 62]
    pdf = pd.DataFrame(
        {"doc_id": ids, "payload": [M.encode_wav_pcm16(d, 64) for d in ids]}
    )
    out = next(M.wav_hadamard_batch(iter([pdf])))
    assert (out["parseval_gap"] == 0).all()
    for _, row in out.iterrows():
        _, s = M.decode_wav_pcm16(M.encode_wav_pcm16(int(row["doc_id"]), 64))
        c = M.fwht_many(s.reshape(1, -1).astype(np.int64))[0]
        c2 = c * c
        assert row["e_band0"] == c2[:16].sum()
        assert row["e_band3"] == c2[48:].sum()

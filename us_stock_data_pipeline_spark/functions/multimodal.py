"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes move
driver-free in columnar batches. Three codec paths are fully REAL with
zero external libraries: binary PPM (P6; pure numpy), non-interlaced
8-bit RGB PNG (stdlib zlib inflate + numpy unfiltering of all five PNG
filter types), and mono PCM16 RIFF/WAVE audio (stdlib struct + numpy
chunk walk) — exercised end-to-end by `multimodal_ppm_decode` /
`multimodal_png_decode` / `multimodal_wav_pcm_decode`. JPEG and
compressed audio (MP3/OGG) remain gated behind ``decode_image`` (no
codecs in this container), but their plumbing (schema, partitioning,
batch shape) is identical to the live paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd


def decode_image(payload: bytes) -> "object":
    """Decode a COMPRESSED image payload (JPEG/PNG/...) to an array.
    Gated: a real deployment plugs Pillow/torchvision here; this
    container has no compression codecs. Uncompressed PPM decodes for
    real via :func:`decode_ppm`."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    raise NotImplementedError(
        "JPEG/audio codecs unavailable in this environment; PPM (P6) and "
        "non-interlaced RGB8 PNG decode for real (decode_ppm/decode_png), "
        "other formats need Pillow"
    )


def encode_ppm(doc_id: int, width: int = 8, height: int = 8) -> bytes:
    """Render a deterministic ``width x height`` RGB test card as binary
    PPM (P6). Pixel channels are affine-mod-256 functions of
    (doc_id, x, y), so expected image statistics have a closed form a
    SQL oracle can enumerate."""
    ys, xs = np.mgrid[0:height, 0:width]
    r = (doc_id * 7 + xs * 13 + ys * 17) % 256
    g = (doc_id * 11 + xs * 3 + ys * 5) % 256
    b = (doc_id * 13 + xs * 19 + ys * 23) % 256
    pixels = np.dstack([r, g, b]).astype(np.uint8)
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """REAL decoder for binary PPM (P6): parse the ASCII header, then
    reinterpret the raw RGB bytes as an (h, w, 3) uint8 array with
    numpy — zero external dependencies, which is why this is the one
    codec the container can run end to end."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, whitespace-separated width/height/maxval, one ws
    # Every scan is bounded by len(payload): a truncated/corrupt blob
    # must raise, not spin an executor task forever (advisor r6 find —
    # b'' is neither whitespace nor a newline, so unbounded scans never
    # terminate past the end).
    n = len(payload)
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i >= n:
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":  # comment line
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i or j >= n:
            raise ValueError("truncated PPM header")
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=i)
    return data.reshape(height, width, 3)


def encode_png(doc_id: int, width: int = 8, height: int = 8) -> bytes:
    """Render the SAME deterministic test card as :func:`encode_ppm` and
    encode it as a real non-interlaced 8-bit RGB PNG — pure stdlib
    ``zlib`` + struct, no Pillow. Each scanline uses filter (row % 5),
    so a round-trip exercises every PNG filter type (None/Sub/Up/
    Average/Paeth), not just the trivial one."""
    import struct
    import zlib

    ys, xs = np.mgrid[0:height, 0:width]
    r = (doc_id * 7 + xs * 13 + ys * 17) % 256
    g = (doc_id * 11 + xs * 3 + ys * 5) % 256
    b = (doc_id * 13 + xs * 19 + ys * 23) % 256
    img = np.dstack([r, g, b]).astype(np.uint8)

    raw = bytearray()
    prev = np.zeros(width * 3, dtype=np.uint8)
    for y in range(height):
        row = img[y].reshape(-1)
        ftype = y % 5
        raw.append(ftype)
        raw.extend(_png_filter_row(row, prev, ftype).tobytes())
        prev = row

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _png_filter_row(row: np.ndarray, prev: np.ndarray, ftype: int) -> np.ndarray:
    """Apply PNG filter `ftype` to a raw scanline (bpp=3)."""
    cur = row.astype(np.int32)
    up = prev.astype(np.int32)
    left = np.concatenate([[0, 0, 0], cur[:-3]])
    ul = np.concatenate([[0, 0, 0], up[:-3]])
    if ftype == 0:
        out = cur
    elif ftype == 1:
        out = cur - left
    elif ftype == 2:
        out = cur - up
    elif ftype == 3:
        out = cur - (left + up) // 2
    else:  # Paeth
        out = cur - _paeth(left, up, ul)
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(payload: bytes) -> np.ndarray:
    """REAL decoder for non-interlaced 8-bit RGB PNG (color type 2):
    chunk walk -> zlib inflate -> per-scanline unfilter, all stdlib +
    numpy. Sub/Average/Paeth have a left-neighbor data dependency, so
    they reconstruct pixel-by-pixel along the (short) row; None/Up are
    fully vectorized. Raises ValueError on truncation or unsupported
    layouts — never spins (same bounded-scan contract as decode_ppm)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    n = len(payload)
    i = 8
    width = height = None
    idat = bytearray()
    while i + 8 <= n:
        (clen,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + clen]
        if len(data) != clen:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            width, height, depth, ctype_, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        i += 12 + clen
    else:
        raise ValueError("truncated PNG: no IEND")
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * 3
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    img = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 2:
            rec = (line + prev) % 256
        elif ftype == 1:
            # Sub: recon[x] = filt[x] + recon[x-3] — a per-lane running
            # sum mod 256: cumsum over pixels within each RGB lane.
            rec = np.cumsum(line.reshape(width, 3), axis=0).reshape(-1) % 256
        elif ftype in (3, 4):
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - 3] if x >= 3 else 0
                b = prev[x]
                if ftype == 3:
                    rec[x] = (line[x] + (a + b) // 2) % 256
                else:
                    c = prev[x - 3] if x >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        img[y] = rec.astype(np.uint8)
        prev = rec
    return img.reshape(height, width, 3)


def png_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode stage: (doc_id, payload: PNG bytes) -> per-image pixel
    statistics, integer-exact — the same output contract as
    ppm_decode_batch, so the two codecs are drop-in interchangeable
    behind one mapInPandas kernel."""
    for pdf in batches:
        out: dict[str, list] = {"width": [], "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
        for payload in pdf["payload"]:
            img = decode_png(bytes(payload))
            h, w, _ = img.shape
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64")}
            | {k: pd.Series(v, dtype="int64") for k, v in out.items()}
        )


def ppm_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode stage: (doc_id, payload: P6 bytes) -> per-image pixel
    statistics, all integer-exact (channel sums over uint8 pixels)."""
    for pdf in batches:
        out = {
            "doc_id": pdf["doc_id"].astype("int64"),
            "width": [],
            "height": [],
            "sum_r": [],
            "sum_g": [],
            "sum_b": [],
        }
        for payload in pdf["payload"]:
            img = decode_ppm(bytes(payload))
            h, w, _ = img.shape
            out["width"].append(w)
            out["height"].append(h)
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(
            {k: pd.Series(v, dtype="int64") for k, v in out.items()}
        )


def encode_bmp24(doc_id: int, width: int = 7, height: int = 5) -> bytes:
    """Render the SAME deterministic test card as :func:`encode_ppm` as
    a real 24-bit uncompressed Windows BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER): rows stored BOTTOM-UP, pixels in BGR order, each
    row padded to a 4-byte boundary — the three quirks that make BMP a
    genuinely distinct decode exercise from PPM's top-down packed RGB.
    Default width 7 gives 21-byte rows (3 bytes padding), so the
    padding path is always exercised."""
    import struct

    ys, xs = np.mgrid[0:height, 0:width]
    r = (doc_id * 7 + xs * 13 + ys * 17) % 256
    g = (doc_id * 11 + xs * 3 + ys * 5) % 256
    b = (doc_id * 13 + xs * 19 + ys * 23) % 256
    bgr = np.dstack([b, g, r]).astype(np.uint8)
    stride = (width * 3 + 3) & ~3
    rows = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bgr[y].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    data = bytes(rows)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return file_hdr + info + data


def decode_bmp24(payload: bytes) -> np.ndarray:
    """REAL decoder for uncompressed 24-bit BMP: parse both headers,
    honor the data offset, strip per-row padding, flip bottom-up rows,
    and swap BGR -> RGB — stdlib struct + numpy only. Returns an
    (h, w, 3) uint8 RGB array; raises ValueError on truncation or
    unsupported layouts (bounded scans, never spins)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack("<I", payload[10:14])[0]
    hdr_size, width, height, planes, bpp, comp = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if hdr_size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    if height <= 0 or width <= 0:
        raise ValueError("top-down or degenerate BMP unsupported")
    stride = (width * 3 + 3) & ~3
    need = data_off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    raw = np.frombuffer(payload, np.uint8, stride * height, data_off)
    rows = raw.reshape(height, stride)[:, : width * 3]
    bgr = rows.reshape(height, width, 3)[::-1]  # bottom-up -> top-down
    return bgr[..., ::-1].copy()  # BGR -> RGB


def bmp_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real decode stage for BMP payloads — same output contract as
    ppm/png_decode_batch, drop-in behind the one mapInPandas kernel."""
    for pdf in batches:
        out: dict[str, list] = {"width": [], "height": [], "sum_r": [], "sum_g": [], "sum_b": []}
        for payload in pdf["payload"]:
            img = decode_bmp24(bytes(payload))
            h, w, _ = img.shape
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            out["width"].append(w)
            out["height"].append(h)
            out["sum_r"].append(int(sums[0]))
            out["sum_g"].append(int(sums[1]))
            out["sum_b"].append(int(sums[2]))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64")}
            | {k: pd.Series(v, dtype="int64") for k, v in out.items()}
        )


def encode_wav_pcm16(doc_id: int, n_samples: int = 64, rate: int = 8000) -> bytes:
    """Render a deterministic mono PCM16 clip as a REAL RIFF/WAVE file —
    canonical 44-byte header (RIFF size, fmt chunk with PCM tag 1,
    mono, 16-bit, byte rate/block align, data chunk), samples little-
    endian int16. Sample t is affine-mod of (doc_id, t) centered near
    zero so sums/energies have a closed form a SQL oracle enumerates:
    ``s_t = (doc_id*31 + t*97) % 2001 - 1000``."""
    import struct

    t = np.arange(n_samples, dtype=np.int64)
    samples = ((doc_id * 31 + t * 97) % 2001 - 1000).astype(np.int16)
    data = samples.tobytes()
    byte_rate = rate * 2  # mono * 16-bit
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """REAL decoder for mono PCM16 RIFF/WAVE: walk the RIFF chunks
    (tolerating extra chunks like LIST before data), validate the fmt
    chunk, and reinterpret the data chunk as int16 samples with numpy —
    zero external codecs (PCM *is* the uncompressed audio path, exactly
    as PPM is for images; MP3/OGG plug into the same batch kernel when
    a codec library exists). Returns (sample_rate, samples). Bounded
    scans: truncation raises, never spins."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    n = len(payload)
    i = 12
    rate = None
    samples = None
    while i + 8 <= n:
        ctype = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated WAV chunk")
        if ctype == b"fmt ":
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError("only mono 16-bit PCM WAV supported")
        elif ctype == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        i += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return int(rate), samples


def wav_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real audio decode stage: (doc_id, payload: WAV bytes) -> integer-
    exact per-clip statistics (n_samples, sum, sum of |s|, energy) plus
    the sample rate — the audio twin of ppm/png_decode_batch, same
    drop-in mapInPandas kernel contract."""
    for pdf in batches:
        out: dict[str, list] = {
            "sample_rate": [], "n_samples": [], "sum_s": [], "sum_abs": [], "energy": []
        }
        for payload in pdf["payload"]:
            rate, s = decode_wav_pcm16(bytes(payload))
            s64 = s.astype(np.int64)
            out["sample_rate"].append(rate)
            out["n_samples"].append(int(s64.size))
            out["sum_s"].append(int(s64.sum()))
            out["sum_abs"].append(int(np.abs(s64).sum()))
            out["energy"].append(int((s64 * s64).sum()))
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"].astype("int64")}
            | {k: pd.Series(v, dtype="int64") for k, v in out.items()}
        )


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a media decode stage.

    Consumes (doc_id, payload: bytes) Arrow batches, emits per-payload
    metadata + a fake scalar feature. Shape and dtype contract match what
    a real decoder (resize / frame-sample / spectrogram) would produce.
    """
    for pdf in batches:
        byte_len = pdf["payload"].map(len).astype("int64")
        first_byte = pdf["payload"].map(lambda b: b[0] if len(b) else -1).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "byte_len": byte_len,
                "first_byte": first_byte,
                "feat_stub": ((byte_len % 7) / 7.0).round(4),
            }
        )

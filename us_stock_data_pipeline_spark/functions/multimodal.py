"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes move
driver-free in columnar batches. One codec path is fully REAL — binary
PPM (P6), parsed with pure numpy, no external libraries
(encode_ppm / decode_ppm / ppm_decode_batch, exercised end-to-end by
`multimodal_ppm_decode`). Compressed formats (JPEG/PNG/audio) remain
gated behind ``decode_image`` — those codecs are not in this container —
but their plumbing (schema, partitioning, batch shape) is identical to
the live PPM path.
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
    raise NotImplementedError(
        "compressed-image codecs unavailable in this environment; PPM (P6) "
        "decodes via decode_ppm, other formats need Pillow"
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
    parts: list[int] = []
    i = 2
    while len(parts) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment line
            while payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while not payload[j : j + 1].isspace():
            j += 1
        parts.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = parts
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=width * height * 3, offset=i)
    return data.reshape(height, width, 3)


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

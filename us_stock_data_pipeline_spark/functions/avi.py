"""REAL AVI (RIFF) container with Motion-JPEG video, pure Python
(round 13) — the first VIDEO rung of the multimodal ladder that
decodes end-to-end: the container (RIFF lists, stream headers, movi
chunks, idx1 index, word alignment) and the codec (MJPEG = one
baseline JPEG per frame, decoded by the engine's own
`decode_jpeg_color`) are both real, no external libraries.

- `avi_mjpeg_write(frames_jpeg, w, h, fps)` emits a spec-shaped AVI:
  RIFF('AVI ') { LIST hdrl { avih, LIST strl { strh('vids'/'MJPG'),
  strf(BITMAPINFOHEADER) } }, LIST movi { '00dc' chunks, zero-padded
  to word boundaries }, idx1 }.
- `avi_mjpeg_read(payload)` walks the chunk tree (bounded, never
  scans past declared sizes), validates the MJPG fourcc and frame
  count, and returns the per-frame JPEG payloads; frame decode is the
  caller's (`decode_jpeg_color`), keeping container and codec layers
  independently testable.

Format reference: the public AVI RIFF specification (msdn
'AVI RIFF File Reference') and OpenDML; MJPEG frames are plain
ISO/IEC 10918-1 baseline JPEGs. Reference-repo scope note: the
reference has no media surface; this extends SURVEY.md SS2D's
multimodal ladder (video: container + frame codec, real; inter-frame
codecs remain out of scope like lossy VP8, and for the same
offline-normative-tables reason where applicable).
"""

from __future__ import annotations

import struct


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_mjpeg_write(
    frames_jpeg: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Assemble baseline-JPEG frame payloads into a playable MJPEG AVI."""
    n = len(frames_jpeg)
    us_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max((len(f) for f in frames_jpeg), default=0)
    avih = struct.pack(
        "<14I",
        us_per_frame,  # dwMicroSecPerFrame
        max_bytes * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_bytes,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII",
            0,  # dwFlags
            0,  # wPriority
            0,  # wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            max(fps, 1),  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_bytes,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            0,  # dwSampleSize
        )
        + struct.pack("<4H", 0, 0, width, height)  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    offsets = []
    for f in frames_jpeg:
        offsets.append(4 + len(movi_body))  # offset from 'movi' fourcc
        movi_body += _chunk(b"00dc", f)
    movi = _list(b"movi", bytes(movi_body))
    idx = bytearray()
    for off, f in zip(offsets, frames_jpeg):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))  # AVIIF_KEYFRAME
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def avi_mjpeg_read(payload: bytes) -> dict:
    """Parse an MJPEG AVI -> {"width", "height", "fps", "frames":
    [jpeg bytes, ...]}. Bounded chunk walk; raises on a non-MJPG video
    stream, malformed sizes, or a frame-count mismatch vs the header."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') payload")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    end = min(8 + riff_size, len(payload))
    width = height = n_frames = None
    fps = None
    fourcc_ok = False
    frames: list[bytes] = []

    def walk(pos: int, stop: int) -> None:
        nonlocal width, height, n_frames, fps, fourcc_ok
        while pos + 8 <= stop:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if body_end > stop:
                raise ValueError("AVI chunk overruns its parent")
            if cid == b"LIST":
                kind = payload[body_start : body_start + 4]
                if kind in (b"hdrl", b"strl", b"movi"):
                    walk(body_start + 4, body_end)
            elif cid == b"avih":
                vals = struct.unpack("<14I", payload[body_start : body_start + 56])
                n_frames = vals[4]
                width, height = vals[8], vals[9]
                fps = 1_000_000 // vals[0] if vals[0] else None
            elif cid == b"strh":
                if payload[body_start : body_start + 4] == b"vids":
                    if payload[body_start + 4 : body_start + 8] != b"MJPG":
                        raise NotImplementedError(
                            "only MJPG video streams are in scope"
                        )
                    fourcc_ok = True
            elif cid == b"00dc":
                frames.append(bytes(payload[body_start:body_end]))
            pos = body_end + (body_end & 1)  # word alignment

    walk(12, end)
    if not fourcc_ok:
        raise ValueError("AVI without a video stream header")
    if n_frames is not None and n_frames != len(frames):
        raise ValueError(
            f"AVI frame count mismatch: header {n_frames}, movi {len(frames)}"
        )
    return {"width": width, "height": height, "fps": fps, "frames": frames}

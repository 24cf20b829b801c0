"""Multimodal (image/audio/video) column plumbing.

Payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes move
driver-free in columnar batches. The actual codecs are STUBBED — the
image/audio libraries are not in this container — but the Spark-side
schema, partitioning, UDF signature and batch shape are real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to an array. STUB: a real deployment plugs
    Pillow/torchvision here; the container has no image codecs."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; use fake_decode_batch "
        "for deterministic plumbing tests"
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

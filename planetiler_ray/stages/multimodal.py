"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with metadata columns; decode /
feature-extract run as actor-pool ``map_batches`` stages.  The actual codec
libraries are NOT in this container, so the decode kernel is a clearly-marked
deterministic STUB — the Ray-side plumbing (schema, small batch sizes for
large payloads, actor signature, output layout) is real and tested, and a
real decoder drops in by replacing ``_decode_stub``.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.int64()),
        ("payload", pa.binary()),  # opaque encoded bytes
        ("media_type", pa.string()),  # "image/fake" in this sandbox
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def synthesize_media(batch: pa.Table, payload_bytes: int = 4096) -> pa.Table:
    """documents batch -> fake media table (deterministic payload from doc_id)."""
    ids = batch.column("doc_id").to_numpy()
    payloads = []
    w = np.empty(len(ids), dtype=np.int32)
    h = np.empty(len(ids), dtype=np.int32)
    for i, d in enumerate(ids):
        seed = hashlib.md5(struct.pack("<q", int(d))).digest()
        reps = payload_bytes // len(seed) + 1
        payloads.append((seed * reps)[:payload_bytes])
        w[i] = 16 + (d % 48)
        h[i] = 16 + (d % 32)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["image/fake"] * len(ids), pa.string()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
        }
    )


def _decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixel array from payload bytes.

    Replace with e.g. PIL/libvips decode when the codec libs exist.  Raises
    NotImplementedError for media types it does not model.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    need = width * height
    reps = need // len(arr) + 1
    return np.tile(arr, reps)[:need].reshape(height, width)


class MediaFeatureExtractor:
    """Actor-pool stage: decode (stub) + feature-extract per batch.

    Heavy init (model load) belongs here — runs once per actor.  Use small
    ``batch_size`` (payloads are large) and ``concurrency=N`` pools.
    """

    def __init__(self, feature_dim: int = 8):
        self.feature_dim = feature_dim  # stands in for model load

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        widths = batch.column("width").to_numpy()
        heights = batch.column("height").to_numpy()
        mtypes = batch.column("media_type").to_pylist()
        feats = np.empty((len(ids), self.feature_dim), dtype=np.float32)
        means = np.empty(len(ids), dtype=np.float64)
        for i in range(len(ids)):
            if mtypes[i] != "image/fake":
                raise NotImplementedError(f"no decoder for {mtypes[i]} in this sandbox")
            img = _decode_stub(payloads[i], int(widths[i]), int(heights[i]))
            means[i] = float(img.mean())
            hist = np.bincount(img.ravel() >> 5, minlength=self.feature_dim)
            feats[i] = hist[: self.feature_dim] / max(img.size, 1)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "pixel_mean": pa.array(means, pa.float64()),
                "feature": pa.array(list(feats), pa.list_(pa.float32())),
            }
        )


def media_pipeline(documents_ds, concurrency: int = 2, batch_size: int = 64):
    """documents -> fake media -> actor-pool feature extraction."""
    return documents_ds.map_batches(
        synthesize_media, batch_format="pyarrow"
    ).map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

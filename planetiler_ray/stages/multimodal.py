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
        # seed = md5 of the DECIMAL doc_id string: arbitrary for a stub, but
        # chosen so DuckDB's md5(CAST(doc_id AS VARCHAR)) re-derives the
        # payload bytes exactly (oracle.sql_media_stats)
        seed = hashlib.md5(str(int(d)).encode()).digest()
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


# ------------------------------------------------------- derived media ops --

def resize_stage(batch: pa.Table, out_w: int = 16, out_h: int = 16) -> pa.Table:
    """Decode (stub) + block-mean resize to a fixed (out_h, out_w) —
    the thumbnail/normalize step of an image pipeline.  The resampling math
    (area-weighted block mean via bincount over target-bin indices) is real
    and exact; only the codec behind ``_decode_stub`` is fake.
    Output: item_id, thumb (list<float32> of out_h*out_w row-major)."""
    ids = batch.column("item_id").to_numpy()
    payloads = batch.column("payload").to_pylist()
    widths = batch.column("width").to_numpy()
    heights = batch.column("height").to_numpy()
    thumbs = np.empty((len(ids), out_h * out_w), dtype=np.float32)
    for i in range(len(ids)):
        img = _decode_stub(payloads[i], int(widths[i]), int(heights[i])).astype(np.float64)
        h, w = img.shape
        ty = (np.arange(h) * out_h) // h
        tx = (np.arange(w) * out_w) // w
        bins = (ty[:, None] * out_w + tx[None, :]).ravel()
        sums = np.bincount(bins, weights=img.ravel(), minlength=out_h * out_w)
        cnts = np.bincount(bins, minlength=out_h * out_w)
        thumbs[i] = (sums / np.maximum(cnts, 1)).astype(np.float32)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "thumb": pa.array(list(thumbs), pa.list_(pa.float32())),
        }
    )


def synthesize_video(batch: pa.Table, frame_bytes: int = 256) -> pa.Table:
    """documents batch -> fake video table: one payload of n_frames
    concatenated fake frames + typed metadata."""
    ids = batch.column("doc_id").to_numpy()
    n_frames = (4 + ids % 13).astype(np.int32)
    payloads = []
    for d, nf in zip(ids, n_frames):
        seed = hashlib.md5(struct.pack("<q", int(d))).digest()
        reps = (frame_bytes * int(nf)) // len(seed) + 1
        payloads.append((seed * reps)[: frame_bytes * int(nf)])
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "media_type": pa.array(["video/fake"] * len(ids), pa.string()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "frame_bytes": pa.array(np.full(len(ids), frame_bytes, np.int32), pa.int32()),
        }
    )


def sample_frames(batch: pa.Table, every: int = 4) -> pa.Table:
    """Video rows -> one row per sampled frame (every k-th, always incl.
    frame 0) — the record-count-exploding media op; frame slicing is real
    byte math on the container layout, only the codec is fake.
    Output: item_id, frame_idx, frame (binary)."""
    ids = batch.column("item_id").to_numpy()
    payloads = batch.column("payload").to_pylist()
    n_frames = batch.column("n_frames").to_numpy()
    fb = batch.column("frame_bytes").to_numpy()
    out_id, out_fi, out_fr = [], [], []
    for i in range(len(ids)):
        for f in range(0, int(n_frames[i]), every):
            out_id.append(int(ids[i]))
            out_fi.append(f)
            out_fr.append(payloads[i][f * int(fb[i]) : (f + 1) * int(fb[i])])
    return pa.table(
        {
            "item_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_fi, pa.int64()),
            "frame": pa.array(out_fr, pa.binary()),
        }
    )


def audio_features(batch: pa.Table, window: int = 256) -> pa.Table:
    """Fake-PCM audio analysis: per-window RMS + zero-crossing rate
    (vectorized reduceat DSP — real math, stub codec).
    Output: item_id, n_windows, rms_mean, zcr_mean."""
    ids = batch.column("item_id").to_numpy()
    payloads = batch.column("payload").to_pylist()
    n_out = len(ids)
    nw = np.zeros(n_out, dtype=np.int64)
    rms = np.zeros(n_out)
    zcr = np.zeros(n_out)
    for i in range(n_out):
        pcm = np.frombuffer(payloads[i], dtype=np.uint8).astype(np.float64) - 127.5
        k = len(pcm) // window
        if k == 0:
            continue
        x = pcm[: k * window].reshape(k, window)
        nw[i] = k
        rms[i] = float(np.sqrt((x * x).mean(axis=1)).mean())
        sign_change = np.signbit(x[:, 1:]) != np.signbit(x[:, :-1])
        zcr[i] = float(sign_change.mean())
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "n_windows": pa.array(nw, pa.int64()),
            "rms_mean": pa.array(rms, pa.float64()),
            "zcr_mean": pa.array(zcr, pa.float64()),
        }
    )


class EmbeddingScorer:
    """Batched 'model inference' actor: a deterministic projection matrix
    stands in for model weights (loaded ONCE per actor in ``__init__``);
    ``__call__`` is one GEMM per batch over the stacked feature column —
    the exact shape a real encoder drop-in needs."""

    def __init__(self, in_dim: int = 8, out_dim: int = 4, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.w = rng.normal(size=(in_dim, out_dim)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(batch.column("feature").to_pylist()).astype(np.float32)
        emb = feats @ self.w
        return pa.table(
            {
                "item_id": batch.column("item_id"),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
            }
        )


def media_embedding_pipeline(documents_ds, concurrency: int = 2,
                             batch_size: int = 64):
    """documents -> fake media -> features -> batched embedding inference."""
    return media_pipeline(documents_ds, concurrency, batch_size).map_batches(
        EmbeddingScorer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------ perceptual hash --


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG/pHash transform), pure numpy."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> np.ndarray:
    """Classic 64-bit perceptual hash (pHash) of a stack of 32x32 grayscale
    images: 2-D DCT, keep the top-left 8x8 low-frequency block (minus DC),
    threshold at the median -> 64 bits.  Vectorized over the whole stack
    (two batched matmuls per batch — no per-image Python).

    ``pixels``: (n, 32, 32) float or uint8.
    """
    x = pixels.astype(np.float64)
    # batched separable 2-D DCT: D @ img @ D.T for every image at once
    coef = np.einsum("ij,njk,lk->nil", _DCT32, x, _DCT32)
    block = coef[:, :8, :8].reshape(len(x), 64)
    ac = block[:, 1:]  # drop the DC coefficient -> 63 AC bits
    med = np.median(ac, axis=1, keepdims=True)
    bits = (ac > med).astype(np.uint64)  # 63 bits
    weights = np.uint64(1) << np.arange(63, dtype=np.uint64)
    return (bits * weights).sum(axis=1, dtype=np.uint64)


class PerceptualHasher:
    """Actor-pool stage: decode (stub) -> 32x32 block-mean resize ->
    :func:`phash64` per item.  Output: item_id, phash (int64 bit pattern).

    The dedup path then reuses the repo's simhash Hamming-blocking
    machinery on the hash column — near-duplicate IMAGES with the same
    bounded-bucket guarantees as near-duplicate text.
    """

    def __init__(self):
        self.dct = _DCT32  # stands in for model/codec init (once per actor)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("item_id").to_numpy()
        payloads = batch.column("payload").to_pylist()
        ws = batch.column("width").to_numpy()
        hs = batch.column("height").to_numpy()
        stack = np.empty((len(ids), 32, 32), dtype=np.float64)
        for i in range(len(ids)):
            px = _decode_stub(payloads[i], int(ws[i]), int(hs[i]))
            # block-mean resample to 32x32 via index mapping (decode is the
            # per-item part; the DCT below is one batched einsum)
            yi = (np.arange(32) * px.shape[0] // 32)
            xi = (np.arange(32) * px.shape[1] // 32)
            stack[i] = px[np.ix_(yi, xi)]
        ph = phash64(stack)
        return pa.table(
            {
                "item_id": pa.array(ids, pa.int64()),
                "phash": pa.array(ph.astype(np.int64), pa.int64()),
            }
        )


def image_phash_pipeline(documents_ds, concurrency: int = 2,
                         batch_size: int = 64):
    """documents -> fake media -> per-item pHash (actor pool)."""
    return documents_ds.map_batches(
        synthesize_media, batch_format="pyarrow"
    ).map_batches(
        PerceptualHasher,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )

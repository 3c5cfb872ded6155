"""Vectorized LEB128/zigzag kernels + protobuf segment-scatter helpers.

Shared by the .osm.pbf codec (``sources/osmpbf.py``) and the MVT tile
assembler's vectorized feature pre-encoding (``stages/assemble.py``) —
all pure numpy, no per-value Python.
"""

from __future__ import annotations

import numpy as np


def pack_varints2(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """LEB128-encode a uint64 array -> (flat uint8 buffer, bytes-per-value)."""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    nb = np.ones(n, np.int64)
    x = v >> np.uint64(7)
    while x.any():
        nb += x != 0
        x >>= np.uint64(7)
    offs = np.concatenate([[0], np.cumsum(nb)])
    out = np.zeros(int(offs[-1]), np.uint8)
    starts = offs[:-1]
    for j in range(int(nb.max())):
        m = nb > j
        byte = ((v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        more = (nb[m] - 1 > j).astype(np.uint8)
        out[starts[m] + j] = byte | (more << 7)
    return out, nb


def unpack_varints(buf: np.ndarray) -> np.ndarray:
    """Decode a packed-varint region (uint8 array) -> uint64 values
    (vectorized: one reduceat over 7-bit limbs)."""
    b = np.asarray(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    ends = (b & 0x80) == 0
    gstart = np.flatnonzero(np.concatenate([[True], ends[:-1]]))
    glen = np.diff(np.append(gstart, len(b)))
    pos = np.arange(len(b), dtype=np.int64) - np.repeat(gstart, glen)
    limbs = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * pos.astype(np.uint64))
    return np.bitwise_or.reduceat(limbs, gstart)


def zigzag_encode(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.int64)
    return ((x << 1) ^ (x >> 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = np.ascontiguousarray(u, dtype=np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -((u & np.uint64(1)).astype(np.int64))


def segment_sum(values: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Sum of consecutive segments (segment i has lens[i] elements), with
    zero-length segments allowed -> int64 per segment."""
    n = len(lens)
    out = np.zeros(n, np.int64)
    ne = lens > 0
    if not ne.any():
        return out
    starts = (np.concatenate([[0], np.cumsum(lens)])[:-1])[ne]
    out[ne] = np.add.reduceat(values, starts)
    return out


def copy_segments(out: np.ndarray, dst_off: np.ndarray, src: np.ndarray,
                  src_off: np.ndarray, lens: np.ndarray) -> None:
    """``out[dst_off[i]:dst_off[i]+lens[i]] = src[src_off[i]:+lens[i]]`` for
    all segments in one vectorized gather/scatter (segments may come from
    arbitrary, non-contiguous source offsets — the general form of
    :func:`scatter_segments`)."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return
    rep = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    pos = (np.arange(total, dtype=np.int64)
           - np.repeat(np.concatenate([[0], np.cumsum(lens)])[:-1], lens))
    out[np.asarray(dst_off, dtype=np.int64)[rep] + pos] = \
        src[np.asarray(src_off, dtype=np.int64)[rep] + pos]


def scatter_segments(out: np.ndarray, dst_off: np.ndarray, src: np.ndarray,
                     seg_lens: np.ndarray) -> None:
    """Copy consecutive segments of ``src`` (segment i has seg_lens[i]
    bytes, packed back-to-back) to out[dst_off[i]:...] — one vectorized
    scatter for all segments."""
    if len(src) == 0:
        return
    src_off = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
    shift = np.repeat(dst_off - src_off, seg_lens)
    out[np.arange(len(src), dtype=np.int64) + shift] = src

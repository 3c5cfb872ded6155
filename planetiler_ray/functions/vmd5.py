"""MD5 over Arrow string arrays without Python string materialization.

The corpus queries (``pages_meta``, ``fingerprint``) emit an md5 per
document because the DuckDB oracle checks ``md5(text)`` output
byte-for-byte, so the digest function cannot be swapped for a cheaper
vectorizable hash (contrast ``exact_dedup``, whose hash is internal and
uses the vectorized two-seed FNV in ``vhash.py``).

Implementation note (measured, 200k x 600-char docs): a fully
lane-vectorized numpy MD5 (64 rounds x shrinking active set, the
``fnv64_arrow`` pattern) ran 13.6 s vs 0.28 s for OpenSSL's C md5 —
numpy temporaries per round dwarf the loop cost, so "vectorize the loop"
is the wrong move for a C-speed digest.  What IS wasteful in a naive loop
is materializing a Python str per row (``to_pylist`` + ``.encode``).
:func:`md5_arrow` instead slices the array's contiguous UTF-8 buffer with
a zero-copy memoryview per row: 0.52 s vs 0.65 s for the pylist form, no
per-row object churn, and the output lands in flat numpy/Arrow buffers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_HEXLUT = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def _string_buffer(arr):
    """(data memoryview, offsets int64[n+1]) for a (large_)string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if arr.null_count:
        raise ValueError("md5_arrow: null values not supported")
    off_dtype = np.int64 if (
        pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
    ) else np.int32
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + n + 1].astype(np.int64)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return mv, offs


def digest_rows(arr, algo=hashlib.md5, size: int = 16) -> np.ndarray:
    """Per-row digest (first ``size`` bytes) of a pyarrow string/binary
    array -> (n, size) uint8.  One C digest call per row over a zero-copy
    buffer slice; no Python strings are created.

    Measured (4096 x 900-char docs, this container): md5 9.7 ms/batch,
    sha256 5.3 ms (SHA-NI), blake2b 8.6 ms — versus 55-89 ms for the best
    numpy-vectorized 128-bit hashes (fnv byte-sweep / polynomial
    power-table): for document-length rows a C digest over buffer slices
    beats any pure-numpy formulation ~10x, so the "loop" IS the fast path.
    """
    mv, offs = _string_buffer(arr)
    n = len(offs) - 1
    full = algo(b"").digest_size
    out = bytearray(full * n)
    ot = memoryview(out)
    o = 0
    for i in range(n):
        ot[o : o + full] = algo(mv[offs[i] : offs[i + 1]]).digest()
        o += full
    dig = np.frombuffer(bytes(out), np.uint8).reshape(n, full)
    return dig[:, :size] if size < full else dig


def digest128_u64_arrow(arr, algo=None) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) big-endian uint64 halves of each row's 128-bit content
    digest (sha256 prefix by default — the fastest digest here thanks to
    SHA-NI; any 128 bits of a cryptographic digest are collision-free for
    dedup purposes at any corpus size)."""
    dig = digest_rows(arr, algo or hashlib.sha256, size=16)
    dig = np.ascontiguousarray(dig)
    hi = dig[:, :8][:, ::-1].copy().view(np.uint64).ravel()
    lo = dig[:, 8:][:, ::-1].copy().view(np.uint64).ravel()
    return hi, lo


def md5_arrow(arr) -> np.ndarray:
    """md5 digest of each row -> (n, 16) uint8 (oracle-pinned md5 paths)."""
    return digest_rows(arr, hashlib.md5, size=16)


def md5_hex_arrow(arr, prefix: int = 32) -> pa.Array:
    """Lowercase-hex md5 (first ``prefix`` chars) per row -> pa.string(),
    built directly in flat Arrow buffers via a nibble lookup table."""
    dig = md5_arrow(arr)
    n = dig.shape[0]
    hx = np.empty((n, 32), dtype=np.uint8)
    hx[:, 0::2] = _HEXLUT[dig >> 4]
    hx[:, 1::2] = _HEXLUT[dig & 0x0F]
    if prefix < 32:
        hx = np.ascontiguousarray(hx[:, :prefix])
    offs = np.arange(0, (n + 1) * prefix, prefix, dtype=np.int32)
    return pa.StringArray.from_buffers(
        n, pa.py_buffer(offs.tobytes()), pa.py_buffer(hx.tobytes())
    )


def md5_u64_arrow(arr) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) big-endian uint64 halves of each row's md5 (matches
    ``int.from_bytes(digest[:8] / digest[8:], 'big')``)."""
    dig = md5_arrow(arr)
    hi = dig[:, :8][:, ::-1].copy().view(np.uint64).ravel()
    lo = dig[:, 8:][:, ::-1].copy().view(np.uint64).ravel()
    return hi, lo

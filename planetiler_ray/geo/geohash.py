"""Geohash encoding (vectorized) — the fourth tile-address family in the
engine next to (z,x,y) web-mercator tiles (``geo/mercator.py``), Bing
quadkeys (``pipelines/webgeo.q_quadkey_counts``) and hex/S2-style cells.

Classic public layout (geohash.org): total bits = 5·precision; the bit
sequence MSB-first alternates lon, lat, lon, ... (longitude owns the even
positions), each 5-bit group maps to one char of the base-32 alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.  Bits come from uniform binary
subdivision of lon ∈ [-180,180) and lat ∈ [-90,90) — i.e. a plain
floor-scale, NOT mercator.

All functions are numpy array ops; no per-row loops (the per-bit /
per-char loops run 5·precision times regardless of row count).
"""

from __future__ import annotations

import numpy as np

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
_ALPHA_U8 = np.frombuffer(ALPHABET.encode(), np.uint8)


def geohash_bits(lat, lon, precision: int = 3) -> np.ndarray:
    """Interleaved geohash integer (5·precision bits) per row, int64.

    Expression shapes mirror ``oracle.sql_geohash_counts`` exactly so the
    DuckDB twin reproduces identical IEEE doubles."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lonb = np.minimum(
        np.floor((lon + 180.0) / 360.0 * float(1 << lon_bits)),
        float((1 << lon_bits) - 1),
    ).astype(np.int64)
    latb = np.minimum(
        np.floor((lat + 90.0) / 180.0 * float(1 << lat_bits)),
        float((1 << lat_bits) - 1),
    ).astype(np.int64)
    g = np.zeros(len(lonb), np.int64)
    for p in range(nbits):  # unrolled over BIT POSITIONS, not rows
        if p % 2 == 0:
            bit = (lonb >> (lon_bits - 1 - p // 2)) & 1
        else:
            bit = (latb >> (lat_bits - 1 - (p - 1) // 2)) & 1
        g = (g << 1) | bit
    return g


def geohash_str(g: np.ndarray, precision: int = 3) -> np.ndarray:
    """Base-32 string per geohash integer (numpy ``S{precision}`` ->
    unicode array)."""
    g = np.asarray(g, dtype=np.int64)
    chars = np.empty((len(g), precision), np.uint8)
    for i in range(precision):
        chars[:, i] = _ALPHA_U8[(g >> (5 * (precision - 1 - i))) & 31]
    return np.frombuffer(chars.tobytes(), dtype=f"S{precision}").astype(str)


def encode(lat, lon, precision: int = 3) -> np.ndarray:
    """lat/lon arrays -> geohash string array."""
    return geohash_str(geohash_bits(lat, lon, precision), precision)

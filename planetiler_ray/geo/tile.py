"""Tile coordinate encoding: global tile ids, orderings, and the 64-bit sort key.

Re-expresses the semantics of the reference's
``geo/TileCoord.java:29-190`` (global tile index with all-zooms offset table,
TMS and Hilbert orderings) and ``collection/FeatureGroup.java:168-196`` (the
64-bit shuffle key ``[tile:33][layer:8][sortKey:22][hasGroup:1]``) as pure
vectorized numpy — this is the key every wide shuffle in the engine
partitions on.

Orderings
---------
* ``XYZ`` (row-major: ``y * 2^z + x``) — our internal default; cheap.
* ``TMS`` (column-major with flipped y: ``x * 2^z + (2^z - 1 - y)``) — the
  MBTiles archive order (``geo/TileOrder.java:13``).
* ``HILBERT`` — the PMTiles archive order (``geo/TileOrder.java:14``).

All three share the same per-zoom offset table: tiles of zoom 0..z-1 come
first, so ids are globally unique across zooms and sortable by (zoom, order).
"""

from __future__ import annotations

import numpy as np

from .hilbert import hilbert_to_xy, xy_to_hilbert

MAX_ZOOM = 15  # ids up to z15 fit the 33-bit tile field of the sort key

# _ZOOM_START[z] = number of tiles in zooms 0..z-1 = (4^z - 1) / 3
_ZOOM_START = np.zeros(MAX_ZOOM + 2, dtype=np.int64)
for _z in range(1, MAX_ZOOM + 2):
    _ZOOM_START[_z] = _ZOOM_START[_z - 1] + (np.int64(1) << np.int64(2 * (_z - 1)))

XYZ = "xyz"
TMS = "tms"
HILBERT = "hilbert"


def zoom_start(z):
    """Global id of the first tile at zoom z."""
    return _ZOOM_START[np.asarray(z, dtype=np.int64)]


def num_tiles_through(z: int) -> int:
    return int(_ZOOM_START[z + 1])


def encode_tile_id(z, x, y, order: str = XYZ):
    """(z, x, y) -> global int64 tile id under the given ordering."""
    z = np.asarray(z, dtype=np.int64)
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    base = _ZOOM_START[z]
    n = np.int64(1) << z
    if order == XYZ:
        return base + y * n + x
    if order == TMS:
        return base + x * n + (n - 1 - y)
    if order == HILBERT:
        if z.ndim == 0:
            return base + xy_to_hilbert(int(z), x, y)
        out = np.empty_like(x)
        for zz in np.unique(z):
            m = z == zz
            out[m] = xy_to_hilbert(int(zz), x[m], y[m])
        return base + out
    raise ValueError(f"unknown tile order {order!r}")


def decode_tile_id(tile_id, order: str = XYZ):
    """Global tile id -> (z, x, y)."""
    tile_id = np.asarray(tile_id, dtype=np.int64)
    z = (np.searchsorted(_ZOOM_START, tile_id, side="right") - 1).astype(np.int64)
    rem = tile_id - _ZOOM_START[z]
    n = np.int64(1) << z
    if order == XYZ:
        return z, rem % n, rem // n
    if order == TMS:
        return z, rem // n, (n - 1) - rem % n
    if order == HILBERT:
        if z.ndim == 0:
            x, y = hilbert_to_xy(int(z), rem)
            return z, x, y
        x = np.empty_like(rem)
        y = np.empty_like(rem)
        for zz in np.unique(z):
            m = z == zz
            x[m], y[m] = hilbert_to_xy(int(zz), rem[m])
        return z, x, y
    raise ValueError(f"unknown tile order {order!r}")


def convert_tile_id(tile_id, from_order: str, to_order: str):
    if from_order == to_order:
        return np.asarray(tile_id, dtype=np.int64)
    z, x, y = decode_tile_id(tile_id, from_order)
    return encode_tile_id(z, x, y, to_order)


# --- 64-bit sort key: [tile:33][layer:8][sortKey:22][hasGroup:1] ---------

SORT_KEY_BITS = 22
SORT_KEY_MIN = -(1 << (SORT_KEY_BITS - 1))  # -2097152
SORT_KEY_MAX = (1 << (SORT_KEY_BITS - 1)) - 1
_LAYER_BITS = 8
_TILE_SHIFT = np.int64(_LAYER_BITS + SORT_KEY_BITS + 1)  # 31
_LAYER_SHIFT = np.int64(SORT_KEY_BITS + 1)  # 23


def encode_sort_key(tile_id, layer_id, sort_key, has_group):
    """Pack the shuffle key exactly as ``FeatureGroup.encodeKey`` does.

    ``sort_key`` is biased from [-2^21, 2^21-1] to unsigned so that plain
    int64 ordering sorts (tile, layer, sortKey, hasGroup) lexicographically.
    """
    tile_id = np.asarray(tile_id, dtype=np.int64)
    layer_id = np.asarray(layer_id, dtype=np.int64)
    sk = np.asarray(sort_key, dtype=np.int64)
    sk = np.clip(sk, SORT_KEY_MIN, SORT_KEY_MAX) - SORT_KEY_MIN
    hg = np.asarray(has_group).astype(np.int64)
    return (tile_id << _TILE_SHIFT) | (layer_id << _LAYER_SHIFT) | (sk << np.int64(1)) | hg


def decode_sort_key(key):
    key = np.asarray(key, dtype=np.int64)
    tile_id = key >> _TILE_SHIFT
    layer_id = (key >> _LAYER_SHIFT) & np.int64((1 << _LAYER_BITS) - 1)
    sort_key = ((key >> np.int64(1)) & np.int64((1 << SORT_KEY_BITS) - 1)) + SORT_KEY_MIN
    has_group = key & np.int64(1)
    return tile_id, layer_id, sort_key, has_group

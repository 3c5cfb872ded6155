"""Minimal ISO WKB encode/decode (no shapely in this environment).

Supports Point, LineString, Polygon, MultiPoint, MultiLineString,
MultiPolygon and GeometryCollection in little-endian 2-D WKB — enough to round-trip
our synthetic geometry tables and to interoperate with DuckDB/GeoParquet
readers.  Geometries are plain Python structures over numpy arrays:

* Point           -> ``("point", np.array([x, y]))``
* LineString      -> ``("linestring", (n,2) array)``
* Polygon         -> ``("polygon", [ring0, ring1, ...])`` rings are (n,2) arrays,
  first exterior (CCW not enforced), rest holes; rings are closed.
* Multi*          -> ``("multipoint"|"multilinestring"|"multipolygon", [parts])``
* GeometryCollection -> ``("geometrycollection", [(kind, data), ...])``
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_TYPES = {
    "point": 1,
    "linestring": 2,
    "polygon": 3,
    "multipoint": 4,
    "multilinestring": 5,
    "multipolygon": 6,
    "geometrycollection": 7,
}
_WKB_NAMES = {v: k for k, v in _WKB_TYPES.items()}


def _coords_bytes(arr: np.ndarray) -> bytes:
    return np.ascontiguousarray(arr, dtype="<f8").tobytes()


def encode_wkb(kind: str, data) -> bytes:
    kind = kind.lower()
    code = _WKB_TYPES[kind]
    head = struct.pack("<BI", 1, code)
    if kind == "point":
        return head + _coords_bytes(np.asarray(data, dtype=np.float64))
    if kind == "linestring":
        arr = np.asarray(data, dtype=np.float64)
        return head + struct.pack("<I", len(arr)) + _coords_bytes(arr)
    if kind == "polygon":
        out = [head, struct.pack("<I", len(data))]
        for ring in data:
            ring = np.asarray(ring, dtype=np.float64)
            out.append(struct.pack("<I", len(ring)))
            out.append(_coords_bytes(ring))
        return b"".join(out)
    if kind in ("multipoint", "multilinestring", "multipolygon"):
        sub = {"multipoint": "point", "multilinestring": "linestring",
               "multipolygon": "polygon"}[kind]
        out = [head, struct.pack("<I", len(data))]
        for part in data:
            out.append(encode_wkb(sub, part))
        return b"".join(out)
    if kind == "geometrycollection":
        out = [head, struct.pack("<I", len(data))]
        for k, d in data:
            out.append(encode_wkb(k, d))
        return b"".join(out)
    raise ValueError(kind)


def _read_coords(buf: memoryview, off: int, n: int):
    arr = np.frombuffer(buf[off : off + 16 * n], dtype="<f8").reshape(n, 2)
    return arr.astype(np.float64), off + 16 * n


def _decode(buf: memoryview, off: int):
    byte_order, code = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:
        # big-endian: re-unpack
        code = struct.unpack_from(">I", buf, off + 1)[0]
        raise NotImplementedError("big-endian WKB not supported")
    off += 5
    code = code & 0xFF  # strip SRID/Z flags if any (not supported anyway)
    kind = _WKB_NAMES[code]
    if kind == "point":
        arr, off = _read_coords(buf, off, 1)
        return (kind, arr[0]), off
    if kind == "linestring":
        (n,) = struct.unpack_from("<I", buf, off)
        arr, off = _read_coords(buf, off + 4, n)
        return (kind, arr), off
    if kind == "polygon":
        (nr,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from("<I", buf, off)
            arr, off = _read_coords(buf, off + 4, n)
            rings.append(arr)
        return (kind, rings), off
    if kind in ("multipoint", "multilinestring", "multipolygon", "geometrycollection"):
        (np_,) = struct.unpack_from("<I", buf, off)
        off += 4
        parts = []
        for _ in range(np_):
            (k, d), off = _decode(buf, off)
            parts.append((k, d) if kind == "geometrycollection" else d)
        return (kind, parts), off
    raise ValueError(kind)


def decode_wkb(b: bytes):
    geom, _ = _decode(memoryview(b), 0)
    return geom


def encode_linestrings_arrow(coords: np.ndarray, lens: np.ndarray):
    """Batch-encode many LineStrings into one Arrow binary array.

    ``coords``: (sum(lens), 2) float64 — all rows' vertices concatenated;
    ``lens``: per-geometry vertex counts.  Builds every WKB blob in a single
    flat numpy buffer (headers scattered by arithmetic, coordinates moved in
    one vectorized scatter) — the per-geometry ``encode_wkb`` loop this
    replaces was a round-2 hot-loop finding on the synthetic OSM paths.
    Byte-identical to ``encode_wkb("linestring", ...)`` per row.
    """
    import pyarrow as pa

    lens = np.asarray(lens, dtype=np.int64)
    n = len(lens)
    if n == 0:
        return pa.array([], pa.binary())
    blob_len = 9 + 16 * lens
    boffs = np.concatenate([[0], np.cumsum(blob_len)])
    starts = boffs[:-1]
    out = np.zeros(int(boffs[-1]), dtype=np.uint8)
    out[starts] = 1  # little-endian flag
    out[starts + 1] = 2  # geometry type LineString (low byte; rest zero)
    ul = lens.astype(np.uint64)
    for b in range(4):  # n_points uint32 LE at offset 5
        out[starts + 5 + b] = ((ul >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.uint8)
    cb = np.ascontiguousarray(coords, dtype="<f8").view(np.uint8).reshape(-1)
    src_row_start = np.concatenate([[0], np.cumsum(lens * 16)])[:-1]
    shift = np.repeat(starts + 9 - src_row_start, lens * 16)
    out[np.arange(len(cb), dtype=np.int64) + shift] = cb
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(boffs.astype(np.int32).tobytes()), pa.py_buffer(out.tobytes())],
    )

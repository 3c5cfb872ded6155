"""Mapbox Vector Tile (MVT 2.1) encoder/decoder, hand-rolled protobuf.

The MVT spec is public (github.com/mapbox/vector-tile-spec).  The reference
encodes/decodes the same format in ``VectorTile.java:103-646`` (geometry
command ints with zig-zag deltas, layers with key/value dictionaries, extent
4096 on 256px tiles).  No protobuf library is needed — the wire format for
this schema is varints + length-delimited submessages.

Geometry input/output is our engine format: ``(kind, parts)`` where parts are
float pixel-coordinate arrays in 0..extent_px (256) tile space; encoding
scales by ``4096 / 256 = 16`` and rounds to integers, matching the
reference's default scale handling.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

GEOM_UNKNOWN, GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 0, 1, 2, 3
_KIND_TO_TYPE = {
    "point": GEOM_POINT,
    "multipoint": GEOM_POINT,
    "linestring": GEOM_LINESTRING,
    "multilinestring": GEOM_LINESTRING,
    "polygon": GEOM_POLYGON,
    "multipolygon": GEOM_POLYGON,
}
EXTENT = 4096
PX_EXTENT = 256
SCALE = EXTENT // PX_EXTENT

_MOVE_TO, _LINE_TO, _CLOSE_PATH = 1, 2, 7


# ---------------------------------------------------------------- protobuf --

def _varint_slow(n: int) -> bytes:
    out = bytearray()
    n &= 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


# small-value cache: geometry deltas and tag indexes are almost always small
_VARINT_CACHE = [_varint_slow(i) for i in range(1 << 14)]


def _varint(n: int) -> bytes:
    if 0 <= n < (1 << 14):
        return _VARINT_CACHE[n]
    return _varint_slow(n)


def _read_varint(buf: memoryview, off: int):
    shift = 0
    val = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _field(field_no: int, wire: int) -> bytes:
    return _varint((field_no << 3) | wire)


def _len_delim(field_no: int, payload: bytes) -> bytes:
    return _field(field_no, 2) + _varint(len(payload)) + payload


def _packed_varints(values) -> bytes:
    cache = _VARINT_CACHE
    return b"".join(
        cache[v] if 0 <= v < 16384 else _varint_slow(v)
        for v in map(int, values)
    )


def point_commands(px: float, py: float, scale: int = SCALE) -> tuple[int, int, int]:
    """Fast path: MVT commands of a single point feature (no numpy)."""
    x = round(px * scale)
    y = round(py * scale)
    zx = (x << 1) ^ (x >> 63) if x >= 0 else ((-x) << 1) - 1
    zy = (y << 1) ^ (y >> 63) if y >= 0 else ((-y) << 1) - 1
    return (9, zx, zy)  # MoveTo, count=1


def zigzag(v):
    v = np.asarray(v, dtype=np.int64)
    return (v << 1) ^ (v >> 63)


def unzigzag(v):
    v = np.asarray(v, dtype=np.int64)
    return (v >> 1) ^ -(v & 1)


# ------------------------------------------------------- geometry commands --

def encode_commands(kind: str, parts: list[np.ndarray], scale: int = SCALE) -> np.ndarray:
    """Pixel-coordinate parts -> MVT geometry command ints (int64 array).

    Points: ``parts`` is a single (n, 2) array, one MoveTo with n points.
    Lines: one MoveTo+LineTo pair per part.
    Polygons: each part is a closed ring -> MoveTo + LineTo + ClosePath (the
    closing vertex is dropped, as the spec requires).
    """
    gtype = _KIND_TO_TYPE[kind]
    cmds: list[np.ndarray] = []
    cx = cy = 0
    if gtype == GEOM_POINT:
        pts = np.rint(np.vstack(parts) * scale).astype(np.int64)
        dx = np.diff(np.concatenate([[cx], pts[:, 0]]))
        dy = np.diff(np.concatenate([[cy], pts[:, 1]]))
        cmds.append(np.array([(_MOVE_TO & 0x7) | (len(pts) << 3)], dtype=np.int64))
        inter = np.empty(len(pts) * 2, dtype=np.int64)
        inter[0::2] = zigzag(dx)
        inter[1::2] = zigzag(dy)
        cmds.append(inter)
        return np.concatenate(cmds)
    for pi, part in enumerate(parts):
        q = np.rint(np.asarray(part) * scale).astype(np.int64)
        closed = gtype == GEOM_POLYGON
        if closed and len(q) > 1 and (q[0] == q[-1]).all():
            q = q[:-1]
        # drop consecutive duplicate integer vertices
        if len(q) > 1:
            keep = np.concatenate([[True], (np.diff(q, axis=0) != 0).any(axis=1)])
            q = q[keep]
        if len(q) < (3 if closed else 2):
            continue
        if closed and kind == "polygon":
            # MVT winding (spec 4.3.3.3, y-down shoelace): exterior = ring 0
            # positive area, holes negative.  Only enforceable here for the
            # single-polygon kind, where ring order gives the structure;
            # multipolygon parts must arrive pre-oriented (render/_orient_
            # polygon, multipolygon.nest_rings, rasterunion.trace_contours
            # all guarantee it).
            xs, ys = q[:, 0], q[:, 1]
            sa = (int(np.dot(xs[:-1], ys[1:])) + int(xs[-1]) * int(ys[0])
                  - int(np.dot(xs[1:], ys[:-1])) - int(xs[0]) * int(ys[-1]))
            if (int(sa) < 0) == (pi == 0):
                q = q[::-1].copy()
        dx = np.diff(np.concatenate([[cx], q[:, 0]]))
        dy = np.diff(np.concatenate([[cy], q[:, 1]]))
        cx, cy = int(q[-1, 0]), int(q[-1, 1])
        cmds.append(np.array([(_MOVE_TO & 0x7) | (1 << 3)], dtype=np.int64))
        first = np.empty(2, dtype=np.int64)
        first[0], first[1] = zigzag(dx[0]), zigzag(dy[0])
        cmds.append(first)
        rest = len(q) - 1
        if rest:
            cmds.append(np.array([(_LINE_TO & 0x7) | (rest << 3)], dtype=np.int64))
            inter = np.empty(rest * 2, dtype=np.int64)
            inter[0::2] = zigzag(dx[1:])
            inter[1::2] = zigzag(dy[1:])
            cmds.append(inter)
        if closed:
            cmds.append(np.array([(_CLOSE_PATH & 0x7) | (1 << 3)], dtype=np.int64))
    if not cmds:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(cmds)


def decode_commands(commands: np.ndarray, gtype: int, scale: int = SCALE) -> list[np.ndarray]:
    """MVT command ints -> list of pixel-coordinate parts (inverse of encode)."""
    parts: list[np.ndarray] = []
    cur: list[list[float]] = []
    i = 0
    cx = cy = 0
    cmds = np.asarray(commands, dtype=np.int64)
    while i < len(cmds):
        cmd = int(cmds[i])
        op, count = cmd & 0x7, cmd >> 3
        i += 1
        if op == _MOVE_TO:
            for _ in range(count):
                cx += int(unzigzag(cmds[i]))
                cy += int(unzigzag(cmds[i + 1]))
                i += 2
                if gtype == GEOM_POINT:
                    parts.append(np.array([[cx / scale, cy / scale]]))
                else:
                    if len(cur) > 1:
                        parts.append(np.array(cur) / scale)
                    cur = [[cx, cy]]
        elif op == _LINE_TO:
            for _ in range(count):
                cx += int(unzigzag(cmds[i]))
                cy += int(unzigzag(cmds[i + 1]))
                i += 2
                cur.append([cx, cy])
        elif op == _CLOSE_PATH:
            if cur:
                cur.append(cur[0])
                parts.append(np.array(cur, dtype=np.float64) / scale)
                cur = []
    if len(cur) > 1:
        parts.append(np.array(cur, dtype=np.float64) / scale)
    if gtype == GEOM_POINT and parts:
        return [np.vstack(parts)]
    return parts


# ------------------------------------------------------------- tile encode --

_VALUE_CACHE: dict = {}
_VALUE_CACHE_MAX = 1 << 16


def _encode_value(v) -> bytes:
    # attr values repeat heavily across features and tiles (langs, admin
    # ids, class names) — memoize the wire bytes per (type, value)
    try:
        key = (v.__class__, v)
        hit = _VALUE_CACHE.get(key)
        if hit is not None:
            return hit
    except TypeError:
        key = None
    if isinstance(v, bool):
        b = _field(7, 0) + _varint(1 if v else 0)
    elif isinstance(v, (int, np.integer)):
        iv = int(v)
        if iv >= 0:
            b = _field(5, 0) + _varint(iv)
        else:
            b = _field(6, 0) + _varint(int(zigzag(iv)))
    elif isinstance(v, (float, np.floating)):
        b = _field(3, 1) + struct.pack("<d", float(v))
    elif isinstance(v, bytes):
        b = _len_delim(1, v)
    else:
        b = _len_delim(1, str(v).encode("utf-8"))
    if key is not None and len(_VALUE_CACHE) < _VALUE_CACHE_MAX:
        _VALUE_CACHE[key] = b
    return b


def encode_tile(layers: dict) -> bytes:
    """``layers`` = {layer_name: [feature, ...]}; feature = dict with keys
    ``id`` (int), ``kind`` (geometry kind str) OR ``type`` (GEOM_*),
    ``commands`` (int array, already encoded) or (``kind`` + ``parts``), and
    ``attrs`` ({str: scalar}).  Returns MVT protobuf bytes (uncompressed).
    """
    out = bytearray()
    for name, features in layers.items():
        keys: list[str] = []
        key_idx: dict[str, int] = {}
        vals: list[bytes] = []
        val_idx: dict[bytes, int] = {}
        feats = bytearray()
        for f in features:
            tags: list[int] = []
            for k, v in (f.get("attrs") or {}).items():
                if v is None:
                    continue
                ki = key_idx.get(k)
                if ki is None:
                    ki = key_idx[k] = len(keys)
                    keys.append(k)
                vb = _encode_value(v)
                vi = val_idx.get(vb)
                if vi is None:
                    vi = val_idx[vb] = len(vals)
                    vals.append(vb)
                tags.extend((ki, vi))
            gtype = f.get("type")
            if gtype is None:
                gtype = _KIND_TO_TYPE[f["kind"]]
            geom_field = f.get("geom_field")  # pre-encoded field-4 bytes
            commands = None
            if geom_field is None:
                commands = f.get("commands")
                if commands is None:
                    commands = encode_commands(f["kind"], f["parts"])
            body = bytearray()
            id_field = f.get("id_field")  # pre-encoded field-1 bytes
            if id_field is not None:
                body += id_field
            else:
                fid = f.get("id")
                if fid is not None:
                    body += _field(1, 0) + _varint(int(fid))
            if tags:
                body += _len_delim(2, _packed_varints(tags))
            body += _field(3, 0) + _varint(gtype)
            if geom_field is not None:
                body += geom_field
            else:
                body += _len_delim(4, _packed_varints(commands))
            feats += _len_delim(2, bytes(body))
        layer = bytearray()
        layer += _field(15, 0) + _varint(2)  # version
        layer += _len_delim(1, name.encode("utf-8"))
        layer += bytes(feats)
        for k in keys:
            layer += _len_delim(3, k.encode("utf-8"))
        for vb in vals:
            layer += _len_delim(4, vb)
        layer += _field(5, 0) + _varint(EXTENT)
        out += _len_delim(3, bytes(layer))
    return bytes(out)


def gzip_tile(data: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return co.compress(data) + co.flush()


def gunzip_tile(data: bytes) -> bytes:
    return zlib.decompress(data, 16 + zlib.MAX_WBITS)


# ------------------------------------------------------------- tile decode --

def _decode_value(buf: memoryview):
    off = 0
    while off < len(buf):
        tag, off = _read_varint(buf, off)
        field_no, wire = tag >> 3, tag & 0x7
        if field_no == 1:
            ln, off = _read_varint(buf, off)
            return bytes(buf[off : off + ln]).decode("utf-8")
        if field_no == 2:
            return struct.unpack_from("<f", buf, off)[0]
        if field_no == 3:
            return struct.unpack_from("<d", buf, off)[0]
        if field_no in (4, 5):
            v, off = _read_varint(buf, off)
            return v
        if field_no == 6:
            v, off = _read_varint(buf, off)
            return int(unzigzag(v))
        if field_no == 7:
            v, off = _read_varint(buf, off)
            return bool(v)
    return None


def decode_tile(data: bytes) -> dict:
    """MVT bytes -> {layer_name: {"extent": int, "features": [...]}} where each
    feature has ``id``, ``type``, ``parts`` (pixel coords) and ``attrs``."""
    buf = memoryview(data)
    off = 0
    out: dict = {}
    while off < len(buf):
        tag, off = _read_varint(buf, off)
        if tag >> 3 != 3:
            raise ValueError("unexpected top-level field")
        ln, off = _read_varint(buf, off)
        layer_buf = buf[off : off + ln]
        off += ln
        name, extent, feats_raw, keys, values = "", EXTENT, [], [], []
        loff = 0
        while loff < len(layer_buf):
            ltag, loff = _read_varint(layer_buf, loff)
            fno, wire = ltag >> 3, ltag & 0x7
            if wire == 2:
                l2, loff = _read_varint(layer_buf, loff)
                payload = layer_buf[loff : loff + l2]
                loff += l2
                if fno == 1:
                    name = bytes(payload).decode("utf-8")
                elif fno == 2:
                    feats_raw.append(payload)
                elif fno == 3:
                    keys.append(bytes(payload).decode("utf-8"))
                elif fno == 4:
                    values.append(_decode_value(payload))
            else:
                v, loff = _read_varint(layer_buf, loff)
                if fno == 5:
                    extent = v
        scale = extent / PX_EXTENT if extent else 1.0
        features = []
        for fb in feats_raw:
            foff = 0
            fid = None
            gtype = GEOM_UNKNOWN
            tags: list[int] = []
            cmds: list[int] = []
            while foff < len(fb):
                ftag, foff = _read_varint(fb, foff)
                fno, wire = ftag >> 3, ftag & 0x7
                if wire == 2:
                    l2, foff = _read_varint(fb, foff)
                    sub = fb[foff : foff + l2]
                    foff += l2
                    soff = 0
                    target = tags if fno == 2 else cmds
                    while soff < len(sub):
                        v, soff = _read_varint(sub, soff)
                        target.append(v)
                else:
                    v, foff = _read_varint(fb, foff)
                    if fno == 1:
                        fid = v
                    elif fno == 3:
                        gtype = v
            attrs = {keys[tags[i]]: values[tags[i + 1]] for i in range(0, len(tags), 2)}
            features.append(
                {
                    "id": fid,
                    "type": gtype,
                    "parts": decode_commands(np.array(cmds, dtype=np.int64), gtype, scale),
                    "attrs": attrs,
                }
            )
        out[name] = {"extent": extent, "features": features}
    return out

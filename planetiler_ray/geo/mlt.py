"""MLT (MapLibre Tile) columnar tile encoding — the capability of the
reference's MLT output branch (``VectorTile.java:662-687`` converts its layer
model to ``org.maplibre.mlt`` FeatureTables; ``TileArchiveWriter`` /
``TileFormat.java`` plumb ``--output-format=mlt``).

The public maplibre-tile-spec stores each layer as a COLUMN-ORIENTED
FeatureTable: an id stream, geometry topology streams (types / ring counts /
vertex counts) and a delta-zigzag vertex buffer, and per-property streams
with presence bitmaps + dictionary encoding — the win over row-oriented MVT
is shared dictionaries and delta-compressed vertices.

This module implements that columnar-stream design (same stream taxonomy,
varint/zigzag/delta/RLE/dictionary encodings) as a self-contained,
deterministic subset: the sandbox has no MLT library to byte-verify against
and the upstream spec is still pre-1.0, so byte-compatibility is NOT
claimed; round-trip fidelity is (``tests/test_sinks.py``), and the layout
converts losslessly from the in-repo tile feature model.

Layout (all ints varint unless noted)::

    "MLT1" | n_layers | layer*
    layer  = name | extent | n_features
           | id stream          (delta-zigzag)
           | geom type stream   (RLE pairs: value, run)
           | n_parts stream     (per feature)
           | n_vertices stream  (per part)
           | vertex stream      (zigzag delta x, y — reset per feature)
           | n_keys | key bytes* | n_vals | val bytes (tagged)*
           | tag stream         (per feature: n_tags, then key/val indexes)
"""

from __future__ import annotations

import gzip

import numpy as np

from .mvt import (GEOM_POINT, _KIND_TO_TYPE, _read_varint, _varint,
                  decode_commands, zigzag, unzigzag)

MAGIC = b"MLT1"
DEFAULT_EXTENT = 4096


def _w_varints(out: bytearray, values) -> None:
    for v in values:
        out += _varint(int(v))


def _w_str(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += _varint(len(b))
    out += b


def _r_str(buf: memoryview, off: int):
    n, off = _read_varint(buf, off)
    return bytes(buf[off : off + n]).decode("utf-8"), off + n


def _w_value(out: bytearray, v) -> None:
    """Tagged property value: 0=str, 1=int(zigzag), 2=float64, 3=bool."""
    if isinstance(v, bool):
        out += _varint(3)
        out += _varint(1 if v else 0)
    elif isinstance(v, (int, np.integer)):
        out += _varint(1)
        out += _varint(int(zigzag(int(v))))
    elif isinstance(v, float):
        out += _varint(2)
        out += np.float64(v).tobytes()
    else:
        out += _varint(0)
        _w_str(out, str(v))


def _r_value(buf: memoryview, off: int):
    tag, off = _read_varint(buf, off)
    if tag == 0:
        return _r_str(buf, off)
    if tag == 1:
        v, off = _read_varint(buf, off)
        return int(unzigzag(v)), off
    if tag == 2:
        return float(np.frombuffer(buf[off : off + 8], np.float64)[0]), off + 8
    v, off = _read_varint(buf, off)
    return bool(v), off


def _feature_parts(f: dict) -> tuple[int, list[np.ndarray]]:
    """Feature dict (``commands`` or ``kind``+``parts``) -> (gtype, parts)."""
    gtype = f.get("type") or _KIND_TO_TYPE[f["kind"]]
    if "parts" in f and f["parts"] is not None:
        parts = [np.asarray(p, dtype=np.float64) for p in f["parts"]]
        if gtype == GEOM_POINT:
            parts = [np.vstack(parts)] if parts else []
    else:
        parts = decode_commands(np.asarray(f["commands"], dtype=np.int64), gtype)
    return gtype, parts


def encode_tile(layers: dict, extent: int = DEFAULT_EXTENT) -> bytes:
    """``layers`` = {name: [feature, ...]} with the same feature model the
    MVT encoder takes (``id``, ``kind``/``type``, ``commands`` or ``parts``,
    ``attrs``) -> MLT columnar bytes."""
    out = bytearray(MAGIC)
    out += _varint(len(layers))
    for name, features in layers.items():
        _w_str(out, name)
        out += _varint(extent)
        out += _varint(len(features))
        # --- id stream: delta-zigzag
        ids = np.array([int(f.get("id") or 0) for f in features], dtype=np.int64)
        prev = 0
        for i in ids:
            out += _varint(int(zigzag(int(i) - prev)))
            prev = int(i)
        # --- geometry: types RLE + topology + vertices
        gtypes, all_parts = [], []
        for f in features:
            gt, parts = _feature_parts(f)
            gtypes.append(gt)
            all_parts.append(parts)
        i = 0
        runs = []
        while i < len(gtypes):
            j = i
            while j < len(gtypes) and gtypes[j] == gtypes[i]:
                j += 1
            runs.append((gtypes[i], j - i))
            i = j
        out += _varint(len(runs))
        for val, run in runs:
            out += _varint(val)
            out += _varint(run)
        for parts in all_parts:
            out += _varint(len(parts))
        for parts in all_parts:
            for p in parts:
                out += _varint(len(p))
        for parts in all_parts:
            px = py = 0  # delta resets per feature
            for p in parts:
                q = np.rint(np.asarray(p, dtype=np.float64) * 16.0).astype(np.int64)
                for x, y in q:
                    out += _varint(int(zigzag(int(x) - px)))
                    out += _varint(int(zigzag(int(y) - py)))
                    px, py = int(x), int(y)
        # --- properties: shared dictionaries + per-feature tag stream
        keys: list[str] = []
        key_idx: dict[str, int] = {}
        vals: list = []
        val_idx: dict = {}
        tag_stream: list[list[int]] = []
        for f in features:
            tags = []
            for k, v in (f.get("attrs") or {}).items():
                if v is None:
                    continue
                ki = key_idx.setdefault(k, len(keys))
                if ki == len(keys):
                    keys.append(k)
                vk = (type(v).__name__, v)
                vi = val_idx.setdefault(vk, len(vals))
                if vi == len(vals):
                    vals.append(v)
                tags.extend((ki, vi))
            tag_stream.append(tags)
        out += _varint(len(keys))
        for k in keys:
            _w_str(out, k)
        out += _varint(len(vals))
        for v in vals:
            _w_value(out, v)
        for tags in tag_stream:
            out += _varint(len(tags) // 2)
            _w_varints(out, tags)
    return bytes(out)


def decode_tile(data: bytes) -> dict:
    """MLT bytes -> {layer: [feature, ...]} with ``id``, ``type``,
    ``parts`` (pixel coords), ``attrs`` — the inverse of :func:`encode_tile`."""
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an MLT tile")
    off = 4
    n_layers, off = _read_varint(buf, off)
    layers: dict = {}
    for _ in range(n_layers):
        name, off = _r_str(buf, off)
        _extent, off = _read_varint(buf, off)
        n_feat, off = _read_varint(buf, off)
        ids = []
        prev = 0
        for _ in range(n_feat):
            d, off = _read_varint(buf, off)
            prev += int(unzigzag(d))
            ids.append(prev)
        n_runs, off = _read_varint(buf, off)
        gtypes: list[int] = []
        for _ in range(n_runs):
            val, off = _read_varint(buf, off)
            run, off = _read_varint(buf, off)
            gtypes.extend([val] * run)
        n_parts = []
        for _ in range(n_feat):
            v, off = _read_varint(buf, off)
            n_parts.append(v)
        n_verts: list[list[int]] = []
        for np_ in n_parts:
            row = []
            for _ in range(np_):
                v, off = _read_varint(buf, off)
                row.append(v)
            n_verts.append(row)
        feats = []
        for fi in range(n_feat):
            px = py = 0
            parts = []
            for nv in n_verts[fi]:
                pts = np.empty((nv, 2), dtype=np.float64)
                for vi in range(nv):
                    dx, off = _read_varint(buf, off)
                    dy, off = _read_varint(buf, off)
                    px += int(unzigzag(dx))
                    py += int(unzigzag(dy))
                    pts[vi] = (px / 16.0, py / 16.0)
                parts.append(pts)
            feats.append({"id": ids[fi], "type": gtypes[fi], "parts": parts})
        n_keys, off = _read_varint(buf, off)
        keys = []
        for _ in range(n_keys):
            k, off = _r_str(buf, off)
            keys.append(k)
        n_vals, off = _read_varint(buf, off)
        vals = []
        for _ in range(n_vals):
            v, off = _r_value(buf, off)
            vals.append(v)
        for f in feats:
            n_tags, off = _read_varint(buf, off)
            attrs = {}
            for _ in range(n_tags):
                ki, off = _read_varint(buf, off)
                vi, off = _read_varint(buf, off)
                attrs[keys[ki]] = vals[vi]
            f["attrs"] = attrs
        layers[name] = feats
    return layers


def from_mvt(mvt_bytes: bytes) -> bytes:
    """Re-encode an (uncompressed) MVT tile as MLT — the reference's
    ``toMltInput`` conversion path."""
    from . import mvt as M

    decoded = M.decode_tile(mvt_bytes)
    layers = {}
    for name, layer in decoded.items():
        layers[name] = [
            {"id": f.get("id"), "type": f["type"], "parts": f["parts"],
             "attrs": f.get("attrs") or {}}
            for f in layer["features"]
        ]
    return encode_tile(layers)


def gzip_tile(data: bytes) -> bytes:
    return gzip.compress(data, 6)

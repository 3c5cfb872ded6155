"""GeoJSON / NDJSON source reader (``reader/geojson/GeoJsonReader.java``
capability, no GDAL needed — GeoJSON is plain JSON).

NDJSON (one feature per line) streams through ``ray.data.read_json``; a plain
FeatureCollection file is parsed driver-side (they are small by nature — the
streaming format for big data is NDJSON) and distributed via ``from_items``.
Geometries become our WKB binary column.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..geo import wkb


def _geom_to_wkb(geom: dict) -> bytes | None:
    if geom is None:
        return None
    t = geom["type"].lower()
    c = geom.get("coordinates")
    if t == "point":
        return wkb.encode_wkb("point", np.asarray(c, dtype=np.float64))
    if t == "linestring":
        return wkb.encode_wkb("linestring", np.asarray(c, dtype=np.float64))
    if t == "polygon":
        return wkb.encode_wkb("polygon", [np.asarray(r, dtype=np.float64) for r in c])
    if t == "multipoint":
        return wkb.encode_wkb("multipoint", [np.asarray(p, dtype=np.float64) for p in c])
    if t == "multilinestring":
        return wkb.encode_wkb(
            "multilinestring", [np.asarray(l, dtype=np.float64) for l in c]
        )
    if t == "multipolygon":
        return wkb.encode_wkb(
            "multipolygon",
            [[np.asarray(r, dtype=np.float64) for r in p] for p in c],
        )
    if t == "geometrycollection":
        parts = []
        for g in geom.get("geometries", []):
            b = _geom_to_wkb(g)
            if b is not None:
                parts.append(wkb.decode_wkb(b))
        return wkb.encode_wkb("geometrycollection", parts)
    raise ValueError(f"unknown geometry type {t}")


def _feature_to_row(feat: dict, idx: int) -> dict:
    props = feat.get("properties") or {}
    geom = feat.get("geometry")
    return {
        "feature_id": feat.get("id", idx),
        "geom_wkb": _geom_to_wkb(geom),
        "geom_type": (geom or {}).get("type", "").lower(),
        "properties": json.dumps(props, sort_keys=True),
    }


def read_geojson(path: str) -> ray.data.Dataset:
    """Plain GeoJSON FeatureCollection file -> feature Dataset."""
    with open(path) as f:
        doc = json.load(f)
    feats = doc["features"] if doc.get("type") == "FeatureCollection" else [doc]
    rows = [_feature_to_row(ft, i) for i, ft in enumerate(feats)]
    return ray.data.from_items(rows)


def read_ndjson_features(paths) -> ray.data.Dataset:
    """NDJSON (one GeoJSON feature per line) -> feature Dataset, streaming.

    Read as text lines (mixed geometry types make the coordinates field
    non-columnar, so a structured JSON reader can't type it) and parse per
    batch — geometry nesting varies per feature, exactly like the reference's
    streaming GeoJsonFeatureIterator.
    """

    def convert(batch: pa.Table) -> pa.Table:
        import hashlib

        lines = [t for t in batch.column("text").to_pylist() if t.strip()]
        rows = [json.loads(t) for t in lines]
        # features without an 'id' get a stable content hash, not a per-batch
        # index (batches restart at 0, which would collide across batches)
        out = [
            _feature_to_row(
                r,
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") >> 1,
            )
            for t, r in zip(lines, rows)
        ]
        return pa.table(
            {
                "feature_id": pa.array([r["feature_id"] for r in out]),
                "geom_wkb": pa.array([r["geom_wkb"] for r in out], pa.binary()),
                "geom_type": pa.array([r["geom_type"] for r in out], pa.string()),
                "properties": pa.array([r["properties"] for r in out], pa.string()),
            }
        )

    return ray.data.read_text(paths).map_batches(convert, batch_format="pyarrow")

"""No-code YAML profiles — the custommap analogue.

Re-expresses the reference's ``planetiler-custommap`` capability
(``ConfiguredProfile.java:33-160`` / ``ConfiguredFeature.java``: schema ->
layers -> features with boolean-expression filters, attr mappings with
``include_when``, zoom ranges, label-grid post-processing) over the Ray
pipeline: each YAML layer compiles to a vectorized Expression filter + attr
projection + LayerSpec, and the standard bucket assembler builds the tiles.

Schema (see ``samples/webgeo_lite.yml``):

    schema_name: str
    layers:
      - name: str
        source: points | admin        # engine source datasets
        filter: <expression config>   # functions.expression.expr_from_config
        min_zoom / max_zoom: int
        attrs:
          - key: str
            column: str           # copy a source column
            value: any            # or a constant
            include_when: <expression config>   # optional per-attr gate
        label_grid: {px: float, limit: int, max_zoom: int}   # optional
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import yaml

import ray
import ray.data

from ..functions.expression import expr_from_config
from ..stages.tiling import slice_points
from .profile import LayerSpec, TilingProfile, ZoomFunction


def load_schema(src) -> dict:
    if isinstance(src, dict):
        return src
    return yaml.safe_load(src)


def profile_from_schema(schema: dict) -> TilingProfile:
    prof = TilingProfile(name=schema.get("schema_name", "yaml"),
                        description=schema.get("schema_description", ""))
    for layer in schema["layers"]:
        lg = layer.get("label_grid")
        grid = limit = None
        if lg:
            below = int(lg.get("max_zoom", 14)) + 1
            grid = ZoomFunction({0: float(lg["px"]), below: None})
            limit = ZoomFunction({0: int(lg["limit"]), below: None})
        attr_cols = tuple(a["key"] for a in layer.get("attrs", []))
        attr_min_zoom = {
            a["key"]: int(a["min_zoom"]) for a in layer.get("attrs", [])
            if "min_zoom" in a
        }
        prof.add(
            LayerSpec(
                name=layer["name"],
                attr_cols=attr_cols,
                min_zoom=int(layer.get("min_zoom", 0)),
                max_zoom=int(layer.get("max_zoom", 14)),
                label_grid_px=grid,
                label_grid_limit=limit,
                attr_min_zoom=attr_min_zoom,
            )
        )
    return prof


def _apply_layer(batch: pa.Table, layer: dict) -> pa.Table:
    """Filter + attr projection for one YAML layer over a points batch."""
    expr = expr_from_config(layer.get("filter")).simplify()
    mask = expr.evaluate(batch)
    sub = batch.filter(pa.array(mask))
    n = sub.num_rows
    cols: dict[str, pa.Array] = {
        "lat": sub.column("lat"),
        "lon": sub.column("lon"),
        "doc_id": sub.column("doc_id"),
        "mention_idx": sub.column("mention_idx"),
    }
    for a in layer.get("attrs", []):
        key = a["key"]
        if "column" in a:
            col = sub.column(a["column"])
        else:
            col = pa.array([a.get("value")] * n)
        inc = a.get("include_when")
        if inc is not None:
            gate = expr_from_config(inc).evaluate(sub)
            col = pa.array(
                [v if g else None for v, g in zip(col.to_pylist(), gate)]
            )
        cols[key] = col
    return pa.table(cols)


def yaml_tile_rows(points_ds: ray.data.Dataset, schema: dict, zooms=None) -> ray.data.Dataset:
    """points Dataset (enriched mentions) -> unified tile rows for ALL layers
    of the schema (one pass; per-layer filter+attrs, then slicing)."""
    layers = [l for l in schema["layers"] if l.get("source", "points") == "points"]
    attr_keys = sorted({a["key"] for l in layers for a in l.get("attrs", [])})

    def build(batch: pa.Table) -> pa.Table:
        outs = []
        for layer in layers:
            sub = _apply_layer(batch, layer)
            if sub.num_rows == 0:
                continue
            t = slice_points(sub, zooms=zooms)
            n = t.num_rows
            t = t.append_column("layer", pa.array([layer["name"]] * n, pa.string()))
            t = t.append_column("kind", pa.array(["point"] * n, pa.string()))
            fid = t.column("doc_id").to_numpy() * 8 + t.column("mention_idx").to_numpy()
            t = t.append_column("feature_id", pa.array(fid, pa.int64()))
            outs.append(t)
        if not outs:
            fields = [
                ("tile_id", pa.int64()), ("z", pa.int64()), ("tile_x", pa.int64()),
                ("tile_y", pa.int64()), ("layer", pa.string()), ("kind", pa.string()),
                ("feature_id", pa.int64()), ("px", pa.float64()), ("py", pa.float64()),
            ] + [(k, pa.string()) for k in attr_keys]
            return pa.schema(fields).empty_table()
        # align schemas (union of attr keys)
        aligned = []
        for t in outs:
            cols = {}
            for name in ["tile_id", "z", "tile_x", "tile_y", "layer", "kind",
                         "feature_id", "px", "py"]:
                cols[name] = t.column(name)
            for k in attr_keys:
                if k in t.column_names:
                    cols[k] = t.column(k).cast(pa.string())
                else:
                    cols[k] = pa.nulls(t.num_rows, pa.string())
            aligned.append(pa.table(cols))
        return pa.concat_tables(aligned)

    return points_ds.map_batches(build, batch_format="pyarrow")


_PLACEMENTS = ("centroid", "point_on_surface", "innermost_point",
               "centroid_if_convex")


def admin_label_rows(sf_dir: str, layer: dict, zooms=None) -> ray.data.Dataset:
    """``source: admin`` layers with a point ``geometry``: one label point
    per polygon via the FeatureCollector constructors
    (``geometry: centroid | point_on_surface | innermost_point |
    centroid_if_convex``, tolerance via ``tolerance``) — the label-placement
    surface of ``FeatureCollector.java:96-325`` reachable from no-code
    schemas."""
    from ..geo import geomops, wkb
    from ..sources.world import admin_table

    placement = layer.get("geometry", "innermost_point")
    if placement not in _PLACEMENTS:
        raise ValueError(f"geometry must be one of {_PLACEMENTS}, got {placement}")
    tol = float(layer.get("tolerance", 0.1))

    def to_points(batch: pa.Table) -> pa.Table:
        ids, lats, lons, names, isos = [], [], [], [], []
        for i in range(batch.num_rows):
            kind, rings = wkb.decode_wkb(batch.column("geom_wkb")[i].as_py())
            polys = rings if kind == "multipolygon" else [rings]
            for poly in polys:
                if placement == "centroid":
                    pt = geomops.centroid("polygon", poly)
                elif placement == "point_on_surface":
                    pt = geomops.point_on_surface(poly)
                elif placement == "centroid_if_convex":
                    pt = geomops.centroid_if_convex(poly)
                else:
                    pt = geomops.innermost_point(poly, tol)
                ids.append(int(batch.column("admin_id")[i].as_py()))
                lons.append(float(pt[0]))
                lats.append(float(pt[1]))
                names.append(batch.column("name")[i].as_py())
                isos.append(batch.column("iso_code")[i].as_py())
        return pa.table(
            {
                "admin_id": pa.array(ids, pa.int64()),
                "lat": pa.array(lats, pa.float64()),
                "lon": pa.array(lons, pa.float64()),
                "name": pa.array(names, pa.string()),
                "iso_code": pa.array(isos, pa.string()),
            }
        )

    def build(batch: pa.Table) -> pa.Table:
        pts = to_points(batch)
        if pts.num_rows == 0:
            return pts
        t = slice_points(pts, zooms=zooms)
        n = t.num_rows
        t = t.append_column("layer", pa.array([layer["name"]] * n, pa.string()))
        t = t.append_column("kind", pa.array(["point"] * n, pa.string()))
        return t.append_column("feature_id", t.column("admin_id").cast(pa.int64()))

    return ray.data.from_arrow(admin_table(sf_dir)).map_batches(
        build, batch_format="pyarrow"
    )


def build_yaml_tiles(sf_dir: str, schema_src, zooms=None, n_buckets: int = 256,
                     repl: int = 1) -> ray.data.Dataset:
    """Full no-code pipeline: YAML schema -> assembled tiles Dataset."""
    from ..sinks.files import add_bucket
    from ..stages.assemble import make_bucket_assembler
    from .webgeo import enriched_points_ds

    schema = load_schema(schema_src)
    profile = profile_from_schema(schema)
    rows = yaml_tile_rows(enriched_points_ds(sf_dir, repl), schema, zooms)
    admin_layers = [l for l in schema["layers"] if l.get("source") == "admin"]
    for al in admin_layers:
        extra = admin_label_rows(sf_dir, al, zooms)
        # align to the unified row schema (attrs as strings, union of keys)
        attr_keys = sorted({a["key"] for l in schema["layers"]
                            for a in l.get("attrs", [])})
        key_src = {a["key"]: a.get("column", a["key"]) for a in al.get("attrs", [])}

        def align(batch: pa.Table, _keys=tuple(attr_keys), _src=key_src) -> pa.Table:
            cols = {}
            for name in ["tile_id", "z", "tile_x", "tile_y", "layer", "kind",
                         "feature_id", "px", "py"]:
                cols[name] = batch.column(name)
            for k in _keys:
                src = _src.get(k)
                if src and src in batch.column_names:
                    cols[k] = batch.column(src).cast(pa.string())
                else:
                    cols[k] = pa.nulls(batch.num_rows, pa.string())
            return pa.table(cols)

        rows = rows.union(extra.map_batches(align, batch_format="pyarrow"))
    return (
        rows.map_batches(add_bucket, batch_format="pyarrow",
                         fn_kwargs={"n_buckets": n_buckets})
        .groupby("bucket")
        .map_groups(
            lambda g: make_bucket_assembler(profile)(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


SAMPLE_SCHEMA = """
schema_name: webgeo-lite
schema_description: sample no-code schema over geoparsed mentions
layers:
  - name: en_places
    source: points
    filter: { lang: [en, fr] }
    min_zoom: 2
    max_zoom: 14
    attrs:
      - key: lang
        column: lang
      - key: cls
        value: latin
    label_grid: { px: 64, limit: 4, max_zoom: 7 }
  - name: hot_admin
    source: points
    filter: { admin_id: ["17"] }
    min_zoom: 0
    max_zoom: 14
    attrs:
      - key: admin
        column: admin_id
  - name: admin_labels
    source: admin
    # centroid: exactly the rect center, so the DuckDB twin can mirror the
    # label point bit-for-bit (innermost_point's probe loop picks an
    # off-center pole on these wide rects and is covered by unit tests)
    geometry: centroid
    min_zoom: 0
    max_zoom: 14
    attrs:
      - key: label
        column: name
"""

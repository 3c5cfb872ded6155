"""Routes demo pipeline: OSM-style assembled ways -> line layer -> tiles.

Exercises the full line path: shuffle-join way assembly (``pipelines/osm``)
-> per-zoom line render (min-pixel-size, DP simplify, stripe slicing,
``stages/render``) -> tile shuffle -> per-tile attr-grouped line MERGING
(``FeatureMerge.mergeLineStrings`` analogue) -> MVT.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..geo import wkb
from ..stages.render import render_geometry_rows
from .profile import LayerSpec, TilingProfile
from .osm import way_lines_ds


def routes_profile() -> TilingProfile:
    p = TilingProfile(name="routes", description="assembled ways as lines")
    p.add(
        LayerSpec(
            name="routes",
            attr_cols=("cls",),
            min_zoom=0,
            max_zoom=10,
            merge_lines=True,
            merge_min_length=4.0,
        )
    )
    return p


def route_rows_ds(sf_dir: str, zooms=None) -> ray.data.Dataset:
    def render(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for i in range(batch.num_rows):
            k, coords = wkb.decode_wkb(batch.column("geom_wkb")[i].as_py())
            wid = int(batch.column("way_id")[i].as_py())
            rows.extend(
                render_geometry_rows(
                    feature_id=wid,
                    kind="linestring",
                    geom_lonlat=coords,
                    layer="routes",
                    attrs_row={"cls": f"c{wid % 4}"},
                    min_zoom=0,
                    max_zoom=10,
                    zooms=zooms,
                )
            )
        if not rows:
            return pa.schema(
                [("tile_id", pa.int64()), ("z", pa.int64()), ("tile_x", pa.int64()),
                 ("tile_y", pa.int64()), ("layer", pa.string()), ("kind", pa.string()),
                 ("geom_px", pa.binary()), ("is_fill", pa.bool_()),
                 ("feature_id", pa.int64()), ("cls", pa.string())]
            ).empty_table()
        cols = {k: [r.get(k) for r in rows] for k in rows[0]}
        return pa.table(cols)

    return way_lines_ds(sf_dir).map_batches(render, batch_format="pyarrow")


def route_tiles_ds(sf_dir: str, zooms=None, n_buckets: int = 256) -> ray.data.Dataset:
    from ..sinks.files import add_bucket
    from ..stages.assemble import make_bucket_assembler

    prof = routes_profile()
    return (
        route_rows_ds(sf_dir, zooms)
        .map_batches(add_bucket, batch_format="pyarrow",
                     fn_kwargs={"n_buckets": n_buckets})
        .groupby("bucket")
        .map_groups(
            lambda g: make_bucket_assembler(prof)(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )

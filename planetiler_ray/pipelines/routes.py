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


def route_zoom_gate_ds(sf_dir: str, zooms=(0, 4, 8)) -> ray.data.Dataset:
    """Per-zoom way counts through the REAL render min-pixel-length gate.

    The oracle-expressible deterministic core of the route path (the
    ``FeatureRenderer`` length gate, ``render.py:112``): a way appears at
    zoom z iff its mercator length x 256*2^z >= 1 px.  Computed from the
    actual render output (distinct (z, feature_id) over the sliced tile
    rows), so it exercises gate + projection + slicing end-to-end; the
    DuckDB twin (:func:`sql_route_zoom_gate`) re-derives the same set by
    mirroring assembly -> anchor arithmetic -> mercator -> segment-length
    sum.  DP simplify / tile slicing / line merge stay byte-level-tested in
    the unit suite (not SQL-mirrorable).
    """
    from ray.data.aggregate import Count, Sum

    def pairs(batch: pa.Table) -> pa.Table:
        # per-batch partial distinct so the shuffle moves (z, way) pairs,
        # not per-tile rows
        return batch.select(["z", "feature_id"]).group_by(
            ["z", "feature_id"]
        ).aggregate([])

    return (
        route_rows_ds(sf_dir, zooms=list(zooms))
        .map_batches(pairs, batch_format="pyarrow")
        .groupby(["z", "feature_id"])
        .count()
        .groupby("z")
        .aggregate(
            Count(alias_name="n_ways"),
            Sum("feature_id", alias_name="way_id_sum"),
        )
    )


def sql_route_zoom_gate(zooms=(0, 4, 8)) -> str:
    """DuckDB mirror of :func:`route_zoom_gate_ds`.

    Mirrors the integer node/anchor arithmetic of ``osm.way_lines_ds``
    (note numpy's floored ``%`` -> ``((x % m) + m) % m`` on the possibly
    negative mdeg offsets) and the mercator y formula of
    ``geo/mercator.py:37`` with identical expression structure.  The only
    float-robustness exposure is the gate comparison itself (sum order +
    hypot-vs-sqrt, ~1 ulp) — flips require a way sitting within ~1e-13 of
    the 1 px threshold, same accepted risk class as ``sql_cell_counts``.
    """
    from .osm import (
        NODE_LAT_MULT,
        NODE_LON_MULT,
        WAY_ANCHOR_LAT_MULT,
        WAY_ANCHOR_LON_MULT,
    )

    zs = ", ".join(f"({z}, {256.0 * (1 << z)!r})" for z in zooms)
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
coords AS (
    SELECT way_id, seq, node_id,
           ((way_id * {WAY_ANCHOR_LAT_MULT}) % 160000 - 80000
             + ((lat_mdeg % 2000) + 2000) % 2000 - 1000) / 1000.0 AS lat,
           ((way_id * {WAY_ANCHOR_LON_MULT}) % 350000 - 175000
             + ((lon_mdeg % 2000) + 2000) % 2000 - 1000) / 1000.0 AS lon
    FROM joined
),
proj AS (
    SELECT way_id, seq, node_id,
           (lon + 180.0) / 360.0 AS wx,
           0.5 - 0.25 * ln((1.0 + sin(radians(lat)))
                           / (1.0 - sin(radians(lat)))) / pi() AS wy
    FROM coords
),
segs AS (
    SELECT way_id,
           wx - lag(wx) OVER w AS dx,
           wy - lag(wy) OVER w AS dy
    FROM proj WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
),
ways AS (
    SELECT way_id, sum(sqrt(dx * dx + dy * dy)) AS len_w
    FROM segs GROUP BY way_id
    HAVING count(*) >= 2
)
SELECT zs.z AS z, count(*) AS n_ways,
       CAST(sum(w.way_id) AS BIGINT) AS way_id_sum
FROM ways w, (VALUES {zs}) AS zs(z, scale)
WHERE w.len_w * zs.scale >= 1.0
GROUP BY zs.z
"""


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

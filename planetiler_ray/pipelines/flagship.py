"""Flagship end-to-end build: pages + admin polygons -> assembled MVT tiles.

The full Planetiler-equivalent flow (read -> profile flat-map -> render/slice
-> tile-keyed shuffle -> per-tile assemble+encode -> archive), Ray-Data-first.
The only all-to-all exchange is ``groupby(tile_id)`` — the analogue of the
reference's external merge sort by the 64-bit tile key
(``collection/ExternalMergeSort.java``).

Hot-tile skew: the places layer concentrates ~10% of mentions in one Paris
tile (the synthetic skew knob).  ``tile_rows_ds`` therefore salts the group
key: ``group_key = tile_id * SALT + (feature_id % salt_of(z))`` with
``salt_of`` >1 only for low zooms (hot tiles), and the assembler's
label-grid/top-k logic is applied per salt partition then merged in the final
per-tile pass — same two-level pattern the reference uses for its dynamic
tile batches (``TileArchiveWriter.java:244-271``).  v1 uses salt=1 (single
stage); the salted path is exercised via ``salt`` argument.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..sources.world import admin_table
from ..stages.assemble import TILE_SCHEMA, make_tile_assembler
from ..stages.render import render_admin_batch
from ..stages.tiling import slice_points
from .profile import flagship_profile
from .webgeo import enriched_points_ds

ROW_COLUMNS = [
    "tile_id", "z", "tile_x", "tile_y", "layer", "kind", "geom_px", "is_fill",
    "feature_id", "px", "py", "lang", "admin_id", "poi_id", "name", "iso_code",
]

# narrow types + dictionary-encoded constant strings: the tile-row table is
# what crosses the ONE shuffle — every byte here is multiplied by rows x 2
_TYPES = {
    "tile_id": pa.int64(), "z": pa.int16(), "tile_x": pa.int32(),
    "tile_y": pa.int32(), "layer": pa.string(), "kind": pa.string(),
    "geom_px": pa.binary(), "is_fill": pa.bool_(), "feature_id": pa.int64(),
    "px": pa.float32(), "py": pa.float32(), "lang": pa.string(),
    "admin_id": pa.int32(), "poi_id": pa.int32(), "name": pa.string(),
    "iso_code": pa.string(),
}
_DICT_COLS = ("layer", "kind", "lang")


def _conform(batch: pa.Table) -> pa.Table:
    """Project a batch onto the unified tile-row schema (missing -> nulls)."""
    n = batch.num_rows
    cols = {}
    for name in ROW_COLUMNS:
        if name in batch.column_names:
            col = batch.column(name).cast(_TYPES[name])
        else:
            col = pa.nulls(n, _TYPES[name])
        if name in _DICT_COLS:
            chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
            if not chunks:
                chunks = [pa.array([], _TYPES[name])]
            col = pa.chunked_array([c.dictionary_encode() for c in chunks])
        cols[name] = col
    return pa.table(cols)


def point_rows_ds(sf_dir: str, zooms=None, repl: int = 1,
                  prune: bool = True) -> ray.data.Dataset:
    """places layer: enriched mention points sliced into all zooms.

    ``prune=True`` applies the pre-shuffle partial label-grid combiner
    (hot-tile salting; byte-identical output, test-pinned)."""
    from ..stages.tiling import label_grid_prune
    from .profile import flagship_profile, resolve_zoom

    spec = flagship_profile().layers["places"]

    def to_rows(batch: pa.Table) -> pa.Table:
        t = slice_points(batch, zooms=zooms)
        # cast px/py to their shuffle dtype BEFORE the prune combiner so the
        # partial top-k sees the same cell assignments as the assembler
        # (float64->float32 rounding could flip a boundary cell otherwise)
        for c in ("px", "py"):
            t = t.set_column(t.column_names.index(c), c,
                             t.column(c).cast(pa.float32()))
        n = t.num_rows
        t = t.append_column("layer", pa.array(["places"] * n, pa.string()))
        t = t.append_column("kind", pa.array(["point"] * n, pa.string()))
        fid = t.column("doc_id").to_numpy() * 8 + t.column("mention_idx").to_numpy()
        t = t.append_column("feature_id", pa.array(fid, pa.int64()))
        if prune and n:
            t = label_grid_prune(
                t,
                grid_by_zoom=lambda z: resolve_zoom(spec.label_grid_px, z),
                limit_by_zoom=lambda z: resolve_zoom(spec.label_grid_limit, z),
            )
        return _conform(t)

    return enriched_points_ds(sf_dir, repl).map_batches(to_rows, batch_format="pyarrow")


def admin_rows_ds(sf_dir: str, zooms=None) -> ray.data.Dataset:
    ds = ray.data.from_arrow(admin_table(sf_dir))
    return ds.map_batches(
        lambda b: _conform(render_admin_batch(b, zooms=zooms)), batch_format="pyarrow"
    )


def tile_rows_ds(sf_dir: str, zooms=None, repl: int = 1,
                 prune: bool = True) -> ray.data.Dataset:
    return point_rows_ds(sf_dir, zooms, repl, prune).union(admin_rows_ds(sf_dir, zooms))


def shuffle_partitions(default_per_core: int = 2, floor: int = 64) -> int:
    """Shuffle/assembly parallelism: ~2x total cluster cores (whole
    scheduling waves, headroom for stragglers), floored at the measured
    single-box sweet spot of 64 — the knob ADVICE r2 asked for instead of
    a hardcoded 64 that caps multi-node clusters."""
    import ray as _ray

    try:
        cores = int(_ray.cluster_resources().get("CPU", 32))
    except Exception:
        cores = 32
    return max(floor, default_per_core * cores)


def assemble_tiles(rows: ray.data.Dataset, profile, n_buckets: int = 1024,
                   partitions: int | None = None) -> ray.data.Dataset:
    """Bucket-shuffle + per-bucket tile assembly over a tile-row Dataset
    (the reusable back half of :func:`tiles_ds`)."""
    from ..sinks.files import add_bucket
    from ..stages.assemble import make_bucket_assembler

    if partitions is None:
        partitions = shuffle_partitions()
    return (
        # coalesce the union's 64+1 blocks: the sort shuffle's output
        # partition count follows the input block count; ~2x cluster cores
        # keeps the assembly stage on whole scheduling waves (measured sweet
        # spot 64 on a 32-core box; 128 blocks = +11% wall there)
        rows.repartition(partitions)
        .map_batches(add_bucket, batch_format="pyarrow",
                     fn_kwargs={"n_buckets": n_buckets})
        .groupby("bucket")
        .map_groups(
            lambda g: make_bucket_assembler(profile)(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


def tiles_ds(sf_dir: str, zooms=None, profile=None, n_buckets: int = 1024,
             repl: int = 1, prune: bool = True,
             partitions: int | None = None) -> ray.data.Dataset:
    """Assembled tiles: one row per (z, x, y) with gzipped MVT bytes.

    ONE shuffle: rows are hash-bucketed by tile_id (load-balanced across
    zooms) and whole buckets are assembled per map_groups call.
    """
    profile = profile or flagship_profile()
    rows = tile_rows_ds(sf_dir, zooms, repl, prune)
    return assemble_tiles(rows, profile, n_buckets, partitions)


def tile_summary_ds(sf_dir: str, zooms=None) -> ray.data.Dataset:
    return tiles_ds(sf_dir, zooms).select_columns(
        ["z", "tile_x", "tile_y", "n_features", "n_bytes"]
    )


def build_mbtiles(sf_dir: str, path: str, zooms=None, profile=None,
                  n_buckets: int = 256, repl: int = 1) -> dict:
    """End-to-end build into a single MBTiles file (driver-side single
    writer, like the reference's writer thread) + tilestats metadata."""
    import json as _json

    from ..sinks.mbtiles import write_mbtiles
    from .stats import archive_metadata

    profile = profile or flagship_profile()
    tiles = tiles_ds(sf_dir, zooms, profile, n_buckets, repl).materialize()
    meta = archive_metadata(tiles, profile, {"sf_dir": sf_dir})
    stats = write_mbtiles(tiles, path, metadata={"name": profile.name,
                                                "json": _json.dumps(meta)})
    return {**stats, **{"minzoom": meta["minzoom"], "maxzoom": meta["maxzoom"]}}


def build_pmtiles(sf_dir: str, path: str, zooms=None, profile=None,
                  n_buckets: int = 256, repl: int = 1) -> dict:
    """End-to-end build into a single PMTiles v3 file (global Hilbert sort ->
    driver-side packer) + metadata."""
    from ..sinks.pmtiles import write_pmtiles
    from .stats import archive_metadata

    profile = profile or flagship_profile()
    tiles = tiles_ds(sf_dir, zooms, profile, n_buckets, repl).materialize()
    meta = archive_metadata(tiles, profile, {"sf_dir": sf_dir})
    return write_pmtiles(tiles, path, metadata=meta)


def build_proto_stream(sf_dir: str, path: str, zooms=None, profile=None,
                       n_buckets: int = 256, repl: int = 1) -> dict:
    """End-to-end build into a length-delimited proto stream file (the
    reference's WriteableProtoStreamArchive output) + metadata entry."""
    from ..sinks.streams import write_proto_stream
    from .stats import archive_metadata

    profile = profile or flagship_profile()
    tiles = tiles_ds(sf_dir, zooms, profile, n_buckets, repl).materialize()
    meta = archive_metadata(tiles, profile, {"sf_dir": sf_dir})
    n = write_proto_stream(
        tiles, path,
        {"name": profile.name, "min_zoom": meta["minzoom"],
         "max_zoom": meta["maxzoom"]},
    )
    return {"n_tiles": n, "minzoom": meta["minzoom"], "maxzoom": meta["maxzoom"]}


def build_archive(sf_dir: str, out_dir: str, zooms=None, profile=None,
                  n_buckets: int = 1024, repl: int = 1, layout: str = "files"):
    """Full build into an archive (assemble+write fused per bucket, one
    shuffle, resumable per bucket); returns the per-bucket summary df.

    ``layout="files"`` = z/x/y.pbf tree (reference parity);
    ``layout="shard"`` = one parquet shard per bucket (cluster-scale layout,
    the bench headline).
    """
    from ..sinks.files import write_files_archive

    profile = profile or flagship_profile()
    lineage = {"sf_dir": sf_dir, "zooms": list(zooms) if zooms else "0-14",
               "repl": repl}
    return write_files_archive(
        tile_rows_ds(sf_dir, zooms, repl), out_dir, profile, lineage, n_buckets,
        layout
    ).to_pandas()

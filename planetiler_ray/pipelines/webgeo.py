"""The web-geo pipeline: pages -> extract -> geoparse -> spatial joins -> tiles.

Ray-Data-native restatement of the reference's 3 phases
(``ARCHITECTURE.md:5-11``: process inputs -> sort by tile -> emit tiles):

    read_parquet(documents)                  # the raw store scan
      -> map_batches(synthesize_pages)       # CC-style pages (input_hint shape)
      -> map_batches(extract_stage)          # frozen html->text extractor
      -> map_batches(geoparse_stage)         # profile flat-map: page -> points
      -> map_batches(PIPJoiner, concurrency) # admin polygon join (broadcast)
      -> map_batches(KNNJoiner, concurrency) # POI enrichment (broadcast)
      -> map_batches(slice_points)           # zoom expansion + buffer dup
      -> groupby(tile_id).map_groups(...)    # THE tile-keyed shuffle + assembly

Every stage is a vectorized Arrow transform; the only all-to-all exchange is
the final tile groupby (mirroring the reference's single external merge sort).
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..sources.pages import extract_stage, synthesize_pages
from ..sources.world import load_admin_polygons, load_pois
from ..stages.geoparse import geoparse_stage
from ..stages.joins import KNNJoiner, PIPJoiner
from ..stages.tiling import assign_cells, assign_tiles, slice_points

DEFAULT_ZOOMS = (2, 6, 10, 14)


def pages_ds(sf_dir: str, repl: int = 1, parallelism: int = 64) -> ray.data.Dataset:
    """The block count set here carries through every downstream stage
    INCLUDING the sort-based groupby shuffle's output partitions, so it sets
    the parallelism of the tile-assembly stage.  64 is the measured sweet
    spot on 8-32 cpus: more blocks shrink the per-task command cache and add
    shuffle-object overhead (128 blocks: +11% wall at 32 cpus); a real
    multi-node cluster should set ~2x total cores."""
    from ..sources.pages import documents_path, replicate_documents

    path = documents_path(sf_dir)
    ds = ray.data.read_parquet(path, columns=["doc_id", "text", "lang"])
    if path.endswith(".parquet"):
        # single-file layout: ONE read block; without an explicit split the
        # whole synthesize/extract/parse chain would run on one task.
        # Repartition the (tiny) rows so the expensive derived work fans
        # out.  The sharded ``documents/`` layout skips this — read
        # parallelism comes from the files themselves, as on a real corpus.
        ds = ds.repartition(parallelism)
    if repl > 1:
        ds = ds.map_batches(replicate_documents, batch_format="pyarrow",
                            fn_kwargs={"repl": repl})
    return ds.map_batches(synthesize_pages, batch_format="pyarrow")


def extracted_pages_ds(sf_dir: str, repl: int = 1) -> ray.data.Dataset:
    return pages_ds(sf_dir, repl).map_batches(extract_stage, batch_format="pyarrow")


def mentions_ds(sf_dir: str, repl: int = 1) -> ray.data.Dataset:
    """Point-feature rows parsed from the EXTRACTED text (so the whole
    html->text->parse path is under oracle test)."""
    return extracted_pages_ds(sf_dir, repl).map_batches(
        geoparse_stage, batch_format="pyarrow"
    )


# ------------------------------------------------------------ query bodies --

def q_pages_meta(sf_dir: str) -> ray.data.Dataset:
    """(url, warc_ts, lang, text_md5) — md5 over the EXTRACTED text, which the
    oracle reconstructs independently: this IS the per-row byte-identity
    invariant check."""

    def meta(batch: pa.Table) -> pa.Table:
        from ..functions.vmd5 import md5_hex_arrow

        col = batch.column("extracted")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "text_md5": md5_hex_arrow(col),
            }
        )

    return extracted_pages_ds(sf_dir).map_batches(meta, batch_format="pyarrow")


def q_geoparse(sf_dir: str) -> ray.data.Dataset:
    return mentions_ds(sf_dir).select_columns(
        ["doc_id", "mention_idx", "lat_mdeg", "lon_mdeg"]
    )


def q_tile_counts(sf_dir: str, zooms=DEFAULT_ZOOMS) -> ray.data.Dataset:
    """Tiles-per-(z,x,y) histogram. Scale pattern: per-batch partial counts
    inside map_batches, then a small groupby-sum (combiner before shuffle)."""
    from ray.data.aggregate import Sum

    def expand_and_count(batch: pa.Table) -> pa.Table:
        t = assign_tiles(batch, zooms=list(zooms))
        df = (
            t.select(["z", "tile_x", "tile_y"])
            .to_pandas()
            .groupby(["z", "tile_x", "tile_y"], as_index=False)
            .size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..stages.bucketagg import bucketed_sum

    partial = mentions_ds(sf_dir).map_batches(expand_and_count, batch_format="pyarrow")
    return bucketed_sum(partial, ["z", "tile_x", "tile_y"], [("n_part", "n")])


def q_tile_counts_buffered(sf_dir: str, zooms=(2, 6, 10)) -> ray.data.Dataset:
    """Tiles-per-(z,x,y) INCLUDING buffer duplication — counts the actual
    render-path expansion (``stages/tiling.slice_points`` ->
    ``geo/clip.point_tiles_vec``: each point lands in its tile plus any of
    the 8 neighbors whose buffered box contains it, with antimeridian x
    wrap).  Oracle-exact: the SQL twin mirrors the 9-neighbor box test on
    identical float expressions."""
    from ray.data.aggregate import Sum

    from ..stages.tiling import slice_points

    def expand_and_count(batch: pa.Table) -> pa.Table:
        t = slice_points(batch, zooms=list(zooms))
        df = (
            t.select(["z", "tile_x", "tile_y"])
            .to_pandas()
            .groupby(["z", "tile_x", "tile_y"], as_index=False)
            .size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    from ..stages.bucketagg import bucketed_sum

    partial = mentions_ds(sf_dir).map_batches(expand_and_count, batch_format="pyarrow")
    return bucketed_sum(partial, ["z", "tile_x", "tile_y"], [("n_part", "n")])


def q_raster_regions(sf_dir: str, z: int = 6, threshold: int = 2) -> ray.data.Dataset:
    """Raster->vector round trip: rasterize all geoparsed mentions onto the
    zoom-6 web-mercator grid, threshold to an occupied-cell binary raster,
    label 4-connected regions with the distributed min-label propagation
    (``stages.tiling.raster_regions``), and emit one vector feature per
    region (cell count, point mass, integer bbox).  Exact oracle: the SQL
    twin rebuilds the raster with ``sql_tile_expr`` and closes the regions
    with a recursive transitive-closure CTE — min-label-per-cell agrees with
    the engine's propagation by definition of connectedness."""
    from ..stages.tiling import raster_regions

    return raster_regions(mentions_ds(sf_dir), z=z, threshold=threshold)


def q_dbscan_census(sf_dir: str, z: int = 6, minpts: int = 3) -> ray.data.Dataset:
    """Grid DBSCAN over the geoparsed mentions: zoom-``z`` cells are CORE
    when their 3x3 neighborhood holds >= ``minpts`` points, clusters are
    4-connected core components, adjacent occupied cells are BORDER,
    the rest NOISE (``stages.tiling.dbscan_census``).  Exact oracle: the
    SQL twin rebuilds the raster, takes the 3x3 density via a bounded
    self-join, closes clusters with the same recursive transitive-closure
    CTE as ``raster_regions``, and mirrors the min-label border
    assignment."""
    from ..stages.tiling import dbscan_census

    return dbscan_census(mentions_ds(sf_dir), z=z, minpts=minpts)


def q_admin_top_terms(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Geo x text fusion: the top-k corpus tokens per admin region, where a
    document belongs to the region containing its FIRST mention — the
    "what people write about, by where they write about it" analytic that
    joins both halves of this engine.

    Plan: PIP-enrich mention 0 of every doc (broadcast polygons), native
    hash join docs->admin on the dense doc_id key, per-batch (admin,
    token) count partials -> ONE groupby-sum over admin x vocab -> per-
    block partial top-k per admin -> tiny single-block finish.  row_number
    twin."""
    from ray.data.aggregate import Sum

    from ..stages.dedup import _flat_tokens

    handle = ray.put(load_admin_polygons(sf_dir))
    doc_admin = (
        mentions_ds(sf_dir)
        .filter(expr="mention_idx == 0")
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .map_batches(
            lambda b: pa.table({"doc_id": b.column("doc_id"),
                                "admin_id": b.column("admin_id")}),
            batch_format="pyarrow",
        )
    )
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    from .training import join_args

    import pyarrow.parquet as _pq

    joined = docs.join(
        doc_admin, join_type="inner",
        **join_args(size_hint_rows=_pq.read_metadata(
            f"{sf_dir}/documents.parquet").num_rows),
        on=("doc_id",))

    def token_partial(batch: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(batch.column("text").to_pandas())
        admin = np.repeat(batch.column("admin_id").to_numpy(),
                          np.asarray(lens, np.int64))
        t = pa.table({"admin_id": pa.array(admin, pa.int64()), "token": flat})
        g = t.group_by(["admin_id", "token"]).aggregate([("token", "count")])
        return pa.table({
            "admin_id": g.column("admin_id"),
            "token": g.column("token"),
            "n_part": g.column("token_count"),
        })

    counts = (
        joined.map_batches(token_partial, batch_format="pyarrow")
        .groupby(["admin_id", "token"])
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def partial_topk(batch: pa.Table, emit_rank: bool = False) -> pa.Table:
        admin = batch.column("admin_id").to_numpy()
        tok = np.asarray(batch.column("token").to_pandas(), dtype=object)
        n = batch.column("n").to_numpy()
        order = np.lexsort((tok, -n, admin))
        a, t, c = admin[order], tok[order], n[order]
        first = np.ones(len(a), bool)
        first[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(first)
        lens = np.diff(np.append(starts, len(a)))
        pos = np.arange(len(a)) - np.repeat(starts, lens)
        keep = pos < k
        cols = {
            "admin_id": pa.array(a[keep], pa.int64()),
            "token": pa.array(t[keep].tolist(), pa.string()),
            "n": pa.array(c[keep], pa.int64()),
        }
        if emit_rank:
            cols["rk"] = pa.array((pos[keep] + 1).astype(np.int64), pa.int64())
        return pa.table(cols)

    return (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(lambda b: partial_topk(b, emit_rank=True),
                     batch_format="pyarrow")
    )


def q_tile_skew(sf_dir: str, z: int = 10,
                ks=(1, 10, 100, 1000)) -> ray.data.Dataset:
    """Spatial skew audit: what share (basis points) of all mentions the
    top-k hottest zoom-``z`` tiles hold — the number that decides whether
    the tile shuffle needs hot-key salting.  Same sentinel-fused design as
    the vocab coverage curve: per-batch cell partials + a '' total row ->
    ONE bounded groupby-sum -> partial top-max(k) -> tiny finish.
    Output: (k, top_n, total, share_bp)."""
    from ray.data.aggregate import Sum

    from ..geo import mercator

    n_side = 1 << z
    kmax = max(ks)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table({
            "cell": pa.array(np.concatenate([u, [-1]]), pa.int64()),
            "n_part": pa.array(np.concatenate([c, [len(lat)]]), pa.int64()),
        })

    counts = (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    def partial_topk(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        n = batch.column("n").to_numpy()
        sent = cell == -1
        real = np.flatnonzero(~sent)
        if len(real) > kmax:
            nr = n[real]
            thresh = np.partition(nr, len(nr) - kmax)[len(nr) - kmax]
            cand = real[nr >= thresh]
            order = cand[np.lexsort((cell[cand], -n[cand]))][:kmax]
            keep = np.concatenate([np.flatnonzero(sent), order])
            return batch.take(pa.array(keep, pa.int64()))
        return batch

    def finish(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        n = batch.column("n").to_numpy()
        total = int(n[cell == -1].sum())
        nr, cr = n[cell != -1], cell[cell != -1]
        order = np.lexsort((cr, -nr))
        cum = np.cumsum(nr[order])
        out_k, out_top = [], []
        for k in ks:
            out_k.append(k)
            out_top.append(int(cum[min(k, len(cum)) - 1]) if len(cum) else 0)
        top = np.array(out_top, np.int64)
        return pa.table({
            "k": pa.array(out_k, pa.int64()),
            "top_n": pa.array(top, pa.int64()),
            "total": pa.array([total] * len(out_k), pa.int64()),
            "share_bp": pa.array(top * 10000 // max(total, 1), pa.int64()),
        })

    return (
        counts.map_batches(partial_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


def q_st_cube(sf_dir: str, z: int = 5) -> ray.data.Dataset:
    """Spatiotemporal cube: mention counts per (zoom-z tile, crawl-minute)
    — the space x time rollup behind activity heatmaps.  Crawl time is the
    deterministic warc_ts (2024-01-01 + doc_id seconds), so the minute key
    is doc_id // 60 on both sides.  Per-batch partial counts -> ONE
    bounded groupby-sum (state <= occupied (tile, minute) cells)."""
    from ray.data.aggregate import Sum

    from ..geo import mercator

    n_side = 1 << z

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        tmin = batch.column("doc_id").to_numpy() // 60
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        key = (y * n_side + x) * 1_000_000 + tmin
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "tile_x": pa.array((u // 1_000_000) % n_side, pa.int64()),
            "tile_y": pa.array((u // 1_000_000) // n_side, pa.int64()),
            "t_min": pa.array(u % 1_000_000, pa.int64()),
            "n_part": pa.array(c, pa.int64()),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["tile_x", "tile_y", "t_min"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def q_quadkey_counts(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """Mention counts per Bing-style QUADKEY (base-4 digit string of the
    Morton-interleaved tile address) — the third tile-address family next
    to (z,x,y) and hex/S2 cells; quadkeys sort hierarchically, so prefix
    scans give pyramid rollups for free.  Per-batch partial counts -> ONE
    bounded groupby-sum (<= 4**z cells) -> tiny stringify pass.  Exact
    oracle: unrolled digit concat over the same tile exprs."""
    from ray.data.aggregate import Sum

    from ..geo import mercator

    n_side = 1 << z

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def stringify(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        x = cell % n_side
        y = cell // n_side
        # decimal-digit trick: digit_k in {0..3} becomes one base-10 digit,
        # zero-padded to z chars — vectorized, no per-row loop
        val = np.zeros(len(cell), np.int64)
        for k in range(z - 1, -1, -1):
            d = ((y >> k) & 1) * 2 + ((x >> k) & 1)
            val = val * 10 + d
        qk = np.char.zfill(val.astype(str), z)
        return pa.table({
            "quadkey": pa.array(qk.tolist(), pa.string()),
            "n": batch.column("n"),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(stringify, batch_format="pyarrow")
    )


def q_tile_pyramid(sf_dir: str, z_max: int = 12) -> ray.data.Dataset:
    """Tile-pyramid rollup: mention counts at z_max aggregated up to EVERY
    ancestor zoom 0..z_max in ONE read pass — the reference computes its
    tilestats / minzoom decisions this way (aggregate children into
    parents, ``TileCoord.java`` parent arithmetic) instead of re-scanning
    the input once per zoom like ``tile_counts`` must for its independent
    per-zoom render.  At 100 TB this is the only viable shape: one scan,
    per-batch partials at the finest level, then a tiny arithmetic explode
    (x15) over the ALREADY-AGGREGATED cell set, never over raw rows.

    Output (one row per zoom): z, n_tiles (populated), n_mentions (must be
    constant across zooms — a built-in conservation check), n_max (hottest
    tile), x_sum/y_sum (populated-tile address checksums) and wsum
    (count-weighted address checksum — pins every per-tile count).
    Exact oracle: same tile exprs + generate_series ancestor shifts."""
    from ray.data.aggregate import Count, Max, Sum

    from ..geo import mercator

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z_max)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z_max)
        u, c = np.unique((y << z_max) | x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    shifts = np.arange(z_max, -1, -1)  # z = 0 .. z_max

    def ancestors(batch: pa.Table) -> pa.Table:
        # runs over the aggregated z_max cell set (small), not raw rows
        cell = batch.column("cell").to_numpy()
        n = batch.column("n").to_numpy()
        x = cell & ((1 << z_max) - 1)
        y = cell >> z_max
        ax = (x[:, None] >> shifts[None, :]).ravel()
        ay = (y[:, None] >> shifts[None, :]).ravel()
        az = np.broadcast_to(z_max - shifts, (len(cell), z_max + 1)).ravel()
        # composite key: 4 bits zoom | 14 bits y | 14 bits x  (z_max <= 14)
        key = (az.astype(np.int64) << 28) | (ay << 14) | ax
        an = np.broadcast_to(n[:, None], (len(n), z_max + 1)).ravel()
        u, inv = np.unique(key, return_inverse=True)
        return pa.table(
            {
                "key": pa.array(u, pa.int64()),
                "n_part": pa.array(
                    np.bincount(inv, an).astype(np.int64), pa.int64()
                ),
            }
        )

    def summarize(batch: pa.Table) -> pa.Table:
        key = batch.column("key").to_numpy()
        n = batch.column("n").to_numpy()
        return pa.table(
            {
                "z": pa.array(key >> 28, pa.int64()),
                "x": pa.array(key & ((1 << 14) - 1), pa.int64()),
                "y": pa.array((key >> 14) & ((1 << 14) - 1), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "w": pa.array(n * (key & ((1 << 28) - 1)), pa.int64()),
            }
        )

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(ancestors, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(summarize, batch_format="pyarrow")
        .groupby("z")
        .aggregate(
            Count(alias_name="n_tiles"),
            Sum("n", alias_name="n_mentions"),
            Max("n", alias_name="n_max"),
            Sum("x", alias_name="x_sum"),
            Sum("y", alias_name="y_sum"),
            Sum("w", alias_name="wsum"),
        )
    )


# deterministic query windows for q_morton_cover, integer millidegrees
# (inclusive bounds); the first sits on the hot Paris-ish cluster, the
# rest exercise wide/narrow/edge shapes of the covering.
MORTON_BBOXES_MDEG: list[tuple[int, int, int, int]] = [
    (48000, 50000, 1000, 4000),  # lat_lo, lat_hi, lon_lo, lon_hi
    (-10000, 10000, -30000, 30000),
    (40000, 70000, 100000, 160000),
    (-60000, -45000, -120000, -60000),
    (0, 30000, 150000, 179999),
]


def morton_cover_plan(z: int = 9) -> list[dict]:
    """Driver-side covering plan for MORTON_BBOXES_MDEG: each query box is
    turned into a short list of inclusive Morton-code ranges at level
    ``z`` (geo/morton.cover_ranges quadtree descent).  Pure arithmetic
    over a handful of boxes — the broadcast side of the scan."""
    from ..geo import mercator, morton

    plans = []
    for i, (lat_lo, lat_hi, lon_lo, lon_hi) in enumerate(MORTON_BBOXES_MDEG):
        x_lo = int(mercator.world_to_tile(
            mercator.lon_to_world_x(np.float64(lon_lo / 1000.0)), z))
        x_hi = int(mercator.world_to_tile(
            mercator.lon_to_world_x(np.float64(lon_hi / 1000.0)), z))
        # mercator y grows downward: hi lat -> low tile y
        y_lo = int(mercator.world_to_tile(
            mercator.lat_to_world_y(np.float64(lat_hi / 1000.0)), z))
        y_hi = int(mercator.world_to_tile(
            mercator.lat_to_world_y(np.float64(lat_lo / 1000.0)), z))
        ranges = morton.cover_ranges(x_lo, x_hi, y_lo, y_hi, z)
        plans.append(
            {
                "bbox_id": i,
                "bounds_mdeg": (lat_lo, lat_hi, lon_lo, lon_hi),
                "ranges": ranges,
            }
        )
    return plans


def q_morton_cover(sf_dir: str, z: int = 9) -> ray.data.Dataset:
    """Window (bbox) queries served by Morton-range index pushdown — the
    pattern that makes a 2-D window query cheap on 100 TB: the driver
    covers each box with a few contiguous Z-order code ranges
    (geo/morton.cover_ranges), workers compute each mention's interleaved
    code once per batch and answer EVERY box with vectorized searchsorted
    range probes (index scan) plus an integer-mdeg containment test
    (refine).  n_candidates >= n_exact per box measures covering
    tightness; a sorted-by-morton store would only read the candidate
    ranges.  Exact oracle: unrolled bit-interleave of the same tile exprs
    + the SAME literal ranges (the covering is deterministic driver-side
    arithmetic, pinned separately by unit tests)."""
    from ray.data.aggregate import Sum

    from ..geo import mercator, morton

    plans = morton_cover_plan(z)
    # flatten ranges for vectorized probing: starts sorted per box
    lo_all = [np.array([r[0] for r in p["ranges"]], np.int64) for p in plans]
    hi_all = [np.array([r[1] for r in p["ranges"]], np.int64) for p in plans]
    bounds = np.array([p["bounds_mdeg"] for p in plans], np.int64)
    n_ranges = np.array([len(p["ranges"]) for p in plans], np.int64)

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        lat_mdeg = batch.column("lat_mdeg").to_numpy()
        lon_mdeg = batch.column("lon_mdeg").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        code = morton.xy_to_morton(x, y)
        cand = np.zeros(len(bounds), np.int64)
        exact = np.zeros(len(bounds), np.int64)
        for i in range(len(bounds)):
            # index scan: in-any-range via searchsorted on range starts
            pos = np.searchsorted(lo_all[i], code, side="right") - 1
            in_rng = (pos >= 0) & (code <= hi_all[i][np.maximum(pos, 0)])
            cand[i] = int(np.count_nonzero(in_rng))
            la_lo, la_hi, lo_lo, lo_hi = bounds[i]
            exact[i] = int(
                np.count_nonzero(
                    (lat_mdeg >= la_lo) & (lat_mdeg <= la_hi)
                    & (lon_mdeg >= lo_lo) & (lon_mdeg <= lo_hi)
                )
            )
        return pa.table(
            {
                "bbox_id": pa.array(np.arange(len(bounds)), pa.int64()),
                "cand_part": pa.array(cand, pa.int64()),
                "exact_part": pa.array(exact, pa.int64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        bid = batch.column("bbox_id").to_numpy()
        return pa.table(
            {
                "bbox_id": batch.column("bbox_id"),
                "n_ranges": pa.array(n_ranges[bid], pa.int64()),
                "n_candidates": batch.column("n_candidates"),
                "n_exact": batch.column("n_exact"),
            }
        )

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bbox_id")
        .aggregate(
            Sum("cand_part", alias_name="n_candidates"),
            Sum("exact_part", alias_name="n_exact"),
        )
        .map_batches(finish, batch_format="pyarrow")
    )


def q_url_lcp(sf_dir: str, prefix_len: int = 18, cap: int = 64):
    """Histogram of longest-common-prefix lengths between GLOBALLY
    sort-adjacent urls — the sorted-neighbor structure crawl dedup uses
    to spot near-identical url families — computed WITHOUT a global sort
    shuffle.  The trick: bucketing by a fixed url prefix preserves sorted
    contiguity (equal prefixes sort together), so (a) in-bucket adjacent
    pairs come from a bounded per-group lexsort, and (b) the only missing
    pairs are the <=n_buckets cross-boundary ones, reconstructed exactly
    from the per-bucket (min_url, max_url) aggregate — a tiny driver-side
    merge over ~1000 rows, never over data.  LCPs are computed on a
    zero-copy uint8 matrix view (cap x n), one cumprod — no Python row
    loop.  Exact oracle: lag(url) OVER (ORDER BY url) with an unrolled
    64-term prefix-indicator sum."""
    from ray.data.aggregate import Max, Min, Sum

    import pyarrow.compute as pc

    from ..sources.pages import urls_from_ids

    def to_urls(batch: pa.Table) -> pa.Table:
        url = urls_from_ids(batch.column("doc_id").to_numpy())
        return pa.table(
            {"bucket": pc.utf8_slice_codeunits(url, 0, prefix_len), "url": url}
        )

    def lcp_of_pairs(a: np.ndarray) -> np.ndarray:
        # a: sorted S<cap> byte array; returns LCP of consecutive rows
        m = a.view(np.uint8).reshape(len(a), cap)
        eq = m[1:] == m[:-1]
        return np.cumprod(eq, axis=1, dtype=np.uint8).sum(axis=1).astype(np.int64)

    def group_hist(g: pa.Table) -> pa.Table:
        urls = np.asarray(g.column("url").to_pandas(), dtype=f"S{cap}")
        urls.sort(kind="stable")
        if len(urls) < 2:
            return pa.table(
                {"lcp": pa.array([], pa.int64()), "n_part": pa.array([], pa.int64())}
            )
        lcp = lcp_of_pairs(urls)
        h = np.bincount(lcp, minlength=cap + 1)
        nz = np.flatnonzero(h)
        return pa.table(
            {
                "lcp": pa.array(nz.astype(np.int64), pa.int64()),
                "n_part": pa.array(h[nz].astype(np.int64), pa.int64()),
            }
        )

    urls = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(to_urls, batch_format="pyarrow")
    # distributed leg: per-bucket adjacent pairs (ONE bounded shuffle)
    hist = (
        urls.groupby("bucket")
        .map_groups(group_hist, batch_format="pyarrow")
        .groupby("lcp")
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()
    )
    if hist.empty:  # every bucket a singleton (tiny inputs): boundary leg only
        hist = pd.DataFrame(
            {"lcp": pd.Series([], dtype=np.int64), "n": pd.Series([], dtype=np.int64)}
        )
    # boundary leg: per-bucket extrema (same key, tiny result ~997 rows)
    bnd = (
        urls.groupby("bucket")
        .aggregate(Min("url", alias_name="lo"), Max("url", alias_name="hi"))
        .to_pandas()
        .sort_values("bucket", ignore_index=True)
    )
    if len(bnd) > 1:
        prev_hi = np.asarray(bnd["hi"][:-1], dtype=f"S{cap}")
        next_lo = np.asarray(bnd["lo"][1:], dtype=f"S{cap}")
        inter = np.empty(2 * len(prev_hi), dtype=f"S{cap}")
        inter[0::2], inter[1::2] = prev_hi, next_lo
        blcp = lcp_of_pairs(inter)[0::2]  # only (hi_i, lo_i+1) pairs
        extra = pd.Series(np.bincount(blcp, minlength=cap + 1))
        hist = (
            hist.set_index("lcp")["n"]
            .add(extra[extra > 0], fill_value=0)
            .astype(np.int64)
            .rename("n")
            .reset_index()
            .rename(columns={"index": "lcp"})
        )
    hist["lcp"] = hist["lcp"].astype(np.int64)
    return hist.sort_values("lcp", ignore_index=True)


def q_geohash_counts(sf_dir: str, precision: int = 3) -> ray.data.Dataset:
    """Mention counts per GEOHASH cell (base-32 bit-interleaved lat/lon,
    the fourth tile-address family next to quadkey / z,x,y / hex cells;
    geohashes sort hierarchically so prefix scans give spatial rollups).
    Kernel in ``geo/geohash.py``.  Per-batch partial counts on the integer
    hash -> ONE bounded groupby-sum (<= 32**precision cells) -> tiny
    vectorized base-32 stringify.  Exact oracle: unrolled bit arithmetic
    + substr alphabet lookup over the same double-precision exprs."""
    from ray.data.aggregate import Sum

    from ..geo import geohash as GH

    def partial(batch: pa.Table) -> pa.Table:
        g = GH.geohash_bits(
            batch.column("lat").to_numpy(),
            batch.column("lon").to_numpy(),
            precision,
        )
        u, c = np.unique(g, return_counts=True)
        return pa.table(
            {"g": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def stringify(batch: pa.Table) -> pa.Table:
        s = GH.geohash_str(batch.column("g").to_numpy(), precision)
        return pa.table({
            "geohash": pa.array(s.tolist(), pa.string()),
            "n": batch.column("n"),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(stringify, batch_format="pyarrow")
    )


def q_contour_census(sf_dir: str, z: int = 7, thresh: int = 2) -> ray.data.Dataset:
    """Marching-squares contouring census: threshold the zoom-``z`` mention
    density raster at ``thresh`` and classify every 2x2 cell block into its
    marching-squares case (1..15; empty blocks never materialize).  This is
    the raster->vector isoline op (``geo/contour.py`` emits the actual
    segment geometry; this query is its exact-oracle projection).

    Distribution: occupied cells each scatter ONE corner bit to the 4
    blocks they touch (flat 4x emit, vectorized) -> bounded groupby-sum
    ORs the bits -> 15-row case histogram with the standard per-case
    segment-count lookup.  No stencil gather, no dense raster."""
    from ray.data.aggregate import Sum

    from ..geo import mercator
    from ..geo.contour import CASE_SEGMENTS, corner_scatter

    n_side = 1 << z

    def cell_partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def scatter(batch: pa.Table) -> pa.Table:
        keep = batch.column("n").to_numpy() >= thresh
        cell = batch.column("cell").to_numpy()[keep]
        block, bit = corner_scatter(cell % n_side, cell // n_side, n_side)
        return pa.table(
            {"block": pa.array(block, pa.int64()), "bit": pa.array(bit, pa.int64())}
        )

    def census(batch: pa.Table) -> pa.Table:
        cs = batch.column("cs").to_numpy()
        u, c = np.unique(cs, return_counts=True)
        return pa.table(
            {"case_id": pa.array(u, pa.int64()), "nb_part": pa.array(c, pa.int64())}
        )

    def segify(batch: pa.Table) -> pa.Table:
        case_id = batch.column("case_id").to_numpy()
        nb = batch.column("n_blocks").to_numpy()
        return pa.table({
            "case_id": batch.column("case_id"),
            "n_blocks": batch.column("n_blocks"),
            "n_segments": pa.array(nb * CASE_SEGMENTS[case_id], pa.int64()),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(scatter, batch_format="pyarrow")
        .groupby("block")
        .aggregate(Sum("bit", alias_name="cs"))
        .map_batches(census, batch_format="pyarrow")
        .groupby("case_id")
        .aggregate(Sum("nb_part", alias_name="n_blocks"))
        .map_batches(segify, batch_format="pyarrow")
    )


def q_spatial_autocorr(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """Moran-style spatial autocorrelation census over the zoom-``z``
    mention-density raster: the covariance numerator over rook-adjacent
    occupied cell pairs, kept EXACT in integers by scaling out the mean —
    sum over pairs of (N*n_a - T)(N*n_b - T) where N = occupied cells and
    T = total mass (expanding: N^2*sum(ab) - N*T*sum(a+b) + T^2*P, so the
    whole statistic reduces to five associative integer aggregates; no
    float mean ever materializes).

    Distribution: bounded cell groupby -> each cell emits itself under its
    own pair key and under its left/up neighbor's key (vectorized scatter,
    no self-join) -> groupby-sum pairs them -> per-batch partial products
    -> scalar aggregates.  Magnitude note: int64-exact while
    N * max_cell_count < 2^31 (holds for any per-shard raster; shard the
    statistic per region at planetary mass).

    Output (1 row): n_cells, total, n_pairs, sum_ab, sum_apb, moran_num.
    """
    from ray.data.aggregate import Count, Sum

    from ..geo import mercator

    n_side = 1 << z

    def cell_partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        x = mercator.world_to_tile(mercator.lon_to_world_x(lon), z)
        y = mercator.world_to_tile(mercator.lat_to_world_y(lat), z)
        u, c = np.unique(y * n_side + x, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    cells = (
        mentions_ds(sf_dir)
        .map_batches(cell_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n_part", alias_name="n"))
    )

    V_OFF = n_side * n_side  # key space offset for vertical pairs

    def scatter(batch: pa.Table) -> pa.Table:
        cell = batch.column("cell").to_numpy()
        n = batch.column("n").to_numpy()
        x, y = cell % n_side, cell // n_side
        # horizontal pair key = LEFT cell id; vertical = UP cell id + V_OFF.
        # "a" = the anchor cell, "b" = its right/down neighbor; edge cells
        # (x=0 / y=0) emit a b-row under a key no cell anchors — it pairs
        # with nothing and is filtered by the a>0 & b>0 gate.
        keys = np.concatenate([cell, cell - 1, cell + V_OFF, cell - n_side + V_OFF])
        a = np.concatenate([n, np.zeros(len(n), np.int64)] * 2)
        b = np.concatenate([np.zeros(len(n), np.int64), n] * 2)
        keep = np.concatenate(
            [np.ones(len(n), bool), x > 0, np.ones(len(n), bool), y > 0]
        )
        return pa.table({
            "pkey": pa.array(keys[keep], pa.int64()),
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
        })

    def pair_partial(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        hit = (a > 0) & (b > 0)
        a, b = a[hit], b[hit]
        return pa.table({
            "n_pairs_p": pa.array([len(a)], pa.int64()),
            "sum_ab_p": pa.array([int((a * b).sum())], pa.int64()),
            "sum_apb_p": pa.array([int((a + b).sum())], pa.int64()),
        })

    pair_agg = (
        cells.map_batches(scatter, batch_format="pyarrow")
        .groupby("pkey")
        .aggregate(Sum("a", alias_name="a"), Sum("b", alias_name="b"))
        .map_batches(pair_partial, batch_format="pyarrow")
        .aggregate(Sum("n_pairs_p"), Sum("sum_ab_p"), Sum("sum_apb_p"))
    )
    cell_agg = cells.aggregate(Count(alias_name="nc"), Sum("n", alias_name="tot"))

    N = int(cell_agg["nc"])
    T = int(cell_agg["tot"])
    P = int(pair_agg["sum(n_pairs_p)"] or 0)
    s_ab = int(pair_agg["sum(sum_ab_p)"] or 0)
    s_apb = int(pair_agg["sum(sum_apb_p)"] or 0)
    return pd.DataFrame({
        "n_cells": [N], "total": [T], "n_pairs": [P],
        "sum_ab": [s_ab], "sum_apb": [s_apb],
        "moran_num": [N * N * s_ab - N * T * s_apb + T * T * P],
    })


def q_zonal_stats(sf_dir: str, z: int = 8) -> ray.data.Dataset:
    """Raster zonal statistics: mention-density raster at zoom ``z`` reduced
    per admin zone (count of occupied cells, total point mass, hottest
    cell).  Exact oracle: the SQL twin rebuilds the raster with
    ``sql_tile_expr`` and box-joins cells to the nation grid in tile space
    with the same half-open edge rule."""
    from ..sources.world import admin_rect
    from ..stages.tiling import zonal_stats

    import pyarrow.parquet as pq

    keys = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    rects = []
    for k in keys.column("n_nationkey").to_numpy():
        lon0, lat0, lon1, lat1 = admin_rect(int(k))
        rects.append((int(k), lon0, lat0, lon1, lat1))
    return zonal_stats(mentions_ds(sf_dir), rects, z=z)


def q_raster_distance(sf_dir: str, z: int = 6, threshold: int = 2,
                      max_dist: int = 2) -> ray.data.Dataset:
    """Proximity-raster census: hop-distance histogram of the grid distance
    transform (``stages.tiling.raster_distance``) — how many cells sit at
    0/1/2 hops from the nearest occupied cell.  Exact oracle: unrolled BFS
    expansion in SQL over the same rebuilt raster."""
    from ray.data.aggregate import Count

    from ..stages.tiling import raster_distance

    return (
        raster_distance(mentions_ds(sf_dir), z=z, threshold=threshold,
                        max_dist=max_dist)
        .groupby("dist")
        .aggregate(Count(alias_name="n_cells"))
    )


def q_labelgrid_counts(sf_dir: str, zooms=(2, 4), grid: float = 64.0,
                       limit: int = 8) -> ray.data.Dataset:
    """Features kept per (z, tile) after EXACT label-grid top-k (per 64px
    cell, k=8, ordered by feature id) — the label-grid operator with a full
    SQL twin (cell keys from the same float32 pixel coords the flagship
    shuffles, rank mirrored with row_number)."""
    from ray.data.aggregate import Sum

    from ..stages.tiling import slice_points

    def rows(batch: pa.Table) -> pa.Table:
        t = slice_points(batch, zooms=list(zooms))
        px = t.column("px").to_numpy().astype(np.float32)
        py = t.column("py").to_numpy().astype(np.float32)
        cell = (
            np.floor_divide(px, np.float32(grid)).astype(np.int64) * 100003
            + np.floor_divide(py, np.float32(grid)).astype(np.int64)
        )
        fid = t.column("doc_id").to_numpy() * 8 + t.column("mention_idx").to_numpy()
        z = t.column("z").to_numpy()
        tx = t.column("tile_x").to_numpy()
        ty = t.column("tile_y").to_numpy()
        # bucket derived from the TILE key only, so a group call sees whole
        # tiles — thousands per call, not a map_groups per tiny tile group
        bkt = ((z * 1000003 + tx * 10007 + ty) * 2654435761 % (1 << 32)) % 64
        return pa.table(
            {
                "z": pa.array(z, pa.int64()),
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
                "cell": pa.array(cell, pa.int64()),
                "fid": pa.array(fid, pa.int64()),
                "bkt": pa.array(bkt.astype(np.int64), pa.int64()),
            }
        )

    def topk_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("z", "tile_x", "tile_y", "n")}
            )
        z = g.column("z").to_numpy()
        tx = g.column("tile_x").to_numpy()
        ty = g.column("tile_y").to_numpy()
        cell = g.column("cell").to_numpy()
        fid = g.column("fid").to_numpy()
        order = np.lexsort((fid, cell, ty, tx, z))
        z, tx, ty, cell, fid = z[order], tx[order], ty[order], cell[order], fid[order]
        # rank within (tile, cell) runs -> keep rank < limit
        new_cell = np.ones(len(z), dtype=bool)
        new_cell[1:] = (
            (z[1:] != z[:-1]) | (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
            | (cell[1:] != cell[:-1])
        )
        cstart = np.flatnonzero(new_cell)
        clens = np.diff(np.append(cstart, len(z)))
        rank = np.arange(len(z)) - np.repeat(cstart, clens)
        kept = (rank < limit).astype(np.int64)
        # count kept per tile via reduceat over tile runs
        new_tile = np.ones(len(z), dtype=bool)
        new_tile[1:] = (z[1:] != z[:-1]) | (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
        tstart = np.flatnonzero(new_tile)
        n = np.add.reduceat(kept, tstart)
        return pa.table(
            {
                "z": pa.array(z[tstart], pa.int64()),
                "tile_x": pa.array(tx[tstart], pa.int64()),
                "tile_y": pa.array(ty[tstart], pa.int64()),
                "n": pa.array(n, pa.int64()),
            }
        )

    return (
        mentions_ds(sf_dir)
        .map_batches(rows, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(topk_bucket, batch_format="pyarrow")
    )


def q_pip(sf_dir: str) -> ray.data.Dataset:
    handle = ray.put(load_admin_polygons(sf_dir))
    return (
        mentions_ds(sf_dir)
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .select_columns(["doc_id", "mention_idx", "admin_id"])
    )


def q_knn(sf_dir: str) -> ray.data.Dataset:
    handle = ray.put(load_pois(sf_dir))
    return (
        mentions_ds(sf_dir)
        .map_batches(
            KNNJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .select_columns(["doc_id", "mention_idx", "poi_id"])
    )


def q_co_mentions(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """Co-occurrence graph construction: for every document, the unordered
    pairs of admin regions it mentions together, counted across the corpus
    — the entity-graph edge-weight primitive (mirrors how a web-scale
    pipeline builds location co-occurrence graphs from geoparsed text).

    Scale shape: PIP enrich (broadcast polygons, actor pool) -> doc-hash
    BUCKET regroup (thousands of docs per group call, never
    groupby(doc_id)'s tiny groups) -> vectorized in-bucket pair emission
    (lexsort + offset-diagonal scan; per-doc fan-out bounded by the
    mention cap) -> partial pair counts -> ONE small groupby-sum.
    """
    from ray.data.aggregate import Sum

    handle = ray.put(load_admin_polygons(sf_dir))
    enriched = (
        mentions_ds(sf_dir)
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .map_batches(
            lambda b: pa.table({
                "doc_id": b.column("doc_id"),
                "admin_id": b.column("admin_id"),
                "bkt": pa.array(
                    b.column("doc_id").to_numpy() % n_buckets, pa.int64()),
            }),
            batch_format="pyarrow",
        )
    )

    def emit_pairs(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy()
        adm = g.column("admin_id").to_numpy()
        order = np.lexsort((adm, doc))
        doc, adm = doc[order], adm[order]
        # distinct (doc, admin) rows
        keep = np.ones(len(doc), bool)
        keep[1:] = (doc[1:] != doc[:-1]) | (adm[1:] != adm[:-1])
        doc, adm = doc[keep], adm[keep]
        pairs_a, pairs_b = [], []
        d = 1
        while True:
            if d >= len(doc):
                break
            same = doc[d:] == doc[:-d]
            if not same.any():
                break
            pairs_a.append(adm[:-d][same])
            pairs_b.append(adm[d:][same])
            d += 1
        if not pairs_a:
            return pa.table({
                "admin_a": pa.array([], pa.int64()),
                "admin_b": pa.array([], pa.int64()),
                "n_part": pa.array([], pa.int64()),
            })
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        key = a * 1024 + b
        u, c = np.unique(key, return_counts=True)
        return pa.table({
            "admin_a": pa.array(u // 1024, pa.int64()),
            "admin_b": pa.array(u % 1024, pa.int64()),
            "n_part": pa.array(c, pa.int64()),
        })

    return (
        enriched.groupby("bkt")
        .map_groups(lambda g: emit_pairs(g.drop_columns(["bkt"])),
                    batch_format="pyarrow")
        .groupby(["admin_a", "admin_b"])
        .aggregate(Sum("n_part", alias_name="n_docs"))
    )


# 12 integer direction vectors (~unit circle x1000) — trig-free, so the
# star-polygon vertices live on an exact micro-degree lattice that SQL
# rebuilds integer-for-integer.
_STAR_DIRS = [(1000, 0), (866, 500), (500, 866), (0, 1000), (-500, 866),
              (-866, 500), (-1000, 0), (-866, -500), (-500, -866),
              (0, -1000), (500, -866), (866, -500)]


def load_star_polygons(sf_dir: str):
    """[(star_id, [ring])] — one concave 12-vertex star per nation,
    centered in its admin box, alternating radii (all integer µdeg; ring
    closed).  Disjoint by construction (r_out < box half-height)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    out = []
    for k in t.column("n_nationkey").to_numpy():
        k = int(k)
        clon_u = (-144000 + (k % 5) * 72000) * 1000
        clat_u = (-68000 + (k // 5) * 34000) * 1000
        r_out, r_in = 14000 + k * 97, 5000 + k * 53
        pts = []
        for i, (dx, dy) in enumerate(_STAR_DIRS):
            r = r_out if i % 2 == 0 else r_in
            pts.append((clon_u + dx * r, clat_u + dy * r))
        pts.append(pts[0])
        ring = np.asarray(pts, dtype=np.float64) / 1e6
        out.append((k, [ring]))
    return out


def q_pip_complex(sf_dir: str) -> ray.data.Dataset:
    """Point-in-COMPLEX-polygon join: mentions against concave 12-vertex
    star polygons (non-rectangular — exercises the even-odd crossing test
    itself, not just bbox logic), counted per star.  Exact oracle: the SQL
    twin rebuilds the stars on the same integer µdeg lattice and mirrors
    ``geo.pip.points_in_ring``'s crossing inequality operand-for-operand
    (pure IEEE subtract/divide/multiply/compare — no libm)."""
    from ray.data.aggregate import Count

    handle = ray.put(load_star_polygons(sf_dir))
    return (
        mentions_ds(sf_dir)
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .map_batches(
            lambda b: pa.table({"star_id": b.column("admin_id")}),
            batch_format="pyarrow",
        )
        .groupby("star_id")
        .aggregate(Count(alias_name="n_points"))
    )


def q_rasterize_polygons(sf_dir: str) -> ray.data.Dataset:
    """Vector->raster burn (the inverse of ``raster_regions``): rasterize
    the star polygons onto the 1-degree lat/lon grid by cell-CENTER
    containment (centers at integer+0.5 degrees — pure IEEE crossing test,
    no libm), emitting per-polygon burned-cell counts.  The grid is
    generated as a Dataset (``ray.data.range`` -> arithmetic coords), the
    polygons are a broadcast PolygonIndex actor pool, the reduce is one
    bounded groupby.  Exact oracle: generate_series grid x the same
    crossing inequality."""
    from ray.data.aggregate import Count

    handle = ray.put(load_star_polygons(sf_dir))
    n_lon, n_lat = 360, 170  # lon -180..179, lat -85..84

    def to_centers(batch) -> pa.Table:
        i = batch["id"]
        lon = (i % n_lon).astype(np.float64) - 180.0 + 0.5
        lat = (i // n_lon).astype(np.float64) - 85.0 + 0.5
        return pa.table({"lon": pa.array(lon, pa.float64()),
                         "lat": pa.array(lat, pa.float64())})

    grid = ray.data.range(n_lon * n_lat, override_num_blocks=32).map_batches(
        to_centers, batch_format="numpy"
    )
    return (
        grid.map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .map_batches(
            lambda b: pa.table({"star_id": b.column("admin_id")}),
            batch_format="pyarrow",
        )
        .groupby("star_id")
        .aggregate(Count(alias_name="n_cells"))
    )


def q_radius_join(sf_dir: str, radius: float = 25.0) -> ray.data.Dataset:
    """Radius search (PointIndex ``count_within`` surface): POIs within
    ``radius`` degrees of each mention, counted — the proximity-enrichment
    companion of the kNN join.  POI table broadcast once per actor
    (ray.put), per-batch vectorized distance scan; zero-count mentions are
    kept (LEFT-join semantics).  Exact oracle: the distance test is pure
    IEEE arithmetic (subtract/multiply/compare — no libm), identical on
    both sides."""
    handle = ray.put(load_pois(sf_dir))
    return (
        mentions_ds(sf_dir)
        .map_batches(
            KNNJoiner,
            fn_constructor_args=(handle,),
            fn_constructor_kwargs={"within_radius": radius},
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .select_columns(["doc_id", "mention_idx", "poi_within"])
    )


def enriched_points_ds(sf_dir: str, repl: int = 1) -> ray.data.Dataset:
    """Mentions + admin + poi + s2/hex cells: the full feature table that
    feeds the tile shuffle.  ONE fused actor-pool stage (indexes built once
    per actor from the ray.put broadcast)."""
    from ..stages.joins import Enricher

    admin = ray.put(load_admin_polygons(sf_dir))
    pois = ray.put(load_pois(sf_dir))
    return mentions_ds(sf_dir, repl).map_batches(
        Enricher,
        fn_constructor_args=(admin, pois),
        batch_format="pyarrow",
        concurrency=(_pool_floor(), 24),
        num_cpus=0.5,
        # floor scales with the cluster so the autoscale ramp (which gates
        # the fused extract->geoparse->enrich chain) starts wide on big
        # sessions; fractional num_cpus + a small floor on small sessions
        # keeps non-pool stages schedulable (a fixed floor of whole CPUs
        # deadlocks a 4-cpu ray.init); ceiling above the largest CPU level
        # so the pool never caps cluster scaling
    )


def _pool_floor() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(2, min(12, cpus // 4))


def q_cell_counts(sf_dir: str) -> ray.data.Dataset:
    """Counts per coarse S2 cell (level 6) and hex cell (res 4) — the
    cell-index aggregation surface.  ORACLE-CHECKED: ``sql_cell_counts``
    mirrors the full S2 trig chain + unrolled Hilbert curve + hex axial
    rounding in generated SQL — changing any cell-id math here must change
    the oracle in lockstep.

    Scale pattern: partial counts per batch, groupby-sum over partials.
    """
    from ray.data.aggregate import Sum

    from ..geo import hexgrid, s2

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        s2c = s2.parent(batch.column("s2_cell").to_numpy(), 6)
        hxc = hexgrid.hex_parent(batch.column("hex_cell").to_numpy(), 4)
        df = (
            pd.DataFrame({"s2_l6": s2c, "hex_r4": hxc})
            .groupby(["s2_l6", "hex_r4"], as_index=False)
            .size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        enriched_points_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["s2_l6", "hex_r4"])
        .aggregate(Sum("n_part", alias_name="n"))
    )


def q_doc_geo_extent(sf_dir: str) -> ray.data.Dataset:
    """ST_Extent analogue per document: mention count + integer-mdeg bbox —
    the geoparse-QA aggregate (docs whose mentions span continents are
    suspect).  Per-batch partial min/max/count -> ONE groupby merge."""
    from ray.data.aggregate import Count, Max, Min

    return (
        mentions_ds(sf_dir)
        .groupby("doc_id")
        .aggregate(
            Count(alias_name="n_mentions"),
            Min("lat_mdeg", alias_name="lat_min"),
            Max("lat_mdeg", alias_name="lat_max"),
            Min("lon_mdeg", alias_name="lon_min"),
            Max("lon_mdeg", alias_name="lon_max"),
        )
    )


def q_box_join(sf_dir: str, span_cap: int = 20000) -> ray.data.Dataset:
    """Rectangle-overlap spatial self-join: pairs of documents whose
    compact (span <= ``span_cap`` mdeg per axis) mention bboxes intersect
    — the 2-D box join next to the 1-D ``range_join``/``interval_join``.
    Grid-pitch-equals-cap scatter + report-at-intersection-min-corner
    dedup (``stages/joins.box_overlap_pairs``); exact oracle: filtered
    self-join with the overlap predicate."""
    from ..stages.joins import box_overlap_pairs

    return box_overlap_pairs(q_doc_geo_extent(sf_dir), span_cap=span_cap)


def q_admin_centroid(sf_dir: str) -> ray.data.Dataset:
    """ST_Centroid numerators per admin region: exact integer-mdeg
    coordinate sums + count (the centroid itself is a consumer division) —
    the weighted-center aggregate over the PIP join."""
    from ray.data.aggregate import Count, Sum

    handle = ray.put(load_admin_polygons(sf_dir))
    return (
        mentions_ds(sf_dir)
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle,),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .filter(expr="admin_id >= 0")
        .groupby("admin_id")
        .aggregate(
            Count(alias_name="n_points"),
            Sum("lat_mdeg", alias_name="lat_sum"),
            Sum("lon_mdeg", alias_name="lon_sum"),
        )
    )


def q_hex_smooth(sf_dir: str, res: int = 7) -> ray.data.Dataset:
    """Hex k-ring smoothing (H3 kRing surface): per-hex mention counts at
    resolution ``res`` convolved over ring-1 (each cell's smoothed value =
    sum of its own + 6 neighbors' counts) — the hotspot-smoothing /
    choropleth-prep primitive.  Scale pattern: per-batch partial counts ->
    ONE groupby-sum over occupied hexes -> arithmetic 7-way ring expansion
    (no neighbor table, no join) -> second bounded groupby-sum.  ORACLE:
    the SQL twin mirrors the axial rounding chain and expands the same 7
    direction vectors."""
    from ray.data.aggregate import Sum

    from ..geo import hexgrid, mercator

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        wx = mercator.lon_to_world_x(lon)
        wy = mercator.lat_to_world_y(lat)
        cid = hexgrid.hex_cell(wx, wy, res)
        u, c = np.unique(cid, return_counts=True)
        return pa.table(
            {"hex_id": pa.array(u, pa.int64()), "n_part": pa.array(c, pa.int64())}
        )

    def expand_ring(batch: pa.Table) -> pa.Table:
        cid = batch.column("hex_id").to_numpy()
        n = batch.column("n").to_numpy()
        ring = hexgrid.hex_ring1(cid)  # (N, 6)
        ids = np.concatenate([cid, ring.ravel()])
        vals = np.concatenate([n, np.repeat(n, 6)])
        return pa.table(
            {"hex_id": pa.array(ids, pa.int64()),
             "n_sm": pa.array(vals, pa.int64())}
        )

    return (
        mentions_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hex_id")
        .aggregate(Sum("n_part", alias_name="n"))
        .map_batches(expand_ring, batch_format="pyarrow")
        .groupby("hex_id")
        .aggregate(Sum("n_sm", alias_name="n_smooth"))
    )


# ------------------------------------------------- real pages-table inputs --

def write_pages_parquet(sf_dir: str, out_dir: str, repl: int = 1):
    """Materialize the synthetic pages table to parquet — produces a REAL
    input dataset in the exact BASELINE.json input_hint shape
    (url, warc_ts, html, text, lang [+ doc_id])."""
    pages_ds(sf_dir, repl).write_parquet(out_dir)
    return out_dir


def mentions_from_pages(pages_path: str) -> ray.data.Dataset:
    """Consume an ACTUAL pages parquet dataset (the production entry point: a
    user with real Common-Crawl-style pages starts here — no synthesis).

    Columns required: url, html (binary), lang; doc_id optional (derived from
    a hash of url when absent so downstream keys stay stable).
    """
    ds = ray.data.read_parquet(pages_path)

    def ensure_doc_id(batch: pa.Table) -> pa.Table:
        if "doc_id" in batch.column_names:
            return batch
        from ..functions.vmd5 import md5_u64_arrow

        col = batch.column("url")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        hi, _ = md5_u64_arrow(col)
        ids = (hi >> np.uint64(1)).astype(np.int64)
        return batch.append_column("doc_id", pa.array(ids, pa.int64()))

    return (
        ds.map_batches(ensure_doc_id, batch_format="pyarrow")
        .map_batches(extract_stage, batch_format="pyarrow")
        .map_batches(geoparse_stage, batch_format="pyarrow")
    )


def q_pip_nearest(sf_dir: str) -> ray.data.Dataset:
    """Containing-OR-NEAREST polygon join (``PolygonIndex.getContainingOrNearest``,
    PolygonIndex.java:93-130): only the even-keyed admin rects are loaded, so
    points falling in the odd gaps exercise the nearest-boundary fallback.
    Ties (exact equidistance) break on smallest admin_id — mirrored in SQL."""
    polys = [p for p in load_admin_polygons(sf_dir) if p[0] % 2 == 0]
    handle = ray.put(polys)
    return (
        mentions_ds(sf_dir)
        .map_batches(
            PIPJoiner,
            fn_constructor_args=(handle, "nearest"),
            batch_format="pyarrow",
            concurrency=(2, 8),
            num_cpus=0.5,
        )
        .select_columns(["doc_id", "mention_idx", "admin_id"])
    )


# --------------------------------------------------------- URL / domain ops --

def _split_url(url: "pa.ChunkedArray | pa.Array"):
    """``scheme://host/seg/...`` -> list<string> of '/'-separated parts.

    One Arrow split kernel; callers pick host (element 2) / path (3+) from
    the list without any per-row Python."""
    import pyarrow.compute as pc

    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    return pc.split_pattern(url, "/")


def q_url_parse(sf_dir: str) -> ray.data.Dataset:
    """Vectorized URL decomposition (the CC-pipeline normalize step): url ->
    (host, path, depth) via Arrow split/list kernels — no row loop, no regex.
    Mirrors the reference's per-source attribute parsing discipline
    (``functions/parse`` family) applied to web corpora."""
    import pyarrow.compute as pc

    def parse(batch: pa.Table) -> pa.Table:
        parts = _split_url(batch.column("url"))
        host = pc.list_element(parts, 2)
        tail = pc.binary_join(pc.list_slice(parts, 3), "/")
        path = pc.binary_join_element_wise("/", tail, "")
        depth = pc.cast(pc.subtract(pc.list_value_length(parts), 3), pa.int64())
        return pa.table(
            {"url": batch.column("url"), "host": host, "path": path, "depth": depth}
        )

    return pages_ds(sf_dir).map_batches(parse, batch_format="pyarrow")


def q_prefix_filter(sf_dir: str) -> ray.data.Dataset:
    """URL blocklist filtering (the UT1/CC-pipeline shape): pages whose url
    starts with any blocklist prefix.  The blocklist here is deterministic
    (every 13th host, plus one path-level prefix) so the oracle re-derives
    it in SQL with ``starts_with``.

    Scale shape: the sorted PREFIX-FREE blocklist is tiny and broadcast by
    value; each batch does ONE ``searchsorted`` predecessor probe per url
    + a vectorized startswith — for a prefix-free sorted list the
    lexicographic predecessor is the only candidate prefix, so the probe
    is exact (no per-row loop, no N x blocklist scan)."""
    import pyarrow.compute as pc

    prefixes = sorted(
        [f"https://example{k}.com/" for k in range(0, 997, 13)]
        + ["https://example7.com/p/1"]
    )
    parr = np.array(prefixes)

    def blocked(batch: pa.Table) -> pa.Table:
        url = batch.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        u = url.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(parr, u, side="right") - 1
        cand = parr[np.maximum(idx, 0)]
        hit = (idx >= 0) & np.char.startswith(u.astype(str), cand)
        return pa.table({
            "doc_id": batch.column("doc_id").filter(pa.array(hit)),
            "url": url.filter(pa.array(hit)),
        })

    return pages_ds(sf_dir).map_batches(blocked, batch_format="pyarrow")


def q_domain_stats(sf_dir: str) -> ray.data.Dataset:
    """Per-domain corpus analytics: page count, total page bytes, doc-id
    range.  Scale pattern: per-batch partial aggregates grouped in-memory,
    then ONE small groupby over <= #domains rows (combiner-before-shuffle,
    same shape as ``q_tile_counts``)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        host = pc.list_element(_split_url(batch.column("url")), 2)
        txt = batch.column("text")
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        t = pa.table(
            {
                "host": host,
                "bytes": pc.cast(pc.binary_length(txt), pa.int64()),
                "doc_id": batch.column("doc_id"),
            }
        )
        df = t.to_pandas().groupby("host", as_index=False).agg(
            n_part=("bytes", "size"),
            bytes_part=("bytes", "sum"),
            min_part=("doc_id", "min"),
            max_part=("doc_id", "max"),
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        pages_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("n_part", alias_name="n_pages"),
            Sum("bytes_part", alias_name="total_bytes"),
            Min("min_part", alias_name="min_doc"),
            Max("max_part", alias_name="max_doc"),
        )
    )


def q_domain_cap(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Domain frequency capping: keep at most ``k`` pages per host, ranked by
    doc_id ascending (the deterministic tie-free order) — the standard
    crawl-balancing step before LLM training.

    Scale design: per-batch partial keep-k (a batch's k smallest doc_ids per
    host necessarily contain the global winners), then hosts are hash-bucketed
    (fnv64 of the host string, 64 buckets) so the final exact keep-k runs one
    vectorized lexsort per THOUSANDS of hosts — never a map_groups per tiny
    host group, never a global sort.  Bounded memory: each bucket holds
    <= k * upstream_blocks rows per host."""
    import pyarrow.compute as pc

    from ..functions.vhash import fnv64_arrow

    def keepk(host, doc_id, extra_cols):
        order = np.lexsort((doc_id, host))
        h, d = host[order], doc_id[order]
        new = np.ones(len(h), dtype=bool)
        new[1:] = h[1:] != h[:-1]
        start = np.flatnonzero(new)
        rank = np.arange(len(h)) - np.repeat(start, np.diff(np.append(start, len(h))))
        keep = order[rank < k]
        return keep

    def partial(batch: pa.Table) -> pa.Table:
        host_arr = pc.list_element(_split_url(batch.column("url")), 2)
        host = np.asarray(host_arr)
        doc_id = batch.column("doc_id").to_numpy()
        keep = keepk(host, doc_id, None)
        bkt = (fnv64_arrow(host_arr.take(pa.array(keep))) % 64).astype(np.int64)
        return pa.table(
            {
                "host": host_arr.take(pa.array(keep)),
                "doc_id": pa.array(doc_id[keep], pa.int64()),
                "url": batch.column("url").combine_chunks().take(pa.array(keep))
                if isinstance(batch.column("url"), pa.ChunkedArray)
                else batch.column("url").take(pa.array(keep)),
                "bkt": pa.array(bkt, pa.int64()),
            }
        )

    def finalize(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "host": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                }
            )
        host = np.asarray(g.column("host"))
        doc_id = g.column("doc_id").to_numpy()
        keep = keepk(host, doc_id, None)
        keep_idx = pa.array(np.sort(keep))
        return g.select(["host", "doc_id", "url"]).take(keep_idx)

    return (
        pages_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(finalize, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# polygon fill census — exact oracle for the polygon slicing fill path
# ---------------------------------------------------------------------------

DIAMOND_LON_MULT, DIAMOND_LAT_MULT = 27644437, 115249
DIAMOND_A_MULT, DIAMOND_B_MULT = 69621, 40692
FILL_SUB = 4096  # subpixels per tile axis for the snapped slicing grid


DIAMOND_DENSIFY = 6  # sub-segments per diamond side (small edge bboxes)


def diamond_rings_mdeg(k: int) -> list[np.ndarray]:
    """Deterministic DIAGONAL-edged test polygon: a densified rhombus with a
    half-size rhombus hole, integer-mdeg vertices from the nation key (so
    the DuckDB twin reconstructs the identical geometry with integer
    arithmetic; the `(len·f)//m` interpolation uses positive operands only,
    where floor == truncate on both engines).  Each side is split into
    ``DIAMOND_DENSIFY`` sub-segments so edge bboxes are small — the fill
    detector's touched-row scan is per-edge-bbox, and four full-side
    diagonals would blanket the interior.  Diagonal edges make the even-odd
    parity test non-trivial (unlike the axis-aligned admin rectangles)."""
    c_lon = (k * DIAMOND_LON_MULT) % 300000 - 150000
    c_lat = (k * DIAMOND_LAT_MULT) % 130000 - 65000
    a = 8000 + (k * DIAMOND_A_MULT) % 12000
    b = 5000 + (k * DIAMOND_B_MULT) % 8000
    m = DIAMOND_DENSIFY

    def ring(aa: int, bb: int) -> np.ndarray:
        pts = []
        for j in range(4 * m + 1):
            s, f = divmod(j, m)
            if s >= 4:
                s, f = 0, 0
            fa, fb = (aa * f) // m, (bb * f) // m
            if s == 0:
                x, y = aa - fa, fb
            elif s == 1:
                x, y = -fa, bb - fb
            elif s == 2:
                x, y = -aa + fa, -fb
            else:
                x, y = fa, -bb + fb
            pts.append([c_lon + x, c_lat + y])
        return np.array(pts, dtype=np.float64)

    return [ring(a, b), ring(a // 2, b // 2)]


def q_polygon_fill(sf_dir: str, zooms=(7, 8, 10)) -> ray.data.Dataset:
    """Per-zoom FILL-tile census through the REAL polygon slicing kernel.

    Runs ``geo/clip.polygon_tiles`` (the ``TiledGeometry`` fill-detection
    analogue: untouched-row scan + center-line even-odd parity, reference
    ``geometry/TiledGeometry.java:544-597``) over deterministic
    diamond-with-hole polygons, coordinates snapped to the half-offset
    4096-subpixel grid of ``routes.line_cover_ds``.

    Exactness argument (mirrors ``sql_polygon_fill``):

    - a segment whose x-bbox overlaps a buffered column always has actual
      points inside it, so its buffered y-extent reaches the column's
      clipped y-range — the kernel's clip-to-row-0 guard can never fire and
      "row touched" reduces to exact integer bbox/floor arithmetic;
    - a parity crossing near a row CENTER implies that edge touches the row
      (so the row is not a fill candidate) — parity ties therefore never
      decide an emitted fill, and the remaining comparisons are exact on
      the dyadic snapped grid;
    - every untouched parity-odd row sits ≥0.49 tiles inside the kernel's
      clipped row range, so candidate enumeration from the polygon bbox is
      equivalent.

    Scale shape: per-feature slicing (vectorized kernel inside), per-batch
    partial (z, tile) counts → ONE shuffle → tiny per-z aggregate.
    """
    from ray.data.aggregate import Count, Sum

    from ..geo import mercator
    from ..geo.clip import polygon_tiles

    zooms = list(zooms)

    def census(batch: pa.Table) -> pa.Table:
        zs_o: list[int] = []
        xs_o: list[int] = []
        ys_o: list[int] = []
        for k in batch.column("n_nationkey").to_pylist():
            rings = diamond_rings_mdeg(int(k))
            w = [
                np.column_stack(
                    [
                        mercator.lon_to_world_x(r[:, 0] / 1000.0),
                        mercator.lat_to_world_y(r[:, 1] / 1000.0),
                    ]
                )
                for r in rings
            ]
            for z in zooms:
                scale = float(FILL_SUB << z)
                q = [(np.floor(r * scale) + 0.5) / scale for r in w]
                for tx, ty, _rings, is_fill in polygon_tiles(q, z):
                    if is_fill:
                        zs_o.append(z)
                        xs_o.append(tx)
                        ys_o.append(ty)
        t = pa.table(
            {
                "z": pa.array(zs_o, pa.int64()),
                "tile_x": pa.array(xs_o, pa.int64()),
                "tile_y": pa.array(ys_o, pa.int64()),
                "cnt": pa.array(np.ones(len(zs_o), dtype=np.int64)),
            }
        )
        return t.group_by(["z", "tile_x", "tile_y"]).aggregate([("cnt", "sum")])

    per_tile = (
        ray.data.read_parquet(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
        .map_batches(census, batch_format="pyarrow")
        .groupby(["z", "tile_x", "tile_y"])
        .aggregate(Sum("cnt_sum", alias_name="cnt"))
    )
    return per_tile.groupby("z").aggregate(
        Count(alias_name="n_tiles"),
        Sum("cnt", alias_name="n_fill"),
        Sum("tile_x", alias_name="x_sum"),
        Sum("tile_y", alias_name="y_sum"),
    )


def q_convex_hull(sf_dir: str, n_zones: int = 8):
    """Distributed EXACT convex hull per zone (ST_ConvexHull analogue):
    per-batch partial hulls (associative: hull(A∪B) = hull(hull A ∪
    hull B)) -> ONE shuffle of hull VERTICES only -> per-zone final
    merge.  The cloud never crosses the exchange; the kernel is Andrew's
    monotone chain over a vectorized per-x min/max prefilter
    (``geo/hull.py``).

    Exact oracle by construction: zone g plants ring points on the
    integer parabola (t, t^2), t in [-K, K] (strictly convex => ALL are
    hull vertices) plus interior points (u, u^2 + 1) strictly between the
    parabola and the top chord — so the hull is EXACTLY the 2K+1 planted
    ring points, and n_vertices / |shoelace| / coordinate checksums have
    a pure-BIGINT generate_series twin.  Requires >= n_zones * (2K+1)
    docs (holds from sf0.01 up)."""
    from ..geo.hull import convex_hull, hull_area2x

    def plant(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy().astype(np.int64)
        g = d % n_zones
        i = d // n_zones
        K = 3 + g
        is_ring = i <= 2 * K
        t = i - K
        u = (i * 2654435761 % (2 * K - 1)) - (K - 1)
        x = np.where(is_ring, t, u)
        y = np.where(is_ring, t * t, u * u + 1)
        return pa.table({
            "zone": pa.array(g, pa.int64()),
            "x": pa.array(x, pa.int64()),
            "y": pa.array(y, pa.int64()),
        })

    def partial_hull(batch: pa.Table) -> pa.Table:
        zone = batch.column("zone").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        zs, xs, ys = [], [], []
        for z in np.unique(zone):
            m = zone == z
            ring = convex_hull(x[m], y[m])
            zs.append(np.full(len(ring), z, np.int64))
            xs.append(ring[:, 0])
            ys.append(ring[:, 1])
        return pa.table({
            "zone": pa.array(np.concatenate(zs), pa.int64()),
            "x": pa.array(np.concatenate(xs).astype(np.int64), pa.int64()),
            "y": pa.array(np.concatenate(ys).astype(np.int64), pa.int64()),
        })

    def final_hull(grp: pa.Table) -> pa.Table:
        z = grp.column("zone")[0].as_py()
        ring = convex_hull(grp.column("x").to_numpy(),
                           grp.column("y").to_numpy())
        return pa.table({
            "zone": pa.array([z], pa.int64()),
            "n_vertices": pa.array([len(ring)], pa.int64()),
            "area2x": pa.array([abs(hull_area2x(ring))], pa.int64()),
            "x_sum": pa.array([int(ring[:, 0].sum())], pa.int64()),
            "xy_sum": pa.array([int((ring[:, 0] * ring[:, 1]).sum())],
                               pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id"])
        .map_batches(plant, batch_format="pyarrow")
        .map_batches(partial_hull, batch_format="pyarrow")
        .groupby("zone")
        .map_groups(final_hull, batch_format="pyarrow")
    )


def q_flow_accumulation(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """D8-style flow accumulation on the mention-density raster — see
    ``stages.tiling.flow_accumulation``; recursive-closure SQL twin."""
    from ..stages.tiling import flow_accumulation

    return flow_accumulation(mentions_ds(sf_dir), z=z)


def q_watershed_labels(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """Watershed/basin segmentation of the density raster: each occupied
    cell labelled with its terminal D8 sink (``stages.tiling.
    watershed_labels``); recursive path-walk SQL twin."""
    from ..stages.tiling import watershed_labels

    return watershed_labels(mentions_ds(sf_dir), z=z)


def q_basin_depth(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """Flow-path-length histogram (hops to terminal sink) over the D8
    routing of the density raster (``stages.tiling.basin_depth``)."""
    from ..stages.tiling import basin_depth

    return basin_depth(mentions_ds(sf_dir), z=z)


def q_ridge_cells(sf_dir: str, z: int = 6) -> ray.data.Dataset:
    """Drainage-divide census: rook-adjacent cell pairs whose D8
    watersheds differ, per unordered sink pair
    (``stages.tiling.ridge_cells``)."""
    from ..stages.tiling import ridge_cells

    return ridge_cells(mentions_ds(sf_dir), z=z)


def q_line_of_sight(sf_dir: str, z: int = 6, threshold: int = 2,
                    k: int = 8) -> ray.data.Dataset:
    """Raster visibility between the k hottest occupied cells: rounded-DDA
    grid walk, intermediate occupied cells block — the viewshed-class
    analytic (``stages.tiling.line_of_sight``); exact integer SQL twin."""
    from ..stages.tiling import line_of_sight

    return line_of_sight(mentions_ds(sf_dir), z=z, threshold=threshold, k=k)


def q_zone_diameter(sf_dir: str) -> ray.data.Dataset:
    """ST_MaxDistance analogue: the EXACT diameter (max pairwise squared
    distance, integer mdeg^2) of the mention cloud per arithmetic admin
    zone.  The farthest pair is always attained at hull vertices, so the
    scale shape is the :func:`q_convex_hull` merge — per-batch partial
    hulls per zone, ONE exchange of hull VERTICES only, per-zone final
    hull + an all-pairs max over the (tiny) final ring.  The SQL twin
    brute-forces the per-zone self-join: same integer, different
    algorithm.  Zones with a single point report 0."""
    from ..geo.hull import convex_hull

    def plant(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat_mdeg").to_numpy()
        lon = batch.column("lon_mdeg").to_numpy()
        col = np.floor((lon / 1000.0 + 180.0005) / 72.0).astype(np.int64)
        row = np.floor((lat / 1000.0 + 85.0005) / 34.0).astype(np.int64)
        return pa.table({
            "zone": pa.array(row * 5 + col, pa.int64()),
            "x": pa.array(lon.astype(np.int64), pa.int64()),
            "y": pa.array(lat.astype(np.int64), pa.int64()),
        })

    def partial_hull(batch: pa.Table) -> pa.Table:
        zone = batch.column("zone").to_numpy()
        x = batch.column("x").to_numpy()
        y = batch.column("y").to_numpy()
        zs, xs, ys = [], [], []
        for z in np.unique(zone):
            m = zone == z
            ring = convex_hull(x[m], y[m])
            zs.append(np.full(len(ring), z, np.int64))
            xs.append(ring[:, 0])
            ys.append(ring[:, 1])
        return pa.table({
            "zone": pa.array(np.concatenate(zs), pa.int64()),
            "x": pa.array(np.concatenate(xs).astype(np.int64), pa.int64()),
            "y": pa.array(np.concatenate(ys).astype(np.int64), pa.int64()),
        })

    def final_diam(grp: pa.Table) -> pa.Table:
        z = grp.column("zone")[0].as_py()
        ring = convex_hull(grp.column("x").to_numpy(),
                           grp.column("y").to_numpy())
        x, y = ring[:, 0], ring[:, 1]
        dx = x[:, None] - x[None, :]
        dy = y[:, None] - y[None, :]
        d2 = int((dx * dx + dy * dy).max()) if len(x) else 0
        return pa.table({
            "admin_id": pa.array([z], pa.int64()),
            "diam2": pa.array([d2], pa.int64()),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(lambda b: plant(b), batch_format="pyarrow")
        .map_batches(partial_hull, batch_format="pyarrow")
        .groupby("zone")
        .map_groups(final_diam, batch_format="pyarrow")
    )


def q_tile_size_budget(sf_dir: str, zooms=(4, 8), budget: int = 2048
                       ) -> ray.data.Dataset:
    """Per-tile byte-budget enforcement — the reference's max-tile-bytes
    discipline (``util/TileSizeStats.java`` per-tile/per-layer byte
    census; ``archive/TileArchiveWriter.java`` big-tile accounting) as a
    first-class operator: every feature carries a deterministic encoded
    cost (``16 + doc_id % 64`` bytes stands in for its MVT wire size —
    SQL-expressible so the cut is exact-oracle checkable), features rank
    within their tile by a deterministic priority (then doc, mention for
    total order), and the tile keeps the maximal PREFIX whose cumulative
    cost fits the budget.  Output per (z, tile): kept/dropped feature
    counts and kept bytes.

    Scale shape: this is an order-dependent per-tile prefix, so raw
    feature rows must co-locate — ONE hash-bucket exchange on the tile
    key (the flagship's own shuffle discipline; volume = the feature
    stream, same as any real archive write).  The bucket body is fully
    vectorized: one lexsort over (tile, priority, doc, mention), a
    segment-offset cumulative sum (global cumsum minus its value at each
    tile's start), a <= budget mask, and reduceat censuses."""
    from ..stages.tiling import assign_tiles

    N_BUCKETS = 64

    def feats(batch: pa.Table) -> pa.Table:
        t = assign_tiles(batch, zooms=list(zooms))
        doc = t.column("doc_id").to_numpy()
        mid = t.column("mention_idx").to_numpy()
        cost = 16 + doc % 64
        prio = (doc * 31 + mid * 7) % 1024
        z = t.column("z").to_numpy()
        tx = t.column("tile_x").to_numpy()
        ty = t.column("tile_y").to_numpy()
        return pa.table({
            "z": pa.array(z, pa.int64()),
            "tile_x": pa.array(tx, pa.int64()),
            "tile_y": pa.array(ty, pa.int64()),
            "doc_id": pa.array(doc, pa.int64()),
            "mention_idx": pa.array(mid, pa.int64()),
            "cost": pa.array(cost, pa.int64()),
            "prio": pa.array(prio, pa.int64()),
            "tbucket": pa.array(
                ((z * 1_000_003 + tx * 7919 + ty) % N_BUCKETS + N_BUCKETS)
                % N_BUCKETS, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "z": pa.array([], pa.int64()),
            "tile_x": pa.array([], pa.int64()),
            "tile_y": pa.array([], pa.int64()),
            "n_kept": pa.array([], pa.int64()),
            "n_dropped": pa.array([], pa.int64()),
            "bytes_kept": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        z = g.column("z").to_numpy()
        tx = g.column("tile_x").to_numpy()
        ty = g.column("tile_y").to_numpy()
        doc = g.column("doc_id").to_numpy()
        mid = g.column("mention_idx").to_numpy()
        cost = g.column("cost").to_numpy()
        prio = g.column("prio").to_numpy()
        order = np.lexsort((mid, doc, prio, ty, tx, z))
        z, tx, ty = z[order], tx[order], ty[order]
        cost = cost[order]
        n = len(order)
        new = np.zeros(n, dtype=bool)
        new[0] = True
        new[1:] = (z[1:] != z[:-1]) | (tx[1:] != tx[:-1]) | (ty[1:] != ty[:-1])
        starts = np.flatnonzero(new)
        cs = np.cumsum(cost)
        base = (cs[starts] - cost[starts])  # cumsum just before each tile
        lens = np.diff(np.append(starts, n))
        cum = cs - np.repeat(base, lens)
        keep = cum <= budget
        kept = np.add.reduceat(keep.astype(np.int64), starts)
        total = lens.astype(np.int64)
        bkept = np.add.reduceat(np.where(keep, cost, 0), starts)
        return pa.table({
            "z": pa.array(z[starts], pa.int64()),
            "tile_x": pa.array(tx[starts], pa.int64()),
            "tile_y": pa.array(ty[starts], pa.int64()),
            "n_kept": pa.array(kept, pa.int64()),
            "n_dropped": pa.array(total - kept, pa.int64()),
            "bytes_kept": pa.array(bkept, pa.int64()),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(feats, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["tbucket"])),
                    batch_format="pyarrow")
    )


def q_shard_plan(sf_dir: str, zooms=(2, 6), n_shards: int = 8,
                 n_ranges: int = 32) -> ray.data.Dataset:
    """Balanced archive-shard planning — assign every tile to one of
    ``n_shards`` output shards so that shards carry ~equal BYTES and each
    shard is a CONTIGUOUS tile-key range (what the reference's writer
    needs to split a planet archive across workers while keeping the
    tile-id-clustered layout: ``archive/TileArchiveWriter.java`` write
    order, PMTiles clustering).  shard(tile) = floor(bytes_before *
    n_shards / total_bytes) over the (z, tile_x, tile_y)-lexicographic
    order.

    Scale shape — a GLOBAL ordered prefix sum with NO global sort (the
    ExternalMergeSort-avoidance story, same discipline as url_lcp's
    bucketed contiguity): the tile keyspace splits into ``n_ranges``
    CONTIGUOUS key ranges by pure arithmetic (key // div — no sampling
    pass needed because the key domain is closed-form);
    pass A streams the feature scan into per-batch (range, bytes)
    partials -> an n_ranges-row groupby -> driver-side exclusive prefix
    -> broadcast offsets (tiny);
    pass B streams the same scan into ONE range-bucket exchange of
    per-batch per-tile partials, and each range body does a lexsort +
    reduceat per-tile sum, a local cumsum PLUS the broadcast offset
    (exact global prefix), the shard assignment, and a per-shard census
    partial (shards are non-decreasing in key order, so the census is a
    run-boundary reduceat).  A final <= n_shards x n_ranges row
    groupby finishes.  Output: (shard, n_tiles, bytes, key_min, key_max).
    """
    from ray.data.aggregate import Max, Min, Sum

    from ..stages.tiling import assign_tiles

    zmax = max(zooms)
    keyspan = (zmax + 1) << (2 * zmax)
    div = -(-keyspan // n_ranges)  # ceil — contiguous, order-preserving

    def feat_keys(batch: pa.Table):
        t = assign_tiles(batch, zooms=list(zooms))
        doc = t.column("doc_id").to_numpy()
        cost = 16 + doc % 64
        z = t.column("z").to_numpy()
        tx = t.column("tile_x").to_numpy()
        ty = t.column("tile_y").to_numpy()
        key = (z << (2 * zmax)) + (tx << zmax) + ty
        return key, cost

    def range_partial(batch: pa.Table) -> pa.Table:
        key, cost = feat_keys(batch)
        rb = key // div
        u, inv = np.unique(rb, return_inverse=True)
        return pa.table({
            "rb": pa.array(u, pa.int64()),
            "b_part": pa.array(np.bincount(inv, cost).astype(np.int64),
                               pa.int64()),
        })

    totals = (
        mentions_ds(sf_dir)
        .map_batches(range_partial, batch_format="pyarrow")
        .groupby("rb")
        .aggregate(Sum("b_part", alias_name="bytes"))
        .to_pandas()  # bounded: <= n_ranges rows
        .sort_values("rb", ignore_index=True)
    )
    per_rb = np.zeros(n_ranges, np.int64)
    per_rb[totals["rb"].to_numpy()] = totals["bytes"].to_numpy()
    offsets = np.concatenate([[0], np.cumsum(per_rb)[:-1]])
    total = int(per_rb.sum())

    def tile_partial(batch: pa.Table) -> pa.Table:
        key, cost = feat_keys(batch)
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "key": pa.array(u, pa.int64()),
            "b_part": pa.array(np.bincount(inv, cost).astype(np.int64),
                               pa.int64()),
            "rb": pa.array(u // div, pa.int64()),
        })

    def per_range(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "shard": pa.array([], pa.int64()),
            "n_tiles_p": pa.array([], pa.int64()),
            "bytes_p": pa.array([], pa.int64()),
            "kmin_p": pa.array([], pa.int64()),
            "kmax_p": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        key = g.column("key").to_numpy()
        bp = g.column("b_part").to_numpy()
        rb = int(key[0] // div)
        order = np.argsort(key, kind="stable")
        k_s, b_s = key[order], bp[order]
        new = np.zeros(len(k_s), dtype=bool)
        new[0] = True
        new[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(new)
        tk = k_s[starts]
        tb = np.add.reduceat(b_s, starts)
        cum_before = int(offsets[rb]) + np.concatenate(
            [[0], np.cumsum(tb)[:-1]])
        shard = (cum_before * n_shards) // total
        # shards non-decreasing in key order -> run-boundary census
        snew = np.zeros(len(tk), dtype=bool)
        snew[0] = True
        snew[1:] = shard[1:] != shard[:-1]
        ss = np.flatnonzero(snew)
        se = np.append(ss[1:], len(tk))
        return pa.table({
            "shard": pa.array(shard[ss], pa.int64()),
            "n_tiles_p": pa.array((se - ss).astype(np.int64), pa.int64()),
            "bytes_p": pa.array(np.add.reduceat(tb, ss), pa.int64()),
            "kmin_p": pa.array(tk[ss], pa.int64()),
            "kmax_p": pa.array(tk[se - 1], pa.int64()),
        })

    return (
        mentions_ds(sf_dir)
        .map_batches(tile_partial, batch_format="pyarrow")
        .groupby("rb")
        .map_groups(lambda g: per_range(g.drop_columns(["rb"])),
                    batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_tiles_p", alias_name="n_tiles"),
                   Sum("bytes_p", alias_name="bytes"),
                   Min("kmin_p", alias_name="key_min"),
                   Max("kmax_p", alias_name="key_max"))
    )


# ------------------------------------------------- URL canonicalization --

_URL_PREFIX_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"


def canonicalize_urls(url: pa.Array) -> pa.Array:
    """General vectorized URL canonicalizer (the CC-pipeline revisit-dedup
    normalize step).  Fixed rule sequence, every step a single RE2 kernel
    so the DuckDB twin (also RE2) applies the IDENTICAL regexes in the
    IDENTICAL order:

    1. lowercase scheme+authority (path/query case preserved),
    2. drop default ports (https :443, http :80),
    3. strip the #fragment,
    4. drop utm_* tracking params (mid-query, leading, and lone),
    5. strip one trailing slash (never the ``scheme://`` slashes).
    """
    import pyarrow.compute as pc

    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    # 1. lowercase the scheme://host[:port] prefix
    pre = pc.struct_field(
        pc.extract_regex(url, f"(?P<pre>{_URL_PREFIX_RE})"), "pre")
    rest = pc.replace_substring_regex(url, _URL_PREFIX_RE, "",
                                      max_replacements=1)
    u = pc.if_else(pc.is_valid(pre),
                   pc.binary_join_element_wise(pc.utf8_lower(pre), rest, ""),
                   url)
    # 2. default ports
    u = pc.replace_substring_regex(
        u, r"^(https://[^/:?#]+):443([/?#]|$)", r"\1\2", max_replacements=1)
    u = pc.replace_substring_regex(
        u, r"^(http://[^/:?#]+):80([/?#]|$)", r"\1\2", max_replacements=1)
    # 3. fragment
    u = pc.replace_substring_regex(u, "#.*$", "", max_replacements=1)
    # 4. utm params: trailing-& form globally, then the leading-? forms
    u = pc.replace_substring_regex(u, "&utm_[^&]*", "")
    u = pc.replace_substring_regex(u, r"\?utm_[^&]*&", "?",
                                   max_replacements=1)
    u = pc.replace_substring_regex(u, r"\?utm_[^&]*$", "",
                                   max_replacements=1)
    # 5. trailing slash (the ([^/]) guard keeps "scheme://" intact)
    u = pc.replace_substring_regex(u, "([^/])/$", r"\1", max_replacements=1)
    return u


def _messy_url_variants(batch: pa.Table) -> pa.Table:
    """Deterministic messy-variant synthesis (SQL-mirrorable): every doc
    emits its clean url plus an everything-wrong variant (uppercase
    authority, explicit :443, trailing slash, two utm params, fragment);
    every third doc adds a lone-"?utm_ref" variant to exercise the
    strip-to-empty-query branch."""
    import pyarrow.compute as pc

    from ..sources.pages import urls_from_ids

    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    clean = urls_from_ids(ids)
    host = pc.cast(pa.array(ids % 997), pa.string())
    id_s = pc.cast(pa.array(ids), pa.string())
    messy = pc.binary_join_element_wise(
        "HTTPS://EXAMPLE", host, ".COM:443/p/", id_s,
        "/?utm_source=feed&utm_campaign=c",
        pc.cast(pa.array(ids % 5), pa.string()),
        "#frag", pc.cast(pa.array(ids % 7), pa.string()), "")
    lone = pc.binary_join_element_wise(clean, "?utm_ref=only", "")
    third = ids % 3 == 0
    out_id = np.concatenate([ids, ids, ids[third]])
    out_url = pa.concat_arrays([
        clean.combine_chunks() if isinstance(clean, pa.ChunkedArray) else clean,
        messy, lone.filter(pa.array(third))])
    return pa.table({"doc_id": pa.array(out_id, pa.int64()), "url": out_url})


def q_url_canon_dedup(sf_dir: str) -> ray.data.Dataset:
    """URL-canonicalization dedup census (the crawl revisit-collapse step):
    canonicalize every variant url (:func:`canonicalize_urls`), then ONE
    groupby over canonical urls -> (url, n_variants, doc_id).  Per-batch
    count partials mean only distinct (url, doc) partials cross the
    exchange; at crawl scale the groupby key is the canonical url hash."""
    from ray.data.aggregate import Max, Sum

    def canon_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"url": canonicalize_urls(batch.column("url")),
                      "doc_id": batch.column("doc_id")})
        df = t.to_pandas().groupby("url", sort=False).agg(
            n_part=("doc_id", "size"), doc_id=("doc_id", "max")).reset_index()
        return pa.Table.from_pandas(df, preserve_index=False)

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return (
        docs.map_batches(_messy_url_variants, batch_format="pyarrow")
        .map_batches(canon_partial, batch_format="pyarrow")
        .groupby("url")
        .aggregate(Sum("n_part", alias_name="n_variants"),
                   Max("doc_id", alias_name="doc_id"))
    )


def q_geoparquet_roundtrip(sf_dir: str) -> ray.data.Dataset:
    """GeoParquet round trip (public spec: WKB geometry column + a ``geo``
    schema-metadata document): geoparsed mentions are encoded as WKB
    points, written as sharded GeoParquet under /tmp (one file per block
    — the resumable layout), read back through ``ray.data.read_parquet``,
    WKB-decoded vectorized, and compared against the UNCHANGED mentions
    oracle — any byte lost in encode/write/read/decode fails the hash.
    The 21-byte point WKB is built and parsed as flat numpy views (no
    per-row loops)."""
    import json
    import os
    import tempfile

    out_dir = tempfile.mkdtemp(prefix="planetiler_geopq_")
    geo_meta = json.dumps({
        "version": "1.0.0",
        "primary_column": "geometry",
        "columns": {"geometry": {"encoding": "WKB",
                                 "geometry_types": ["Point"]}},
    })

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n_rows": pa.array([], pa.int64())})
        import pyarrow.parquet as pqw

        lon = batch.column("lon_mdeg").to_numpy() / 1000.0
        lat = batch.column("lat_mdeg").to_numpy() / 1000.0
        n = batch.num_rows
        raw = np.zeros((n, 21), np.uint8)
        raw[:, 0] = 1                      # little-endian
        raw[:, 1] = 1                      # wkbPoint
        raw[:, 5:13] = lon.astype("<f8").view(np.uint8).reshape(n, 8)
        raw[:, 13:21] = lat.astype("<f8").view(np.uint8).reshape(n, 8)
        geom = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(21), n, [None, pa.py_buffer(raw.tobytes())])
        ids = batch.column("doc_id").to_numpy()
        tbl = pa.table({
            "doc_id": batch.column("doc_id"),
            "mention_idx": batch.column("mention_idx"),
            "geometry": geom,
        })
        tbl = tbl.replace_schema_metadata({b"geo": geo_meta.encode()})
        path = os.path.join(
            out_dir, f"part-{int(ids.min()):012d}-{n}.parquet")
        pqw.write_table(tbl, path)
        return pa.table({"n_rows": pa.array([n], pa.int64())})

    n_written = (
        mentions_ds(sf_dir)
        .map_batches(write_shard, batch_format="pyarrow")
        .sum("n_rows")
    )
    # spec surface check: the geo metadata survives the file round trip
    import pyarrow.parquet as pqr

    first = sorted(os.listdir(out_dir))[0]
    meta = pqr.read_schema(os.path.join(out_dir, first)).metadata
    assert b"geo" in meta and b"WKB" in meta[b"geo"], "geo metadata lost"

    def decode(batch: pa.Table) -> pa.Table:
        col = batch.column("geometry")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        raw = np.frombuffer(col.buffers()[1], np.uint8)[: n * 21].reshape(n, 21)
        lon = raw[:, 5:13].copy().view("<f8").ravel()
        lat = raw[:, 13:21].copy().view("<f8").ravel()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "mention_idx": batch.column("mention_idx"),
            "lat_mdeg": pa.array(np.round(lat * 1000.0).astype(np.int64),
                                 pa.int64()),
            "lon_mdeg": pa.array(np.round(lon * 1000.0).astype(np.int64),
                                 pa.int64()),
        })

    assert n_written and n_written > 0
    return ray.data.read_parquet(out_dir).map_batches(
        decode, batch_format="pyarrow")


def q_warc_pages(sf_dir: str) -> ray.data.Dataset:
    """The ``pages_meta`` byte-identity invariant THROUGH the Common-Crawl
    container: synthesize pages -> write sharded ``.warc.gz`` + CDX under
    /tmp (one shard per block: the resumable crawl layout) -> read the
    shards back through :mod:`sources.warc` -> frozen extractor -> (url,
    warc_ts, lang, text_md5).  The oracle is ``sql_pages_meta`` VERBATIM,
    so any byte lost or reordered anywhere in the WARC round trip fails
    the hash."""
    import os
    import tempfile

    from ..functions.vmd5 import md5_hex_arrow
    from ..sources import warc as warcmod
    from ..sources.pages import extract_text_pa

    out_dir = tempfile.mkdtemp(prefix="planetiler_warc_")

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64())})
        ids = batch.column("doc_id").to_numpy()
        path = os.path.join(out_dir, f"shard-{int(ids.min()):012d}.warc.gz")
        n = warcmod.write_warc_shard(
            path,
            batch.column("url").to_pylist(),
            batch.column("warc_ts").cast(pa.int64()).to_pylist(),
            batch.column("lang").to_pylist(),
            batch.column("html").to_pylist(),
        )
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_records": pa.array([n], pa.int64())})

    # bounded driver pull: one row per shard (the write itself streamed)
    shards = (pages_ds(sf_dir).map_batches(write_shard, batch_format="pyarrow")
              .to_pandas())
    ds = warcmod.warc_pages_ds(sorted(shards["path"].tolist()))

    def meta(batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        text = extract_text_pa(html.cast(pa.string()))
        return pa.table(
            {
                "url": batch.column("url"),
                "warc_ts": batch.column("warc_ts"),
                "lang": batch.column("lang"),
                "text_md5": md5_hex_arrow(text),
            }
        )

    return ds.map_batches(meta, batch_format="pyarrow")


def q_extent_area(sf_dir: str) -> ray.data.Dataset:
    """Spherical bbox area per document — the query-level parity surface
    for the reference's ``WithGeometry.areaMeters`` (``GeoUtils.java:
    665-699``, the turf.js ring formula with R = 6371008.8): per-doc
    mention bbox (the ``doc_geo_extent`` aggregate) -> floor(ringAreaMeters
    of the box ring) as exact int64.  The four edge terms are written in
    the same left-associated order on both sides, and sin/radians are
    bit-equal between numpy and DuckDB libm (the tile-oracle finding), so
    the floored areas agree bitwise."""
    from ..geo.geomops import bbox_area_meters_vec

    def area(batch: pa.Table) -> pa.Table:
        a = bbox_area_meters_vec(
            batch.column("lon_min").to_numpy() / 1000.0,
            batch.column("lat_min").to_numpy() / 1000.0,
            batch.column("lon_max").to_numpy() / 1000.0,
            batch.column("lat_max").to_numpy() / 1000.0,
        )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_mentions": batch.column("n_mentions"),
            "area_m2": pa.array(np.floor(a).astype(np.int64), pa.int64()),
        })

    return q_doc_geo_extent(sf_dir).map_batches(area, batch_format="pyarrow")


# ----------------------------------------------- GIS reader oracle gates --

GIS_FIXTURE_DIR = "/tmp/planetiler_ray_gis"


def _gis_fixture_base(sf_dir: str, ext: str) -> tuple[str, bool]:
    """(cached fixture base path, needs_regen) per sf dir (pbf_fixture_path
    convention: regenerate when the source table is newer)."""
    import os

    os.makedirs(GIS_FIXTURE_DIR, exist_ok=True)
    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(GIS_FIXTURE_DIR, f"admin_{name}")
    probe = base + ext
    src_m = os.path.getmtime(f"{sf_dir}/nation.parquet")
    regen = (not os.path.exists(probe)) or os.path.getmtime(probe) < src_m
    return base, regen


def _admin_summary(batch: pa.Table, id_vals: np.ndarray) -> pa.Table:
    """Integer summary rows of decoded admin polygons: ring/point counts
    from the DECODED geometry (a reader drop/corruption breaks the hash)
    and the e4-scaled bbox via floor(x*1e4 + 0.5) — the same literal
    formula the SQL twin applies to its re-derived rectangle corners."""
    from ..geo import wkb as W

    wkbs = batch.column("geom_wkb").to_pylist()
    nr, npts, x0, y0, x1, y1 = [], [], [], [], [], []
    for b in wkbs:
        kind, rings = W.decode_wkb(b)
        assert kind == "polygon", kind
        allp = np.vstack(rings)
        nr.append(len(rings))
        npts.append(len(allp))
        x0.append(int(np.floor(allp[:, 0].min() * 10000 + 0.5)))
        y0.append(int(np.floor(allp[:, 1].min() * 10000 + 0.5)))
        x1.append(int(np.floor(allp[:, 0].max() * 10000 + 0.5)))
        y1.append(int(np.floor(allp[:, 1].max() * 10000 + 0.5)))
    return pa.table({
        "admin_id": pa.array(id_vals.astype(np.int64), pa.int64()),
        "n_rings": pa.array(nr, pa.int64()),
        "n_points": pa.array(npts, pa.int64()),
        "lon0_e4": pa.array(x0, pa.int64()),
        "lat0_e4": pa.array(y0, pa.int64()),
        "lon1_e4": pa.array(x1, pa.int64()),
        "lat1_e4": pa.array(y1, pa.int64()),
    })


def q_shapefile_src(sf_dir: str) -> ray.data.Dataset:
    """The pure-spec shapefile READER under the exact-oracle gate: the
    admin rectangles are written to a cached .shp/.shx/.dbf fixture
    (CW outer rings, admin_id in the .dbf), decoded back through the
    parallel reader, and summarized as integer bbox/count rows the SQL
    twin re-derives from ``nation`` with the identical float chain —
    upgrading SURVEY §2 row 5 from unit-only to gate coverage."""
    import pyarrow.parquet as pq2

    from ..sources.shapefile import read_shapefile, write_shapefile
    from ..sources.world import admin_ring

    base, regen = _gis_fixture_base(sf_dir, ".shp")
    if regen:
        keys = pq2.read_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey"]
                              ).column("n_nationkey").to_numpy()
        geoms = [[admin_ring(int(k))[::-1]] for k in keys]  # CW outer
        write_shapefile(base, ["polygon"] * len(keys), geoms,
                        fields=[("ADMIN_ID", "N", 8)],
                        attrs={"ADMIN_ID": [int(k) for k in keys]})

    def summarize(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("ADMIN_ID").to_pylist(), dtype=np.int64)
        return _admin_summary(batch, ids)

    return read_shapefile(base + ".shp").map_batches(
        summarize, batch_format="pyarrow")


def q_geopackage_src(sf_dir: str) -> ray.data.Dataset:
    """The stdlib-sqlite GeoPackage READER under the exact-oracle gate
    (same fixture world and summary contract as :func:`q_shapefile_src`;
    GPB header parse + WKB decode on the read path) — SURVEY §2 rows 6-7
    upgraded from unit-only to gate coverage."""
    import pyarrow.parquet as pq2

    from ..geo import wkb as W
    from ..sources.geopackage import read_geopackage, write_geopackage
    from ..sources.world import admin_ring

    base, regen = _gis_fixture_base(sf_dir, ".gpkg")
    if regen:
        keys = pq2.read_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey"]
                              ).column("n_nationkey").to_numpy()
        wkbs = [W.encode_wkb("polygon", [admin_ring(int(k))]) for k in keys]
        import os

        if os.path.exists(base + ".gpkg"):
            os.remove(base + ".gpkg")
        write_geopackage(base + ".gpkg", "admin", ["admin_id"],
                         {"admin_id": [str(int(k)) for k in keys]}, wkbs)

    def summarize(batch: pa.Table) -> pa.Table:
        ids = np.asarray([int(v) for v in
                          batch.column("admin_id").to_pylist()],
                         dtype=np.int64)
        return _admin_summary(batch, ids)

    return read_geopackage(base + ".gpkg", table="admin").map_batches(
        summarize, batch_format="pyarrow")


def q_geojson_src(sf_dir: str) -> ray.data.Dataset:
    """The NDJSON/GeoJSON READER under the exact-oracle gate (same admin
    fixture world + summary contract as :func:`q_shapefile_src`; per-line
    JSON parse + coordinates->WKB on the read path) — SURVEY §2 row 8
    upgraded from unit-only to gate coverage."""
    import json as _json
    import os

    import pyarrow.parquet as pq2

    from ..sources.geojson import read_ndjson_features
    from ..sources.world import admin_ring

    base, regen = _gis_fixture_base(sf_dir, ".ndjson")
    path = base + ".ndjson"
    if regen:
        keys = pq2.read_table(f"{sf_dir}/nation.parquet",
                              columns=["n_nationkey"]
                              ).column("n_nationkey").to_numpy()
        with open(path + ".tmp", "w") as f:
            for k in keys:
                ring = admin_ring(int(k)).tolist()
                f.write(_json.dumps({
                    "type": "Feature", "id": int(k),
                    "properties": {"admin_id": int(k)},
                    "geometry": {"type": "Polygon", "coordinates": [ring]},
                }) + "\n")
        os.replace(path + ".tmp", path)

    def summarize(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("feature_id").to_pylist(),
                         dtype=np.int64)
        return _admin_summary(batch, ids)

    return read_ndjson_features([path]).map_batches(
        summarize, batch_format="pyarrow")

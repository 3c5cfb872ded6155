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


LINE_COVER_SUB = 4096  # subpixels per tile axis for the snapped slicing grid


def line_cover_ds(sf_dir: str, zooms=(2, 5, 8)) -> ray.data.Dataset:
    """Per-zoom line→tile coverage census through the REAL slicing kernel.

    Runs ``geo/clip.line_tiles`` (the ``TiledGeometry.sliceIntoTiles``
    analogue, reference ``geometry/TiledGeometry.java:169-240``) over every
    assembled way, with coordinates snapped to a HALF-OFFSET 4096-subpixel
    grid first: ``q = (floor(w·4096·2^z) + 0.5) / (4096·2^z)``.

    Why the snap makes this exactly oracle-expressible:

    - every snapped coordinate is a dyadic rational with ≤22-bit numerator,
      so all of ``line_tiles``'s min/max/floor/slab comparisons are EXACT in
      float64 (no rounding anywhere a coverage decision is made);
    - numerators are odd while tile/buffer bounds are even (buf = 4/256 tile
      = 128 half-subpixels), so a vertex can never sit exactly on a slab
      boundary — the only tie class where the kernel's column-range scan and
      a closed segment∩box test could disagree;
    - hence "tile emitted" reduces to the closed intersection of a segment
      with the buffered tile box, which the DuckDB twin
      (:func:`sql_line_cover`) replays in exact BIGINT arithmetic (bbox
      overlap + corner cross-product SAT).

    Scale shape: per-batch partial distinct (z, tile) counts → ONE shuffle on
    (z, tile_x, tile_y) → tiny per-z aggregate.  The per-way loop is the
    per-feature geometry walk every renderer does; the clip kernel inside is
    vectorized.
    """
    from ray.data.aggregate import Count, Sum

    from ..geo import mercator
    from ..geo import wkb as wkbmod
    from ..geo.clip import line_tiles

    zooms = list(zooms)

    def cover(batch: pa.Table) -> pa.Table:
        zs_o: list[int] = []
        xs_o: list[int] = []
        ys_o: list[int] = []
        geoms = batch.column("geom_wkb")
        for i in range(batch.num_rows):
            _, coords = wkbmod.decode_wkb(geoms[i].as_py())
            w = np.column_stack(
                [
                    mercator.lon_to_world_x(coords[:, 0]),
                    mercator.lat_to_world_y(coords[:, 1]),
                ]
            )
            for z in zooms:
                scale = float(LINE_COVER_SUB << z)
                q = (np.floor(w * scale) + 0.5) / scale
                for tx, ty, _pieces in line_tiles(q, z):
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
        # partial: collapse (z, tile) duplicates inside the batch so the
        # shuffle moves per-tile counters, not per-way coverage rows
        return t.group_by(["z", "tile_x", "tile_y"]).aggregate([("cnt", "sum")])

    per_tile = (
        way_lines_ds(sf_dir)
        .map_batches(cover, batch_format="pyarrow")
        .groupby(["z", "tile_x", "tile_y"])
        .aggregate(Sum("cnt_sum", alias_name="cnt"))
    )
    return per_tile.groupby("z").aggregate(
        Count(alias_name="n_tiles"),
        Sum("cnt", alias_name="n_cover"),
        Sum("tile_x", alias_name="x_sum"),
        Sum("tile_y", alias_name="y_sum"),
    )


def sql_line_cover(zooms=(2, 5, 8)) -> str:
    """DuckDB mirror of :func:`line_cover_ds` — exact integer arithmetic.

    joined/coords/proj replicate :func:`sql_route_zoom_gate` (same node /
    anchor synthesis as ``osm.way_lines_ds``).  Coordinates are then snapped
    to half-offset subpixels (`2·floor(w·4096·2^z)+1`, units of 1/8192 tile)
    and tile coverage is the closed segment∩box test in BIGINT: bbox overlap
    on both axes AND the four buffered-tile corners not strictly on one side
    of the segment line (separating-axis theorem; cross products ≤2^38, no
    overflow).  Candidate tiles come from the per-segment buffered bbox via
    constant-bound ``generate_series`` (+ ON filter — DuckDB rejects
    correlated bounds); y candidates are clamped to [0, 2^z-1] exactly like
    ``line_tiles``.  The only float the oracle consumes is proj itself
    (`floor(wy·2^(z+12))` flips only if libm differs within ~1e-10 of a grid
    line — negligible vs the 2^-20 step).
    """
    from .osm import (
        NODE_LAT_MULT,
        NODE_LON_MULT,
        WAY_ANCHOR_LAT_MULT,
        WAY_ANCHOR_LON_MULT,
    )

    zs = ", ".join(f"({z}, {float(LINE_COVER_SUB << z)!r})" for z in zooms)
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
pz AS (
    SELECT p.way_id, p.seq, p.node_id, zs.z,
           2 * CAST(floor(p.wx * zs.scale) AS BIGINT) + 1 AS ix,
           2 * CAST(floor(p.wy * zs.scale) AS BIGINT) + 1 AS iy
    FROM proj p, (VALUES {zs}) AS zs(z, scale)
),
segs AS (
    SELECT way_id, z, ix AS ax, iy AS ay,
           lag(ix) OVER w AS bx, lag(iy) OVER w AS by2
    FROM pz WINDOW w AS (PARTITION BY way_id, z ORDER BY seq, node_id)
    QUALIFY lag(ix) OVER w IS NOT NULL
),
rng AS (
    SELECT s.*,
           CAST(floor((least(ax, bx) - 128) / 8192.0) AS BIGINT) AS cx_lo,
           CAST(floor((greatest(ax, bx) + 128) / 8192.0) AS BIGINT) AS cx_hi,
           greatest(CAST(0 AS BIGINT),
                    CAST(floor((least(ay, by2) - 128) / 8192.0) AS BIGINT)) AS cy_lo,
           least(CAST((1 << z) - 1 AS BIGINT),
                 CAST(floor((greatest(ay, by2) + 128) / 8192.0) AS BIGINT)) AS cy_hi
    FROM segs s
),
cand AS (
    SELECT r.way_id, r.z, r.ax, r.ay, r.bx, r.by2,
           r.cx_lo + gx.i AS cx, r.cy_lo + gy.i AS cy
    FROM rng r
    JOIN generate_series(0, 63) AS gx(i) ON gx.i <= r.cx_hi - r.cx_lo
    JOIN generate_series(0, 63) AS gy(i) ON gy.i <= r.cy_hi - r.cy_lo
),
boxed AS (
    SELECT way_id, z, cx, cy, ax, ay, bx, by2,
           cx * 8192 - 128 AS A, (cx + 1) * 8192 + 128 AS B,
           cy * 8192 - 128 AS C, (cy + 1) * 8192 + 128 AS D
    FROM cand
),
hits AS (
    SELECT DISTINCT way_id, z, cx, cy
    FROM boxed
    WHERE greatest(ax, bx) >= A AND least(ax, bx) <= B
      AND greatest(ay, by2) >= C AND least(ay, by2) <= D
      AND least((bx - ax) * (C - ay) - (by2 - ay) * (A - ax),
                (bx - ax) * (C - ay) - (by2 - ay) * (B - ax),
                (bx - ax) * (D - ay) - (by2 - ay) * (A - ax),
                (bx - ax) * (D - ay) - (by2 - ay) * (B - ax)) <= 0
      AND greatest((bx - ax) * (C - ay) - (by2 - ay) * (A - ax),
                   (bx - ax) * (C - ay) - (by2 - ay) * (B - ax),
                   (bx - ax) * (D - ay) - (by2 - ay) * (A - ax),
                   (bx - ax) * (D - ay) - (by2 - ay) * (B - ax)) >= 0
),
tiles AS (
    SELECT z, cx, cy, count(*) AS cnt FROM hits GROUP BY 1, 2, 3
)
SELECT z, count(*) AS n_tiles, CAST(sum(cnt) AS BIGINT) AS n_cover,
       CAST(sum(cx) AS BIGINT) AS x_sum, CAST(sum(cy) AS BIGINT) AS y_sum
FROM tiles GROUP BY z
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


# ------------------------------------------------ exact full-path twin --

# Mid-tile latitude bands for the exact route-tile twin: each wy sits
# >= 16 px away from a tile-row boundary at BOTH test zooms (3 and 6),
# so the horizontal segments never leak into an adjacent row and the
# ty = floor(wy * 2^z) decision has ~14 orders of magnitude of slack
# over any libm ulp difference between numpy and DuckDB.
EXACT_LAT_BANDS = (52.75, 37.0, 17.0, -5.25)
EXACT_BASE_COL = 30  # z6 tile column offset keeping every way mid-world


def route_tiles_exact_ds(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """The FULL tile path (render gate -> DP simplify -> buffered stripe
    slicing -> ONE tile shuffle -> per-tile attr-grouped line MERGING,
    reference ``FeatureMerge.java:101-231`` + ``TiledGeometry.java:169-240``)
    over a corpus constructed so every float decision has integer slack —
    which makes (z, tile_x, tile_y, n_features) EXACTLY SQL-expressible
    (:func:`sql_route_tiles_exact`), closing the route path's last
    rows-only gap.

    Construction (way w = o_orderkey, all in z6 pixel space):

    * horizontal 2-point segments (DP simplify is identity), lat band
      ``EXACT_LAT_BANDS[w % 4]`` (mid-tile rows at z3 and z6);
    * long ways (w % 5 >= 2): x in [(B+a)*256+48, (B+a+s)*256-48] with
      a = w % 7, s = 1 + w % 3 — every endpoint >= 44 px from a buffered
      tile boundary at both zooms, so coverage is pure integer range
      arithmetic; clipped per-tile chains are >= 20 px, far above the
      4 px merge-drop;
    * tiny ways exercise both drop gates: w % 5 == 0 spans 6 px (gated
      out at z3 by the 1 px render gate — 0.75 px — but survives z6's
      merge), w % 5 == 1 spans 2 px (renders at z6, then merge-dropped:
      chain < 4 px) — so the oracle proves gate AND merge-drop semantics.

    n_features per tile = COUNT(DISTINCT cls) among surviving ways: the
    assembler merges each (kind, attrs) group into ONE multilinestring.
    """
    from ..sinks.files import add_bucket
    from ..stages.assemble import make_bucket_assembler
    from ..stages.render import render_geometry_rows

    prof = routes_profile()
    zooms = [3, 6]
    base = EXACT_BASE_COL
    lats = np.asarray(EXACT_LAT_BANDS, dtype=np.float64)

    def render(batch: pa.Table) -> pa.Table:
        w = batch.column("o_orderkey").to_numpy().astype(np.int64)
        a = w % 7
        s = 1 + (w % 3)
        knd = w % 5
        x0 = (base + a) * 256 + 48
        x1 = np.where(knd == 0, x0 + 6,
                      np.where(knd == 1, x0 + 2, (base + a + s) * 256 - 48))
        lon0 = x0.astype(np.float64) / 16384.0 * 360.0 - 180.0
        lon1 = x1.astype(np.float64) / 16384.0 * 360.0 - 180.0
        lat = lats[w % 4]
        cls = w % 3
        rows: list[dict] = []
        for i in range(len(w)):
            rows.extend(
                render_geometry_rows(
                    feature_id=int(w[i]),
                    kind="linestring",
                    geom_lonlat=np.array(
                        [[lon0[i], lat[i]], [lon1[i], lat[i]]]
                    ),
                    layer="routes",
                    attrs_row={"cls": f"c{int(cls[i])}"},
                    min_zoom=0,
                    max_zoom=10,
                    zooms=zooms,
                )
            )
        if not rows:  # pragma: no cover — orders batches are never empty
            return pa.schema(
                [("tile_id", pa.int64()), ("z", pa.int64()),
                 ("tile_x", pa.int64()), ("tile_y", pa.int64()),
                 ("layer", pa.string()), ("kind", pa.string()),
                 ("geom_px", pa.binary()), ("is_fill", pa.bool_()),
                 ("feature_id", pa.int64()), ("cls", pa.string())]
            ).empty_table()
        cols = {k: [r.get(k) for r in rows] for k in rows[0]}
        return pa.table(cols)

    return (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .map_batches(render, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow",
                     fn_kwargs={"n_buckets": n_buckets})
        .groupby("bucket")
        .map_groups(
            lambda g: make_bucket_assembler(prof)(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
        .select_columns(["z", "tile_x", "tile_y", "n_features"])
    )


def sql_route_tiles_exact() -> str:
    """DuckDB mirror of :func:`route_tiles_exact_ds` — pure BIGINT coverage
    arithmetic (the construction keeps every endpoint >= 44 px from any
    buffered tile boundary) + the float mercator row with mid-tile slack.

    Coverage per zoom: px(z) = x >> (6 - z) is exact (all x offsets are
    multiples of 8); covered columns = floor((px0-4)/256)..floor((px1+4)/256).
    Drop rules mirrored: w%5==1 never survives (2 px chain < 4 px merge
    minimum at z6, 0.25 px < 1 px render gate at z3); w%5==0 survives z6
    only (6 px chain, 0.75 px gated at z3).
    """
    lat_case = " ".join(
        f"WHEN {i} THEN {lat!r}" for i, lat in enumerate(EXACT_LAT_BANDS)
    )
    return f"""
WITH p AS (
    SELECT o_orderkey AS w, o_orderkey % 7 AS a, 1 + (o_orderkey % 3) AS s,
           o_orderkey % 4 AS r, o_orderkey % 3 AS c, o_orderkey % 5 AS knd
    FROM orders
),
seg AS (
    SELECT w, r, c, knd,
           ({EXACT_BASE_COL} + a) * 256 + 48 AS x0,
           CASE WHEN knd = 0 THEN ({EXACT_BASE_COL} + a) * 256 + 54
                WHEN knd = 1 THEN ({EXACT_BASE_COL} + a) * 256 + 50
                ELSE ({EXACT_BASE_COL} + a + s) * 256 - 48 END AS x1
    FROM p
),
act AS (  -- (way, zoom) pairs that survive render gate + merge minimum
    SELECT s.w, s.r, s.c, zs.z,
           s.x0 // zs.d AS px0, s.x1 // zs.d AS px1
    FROM seg s, (VALUES (3, 8), (6, 1)) AS zs(z, d)
    WHERE s.knd >= 2 OR (s.knd = 0 AND zs.z = 6)
),
band AS (
    SELECT r,
           0.5 - 0.25 * ln((1.0 + sin(radians(lat)))
                           / (1.0 - sin(radians(lat)))) / pi() AS wy
    FROM (SELECT r, CASE r {lat_case} END AS lat
          FROM (SELECT DISTINCT r FROM p))
),
hits AS (
    SELECT DISTINCT a.z,
           (a.px0 - 4) // 256 + g.i AS tile_x,
           CAST(floor(b.wy * (1 << a.z)) AS BIGINT) AS tile_y,
           a.c
    FROM act a
    JOIN generate_series(0, 15) AS g(i)
      ON g.i <= (a.px1 + 4) // 256 - (a.px0 - 4) // 256
    JOIN band b ON b.r = a.r
)
SELECT z, tile_x, tile_y, CAST(count(DISTINCT c) AS BIGINT) AS n_features
FROM hits GROUP BY 1, 2, 3
"""


def sql_convex_hull(n_zones: int = 8) -> str:
    """Twin of ``webgeo.q_convex_hull``: the planted hull is exactly the
    parabola ring, so every output is a generate_series closed form —
    points p_t = (t - K, (t - K)^2) ordered by x, shoelace over lag
    pairs plus the closing chord edge 2K^3."""
    return f"""
WITH zs AS (
    SELECT g.i AS zone, 3 + g.i AS K FROM generate_series(0, {n_zones - 1}) g(i)
),
ring AS (
    SELECT z.zone, z.K, t.i - z.K AS x, (t.i - z.K) * (t.i - z.K) AS y
    FROM zs z JOIN generate_series(0, 40) t(i) ON t.i <= 2 * z.K
),
edges AS (
    SELECT zone, K, x, y,
           lag(x) OVER w AS px, lag(y) OVER w AS py
    FROM ring WINDOW w AS (PARTITION BY zone ORDER BY x)
),
shoe AS (
    SELECT zone, K,
           CAST(sum(CASE WHEN px IS NULL THEN 0
                         ELSE px * y - x * py END) AS BIGINT) AS open_sum,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS x_sum,
           CAST(sum(x * y) AS BIGINT) AS xy_sum
    FROM edges GROUP BY 1, 2
)
SELECT zone, n AS n_vertices,
       CAST(abs(open_sum + 2 * K * K * K) AS BIGINT) AS area2x,
       x_sum, xy_sum
FROM shoe
"""

"""OSM-style two-pass source: the way ⋈ node-location shuffle join.

The reference's planet-scale join (``reader/osm/OsmReader.java:534-550``:
~7.5e9 node lookups against a LongLongMap) restated Ray-Data-first as a
**hash-partitioned shuffle join**: both sides get a ``bucket = node_id % B``
column, ``groupby(bucket).map_groups`` joins matching buckets Arrow-natively, and a second ``groupby(way_id)`` regroups joined rows into way
geometries (pass 2's WaySourceFeature assembly).  No shared mutable map —
state becomes data movement, which is what scales on a cluster.

Synthetic OSM-ish world (deterministic, oracle-mirrorable):
  nodes: one per ``part`` row —
    node_id  = p_partkey
    lat_mdeg = (p_partkey * 28657) % 170000 - 85000
    lon_mdeg = (p_partkey * 33461) % 360000 - 180000
  ways: one per ``orders`` row; its node refs are the order's lineitems —
    way_id = l_orderkey, seq = l_linenumber, node ref = l_partkey.

Way "length" is kept in pure integers (sum of squared coordinate deltas in
millidegrees) so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

NODE_LAT_MULT, NODE_LON_MULT = 28657, 33461
# Per-way local anchor for the route-line world (way_lines_ds) — shared with
# the route_zoom_gate oracle mirror (pipelines/routes.py).
WAY_ANCHOR_LAT_MULT, WAY_ANCHOR_LON_MULT = 9176, 7351


def nodes_ds(sf_dir: str) -> ray.data.Dataset:
    def to_nodes(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy().astype(np.int64)
        return pa.table(
            {
                "node_id": pa.array(pk, pa.int64()),
                "lat_mdeg": pa.array((pk * NODE_LAT_MULT) % 170000 - 85000, pa.int64()),
                "lon_mdeg": pa.array((pk * NODE_LON_MULT) % 360000 - 180000, pa.int64()),
            }
        )

    return ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey"]).map_batches(
        to_nodes, batch_format="pyarrow"
    )


def way_refs_ds(sf_dir: str) -> ray.data.Dataset:
    def to_refs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "way_id": batch.column("l_orderkey").cast(pa.int64()),
                "seq": batch.column("l_linenumber").cast(pa.int64()),
                "node_id": batch.column("l_partkey").cast(pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_linenumber", "l_partkey"]
    ).map_batches(to_refs, batch_format="pyarrow")


def join_way_nodes(sf_dir: str, n_buckets: int = 64,
                   nodes: ray.data.Dataset | None = None,
                   refs: ray.data.Dataset | None = None,
                   emit_wbucket: bool = False) -> ray.data.Dataset:
    """The shuffle join: (way_id, seq, node_id) ⋈ (node_id, lat, lon).

    Both sides are tagged with the same hash bucket and unioned with a
    ``side`` marker; one groupby co-locates matching buckets; the group body
    joins Arrow-natively (sort + searchsorted probe of the unique node ids).  (Ray's ``Dataset.join`` exists in recent
    releases; this explicit form keeps the partitioning and skew story
    visible and works on any version.)

    ``nodes``/``refs`` override the synthetic table derivation with real
    decoded sources (e.g. the .osm.pbf reader) in the same column shapes.
    """

    # Narrow overloaded exchange schema (node_id, p, q, bucket, side):
    # refs carry (p=way_id, q=seq), nodes carry (p=lat_mdeg, q=lon_mdeg) —
    # no null-padded columns, side is one int8 — ~40% fewer bytes across
    # the all-to-all than the naive 5-int64 + string-tag union.
    def tag_nodes(batch: pa.Table) -> pa.Table:
        b = batch.column("node_id").to_numpy() % n_buckets
        return pa.table({
            "node_id": batch.column("node_id"),
            "p": batch.column("lat_mdeg"),
            "q": batch.column("lon_mdeg"),
            "bucket": pa.array(b, pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
        })

    def tag_refs(batch: pa.Table) -> pa.Table:
        b = batch.column("node_id").to_numpy() % n_buckets
        return pa.table({
            "node_id": batch.column("node_id"),
            "p": batch.column("way_id"),
            "q": batch.column("seq"),
            "bucket": pa.array(b, pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
        })

    nodes = (nodes if nodes is not None else nodes_ds(sf_dir)).map_batches(
        tag_nodes, batch_format="pyarrow"
    )
    refs = (refs if refs is not None else way_refs_ds(sf_dir)).map_batches(
        tag_refs, batch_format="pyarrow"
    )

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native bucket join (no pandas copies): node ids are unique,
        # so the inner join is one sort + searchsorted probe
        import pyarrow.compute as pc

        m_n = pc.equal(g.column("side"), 0)
        nodes_t = g.filter(m_n)
        ways_t = g.filter(pc.invert(m_n))
        nid = nodes_t.column("node_id").to_numpy()
        if len(nid) == 0 or ways_t.num_rows == 0:
            cols = ["way_id", "seq", "node_id", "lat_mdeg", "lon_mdeg"]
            if emit_wbucket:
                cols.append("wbucket")
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        lat_s = nodes_t.column("p").to_numpy()[order]
        lon_s = nodes_t.column("q").to_numpy()[order]
        wnid = ways_t.column("node_id").to_numpy()
        pos = np.searchsorted(nid_s, wnid)
        pos_c = np.minimum(pos, len(nid_s) - 1)
        ok = (pos < len(nid_s)) & (nid_s[pos_c] == wnid)
        hit = np.flatnonzero(ok)
        out = pa.table(
            {
                "way_id": ways_t.column("p").take(pa.array(hit)),
                "seq": ways_t.column("q").take(pa.array(hit)),
                "node_id": pa.array(wnid[hit], pa.int64()),
                "lat_mdeg": pa.array(lat_s[pos[hit]], pa.int64()),
                "lon_mdeg": pa.array(lon_s[pos[hit]], pa.int64()),
            }
        )
        if emit_wbucket:
            # fused second-shuffle key: saves the downstream full-pass
            # map_batches that every way-regroup consumer used to run
            out = out.append_column(
                "wbucket",
                pa.array(out.column("way_id").to_numpy() % n_buckets,
                         pa.int64()))
        return out

    return nodes.union(refs).groupby("bucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )


def _node_store_handle(sf_dir: str):
    """Broadcast node-coordinate store (the OsmReader pass-2 LongLongMap
    shape, ``reader/osm/OsmReader.java:534-550`` probed in-memory): sorted
    (node_id, lat, lon) arrays ``ray.put`` once."""
    nd = nodes_ds(sf_dir).to_pandas()
    nid = nd["node_id"].to_numpy()
    o = np.argsort(nid, kind="stable")
    return ray.put((nid[o], nd["lat_mdeg"].to_numpy()[o],
                    nd["lon_mdeg"].to_numpy()[o]))


def joined_way_rows(sf_dir: str, n_buckets: int = 64,
                    node_broadcast_max: int = 100_000_000) -> ray.data.Dataset:
    """(way_id, seq, node_id, lat_mdeg, lon_mdeg, wbucket) rows ready for a
    ``groupby("wbucket")`` regroup — ONE exchange end-to-end when the node
    table fits the broadcast store budget (coords looked up while the refs
    stream, the reference's in-memory node-store discipline), else the
    two-exchange ``join_way_nodes`` path.  Callers that exist to showcase
    the shuffle join itself (``assemble_ways``, the pbf pipeline) keep
    calling ``join_way_nodes`` directly."""
    import pyarrow.parquet as pq2

    n_node_rows = pq2.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_node_rows > node_broadcast_max:
        return join_way_nodes(sf_dir, n_buckets, emit_wbucket=True)
    store = _node_store_handle(sf_dir)

    def lookup(batch: pa.Table) -> pa.Table:
        nid_s, lat_s, lon_s = ray.get(store)
        refs_nid = batch.column("node_id").to_numpy()
        pos = np.searchsorted(nid_s, refs_nid)
        pos_c = np.minimum(pos, len(nid_s) - 1)
        ok = (pos < len(nid_s)) & (nid_s[pos_c] == refs_nid)
        hit = np.flatnonzero(ok)
        wid = batch.column("way_id").to_numpy()[hit]
        return pa.table({
            "way_id": pa.array(wid, pa.int64()),
            "seq": batch.column("seq").take(pa.array(hit)),
            "node_id": pa.array(refs_nid[hit], pa.int64()),
            "lat_mdeg": pa.array(lat_s[pos_c[hit]], pa.int64()),
            "lon_mdeg": pa.array(lon_s[pos_c[hit]], pa.int64()),
            "wbucket": pa.array(wid % n_buckets, pa.int64()),
        })

    return way_refs_ds(sf_dir).map_batches(lookup, batch_format="pyarrow")


def assemble_ways(sf_dir: str, n_buckets: int = 64,
                  joined: ray.data.Dataset | None = None) -> ray.data.Dataset:
    """Pass 2: regroup joined rows by way_id -> per-way geometry summary.

    Output (all exact ints): way_id, n_nodes, len2_sum (Σ squared deltas in
    mdeg²), first/last node ids — the assembled-way oracle row.

    Grouped by a way-id BUCKET (not per way) so each map_groups call
    processes thousands of ways with one lexsort + reduceat — the per-tiny-group
    overhead lesson from the tile assembler applied to the way regroup.
    """

    def add_wbucket(batch: pa.Table) -> pa.Table:
        b = batch.column("way_id").to_numpy() % n_buckets
        return batch.append_column("wbucket", pa.array(b, pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native: one lexsort + run boundaries + reduceat (no pandas
        # groupby over per-way micro-groups, no pandas block schemas in the
        # shuffle)
        wid = g.column("way_id").to_numpy()
        lat = g.column("lat_mdeg").to_numpy()
        lon = g.column("lon_mdeg").to_numpy()
        nid = g.column("node_id").to_numpy()
        order = np.lexsort((nid, g.column("seq").to_numpy(), wid))
        wid, lat, lon, nid = wid[order], lat[order], lon[order], nid[order]
        same = np.concatenate([[False], wid[1:] == wid[:-1]])
        dlat = np.diff(lat, prepend=lat[:1])
        dlon = np.diff(lon, prepend=lon[:1])
        d2 = np.where(same, dlat * dlat + dlon * dlon, 0)
        starts = np.flatnonzero(~same)
        ends = np.append(starts[1:], len(wid))
        return pa.table(
            {
                "way_id": pa.array(wid[starts], pa.int64()),
                "n_nodes": pa.array(ends - starts, pa.int64()),
                "len2_sum": pa.array(np.add.reduceat(d2, starts), pa.int64()),
                "first_node": pa.array(nid[starts], pa.int64()),
                "last_node": pa.array(nid[ends - 1], pa.int64()),
            }
        )

    return (
        (joined.map_batches(add_wbucket, batch_format="pyarrow")
         if joined is not None
         else join_way_nodes(sf_dir, n_buckets, emit_wbucket=True))
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
    )


def way_lines_ds(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Assembled way geometries as lon/lat WKB linestrings (for the roads
    layer of the tiling demo)."""
    from ..geo import wkb

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(["way_id", "seq", "node_id"])
        wid = g["way_id"].to_numpy()
        # LOCAL geometry: a way is a road-scale line near a per-way anchor
        # (raw node coords are world-scattered, which would make every way an
        # intercontinental bbox — unrealistic and clipping-hostile).  The
        # anchor comes from way_id, node offsets (±1 deg) from the node
        # coords, all deterministic integers.
        base_lat = (wid * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
        base_lon = (wid * WAY_ANCHOR_LON_MULT) % 350000 - 175000
        lat = (base_lat + (g["lat_mdeg"].to_numpy() % 2000) - 1000) / 1000.0
        lon = (base_lon + (g["lon_mdeg"].to_numpy() % 2000) - 1000) / 1000.0
        bounds = np.flatnonzero(np.diff(wid)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(wid)]])
        lens = ends - starts
        ok = lens >= 2  # degenerate 1-node ways dropped
        keep_runs = np.repeat(ok, lens)
        coords = np.column_stack([lon[keep_runs], lat[keep_runs]])
        blobs = wkb.encode_linestrings_arrow(coords, lens[ok])
        return pa.table(
            {
                "way_id": pa.array(wid[starts[ok]], pa.int64()),
                "geom_wkb": blobs,
                "n_nodes": pa.array(lens[ok], pa.int64()),
            }
        )

    return (
        join_way_nodes(sf_dir, n_buckets, emit_wbucket=True)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop(columns=["wbucket"])),
                    batch_format="pandas")
    )


def route_mileage(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Way mileage per admin zone: Manhattan segment length (|dlat|+|dlon|
    in integer mdeg — exact, no sqrt) of every way segment, attributed to
    the admin box of the segment's FIRST endpoint (pure-arithmetic grid
    assignment, no PIP needed for the rect grid).  The "road km per
    region" rollup.

    Scale shape: the way⋈node join (ONE bucketed shuffle), way-bucket
    regroup, vectorized consecutive-diff per bucket, per-bucket partial
    (admin, len) sums -> ONE tiny groupby-sum (<= 25 rows).
    Output: (admin_id, manhattan_mdeg, n_segments).
    """
    from ray.data.aggregate import Sum

    def per_bucket(g: pa.Table) -> pa.Table:
        wid = g.column("way_id").to_numpy()
        seq = g.column("seq").to_numpy()
        nid = g.column("node_id").to_numpy()
        lat = g.column("lat_mdeg").to_numpy()
        lon = g.column("lon_mdeg").to_numpy()
        order = np.lexsort((nid, seq, wid))
        w, la, lo = wid[order], lat[order], lon[order]
        same = w[1:] == w[:-1]
        dlat = np.abs(np.diff(la))[same]
        dlon = np.abs(np.diff(lo))[same]
        plat, plon = la[:-1][same], lo[:-1][same]
        col = np.floor((plon / 1000.0 + 180.0005) / 72.0).astype(np.int64)
        row = np.floor((plat / 1000.0 + 85.0005) / 34.0).astype(np.int64)
        admin = row * 5 + col
        mlen = dlat + dlon
        u, inv = np.unique(admin, return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        cnts = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, mlen)
        np.add.at(cnts, inv, 1)
        return pa.table({
            "admin_id": pa.array(u, pa.int64()),
            "len_part": pa.array(sums, pa.int64()),
            "n_part": pa.array(cnts, pa.int64()),
        })

    return (
        joined_way_rows(sf_dir, n_buckets)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
        .groupby("admin_id")
        .aggregate(Sum("len_part", alias_name="manhattan_mdeg"),
                   Sum("n_part", alias_name="n_segments"))
    )


def haversine_mileage(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Great-circle way mileage per admin zone — the spherical companion of
    :func:`route_mileage` and the query-level parity surface for the
    reference's ``WithGeometry.lengthMeters`` (``geo/WithGeometry.java``):
    per way segment, floor(haversine meters, R=6371000), attributed to the
    segment's first endpoint's admin box.

    The trig chain (radians -> sin/cos -> asin -> sqrt -> floor) is
    mirrored operand-for-operand in SQL; numpy and DuckDB libm agree
    bit-for-bit (validated 0/20000 mismatches on random segments — the
    same finding that let the S2 oracle pin its trig chain).  floor() per
    SEGMENT keeps every aggregate integer-exact.

    Scale shape: identical to ``route_mileage`` — the ONE bucketed
    way⋈node join shuffle, per-bucket vectorized consecutive-diff +
    haversine, per-bucket (admin, meters) partials, tiny final groupby.
    """
    from ray.data.aggregate import Sum

    def per_bucket(g: pa.Table) -> pa.Table:
        wid = g.column("way_id").to_numpy()
        seq = g.column("seq").to_numpy()
        nid = g.column("node_id").to_numpy()
        lat = g.column("lat_mdeg").to_numpy()
        lon = g.column("lon_mdeg").to_numpy()
        order = np.lexsort((nid, seq, wid))
        w, la, lo = wid[order], lat[order], lon[order]
        same = w[1:] == w[:-1]
        la1 = la[:-1][same] / 1000.0
        la2 = la[1:][same] / 1000.0
        lo1 = lo[:-1][same] / 1000.0
        lo2 = lo[1:][same] / 1000.0
        dp = np.radians(la2 - la1)
        dl = np.radians(lo2 - lo1)
        a = (np.sin(dp / 2.0) ** 2
             + np.cos(np.radians(la1)) * np.cos(np.radians(la2))
             * np.sin(dl / 2.0) ** 2)
        m = np.floor(6371000.0 * (2.0 * np.arcsin(np.sqrt(a)))).astype(np.int64)
        col = np.floor((lo1 + 180.0005) / 72.0).astype(np.int64)
        row = np.floor((la1 + 85.0005) / 34.0).astype(np.int64)
        admin = row * 5 + col
        u, inv = np.unique(admin, return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        cnts = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, m)
        np.add.at(cnts, inv, 1)
        return pa.table({
            "admin_id": pa.array(u, pa.int64()),
            "m_part": pa.array(sums, pa.int64()),
            "n_part": pa.array(cnts, pa.int64()),
        })

    return (
        joined_way_rows(sf_dir, n_buckets)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
        .groupby("admin_id")
        .aggregate(Sum("m_part", alias_name="gc_meters"),
                   Sum("n_part", alias_name="n_segments"))
    )


def sql_haversine_mileage() -> str:
    """Twin of :func:`haversine_mileage`: the same lag-window deltas with
    the haversine chain mirrored operand-for-operand (floor per segment)."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
deltas AS (
    SELECT way_id,
           lat_mdeg / 1000.0 AS la2, lon_mdeg / 1000.0 AS lo2,
           lag(lat_mdeg) OVER w / 1000.0 AS la1,
           lag(lon_mdeg) OVER w / 1000.0 AS lo1
    FROM joined
    WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
),
seg AS (
    SELECT CAST(floor((la1 + 85.0005) / 34.0) AS BIGINT) * 5
             + CAST(floor((lo1 + 180.0005) / 72.0) AS BIGINT) AS admin_id,
           CAST(floor(6371000.0 * (2.0 * asin(sqrt(
               pow(sin(radians(la2 - la1) / 2.0), 2)
               + cos(radians(la1)) * cos(radians(la2))
               * pow(sin(radians(lo2 - lo1) / 2.0), 2))))) AS BIGINT) AS m
    FROM deltas WHERE la1 IS NOT NULL)
SELECT admin_id, CAST(sum(m) AS BIGINT) AS gc_meters,
       count(*) AS n_segments
FROM seg GROUP BY 1
"""


def sql_route_mileage() -> str:
    """Twin of :func:`route_mileage`: the lag-window deltas with the same
    arithmetic grid assignment of the segment's first endpoint."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
deltas AS (
    SELECT way_id,
           lat_mdeg - lag(lat_mdeg) OVER w AS dlat,
           lon_mdeg - lag(lon_mdeg) OVER w AS dlon,
           lag(lat_mdeg) OVER w AS plat,
           lag(lon_mdeg) OVER w AS plon
    FROM joined
    WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
),
seg AS (
    SELECT CAST(floor((plat / 1000.0 + 85.0005) / 34.0) AS BIGINT) * 5
             + CAST(floor((plon / 1000.0 + 180.0005) / 72.0) AS BIGINT)
             AS admin_id,
           abs(dlat) + abs(dlon) AS mlen
    FROM deltas WHERE dlat IS NOT NULL)
SELECT admin_id, CAST(sum(mlen) AS BIGINT) AS manhattan_mdeg,
       count(*) AS n_segments
FROM seg GROUP BY 1 ORDER BY 1
"""


def sql_way_assembly() -> str:
    """DuckDB oracle for :func:`assemble_ways` (exact integer arithmetic)."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
deltas AS (
    SELECT way_id, seq, node_id, lat_mdeg, lon_mdeg,
           lat_mdeg - lag(lat_mdeg) OVER w AS dlat,
           lon_mdeg - lag(lon_mdeg) OVER w AS dlon,
           first_value(node_id) OVER w AS first_node,
           last_value(node_id) OVER (PARTITION BY way_id ORDER BY seq, node_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_node
    FROM joined WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
)
SELECT way_id,
       count(*) AS n_nodes,
       CAST(COALESCE(sum(dlat * dlat + dlon * dlon), 0) AS BIGINT) AS len2_sum,
       min(first_node) AS first_node,
       min(last_node) AS last_node
FROM deltas GROUP BY way_id
"""


# --------------------------------------- planar overlay / map matching ------
#
# Both operators run over the LOCAL-world way segments (the road-scale
# geometry of ``way_lines_ds``: per-way anchor + node offsets within
# +-1000 mdeg, all integers) — raw node coords are world-scattered, which
# would make every segment an intercontinental chord.  The grid exchange
# key is a SEG_CELL-pitch cell: a segment is assigned to every cell its
# bbox (expanded by the search radius, for map matching) touches, so any
# geometrically-interacting pair is guaranteed to share a cell — the same
# cover argument ``geo/pip.py`` uses, restated as data movement.

SEG_CELL = 2000          # grid pitch (mdeg) == max per-axis segment span
MATCH_R = 1000           # map-match search radius (mdeg)
PROBE_X_MULT, PROBE_Y_MULT = 131, 173


def _local_segments(g: pa.Table):
    """Local-world segments from a way-bucket group: sort (way, seq, node),
    consecutive same-way pairs; returns int64 arrays
    (way_id, rank-of-first-endpoint, x1, y1, x2, y2), zero-length dropped.
    The segment key is the 0-based ROW RANK within the way (not the raw
    seq — l_linenumber can repeat per order), so keys are unique by
    construction; the SQL twin mirrors it as ``row_number() OVER w``."""
    wid = g.column("way_id").to_numpy()
    seq = g.column("seq").to_numpy()
    nid = g.column("node_id").to_numpy()
    lat = g.column("lat_mdeg").to_numpy()
    lon = g.column("lon_mdeg").to_numpy()
    order = np.lexsort((nid, seq, wid))
    w = wid[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
    counts = np.diff(np.concatenate([starts, [len(w)]]))
    s = np.arange(len(w), dtype=np.int64) - np.repeat(starts, counts)
    base_y = (w * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
    base_x = (w * WAY_ANCHOR_LON_MULT) % 350000 - 175000
    y = base_y + (lat[order] % 2000) - 1000
    x = base_x + (lon[order] % 2000) - 1000
    same = w[1:] == w[:-1]
    x1, y1 = x[:-1][same], y[:-1][same]
    x2, y2 = x[1:][same], y[1:][same]
    keep = (x1 != x2) | (y1 != y2)
    return (w[:-1][same][keep], s[:-1][same][keep],
            x1[keep], y1[keep], x2[keep], y2[keep])


def _cell_ids(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cy + 64) * 512 + (cx + 256)


def segment_crossings(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Planar-overlay crossing detection (the ST_Intersects/ST_Crosses
    line-line join — road crossings, conflation QA): every pair of
    segments from DIFFERENT ways that properly cross (strict integer
    orientation tests: ``o(p1,p2,q1)*o(p1,p2,q2) < 0`` both ways — exact,
    no epsilon).

    Scale shape: way⋈node join (ONE bucketed shuffle) -> per-bucket local
    segments, each emitted to the <=4 SEG_CELL grid cells its bbox touches
    -> ``groupby(cell)`` co-locates every potentially-crossing pair (a
    crossing point lies in some cell; both bboxes cover it) -> vectorized
    block-pairwise orientation tests inside the cell body -> one tiny
    (way_a, seq_a, way_b, seq_b) groupby dedups multi-cell pairs.  Cross
    products are bounded by the local span (<= 2e14) — exact int64.
    Output: (way_a, seq_a, way_b, seq_b), way_a < way_b.
    """

    n_cbuckets = max(n_buckets, 1)

    def emit_cells(g: pa.Table) -> pa.Table:
        w, s, x1, y1, x2, y2 = _local_segments(g)
        cx_lo = np.minimum(x1, x2) // SEG_CELL
        cx_hi = np.maximum(x1, x2) // SEG_CELL
        cy_lo = np.minimum(y1, y2) // SEG_CELL
        cy_hi = np.maximum(y1, y2) // SEG_CELL
        outs = []
        for dx in (0, 1):
            for dy in (0, 1):
                cx = cx_lo + dx
                cy = cy_lo + dy
                m = (cx <= cx_hi) & (cy <= cy_hi)
                outs.append((_cell_ids(cx[m], cy[m]), w[m], s[m],
                             x1[m], y1[m], x2[m], y2[m]))
        cell = np.concatenate([o[0] for o in outs])
        return pa.table({
            # cells hash-bucketed so each exchange partition carries
            # THOUSANDS of cells (one group call per bucket, not per cell
            # — the repo's standard tiny-group fix)
            "cb": pa.array(cell % n_cbuckets, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "way_id": pa.array(np.concatenate([o[1] for o in outs]), pa.int64()),
            "seq": pa.array(np.concatenate([o[2] for o in outs]), pa.int64()),
            "x1": pa.array(np.concatenate([o[3] for o in outs]), pa.int64()),
            "y1": pa.array(np.concatenate([o[4] for o in outs]), pa.int64()),
            "x2": pa.array(np.concatenate([o[5] for o in outs]), pa.int64()),
            "y2": pa.array(np.concatenate([o[6] for o in outs]), pa.int64()),
        })

    def cross_in_bucket(g: pa.Table) -> pa.Table:
        empty = {
            "way_a": pa.array([], pa.int64()),
            "seq_a": pa.array([], pa.int64()),
            "way_b": pa.array([], pa.int64()),
            "seq_b": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(empty)
        cell = g.column("cell").to_numpy()
        order = np.argsort(cell, kind="stable")
        cell = cell[order]
        w = g.column("way_id").to_numpy()[order]
        s = g.column("seq").to_numpy()[order]
        x1 = g.column("x1").to_numpy()[order]
        y1 = g.column("y1").to_numpy()[order]
        x2 = g.column("x2").to_numpy()[order]
        y2 = g.column("y2").to_numpy()[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cell)) + 1,
                                 [len(cell)]])
        wa, sa, wb, sb = [], [], [], []
        for k in range(len(starts) - 1):
            lo, hi = starts[k], starts[k + 1]
            n = hi - lo
            if n < 2:
                continue
            # bounded-memory: pair blocks of rows against all later rows
            # (one vectorized orientation pass per block; a hot cell never
            # materializes its full n^2 upper triangle at once)
            for blo in range(lo, hi - 1, 512):
                bhi = min(blo + 512, hi - 1)
                i = np.arange(blo, bhi)[:, None]
                j = np.arange(blo + 1, hi)[None, :]
                dxi, dyi = x2[i] - x1[i], y2[i] - y1[i]
                o1 = dxi * (y1[j] - y1[i]) - dyi * (x1[j] - x1[i])
                o2 = dxi * (y2[j] - y1[i]) - dyi * (x2[j] - x1[i])
                dxj, dyj = x2[j] - x1[j], y2[j] - y1[j]
                o3 = dxj * (y1[i] - y1[j]) - dyj * (x1[i] - x1[j])
                o4 = dxj * (y2[i] - y1[j]) - dyj * (x2[i] - x1[j])
                hit = ((j > i) & (w[i] != w[j])
                       & (o1 * o2 < 0) & (o3 * o4 < 0))
                bi, bj = np.nonzero(hit)
                ii = bi + blo
                jj = bj + blo + 1
                # reference-cell dedup: a pair is claimed ONLY by the
                # minimum cell both segments cover, so every crossing is
                # emitted exactly once globally — no dedup exchange needed
                ref_cx = np.maximum(
                    np.minimum(x1[ii], x2[ii]) // SEG_CELL,
                    np.minimum(x1[jj], x2[jj]) // SEG_CELL)
                ref_cy = np.maximum(
                    np.minimum(y1[ii], y2[ii]) // SEG_CELL,
                    np.minimum(y1[jj], y2[jj]) // SEG_CELL)
                mine = _cell_ids(ref_cx, ref_cy) == cell[lo]
                ii, jj = ii[mine], jj[mine]
                a_first = w[ii] < w[jj]
                wa.append(np.where(a_first, w[ii], w[jj]))
                sa.append(np.where(a_first, s[ii], s[jj]))
                wb.append(np.where(a_first, w[jj], w[ii]))
                sb.append(np.where(a_first, s[jj], s[ii]))
        if not wa:
            return pa.table(empty)
        # key uniqueness: the reference-cell rule makes every GEOMETRIC
        # pair unique; distinct (way, seq) KEY pairs can still repeat when
        # l_linenumber duplicates give two segments the same key — one
        # tiny in-body unique pass keeps the output key-distinct
        pairs = np.stack([np.concatenate(wa), np.concatenate(sa),
                          np.concatenate(wb), np.concatenate(sb)])
        pairs = np.unique(pairs, axis=1)
        return pa.table({
            "way_a": pa.array(pairs[0], pa.int64()),
            "seq_a": pa.array(pairs[1], pa.int64()),
            "way_b": pa.array(pairs[2], pa.int64()),
            "seq_b": pa.array(pairs[3], pa.int64()),
        })

    return (
        joined_way_rows(sf_dir, n_buckets)
        .groupby("wbucket")
        .map_groups(lambda g: emit_cells(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
        .groupby("cb")
        .map_groups(lambda g: cross_in_bucket(g.drop_columns(["cb"])),
                    batch_format="pyarrow")
    )


_SEG_CTE = f"""
joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
pts AS (
    SELECT way_id, seq, node_id,
           CAST((way_id * {WAY_ANCHOR_LAT_MULT}) % 160000 - 80000
             + ((lat_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS y,
           CAST((way_id * {WAY_ANCHOR_LON_MULT}) % 350000 - 175000
             + ((lon_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS x
    FROM joined
),
seg AS (
    -- segment key = 0-based rank of the FIRST endpoint within the way
    -- (row_number - 2 on the second-endpoint row); one shared WINDOW so
    -- rank and lag see the identical ordering even on full ties
    SELECT * FROM (
        SELECT way_id,
               row_number() OVER w - 2 AS seq,
               lag(x) OVER w AS x1, lag(y) OVER w AS y1,
               x AS x2, y AS y2
        FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
    ) WHERE x1 IS NOT NULL AND NOT (x1 = x2 AND y1 = y2)
)"""


def _fdiv(expr: str) -> str:
    """Floor division by SEG_CELL mirroring numpy ``//`` (DuckDB's ``//``
    truncates toward zero on negatives; floor(x/2000.0) is exact here —
    |x| <= ~2e5, quotients never within an ulp of an integer boundary
    unless exactly on it)."""
    return f"CAST(floor(({expr}) / {SEG_CELL}.0) AS BIGINT)"


def sql_segment_crossings() -> str:
    """Twin of :func:`segment_crossings`: the same cell cover join with the
    strict integer orientation predicates, DISTINCT over multi-cell pairs."""
    return f"""
WITH {_SEG_CTE},
cells AS (
    SELECT s.*, ({_fdiv('least(y1, y2)')} + gy.g + 64) * 512
              + ({_fdiv('least(x1, x2)')} + gx.g + 256) AS cell
    FROM seg s
    CROSS JOIN (SELECT unnest([0, 1]) AS g) gx
    CROSS JOIN (SELECT unnest([0, 1]) AS g) gy
    WHERE {_fdiv('least(x1, x2)')} + gx.g <= {_fdiv('greatest(x1, x2)')}
      AND {_fdiv('least(y1, y2)')} + gy.g <= {_fdiv('greatest(y1, y2)')}
)
SELECT DISTINCT
    a.way_id AS way_a, a.seq AS seq_a, b.way_id AS way_b, b.seq AS seq_b
FROM cells a JOIN cells b ON a.cell = b.cell AND a.way_id < b.way_id
WHERE ((a.x2 - a.x1) * (b.y1 - a.y1) - (a.y2 - a.y1) * (b.x1 - a.x1))
    * ((a.x2 - a.x1) * (b.y2 - a.y1) - (a.y2 - a.y1) * (b.x2 - a.x1)) < 0
  AND ((b.x2 - b.x1) * (a.y1 - b.y1) - (b.y2 - b.y1) * (a.x1 - b.x1))
    * ((b.x2 - b.x1) * (a.y2 - b.y1) - (b.y2 - b.y1) * (a.x2 - b.x1)) < 0
ORDER BY 1, 2, 3, 4
"""


VW_AREA2_MIN = 500000  # 2x-triangle-area keep threshold (mdeg^2)


def vw_simplify_census(sf_dir: str, n_buckets: int = 64,
                       area2_min: int = VW_AREA2_MIN) -> ray.data.Dataset:
    """One PARALLEL Visvalingam-Whyatt simplification round over every
    assembled local-world way (the reference's VW simplifier —
    ``geo/VisvalingamWhyatt.java`` — restated as its data-parallel
    variant: all interior vertices whose doubled effective triangle area
    ``|cross(prev->v, prev->next)|`` falls below the threshold drop in one
    pass, instead of one-at-a-time heap order; the shoelace stays in exact
    int64, so the census has a bitwise SQL twin).

    Scale shape: the ONE way⋈node bucketed join shuffle, then a purely
    vectorized lag/lead pass per bucket (run boundaries via
    ``np.flatnonzero(diff)``), partials are final (each way lives in one
    bucket).  Output per way (>= 2 nodes):
    (way_id, n_nodes, n_kept, removed_area2) — endpoints always kept.
    """

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "way_id": pa.array([], pa.int64()),
                "n_nodes": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
                "removed_area2": pa.array([], pa.int64()),
            })
        wid = g.column("way_id").to_numpy()
        seq = g.column("seq").to_numpy()
        nid = g.column("node_id").to_numpy()
        lat = g.column("lat_mdeg").to_numpy()
        lon = g.column("lon_mdeg").to_numpy()
        order = np.lexsort((nid, seq, wid))
        w = wid[order]
        base_y = (w * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
        base_x = (w * WAY_ANCHOR_LON_MULT) % 350000 - 175000
        y = base_y + (lat[order] % 2000) - 1000
        x = base_x + (lon[order] % 2000) - 1000
        # interior vertices: previous and next row belong to the same way
        interior = np.zeros(len(w), bool)
        if len(w) >= 3:
            interior[1:-1] = (w[2:] == w[1:-1]) & (w[:-2] == w[1:-1])
        area2 = np.zeros(len(w), np.int64)
        ii = np.flatnonzero(interior)
        if len(ii):
            px, py = x[ii - 1], y[ii - 1]
            nx_, ny_ = x[ii + 1], y[ii + 1]
            area2[ii] = np.abs((x[ii] - px) * (ny_ - py)
                               - (nx_ - px) * (y[ii] - py))
        removed = interior & (area2 < area2_min)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(w)) + 1])
        counts = np.diff(np.concatenate([starts, [len(w)]]))
        ok = counts >= 2  # single-node ways dropped (no geometry)
        rem_cnt = np.add.reduceat(removed.astype(np.int64), starts)
        rem_a2 = np.add.reduceat(np.where(removed, area2, 0), starts)
        return pa.table({
            "way_id": pa.array(w[starts[ok]], pa.int64()),
            "n_nodes": pa.array(counts[ok], pa.int64()),
            "n_kept": pa.array(counts[ok] - rem_cnt[ok], pa.int64()),
            "removed_area2": pa.array(rem_a2[ok], pa.int64()),
        })

    return (
        join_way_nodes(sf_dir, n_buckets, emit_wbucket=True)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
    )


def sql_vw_simplify_census(area2_min: int = VW_AREA2_MIN) -> str:
    """Twin of :func:`vw_simplify_census`: lag/lead windows over the local
    points, exact integer doubled triangle area."""
    return f"""
WITH {_SEG_CTE},
tri AS (
    SELECT way_id,
           lag(x) OVER w AS px, lag(y) OVER w AS py,
           x, y,
           lead(x) OVER w AS nx, lead(y) OVER w AS ny
    FROM pts WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
),
marked AS (
    SELECT way_id,
           CASE WHEN px IS NULL OR nx IS NULL THEN NULL
                ELSE abs((x - px) * (ny - py) - (nx - px) * (y - py))
           END AS area2
    FROM tri
)
SELECT way_id,
       count(*) AS n_nodes,
       CAST(count(*) - sum(CASE WHEN area2 IS NOT NULL
                  AND area2 < {area2_min} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(coalesce(sum(CASE WHEN area2 IS NOT NULL
                  AND area2 < {area2_min} THEN area2 END), 0) AS BIGINT)
           AS removed_area2
FROM marked GROUP BY way_id HAVING count(*) >= 2 ORDER BY 1
"""


MM_CELL = 4000  # fused map-match pitch: a way's R-expanded reach spans
#                 anchor +-2000 (local +-1000 + MATCH_R), exactly one
#                 MM_CELL — so the anchor box covers a FIXED 2x2 cell block


def map_match(sf_dir: str, n_buckets: int = 64,
              node_broadcast_max: int = 100_000_000) -> ray.data.Dataset:
    """GPS map matching (nearest-road-segment join within a search radius
    — the trajectory-snapping primitive): one deterministic probe point
    per way (anchor + hash offset), matched to the nearest segment within
    ``MATCH_R`` mdeg, ties broken by (way_id, seq).

    Distance is the true point-to-segment distance: the clamped projection
    ``t = clamp(dot/L2, 0, 1)`` chain runs in float64 mirrored
    operand-for-operand in the SQL twin (ints in, one division, floor out
    — the haversine-oracle discipline), compared on ``floor(d2)``.

    Scale shape (the r5 fusion): a way's whole local world lives within
    +-1000 mdeg of an anchor that is a pure function of way_id, so the set
    of MM_CELL cells its R-expanded geometry can touch is the FIXED 2x2
    block around the anchor — known before any geometry is assembled.
    Way rows therefore go straight to the cell exchange (4 copies each, no
    intermediate way-regroup barrier); the cell body assembles per-way
    segments AND matches probes in one pass.  Each way's rows are complete
    within every cell it covers, so segment ranks are globally correct;
    each probe lives in exactly one cell and any segment within R covers
    that cell — the join is EXACT and needs no dedup exchange.

    Node coordinates: when the node table fits the reference's in-memory
    node store budget (``OsmReader.java`` pass-2 LongLongMap — the planet
    runs with an ~8 GB array store), coords are a BROADCAST sorted-array
    lookup probed while the refs stream (``node_broadcast_max`` rows,
    ``ray.put`` once), making the whole operator ONE cell exchange; above
    the budget it falls back to the ``join_way_nodes`` exchange feeding
    the same cell exchange (two exchanges, no driver state).
    Output: (probe_id, way_id, seq, d2_floor).
    """

    def tag_ways(batch: pa.Table) -> pa.Table:
        wid = batch.column("way_id").to_numpy()
        ax = (wid * WAY_ANCHOR_LON_MULT) % 350000 - 175000
        ay = (wid * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
        cx_lo = (ax - 2000) // MM_CELL
        cy_lo = (ay - 2000) // MM_CELL
        cell = np.concatenate([_cell_ids(cx_lo + dx, cy_lo + dy)
                               for dx in (0, 1) for dy in (0, 1)])
        # packed exchange payload (25% fewer bytes across the all-to-all):
        # p = seq:node_id (order-preserving — seq < 2^15, node_id < 2^48),
        # q = local x:y (each fits +-2^20 after the anchor fold)
        seq = batch.column("seq").to_numpy()
        nid = batch.column("node_id").to_numpy()
        y = ay + (batch.column("lat_mdeg").to_numpy() % 2000) - 1000
        x = ax + (batch.column("lon_mdeg").to_numpy() % 2000) - 1000
        pk = (seq << 48) + nid
        xy = ((x + (1 << 20)) << 21) + (y + (1 << 20))
        n = len(cell)
        return pa.table({
            "cb": pa.array(cell % n_buckets, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.zeros(n, np.int8), pa.int8()),
            "wid": pa.array(np.tile(wid, 4), pa.int64()),
            "p": pa.array(np.tile(pk, 4), pa.int64()),
            "q": pa.array(np.tile(xy, 4), pa.int64()),
        })

    def emit_probes(batch: pa.Table) -> pa.Table:
        wid = batch.column("o_orderkey").to_numpy().astype(np.int64)
        py = ((wid * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
              + (wid * PROBE_Y_MULT) % 1600 - 800)
        px = ((wid * WAY_ANCHOR_LON_MULT) % 350000 - 175000
              + (wid * PROBE_X_MULT) % 1600 - 800)
        n = len(wid)
        cell = _cell_ids(px // MM_CELL, py // MM_CELL)
        return pa.table({
            "cb": pa.array(cell % n_buckets, pa.int64()),
            "cell": pa.array(cell, pa.int64()),
            "side": pa.array(np.ones(n, np.int8), pa.int8()),
            "wid": pa.array(wid, pa.int64()),   # probe_id
            "p": pa.array(px, pa.int64()),
            "q": pa.array(py, pa.int64()),
        })

    def match_in_bucket(g: pa.Table) -> pa.Table:
        empty = pa.table({
            "probe_id": pa.array([], pa.int64()),
            "way_id": pa.array([], pa.int64()),
            "seq": pa.array([], pa.int64()),
            "d2_floor": pa.array([], pa.int64()),
        })
        if g.num_rows == 0:
            return empty
        side_all = g.column("side").to_numpy()
        cell_all = g.column("cell").to_numpy()
        is_way = side_all == 0

        # assemble segments for ALL (cell, way) runs with one lexsort —
        # each cell holds complete copies of its ways, so within-run row
        # rank == global segment rank; p/q unpack to (seq, node_id)/(x, y)
        wcell = cell_all[is_way]
        wwid = g.column("wid").to_numpy()[is_way]
        wpk = g.column("p").to_numpy()[is_way]
        wxy = g.column("q").to_numpy()[is_way]
        order = np.lexsort((wpk, wwid, wcell))
        wcell, w = wcell[order], wwid[order]
        nw = len(w)
        if nw:
            newrun = np.ones(nw, dtype=bool)
            newrun[1:] = (w[1:] != w[:-1]) | (wcell[1:] != wcell[:-1])
            rstarts = np.flatnonzero(newrun)
            rcounts = np.diff(np.append(rstarts, nw))
            s = np.arange(nw, dtype=np.int64) - np.repeat(rstarts, rcounts)
            xy = wxy[order]
            x = (xy >> 21) - (1 << 20)
            y = (xy & ((1 << 21) - 1)) - (1 << 20)
            same = (w[1:] == w[:-1]) & (wcell[1:] == wcell[:-1])
            x1s, y1s = x[:-1][same], y[:-1][same]
            x2s, y2s = x[1:][same], y[1:][same]
            keep = (x1s != x2s) | (y1s != y2s)
            scell = wcell[:-1][same][keep]
            sw, ss = w[:-1][same][keep], s[:-1][same][keep]
            x1s, y1s = x1s[keep], y1s[keep]
            x2s, y2s = x2s[keep], y2s[keep]
        else:
            scell = sw = ss = x1s = y1s = x2s = y2s = np.array(
                [], dtype=np.int64)

        pcell = cell_all[~is_way]
        pid = g.column("wid").to_numpy()[~is_way]
        px = g.column("p").to_numpy()[~is_way]
        py = g.column("q").to_numpy()[~is_way]
        porder = np.argsort(pcell, kind="stable")
        pcell, pid = pcell[porder], pid[porder]
        px, py = px[porder], py[porder]
        if len(pcell) == 0 or len(scell) == 0:
            return empty

        # per-cell (probes x segments) distance blocks over the run pairs
        pstarts = np.concatenate([[0], np.flatnonzero(np.diff(pcell)) + 1,
                                  [len(pcell)]])
        out = [[], [], [], []]
        for k in range(len(pstarts) - 1):
            plo, phi = pstarts[k], pstarts[k + 1]
            c = pcell[plo]
            slo = np.searchsorted(scell, c, side="left")
            shi = np.searchsorted(scell, c, side="right")
            if slo == shi:
                continue
            S = slice(slo, shi)
            P = slice(plo, phi)
            dx, dy = x2s[S] - x1s[S], y2s[S] - y1s[S]
            l2 = dx * dx + dy * dy
            num = ((px[P, None] - x1s[None, S]) * dx[None, :]
                   + (py[P, None] - y1s[None, S]) * dy[None, :])
            t = num / l2[None, :]
            tc = np.clip(t, 0.0, 1.0)
            ex = px[P, None] - (x1s[None, S] + tc * dx[None, :])
            ey = py[P, None] - (y1s[None, S] + tc * dy[None, :])
            d2f = np.floor(ex * ex + ey * ey).astype(np.int64)
            ok = d2f <= MATCH_R * MATCH_R
            d2m = np.where(ok, d2f, np.int64(2**62))
            order2 = np.lexsort((np.broadcast_to(ss[S], d2m.shape),
                                 np.broadcast_to(sw[S], d2m.shape),
                                 d2m), axis=1)
            best = order2[:, 0]
            rows = np.arange(phi - plo)
            bok = ok[rows, best]
            out[0].append(pid[P][bok])
            out[1].append(sw[S][best][bok])
            out[2].append(ss[S][best][bok])
            out[3].append(d2m[rows, best][bok])
        cat = [np.concatenate(c) if c else np.array([], dtype=np.int64)
               for c in out]
        return pa.table({
            "probe_id": pa.array(cat[0], pa.int64()),
            "way_id": pa.array(cat[1], pa.int64()),
            "seq": pa.array(cat[2], pa.int64()),
            "d2_floor": pa.array(cat[3], pa.int64()),
        })

    import pyarrow.parquet as pq2

    n_node_rows = pq2.read_metadata(f"{sf_dir}/part.parquet").num_rows
    if n_node_rows <= node_broadcast_max:
        # broadcast node store (the OsmReader pass-2 LongLongMap shape):
        # sorted (node_id, lat, lon) arrays put ONCE, probed per ref batch
        nd = nodes_ds(sf_dir).to_pandas()
        nid = nd["node_id"].to_numpy()
        o = np.argsort(nid, kind="stable")
        store = ray.put((nid[o], nd["lat_mdeg"].to_numpy()[o],
                         nd["lon_mdeg"].to_numpy()[o]))

        def lookup_tag(batch: pa.Table) -> pa.Table:
            nid_s, lat_s, lon_s = ray.get(store)
            refs_nid = batch.column("node_id").to_numpy()
            pos = np.searchsorted(nid_s, refs_nid)
            pos_c = np.minimum(pos, len(nid_s) - 1)
            ok = (pos < len(nid_s)) & (nid_s[pos_c] == refs_nid)
            hit = np.flatnonzero(ok)
            joined = pa.table({
                "way_id": batch.column("way_id").take(pa.array(hit)),
                "seq": batch.column("seq").take(pa.array(hit)),
                "node_id": pa.array(refs_nid[hit], pa.int64()),
                "lat_mdeg": pa.array(lat_s[pos_c[hit]], pa.int64()),
                "lon_mdeg": pa.array(lon_s[pos_c[hit]], pa.int64()),
            })
            return tag_ways(joined)

        ways = way_refs_ds(sf_dir).map_batches(
            lookup_tag, batch_format="pyarrow")
    else:
        ways = join_way_nodes(sf_dir, n_buckets).map_batches(
            tag_ways, batch_format="pyarrow")
    probes = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
    ).map_batches(emit_probes, batch_format="pyarrow")
    return (
        ways.union(probes)
        .groupby("cb")
        .map_groups(lambda g: match_in_bucket(g.drop_columns(["cb"])),
                    batch_format="pyarrow")
    )


def sql_map_match() -> str:
    """Twin of :func:`map_match`: the same cell-cover candidate join, the
    same clamped-projection float chain, row_number argmin."""
    r2 = MATCH_R * MATCH_R
    return f"""
WITH {_SEG_CTE},
scells AS (
    SELECT s.*, ({_fdiv(f'least(y1, y2) - {MATCH_R}')} + gy.g + 64) * 512
              + ({_fdiv(f'least(x1, x2) - {MATCH_R}')} + gx.g + 256) AS cell
    FROM seg s
    CROSS JOIN (SELECT unnest([0, 1, 2]) AS g) gx
    CROSS JOIN (SELECT unnest([0, 1, 2]) AS g) gy
    WHERE {_fdiv(f'least(x1, x2) - {MATCH_R}')} + gx.g
            <= {_fdiv(f'greatest(x1, x2) + {MATCH_R}')}
      AND {_fdiv(f'least(y1, y2) - {MATCH_R}')} + gy.g
            <= {_fdiv(f'greatest(y1, y2) + {MATCH_R}')}
),
probes AS (
    SELECT o_orderkey AS probe_id,
           CAST((o_orderkey * {WAY_ANCHOR_LON_MULT}) % 350000 - 175000
             + (o_orderkey * {PROBE_X_MULT}) % 1600 - 800 AS BIGINT) AS px,
           CAST((o_orderkey * {WAY_ANCHOR_LAT_MULT}) % 160000 - 80000
             + (o_orderkey * {PROBE_Y_MULT}) % 1600 - 800 AS BIGINT) AS py
    FROM orders
),
cand AS (
    SELECT p.probe_id, s.way_id, s.seq,
           CAST(floor(
             (p.px - (s.x1 + least(greatest(
                 CAST((p.px - s.x1) * (s.x2 - s.x1)
                    + (p.py - s.y1) * (s.y2 - s.y1) AS DOUBLE)
                 / CAST((s.x2 - s.x1) * (s.x2 - s.x1)
                      + (s.y2 - s.y1) * (s.y2 - s.y1) AS DOUBLE),
                 0.0), 1.0) * (s.x2 - s.x1)))
           * (p.px - (s.x1 + least(greatest(
                 CAST((p.px - s.x1) * (s.x2 - s.x1)
                    + (p.py - s.y1) * (s.y2 - s.y1) AS DOUBLE)
                 / CAST((s.x2 - s.x1) * (s.x2 - s.x1)
                      + (s.y2 - s.y1) * (s.y2 - s.y1) AS DOUBLE),
                 0.0), 1.0) * (s.x2 - s.x1)))
           + (p.py - (s.y1 + least(greatest(
                 CAST((p.px - s.x1) * (s.x2 - s.x1)
                    + (p.py - s.y1) * (s.y2 - s.y1) AS DOUBLE)
                 / CAST((s.x2 - s.x1) * (s.x2 - s.x1)
                      + (s.y2 - s.y1) * (s.y2 - s.y1) AS DOUBLE),
                 0.0), 1.0) * (s.y2 - s.y1)))
           * (p.py - (s.y1 + least(greatest(
                 CAST((p.px - s.x1) * (s.x2 - s.x1)
                    + (p.py - s.y1) * (s.y2 - s.y1) AS DOUBLE)
                 / CAST((s.x2 - s.x1) * (s.x2 - s.x1)
                      + (s.y2 - s.y1) * (s.y2 - s.y1) AS DOUBLE),
                 0.0), 1.0) * (s.y2 - s.y1)))
           ) AS BIGINT) AS d2_floor
    FROM probes p
    JOIN scells s
      ON s.cell = ({_fdiv('p.py')} + 64) * 512 + ({_fdiv('p.px')} + 256)
)
SELECT probe_id, way_id, seq, d2_floor FROM (
    SELECT *, row_number() OVER (PARTITION BY probe_id
                                 ORDER BY d2_floor, way_id, seq) AS rk
    FROM cand WHERE d2_floor <= {r2}
) WHERE rk = 1 ORDER BY 1
"""


# ------------------------------------------------ relations / multipolygons --

REL_X_MULT, REL_Y_MULT = 48611, 39829


def _rel_rect(custkey: np.ndarray):
    """Deterministic rectangle (mdeg ints) per relation (= customer)."""
    c = np.asarray(custkey, dtype=np.int64)
    x0 = (c * REL_X_MULT) % 300000 - 150000
    y0 = (c * REL_Y_MULT) % 140000 - 70000
    w = 5000 + (c % 7) * 1000
    h = 4000 + (c % 5) * 1000
    return x0, y0, w, h


def node_degree_census(sf_dir: str) -> ray.data.Dataset:
    """OSM QA node-degree histogram: how many nodes are referenced by
    exactly ``d`` way memberships (degree >= 2 nodes are the
    intersection candidates of the way-splitting pass, degree 0 the
    orphans).  Scale shape: per-batch (node, count) partials -> ONE
    groupby(node) sum (the only big exchange) -> per-batch (degree,
    count) histogram partials -> tiny groupby-sum; the degree-0 row is
    total nodes minus referenced nodes (driver arithmetic over two small
    aggregates).  Output: (degree, n_nodes) including the 0 row."""
    import pyarrow.parquet as pq2
    from ray.data.aggregate import Sum

    n_nodes_total = pq2.read_metadata(f"{sf_dir}/part.parquet").num_rows

    def count_partial(batch: pa.Table) -> pa.Table:
        nid = batch.column("node_id").to_numpy()
        u, c = np.unique(nid, return_counts=True)
        return pa.table({"node_id": pa.array(u, pa.int64()),
                         "c_part": pa.array(c, pa.int64())})

    deg = (
        way_refs_ds(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("c_part", alias_name="degree"))
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        d = batch.column("degree").to_numpy()
        u, c = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(u, pa.int64()),
                         "n_part": pa.array(c, pa.int64())})

    hist = (
        deg.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_part", alias_name="n_nodes"))
        .to_pandas()  # bounded by distinct degrees
    )
    n_ref = int(hist["n_nodes"].sum())
    out = pd.concat([
        pd.DataFrame({"degree": [0], "n_nodes": [n_nodes_total - n_ref]}),
        hist,
    ], ignore_index=True).astype(np.int64)
    return ray.data.from_pandas(out)


def sql_node_degree_census() -> str:
    """Twin of :func:`node_degree_census`."""
    return """
WITH deg AS (SELECT l_partkey AS node_id, count(*) AS degree
             FROM lineitem GROUP BY 1),
h AS (SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
      FROM deg GROUP BY 1)
SELECT * FROM h
UNION ALL
SELECT CAST(0 AS BIGINT),
       (SELECT count(*) FROM part) - (SELECT count(*) FROM deg)
ORDER BY 1
"""


UNION_SLAB = 10000  # x-slab pitch (mdeg) for the rect-union exchange


def rect_union_area(sf_dir: str, pitch: int = UNION_SLAB) -> ray.data.Dataset:
    """Klee's measure in 2-D: the EXACT union area of all (overlapping)
    relation rectangles — the dissolve/ST_Union-area primitive (coverage
    analysis, footprint dedup).

    Scale shape: slab decomposition — each rect is clipped to the <=3
    fixed-pitch x-slabs it spans (union area is additive across disjoint
    slabs), ONE ``groupby(slab)`` exchange co-locates each slab's pieces,
    and the slab body computes its exact union via a coordinate-compressed
    2-D difference array (+1/-1 at piece corners -> 2-D cumsum -> covered
    sub-cells x sub-cell areas; all integer).  No global coordinate
    compression, no driver-side sweep: per-slab state is bounded by the
    rects overlapping that slab, and ``pitch`` tunes the slab population
    at larger scales.  Output: ONE row (union_area, n_rects).
    """
    import pyarrow.parquet as pq2
    from ray.data.aggregate import Sum

    n_rects = pq2.read_metadata(f"{sf_dir}/customer.parquet").num_rows

    def emit_pieces(batch: pa.Table) -> pa.Table:
        c = batch.column("c_custkey").to_numpy().astype(np.int64)
        x0, y0, w, h = _rel_rect(c)
        x1, y1 = x0 + w, y0 + h
        s_lo = x0 // pitch
        s_hi = (x1 - 1) // pitch
        outs = []
        for d in range(3):
            s = s_lo + d
            m = s <= s_hi
            px0 = np.maximum(x0[m], s[m] * pitch)
            px1 = np.minimum(x1[m], (s[m] + 1) * pitch)
            outs.append((s[m], px0, px1, y0[m], y1[m]))
        return pa.table({
            "slab": pa.array(np.concatenate([o[0] for o in outs]), pa.int64()),
            "x0": pa.array(np.concatenate([o[1] for o in outs]), pa.int64()),
            "x1": pa.array(np.concatenate([o[2] for o in outs]), pa.int64()),
            "y0": pa.array(np.concatenate([o[3] for o in outs]), pa.int64()),
            "y1": pa.array(np.concatenate([o[4] for o in outs]), pa.int64()),
        })

    def slab_union(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"area_part": pa.array([], pa.int64())})
        x0 = g.column("x0").to_numpy()
        x1 = g.column("x1").to_numpy()
        y0 = g.column("y0").to_numpy()
        y1 = g.column("y1").to_numpy()
        xs = np.unique(np.concatenate([x0, x1]))
        ys = np.unique(np.concatenate([y0, y1]))
        diff = np.zeros((len(xs), len(ys)), np.int32)
        xi0 = np.searchsorted(xs, x0)
        xi1 = np.searchsorted(xs, x1)
        yi0 = np.searchsorted(ys, y0)
        yi1 = np.searchsorted(ys, y1)
        np.add.at(diff, (xi0, yi0), 1)
        np.add.at(diff, (xi1, yi0), -1)
        np.add.at(diff, (xi0, yi1), -1)
        np.add.at(diff, (xi1, yi1), 1)
        cov = diff.cumsum(axis=0).cumsum(axis=1)[:-1, :-1] > 0
        wx = np.diff(xs)
        wy = np.diff(ys)
        area = int((wx[:, None] * wy[None, :] * cov).sum())
        return pa.table({"area_part": pa.array([area], pa.int64())})

    total = (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey"])
        .map_batches(emit_pieces, batch_format="pyarrow")
        .groupby("slab")
        .map_groups(lambda g: slab_union(g.drop_columns(["slab"])),
                    batch_format="pyarrow")
        .sum("area_part")
    )
    return ray.data.from_pandas(pd.DataFrame(
        {"union_area": [int(total or 0)], "n_rects": [int(n_rects)]}
    ).astype(np.int64))


def sql_rect_union_area() -> str:
    """Twin of :func:`rect_union_area` by a DIFFERENT exact algorithm (the
    classic global x-boundary sweep with a running-max y-interval union) —
    union area is decomposition-independent, so the two derivations must
    agree to the integer."""
    return f"""
WITH rects AS (
    SELECT (c_custkey * {REL_X_MULT}) % 300000 - 150000 AS x0,
           (c_custkey * {REL_Y_MULT}) % 140000 - 70000 AS y0,
           (c_custkey * {REL_X_MULT}) % 300000 - 150000
             + 5000 + (c_custkey % 7) * 1000 AS x1,
           (c_custkey * {REL_Y_MULT}) % 140000 - 70000
             + 4000 + (c_custkey % 5) * 1000 AS y1
    FROM customer
),
xs AS (SELECT DISTINCT x FROM (SELECT x0 AS x FROM rects
                               UNION SELECT x1 FROM rects)),
slabs AS (SELECT x AS xa, lead(x) OVER (ORDER BY x) AS xb FROM xs),
cover AS (
    SELECT s.xa, s.xb, r.y0, r.y1
    FROM slabs s JOIN rects r ON r.x0 <= s.xa AND r.x1 >= s.xb
    WHERE s.xb IS NOT NULL
),
m AS (
    SELECT xa, xb, y0, y1,
           max(y1) OVER (PARTITION BY xa ORDER BY y0, y1
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS prevmax
    FROM cover
),
seg AS (
    SELECT xa, xb,
           CASE WHEN prevmax IS NULL THEN y1 - y0
                WHEN prevmax >= y1 THEN 0
                WHEN prevmax >= y0 THEN y1 - prevmax
                ELSE y1 - y0 END AS ylen
    FROM m
)
SELECT CAST(coalesce(sum(ylen * (xb - xa)), 0) AS BIGINT) AS union_area,
       (SELECT count(*) FROM rects) AS n_rects
FROM seg
"""


def relation_members_ds(sf_dir: str) -> ray.data.Dataset:
    """Member ways per relation: each relation's outer ring arrives as TWO
    open way segments (the second reversed); every third relation adds a hole
    as two more segments — the multipolygon member gather of
    ``OsmReader.java:922-962``."""
    from ..geo import wkb as W

    def to_members(batch: pa.Table) -> pa.Table:
        cust = batch.column("c_custkey").to_numpy().astype(np.int64)
        x0, y0, w, h = _rel_rect(cust)
        x0, y0, w, h = (v.astype(np.float64) for v in (x0, y0, w, h))

        def seg3(p0, p1, p2):
            """(n,3,2) coords from three (x,y) tuple-of-arrays corners."""
            return np.stack(
                [np.stack(p0, axis=1), np.stack(p1, axis=1), np.stack(p2, axis=1)],
                axis=1,
            )

        # outer ring as two open segments; the second arrives REVERSED
        # (corners[0], corners[3], corners[2]) on purpose — the ring merge
        # under test must re-orient it
        seg_a = seg3((x0, y0), (x0 + w, y0), (x0 + w, y0 + h))
        seg_b = seg3((x0, y0), (x0, y0 + h), (x0 + w, y0 + h))
        hole = cust % 3 == 0
        hx0, hy0 = x0 + np.floor_divide(w, 4), y0 + np.floor_divide(h, 4)
        hw, hh = np.floor_divide(w, 2), np.floor_divide(h, 2)
        seg_ha = seg3((hx0, hy0), (hx0 + hw, hy0), (hx0 + hw, hy0 + hh))[hole]
        seg_hb = seg3(
            (hx0 + hw, hy0 + hh), (hx0, hy0 + hh), (hx0, hy0)
        )[hole]
        coords = np.concatenate([seg_a, seg_b, seg_ha, seg_hb]).reshape(-1, 2)
        rel = np.concatenate([cust, cust, cust[hole], cust[hole]])
        wid = np.concatenate(
            [cust * 10, cust * 10 + 1, cust[hole] * 10 + 2, cust[hole] * 10 + 3]
        )
        blobs = W.encode_linestrings_arrow(
            coords, np.full(len(rel), 3, dtype=np.int64)
        )
        return pa.table(
            {
                "rel_id": pa.array(rel, pa.int64()),
                "way_id": pa.array(wid, pa.int64()),
                "geom_wkb": blobs,
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(to_members, batch_format="pyarrow")


def assemble_relations(sf_dir: str, n_buckets: int = 32) -> ray.data.Dataset:
    """groupby(rel_id bucket) -> stitch member ways into nested multipolygons
    (``geo/multipolygon.py``).  Output (exact ints): rel_id, n_polygons,
    n_rings, area2_sum = Σ |2·shoelace| over all rings in mdeg²."""
    from ..geo import wkb as W
    from ..geo.multipolygon import assemble_multipolygon

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch.column("rel_id").to_numpy() % n_buckets
        return batch.append_column("rbucket", pa.array(b, pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["rel_id", "way_id"])
        out = {"rel_id": [], "n_polygons": [], "n_rings": [], "area2_sum": []}
        for rel_id, grp in g.groupby("rel_id", sort=True):
            segs = [W.decode_wkb(b)[1] for b in grp["geom_wkb"]]
            polys = assemble_multipolygon(segs)
            n_rings = sum(len(p) for p in polys)
            area2 = 0
            for rings in polys:
                for r in rings:
                    ri = np.rint(r).astype(np.int64)
                    x, y = ri[:, 0], ri[:, 1]
                    area2 += abs(int(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1])))
            out["rel_id"].append(int(rel_id))
            out["n_polygons"].append(len(polys))
            out["n_rings"].append(n_rings)
            out["area2_sum"].append(area2)
        return pd.DataFrame(out)

    return (
        relation_members_ds(sf_dir)
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("rbucket")
        .map_groups(lambda g: per_bucket(g.drop(columns=["rbucket"])),
                    batch_format="pandas")
    )


def sql_relation_assembly() -> str:
    """Oracle: areas from the rectangle arithmetic directly — if stitching,
    reversal handling or hole nesting broke, counts/areas mismatch."""
    return f"""
SELECT c.c_custkey AS rel_id,
       1 AS n_polygons,
       CASE WHEN c.c_custkey % 3 = 0 THEN 2 ELSE 1 END AS n_rings,
       2 * (5000 + (c.c_custkey % 7) * 1000) * (4000 + (c.c_custkey % 5) * 1000)
       + CASE WHEN c.c_custkey % 3 = 0
              THEN 2 * ((5000 + (c.c_custkey % 7) * 1000) // 2)
                     * ((4000 + (c.c_custkey % 5) * 1000) // 2)
              ELSE 0 END AS area2_sum
FROM customer c
"""


def join_way_nodes_native(sf_dir: str, num_partitions: int = 32) -> ray.data.Dataset:
    """The same way ⋈ node join via Ray Data's native hash-partitioned
    ``Dataset.join`` (available in recent releases) — equivalent results to
    :func:`join_way_nodes`; the explicit bucketed form remains the default
    because it keeps the partitioning/skew story visible and version-proof.
    Size ``num_partitions`` well below available CPUs — the hash-join
    aggregator actors stall a small local session when oversubscribed.
    """
    return way_refs_ds(sf_dir).join(
        nodes_ds(sf_dir),
        join_type="inner",
        num_partitions=num_partitions,
        on=("node_id",),
    )


# ------------------------------------------------- super-relations + roles --

# Role-encoded membership, mirroring the reference's packed long
# (``OsmReader.java:679-701``: role id in the top bits, relation id below).
ROLE_SHIFT = 48
ROLE_MASK = (1 << 15) - 1
ROLE_IDS = {"outer": 1, "inner": 2, "subarea": 3}  # dictionary-encoded roles


def encode_membership(rel_id, role_id):
    """rel_id | role_id << ROLE_SHIFT (vectorized int64)."""
    return np.asarray(rel_id, dtype=np.int64) | (
        np.asarray(role_id, dtype=np.int64) << np.int64(ROLE_SHIFT)
    )


def decode_membership(encoded):
    """-> (rel_id, role_id)."""
    e = np.asarray(encoded, dtype=np.int64)
    return e & ~(np.int64(ROLE_MASK) << np.int64(ROLE_SHIFT)), (
        e >> np.int64(ROLE_SHIFT)
    ) & np.int64(ROLE_MASK)


def way_direct_memberships_ds(sf_dir: str) -> ray.data.Dataset:
    """Direct way -> relation membership with roles (synthetic, mirrorable):
    relation c owns ways c*10+k; k<2 are 'outer' ring segments, k>=2 (every
    third relation's hole) are 'inner'."""

    def to_rows(batch: pa.Table) -> pa.Table:
        c = batch.column("c_custkey").to_numpy().astype(np.int64)
        ks = [0, 1, 2, 3]
        rel, wid, role = [], [], []
        for k in ks:
            m = c if k < 2 else c[c % 3 == 0]
            rel.append(m)
            wid.append(m * 10 + k)
            role.append(np.full(len(m), 1 if k < 2 else 2, dtype=np.int64))
        return pa.table(
            {
                "way_id": pa.array(np.concatenate(wid), pa.int64()),
                "rel_id": pa.array(np.concatenate(rel), pa.int64()),
                "role_id": pa.array(np.concatenate(role), pa.int64()),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).map_batches(to_rows, batch_format="pyarrow")


def relation_parent_edges(sf_dir: str) -> pd.DataFrame:
    """relation -> parent-relation edges (role 'subarea'), two-level tree:
    group-of-4 leader is the parent; leaders nest under group-of-16 leaders.
    SMALL by construction (relations are a sliver of OSM data — the
    reference keeps the same multimap fully in RAM, ``OsmReader.java:563``),
    so the engine collects it driver-side and broadcasts the closure."""
    import pyarrow.parquet as pq

    c = (
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .column("c_custkey")
        .to_numpy()
        .astype(np.int64)
    )
    keys = set(c.tolist())
    child, parent = [], []
    for cc in c:
        p = (cc // 4) * 4 if cc % 4 != 0 else (cc // 16) * 16
        if p != cc and p in keys:
            child.append(int(cc))
            parent.append(int(p))
    return pd.DataFrame(
        {"rel_id": child, "parent_id": parent,
         "role_id": np.full(len(child), ROLE_IDS["subarea"], dtype=np.int64)}
    )


def _ancestor_closure(edges: pd.DataFrame) -> dict[int, list[tuple[int, int, int]]]:
    """rel -> [(ancestor_id, role_id, depth>=1), ...] via DFS with a visited
    set (cycle-safe — ``OsmReader.getRelationInfosForRelationId``'s visited
    semantics, :563-607)."""
    up: dict[int, list[tuple[int, int]]] = {}
    for r, p, role in zip(edges["rel_id"], edges["parent_id"], edges["role_id"]):
        up.setdefault(int(r), []).append((int(p), int(role)))
    closure: dict[int, list[tuple[int, int, int]]] = {}
    for start in up:
        seen = {start}
        out: list[tuple[int, int, int]] = []
        frontier = [(p, role, 1) for p, role in up[start]]
        while frontier:
            p, role, d = frontier.pop()
            if p in seen:
                continue
            seen.add(p)
            out.append((p, role, d))
            for gp, grole in up.get(p, []):
                frontier.append((gp, grole, d + 1))
        closure[start] = sorted(out)
    return closure


def super_relation_memberships(sf_dir: str) -> ray.data.Dataset:
    """Every way's relation memberships, direct AND transitive through
    super-relations, with role bits encoded — the Ray restatement of
    ``OsmReader.getRelationMembershipForWay`` (:563-607): the tiny
    relation->parent graph is closed on the driver and broadcast
    (``ray.put``); the way-membership stream expands against it in
    ``map_batches``.  Output: way_id, rel_id, role_id, depth (0 = direct),
    encoded (= rel_id | role_id << 48)."""
    closure_ref = ray.put(_ancestor_closure(relation_parent_edges(sf_dir)))

    def expand(batch: pa.Table) -> pa.Table:
        closure = ray.get(closure_ref)
        wid = batch.column("way_id").to_numpy()
        rel = batch.column("rel_id").to_numpy()
        role = batch.column("role_id").to_numpy()
        anc = [closure.get(int(r), ()) for r in rel]
        n_anc = np.fromiter((len(a) for a in anc), dtype=np.int64, count=len(anc))
        out_w = np.concatenate([wid, np.repeat(wid, n_anc)])
        out_r = np.concatenate(
            [rel, np.array([p for a in anc for (p, _, _) in a], dtype=np.int64)]
        )
        out_role = np.concatenate(
            [role, np.array([ro for a in anc for (_, ro, _) in a], dtype=np.int64)]
        )
        out_d = np.concatenate(
            [np.zeros(len(wid), dtype=np.int64),
             np.array([d for a in anc for (_, _, d) in a], dtype=np.int64)]
        )
        return pa.table(
            {
                "way_id": pa.array(out_w, pa.int64()),
                "rel_id": pa.array(out_r, pa.int64()),
                "role_id": pa.array(out_role, pa.int64()),
                "depth": pa.array(out_d, pa.int64()),
                "encoded": pa.array(encode_membership(out_r, out_role), pa.int64()),
            }
        )

    return way_direct_memberships_ds(sf_dir).map_batches(expand, batch_format="pyarrow")


def sql_super_relations() -> str:
    """Oracle: direct memberships UNION one- and two-level ancestors from
    the same group-of-4 / group-of-16 arithmetic."""
    parent1 = "CASE WHEN c_custkey % 4 != 0 THEN (c_custkey // 4) * 4 ELSE (c_custkey // 16) * 16 END"
    return f"""
WITH rels AS (SELECT c_custkey AS rel_id FROM customer),
ways AS (
    SELECT rel_id * 10 + k.k AS way_id, rel_id,
           CASE WHEN k.k < 2 THEN 1 ELSE 2 END AS role_id
    FROM rels CROSS JOIN (SELECT UNNEST([0, 1, 2, 3]) AS k) k
    WHERE k.k < 2 OR rel_id % 3 = 0
),
edges AS (
    SELECT rel_id, {parent1.replace('c_custkey', 'rel_id')} AS parent_id
    FROM rels
    WHERE {parent1.replace('c_custkey', 'rel_id')} != rel_id
      AND {parent1.replace('c_custkey', 'rel_id')} IN (SELECT rel_id FROM rels)
),
lvl1 AS (
    SELECT w.way_id, e.parent_id AS rel_id, 3 AS role_id, 1 AS depth
    FROM ways w JOIN edges e USING (rel_id)
),
lvl2 AS (
    SELECT w.way_id, e2.parent_id AS rel_id, 3 AS role_id, 2 AS depth
    FROM ways w
    JOIN edges e1 ON w.rel_id = e1.rel_id
    JOIN edges e2 ON e1.parent_id = e2.rel_id
),
allm AS (
    SELECT way_id, rel_id, role_id, 0 AS depth FROM ways
    UNION ALL SELECT * FROM lvl1
    UNION ALL SELECT * FROM lvl2
)
SELECT way_id, rel_id, role_id, depth,
       rel_id | (CAST(role_id AS BIGINT) << {ROLE_SHIFT}) AS encoded
FROM allm
"""


# ------------------------------------------------- way splitting at nodes --

def shared_nodes_ds(sf_dir: str) -> ray.data.Dataset:
    """Nodes referenced more than once across all ways = intersection nodes
    (``OsmWaySplitter`` semantics, ``reader/osm/OsmWaySplitter.java:14-53``).
    The reference builds a shared RoaringBitmap; the Ray restatement is a
    count AGGREGATE over way refs (per-batch partials -> groupby-sum) —
    shared state becomes data movement."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        nid, cnt = np.unique(batch.column("node_id").to_numpy(), return_counts=True)
        return pa.table({"node_id": pa.array(nid, pa.int64()),
                         "c_part": pa.array(cnt.astype(np.int64), pa.int64())})

    counts = (
        way_refs_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("c_part", alias_name="n_refs"))
    )
    return counts.map_batches(
        lambda b: b.filter(pa.compute.greater(b.column("n_refs"), 1)),
        batch_format="pyarrow",
    )


def split_ways_summary(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Per-way split summary (``OsmReader.splitWayIfNecessary``, :439-450):
    interior nodes (not first/last) that are shared split the way; output
    way_id, n_nodes, n_intersections, n_segments (= intersections + 1) —
    all exact ints for the oracle.  Shared-node flags reach the refs via the
    same hash-bucket shuffle join as the node-location join."""

    # narrow overloaded exchange (same discipline as join_way_nodes): the
    # shared-node side ships only node_id; way_id/seq carry 0 placeholders
    # on that side rather than null-padded columns; side is int8
    def tag_refs(batch: pa.Table) -> pa.Table:
        b = batch.column("node_id").to_numpy() % n_buckets
        return pa.table({
            "way_id": batch.column("way_id"),
            "seq": batch.column("seq"),
            "node_id": batch.column("node_id"),
            "jbucket": pa.array(b, pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
        })

    def tag_shared(batch: pa.Table) -> pa.Table:
        b = batch.column("node_id").to_numpy() % n_buckets
        z = pa.array(np.zeros(batch.num_rows, np.int64), pa.int64())
        return pa.table({
            "way_id": z, "seq": z,
            "node_id": batch.column("node_id"),
            "jbucket": pa.array(b, pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
        })

    refs = way_refs_ds(sf_dir).map_batches(tag_refs, batch_format="pyarrow")
    shared = shared_nodes_ds(sf_dir).map_batches(tag_shared,
                                                 batch_format="pyarrow")

    def flag_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m_s = pc.equal(g.column("side"), 1)
        shared_ids = np.unique(g.filter(m_s).column("node_id").to_numpy())
        w = g.filter(pc.invert(m_s))
        nid = w.column("node_id").to_numpy()
        pos = np.searchsorted(shared_ids, nid)
        pos_c = np.minimum(pos, max(len(shared_ids) - 1, 0))
        hit = (len(shared_ids) > 0) & (pos < len(shared_ids)) & (
            shared_ids[pos_c] == nid if len(shared_ids) else np.zeros(len(nid), bool)
        )
        return pa.table(
            {
                "way_id": w.column("way_id").cast(pa.int64()),
                "seq": w.column("seq").cast(pa.int64()),
                "node_id": pa.array(nid, pa.int64()),
                "is_shared": pa.array(np.asarray(hit, dtype=np.int64), pa.int64()),
            }
        )

    flagged = refs.union(shared).groupby("jbucket").map_groups(
        flag_bucket, batch_format="pyarrow"
    )

    def add_wbucket(batch: pa.Table) -> pa.Table:
        b = batch.column("way_id").to_numpy() % n_buckets
        return batch.append_column("wbucket", pa.array(b, pa.int64()))

    def per_bucket(g: pa.Table) -> pa.Table:
        wid = g.column("way_id").to_numpy()
        sh = g.column("is_shared").to_numpy()
        order = np.lexsort((g.column("node_id").to_numpy(),
                            g.column("seq").to_numpy(), wid))
        wid, sh = wid[order], sh[order]
        first = np.concatenate([[True], wid[1:] != wid[:-1]])
        last = np.concatenate([wid[1:] != wid[:-1], [True]])
        interior_shared = ((sh == 1) & ~first & ~last).astype(np.int64)
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(wid))
        n_ix = np.add.reduceat(interior_shared, starts)
        return pa.table(
            {
                "way_id": pa.array(wid[starts], pa.int64()),
                "n_nodes": pa.array(ends - starts, pa.int64()),
                "n_intersections": pa.array(n_ix, pa.int64()),
                "n_segments": pa.array(n_ix + 1, pa.int64()),
            }
        )

    return (
        flagged.map_batches(add_wbucket, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop_columns(["wbucket"])),
                    batch_format="pyarrow")
    )


def sql_way_split() -> str:
    """Oracle for :func:`split_ways_summary` — node ref counts + interior
    positions from the same (seq, node_id) ordering."""
    return """
WITH refs AS (
    SELECT l_orderkey AS way_id, l_linenumber AS seq, l_partkey AS node_id
    FROM lineitem
),
cnt AS (SELECT node_id, count(*) AS c FROM refs GROUP BY 1),
pos AS (
    SELECT way_id, seq, node_id,
           row_number() OVER (PARTITION BY way_id ORDER BY seq, node_id) AS rn,
           count(*) OVER (PARTITION BY way_id) AS n
    FROM refs
),
j AS (SELECT pos.*, cnt.c FROM pos JOIN cnt USING (node_id))
SELECT way_id,
       CAST(max(n) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN rn > 1 AND rn < n AND c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_intersections,
       CAST(sum(CASE WHEN rn > 1 AND rn < n AND c > 1 THEN 1 ELSE 0 END) + 1 AS BIGINT)
           AS n_segments
FROM j GROUP BY 1
"""


# ------------------------------------------------------- real .osm.pbf path --
#
# The synthetic node/way/relation world above, serialized into an ACTUAL
# .osm.pbf file by the hand-rolled codec (sources/osmpbf.py) and read back
# through the parallel blob decoder — so the oracle-green join/assembly
# pipelines run against the reference's defining input format
# (OsmInputFile.java / PbfDecoder.java semantics), not just parquet.

PBF_FIXTURE_DIR = "/tmp/planetiler_ray_pbf"


def write_pbf_fixture(sf_dir: str, path: str) -> str:
    """Deterministically serialize the synthetic OSM world of ``sf_dir``
    into a .osm.pbf file (driver-side; fixture scale — production reads an
    existing planet file instead of writing one)."""
    import os

    import pyarrow.parquet as pq

    from ..sources.osmpbf import PbfWriter

    pk = np.sort(
        pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
        .column(0).to_numpy().astype(np.int64)
    )
    lat = (pk * NODE_LAT_MULT) % 170000 - 85000
    lon = (pk * NODE_LON_MULT) % 360000 - 180000
    node_tags = [
        [("place", "town"), ("name", f"n{p}")] if p % 50 == 0 else []
        for p in pk
    ]

    li = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_partkey"],
    )
    ok = li.column("l_orderkey").to_numpy().astype(np.int64)
    ln = li.column("l_linenumber").to_numpy().astype(np.int64)
    pid = li.column("l_partkey").to_numpy().astype(np.int64)
    order = np.lexsort((pid, ln, ok))
    ok, pid = ok[order], pid[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ok)) + 1])
    wids = ok[starts]
    rlens = np.diff(np.append(starts, len(ok)))
    highway = ["motorway", "primary", "secondary", "residential"]
    way_tags = [[("highway", highway[int(w) % 4])] for w in wids]

    cust = np.sort(
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .column(0).to_numpy().astype(np.int64)
    )
    hole = cust % 3 == 0
    mem_lens = np.where(hole, 4, 2)
    moffs = np.concatenate([[0], np.cumsum(mem_lens)])
    mem_flat = np.empty(int(moffs[-1]), np.int64)
    roles: list[str] = []
    for i, c in enumerate(cust):  # fixture-writer loop (driver-side, small)
        o = moffs[i]
        mem_flat[o] = c * 10
        mem_flat[o + 1] = c * 10 + 1
        if hole[i]:
            mem_flat[o + 2] = c * 10 + 2
            mem_flat[o + 3] = c * 10 + 3
            roles += ["outer", "outer", "inner", "inner"]
        else:
            roles += ["outer", "outer"]
    rel_tags = [[("type", "multipolygon")]] * len(cust)

    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with PbfWriter(tmp) as w:
        w.write_dense_nodes(pk, lat * 1_000_000, lon * 1_000_000, tags=node_tags)
        w.write_ways(wids, pid, rlens, tags=way_tags)
        w.write_relations(
            cust, mem_flat, mem_lens,
            np.ones(int(moffs[-1]), np.int64), roles, tags=rel_tags,
        )
    os.replace(tmp, path)
    return path


def pbf_fixture_path(sf_dir: str) -> str:
    """Cached fixture per sf dir (regenerated when the source is newer)."""
    import os

    name = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    path = os.path.join(PBF_FIXTURE_DIR, f"{name}.osm.pbf")
    src_mtime = os.path.getmtime(f"{sf_dir}/lineitem.parquet")
    if not os.path.exists(path) or os.path.getmtime(path) < src_mtime:
        write_pbf_fixture(sf_dir, path)
    return path


def q_pbf_way_assembly(sf_dir: str) -> ray.data.Dataset:
    """The way_assembly pipeline fed from a REAL .osm.pbf file: parallel
    blob decode -> shuffle join -> way regroup.  Same oracle as
    way_assembly (the fixture serializes the identical world)."""
    from ..sources import osmpbf

    path = pbf_fixture_path(sf_dir)
    joined = join_way_nodes(
        sf_dir,
        nodes=osmpbf.read_pbf_nodes(path),
        refs=osmpbf.read_pbf_way_refs(path),
    )
    return assemble_ways(sf_dir, joined=joined)


def q_pbf_node_tags(sf_dir: str) -> ray.data.Dataset:
    """Tagged nodes decoded from the pbf DenseNodes keys_vals stream —
    exercises the dense-tag wire format end-to-end."""
    from ..sources import osmpbf

    path = pbf_fixture_path(sf_dir)

    def decode(batch: pa.Table) -> pa.Table:
        outs = []
        for p, off, sz in zip(
            batch.column("path").to_pylist(),
            batch.column("offset").to_pylist(),
            batch.column("size").to_pylist(),
        ):
            ent = osmpbf.read_blob_entities(p, off, sz)["nodes"]
            if len(ent["id"]) == 0:
                continue
            tagged = np.array([bool(t) for t in ent["tags"]])
            if not tagged.any():
                continue
            names = [t.get("name", "") for t, m in zip(ent["tags"], tagged) if m]
            outs.append(
                pa.table(
                    {
                        "node_id": pa.array(ent["id"][tagged], pa.int64()),
                        "lat_mdeg": pa.array(
                            ent["lat_nano"][tagged] // 1_000_000, pa.int64()
                        ),
                        "lon_mdeg": pa.array(
                            ent["lon_nano"][tagged] // 1_000_000, pa.int64()
                        ),
                        "name": pa.array(names, pa.string()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "node_id": pa.array([], pa.int64()),
                    "lat_mdeg": pa.array([], pa.int64()),
                    "lon_mdeg": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(outs)

    import ray as _ray

    return _ray.data.from_items(
        [b for b in osmpbf.scan_blobs(path) if b["type"] == "OSMData"]
    ).map_batches(decode, batch_format="pyarrow")


def sql_pbf_node_tags() -> str:
    return f"""
SELECT p_partkey AS node_id,
       (p_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
       (p_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg,
       'n' || p_partkey AS name
FROM part WHERE p_partkey % 50 = 0
"""


def q_pbf_relation_members(sf_dir: str) -> ray.data.Dataset:
    """Relation member table decoded from pbf (roles_sid + memids delta +
    types enum wire paths) — (rel_id, member_idx, member_id, member_type,
    role)."""
    from ..sources import osmpbf

    return osmpbf.read_pbf_relation_members(pbf_fixture_path(sf_dir))


def sql_pbf_relation_members() -> str:
    return """
WITH c AS (SELECT c_custkey AS ck FROM customer),
m AS (
    SELECT ck, 0 AS member_idx, ck * 10 AS member_id, 'outer' AS role FROM c
    UNION ALL SELECT ck, 1, ck * 10 + 1, 'outer' FROM c
    UNION ALL SELECT ck, 2, ck * 10 + 2, 'inner' FROM c WHERE ck % 3 = 0
    UNION ALL SELECT ck, 3, ck * 10 + 3, 'inner' FROM c WHERE ck % 3 = 0
)
SELECT ck AS rel_id, member_idx, member_id, CAST(1 AS BIGINT) AS member_type, role
FROM m
"""


def chaikin_checksum_ds(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Two rounds of REAL Chaikin corner cutting (``geo/simplify.
    smooth_chaikin`` — the ``DualMidpointSmoother.java`` analogue) over
    every assembled way, on RAW integer-millidegree coordinates.

    Exactness: with integer inputs, ``p0 + (p1-p0)*0.25`` and ``*0.75`` are
    dyadic-exact in float64 (quarters after round 1, sixteenths after round
    2), so the per-way vertex count and the x/y checksums in 1/16-mdeg
    fixed point are bitwise reproducible — the DuckDB twin
    (:func:`sql_chaikin_checksum`) unrolls both rounds as integer
    ``3·p_i + p_{i+1}`` lag algebra.  Same bucket shape as
    :func:`way_lines_ds` (one shuffle, thousands of ways per group call).
    """
    from ..geo.simplify import smooth_chaikin

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["way_id", "seq", "node_id"])
        wid = g["way_id"].to_numpy()
        base_lat = (wid * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
        base_lon = (wid * WAY_ANCHOR_LON_MULT) % 350000 - 175000
        lat = (base_lat + (g["lat_mdeg"].to_numpy() % 2000) - 1000).astype(np.float64)
        lon = (base_lon + (g["lon_mdeg"].to_numpy() % 2000) - 1000).astype(np.float64)
        bounds = np.flatnonzero(np.diff(wid)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(wid)]])
        out_w, out_n, out_x, out_y = [], [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue  # degenerate 1-node ways dropped (way_lines parity)
            c = np.column_stack([lon[s:e], lat[s:e]])
            sm = smooth_chaikin(smooth_chaikin(c))
            m16 = sm * 16.0  # exact integers (1/16-mdeg fixed point)
            out_w.append(int(wid[s]))
            out_n.append(len(sm))
            out_x.append(int(m16[:, 0].sum()))
            out_y.append(int(m16[:, 1].sum()))
        return pd.DataFrame(
            {"way_id": out_w, "n_pts": out_n, "sx16": out_x, "sy16": out_y}
        )

    return (
        join_way_nodes(sf_dir, n_buckets, emit_wbucket=True)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop(columns=["wbucket"])),
                    batch_format="pandas")
    )


def sql_chaikin_checksum() -> str:
    """DuckDB mirror of :func:`chaikin_checksum_ds` — both Chaikin rounds
    unrolled in integer fixed point (×4 after round 1, ×16 after round 2):
    q_i = 3·p_i + p_{i+1}, r_i = p_i + 3·p_{i+1}, endpoints kept."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
v0 AS (
    SELECT way_id,
           row_number() OVER (PARTITION BY way_id ORDER BY seq, node_id) AS rn,
           count(*) OVER (PARTITION BY way_id) AS n,
           CAST((way_id * {WAY_ANCHOR_LON_MULT}) % 350000 - 175000
             + ((lon_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS x,
           CAST((way_id * {WAY_ANCHOR_LAT_MULT}) % 160000 - 80000
             + ((lat_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS y
    FROM joined
),
v AS (SELECT * FROM v0 WHERE n >= 2),
s1 AS (
    SELECT way_id, rn, n, x AS x0, y AS y0,
           lead(x) OVER w AS x1, lead(y) OVER w AS y1
    FROM v WINDOW w AS (PARTITION BY way_id ORDER BY rn)
    QUALIFY lead(x) OVER w IS NOT NULL
),
r1 AS (
    SELECT way_id, 0 AS j, 4 * x AS x, 4 * y AS y, 2 * n AS m
    FROM v WHERE rn = 1
    UNION ALL
    SELECT way_id, 2 * rn - 1, 3 * x0 + x1, 3 * y0 + y1, 2 * n FROM s1
    UNION ALL
    SELECT way_id, 2 * rn, x0 + 3 * x1, y0 + 3 * y1, 2 * n FROM s1
    UNION ALL
    SELECT way_id, 2 * n - 1, 4 * x, 4 * y, 2 * n FROM v WHERE rn = n
),
s2 AS (
    SELECT way_id, j, m, x AS x0, y AS y0,
           lead(x) OVER w AS x1, lead(y) OVER w AS y1
    FROM r1 WINDOW w AS (PARTITION BY way_id ORDER BY j)
    QUALIFY lead(x) OVER w IS NOT NULL
),
r2 AS (
    SELECT way_id, 4 * x AS x, 4 * y AS y FROM r1 WHERE j = 0
    UNION ALL
    SELECT way_id, 3 * x0 + x1, 3 * y0 + y1 FROM s2
    UNION ALL
    SELECT way_id, x0 + 3 * x1, y0 + 3 * y1 FROM s2
    UNION ALL
    SELECT way_id, 4 * x, 4 * y FROM r1 WHERE j = m - 1
)
SELECT way_id, CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(x) AS BIGINT) AS sx16, CAST(sum(y) AS BIGINT) AS sy16
FROM r2 GROUP BY way_id
"""


def ring_orientation_ds(sf_dir: str, n_buckets: int = 64) -> ray.data.Dataset:
    """Ring winding audit: close each assembled way cyclically and compute
    the integer shoelace twice-signed-area in the local mdeg frame — the
    orientation invariant Planetiler enforces during polygon assembly
    (outer rings positive, holes negative; ``OsmMultipolygon.java`` ring
    fixing, ``geo/multipolygon.py`` here).  Ways with < 3 vertices are
    dropped (no area).

    Fully vectorized group body: one lexsort, a cyclic next-vertex index
    (``nxt[ends-1] = starts``), one cross-product array and ONE
    ``np.add.reduceat`` — no per-way loop.  Exact int64 (|x|,|y| <=
    176e3 mdeg, <= 7 vertices per way => |area2| < 2^42).

    Output: way_id, n_pts, area2, winding (+1 CCW / -1 CW / 0 degenerate,
    y-up lon/lat frame).
    """

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["way_id", "seq", "node_id"])
        wid = g["way_id"].to_numpy()
        base_lat = (wid * WAY_ANCHOR_LAT_MULT) % 160000 - 80000
        base_lon = (wid * WAY_ANCHOR_LON_MULT) % 350000 - 175000
        y = base_lat + (g["lat_mdeg"].to_numpy() % 2000) - 1000
        x = base_lon + (g["lon_mdeg"].to_numpy() % 2000) - 1000
        n = len(wid)
        bounds = np.flatnonzero(np.diff(wid)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [n]])
        nxt = np.arange(1, n + 1)
        nxt[ends - 1] = starts  # close each ring cyclically
        cross = x * y[nxt] - x[nxt] * y
        area2 = np.add.reduceat(cross, starts)
        lens = ends - starts
        ok = lens >= 3
        return pd.DataFrame({
            "way_id": wid[starts[ok]],
            "n_pts": lens[ok],
            "area2": area2[ok],
            "winding": np.sign(area2[ok]).astype(np.int64),
        })

    return (
        join_way_nodes(sf_dir, n_buckets, emit_wbucket=True)
        .groupby("wbucket")
        .map_groups(lambda g: per_bucket(g.drop(columns=["wbucket"])),
                    batch_format="pandas")
    )


def sql_ring_orientation() -> str:
    """DuckDB mirror of :func:`ring_orientation_ds`: same local-frame
    integer vertices (double-mod for DuckDB's truncated ``%``), the
    closing edge via coalesce(lead, first_value), one SUM per way."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
v0 AS (
    SELECT way_id,
           row_number() OVER (PARTITION BY way_id ORDER BY seq, node_id) AS rn,
           count(*) OVER (PARTITION BY way_id) AS n,
           CAST((way_id * {WAY_ANCHOR_LON_MULT}) % 350000 - 175000
             + ((lon_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS x,
           CAST((way_id * {WAY_ANCHOR_LAT_MULT}) % 160000 - 80000
             + ((lat_mdeg % 2000) + 2000) % 2000 - 1000 AS BIGINT) AS y
    FROM joined
),
v AS (SELECT * FROM v0 WHERE n >= 3),
e AS (
    SELECT way_id, n, x AS x0, y AS y0,
           coalesce(lead(x) OVER w, first_value(x) OVER w) AS x1,
           coalesce(lead(y) OVER w, first_value(y) OVER w) AS y1
    FROM v WINDOW w AS (PARTITION BY way_id ORDER BY rn)
),
a AS (
    SELECT way_id, any_value(n) AS n_pts,
           SUM(x0 * y1 - x1 * y0) AS area2
    FROM e GROUP BY 1)
SELECT way_id, CAST(n_pts AS BIGINT) AS n_pts, CAST(area2 AS BIGINT) AS area2,
       CAST(CASE WHEN area2 > 0 THEN 1 WHEN area2 < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS winding
FROM a ORDER BY 1
"""


def overlay_area(sf_dir: str) -> ray.data.Dataset:
    """Vector overlay join: Σ area(bbox(way) ∩ admin_box) per admin zone,
    exact integer mdeg² — the polygon-overlay building block (zonal
    apportionment, coverage accounting) on the rectangular fast path.

    Scale shape: way bboxes need NO join (node coords derive from
    l_partkey by formula) — per-batch min/max partials (run-boundary
    reduceat) -> ONE hash-bucket shuffle with a fused per-bucket
    merge+clip body (lexsort + reduceat; Ray's built-in Min/Max
    Aggregate at this key cardinality measured ~10x slower) -> rect∩rect
    against the BROADCAST 5x5 admin grid (a constant; never shipped per
    row) -> tiny per-admin sum.  All arithmetic int64: overlaps
    ≤ 6.1e10 mdeg² per way, sums ≤ 9e15 per 150k ways — headroom to
    ~10^8 ways per partial."""
    from ray.data.aggregate import Sum

    from .flagship import shuffle_partitions

    n_buckets = shuffle_partitions()

    def node_partial(batch: pa.Table) -> pa.Table:
        wid = batch.column("l_orderkey").to_numpy()
        nid = batch.column("l_partkey").to_numpy()
        lat = (nid * NODE_LAT_MULT) % 170000 - 85000
        lon = (nid * NODE_LON_MULT) % 360000 - 180000
        # run-boundary reduceat, not ufunc.at (unbuffered scatter is ~10x
        # slower); lineitem is written orderkey-sorted so the argsort is
        # usually skipped entirely
        if not np.all(wid[:-1] <= wid[1:]):
            order = np.argsort(wid, kind="stable")
            wid, lat, lon = wid[order], lat[order], lon[order]
        starts = np.concatenate(
            [[0], np.flatnonzero(np.diff(wid)) + 1])
        u = wid[starts]
        lo_la = np.minimum.reduceat(lat, starts)
        hi_la = np.maximum.reduceat(lat, starts)
        lo_lo = np.minimum.reduceat(lon, starts)
        hi_lo = np.maximum.reduceat(lon, starts)
        return pa.table({
            "way_id": pa.array(u, pa.int64()),
            "lat_lo_p": pa.array(lo_la, pa.int64()),
            "lat_hi_p": pa.array(hi_la, pa.int64()),
            "lon_lo_p": pa.array(lo_lo, pa.int64()),
            "lon_hi_p": pa.array(hi_lo, pa.int64()),
            "wbucket": pa.array(u % n_buckets, pa.int64()),
        })

    # the broadcast small side: 25 admin rects (row-major 5x5 mdeg grid)
    rows = np.arange(25) // 5
    cols = np.arange(25) % 5
    g_lat_lo = rows * 34000 - 85000
    g_lat_hi = g_lat_lo + 34000
    g_lon_lo = cols * 72000 - 180000
    g_lon_hi = g_lon_lo + 72000

    def merge_clip(g: pa.Table) -> pa.Table:
        # fused per-bucket merge (lexsort + reduceat over partials — Ray's
        # built-in Min/Max Aggregate at 150k keys measured ~10x slower than
        # this bucketed body) + rect∩rect against the broadcast grid
        if g.num_rows == 0:  # guard: reduceat(starts=[0]) raises on empty
            return pa.schema([("admin_id", pa.int64()),
                              ("area_p", pa.int64()),
                              ("n_p", pa.int64())]).empty_table()
        wid = g.column("way_id").to_numpy()
        order = np.argsort(wid, kind="stable")
        wid_s = wid[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(wid_s)) + 1])
        la_lo = np.minimum.reduceat(
            g.column("lat_lo_p").to_numpy()[order], starts)[:, None]
        la_hi = np.maximum.reduceat(
            g.column("lat_hi_p").to_numpy()[order], starts)[:, None]
        lo_lo = np.minimum.reduceat(
            g.column("lon_lo_p").to_numpy()[order], starts)[:, None]
        lo_hi = np.maximum.reduceat(
            g.column("lon_hi_p").to_numpy()[order], starts)[:, None]
        dy = np.maximum(
            0, np.minimum(la_hi, g_lat_hi[None]) - np.maximum(la_lo, g_lat_lo[None]))
        dx = np.maximum(
            0, np.minimum(lo_hi, g_lon_hi[None]) - np.maximum(lo_lo, g_lon_lo[None]))
        area = dx * dy  # (n_ways, 25)
        return pa.table({
            "admin_id": pa.array(np.arange(25, dtype=np.int64), pa.int64()),
            "area_p": pa.array(area.sum(axis=0).astype(np.int64), pa.int64()),
            "n_p": pa.array((area > 0).sum(axis=0).astype(np.int64), pa.int64()),
        })

    return (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_orderkey", "l_partkey"])
        .map_batches(node_partial, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(merge_clip, batch_format="pyarrow")
        .groupby("admin_id")
        .aggregate(Sum("area_p", alias_name="overlap_mdeg2"),
                   Sum("n_p", alias_name="n_ways"))
        .filter(expr="overlap_mdeg2 > 0 or n_ways > 0")
    )


def sql_overlay_area() -> str:
    """Twin of :func:`overlay_area` — the same bbox + rect∩rect arithmetic
    in BIGINT over a generate_series admin grid."""
    return f"""
WITH nodes AS (
    SELECT l_orderkey AS way_id,
           (l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat,
           (l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon
    FROM lineitem
),
bbox AS (
    SELECT way_id, min(lat) AS lat_lo, max(lat) AS lat_hi,
           min(lon) AS lon_lo, max(lon) AS lon_hi
    FROM nodes GROUP BY 1
),
grid AS (
    SELECT g.i AS admin_id,
           (g.i // 5) * 34000 - 85000 AS g_lat_lo,
           (g.i // 5) * 34000 - 51000 AS g_lat_hi,
           (g.i % 5) * 72000 - 180000 AS g_lon_lo,
           (g.i % 5) * 72000 - 108000 AS g_lon_hi
    FROM generate_series(0, 24) g(i)
),
cells AS (
    SELECT grid.admin_id,
           greatest(0, least(b.lat_hi, grid.g_lat_hi)
                       - greatest(b.lat_lo, grid.g_lat_lo))
         * greatest(0, least(b.lon_hi, grid.g_lon_hi)
                       - greatest(b.lon_lo, grid.g_lon_lo)) AS area
    FROM bbox b CROSS JOIN grid
)
SELECT admin_id, CAST(sum(area) AS BIGINT) AS overlap_mdeg2,
       CAST(count(*) FILTER (area > 0) AS BIGINT) AS n_ways
FROM cells GROUP BY 1
HAVING sum(area) > 0 OR count(*) FILTER (area > 0) > 0
"""


def sql_bearing_octants() -> str:
    """Twin of ``training.q_bearing_octants``: lag-window mdeg deltas with
    the pure-integer octant classification (no trig anywhere)."""
    return f"""
WITH joined AS (
    SELECT l.l_orderkey AS way_id, l.l_linenumber AS seq,
           l.l_partkey AS node_id,
           (l.l_partkey * {NODE_LAT_MULT}) % 170000 - 85000 AS lat_mdeg,
           (l.l_partkey * {NODE_LON_MULT}) % 360000 - 180000 AS lon_mdeg
    FROM lineitem l
),
deltas AS (
    SELECT way_id,
           lat_mdeg - lag(lat_mdeg) OVER w AS dlat,
           lon_mdeg - lag(lon_mdeg) OVER w AS dlon,
           lag(lat_mdeg) OVER w AS plat,
           lag(lon_mdeg) OVER w AS plon
    FROM joined
    WINDOW w AS (PARTITION BY way_id ORDER BY seq, node_id)
),
seg AS (
    SELECT CAST(floor((plat / 1000.0 + 85.0005) / 34.0) AS BIGINT) * 5
             + CAST(floor((plon / 1000.0 + 180.0005) / 72.0) AS BIGINT)
             AS admin_id,
           CASE WHEN abs(dlat) > 2 * abs(dlon)
                  THEN CASE WHEN dlat > 0 THEN 'N' ELSE 'S' END
                WHEN abs(dlon) > 2 * abs(dlat)
                  THEN CASE WHEN dlon > 0 THEN 'E' ELSE 'W' END
                WHEN dlat > 0
                  THEN CASE WHEN dlon > 0 THEN 'NE' ELSE 'NW' END
                ELSE CASE WHEN dlon > 0 THEN 'SE' ELSE 'SW' END
           END AS octant
    FROM deltas
    WHERE plat IS NOT NULL AND (dlat <> 0 OR dlon <> 0)
)
SELECT admin_id, octant, CAST(count(*) AS BIGINT) AS n_segments
FROM seg GROUP BY 1, 2 ORDER BY 1, 2
"""

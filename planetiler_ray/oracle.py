"""DuckDB oracle SQL builders — the independent re-derivation of every
pipeline result from the raw sf tables.

The driver registers views ``region nation customer supplier part orders
lineitem events documents embeddings`` and compares each ``queries()`` result
against these SQL strings (row count + schema + order-insensitive value
hash).  The SQL reconstructs the synthetic world (pages / mentions / admin
rects / POIs) by the SAME integer arithmetic as
``planetiler_ray.sources.pages`` / ``world`` — constants are imported from
those modules so the two sides cannot drift apart silently.

Floating-point discipline: every double expression here mirrors the numpy
expression structure bit-for-bit (same operand order); coordinates flow
through integer millidegrees.
"""

from __future__ import annotations

from .sources import pages as P
from .sources import world as W
from .geo.mercator import MAX_LAT

# ---------------------------------------------------------------- mentions --

MENTIONS_CTE = f"""
mentions AS (
    SELECT d.doc_id,
           j.j AS mention_idx,
           (d.doc_id * {P.LAT_MULT} + j.j * {P.LAT_STEP}) % {P.LAT_MOD} - {P.LAT_OFF} AS lat_mdeg,
           (d.doc_id * {P.LON_MULT} + j.j * {P.LON_STEP}) % {P.LON_MOD} - {P.LON_OFF} AS lon_mdeg
    FROM documents d
    CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
    WHERE j.j < d.doc_id % 4
    UNION ALL
    SELECT d.doc_id,
           d.doc_id % 4 AS mention_idx,
           {P.HOT_LAT_BASE} + d.doc_id % {P.HOT_LAT_MOD} AS lat_mdeg,
           {P.HOT_LON_BASE} + d.doc_id % {P.HOT_LON_MOD} AS lon_mdeg
    FROM documents d
    WHERE d.doc_id % {P.HOT_EVERY} = 0
)
"""

POINTS_CTE = (
    MENTIONS_CTE
    + """,
points AS (
    SELECT doc_id, mention_idx, lat_mdeg, lon_mdeg,
           lat_mdeg / 1000.0 AS lat,
           lon_mdeg / 1000.0 AS lon
    FROM mentions
)
"""
)


def sql_mentions() -> str:
    return f"WITH {MENTIONS_CTE} SELECT doc_id, mention_idx, lat_mdeg, lon_mdeg FROM mentions ORDER BY doc_id, mention_idx"


# ------------------------------------------------------------------- pages --

def sql_text_full() -> str:
    """SQL expression (over alias d = documents) reconstructing the page text."""

    def fmt_pair(lat_expr, lon_expr):
        return (
            f"'(' || printf('%.3f', ({lat_expr}) / 1000.0) || ', ' || "
            f"printf('%.3f', ({lon_expr}) / 1000.0) || ')'"
        )

    def fmt_labeled(lat_expr, lon_expr):
        return (
            f"'lat ' || printf('%.3f', ({lat_expr}) / 1000.0) || ' lon ' || "
            f"printf('%.3f', ({lon_expr}) / 1000.0)"
        )

    parts = ["d.text"]
    for j in range(3):
        lat = f"(d.doc_id * {P.LAT_MULT} + {j} * {P.LAT_STEP}) % {P.LAT_MOD} - {P.LAT_OFF}"
        lon = f"(d.doc_id * {P.LON_MULT} + {j} * {P.LON_STEP}) % {P.LON_MOD} - {P.LON_OFF}"
        fmt = fmt_pair(lat, lon) if j % 2 == 0 else fmt_labeled(lat, lon)
        parts.append(
            f"CASE WHEN d.doc_id % 4 > {j} THEN ' Location {j}: ' || {fmt} || '.' ELSE '' END"
        )
    hlat = f"{P.HOT_LAT_BASE} + d.doc_id % {P.HOT_LAT_MOD}"
    hlon = f"{P.HOT_LON_BASE} + d.doc_id % {P.HOT_LON_MOD}"
    parts.append(
        f"CASE WHEN d.doc_id % {P.HOT_EVERY} = 0 THEN ' Hot spot: ' || {fmt_pair(hlat, hlon)} || '.' ELSE '' END"
    )
    parts.append("'" + P.DECOY_SUFFIX.replace("'", "''") + "'")
    return " || ".join(parts)


def sql_pages_meta() -> str:
    """url + warc_ts + lang + md5 of the full page text, per page."""
    return f"""
SELECT 'https://example' || (d.doc_id % 997) || '.com/p/' || d.doc_id AS url,
       TIMESTAMP '2024-01-01 00:00:00' + d.doc_id * INTERVAL 1 SECOND AS warc_ts,
       d.lang AS lang,
       md5({sql_text_full()}) AS text_md5
FROM documents d
ORDER BY url
"""


# ------------------------------------------------------------------- tiles --

def sql_tile_expr(lat_expr: str, lon_expr: str, z: str) -> tuple[str, str]:
    """(tile_x_sql, tile_y_sql) mirroring geo.mercator exactly."""
    n = f"(1 << {z})"
    worldx = f"(({lon_expr}) + 180.0) / 360.0"
    sinlat = (
        f"sin(radians(least(greatest({lat_expr}, {-MAX_LAT!r}), {MAX_LAT!r})))"
    )
    worldy = f"(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat})) / pi())"
    tx = f"CAST(least(greatest(floor({worldx} * {n}), 0), {n} - 1) AS BIGINT)"
    ty = f"CAST(least(greatest(floor({worldy} * {n}), 0), {n} - 1) AS BIGINT)"
    return tx, ty


def sql_tile_counts(zooms=(2, 6, 10, 14)) -> str:
    tx, ty = sql_tile_expr("p.lat", "p.lon", "z.z")
    zl = ", ".join(str(z) for z in zooms)
    return f"""
WITH {POINTS_CTE}
SELECT z.z AS z, {tx} AS tile_x, {ty} AS tile_y, COUNT(*) AS n
FROM points p CROSS JOIN (SELECT UNNEST([{zl}]) AS z) z
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --------------------------------------------------------------- PIP / kNN --

def sql_admin_join() -> str:
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    return f"""
WITH {POINTS_CTE}
SELECT p.doc_id, p.mention_idx, n.n_nationkey AS admin_id
FROM points p
JOIN nation n
  ON p.lon >= {lon_w} AND p.lon < {lon_w} + {W.ADMIN_LON_W}
 AND p.lat >= {lat_s} AND p.lat < {lat_s} + {W.ADMIN_LAT_H}
ORDER BY p.doc_id, p.mention_idx
"""


def sql_knn() -> str:
    poi_lon = f"((s.s_suppkey * {W.POI_LON_MULT}) % 360000 - 180000) / 1000.0"
    poi_lat = f"((s.s_suppkey * {W.POI_LAT_MULT}) % 170000 - 85000) / 1000.0"
    return f"""
WITH {POINTS_CTE},
dists AS (
    SELECT p.doc_id, p.mention_idx, s.s_suppkey AS poi_id,
           (p.lon - {poi_lon}) AS dx,
           (p.lat - {poi_lat}) AS dy
    FROM points p CROSS JOIN supplier s
),
ranked AS (
    SELECT doc_id, mention_idx, poi_id,
           row_number() OVER (PARTITION BY doc_id, mention_idx
                              ORDER BY dx * dx + dy * dy, poi_id) AS rn
    FROM dists
)
SELECT doc_id, mention_idx, poi_id FROM ranked WHERE rn = 1
ORDER BY doc_id, mention_idx
"""

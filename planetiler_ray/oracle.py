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


def sql_tile_invalidate(zooms=(2, 6)) -> str:
    """Mirror of ``training.q_tile_invalidate``: the v2-snapshot dirty
    predicate collapses to ``doc_id % 10 = 0 OR doc_id % 7 = 0`` (removed
    OR changed) over the same points CTE + tile chain as tile_counts."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", "z.z")
    zl = ", ".join(str(z) for z in zooms)
    return f"""
WITH {POINTS_CTE}
SELECT z.z AS z, {tx} AS tile_x, {ty} AS tile_y,
       CAST(COUNT(*) AS BIGINT) AS n_affected
FROM points p CROSS JOIN (SELECT UNNEST([{zl}]) AS z) z
WHERE p.doc_id % 10 = 0 OR p.doc_id % 7 = 0
GROUP BY 1, 2, 3
"""


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


def sql_prefix_filter() -> str:
    """Twin of ``webgeo.q_prefix_filter``: rebuild urls and the
    deterministic blocklist, keep pages matching any prefix."""
    return """
WITH pages AS (
    SELECT doc_id,
           'https://example' || CAST(doc_id % 997 AS VARCHAR)
             || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
    FROM documents),
pref AS (
    SELECT 'https://example' || CAST(g.generate_series AS VARCHAR)
             || '.com/' AS p
    FROM generate_series(0, 996, 13) g
    UNION ALL SELECT 'https://example7.com/p/1')
SELECT pg.doc_id, pg.url
FROM pages pg
WHERE EXISTS (SELECT 1 FROM pref WHERE starts_with(pg.url, pref.p))
ORDER BY pg.doc_id
"""


def sql_co_mentions() -> str:
    """Twin of ``webgeo.q_co_mentions``: distinct (doc, admin) via the box
    join, self-joined on doc with admin_a < admin_b, counted."""
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    return f"""
WITH {POINTS_CTE},
adm AS (
    SELECT DISTINCT p.doc_id, n.n_nationkey AS admin_id
    FROM points p JOIN nation n
      ON p.lon >= {lon_w} AND p.lon < {lon_w} + {W.ADMIN_LON_W}
     AND p.lat >= {lat_s} AND p.lat < {lat_s} + {W.ADMIN_LAT_H})
SELECT a.admin_id AS admin_a, b.admin_id AS admin_b, count(*) AS n_docs
FROM adm a JOIN adm b ON a.doc_id = b.doc_id AND a.admin_id < b.admin_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


def _sql_star_ctes() -> str:
    """Shared CTE chain rebuilding the star polygons (dirs/nat/verts/edges)
    on the integer microdegree lattice — used by sql_pip_complex and
    sql_rasterize_polygons."""
    dirs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate([
        (1000, 0), (866, 500), (500, 866), (0, 1000), (-500, 866),
        (-866, 500), (-1000, 0), (-866, -500), (-500, -866),
        (0, -1000), (500, -866), (866, -500)]))
    return f"""dirs(i, dx, dy) AS (VALUES {dirs}),
nat AS (
    SELECT n_nationkey AS star_id,
           (-144000 + (n_nationkey % 5) * 72000) * 1000 AS clon_u,
           (-68000 + (n_nationkey // 5) * 34000) * 1000 AS clat_u,
           14000 + n_nationkey * 97 AS r_out,
           5000 + n_nationkey * 53 AS r_in
    FROM nation),
verts AS (
    SELECT star_id, i,
           clon_u + dx * (CASE WHEN i % 2 = 0 THEN r_out ELSE r_in END) AS vx_u,
           clat_u + dy * (CASE WHEN i % 2 = 0 THEN r_out ELSE r_in END) AS vy_u
    FROM nat CROSS JOIN dirs),
edges AS (
    SELECT a.star_id,
           a.vx_u / 1000000.0 AS x0, a.vy_u / 1000000.0 AS y0,
           b.vx_u / 1000000.0 AS x1, b.vy_u / 1000000.0 AS y1
    FROM verts a JOIN verts b
      ON b.star_id = a.star_id AND b.i = (a.i + 1) % 12)"""


def sql_rasterize_polygons() -> str:
    """Twin of ``webgeo.q_rasterize_polygons``: 1-degree grid centers x the
    star edges through the same crossing inequality, odd-crossing cells
    counted per star."""
    return f"""
WITH {{stars}},
grid AS (
    SELECT lo.generate_series - 180 + 0.5 AS lon,
           la.generate_series - 85 + 0.5 AS lat
    FROM generate_series(0, 359) lo, generate_series(0, 169) la),
crossings AS (
    SELECT g.lon, g.lat, e.star_id, count(*) AS c
    FROM grid g JOIN edges e
      ON e.y1 != e.y0
     AND ((e.y0 > g.lat) != (e.y1 > g.lat))
     AND g.lon < e.x0 + (g.lat - e.y0) / (e.y1 - e.y0) * (e.x1 - e.x0)
    GROUP BY 1, 2, 3)
SELECT star_id, count(*) AS n_cells
FROM crossings WHERE c % 2 = 1
GROUP BY 1 ORDER BY 1
""".replace("{stars}", _sql_star_ctes())


def sql_pip_complex() -> str:
    """Twin of ``webgeo.q_pip_complex``: rebuild the star polygons on the
    integer µdeg lattice, run the even-odd crossing census with the exact
    inequality of ``geo.pip.points_in_ring`` (px < x0 + (py-y0)/(y1-y0)*
    (x1-x0); lower-inclusive y rule via (y0 > py) != (y1 > py))."""
    dirs = ", ".join(f"({i}, {dx}, {dy})" for i, (dx, dy) in enumerate([
        (1000, 0), (866, 500), (500, 866), (0, 1000), (-500, 866),
        (-866, 500), (-1000, 0), (-866, -500), (-500, -866),
        (0, -1000), (500, -866), (866, -500)]))
    return f"""
WITH {POINTS_CTE},
dirs(i, dx, dy) AS (VALUES {dirs}),
nat AS (
    SELECT n_nationkey AS star_id,
           (-144000 + (n_nationkey % 5) * 72000) * 1000 AS clon_u,
           (-68000 + (n_nationkey // 5) * 34000) * 1000 AS clat_u,
           14000 + n_nationkey * 97 AS r_out,
           5000 + n_nationkey * 53 AS r_in
    FROM nation),
verts AS (
    SELECT star_id, i,
           clon_u + dx * (CASE WHEN i % 2 = 0 THEN r_out ELSE r_in END) AS vx_u,
           clat_u + dy * (CASE WHEN i % 2 = 0 THEN r_out ELSE r_in END) AS vy_u
    FROM nat CROSS JOIN dirs),
edges AS (
    SELECT a.star_id,
           a.vx_u / 1000000.0 AS x0, a.vy_u / 1000000.0 AS y0,
           b.vx_u / 1000000.0 AS x1, b.vy_u / 1000000.0 AS y1
    FROM verts a JOIN verts b
      ON b.star_id = a.star_id AND b.i = (a.i + 1) % 12),
crossings AS (
    SELECT p.doc_id, p.mention_idx, e.star_id, count(*) AS c
    FROM points p JOIN edges e
      ON e.y1 != e.y0
     AND ((e.y0 > p.lat) != (e.y1 > p.lat))
     AND p.lon < e.x0 + (p.lat - e.y0) / (e.y1 - e.y0) * (e.x1 - e.x0)
    GROUP BY 1, 2, 3)
SELECT star_id, count(*) AS n_points
FROM crossings WHERE c % 2 = 1
GROUP BY 1 ORDER BY 1
"""


def sql_doc_geo_extent() -> str:
    """Twin of ``webgeo.q_doc_geo_extent``."""
    return f"""
WITH {POINTS_CTE}
SELECT doc_id, count(*) AS n_mentions,
       min(lat_mdeg) AS lat_min, max(lat_mdeg) AS lat_max,
       min(lon_mdeg) AS lon_min, max(lon_mdeg) AS lon_max
FROM points GROUP BY 1 ORDER BY 1
"""


def sql_box_join(span_cap: int = 20000) -> str:
    """Twin of ``webgeo.q_box_join``: per-doc integer-mdeg bbox, the
    compactness filter, then the quadratic overlap self-join (closed
    edges) the engine's grid scatter computes without a distinct pass."""
    return f"""
WITH {POINTS_CTE},
e AS (
    SELECT doc_id,
           min(lat_mdeg) AS lat_min, max(lat_mdeg) AS lat_max,
           min(lon_mdeg) AS lon_min, max(lon_mdeg) AS lon_max
    FROM points GROUP BY 1),
s AS (
    SELECT * FROM e
    WHERE lat_max - lat_min <= {span_cap} AND lon_max - lon_min <= {span_cap})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM s a JOIN s b ON a.doc_id < b.doc_id
 AND a.lon_min <= b.lon_max AND b.lon_min <= a.lon_max
 AND a.lat_min <= b.lat_max AND b.lat_min <= a.lat_max
ORDER BY 1, 2
"""


def sql_admin_centroid() -> str:
    """Twin of ``webgeo.q_admin_centroid``: box join + integer coordinate
    sums."""
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    return f"""
WITH {POINTS_CTE}
SELECT n.n_nationkey AS admin_id, count(*) AS n_points,
       CAST(sum(p.lat_mdeg) AS BIGINT) AS lat_sum,
       CAST(sum(p.lon_mdeg) AS BIGINT) AS lon_sum
FROM points p JOIN nation n
  ON p.lon >= {lon_w} AND p.lon < {lon_w} + {W.ADMIN_LON_W}
 AND p.lat >= {lat_s} AND p.lat < {lat_s} + {W.ADMIN_LAT_H}
GROUP BY 1 ORDER BY 1
"""


def sql_radius_join(radius: float = 25.0) -> str:
    """Twin of ``webgeo.q_radius_join``: LEFT join on the squared-euclidean
    degree-space distance test (pure IEEE arithmetic, no libm)."""
    poi_lon = f"((s.s_suppkey * {W.POI_LON_MULT}) % 360000 - 180000) / 1000.0"
    poi_lat = f"((s.s_suppkey * {W.POI_LAT_MULT}) % 170000 - 85000) / 1000.0"
    r2 = radius * radius
    return f"""
WITH {POINTS_CTE}
SELECT p.doc_id, p.mention_idx, count(s.s_suppkey) AS poi_within
FROM points p LEFT JOIN supplier s
  ON (p.lon - {poi_lon}) * (p.lon - {poi_lon})
   + (p.lat - {poi_lat}) * (p.lat - {poi_lat}) <= {r2!r}
GROUP BY 1, 2 ORDER BY 1, 2
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


# ====================================================== training-data ops ==

TOKENS_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+')"


def sql_exact_dedup() -> str:
    return """
SELECT min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY text
"""


def sql_jaccard_rare(threshold: float = 0.5, df_cap: int = 80) -> str:
    """Mirror of ``dedup.jaccard_pairs(df_cap=...)``: Jaccard over tokens
    with document frequency <= df_cap on the sampled corpus."""
    t = int(threshold * 1000)
    return f"""
WITH ws AS (
    SELECT doc_id, list_distinct({TOKENS_EXPR}) AS toks
    FROM documents WHERE doc_id % 5 = 0
),
alltoks AS (
    SELECT doc_id, UNNEST(toks) AS token FROM ws
),
df AS (SELECT token, count(*) AS df FROM alltoks GROUP BY 1),
rare AS (
    SELECT a.doc_id, a.token FROM alltoks a JOIN df USING (token)
    WHERE df.df <= {df_cap}
),
n AS (SELECT doc_id, count(*) AS n_tok FROM rare GROUP BY 1),
toks AS (SELECT r.doc_id, nn.n_tok, r.token FROM rare r JOIN n nn USING (doc_id)),
pairs AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, t1.n_tok AS na, t2.n_tok AS nb,
           count(*) AS shared
    FROM toks t1 JOIN toks t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT a, b, (shared * 1000) // (na + nb - shared) AS j1000
FROM pairs WHERE (shared * 1000) // (na + nb - shared) >= {t}
"""


def sql_jaccard_pairs(threshold: float = 0.5) -> str:
    t = int(threshold * 1000)
    return f"""
WITH ws AS (
    SELECT doc_id, list_distinct({TOKENS_EXPR}) AS toks
    FROM documents WHERE doc_id % 5 = 0
),
toks AS (
    SELECT doc_id, len(toks) AS n_tok, UNNEST(toks) AS token FROM ws
),
pairs AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, t1.n_tok AS na, t2.n_tok AS nb,
           count(*) AS shared
    FROM toks t1 JOIN toks t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT a, b, (shared * 1000) // (na + nb - shared) AS j1000
FROM pairs
WHERE (shared * 1000) // (na + nb - shared) >= {t}
"""


def sql_doc_repetition(k: int = 3) -> str:
    """Mirror of ``text.doc_repetition``: k-word shingles as joined strings
    (engine uses positional FNV-combined hashes — equal iff the word
    sequence is equal, modulo ~2^-65 collisions); short docs (0 < n < k)
    contribute one all-words shingle, exactly the engine's fallback."""
    return f"""
WITH w AS (
    SELECT doc_id, {TOKENS_EXPR} AS toks FROM documents
),
sh AS (
    SELECT doc_id, CASE
        WHEN len(toks) >= {k} THEN list_transform(
            range(1, len(toks) - {k - 2}),
            i -> array_to_string(toks[i : i + {k - 1}], ' '))
        WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
        ELSE [] END AS shingles
    FROM w
)
SELECT doc_id,
       len(shingles) AS n_shingles,
       len(list_distinct(shingles)) AS n_distinct,
       (len(shingles) - len(list_distinct(shingles))) * 10000
           // greatest(len(shingles), 1) AS rep_bp
FROM sh
"""


def sql_tfidf_topk(k: int = 3) -> str:
    """Mirror of ``training.q_tfidf_topk``: score = tf * ln(N / df) with
    the identical double expression; ties (equal score implies equal
    (tf, df)) broken by term ascending on both sides."""
    return f"""
WITH toks AS (
    SELECT doc_id, unnest({TOKENS_EXPR}) AS term FROM documents
),
tf AS (
    SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
),
df AS (
    SELECT term, count(*) AS df FROM tf GROUP BY 1
),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
ranked AS (
    SELECT f.doc_id, f.term, f.tf, d.df,
           row_number() OVER (
               PARTITION BY f.doc_id
               ORDER BY f.tf * ln((SELECT n FROM n) / d.df) DESC, f.term
           ) AS rk
    FROM tf f JOIN df d USING (term)
)
SELECT doc_id, term, tf, df FROM ranked WHERE rk <= {k}
"""


def sql_text_stats() -> str:
    return r"""
SELECT doc_id,
       length(text) AS n_chars_txt,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens,
       len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                       w -> w IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS n_stopwords,
       len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct
FROM documents
"""


QUALITY_STATS_CTE = r"""
    SELECT doc_id, text,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '\S+')) AS n_ws,
           len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_punct
    FROM documents
"""

# the quality_bp scoring expression (mirror of stages/text.quality_score) —
# shared by sql_quality and sql_corpus_clean so the two cannot drift
QUALITY_BP_EXPR = """least(greatest(
           (least(greatest(n_chars, 0), 2000) * 10000 // 2000
            + least(n_ws, 200) * 10000 // 200) // 2
           - least(n_punct * 10000 // greatest(n_chars, 1), 5000),
       0), 10000)"""


def sql_quality() -> str:
    return f"""
WITH s AS ({QUALITY_STATS_CTE})
SELECT doc_id, {QUALITY_BP_EXPR} AS quality_bp
FROM s
"""


def sql_langid() -> str:
    """Mirror of ``text.langid_ngram``: DISTINCT marker-word counts per
    language, argmax with the engine's fixed tie order (en, fr, de, es —
    numpy argmax takes the first maximum), 'und' when no marker hits.
    Marker lists are imported from the engine module so they cannot
    drift."""
    from .stages.text import _LANG_MARKERS, _LANGS

    score_cols = []
    for lang in _LANGS:
        marks = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
        score_cols.append(f"len(list_intersect(w, [{marks}])) AS {lang}")
    total = " + ".join(_LANGS)
    best = f"greatest({', '.join(_LANGS)})"
    # argmax cascade in _LANGS order = numpy first-max tie semantics
    cascade = "CASE WHEN {t} = 0 THEN 'und' ".format(t=total)
    for i, lang in enumerate(_LANGS[:-1]):
        conds = " AND ".join(f"{lang} >= {o}" for o in _LANGS[i + 1 :])
        cascade += f"WHEN {conds} THEN '{lang}' "
    cascade += f"ELSE '{_LANGS[-1]}' END"
    return f"""
WITH toks AS (
    SELECT doc_id,
           list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents
),
scores AS (
    SELECT doc_id, {", ".join(score_cols)} FROM toks
)
SELECT doc_id,
       {cascade} AS lang_guess,
       CASE WHEN {total} = 0 THEN 0
            ELSE {best} * 10000 // ({total}) END AS lang_conf_bp
FROM scores
"""


def sql_rare_postings(df_cap: int = 400) -> str:
    """Twin of ``text.rare_postings``: distinct (token, doc) pairs, df
    filter, ordered string_agg posting list."""
    return f"""
WITH tok AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
    FROM documents),
pairs AS (SELECT DISTINCT doc_id, unnest(ts) AS token FROM tok),
dfc AS (SELECT token, count(*) AS df FROM pairs GROUP BY 1)
SELECT p.token, CAST(d.df AS BIGINT) AS df,
       string_agg(CAST(p.doc_id AS VARCHAR), ',' ORDER BY p.doc_id)
         AS postings
FROM pairs p JOIN dfc d USING (token)
WHERE d.df <= {df_cap}
GROUP BY 1, 2 ORDER BY 1
"""


def sql_langs_above_median() -> str:
    """Twin of ``training.q_langs_above_median``: quantile_disc per lang
    HAVING > global quantile_disc."""
    return """
SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS median_len
FROM documents
GROUP BY 1
HAVING quantile_disc(n_chars, 0.5) >
       (SELECT quantile_disc(n_chars, 0.5) FROM documents)
ORDER BY 1
"""


def sql_langid_confusion() -> str:
    """Twin of ``training.q_langid_confusion``: the sql_langid guess logic
    grouped against the declared lang."""
    inner = sql_langid().strip().rstrip()
    return f"""
WITH guesses AS ({inner}),
decl AS (SELECT doc_id, lang FROM documents)
SELECT d.lang, g.lang_guess, count(*) AS n
FROM decl d JOIN guesses g USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_fingerprint() -> str:
    return """
SELECT doc_id, substr(md5(lower(text)), 1, 16) AS fp_md5 FROM documents
"""


def sql_ann_brute(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH q AS (
    SELECT vec_id AS qid, embedding AS e FROM embeddings WHERE vec_id < {n_queries}
),
sims AS (
    SELECT q.qid AS query_id, v.vec_id AS neighbor_id,
           list_cosine_similarity(q.e, v.embedding) AS sim
    FROM q CROSS JOIN embeddings v
    WHERE v.vec_id != q.qid
),
r AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM sims
)
SELECT query_id, rank, neighbor_id FROM r WHERE rank <= {k}
"""


def sql_pq_planted(k: int = 5) -> str:
    """Twin of ``training.q_pq_planted``: on the Hadamard-planted corpus the
    PQ/ADC scan is exact and q_m . v reduces to the base-9 positional
    integer below — a pure-BIGINT top-k per query."""
    return f"""
WITH sims AS (
    SELECT q.m, vec_id,
           ((((vec_id // 1) % 8) + q.m) % 8) * 1
         + ((((vec_id // 8) % 8) + q.m) % 8) * 9
         + ((((vec_id // 64) % 8) + q.m) % 8) * 81
         + ((((vec_id // 512) % 8) + q.m) % 8) * 729
         + ((((vec_id // 4096) % 8) + q.m) % 8) * 6561
         + ((((vec_id // 32768) % 8) + q.m) % 8) * 59049
         + ((((vec_id // 262144) % 8) + q.m) % 8) * 531441
         + ((((vec_id // 2097152) % 8) + q.m) % 8) * 4782969 AS sim
    FROM embeddings, (VALUES (0), (1), (2), (3)) AS q(m)
),
r AS (
    SELECT 9000001 + m AS query_id, vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY m ORDER BY sim DESC, vec_id) AS rank
    FROM sims
)
SELECT query_id, rank, neighbor_id FROM r WHERE rank <= {k}
"""


def sql_tpch_q18(qty_threshold: int = 300, k: int = 100) -> str:
    """Twin of ``training.q_tpch_q18`` (large-volume customers)."""
    return f"""
WITH hot AS (
    SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem GROUP BY 1
    HAVING sum(CAST(round(l_quantity) AS BIGINT)) > {qty_threshold}
),
j AS (
    SELECT c.c_name, o.o_custkey, o.o_orderkey,
           epoch_us(o.o_orderdate) AS odate_us,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_c,
           h.sum_qty
    FROM hot h
    JOIN orders o ON o.o_orderkey = h.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
),
r AS (
    SELECT *, row_number() OVER (ORDER BY totalprice_c DESC, o_orderkey) AS rn
    FROM j
)
SELECT c_name, o_custkey, o_orderkey, odate_us, totalprice_c, sum_qty
FROM r WHERE rn <= {k}
"""


def sql_lone_returner() -> str:
    """Twin of ``training.q_lone_returner`` (Q21-shaped lone-fault audit)."""
    return """
WITH ls AS (
    SELECT l_orderkey, l_suppkey,
           max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS had
    FROM lineitem GROUP BY 1, 2
),
o AS (
    SELECT l_orderkey, count(*) AS n_supp, sum(had) AS n_ret
    FROM ls GROUP BY 1
)
SELECT ls.l_suppkey, CAST(count(*) AS BIGINT) AS numwait
FROM ls JOIN o USING (l_orderkey)
WHERE ls.had = 1 AND o.n_supp >= 2 AND o.n_ret = 1
GROUP BY 1
"""


def sql_rollup_counts() -> str:
    """Twin of ``training.q_rollup_counts`` (sentinel-marked ROLLUP)."""
    return """
SELECT COALESCE(lang, '<all>') AS lang,
       COALESCE(source, '<all>') AS source,
       CAST(count(*) AS BIGINT) AS n
FROM documents GROUP BY ROLLUP(lang, source)
"""


def sql_melt_stats() -> str:
    """Twin of ``training.q_melt_stats`` (UNPIVOT to long triples)."""
    return """
SELECT doc_id, 'n_chars' AS metric, CAST(n_chars AS BIGINT) AS value
FROM documents
UNION ALL
SELECT doc_id, 'n_words' AS metric,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
FROM documents
"""


def sql_lang_head_concat(k: int = 8) -> str:
    """Twin of ``training.q_lang_head_concat`` (bounded ordered concat)."""
    return f"""
WITH r AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
    FROM documents
)
SELECT lang,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS head_ids
FROM r WHERE rn <= {k} GROUP BY lang
"""


def sql_qty_disc_corr() -> str:
    """Twin of ``training.q_qty_disc_corr`` (exact moment numerators)."""
    return """
WITH b AS (
    SELECT l_returnflag,
           CAST(round(l_quantity) AS BIGINT) AS x,
           CAST(round(l_discount * 100) AS BIGINT) AS y
    FROM lineitem
)
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       CAST(sum(x * y) AS BIGINT) AS sum_xy,
       CAST(sum(x * x) AS BIGINT) AS sum_x2,
       CAST(sum(y * y) AS BIGINT) AS sum_y2
FROM b GROUP BY 1
"""


def sql_modal_source() -> str:
    """Twin of ``training.q_modal_source`` (mode w/ lexicographic ties)."""
    return """
WITH c AS (
    SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2
),
r AS (
    SELECT *, row_number() OVER (PARTITION BY lang
                                 ORDER BY n DESC, source) AS rn
    FROM c
)
SELECT lang, source AS modal_source, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
"""


def sql_tpch_q10(lo: str = "1996-01-01", hi: str = "1996-04-01",
                 k: int = 20) -> str:
    """Twin of ``training.q_tpch_q10`` (returned-item revenue top-k)."""
    return f"""
WITH rev AS (
    SELECT o.o_custkey,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '{lo}'
      AND o.o_orderdate < TIMESTAMP '{hi}'
    GROUP BY 1
),
r AS (
    SELECT *, row_number() OVER (ORDER BY revenue DESC, o_custkey) AS rn
    FROM rev
)
SELECT r.o_custkey, c.c_name, r.revenue,
       CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c, n.n_name
FROM r
JOIN customer c ON c.c_custkey = r.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE r.rn <= {k}
"""


def sql_tpch_q19() -> str:
    """Twin of ``training.q_tpch_q19`` (disjunctive-predicate revenue)."""
    arms = [("Brand#12", 5, 1, 11), ("Brand#23", 10, 10, 20),
            ("Brand#7", 15, 20, 30)]
    conds = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size BETWEEN 1 AND {smax}"
        f" AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN {qlo} AND {qhi})"
        for b, smax, qlo, qhi in arms
    )
    return f"""
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))), 0)
            AS BIGINT) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {conds}
"""


def sql_tpch_q22(nation_mod: int = 3, since: str = "2000-01-01") -> str:
    """Twin of ``training.q_tpch_q22`` (global-balance anti join)."""
    return f"""
WITH pool AS (
    SELECT c_custkey, c_nationkey,
           CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
    FROM customer WHERE c_nationkey % {nation_mod} = 0
),
avg_ref AS (
    SELECT CAST(sum(bal_c) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
    FROM pool WHERE bal_c > 0
)
SELECT p.c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(p.bal_c) AS BIGINT) AS totacctbal_c
FROM pool p, avg_ref a
WHERE p.bal_c * a.n > a.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{since}')
GROUP BY 1
"""


def sql_props_stats() -> str:
    """Twin of ``training.q_props_stats`` (JSON scalar extraction)."""
    return """
WITH e AS (
    SELECT event_type,
           CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) AS k
    FROM events
    WHERE regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM e GROUP BY 1
"""


def sql_tpch_q7() -> str:
    """Twin of ``training.q_tpch_q7`` (nation-pair ship-year revenue)."""
    return """
SELECT c.c_nationkey AS c_nation, s.s_nationkey AS s_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
GROUP BY 1, 2, 3
"""


def sql_window() -> str:
    return """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS window_id,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""


def sql_trend_slope() -> str:
    """Twin of ``training.q_trend_slope``: hourly counts, per-type rebased
    hours, integer OLS moment algebra."""
    return """
WITH hourly AS (
    SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS y
    FROM events GROUP BY 1, 2),
reb AS (
    SELECT event_type, h - min(h) OVER (PARTITION BY event_type) AS x, y
    FROM hourly),
m AS (
    SELECT event_type, count(*) AS n,
           CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM reb GROUP BY 1)
SELECT event_type,
       CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
       CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
       CAST(n AS BIGINT) AS n_hours
FROM m ORDER BY 1
"""


def sql_active_seconds(window_us: int = 1_800_000_000) -> str:
    """Twin of ``training.q_active_seconds``: telescoping union length —
    first event contributes the full window, each later event
    min(window, gap)."""
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS tsu FROM events),
lagd AS (SELECT user_id, tsu,
                lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu) AS prev
         FROM e)
SELECT user_id,
       CAST(sum(CASE WHEN prev IS NULL THEN {window_us}
                     ELSE least({window_us}, tsu - prev) END) AS BIGINT)
         AS covered_us
FROM lagd GROUP BY 1 ORDER BY 1
"""


def sql_rolling_active(w: int = 24) -> str:
    """Twin of ``training.q_rolling_active``: banded self-join with
    count(DISTINCT user) per data hour."""
    return f"""
WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 3600000000 AS h
           FROM events),
hrs AS (SELECT DISTINCT h FROM e)
SELECT a.h, CAST(count(DISTINCT b.user_id) AS BIGINT) AS active_users
FROM hrs a JOIN e b ON b.h BETWEEN a.h - {w - 1} AND a.h
GROUP BY 1 ORDER BY 1
"""


def sql_burst_hours(w: int = 24) -> str:
    """Twin of ``training.q_burst_hours``: a zero-count hour can never
    burst (0 > 2*trail is false), so candidates are exactly the non-empty
    hours; the trailing CALENDAR-window sum is a banded self-join."""
    return f"""
WITH hourly AS (
    SELECT event_type, epoch_us(ts) // 3600000000 AS h, count(*) AS n
    FROM events GROUP BY 1, 2),
rng AS (SELECT event_type, min(h) AS lo FROM hourly GROUP BY 1)
SELECT a.event_type, a.h, CAST(a.n AS BIGINT) AS n,
       CAST(coalesce(sum(b.n), 0) AS BIGINT) AS trail
FROM hourly a
JOIN rng r ON r.event_type = a.event_type
LEFT JOIN hourly b ON b.event_type = a.event_type
    AND b.h BETWEEN a.h - {w} AND a.h - 1
WHERE a.h >= r.lo + {w}
GROUP BY 1, 2, a.n
HAVING a.n * {w} > 2 * coalesce(sum(b.n), 0)
ORDER BY 1, 2
"""


def sql_decay_score(max_shift: int = 40) -> str:
    """Twin of ``training.q_decay_score``: bit-shift halving vs the max
    event hour (positive cents only, so // == >> exactly)."""
    return f"""
WITH mx AS (SELECT max(epoch_us(ts) // 3600000000) AS ref FROM events),
e AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) // 3600000000 AS h
      FROM events),
d AS (SELECT event_type,
             cents // (CAST(1 AS BIGINT) << least(mx.ref - e.h, {max_shift}))
               AS c
      FROM e CROSS JOIN mx WHERE cents > 0)
SELECT event_type, CAST(sum(c) AS BIGINT) AS heat, count(*) AS n_events
FROM d GROUP BY 1 ORDER BY 1
"""


def sql_readability() -> str:
    """Twin of ``training.q_readability``: DuckDB RE2 match counts + the
    same floor arithmetic."""
    return """
WITH f AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT)
             AS n_words,
           CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT)
             AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiou]+')) AS BIGINT)
             AS n_vowel_groups
    FROM documents)
SELECT doc_id, n_words, n_sentences, n_vowel_groups,
       CAST(206835 - (1015 * n_words) // greatest(n_sentences, 1)
            - (84600 * n_vowel_groups) // greatest(n_words, 1) AS BIGINT)
         AS flesch_milli
FROM f ORDER BY 1
"""


def sql_sessionize() -> str:
    return """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
m AS (
    SELECT user_id, event_id, tsu,
           CASE WHEN lag(tsu) OVER w IS NULL
                     OR tsu - lag(tsu) OVER w > 1800000000 THEN 1 ELSE 0 END AS new
    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
),
s AS (
    SELECT user_id, tsu,
           CAST(sum(new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                          ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
    FROM m
)
SELECT user_id, session_id, count(*) AS n_events,
       min(tsu) AS start_us, max(tsu) AS end_us
FROM s GROUP BY 1, 2
"""


def sql_kanon_audit(k: int = 5, bucket: int = 64) -> str:
    """Twin of ``training.q_kanon_audit``: GROUP BY quasi-identifier,
    HAVING count < k."""
    return f"""
SELECT lang, length(text) // {bucket} AS len_bucket, count(*) AS n_docs
FROM documents
GROUP BY 1, 2 HAVING count(*) < {k}
ORDER BY 1, 2
"""


def sql_max_streak() -> str:
    """Twin of ``events.max_streak``: the classic day - row_number() island
    key over distinct (user, day)."""
    return """
WITH d AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
isl AS (
    SELECT user_id, day,
           day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
    FROM d),
lens AS (
    SELECT user_id, count(*) AS len FROM isl GROUP BY user_id, grp)
SELECT user_id, CAST(max(len) AS BIGINT) AS max_streak
FROM lens GROUP BY 1 ORDER BY 1
"""


def sql_inter_event_gaps(cap_min: int = 120) -> str:
    """Twin of ``events.inter_event_gaps``: lag() per user, minute-bucketed
    and capped, counted."""
    return f"""
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tsu FROM events),
g AS (
    SELECT tsu - lag(tsu) OVER (PARTITION BY user_id ORDER BY tsu, event_id)
           AS gap
    FROM e)
SELECT least(gap // 60000000, {cap_min}) AS gap_min, count(*) AS n_gaps
FROM g WHERE gap IS NOT NULL GROUP BY 1 ORDER BY 1
"""


def sql_asof() -> str:
    return """
SELECT event_id, user_id, COALESCE(last_view, -1) AS view_event_id
FROM (
    SELECT event_id, user_id, event_type,
           last_value(CASE WHEN event_type = 'view' THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view
    FROM events
)
WHERE event_type = 'click'
"""


def sql_topk_events(k: int = 10) -> str:
    return f"""
SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents
FROM events
ORDER BY cents DESC, event_id
LIMIT {k}
"""


def sql_lineitem_agg() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price,
       count(*) AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def sql_distinct_langs() -> str:
    return "SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2"


def sql_semi_join() -> str:
    return """
SELECT o.o_orderkey, o.o_custkey
FROM orders o
WHERE o.o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
"""


def sql_hash_sample() -> str:
    return """
SELECT event_id, user_id, event_type
FROM events
WHERE (event_id * 2654435761 % 4294967296) % 16 = 0
"""


def sql_sliding_window(window_us: int = 3600_000_000, slide_us: int = 1800_000_000) -> str:
    k = window_us // slide_us
    return f"""
WITH j AS (SELECT UNNEST(range({k})) AS j),
e AS (
    SELECT user_id, epoch_us(ts) AS tsu,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
w AS (
    SELECT e.user_id,
           ((e.tsu - j.j * {slide_us}) // {window_us}) * {window_us}
               + j.j * {slide_us} AS win_start,
           e.cents
    FROM e CROSS JOIN j
    WHERE ((e.tsu - j.j * {slide_us}) // {window_us}) * {window_us}
              + j.j * {slide_us} >= 0
)
SELECT user_id, win_start, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM w GROUP BY 1, 2
"""


def sql_median_by_type() -> str:
    return """
SELECT event_type,
       quantile_disc(CAST(round(value * 100) AS BIGINT), 0.5) AS median_cents,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def sql_pip_nearest() -> str:
    """Containing-or-nearest over the EVEN admin rects: distance to a rect is
    the clamped-delta euclidean (0 when contained); first by dist2, then id."""
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    return f"""
WITH {POINTS_CTE},
rects AS (
    SELECT n.n_nationkey AS admin_id,
           {lon_w} AS lon0, {lon_w} + {W.ADMIN_LON_W} AS lon1,
           {lat_s} AS lat0, {lat_s} + {W.ADMIN_LAT_H} AS lat1
    FROM nation n WHERE n.n_nationkey % 2 = 0
),
dists AS (
    SELECT p.doc_id, p.mention_idx, r.admin_id,
           greatest(r.lon0 - p.lon, p.lon - r.lon1, 0.0) AS dx,
           greatest(r.lat0 - p.lat, p.lat - r.lat1, 0.0) AS dy
    FROM points p CROSS JOIN rects r
),
ranked AS (
    SELECT doc_id, mention_idx, admin_id,
           row_number() OVER (PARTITION BY doc_id, mention_idx
                              ORDER BY dx * dx + dy * dy, admin_id) AS rn
    FROM dists
)
SELECT doc_id, mention_idx, admin_id FROM ranked WHERE rn = 1
"""


# ----------------------------------------------------- s2/hex cell mirror --

def _sql_hilbert_ctes(src: str, order: int, keep: str):
    """Unrolled Hilbert xy->d (mirror of ``geo/hilbert.xy_to_hilbert``) as
    chained CTEs.  ``src`` must provide BIGINT columns hx, hy plus the
    ``keep`` passthrough columns.  Returns (cte_sql, final_cte_name) where
    the final CTE has column ``d``."""
    ctes = [
        f"h_init AS (SELECT {keep}, hx AS x, hy AS y, CAST(0 AS BIGINT) AS d FROM {src})"
    ]
    prev = "h_init"
    for k in range(order - 1, -1, -1):
        s = 1 << k
        name = f"h_{s}"
        ctes.append(f"""{name} AS (
    SELECT {keep},
           CASE WHEN ry = 0 THEN yf ELSE xf END AS x,
           CASE WHEN ry = 0 THEN xf ELSE yf END AS y,
           d + {s * s} * (CASE WHEN rx = 0 AND ry = 0 THEN 0
                               WHEN rx = 0 THEN 1
                               WHEN ry = 0 THEN 3 ELSE 2 END) AS d
    FROM (
        SELECT {keep}, x, y, d, rx, ry,
               CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - x ELSE x END AS xf,
               CASE WHEN ry = 0 AND rx = 1 THEN {s - 1} - y ELSE y END AS yf
        FROM (
            SELECT {keep}, x, y, d,
                   CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx,
                   CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry
            FROM {prev}
        )
    )
)""")
        prev = name
    return ",\n".join(ctes), prev


def sql_raster_regions(z: int = 6, threshold: int = 2) -> str:
    """Twin of ``stages.tiling.raster_regions``: rebuild the occupied-cell
    raster from the mention points, then label 4-connected regions via a
    recursive transitive-closure CTE (min reachable cell id == the engine's
    min-label propagation fixpoint)."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2 HAVING count(*) >= {threshold}),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells),
adj AS (
    SELECT a.cell AS u, b.cell AS v FROM c a JOIN c b ON b.cell = a.cell + 1 AND a.x < {n} - 1
    UNION ALL
    SELECT a.cell AS u, b.cell AS v FROM c a JOIN c b ON b.cell = a.cell + {n}
),
bi AS (SELECT u, v FROM adj UNION ALL SELECT v AS u, u AS v FROM adj),
reach(cell, lab) AS (
    SELECT cell, cell AS lab FROM c
    UNION
    SELECT e.v AS cell, r.lab FROM reach r JOIN bi e ON e.u = r.cell
),
comp AS (SELECT cell, min(lab) AS region_id FROM reach GROUP BY cell),
agg AS (
    SELECT comp.region_id,
           count(*) AS n_cells,
           CAST(sum(c.n) AS BIGINT) AS n_points,
           min(c.x) AS min_x, min(c.y) AS min_y,
           max(c.x) AS max_x, max(c.y) AS max_y
    FROM comp JOIN c USING (cell)
    GROUP BY 1),
epr AS (
    SELECT comp.region_id, count(*) AS e
    FROM adj JOIN comp ON comp.cell = adj.u
    GROUP BY 1)
SELECT agg.region_id, agg.n_cells, agg.n_points,
       CAST(4 * agg.n_cells - 2 * coalesce(epr.e, 0) AS BIGINT) AS perimeter,
       agg.min_x, agg.min_y, agg.max_x, agg.max_y
FROM agg LEFT JOIN epr USING (region_id)
ORDER BY 1
"""


def sql_zone_diameter() -> str:
    """Twin of ``webgeo.q_zone_diameter`` by brute force: per-zone
    self-join max pairwise squared distance (the engine goes through the
    hull merge — different algorithm, same integer)."""
    return f"""
WITH {MENTIONS_CTE},
zp AS (
    SELECT CAST(floor((lat_mdeg / 1000.0 + 85.0005) / 34.0) AS BIGINT) * 5
         + CAST(floor((lon_mdeg / 1000.0 + 180.0005) / 72.0) AS BIGINT)
           AS admin_id,
           lon_mdeg AS x, lat_mdeg AS y
    FROM mentions)
SELECT a.admin_id,
       CAST(max((a.x - b.x) * (a.x - b.x)
              + (a.y - b.y) * (a.y - b.y)) AS BIGINT) AS diam2
FROM zp a JOIN zp b ON a.admin_id = b.admin_id
GROUP BY 1 ORDER BY 1
"""


def sql_flow_accumulation(z: int = 6) -> str:
    """Twin of ``webgeo.q_flow_accumulation``: the same strictly-denser
    max-neighbor routing (ties -> smallest target id), accumulation via a
    recursive ancestor closure."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells0 AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells0),
nb AS (
    SELECT a.cell AS src, a.n AS an, b.cell AS dst, b.n AS bn
    FROM c a JOIN c b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1 AND a.cell <> b.cell),
flow AS (
    SELECT src AS cell, dst FROM (
        SELECT nb.*, row_number() OVER (PARTITION BY src
                                        ORDER BY bn DESC, dst) AS rn
        FROM nb) WHERE rn = 1 AND bn > an),
reach(cell, anc) AS (
    SELECT cell, cell AS anc FROM c
    UNION
    SELECT f.dst AS cell, r.anc FROM reach r JOIN flow f ON f.cell = r.cell
),
acc AS (SELECT cell, count(*) AS acc FROM reach GROUP BY 1)
SELECT c.cell, CAST(c.n AS BIGINT) AS n, CAST(acc.acc AS BIGINT) AS acc,
       CAST(CASE WHEN f.cell IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_sink
FROM c JOIN acc USING (cell) LEFT JOIN flow f ON f.cell = c.cell
ORDER BY 1
"""


def sql_watershed_labels(z: int = 6) -> str:
    """Twin of ``webgeo.q_watershed_labels``: the same flow edges, each
    cell's path walked recursively to its terminal sink."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells0 AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells0),
nb AS (
    SELECT a.cell AS src, a.n AS an, b.cell AS dst, b.n AS bn
    FROM c a JOIN c b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1 AND a.cell <> b.cell),
flow AS (
    SELECT src AS cell, dst FROM (
        SELECT nb.*, row_number() OVER (PARTITION BY src
                                        ORDER BY bn DESC, dst) AS rn
        FROM nb) WHERE rn = 1 AND bn > an),
walk(cell, cur) AS (
    SELECT cell, cell AS cur FROM c
    UNION
    SELECT w.cell, f.dst AS cur FROM walk w JOIN flow f ON f.cell = w.cur
)
SELECT w.cell, w.cur AS sink
FROM walk w
WHERE w.cur NOT IN (SELECT cell FROM flow)
ORDER BY 1
"""


def sql_basin_depth(z: int = 6) -> str:
    """Twin of ``webgeo.q_basin_depth``: recursive step-count walk to the
    sink (unique path per cell, so UNION ALL terminates), depth census."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells0 AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells0),
nb AS (
    SELECT a.cell AS src, a.n AS an, b.cell AS dst, b.n AS bn
    FROM c a JOIN c b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1 AND a.cell <> b.cell),
flow AS (
    SELECT src AS cell, dst FROM (
        SELECT nb.*, row_number() OVER (PARTITION BY src
                                        ORDER BY bn DESC, dst) AS rn
        FROM nb) WHERE rn = 1 AND bn > an),
walk(cell, cur, d) AS (
    SELECT cell, cell AS cur, 0 AS d FROM c
    UNION ALL
    SELECT w.cell, f.dst AS cur, w.d + 1 FROM walk w
    JOIN flow f ON f.cell = w.cur
),
depth AS (SELECT w.cell, w.d FROM walk w
          WHERE w.cur NOT IN (SELECT cell FROM flow))
SELECT d AS depth, count(*) AS n_cells FROM depth GROUP BY 1 ORDER BY 1
"""


def sql_ridge_cells(z: int = 6) -> str:
    """Twin of ``webgeo.q_ridge_cells``: sink per cell via the recursive
    walk, rook-adjacent cells with different sinks counted per unordered
    sink pair."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells0 AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells0),
nb AS (
    SELECT a.cell AS src, a.n AS an, b.cell AS dst, b.n AS bn
    FROM c a JOIN c b
      ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1 AND a.cell <> b.cell),
flow AS (
    SELECT src AS cell, dst FROM (
        SELECT nb.*, row_number() OVER (PARTITION BY src
                                        ORDER BY bn DESC, dst) AS rn
        FROM nb) WHERE rn = 1 AND bn > an),
walk(cell, cur) AS (
    SELECT cell, cell AS cur FROM c
    UNION
    SELECT w.cell, f.dst AS cur FROM walk w JOIN flow f ON f.cell = w.cur
),
sink AS (SELECT w.cell, w.cur AS sink FROM walk w
         WHERE w.cur NOT IN (SELECT cell FROM flow)),
adj AS (
    SELECT a.cell AS u, b.cell AS v FROM c a JOIN c b
        ON b.cell = a.cell + 1 AND a.x < {n} - 1
    UNION ALL
    SELECT a.cell AS u, b.cell AS v FROM c a JOIN c b
        ON b.cell = a.cell + {n}
)
SELECT least(su.sink, sv.sink) AS sink_a,
       greatest(su.sink, sv.sink) AS sink_b,
       count(*) AS n_edges
FROM adj JOIN sink su ON su.cell = adj.u
JOIN sink sv ON sv.cell = adj.v
WHERE su.sink <> sv.sink
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_line_of_sight(z: int = 6, threshold: int = 2, k: int = 8) -> str:
    """Twin of ``webgeo.q_line_of_sight``: same top-k towers, the same
    rounded-DDA walk via a constant step series filtered per pair."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    fd = (lambda num, den:
          f"CAST(floor(({num}) / (2.0 * {den})) AS BIGINT)")
    xi = fd("2 * st.i * (st.bx - st.ax) + st.s", "st.s")
    yi = fd("2 * st.i * (st.qy - st.ay) + st.s", "st.s")
    return f"""
WITH {POINTS_CTE},
cells AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2 HAVING count(*) >= {threshold}),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells),
tw AS (SELECT cell, x, y FROM (
         SELECT c.*, row_number() OVER (ORDER BY n DESC, cell) AS rk FROM c)
       WHERE rk <= {k}),
pairs AS (
    SELECT a.cell AS cell_a, a.x AS ax, a.y AS ay,
           b.cell AS cell_b, b.x AS bx, b.y AS qy,
           greatest(abs(b.x - a.x), abs(b.y - a.y)) AS s
    FROM tw a JOIN tw b ON a.cell < b.cell),
steps AS (
    SELECT p.*, gs.i FROM pairs p
    CROSS JOIN (SELECT unnest(range(1, {n})) AS i) gs
    WHERE gs.i < p.s),
blocked AS (
    SELECT st.cell_a, st.cell_b, count(*) AS blk
    FROM steps st
    JOIN c ON c.cell = (st.ay + {yi}) * {n} + (st.ax + {xi})
    GROUP BY 1, 2)
SELECT p.cell_a, p.cell_b,
       CAST(coalesce(b.blk, 0) AS BIGINT) AS n_blockers,
       CAST(CASE WHEN coalesce(b.blk, 0) = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS visible
FROM (SELECT DISTINCT cell_a, cell_b FROM pairs) p
LEFT JOIN blocked b USING (cell_a, cell_b)
ORDER BY 1, 2
"""


def sql_dbscan_census(z: int = 6, minpts: int = 3) -> str:
    """Twin of ``webgeo.q_dbscan_census``: rebuild the raster, 3x3 density
    via a bounded self-join, clusters via the recursive transitive-closure
    CTE, border = min adjacent cluster, plus the always-emitted noise row."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH RECURSIVE {POINTS_CTE},
cells0 AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
c AS (SELECT y * {n} + x AS cell, x, y, n FROM cells0),
nb AS (
    SELECT a.cell, CAST(sum(b.n) AS BIGINT) AS dens
    FROM c a JOIN c b ON abs(a.x - b.x) <= 1 AND abs(a.y - b.y) <= 1
    GROUP BY 1),
core AS (SELECT c.* FROM c JOIN nb USING (cell) WHERE nb.dens >= {minpts}),
adj AS (
    SELECT a.cell AS u, b.cell AS v FROM core a JOIN core b
        ON b.cell = a.cell + 1 AND a.x < {n} - 1
    UNION ALL
    SELECT a.cell AS u, b.cell AS v FROM core a JOIN core b
        ON b.cell = a.cell + {n}
),
bi AS (SELECT u, v FROM adj UNION ALL SELECT v AS u, u AS v FROM adj),
reach(cell, lab) AS (
    SELECT cell, cell AS lab FROM core
    UNION
    SELECT e.v AS cell, r.lab FROM reach r JOIN bi e ON e.u = r.cell
),
comp AS (SELECT cell, min(lab) AS cluster_id FROM reach GROUP BY cell),
clusters AS (
    SELECT comp.cluster_id, count(*) AS core_cells,
           CAST(sum(core.n) AS BIGINT) AS core_points
    FROM comp JOIN core USING (cell) GROUP BY 1),
noncore AS (SELECT c.* FROM c WHERE c.cell NOT IN (SELECT cell FROM core)),
border AS (
    SELECT nc.cell, min(nc.n) AS n, min(comp.cluster_id) AS cluster_id
    FROM noncore nc
    JOIN core k ON abs(nc.x - k.x) + abs(nc.y - k.y) = 1
    JOIN comp ON comp.cell = k.cell
    GROUP BY nc.cell),
bstats AS (
    SELECT cluster_id, count(*) AS other_cells,
           CAST(sum(n) AS BIGINT) AS other_points
    FROM border GROUP BY 1),
noise AS (
    SELECT CAST(-1 AS BIGINT) AS cluster_id,
           CAST(0 AS BIGINT) AS core_cells, CAST(0 AS BIGINT) AS core_points,
           count(*) AS other_cells,
           CAST(coalesce(sum(n), 0) AS BIGINT) AS other_points
    FROM noncore WHERE cell NOT IN (SELECT cell FROM border))
SELECT cl.cluster_id, cl.core_cells, cl.core_points,
       CAST(coalesce(b.other_cells, 0) AS BIGINT) AS other_cells,
       CAST(coalesce(b.other_points, 0) AS BIGINT) AS other_points
FROM clusters cl LEFT JOIN bstats b USING (cluster_id)
UNION ALL
SELECT * FROM noise
ORDER BY 1
"""


def sql_admin_top_terms(k: int = 3) -> str:
    """Twin of ``webgeo.q_admin_top_terms``: first-mention admin box join,
    token counts per admin, row_number top-k (ties token ASC)."""
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    return f"""
WITH {POINTS_CTE},
da AS (
    SELECT p.doc_id, n.n_nationkey AS admin_id
    FROM points p JOIN nation n
      ON p.lon >= {lon_w} AND p.lon < {lon_w} + {W.ADMIN_LON_W}
     AND p.lat >= {lat_s} AND p.lat < {lat_s} + {W.ADMIN_LAT_H}
    WHERE p.mention_idx = 0),
toks AS (
    SELECT da.admin_id,
           unnest(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS token
    FROM documents d JOIN da USING (doc_id)),
c AS (SELECT admin_id, token, count(*) AS n FROM toks GROUP BY 1, 2),
r AS (
    SELECT admin_id, token, n,
           row_number() OVER (PARTITION BY admin_id
                              ORDER BY n DESC, token) AS rk
    FROM c)
SELECT admin_id, token, CAST(n AS BIGINT) AS n, rk
FROM r WHERE rk <= {k} ORDER BY 1, 4
"""


def sql_tile_skew(z: int = 10, ks=(1, 10, 100, 1000)) -> str:
    """Twin of ``webgeo.q_tile_skew``: ranked tile counts, cumulative at
    each k, share in basis points."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    klist = ", ".join(str(k) for k in ks)
    n = 1 << z
    return f"""
WITH {POINTS_CTE},
c AS (
    SELECT {ty} * {n} + {tx} AS cell, count(*) AS n
    FROM points p GROUP BY 1),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, cell) AS rk FROM c),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
ks AS (SELECT unnest([{klist}]) AS k)
SELECT ks.k,
       CAST(coalesce((SELECT sum(r.n) FROM r WHERE r.rk <= ks.k), 0) AS BIGINT)
         AS top_n,
       (SELECT total FROM tot) AS total,
       CAST(coalesce((SELECT sum(r.n) FROM r WHERE r.rk <= ks.k), 0) * 10000
            // greatest((SELECT total FROM tot), 1) AS BIGINT) AS share_bp
FROM ks ORDER BY ks.k
"""


def sql_st_cube(z: int = 5) -> str:
    """Twin of ``webgeo.q_st_cube``."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH {POINTS_CTE}
SELECT {tx} AS tile_x, {ty} AS tile_y, p.doc_id // 60 AS t_min,
       count(*) AS n
FROM points p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def sql_quadkey_counts(z: int = 6) -> str:
    """Twin of ``webgeo.q_quadkey_counts``: same tile exprs, unrolled
    base-4 digit concat (level z-1 .. 0)."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    digits = " || ".join(
        f"CAST(((c.y // {1 << k}) % 2) * 2 + ((c.x // {1 << k}) % 2) AS VARCHAR)"
        for k in range(z - 1, -1, -1)
    )
    return f"""
WITH {POINTS_CTE},
c AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2)
SELECT {digits} AS quadkey, CAST(c.n AS BIGINT) AS n
FROM c ORDER BY 1
"""


def sql_tile_pyramid(z_max: int = 12) -> str:
    """Twin of ``webgeo.q_tile_pyramid``: same tile exprs at z_max, then
    ancestor shifts via generate_series integer division — the SQL states
    the 15-zoom rollup directly; the engine proves the one-pass
    explode-over-aggregates shape gives the identical pyramid."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z_max))
    return f"""
WITH {POINTS_CTE},
c AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
anc AS (
    SELECT zs.z AS z,
           c.x // CAST(pow(2, {z_max} - zs.z) AS BIGINT) AS ax,
           c.y // CAST(pow(2, {z_max} - zs.z) AS BIGINT) AS ay,
           sum(c.n) AS n
    FROM c CROSS JOIN generate_series(0, {z_max}) AS zs(z)
    GROUP BY 1, 2, 3)
SELECT z, count(*) AS n_tiles, CAST(sum(n) AS BIGINT) AS n_mentions,
       CAST(max(n) AS BIGINT) AS n_max,
       CAST(sum(ax) AS BIGINT) AS x_sum, CAST(sum(ay) AS BIGINT) AS y_sum,
       CAST(sum(n * (ay * {1 << 14} + ax)) AS BIGINT) AS wsum
FROM anc GROUP BY z ORDER BY z
"""


def sql_morton_cover(z: int = 9) -> str:
    """Twin of ``webgeo.q_morton_cover``: unrolled bit-interleave of the
    same tile exprs into the Morton code, the SAME literal covering
    ranges (deterministic driver-side arithmetic, unit-pinned in
    tests/test_morton.py), candidate counts via a range join and exact
    counts via integer-mdeg bbox containment."""
    from .pipelines.webgeo import MORTON_BBOXES_MDEG, morton_cover_plan

    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    interleave = " + ".join(
        f"((t.x // {1 << k}) % 2) * {1 << (2 * k)}"
        f" + ((t.y // {1 << k}) % 2) * {1 << (2 * k + 1)}"
        for k in range(z)
    )
    plans = morton_cover_plan(z)
    range_rows = ", ".join(
        f"({p['bbox_id']}, {lo}, {hi})"
        for p in plans
        for lo, hi in p["ranges"]
    )
    nrange_rows = ", ".join(
        f"({p['bbox_id']}, {len(p['ranges'])})" for p in plans
    )
    bbox_rows = ", ".join(
        f"({i}, {b[0]}, {b[1]}, {b[2]}, {b[3]})"
        for i, b in enumerate(MORTON_BBOXES_MDEG)
    )
    return f"""
WITH {POINTS_CTE},
t AS (SELECT p.lat_mdeg, p.lon_mdeg, {tx} AS x, {ty} AS y FROM points p),
m AS (SELECT lat_mdeg, lon_mdeg, {interleave} AS code FROM t),
r(bbox_id, lo, hi) AS (VALUES {range_rows}),
nr(bbox_id, n_ranges) AS (VALUES {nrange_rows}),
bb(bbox_id, lat_lo, lat_hi, lon_lo, lon_hi) AS (VALUES {bbox_rows}),
cand AS (
    SELECT r.bbox_id, count(*) AS n_candidates
    FROM m JOIN r ON m.code BETWEEN r.lo AND r.hi GROUP BY 1),
ex AS (
    SELECT bb.bbox_id, count(*) AS n_exact
    FROM m JOIN bb ON m.lat_mdeg BETWEEN bb.lat_lo AND bb.lat_hi
                  AND m.lon_mdeg BETWEEN bb.lon_lo AND bb.lon_hi
    GROUP BY 1)
SELECT nr.bbox_id, CAST(nr.n_ranges AS BIGINT) AS n_ranges,
       CAST(COALESCE(cand.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(ex.n_exact, 0) AS BIGINT) AS n_exact
FROM nr LEFT JOIN cand USING (bbox_id) LEFT JOIN ex USING (bbox_id)
ORDER BY 1
"""


def sql_url_lcp(cap: int = 64) -> str:
    """Twin of ``webgeo.q_url_lcp``: lag(url) OVER (ORDER BY url) global
    sorted adjacency, LCP as an unrolled prefix-indicator sum — the SQL
    states the global sort; the engine proves bucketed adjacency +
    boundary reconstruction gives the identical histogram."""
    terms = " + ".join(
        f"(CASE WHEN substr(s.url, 1, {k}) = substr(s.prev, 1, {k})"
        f" THEN 1 ELSE 0 END)"
        for k in range(1, cap + 1)
    )
    return f"""
WITH u AS (
    SELECT 'https://example' || CAST(doc_id % 997 AS VARCHAR)
           || '.com/p/' || CAST(doc_id AS VARCHAR) AS url
    FROM documents),
s AS (SELECT url, lag(url) OVER (ORDER BY url) AS prev FROM u)
SELECT CAST({terms} AS BIGINT) AS lcp, CAST(count(*) AS BIGINT) AS n
FROM s WHERE s.prev IS NOT NULL
GROUP BY 1 ORDER BY 1
"""


def sql_geohash_counts(precision: int = 3) -> str:
    """Twin of ``webgeo.q_geohash_counts``: same double-precision bit
    exprs, unrolled MSB-first lon/lat interleave, substr alphabet lookup."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lonb = (
        f"CAST(LEAST(FLOOR((p.lon + 180.0) / 360.0 * {float(1 << lon_bits)!r}),"
        f" {float((1 << lon_bits) - 1)!r}) AS BIGINT)"
    )
    latb = (
        f"CAST(LEAST(FLOOR((p.lat + 90.0) / 180.0 * {float(1 << lat_bits)!r}),"
        f" {float((1 << lat_bits) - 1)!r}) AS BIGINT)"
    )
    terms = []
    for p in range(nbits):
        if p % 2 == 0:
            bit = f"((b.lonb // {1 << (lon_bits - 1 - p // 2)}) % 2)"
        else:
            bit = f"((b.latb // {1 << (lat_bits - 1 - (p - 1) // 2)}) % 2)"
        terms.append(f"{bit} * {1 << (nbits - 1 - p)}")
    g_expr = " + ".join(terms)
    alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = " || ".join(
        f"substr('{alpha}', CAST((h.g // {32 ** (precision - 1 - i)}) % 32 AS INT) + 1, 1)"
        for i in range(precision)
    )
    return f"""
WITH {POINTS_CTE},
b AS (SELECT {lonb} AS lonb, {latb} AS latb FROM points p),
h AS (SELECT {g_expr} AS g, count(*) AS n FROM b GROUP BY 1)
SELECT {chars} AS geohash, CAST(h.n AS BIGINT) AS n
FROM h ORDER BY 1
"""


def sql_contour_census(z: int = 7, thresh: int = 2) -> str:
    """Twin of ``webgeo.q_contour_census``: rebuild the occupancy raster,
    scatter the 4 corner bits per occupied cell (TL=8 TR=4 BR=2 BL=1, y
    down), SUM==OR per block, per-case histogram with the marching-squares
    segment-count CASE lookup (saddles 5/10 -> 2, full 15 -> 0)."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH {POINTS_CTE},
cells AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
occ AS (SELECT x, y FROM cells WHERE n >= {thresh}),
corners AS (
    SELECT x AS bx, y AS by, 8 AS bit FROM occ
    UNION ALL SELECT x - 1, y, 4 FROM occ
    UNION ALL SELECT x - 1, y - 1, 2 FROM occ
    UNION ALL SELECT x, y - 1, 1 FROM occ),
blocks AS (SELECT bx, by, SUM(bit) AS cs FROM corners GROUP BY 1, 2)
SELECT CAST(cs AS BIGINT) AS case_id, count(*) AS n_blocks,
       CAST(count(*) * (CASE WHEN cs IN (5, 10) THEN 2
                             WHEN cs = 15 THEN 0 ELSE 1 END) AS BIGINT)
           AS n_segments
FROM blocks GROUP BY cs ORDER BY cs
"""


def sql_spatial_autocorr(z: int = 6) -> str:
    """Twin of ``webgeo.q_spatial_autocorr``: rebuild the raster, rook
    self-join for adjacent occupied pairs, same five integer aggregates
    and the expanded mean-free covariance numerator."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    return f"""
WITH {POINTS_CTE},
cells AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
st AS (SELECT count(*) AS nc, sum(n) AS tot FROM cells),
pairs AS (
    SELECT a.n AS na, b.n AS nb
    FROM cells a JOIN cells b
      ON (b.x = a.x + 1 AND b.y = a.y) OR (b.x = a.x AND b.y = a.y + 1)),
pg AS (
    SELECT count(*) AS np_, coalesce(sum(na * nb), 0) AS s_ab,
           coalesce(sum(na + nb), 0) AS s_apb
    FROM pairs)
SELECT CAST(st.nc AS BIGINT) AS n_cells, CAST(st.tot AS BIGINT) AS total,
       CAST(pg.np_ AS BIGINT) AS n_pairs, CAST(pg.s_ab AS BIGINT) AS sum_ab,
       CAST(pg.s_apb AS BIGINT) AS sum_apb,
       CAST(st.nc * st.nc * pg.s_ab - st.nc * st.tot * pg.s_apb
            + st.tot * st.tot * pg.np_ AS BIGINT) AS moran_num
FROM st, pg
"""


def sql_zonal_stats(z: int = 8) -> str:
    """Twin of ``stages.tiling.zonal_stats`` over the nation admin grid:
    rebuild the zoom-z density raster from the mention points, box-join
    occupied cells to each nation's tile-space range (same half-open
    edge rule, same forward-mercator chain), reduce per zone."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF} + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W})"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF} + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H})"
    lon_e = f"({lon_w} + {W.ADMIN_LON_W})"
    lat_n = f"({lat_s} + {W.ADMIN_LAT_H})"
    xw, _ = sql_tile_expr("0.0", lon_w, str(z))
    xe, _ = sql_tile_expr("0.0", lon_e, str(z))
    _, yn = sql_tile_expr(lat_n, "0.0", str(z))
    _, ys = sql_tile_expr(lat_s, "0.0", str(z))
    return f"""
WITH {POINTS_CTE},
cells AS (
    SELECT {tx} AS x, {ty} AS y, count(*) AS n
    FROM points p GROUP BY 1, 2),
zones AS (
    SELECT n.n_nationkey AS zone_id,
           {xw} AS x_w, {xe} AS x_e, {yn} AS y_n, {ys} AS y_s
    FROM nation n)
SELECT z.zone_id,
       count(*) AS n_cells,
       CAST(sum(c.n) AS BIGINT) AS n_points,
       CAST(max(c.n) AS BIGINT) AS max_cell_n
FROM cells c JOIN zones z
  ON c.x >= z.x_w AND c.x < z.x_e AND c.y >= z.y_n AND c.y < z.y_s
GROUP BY 1 ORDER BY 1
"""


def sql_raster_distance(z: int = 6, threshold: int = 2, max_dist: int = 2) -> str:
    """Twin of ``stages.tiling.raster_distance``: rebuild the occupied
    raster, then unroll ``max_dist`` BFS expansions (4-neighbor arithmetic
    with bound guards, EXCEPT against everything already labeled) and count
    cells per hop distance."""
    n = 1 << z
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))

    def nbrs(src: str) -> str:
        return (
            f"SELECT cell + 1 AS cell FROM {src} WHERE cell % {n} < {n} - 1"
            f" UNION SELECT cell - 1 FROM {src} WHERE cell % {n} > 0"
            f" UNION SELECT cell + {n} FROM {src} WHERE cell // {n} < {n} - 1"
            f" UNION SELECT cell - {n} FROM {src} WHERE cell // {n} > 0"
        )

    ctes = [
        f"cellcnt AS (SELECT {tx} AS x, {ty} AS y, count(*) AS n"
        f" FROM points p GROUP BY 1, 2)",
        f"d0 AS (SELECT y * {n} + x AS cell FROM cellcnt WHERE n >= {threshold})",
    ]
    seen = "SELECT cell FROM d0"
    for d in range(1, max_dist + 1):
        ctes.append(f"n{d} AS ({nbrs(f'd{d-1}')})")
        ctes.append(f"d{d} AS (SELECT cell FROM n{d} EXCEPT ({seen}))")
        seen += f" UNION SELECT cell FROM d{d}"
    levels = " UNION ALL ".join(
        f"SELECT cell, {d} AS dist FROM d{d}" for d in range(max_dist + 1)
    )
    body = ",\n".join(ctes)
    return f"""
WITH {POINTS_CTE},
{body},
lab AS ({levels})
SELECT dist, count(*) AS n_cells FROM lab GROUP BY 1 ORDER BY 1
"""


def sql_cell_counts(s2_level: int = 6, hex_src_res: int = 9, hex_res: int = 4) -> str:
    """Mirror of ``webgeo.q_cell_counts``: S2 level-6 cell (trig chain +
    unrolled Hilbert, int64 wrap reproduced via HUGEINT) x hex res-4 parent
    (res-9 cell -> center -> res-4 cell), counted.

    The double expression structure mirrors ``geo/s2.py`` /
    ``geo/hexgrid.py`` / ``geo/mercator.py`` operand-for-operand; DuckDB and
    numpy trig agree bit-for-bit on this libm (probed), ln differs by <=1
    ulp which cannot flip a level-6 / res-4 cell for mdeg-derived points.
    """
    n = 1 << s2_level
    hil_ctes, hil_fin = _sql_hilbert_ctes("swapped", s2_level, "doc_id, mention_idx, face")
    shift = 2 * (30 - s2_level)
    size9 = f"(0.5 / {1 << hex_src_res})"
    size4 = f"(0.5 / {1 << hex_res})"
    two61, two49, two48 = 1 << 61, 1 << (shift + 1), 1 << shift
    two63, two64 = 1 << 63, 1 << 64
    return f"""
WITH {POINTS_CTE},
xyz AS (
    SELECT doc_id, mention_idx, lat, lon,
           cos(radians(lat)) * cos(radians(lon)) AS x,
           cos(radians(lat)) * sin(radians(lon)) AS y,
           sin(radians(lat)) AS z
    FROM points
),
face0 AS (
    SELECT *, CASE WHEN abs(x) >= abs(y)
                   THEN CASE WHEN abs(x) >= abs(z) THEN 0 ELSE 2 END
                   ELSE CASE WHEN abs(y) >= abs(z) THEN 1 ELSE 2 END END AS f0
    FROM xyz
),
faced AS (
    SELECT *, f0 + CASE WHEN (CASE WHEN f0 = 0 THEN x WHEN f0 = 1 THEN y ELSE z END) < 0
                        THEN 3 ELSE 0 END AS face
    FROM face0
),
faceuv AS (
    SELECT doc_id, mention_idx, lat, lon, face,
           CASE face WHEN 0 THEN y / x WHEN 1 THEN (-x) / y WHEN 2 THEN (-x) / z
                     WHEN 3 THEN z / (-x) WHEN 4 THEN z / (-y) ELSE (-y) / (-z) END AS u,
           CASE face WHEN 0 THEN z / x WHEN 1 THEN z / y WHEN 2 THEN (-y) / z
                     WHEN 3 THEN y / (-x) WHEN 4 THEN (-x) / (-y) ELSE (-x) / (-z) END AS v
    FROM faced
),
st AS (
    SELECT *, CASE WHEN u >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * u)
                   ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * u) END AS s_,
              CASE WHEN v >= 0 THEN 0.5 * sqrt(1.0 + 3.0 * v)
                   ELSE 1.0 - 0.5 * sqrt(1.0 - 3.0 * v) END AS t_
    FROM faceuv
),
ij AS (
    SELECT *, least(greatest(CAST(floor(s_ * {float(n)}) AS BIGINT), 0), {n - 1}) AS i,
              least(greatest(CAST(floor(t_ * {float(n)}) AS BIGINT), 0), {n - 1}) AS j
    FROM st
),
swapped AS (
    SELECT doc_id, mention_idx, lat, lon, face,
           CASE WHEN face % 2 = 1 THEN j ELSE i END AS hx,
           CASE WHEN face % 2 = 1 THEN i ELSE j END AS hy
    FROM ij
),
{hil_ctes},
s2cell AS (
    SELECT doc_id, mention_idx, face, d,
           CAST(((CAST(face AS HUGEINT) * {two61} + CAST(d AS HUGEINT) * {two49}
                  + {two48} + {two63}) % {two64}) - {two63} AS BIGINT) AS s2_l6
    FROM {hil_fin}
),
pts2 AS (
    SELECT p.doc_id, p.mention_idx, s.s2_l6,
           (p.lon + 180.0) / 360.0 AS wx,
           least(greatest(
               0.5 - 0.25 * ln((1.0 + sin(radians(least(greatest(p.lat, {-MAX_LAT}), {MAX_LAT}))))
                             / (1.0 - sin(radians(least(greatest(p.lat, {-MAX_LAT}), {MAX_LAT})))))
                   / pi(), 0.0), 1.0) AS wy
    FROM points p JOIN s2cell s USING (doc_id, mention_idx)
),
ax9 AS (
    SELECT *, (sqrt(3.0) / 3.0 * wx - 1.0 / 3.0 * wy) / {size9} AS qf,
              (2.0 / 3.0 * wy) / {size9} AS rf
    FROM pts2
),
rnd9 AS (
    SELECT *, round_even(qf, 0) AS rx, round_even(-qf - rf, 0) AS ry,
              round_even(rf, 0) AS rz
    FROM ax9
),
fix9 AS (
    SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
    FROM rnd9
),
hex9 AS (
    SELECT doc_id, mention_idx, s2_l6,
           CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q9,
           CAST(CASE WHEN (NOT (dx > dy AND dx > dz)) AND dz > dy
                     THEN -(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END) - ry
                     ELSE rz END AS BIGINT) AS r9
    FROM fix9
),
ctr AS (
    SELECT doc_id, mention_idx, s2_l6,
           {size9} * (sqrt(3.0) * q9 + sqrt(3.0) / 2.0 * r9) AS cx,
           {size9} * (1.5 * r9) AS cy
    FROM hex9
),
ax4 AS (
    SELECT *, (sqrt(3.0) / 3.0 * cx - 1.0 / 3.0 * cy) / {size4} AS qf,
              (2.0 / 3.0 * cy) / {size4} AS rf
    FROM ctr
),
rnd4 AS (
    SELECT *, round_even(qf, 0) AS rx, round_even(-qf - rf, 0) AS ry,
              round_even(rf, 0) AS rz
    FROM ax4
),
fix4 AS (
    SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
    FROM rnd4
),
hex4 AS (
    SELECT doc_id, mention_idx, s2_l6,
           CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q4,
           CAST(CASE WHEN (NOT (dx > dy AND dx > dz)) AND dz > dy
                     THEN -(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END) - ry
                     ELSE rz END AS BIGINT) AS r4
    FROM fix4
),
cells AS (
    SELECT s2_l6,
           (CAST({hex_res} AS BIGINT) << 60) | ((q4 + 536870912) << 30) | (r4 + 536870912) AS hex_r4
    FROM hex4
)
SELECT s2_l6, hex_r4, count(*) AS n FROM cells GROUP BY 1, 2
"""


def sql_hex_smooth(res: int = 7) -> str:
    """Twin of ``webgeo.q_hex_smooth``: the hex axial-rounding chain
    (operand-for-operand vs ``geo/hexgrid.py``), then a 7-direction VALUES
    expansion and sum per destination cell."""
    size = f"(0.5 / {1 << res})"
    return f"""
WITH {POINTS_CTE},
w AS (
    SELECT (p.lon + 180.0) / 360.0 AS wx,
           least(greatest(
               0.5 - 0.25 * ln((1.0 + sin(radians(least(greatest(p.lat, {-MAX_LAT}), {MAX_LAT}))))
                             / (1.0 - sin(radians(least(greatest(p.lat, {-MAX_LAT}), {MAX_LAT})))))
                   / pi(), 0.0), 1.0) AS wy
    FROM points p
),
ax AS (
    SELECT (sqrt(3.0) / 3.0 * wx - 1.0 / 3.0 * wy) / {size} AS qf,
           (2.0 / 3.0 * wy) / {size} AS rf
    FROM w
),
rnd AS (
    SELECT *, round_even(qf, 0) AS rx, round_even(-qf - rf, 0) AS ry,
              round_even(rf, 0) AS rz
    FROM ax
),
fx AS (
    SELECT *, abs(rx - qf) AS dx, abs(ry - (-qf - rf)) AS dy, abs(rz - rf) AS dz
    FROM rnd
),
hexq AS (
    SELECT CAST(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END AS BIGINT) AS q,
           CAST(CASE WHEN (NOT (dx > dy AND dx > dz)) AND dz > dy
                     THEN -(CASE WHEN dx > dy AND dx > dz THEN -ry - rz ELSE rx END) - ry
                     ELSE rz END AS BIGINT) AS r
    FROM fx
),
cellcnt AS (SELECT q, r, count(*) AS n FROM hexq GROUP BY 1, 2),
dirs AS (SELECT * FROM (VALUES (0, 0), (1, 0), (1, -1), (0, -1),
                               (-1, 0), (-1, 1), (0, 1)) AS d(dq, dr))
SELECT (CAST({res} AS BIGINT) << 60)
         | ((c.q + d.dq + 536870912) << 30) | (c.r + d.dr + 536870912) AS hex_id,
       CAST(sum(c.n) AS BIGINT) AS n_smooth
FROM cellcnt c CROSS JOIN dirs d
GROUP BY 1 ORDER BY 1
"""


def sql_neardup_planted() -> str:
    """Mirror of ``training.q_neardup_planted``: with planted siblings the
    exact near-dup answer is the sibling pairs themselves."""
    return "SELECT vec_id AS a, vec_id + 1000000 AS b FROM embeddings"


def _sql_buffered_hits(zooms, buffer_px: float, extent: int,
                       with_pixels: bool) -> str:
    """Shared CTE chain (points -> scaled -> base -> hits) mirroring
    ``clip.point_tiles_vec``'s 9-neighbor buffered box test with
    antimeridian x wrap and y clamp — used by BOTH sql_tile_counts_buffered
    and sql_labelgrid_counts so the float expressions cannot drift.
    ``with_pixels`` adds fid + REAL (float32) tile-local px/py to hits."""
    buf = repr(buffer_px / extent)
    zl = ", ".join(str(z) for z in zooms)
    sinlat = "sin(radians(least(greatest(p.lat, {mn!r}), {mx!r})))".format(
        mn=-MAX_LAT, mx=MAX_LAT
    )
    worldx = "((p.lon + 180.0) / 360.0)"
    worldy = (
        f"least(greatest(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat}))"
        " / pi(), 0.0), 1.0)"
    )
    fid_sel = "p.doc_id * 8 + p.mention_idx AS fid," if with_pixels else ""
    fid_fwd = "b.fid," if with_pixels else ""
    px_sel = (
        f"CAST((b.sx - (b.bx + nb.dx)) * {extent} AS REAL) AS px, "
        f"CAST((b.sy - (b.by + nb.dy)) * {extent} AS REAL) AS py,"
        if with_pixels else ""
    )
    return f"""{POINTS_CTE},
zs AS (SELECT UNNEST([{zl}]) AS z),
nb AS (
    SELECT dx.dx, dy.dy FROM (SELECT UNNEST([-1, 0, 1]) AS dx) dx
    CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy
),
scaled AS (
    SELECT p.doc_id, p.mention_idx, {fid_sel}
           zs.z, (1 << zs.z) AS n,
           {worldx} * (1 << zs.z) AS sx,
           {worldy} * (1 << zs.z) AS sy
    FROM points p CROSS JOIN zs
),
base AS (
    SELECT *, least(greatest(CAST(floor(sx) AS BIGINT), 0), n - 1) AS bx,
              least(greatest(CAST(floor(sy) AS BIGINT), 0), n - 1) AS by
    FROM scaled
),
hits AS (
    SELECT b.z, ((b.bx + nb.dx) % b.n + b.n) % b.n AS tile_x,
           b.by + nb.dy AS tile_y, {fid_fwd} {px_sel}
           b.doc_id
    FROM base b CROSS JOIN nb
    WHERE b.by + nb.dy >= 0 AND b.by + nb.dy < b.n
      AND b.sx >= b.bx + nb.dx - {buf} AND b.sx <= b.bx + nb.dx + 1 + {buf}
      AND b.sy >= b.by + nb.dy - {buf} AND b.sy <= b.by + nb.dy + 1 + {buf}
)"""


def sql_tile_counts_buffered(zooms=(2, 6, 10), buffer_px: float = 4.0,
                             extent: int = 256) -> str:
    """Mirror of ``webgeo.q_tile_counts_buffered`` (shared hits CTE)."""
    return f"""
WITH {_sql_buffered_hits(zooms, buffer_px, extent, with_pixels=False)}
SELECT z, tile_x, tile_y, count(*) AS n FROM hits GROUP BY 1, 2, 3
"""


def sql_labelgrid_counts(zooms=(2, 4), grid: float = 64.0, limit: int = 8,
                         buffer_px: float = 4.0, extent: int = 256) -> str:
    """Mirror of ``webgeo.q_labelgrid_counts``: shared buffered-slicing hits
    + per-cell row_number top-k ordered by feature id (cell keys from the
    same REAL float32 pixel coords the flagship shuffle carries)."""
    return f"""
WITH {_sql_buffered_hits(zooms, buffer_px, extent, with_pixels=True)},
cells AS (
    SELECT z, tile_x, tile_y, fid,
           CAST(floor(px / {grid!r}) AS BIGINT) * 100003
               + CAST(floor(py / {grid!r}) AS BIGINT) AS cell
    FROM hits
),
ranked AS (
    SELECT z, tile_x, tile_y,
           row_number() OVER (PARTITION BY z, tile_x, tile_y, cell
                              ORDER BY fid) AS rn
    FROM cells
)
SELECT z, tile_x, tile_y, CAST(count(*) AS BIGINT) AS n
FROM ranked WHERE rn <= {limit}
GROUP BY 1, 2, 3
"""


def sql_media_frames() -> str:
    """Mirror of ``training.q_media_frames``: the deterministic fake-video
    container layout makes the frame explosion exactly enumerable."""
    return """
SELECT d.doc_id AS item_id,
       CAST(f.f * 4 AS BIGINT) AS frame_idx,
       CAST(256 AS BIGINT) AS frame_len
FROM documents d CROSS JOIN (SELECT UNNEST(range(4)) AS f) f
WHERE f.f * 4 < 4 + d.doc_id % 13
"""


def sql_corpus_clean(min_quality_bp: int = 2000, sample_mod: int = 4) -> str:
    """Mirror of ``training.q_corpus_clean``: quality filter -> exact dedup
    keep-min -> deterministic hash sample, all integer-exact."""
    return rf"""
WITH s AS ({QUALITY_STATS_CTE}),
q AS (
    SELECT doc_id, text, {QUALITY_BP_EXPR} AS quality_bp
    FROM s
),
good AS (SELECT doc_id, text FROM q WHERE quality_bp >= {min_quality_bp}),
dd AS (
    SELECT min(doc_id) AS keep_id, count(*) AS n_dups FROM good GROUP BY text
)
SELECT keep_id, n_dups FROM dd
WHERE (keep_id * 2654435761 % 4294967296) % {sample_mod} = 0
"""


def sql_ngram_jaccard(n: int = 4, threshold: float = 0.3) -> str:
    """Mirror of ``training.q_ngram_jaccard``: distinct char-n-gram sets via
    positional substr, exact Jaccard pairs."""
    t = int(threshold * 1000)
    return f"""
WITH ws AS (SELECT doc_id, text FROM documents WHERE doc_id % 25 = 0),
pos AS (
    SELECT doc_id, UNNEST(range(1, greatest(length(text) - {n} + 2, 1))) AS i,
           text
    FROM ws
),
grams AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), {n}) AS token FROM pos),
n_tok AS (SELECT doc_id, count(*) AS n_tok FROM grams GROUP BY 1),
toks AS (SELECT g.doc_id, nt.n_tok, g.token FROM grams g JOIN n_tok nt USING (doc_id)),
pairs AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, t1.n_tok AS na, t2.n_tok AS nb,
           count(*) AS shared
    FROM toks t1 JOIN toks t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT a, b, (shared * 1000) // (na + nb - shared) AS j1000
FROM pairs WHERE (shared * 1000) // (na + nb - shared) >= {t}
"""


def sql_zoom_summary(zooms=(2, 6), grid: float = 64.0, limit: int = 8) -> str:
    """Mirror of the places-only archive stats: per zoom, tiles with >=1
    (buffered) hit and features kept after the exact label-grid top-k —
    the same CTE chain as ``sql_labelgrid_counts`` aggregated per z."""
    return f"""
SELECT z, CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(sum(n) AS BIGINT) AS n_features
FROM ({sql_labelgrid_counts(zooms, grid, limit)}) lg
GROUP BY z
"""


def sql_tile_weights(zooms=(2, 6), grid: float = 64.0, limit: int = 8) -> str:
    """Mirror of ``stats.tile_weights_summary`` over the places-only build:
    the synthetic traffic weight is pure integer arithmetic on the tile
    address, so DuckDB reproduces it bit-for-bit on the same labelgrid
    tile table the ``zoom_summary`` oracle already proves."""
    return f"""
SELECT z, CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(sum(w) AS BIGINT) AS weight_sum,
       CAST(sum(w * n) AS BIGINT) AS wfeat_sum
FROM (
    SELECT z, n,
           (tile_x * 73856093 + tile_y * 19349663 + z * 83492791) % 997 + 1 AS w
    FROM ({sql_labelgrid_counts(zooms, grid, limit)}) lg
) t
GROUP BY z
"""


def sql_layer_zoom_stats() -> str:
    """Mirror of ``__ray_entry__._q_layer_zoom_stats``: the two layer
    chains' per-zoom aggregates, layer-tagged and unioned."""
    return f"""
SELECT 'places' AS layer, z, n_tiles, n_features AS n_units
FROM ({sql_zoom_summary()}) p
UNION ALL
SELECT 'admin_fill' AS layer, z, n_tiles, n_fill AS n_units
FROM ({sql_polygon_fill()}) f
"""


def sql_top_tiles(zooms=(2, 6), grid: float = 64.0, limit: int = 8,
                  k: int = 20) -> str:
    """Mirror of ``stats.top_weighted_tiles``: rank the labelgrid tile
    table by the synthetic traffic weight under the same total order."""
    return f"""
SELECT z, tile_x, tile_y,
       (tile_x * 73856093 + tile_y * 19349663 + z * 83492791) % 997 + 1 AS w,
       n AS n_features
FROM ({sql_labelgrid_counts(zooms, grid, limit)}) lg
ORDER BY w DESC, z, tile_x, tile_y
LIMIT {k}
"""


def _sql_hits_from(tag: str, src: str, zooms, buffer_px: float = 4.0,
                   extent: int = 256) -> str:
    """Generic buffered-slicing chain over a CTE ``src(fid, lat, lon)`` —
    the ``_sql_buffered_hits`` 9-neighbor box test parameterized by source
    (suffix ``tag`` keeps multiple chains in one query).  Requires ``zs``
    and ``nb`` CTEs in scope."""
    buf = repr(buffer_px / extent)
    sinlat = "sin(radians(least(greatest(s.lat, {mn!r}), {mx!r})))".format(
        mn=-MAX_LAT, mx=MAX_LAT
    )
    worldx = "((s.lon + 180.0) / 360.0)"
    worldy = (
        f"least(greatest(0.5 - 0.25 * ln((1.0 + {sinlat}) / (1.0 - {sinlat}))"
        " / pi(), 0.0), 1.0)"
    )
    return f"""
scaled_{tag} AS (
    SELECT s.fid, zs.z, (1 << zs.z) AS n,
           {worldx} * (1 << zs.z) AS sx,
           {worldy} * (1 << zs.z) AS sy
    FROM {src} s CROSS JOIN zs
),
base_{tag} AS (
    SELECT *, least(greatest(CAST(floor(sx) AS BIGINT), 0), n - 1) AS bx,
              least(greatest(CAST(floor(sy) AS BIGINT), 0), n - 1) AS by
    FROM scaled_{tag}
),
hits_{tag} AS (
    SELECT b.z, ((b.bx + nb.dx) % b.n + b.n) % b.n AS tile_x,
           b.by + nb.dy AS tile_y, b.fid,
           CAST((b.sx - (b.bx + nb.dx)) * {extent} AS REAL) AS px,
           CAST((b.sy - (b.by + nb.dy)) * {extent} AS REAL) AS py
    FROM base_{tag} b CROSS JOIN nb
    WHERE b.by + nb.dy >= 0 AND b.by + nb.dy < b.n
      AND b.sx >= b.bx + nb.dx - {buf} AND b.sx <= b.bx + nb.dx + 1 + {buf}
      AND b.sy >= b.by + nb.dy - {buf} AND b.sy <= b.by + nb.dy + 1 + {buf}
)"""


def sql_yaml_tiles(zooms=(2, 6), grid: float = 64.0, limit: int = 4,
                   hot_admin: int = 17) -> str:
    """Mirror of the SAMPLE_SCHEMA no-code pipeline (count core):
    en_places (lang in en/fr, label-grid 64px top-4), hot_admin
    (admin_id = 17 rect containment), admin_labels (one centroid label
    point per admin rect) — per-tile kept-feature totals."""
    lon_w = f"(-180.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey % {W.ADMIN_COLS}) * {W.ADMIN_LON_W}"
    lat_s = f"(-85.0 - {W.ADMIN_EDGE_OFF}) + (n.n_nationkey // {W.ADMIN_COLS}) * {W.ADMIN_LAT_H}"
    zl = ", ".join(str(z) for z in zooms)
    return f"""
WITH {POINTS_CTE},
zs AS (SELECT UNNEST([{zl}]) AS z),
nb AS (
    SELECT dx.dx, dy.dy FROM (SELECT UNNEST([-1, 0, 1]) AS dx) dx
    CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS dy) dy
),
enr AS (
    SELECT p.doc_id, p.mention_idx, p.lat, p.lon, d.lang, n.n_nationkey AS admin_id
    FROM points p
    JOIN documents d USING (doc_id)
    LEFT JOIN nation n
      ON p.lon >= {lon_w} AND p.lon < {lon_w} + {W.ADMIN_LON_W}
     AND p.lat >= {lat_s} AND p.lat < {lat_s} + {W.ADMIN_LAT_H}
),
src_en AS (
    SELECT doc_id * 8 + mention_idx AS fid, lat, lon FROM enr
    WHERE lang IN ('en', 'fr')
),
src_hot AS (
    SELECT doc_id * 8 + mention_idx AS fid, lat, lon FROM enr
    WHERE admin_id = {hot_admin}
),
src_lab AS (
    SELECT n.n_nationkey AS fid,
           {lat_s} + {W.ADMIN_LAT_H} / 2.0 AS lat,
           {lon_w} + {W.ADMIN_LON_W} / 2.0 AS lon
    FROM nation n
),
{_sql_hits_from('en', 'src_en', zooms)},
{_sql_hits_from('hot', 'src_hot', zooms)},
{_sql_hits_from('lab', 'src_lab', zooms)},
ranked_en AS (
    SELECT z, tile_x, tile_y,
           row_number() OVER (
               PARTITION BY z, tile_x, tile_y,
                   CAST(floor(px / {grid!r}) AS BIGINT) * 100003
                       + CAST(floor(py / {grid!r}) AS BIGINT)
               ORDER BY fid) AS rn
    FROM hits_en
),
counts AS (
    SELECT z, tile_x, tile_y, count(*) AS n FROM ranked_en
    WHERE rn <= {limit} GROUP BY 1, 2, 3
    UNION ALL
    SELECT z, tile_x, tile_y, count(*) FROM hits_hot GROUP BY 1, 2, 3
    UNION ALL
    SELECT z, tile_x, tile_y, count(*) FROM hits_lab GROUP BY 1, 2, 3
)
SELECT ((CAST(1 AS BIGINT) << (2 * z)) - 1) // 3
           + tile_y * (CAST(1 AS BIGINT) << z) + tile_x AS tile_id,
       z, tile_x, tile_y, CAST(sum(n) AS BIGINT) AS n_features
FROM counts GROUP BY 1, 2, 3, 4
"""


def sql_pii_scrub() -> str:
    """Mirror of ``training.q_pii_scrub``: identical planted concat, then
    the SAME RE2 patterns (``stages/text.EMAIL_RE`` / ``PHONE_RE``) via
    DuckDB's RE2 regexp_replace/extract_all — emails scrubbed first, phones
    counted on the email-scrubbed text, exactly as the engine orders it."""
    from .stages.text import EMAIL_RE, PHONE_RE

    return f"""
WITH base AS (
    SELECT doc_id,
           text || ' mail u' || CAST(doc_id AS VARCHAR)
                || '@ex' || CAST(doc_id % 5 AS VARCHAR)
                || '.com tel 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
           AS text
    FROM documents
),
s1 AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
    FROM base
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(t1, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM s1
"""


def sql_line_dedup(max_df: int = 10) -> str:
    """Mirror of ``training.q_line_dedup``: identical planted boilerplate
    concat, explode lines with order, document-frequency per exact line
    content, drop lines with df > max_df, reassemble with chr(10) in
    original order (docs whose every line was boilerplate still appear,
    with n_kept = 0 and clean_text = '')."""
    return f"""
WITH base AS (
    SELECT doc_id,
           text || chr(10) || 'all rights reserved' || chr(10)
                || 'share this page on network ' || CAST(doc_id % 7 AS VARCHAR)
           AS text
    FROM documents
),
parts AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM base),
lines AS (
    SELECT doc_id, ls[i] AS line, i - 1 AS ord
    FROM parts, UNNEST(generate_series(1, len(ls))) AS t(i)
),
df AS (SELECT line, count(*) AS c FROM lines GROUP BY line),
kept AS (
    SELECT l.doc_id, l.line, l.ord
    FROM lines l JOIN df ON l.line = df.line
    WHERE df.c <= {max_df}
),
agg AS (
    SELECT doc_id, count(*) AS n_kept,
           string_agg(line, chr(10) ORDER BY ord) AS clean_text
    FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id AS doc_id, t.n_lines AS n_lines,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.clean_text, '') AS clean_text
FROM tot t LEFT JOIN agg a ON t.doc_id = a.doc_id
"""


def sql_decontaminate(k: int = 3, mod: int = 97) -> str:
    """Mirror of ``training.q_decontaminate``: identical token grammar
    (lowercase runs of [a-z0-9] — the ``_flat_tokens`` regex), probe set =
    DISTINCT first-k-gram of every doc_id % mod == 0 doc with >= k words,
    hits counted per gram POSITION (no distinct).  The engine compares
    64-bit shingle hashes where this SQL compares gram strings — divergence
    requires an FNV collision (accepted class, see decontaminate docstring)."""
    return f"""
WITH words AS (
    SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
    FROM documents
),
probes AS (
    SELECT DISTINCT array_to_string(ws[1:{k}], ' ') AS gram
    FROM words WHERE doc_id % {mod} = 0 AND len(ws) >= {k}
),
grams AS (
    SELECT doc_id, array_to_string(ws[i:i+{k - 1}], ' ') AS gram
    FROM words, UNNEST(generate_series(1, len(ws) - {k - 1})) AS t(i)
),
hits AS (
    SELECT g.doc_id, count(*) AS n_hits
    FROM grams g JOIN probes p ON g.gram = p.gram GROUP BY g.doc_id
)
SELECT w.doc_id AS doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       COALESCE(h.n_hits, 0) > 0 AS contaminated
FROM words w LEFT JOIN hits h ON w.doc_id = h.doc_id
"""


def sql_media_stats() -> str:
    """Mirror of ``training.q_media_stats``: re-derives the stub payload
    (md5 of the decimal doc_id string, tiled) byte-for-byte in SQL and
    replays the extractor arithmetic — first w*h bytes of the repeating
    16-byte digest, pixel_mean = exact integer sum / need (single float64
    division, matching numpy's exact integer accumulation), histogram of
    byte >> 5 with one float64 division rounded to REAL exactly as the
    engine's float32 store."""
    hists = ",\n         ".join(
        f"sum(CASE WHEN bin = {b} THEN times ELSE 0 END) AS h{b}" for b in range(8)
    )
    fcols = ",\n       ".join(
        f"CAST(CAST(h{b} AS DOUBLE) / need AS REAL) AS f{b}" for b in range(8)
    )
    return f"""
WITH b AS (
    SELECT doc_id, 16 + (doc_id % 48) AS w, 16 + (doc_id % 32) AS h, j,
           CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 2*j + 1, 2) AS INT) AS byte
    FROM documents, UNNEST(generate_series(0, 15)) AS t(j)
),
c AS (
    SELECT doc_id, j, byte, w * h AS need,
           (w * h) // 16 + CASE WHEN j < (w * h) % 16 THEN 1 ELSE 0 END AS times,
           byte // 32 AS bin
    FROM b
),
agg AS (
    SELECT doc_id, any_value(need) AS need,
         sum(byte * times) AS total,
         {hists}
    FROM c GROUP BY doc_id
)
SELECT doc_id AS item_id, CAST(total AS DOUBLE) / need AS pixel_mean,
       {fcols}
FROM agg
"""


def sql_pack_sequences(max_tokens: int = 2048) -> str:
    """Mirror of ``training.q_pack_sequences``: the distributed prefix sum
    collapses to a single window function in SQL (same whitespace token
    grammar as ``sql_text_stats``)."""
    return rf"""
WITH t AS (
    SELECT doc_id, len(regexp_extract_all(text, '\S+')) AS n_tokens
    FROM documents
),
p AS (
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS tok_start
    FROM t
)
SELECT doc_id, n_tokens, tok_start, tok_start // {max_tokens} AS seq_id FROM p
"""


def sql_vocab_topk(k: int = 50) -> str:
    """Mirror of ``training.q_vocab_topk`` (same token grammar as
    ``sql_decontaminate``; deterministic (count DESC, token ASC) order)."""
    return f"""
WITH tok AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token)
SELECT token, CAST(n AS BIGINT) AS n FROM c ORDER BY n DESC, token LIMIT {k}
"""


def sql_bpe_pairs(k: int = 20) -> str:
    """Mirror of ``text.bpe_pair_counts`` (ASCII: byte == char; 2-char
    substring ordering == pair-code ordering).  Constant series bound +
    ON filter, same pattern as ``sql_dup_spans``."""
    return f"""
WITH pos AS (
    SELECT substr(text, CAST(p AS INTEGER), 2) AS pair
    FROM documents
    JOIN generate_series(1, 65536) t(p)
      ON p <= CAST(length(text) AS INTEGER) - 1
)
SELECT pair, CAST(count(*) AS BIGINT) AS n
FROM pos GROUP BY pair ORDER BY n DESC, pair LIMIT {k}
"""


def sql_keyword_topk(terms=("spark", "join", "vector"), k: int = 10) -> str:
    """Mirror of ``text.keyword_topk`` (same token grammar as
    ``sql_vocab_topk``; ties (score DESC, doc_id ASC))."""
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
s AS (
    SELECT doc_id, count(*) AS score FROM tok
    WHERE token IN ({tl}) GROUP BY doc_id
)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM s ORDER BY score DESC, doc_id LIMIT {k}
"""


def sql_dup_spans(length: int = 32, stride: int = 16) -> str:
    """Mirror of ``training.q_dup_spans``: every stride-aligned
    ``length``-char window of each doc (ASCII corpus: char == byte),
    windows whose exact content appears in >1 distinct docs, counted per
    doc.  The position series uses a constant bound (DuckDB's
    generate_series rejects lateral/subquery parameters) filtered to each
    doc's real length — 65536 comfortably exceeds every testdata doc."""
    return f"""
WITH pos AS (
  SELECT doc_id, substr(text, CAST(p AS INTEGER), {length}) AS sh
  FROM documents
  JOIN generate_series(1, 65536, {stride}) AS t(p)
    ON p <= CAST(length(text) AS INTEGER) - {length - 1}
),
dup AS (
  SELECT sh FROM pos GROUP BY sh HAVING count(DISTINCT doc_id) > 1
)
SELECT doc_id, count(*) AS n_dup_spans
FROM pos JOIN dup USING (sh)
GROUP BY doc_id
"""


def sql_quantiles_by_lang() -> str:
    """Mirror of ``training.q_quantiles_by_lang``: quantile_disc is the
    ceil(q*n)-th smallest (verified), same convention as the engine's
    merged-histogram read-off."""
    return """
SELECT lang,
       quantile_disc(n_chars, 0.50) AS p50,
       quantile_disc(n_chars, 0.90) AS p90,
       quantile_disc(n_chars, 0.99) AS p99,
       count(*) AS n_rows
FROM documents
GROUP BY lang
"""


def sql_hll_users(p: int = 8) -> str:
    """Mirror of ``training.q_hll_users``: identical Mersenne-61 hash in
    HUGEINT arithmetic; rho = trailing zeros of the non-register bits + 1
    (w & -w isolates a power of two, whose float log2 is exact)."""
    m = 1 << p
    w_zero_rho = 61 - p + 1
    return f"""
WITH h0 AS (
  SELECT event_type,
         ((CAST(user_id AS HUGEINT) % 2305843009213693951)
           * 1752450205419405103 + 1234567891011121314) % 2305843009213693951 AS a
  FROM events
), h1 AS (
  SELECT event_type,
         xor(CAST(a AS BIGINT), CAST(a AS BIGINT) // 536870912) % 2305843009213693951 AS b
  FROM h0
), h2t AS (
  SELECT event_type,
         (CAST(b AS HUGEINT) * 1803867173528181589) % 2305843009213693951 AS c
  FROM h1
), h AS (
  SELECT event_type,
         xor(CAST(c AS BIGINT), CAST(c AS BIGINT) // 2147483648) % 2305843009213693951 AS h2
  FROM h2t
), r AS (
  SELECT event_type,
         CAST(h2 % {m} AS BIGINT) AS register,
         CAST(h2 // {m} AS BIGINT) AS w
  FROM h
)
SELECT event_type, register,
       max(CASE WHEN w = 0 THEN {w_zero_rho}
            ELSE CAST(round(log2(CAST(w & -w AS DOUBLE))) AS BIGINT) + 1 END) AS max_rho
FROM r GROUP BY event_type, register
"""


_H61 = "2305843009213693951"


def _hash61_ctes(table: str, key: str) -> str:
    """CTE chain computing the engine's hash61(key) as column _h (HUGEINT
    mod M61) — mirrors stages/sketch.py hash61 integer-for-integer."""
    return f"""
_h0 AS (SELECT *, ((CAST({key} AS HUGEINT) % {_H61})
                   * 1752450205419405103 + 1234567891011121314) % {_H61} AS _a
        FROM {table}),
_h1 AS (SELECT *, xor(CAST(_a AS BIGINT), CAST(_a AS BIGINT) // 536870912)
                   % {_H61} AS _b FROM _h0),
_h2 AS (SELECT *, (CAST(_b AS HUGEINT) * 1803867173528181589) % {_H61} AS _c
        FROM _h1),
_hh AS (SELECT *, xor(CAST(_c AS BIGINT), CAST(_c AS BIGINT) // 2147483648)
                   % {_H61} AS _h FROM _h2)"""


def sql_weighted_sample() -> str:
    """Mirror of ``training.q_weighted_sample``."""
    return f"""
WITH {_hash61_ctes("documents", "doc_id")}
SELECT doc_id, lang, n_chars
FROM _hh
WHERE CAST(_h % 10000 AS BIGINT) < least(n_chars * 20, 9999)
"""


def sql_source_median_dev() -> str:
    """Mirror of ``training.q_source_median_dev`` (quantile_disc median,
    integer deviation)."""
    return """
WITH s AS (
  SELECT source, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY source
)
SELECT doc_id, d.source, n_chars - med AS dev
FROM documents d JOIN s USING (source)
"""


def sql_pagerank(iters: int = 5, damping_pct: int = 85, scale: int = 10**9) -> str:
    """Mirror of ``training.q_pagerank``: identical integer fixed-point
    arithmetic, iterations unrolled as CTE stages.  N is read from the
    documents view itself (dense doc_ids 0..N-1)."""
    head = f"""
WITH n AS (SELECT count(*) AS nv FROM documents),
nodes AS (SELECT doc_id AS id FROM documents),
edges AS (
  SELECT doc_id AS src, (doc_id * doc_id + a) % (SELECT nv FROM n) AS dst
  FROM documents, (VALUES (7), (13), (29)) AS t(a)
),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
base AS (SELECT ({scale} // nv * {100 - damping_pct}) // 100 AS b,
                {scale} // nv AS r0v FROM n),
r0 AS (SELECT id, (SELECT r0v FROM base) AS r FROM nodes)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""",
r{i} AS (
  SELECT nodes.id,
         (SELECT b FROM base)
           + {damping_pct} * coalesce(s.c, 0) // 100 AS r
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, sum(r{i-1}.r // deg.d) AS c
    FROM edges e
    JOIN r{i-1} ON r{i-1}.id = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) s ON s.id = nodes.id
)""")
    return (head + "".join(steps)
            + f"\nSELECT id AS node_id, CAST(r AS BIGINT) AS rank FROM r{iters}\n")


def sql_retention() -> str:
    """Mirror of ``training.q_retention`` (weekly cohorts, epoch-us)."""
    return """
WITH f AS (
  SELECT user_id, min(epoch_us(ts)) // 604800000000 AS cohort_w
  FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS active_w
  FROM events
)
SELECT cohort_w, active_w - cohort_w AS week_offset, count(*) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY cohort_w, week_offset
"""


def sql_bigram_stats(min_count: int = 5) -> str:
    """Mirror of ``training.q_bigram_stats`` (same [a-z0-9]+ token grammar
    as sql_vocab_topk; adjacency via list index + constant-bound series)."""
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM tok JOIN generate_series(1, 65536) s(i) ON i <= len(ts) - 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
u AS (
  SELECT w AS token, count(*) AS c
  FROM (SELECT unnest(ts) AS w FROM tok) GROUP BY w
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12,
       CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2
FROM bc JOIN u u1 ON u1.token = bc.w1 JOIN u u2 ON u2.token = bc.w2
WHERE c12 >= {min_count}
"""


def sql_corpus_checksum() -> str:
    """Twin of ``training.q_corpus_checksum``: per-doc md5-hi as HUGEINT
    (two 32-bit hex halves), summed mod 2**64, wrapped to signed int64."""
    two63, two64 = 1 << 63, 1 << 64
    # hex-literal parse only lands in BIGINT; widen to HUGEINT after
    v = ("CAST(CAST(concat('0x', substr(md5(lower(text)), 1, 8)) AS BIGINT)"
         " AS HUGEINT) * 4294967296"
         " + CAST(concat('0x', substr(md5(lower(text)), 9, 8)) AS BIGINT)")
    return f"""
SELECT count(*) AS n_docs,
       CAST(((sum({v}) % {two64}) + {two63}) % {two64} - {two63} AS BIGINT)
         AS checksum
FROM documents
"""


def sql_mixture_sample(total: int = 100) -> str:
    """Twin of ``training.q_mixture_sample``: target-weight apportionment
    (weights 1000+2000*i over sources sorted asc), capped at stratum size,
    M61 rank within source."""
    return f"""
WITH {_hash61_ctes("documents", "doc_id")},
cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
wt AS (
    SELECT source, cnt.n,
           1000 + 2000 * (row_number() OVER (ORDER BY source) - 1) AS w
    FROM cnt),
tot AS (SELECT CAST(sum(w) AS BIGINT) AS total_w FROM wt),
base AS (
    SELECT source, wt.n,
           CAST((wt.w * {total}) // tot.total_w AS BIGINT) AS fl,
           CAST((wt.w * {total}) % tot.total_w AS BIGINT) AS rem
    FROM wt, tot),
rr AS (SELECT source, n, fl,
              row_number() OVER (ORDER BY rem DESC, source) AS rk
       FROM base),
alloc AS (
    SELECT source,
           least(fl + CASE WHEN rk <= {total} -
                                (SELECT CAST(sum(fl) AS BIGINT) FROM base)
                           THEN 1 ELSE 0 END, n) AS k
    FROM rr),
ranked AS (
    SELECT source, doc_id,
           row_number() OVER (PARTITION BY source ORDER BY _h, doc_id) AS rnk
    FROM _hh)
SELECT r.source, r.doc_id
FROM ranked r JOIN alloc a USING (source)
WHERE r.rnk <= a.k
ORDER BY 1, 2
"""


def sql_fastss_pairs() -> str:
    """Twin of ``training.q_fastss_pairs``: distinct hosts cross-joined
    with levenshtein == 1 (the oracle may go quadratic; the engine must
    not)."""
    return """
WITH hosts AS (
    SELECT DISTINCT 'example' || CAST(doc_id % 997 AS VARCHAR) || '.com'
           AS host
    FROM documents)
SELECT a.host AS host_a, b.host AS host_b
FROM hosts a JOIN hosts b ON a.host < b.host
WHERE levenshtein(a.host, b.host) = 1
ORDER BY 1, 2
"""


def sql_proportional_sample(total: int = 100) -> str:
    """Twin of ``sampling.proportional_sample``: largest-remainder
    apportionment per lang, then M61-hash rank <= alloc."""
    return f"""
WITH {_hash61_ctes("documents", "doc_id")},
cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_n FROM cnt),
base AS (
    SELECT lang, cnt.n,
           CAST((cnt.n * {total}) // tot.total_n AS BIGINT) AS fl,
           CAST((cnt.n * {total}) % tot.total_n AS BIGINT) AS rem
    FROM cnt, tot),
rr AS (SELECT lang, fl, row_number() OVER (ORDER BY rem DESC, lang) AS rk
       FROM base),
alloc AS (
    SELECT lang,
           fl + CASE WHEN rk <= {total} - (SELECT CAST(sum(fl) AS BIGINT)
                                           FROM base)
                     THEN 1 ELSE 0 END AS k
    FROM rr),
ranked AS (
    SELECT lang, doc_id,
           row_number() OVER (PARTITION BY lang ORDER BY _h, doc_id) AS rnk
    FROM _hh)
SELECT r.lang, r.doc_id
FROM ranked r JOIN alloc a USING (lang)
WHERE r.rnk <= a.k
ORDER BY 1, 2
"""


def sql_quantize_embed() -> str:
    """Twin of ``training.q_quantize_embed`` via DuckDB list lambdas —
    same scale / round_even(x/scale*127) chain in DOUBLE."""
    scale = "list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))"
    q = (f"list_transform(embedding, x -> CASE WHEN {scale} > 0 THEN "
         f"round_even(CAST(x AS DOUBLE) / {scale} * 127.0, 0) ELSE 0.0 END)")
    return f"""
SELECT vec_id,
       CAST(round_even({scale} * 1000000000.0, 0) AS BIGINT) AS scale_ppb,
       CAST(list_sum({q}) AS BIGINT) AS q_sum,
       CAST(list_min({q}) AS BIGINT) AS q_min,
       CAST(list_max({q}) AS BIGINT) AS q_max
FROM embeddings ORDER BY vec_id
"""


def sql_tpch_q5(region: str = "ASIA",
                lo_us: int = 820_454_400_000_000,
                hi_us: int = 852_076_800_000_000) -> str:
    """Twin of ``training.q_tpch_q5`` in exact integer cents x pct."""
    return f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'
  AND c.c_nationkey = s.s_nationkey
  AND epoch_us(o.o_orderdate) >= {lo_us}
  AND epoch_us(o.o_orderdate) < {hi_us}
GROUP BY 1 ORDER BY 1
"""


def sql_vocab_coverage(ks=(1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024)) -> str:
    """Twin of ``text.vocab_coverage``: rank the vocabulary (n DESC, token
    ASC), cumulative-sum at each k, plus the corpus token total."""
    klist = ", ".join(str(k) for k in ks)
    return f"""
WITH tok AS (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM c),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
ks AS (SELECT unnest([{klist}]) AS k)
SELECT ks.k,
       CAST(coalesce((SELECT sum(r.n) FROM r WHERE r.rk <= ks.k), 0) AS BIGINT)
         AS covered,
       (SELECT total FROM tot) AS total
FROM ks ORDER BY ks.k
"""


def sql_next_token(min_count: int = 5) -> str:
    """Twin of ``text.next_token``: bigram counts >= min_count, then
    row_number() per w1 ordered (c12 DESC, w2 ASC), rank 1 only."""
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
bi AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM tok JOIN generate_series(1, 65536) s(i) ON i <= len(ts) - 1
),
bc AS (
  SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2
  HAVING count(*) >= {min_count}
),
r AS (
  SELECT w1, w2, c12,
         row_number() OVER (PARTITION BY w1 ORDER BY c12 DESC, w2) AS rk
  FROM bc
)
SELECT w1, w2, CAST(c12 AS BIGINT) AS c12 FROM r WHERE rk = 1 ORDER BY w1
"""


def sql_rare_bigrams(min_count: int = 5) -> str:
    """Mirror of ``training.q_rare_bigrams``: bigrams below min_count are
    rare; per-doc totals over the adjacent-pair stream."""
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
bi AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM tok JOIN generate_series(1, 65536) s(i) ON i <= len(ts) - 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
common AS (SELECT w1, w2 FROM bc WHERE c12 >= {min_count})
SELECT b.doc_id, count(*) AS n_bigrams,
       CAST(count(*) FILTER (WHERE c.w1 IS NULL) AS BIGINT) AS n_rare
FROM bi b LEFT JOIN common c ON b.w1 = c.w1 AND b.w2 = c.w2
GROUP BY b.doc_id
"""


def sql_canonical_docs() -> str:
    """Closed-form mirror of ``training.q_canonical_docs`` on the planted
    corpus: component of {2d, 2d+1} is 2d."""
    return """
SELECT doc_id * 2 AS node, doc_id * 2 AS comp FROM documents
UNION ALL
SELECT doc_id * 2 + 1 AS node, doc_id * 2 AS comp FROM documents
"""


def sql_delta_dedup() -> str:
    """Mirror of ``training.q_delta_dedup``: the planted re-entries join
    the old corpus on the text itself; old_id = min content-equal doc."""
    return """
WITH n AS (SELECT count(*) AS nv FROM documents),
added AS (
  SELECT (SELECT nv FROM n) + doc_id AS new_id, text
  FROM documents WHERE doc_id % 13 = 0)
SELECT a.new_id, CAST(min(o.doc_id) AS BIGINT) AS old_id
FROM added a JOIN documents o ON o.text = a.text
GROUP BY 1
"""


def sql_vocab_growth(n_buckets_out: int = 10) -> str:
    """Twin of ``training.q_vocab_growth``: unnest tokens of the
    reconstructed page text, min first doc_id per token, decile census +
    window cumsum."""
    return f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
toks AS (
    SELECT d.doc_id,
           unnest(regexp_extract_all(lower({sql_text_full()}),
                                     '[a-z0-9]+')) AS token
    FROM documents d),
firsts AS (SELECT token, min(doc_id) AS first_doc FROM toks GROUP BY 1),
dec AS (
    SELECT first_doc * {n_buckets_out} // n.nn AS decile, count(*) AS newt
    FROM firsts CROSS JOIN n GROUP BY 1)
SELECT decile, CAST(newt AS BIGINT) AS new_tokens,
       CAST(sum(newt) OVER (ORDER BY decile) AS BIGINT) AS cum_tokens
FROM dec ORDER BY 1
"""


def sql_reshard_moves(n_shards: int = 12) -> str:
    """Twin of ``training.q_reshard_moves``: the hash61 chain per
    (doc, shard) candidate, argmax via row_number (ties -> smaller s,
    matching np.argmax's first-max)."""
    return f"""
WITH base AS (
    SELECT doc_id, gs.s, doc_id * 64 + gs.s AS hk
    FROM documents
    CROSS JOIN (SELECT unnest(range(0, {n_shards + 1})) AS s) gs),
{_hash61_ctes('base', 'hk')},
old AS (
    SELECT doc_id, s AS shard_old FROM (
        SELECT _hh.*, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY _h DESC, s) AS rn
        FROM _hh WHERE s < {n_shards}) WHERE rn = 1),
new AS (
    SELECT doc_id, s AS shard_new FROM (
        SELECT _hh.*, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY _h DESC, s) AS rn
        FROM _hh) WHERE rn = 1)
SELECT o.shard_old, count(*) AS n_docs,
       CAST(sum(CASE WHEN n.shard_new <> o.shard_old THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved
FROM old o JOIN new n USING (doc_id)
GROUP BY 1 ORDER BY 1
"""


def sql_ivm_counts() -> str:
    """Twin of ``training.q_ivm_counts`` by DIRECT aggregation of the v2
    snapshot (the engine never scans v2 — agreement proves the
    incremental maintenance algebra)."""
    return """
WITH v2 AS (
    SELECT lang,
           CAST(length(text) + CASE WHEN doc_id % 7 = 0 THEN 3 ELSE 0 END
                AS BIGINT) AS len
    FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT 'xx' AS lang,
           CAST(length('fresh doc ' || CAST(doc_id AS VARCHAR)) AS BIGINT)
    FROM documents WHERE doc_id % 13 = 0)
SELECT lang, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS n_chars
FROM v2 GROUP BY 1 ORDER BY 1
"""


def sql_corpus_diff() -> str:
    """Mirror of ``training.q_corpus_diff``: v2 snapshot replayed in SQL,
    full outer join on doc_id, direct text comparison."""
    return """
WITH n AS (SELECT count(*) AS nv FROM documents),
v2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT (SELECT nv FROM n) + doc_id, 'fresh doc ' || CAST(doc_id AS VARCHAR)
  FROM documents WHERE doc_id % 13 = 0
)
SELECT coalesce(o.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN o.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN o.text = v2.text THEN 'same'
            ELSE 'changed' END AS status
FROM documents o FULL OUTER JOIN v2 ON o.doc_id = v2.doc_id
"""


def sql_funnel() -> str:
    """Mirror of ``training.q_funnel`` (>= tie semantics at each level)."""
    return """
WITH v AS (
  SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.t1
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.t2
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_s1,
       (SELECT count(*) FROM c) AS n_s2,
       (SELECT count(*) FROM p) AS n_s3
"""


def sql_window_ohlc() -> str:
    """Mirror of ``training.q_window_ohlc`` ((ts, event_id) tie order via
    a HUGEINT-packed arg_min/arg_max key)."""
    return """
WITH e AS (
  SELECT event_type,
         epoch_us(ts) // 3600000000 AS window_id,
         CAST(epoch_us(ts) AS HUGEINT) * 4294967296 + event_id AS k,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT event_type, window_id,
       arg_min(cents, k) AS open_cents,
       arg_max(cents, k) AS close_cents,
       min(cents) AS lo, max(cents) AS hi,
       count(*) AS n_events
FROM e GROUP BY event_type, window_id
"""


def sql_mad_outliers(k: int = 3) -> str:
    """Mirror of ``training.q_mad_outliers`` (quantile_disc medians)."""
    return f"""
WITH m AS (
  SELECT source, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY source
),
d AS (
  SELECT doc_id, d0.source, n_chars - med AS dev
  FROM documents d0 JOIN m USING (source)
),
mad AS (SELECT source, quantile_disc(abs(dev), 0.5) AS mad FROM d GROUP BY source)
SELECT doc_id, d.source, dev, abs(dev) > {k} * mad AS is_outlier
FROM d JOIN mad USING (source)
"""


def sql_range_join() -> str:
    """Mirror of ``training.q_range_join`` (interval containment join)."""
    return """
SELECT doc_id, n_chars, n_nationkey
FROM documents JOIN nation
  ON n_chars >= n_nationkey * 22 AND n_chars < n_nationkey * 22 + 22
"""


def sql_table_profile() -> str:
    """Mirror of ``training.q_table_profile`` — profiling over the VARCHAR
    cast of each column (lexicographic min/max on both sides)."""
    parts = []
    for c in ("lang", "source", "n_chars"):
        parts.append(f"""
SELECT '{c}' AS column,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct,
       min(CAST({c} AS VARCHAR)) AS min_v,
       max(CAST({c} AS VARCHAR)) AS max_v
FROM documents""")
    return " UNION ALL ".join(parts)


def sql_partitioned_roundtrip() -> str:
    """Twin of ``training.q_partitioned_roundtrip``."""
    return """
SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'en'
GROUP BY 1 ORDER BY 1
"""


def sql_window_deltas() -> str:
    """Twin of ``training.q_window_deltas``: lag() over the hourly
    aggregate, first window per type dropped (NULL lag)."""
    return """
WITH agg AS (
    SELECT event_type, epoch_us(ts) // 3600000000 AS window_id,
           count(*) AS n
    FROM events GROUP BY 1, 2),
d AS (
    SELECT event_type, window_id, n,
           n - lag(n) OVER (PARTITION BY event_type ORDER BY window_id)
             AS delta
    FROM agg)
SELECT event_type, window_id, CAST(n AS BIGINT) AS n,
       CAST(delta AS BIGINT) AS delta
FROM d WHERE delta IS NOT NULL
ORDER BY 1, 2
"""


def sql_peak_concurrency() -> str:
    """Twin of ``events.peak_concurrency``: the sessionize CTE, +1/-1
    deltas at start/end+1, ordered prefix, max + earliest time."""
    sess = sql_sessionize().strip()
    return f"""
WITH sess AS ({sess}),
deltas AS (
    SELECT start_us AS t, 1 AS d FROM sess
    UNION ALL SELECT end_us + 1 AS t, -1 AS d FROM sess),
per_t AS (SELECT t, CAST(sum(d) AS BIGINT) AS d FROM deltas GROUP BY t),
pre AS (
    SELECT t, sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS c
    FROM per_t)
SELECT CAST((SELECT max(c) FROM pre) AS BIGINT) AS peak,
       (SELECT min(t) FROM pre WHERE c = (SELECT max(c) FROM pre))
         AS t_at_peak
"""


def sql_source_centroid(fp: int = 16384) -> str:
    """Twin of ``training.q_source_centroid``."""
    return f"""
WITH e AS (SELECT vec_id, embedding, len(embedding) AS d FROM embeddings),
vals AS (
    SELECT vec_id AS doc_id, s.i - 1 AS dim,
           CAST(floor(CAST(embedding[s.i] AS DOUBLE) * {fp}) AS BIGINT) AS q
    FROM e JOIN generate_series(1, 4096) s(i) ON s.i <= e.d)
SELECT doc.source, v.dim, count(*) AS n, CAST(sum(v.q) AS BIGINT) AS sum_fp
FROM documents doc JOIN vals v USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_event_transitions() -> str:
    """Twin of ``training.q_event_transitions``: lag() per user over
    (ts, event_id) order."""
    return """
WITH e AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu FROM events),
p AS (
    SELECT user_id, event_type AS type_to,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY tsu, event_id) AS type_from
    FROM e)
SELECT type_from, type_to, count(*) AS n
FROM p WHERE type_from IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_cusum_alert() -> str:
    """Twin of ``training.q_cusum_alert``: the closed-form CUSUM via
    running sum + running min window functions."""
    return """
WITH agg AS (
    SELECT event_type, epoch_us(ts) // 3600000000 AS window_id,
           count(*) AS n
    FROM events GROUP BY 1, 2),
kk AS (
    SELECT CAST((SELECT count(*) FROM events)
                // (SELECT count(*) FROM agg) AS BIGINT) AS k),
p1 AS (
    SELECT event_type, window_id,
           sum(n - (SELECT k FROM kk))
             OVER (PARTITION BY event_type ORDER BY window_id
                   ROWS UNBOUNDED PRECEDING) AS prefix
    FROM agg),
p2 AS (
    SELECT *, least(0, min(prefix)
             OVER (PARTITION BY event_type ORDER BY window_id
                   ROWS UNBOUNDED PRECEDING)) AS rm
    FROM p1),
s AS (SELECT event_type, window_id, prefix - rm AS cus FROM p2),
mx AS (SELECT event_type, max(cus) AS max_cusum FROM s GROUP BY 1),
pk AS (
    SELECT s.event_type, min(s.window_id) AS peak_window
    FROM s JOIN mx ON s.event_type = mx.event_type AND s.cus = mx.max_cusum
    GROUP BY 1)
SELECT mx.event_type, CAST(mx.max_cusum AS BIGINT) AS max_cusum,
       pk.peak_window, (SELECT k FROM kk) AS ref_k
FROM mx JOIN pk USING (event_type) ORDER BY 1
"""


def sql_benford_census() -> str:
    """Twin of ``training.q_benford_census``: first digit via substr of the
    integer cents string."""
    return """
WITH c AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
    FROM events),
d AS (
    SELECT event_type,
           CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM c WHERE cents > 0)
SELECT event_type, digit, count(*) AS n
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_length_hist_sim(bucket: int = 64) -> str:
    """Twin of ``training.q_length_hist_sim``: full-join histograms with
    least() intersection."""
    return f"""
WITH h AS (
    SELECT lang, n_chars // {bucket} AS b, count(*) AS n
    FROM documents GROUP BY 1, 2),
langs AS (SELECT DISTINCT lang FROM documents)
SELECT a.lang AS lang_a, b.lang AS lang_b,
       CAST(coalesce(sum(least(ha.n, hb.n)), 0) AS BIGINT) AS n_common
FROM langs a
JOIN langs b ON a.lang < b.lang
LEFT JOIN h ha ON ha.lang = a.lang
LEFT JOIN h hb ON hb.lang = b.lang AND hb.b = ha.b
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_embed_dim_stats(fp: int = 16384) -> str:
    """Twin of ``training.q_embed_dim_stats``."""
    return f"""
WITH e AS (
    SELECT vec_id, embedding, len(embedding) AS d FROM embeddings),
vals AS (
    SELECT s.i - 1 AS dim,
           CAST(floor(CAST(embedding[s.i] AS DOUBLE) * {fp}) AS BIGINT) AS q
    FROM e JOIN generate_series(1, 4096) s(i) ON s.i <= e.d)
SELECT dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS sum_fp,
       min(q) AS min_fp, max(q) AS max_fp
FROM vals GROUP BY 1 ORDER BY 1
"""


def sql_lang_overlap() -> str:
    """Twin of ``training.q_lang_overlap``: distinct (lang, token) pairs,
    pairwise intersection counts."""
    return """
WITH lt AS (
    SELECT DISTINCT lang,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents)
SELECT a.lang AS lang_a, b.lang AS lang_b, count(*) AS n_shared
FROM lt a JOIN lt b ON a.token = b.token AND a.lang < b.lang
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_cube_counts() -> str:
    """Twin of ``training.q_cube_counts``: GROUP BY CUBE with '(all)'
    sentinels on rolled dimensions."""
    return """
SELECT COALESCE(lang, '(all)') AS lang,
       COALESCE(source, '(all)') AS source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE (lang, source)
ORDER BY 1, 2
"""


def sql_dedup_by_source() -> str:
    """Twin of ``training.q_dedup_by_source``."""
    return """
SELECT source, count(DISTINCT text) AS n_unique, count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def sql_ab_assign(arms: int = 4) -> str:
    """Twin of ``training.q_ab_assign``: M61 arm hash, distinct users and
    purchase counts per arm."""
    return f"""
WITH {_hash61_ctes("events", "user_id")},
per_user AS (
    SELECT CAST(_h % {arms} AS BIGINT) AS arm, user_id,
           sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
    FROM _hh GROUP BY 1, 2)
SELECT arm, count(*) AS n_users, CAST(sum(buys) AS BIGINT) AS n_purchases
FROM per_user GROUP BY 1 ORDER BY 1
"""


def sql_split_leakage(k: int = 5, val_bp: int = 100,
                      test_bp: int = 100) -> str:
    """Twin of ``dedup.split_leakage``: the dataset_split M61 rule, k-gram
    windows per doc, per-position EXISTS semijoin of test grams against
    train grams."""
    return f"""
WITH {_hash61_ctes("documents", "doc_id")},
tagged AS (
    SELECT doc_id, text,
           CASE WHEN CAST(_h % 10000 AS BIGINT) < {val_bp} THEN 'val'
                WHEN CAST(_h % 10000 AS BIGINT) < {val_bp + test_bp}
                    THEN 'test'
                ELSE 'train' END AS split
    FROM _hh),
words AS (
    SELECT doc_id, split,
           regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
    FROM tagged),
grams AS (
    SELECT doc_id, split,
           CASE WHEN len(ws) >= {k}
                THEN array_to_string(ws[i:i+{k - 1}], ' ')
                ELSE array_to_string(ws, ' ') END AS gram
    FROM words,
         UNNEST(generate_series(1, greatest(len(ws) - {k - 1}, 1))) AS t(i)
    WHERE len(ws) > 0),
train_grams AS (SELECT DISTINCT gram FROM grams WHERE split = 'train'),
hits AS (
    SELECT g.doc_id, count(*) AS n_leaked
    FROM grams g
    WHERE g.split = 'test'
      AND EXISTS (SELECT 1 FROM train_grams t WHERE t.gram = g.gram)
    GROUP BY 1)
SELECT w.doc_id, COALESCE(h.n_leaked, 0) AS n_leaked,
       COALESCE(h.n_leaked, 0) > 0 AS leaked
FROM words w LEFT JOIN hits h USING (doc_id)
WHERE w.split = 'test'
ORDER BY 1
"""


def sql_dataset_split(val_bp: int = 100, test_bp: int = 100) -> str:
    """Mirror of ``training.q_dataset_split``."""
    return f"""
WITH {_hash61_ctes("documents", "doc_id")}
SELECT doc_id, lang,
       CASE WHEN CAST(_h % 10000 AS BIGINT) < {val_bp} THEN 'val'
            WHEN CAST(_h % 10000 AS BIGINT) < {val_bp + test_bp} THEN 'test'
            ELSE 'train' END AS split
FROM _hh
"""


def sql_chunk_documents(chunk_chars: int = 256, overlap: int = 64) -> str:
    """Mirror of ``training.q_chunk_documents``."""
    stride = chunk_chars - overlap
    return f"""
SELECT doc_id,
       CAST((p - 1) // {stride} AS BIGINT) AS chunk_ord,
       substr(text, CAST(p AS INTEGER), {chunk_chars}) AS chunk_text,
       CAST(length(substr(text, CAST(p AS INTEGER), {chunk_chars})) AS BIGINT)
         AS n_chunk_chars
FROM documents
JOIN generate_series(1, 65536, {stride}) AS t(p)
  ON p <= CAST(length(text) AS INTEGER)
"""


# ------------------------------------------------------------- URL / domain --

URL_EXPR = "'https://example' || (d.doc_id % 997) || '.com/p/' || d.doc_id"


def sql_url_parse() -> str:
    """Parse the url back apart with SQL string/list functions — an
    independent re-derivation of the Arrow split/list kernel semantics."""
    return f"""
WITH pages AS (SELECT {URL_EXPR} AS url FROM documents d)
SELECT url,
       string_split(url, '/')[3] AS host,
       '/' || array_to_string(string_split(url, '/')[4:], '/') AS path,
       len(string_split(url, '/')) - 3 AS depth
FROM pages
ORDER BY url
"""


def sql_domain_stats() -> str:
    return f"""
SELECT 'example' || (d.doc_id % 997) || '.com' AS host,
       count(*) AS n_pages,
       CAST(SUM(strlen({sql_text_full()})) AS BIGINT) AS total_bytes,
       MIN(d.doc_id) AS min_doc,
       MAX(d.doc_id) AS max_doc
FROM documents d
GROUP BY 1
ORDER BY host
"""


def sql_domain_cap(k: int = 2) -> str:
    return f"""
WITH pages AS (
    SELECT 'example' || (d.doc_id % 997) || '.com' AS host,
           d.doc_id AS doc_id,
           {URL_EXPR} AS url
    FROM documents d
),
ranked AS (
    SELECT host, doc_id, url,
           row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
    FROM pages
)
SELECT host, doc_id, url FROM ranked WHERE rn <= {k}
ORDER BY host, doc_id
"""


def sql_knn_classify(nq: int = 16, k: int = 5, dim: int = 64,
                     scale: int = 1 << 14) -> str:
    """Twin of ``training.q_knn_classify``: brute integer kNN + majority
    vote (vote ties -> smaller label)."""
    return f"""
WITH q AS (
    SELECT vec_id, label,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)) AS qv
    FROM embeddings
),
qry AS (SELECT vec_id, qv FROM q WHERE vec_id < {nq}),
d AS (
    SELECT qry.vec_id AS qid, c.vec_id AS nid, c.label,
           CAST(SUM((qry.qv[r.i] - c.qv[r.i])
                  * (qry.qv[r.i] - c.qv[r.i])) AS BIGINT) AS d2
    FROM qry CROSS JOIN q c CROSS JOIN range(1, {dim + 1}) r(i)
    WHERE c.vec_id >= {nq}
    GROUP BY 1, 2, 3
),
topk AS (
    SELECT * FROM (
        SELECT d.*, row_number() OVER (PARTITION BY qid
                                       ORDER BY d2, nid) AS rn
        FROM d) WHERE rn <= {k}
),
votes AS (
    SELECT qid, CAST(label AS BIGINT) AS label, count(*) AS v
    FROM topk GROUP BY 1, 2),
pred AS (
    SELECT * FROM (
        SELECT votes.*, row_number() OVER (PARTITION BY qid
                                           ORDER BY v DESC, label) AS rn
        FROM votes) WHERE rn = 1)
SELECT p.qid AS vec_id, CAST(t.label AS BIGINT) AS true_label,
       p.label AS pred_label, CAST(p.v AS BIGINT) AS votes
FROM pred p JOIN q t ON t.vec_id = p.qid
ORDER BY 1
"""


def sql_cluster_assign(k: int = 8, dim: int = 64, scale: int = 1 << 14) -> str:
    """Mirror of ``ann.kmeans_assign``: fixed-point quantize (floor of an
    EXACT power-of-two float64 multiply), integer squared distances, argmin
    with ties on the smaller centroid id (row_number ORDER BY dist2, cid)."""
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)) AS qv
    FROM embeddings
),
cent AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k}),
dists AS (
    SELECT q.vec_id, c.cid,
           CAST(SUM((q.qv[r.i] - c.cv[r.i]) * (q.qv[r.i] - c.cv[r.i])) AS BIGINT) AS dist2
    FROM q CROSS JOIN cent c CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
best AS (
    SELECT vec_id, cid, dist2,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
    FROM dists
)
SELECT vec_id, cid AS cluster, dist2 FROM best WHERE rn = 1
ORDER BY vec_id
"""


def sql_running_total() -> str:
    """Mirror of ``events.running_total``: the canonical ordered-window
    cumulative sum, integer cents (same rounding expression as the other
    event oracles)."""
    return """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events
ORDER BY event_id
"""


def sql_anti_join(cutoff_us: int = 804_556_800_000_000) -> str:
    """Mirror of ``q_anti_join``: per-nation count of customers with no
    order before the cutoff."""
    return f"""
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_inactive
FROM customer
WHERE c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE epoch_us(o_orderdate) < {cutoff_us}
)
GROUP BY 1 ORDER BY 1
"""


def sql_tpch_q3(segment: str = "BUILDING",
                cutoff_us: int = 883_612_800_000_000, k: int = 10) -> str:
    """Mirror of ``q_tpch_q3``: integer revenue (price_cents x
    (100 - disc_pct)), epoch-us dates, ties (revenue desc, orderkey asc)."""
    return f"""
WITH line AS (
    SELECT l_orderkey,
           CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev
    FROM lineitem
    WHERE epoch_us(l_shipdate) > {cutoff_us}
),
ords AS (
    SELECT o_orderkey, epoch_us(o_orderdate) AS odate_us
    FROM orders
    WHERE epoch_us(o_orderdate) < {cutoff_us}
      AND o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = '{segment}')
)
SELECT l.l_orderkey, o.odate_us,
       CAST(sum(l.rev) AS BIGINT) AS revenue
FROM line l JOIN ords o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
ORDER BY revenue DESC, l.l_orderkey
LIMIT {k}
"""


def sql_interval_join(window_us: int = 3600 * 1_000_000) -> str:
    """Mirror of ``events.interval_join_views``."""
    return f"""
SELECT p.event_id,
       CAST(count(v.event_id) AS BIGINT) AS n_prior_views
FROM events p
LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND epoch_us(v.ts) >= epoch_us(p.ts) - {window_us}
 AND epoch_us(v.ts) < epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY 1 ORDER BY 1
"""


def sql_pctl_by_type() -> str:
    """Mirror of ``q_pctl_by_type``: floor((rank-1)*100 / group size)."""
    return """
SELECT event_id, event_type,
       CAST((rnk - 1) * 100 // cnt AS BIGINT) AS pctl
FROM (
    SELECT event_id, event_type,
           rank() OVER (PARTITION BY event_type
                        ORDER BY CAST(round(value * 100) AS BIGINT)) AS rnk,
           count(*) OVER (PARTITION BY event_type) AS cnt
    FROM events
)
ORDER BY event_id
"""


def sql_hourly_active(window_us: int = 3600 * 1_000_000) -> str:
    """Mirror of ``events.hourly_active``."""
    return f"""
SELECT epoch_us(ts) // {window_us} AS window_id,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1 ORDER BY 1
"""


def sql_latest_per_user() -> str:
    """Mirror of ``events.latest_per_user`` (argmax ties on event_id)."""
    return """
SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) WHERE rn = 1 ORDER BY user_id
"""


def sql_rank_in_type() -> str:
    """Mirror of ``events.rank_in_group``: RANK over cents within type."""
    return """
SELECT event_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS cents,
       CAST(rank() OVER (PARTITION BY event_type
                         ORDER BY CAST(round(value * 100) AS BIGINT))
            AS BIGINT) AS rnk
FROM events
ORDER BY event_id
"""


def sql_left_join_audit(price_threshold: float = 250_000.0) -> str:
    """Mirror of ``q_left_join_audit``: LEFT JOIN null-fill census."""
    return f"""
WITH hv AS (
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS otp_cents
    FROM orders WHERE o_totalprice >= {price_threshold!r}
)
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(hv.otp_cents) AS BIGINT) AS n_matched,
       CAST(sum(COALESCE(hv.otp_cents, 0)) AS BIGINT) AS matched_cents
FROM lineitem l LEFT JOIN hv ON l.l_orderkey = hv.o_orderkey
GROUP BY 1
ORDER BY 1
"""


def sql_triangles() -> str:
    """Mirror of ``q_triangles``: min-ID-apex enumeration — the count is
    enumeration-order independent, so it matches the engine's min-RANK
    apex exactly."""
    return """
WITH n AS (SELECT count(*) AS nn FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * doc_id + t.a) % n.nn AS dst
    FROM documents CROSS JOIN (VALUES (7), (13), (29)) t(a) CROSS JOIN n
),
e AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM e0 WHERE src <> dst
)
SELECT (SELECT CAST(count(*) AS BIGINT)
        FROM e e1
        JOIN e e2 ON e2.a = e1.a AND e1.b < e2.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles,
       (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges
"""


def sql_event_seq() -> str:
    """Mirror of ``events.event_seq``: ordered string_agg of event-type
    initials per user."""
    return """
SELECT user_id,
       string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS seq,
       count(*) AS n_events
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def sql_pivot_counts() -> str:
    """Mirror of ``events.pivot_counts``: conditional-count pivot."""
    types = ("click", "error", "purchase", "signup", "view")
    cols = ",\n       ".join(
        f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in types
    )
    return f"""
SELECT user_id,
       {cols}
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def sql_doc_vector_join(dim: int = 64, scale: int = 1 << 14) -> str:
    """Mirror of ``q_doc_vector_join``: same fixed-point quantization,
    integer norm via per-dimension expansion."""
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)) AS qv
    FROM embeddings
),
n AS (
    SELECT vec_id AS doc_id,
           CAST(SUM(qv[r.i] * qv[r.i]) AS BIGINT) AS norm2
    FROM q CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1
)
SELECT d.doc_id, d.lang, d.n_chars, n.norm2
FROM documents d JOIN n ON n.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def sql_mutual_nn(k_cent: int = 8, dim: int = 64, scale: int = 1 << 14) -> str:
    """Mirror of ``ann.mutual_nn``: same quantization/assignment as
    :func:`sql_cluster_assign`, in-cell all-pairs integer distances,
    per-vector NN with ties on the smaller neighbour id, then pairs seen
    from BOTH directions."""
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)) AS qv
    FROM embeddings
),
cent AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k_cent}),
vdist AS (
    SELECT q.vec_id, c.cid,
           CAST(SUM((q.qv[r.i] - c.cv[r.i]) * (q.qv[r.i] - c.cv[r.i])) AS BIGINT) AS dist2
    FROM q CROSS JOIN cent c CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
vc AS (
    SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM vdist
    ) WHERE rn = 1
),
pairs AS (
    SELECT x.vec_id AS v, y.vec_id AS u,
           CAST(SUM((qx.qv[r.i] - qy.qv[r.i]) * (qx.qv[r.i] - qy.qv[r.i])) AS BIGINT) AS dist2
    FROM vc x JOIN vc y ON y.cell = x.cell AND y.vec_id <> x.vec_id
    JOIN q qx ON qx.vec_id = x.vec_id
    JOIN q qy ON qy.vec_id = y.vec_id
    CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
nn AS (
    SELECT v, u, dist2 FROM (
        SELECT v, u, dist2,
               row_number() OVER (PARTITION BY v ORDER BY dist2, u) AS rn
        FROM pairs
    ) WHERE rn = 1
)
SELECT least(v, u) AS a, greatest(v, u) AS b,
       CAST(min(dist2) AS BIGINT) AS dist2
FROM nn GROUP BY 1, 2 HAVING count(*) = 2
ORDER BY a, b
"""


def sql_ivf_recall(k_cent: int = 8, nq: int = 4, k: int = 5,
                   n_probe: int = 2) -> str:
    """Twin of ``training.q_ivf_recall``: run the integer IVF search twice
    (n_probe lists vs all lists == exact) and intersect per query."""
    return f"""
SELECT a.query_id, CAST(count(e.neighbor_id) AS BIGINT) AS hits,
       CAST({k} AS BIGINT) AS k
FROM ({sql_ivf_exact(k_cent, nq, k, n_probe)}) a
LEFT JOIN ({sql_ivf_exact(k_cent, nq, k, k_cent)}) e
  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY 1 ORDER BY 1
"""


def sql_ivf_exact(k_cent: int = 8, nq: int = 4, k: int = 5, n_probe: int = 2,
                  dim: int = 64, scale: int = 1 << 14) -> str:
    """Mirror of ``ann.ivf_exact_topk``: the ENTIRE inverted-file search in
    integer arithmetic — route each vector to its nearest centroid (ties ->
    smaller cid), each query probes its ``n_probe`` nearest centroids, scan
    the probed lists with exact int squared-L2, rank ties on smaller
    vec_id.  Same quantization as :func:`sql_cluster_assign`."""
    return f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * {float(scale)!r}) AS BIGINT)) AS qv
    FROM embeddings
),
cent AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < {k_cent}),
qry AS (SELECT vec_id AS query_id, qv AS quv FROM q
        WHERE vec_id >= {k_cent} AND vec_id < {k_cent + nq}),
vdist AS (
    SELECT q.vec_id, c.cid,
           CAST(SUM((q.qv[r.i] - c.cv[r.i]) * (q.qv[r.i] - c.cv[r.i])) AS BIGINT) AS dist2
    FROM q CROSS JOIN cent c CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
vec_cluster AS (
    SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM vdist
    ) WHERE rn = 1
),
qdist AS (
    SELECT y.query_id, c.cid,
           CAST(SUM((y.quv[r.i] - c.cv[r.i]) * (y.quv[r.i] - c.cv[r.i])) AS BIGINT) AS dist2
    FROM qry y CROSS JOIN cent c CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
probe AS (
    SELECT query_id, cid FROM (
        SELECT query_id, cid,
               row_number() OVER (PARTITION BY query_id ORDER BY dist2, cid) AS rn
        FROM qdist
    ) WHERE rn <= {n_probe}
),
cand AS (
    SELECT p.query_id, v.vec_id
    FROM probe p JOIN vec_cluster v ON v.cluster = p.cid
    WHERE v.vec_id <> p.query_id
),
scored AS (
    SELECT c.query_id, c.vec_id,
           CAST(SUM((y.quv[r.i] - q.qv[r.i]) * (y.quv[r.i] - q.qv[r.i])) AS BIGINT) AS dist2
    FROM cand c
    JOIN qry y ON y.query_id = c.query_id
    JOIN q ON q.vec_id = c.vec_id
    CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
ranked AS (
    SELECT query_id, vec_id, dist2,
           row_number() OVER (PARTITION BY query_id ORDER BY dist2, vec_id) AS rn
    FROM scored
)
SELECT query_id, rn AS rank, vec_id AS neighbor_id, dist2
FROM ranked WHERE rn <= {k}
ORDER BY query_id, rank
"""


def sql_unigram_surprisal(vocab_k: int = 256) -> str:
    """Mirror of ``text.unigram_surprisal`` — integer unigram LM scoring.

    Same token grammar as ``sql_vocab_topk``; the deterministic top-k vocab
    (count DESC, token ASC) and the corpus total are recomputed in SQL, and
    the per-token cost uses ``length(bin(n))`` = exact integer bit_length
    (verified equal to the engine's np.frexp exponent for all n >= 1).
    Zero-token documents are kept via the LEFT JOIN from documents.
    """
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT count(*) AS nt FROM tok),
vocab AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT {vocab_k}),
scored AS (
    SELECT t.doc_id,
           length(bin((SELECT nt FROM tot)))
             - length(bin(CAST(coalesce(v.n, 1) AS BIGINT))) AS cost,
           CASE WHEN v.token IS NULL THEN 1 ELSE 0 END AS oov
    FROM tok t LEFT JOIN vocab v USING (token)
),
agg AS (
    SELECT doc_id, count(*) AS n_tokens, sum(oov) AS n_oov, sum(cost) AS bits
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
       CAST(coalesce(a.bits, 0) AS BIGINT) AS bits
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def sql_polygon_fill(zooms=(7, 8, 10)) -> str:
    """Mirror of ``webgeo.q_polygon_fill`` — the polygon-slicing FILL path
    in exact integer arithmetic.

    Reconstructs the diamond-with-hole polygons from nation keys, snaps to
    half-offset subpixels (odd numerators, units of 1/8192 tile), and emits
    a fill for every candidate tile whose row is untouched by any edge
    (integer bbox + floor tests, identical to the kernel's touched[] scan)
    and whose center has odd even-odd parity against the column center line
    (exact cross-product comparison; ties imply "touched" and thus never
    decide a fill — see q_polygon_fill's exactness argument).
    """
    from .pipelines.webgeo import (
        DIAMOND_A_MULT,
        DIAMOND_B_MULT,
        DIAMOND_DENSIFY,
        DIAMOND_LAT_MULT,
        DIAMOND_LON_MULT,
        FILL_SUB,
    )

    m = DIAMOND_DENSIFY
    zs = ", ".join(f"({z}, {float(FILL_SUB << z)!r})" for z in zooms)
    return f"""
WITH polys AS (
    SELECT n_nationkey AS k,
           (n_nationkey * {DIAMOND_LON_MULT}) % 300000 - 150000 AS c_lon,
           (n_nationkey * {DIAMOND_LAT_MULT}) % 130000 - 65000 AS c_lat,
           8000 + (n_nationkey * {DIAMOND_A_MULT}) % 12000 AS a,
           5000 + (n_nationkey * {DIAMOND_B_MULT}) % 8000 AS b
    FROM nation
),
ringp AS (
    SELECT p.k, r.ring,
           CASE r.ring WHEN 0 THEN p.a ELSE p.a // 2 END AS aa,
           CASE r.ring WHEN 0 THEN p.b ELSE p.b // 2 END AS bb,
           p.c_lon, p.c_lat
    FROM polys p, (VALUES (0), (1)) AS r(ring)
),
vidx AS (
    SELECT rp.*, g.j,
           CASE WHEN g.j >= 4 * {m} THEN 0 ELSE g.j // {m} END AS s,
           CASE WHEN g.j >= 4 * {m} THEN 0 ELSE g.j % {m} END AS f
    FROM ringp rp JOIN generate_series(0, {4 * m}) AS g(j) ON TRUE
),
verts AS (
    SELECT k, ring, j,
           (c_lon + CASE s
               WHEN 0 THEN aa - (aa * f) // {m}
               WHEN 1 THEN -((aa * f) // {m})
               WHEN 2 THEN -aa + (aa * f) // {m}
               ELSE (aa * f) // {m} END) / 1000.0 AS lon,
           (c_lat + CASE s
               WHEN 0 THEN (bb * f) // {m}
               WHEN 1 THEN bb - (bb * f) // {m}
               WHEN 2 THEN -((bb * f) // {m})
               ELSE -bb + (bb * f) // {m} END) / 1000.0 AS lat
    FROM vidx
),
proj AS (
    SELECT k, ring, j,
           (lon + 180.0) / 360.0 AS wx,
           0.5 - 0.25 * ln((1.0 + sin(radians(lat)))
                           / (1.0 - sin(radians(lat)))) / pi() AS wy
    FROM verts
),
pz AS (
    SELECT p.k, p.ring, p.j, zs.z,
           2 * CAST(floor(p.wx * zs.scale) AS BIGINT) + 1 AS ix,
           2 * CAST(floor(p.wy * zs.scale) AS BIGINT) + 1 AS iy
    FROM proj p, (VALUES {zs}) AS zs(z, scale)
),
edges AS (
    SELECT k, ring, z, ix AS ax, iy AS ay,
           lag(ix) OVER w AS bx, lag(iy) OVER w AS by2
    FROM pz WINDOW w AS (PARTITION BY k, ring, z ORDER BY j)
    QUALIFY lag(ix) OVER w IS NOT NULL
),
bbox AS (
    SELECT k, z,
           CAST(floor((min(ix) - 128) / 8192.0) AS BIGINT) AS cx_lo,
           CAST(floor((max(ix) + 128) / 8192.0) AS BIGINT) AS cx_hi,
           greatest(CAST(0 AS BIGINT),
                    CAST(floor((min(iy) - 128) / 8192.0) AS BIGINT)) AS cy_lo,
           least(CAST((1 << z) - 1 AS BIGINT),
                 CAST(floor((max(iy) + 128) / 8192.0) AS BIGINT)) AS cy_hi
    FROM pz WHERE ring = 0 GROUP BY k, z
),
cand AS (
    SELECT b.k, b.z, b.cx_lo + gx.i AS cx, b.cy_lo + gy.i AS cy
    FROM bbox b
    JOIN generate_series(0, 255) AS gx(i) ON gx.i <= b.cx_hi - b.cx_lo
    JOIN generate_series(0, 255) AS gy(i) ON gy.i <= b.cy_hi - b.cy_lo
),
fills AS (
    SELECT c.k, c.z, c.cx, c.cy
    FROM cand c
    WHERE NOT EXISTS (
        SELECT 1 FROM edges e
        WHERE e.k = c.k AND e.z = c.z
          AND least(e.ax, e.bx) <= c.cx * 8192 + 8192 + 128
          AND greatest(e.ax, e.bx) >= c.cx * 8192 - 128
          AND CAST(floor((least(e.ay, e.by2) - 128) / 8192.0) AS BIGINT) <= c.cy
          AND CAST(floor((greatest(e.ay, e.by2) + 128) / 8192.0) AS BIGINT) >= c.cy
    )
    AND (
        SELECT count(*) FROM edges e
        WHERE e.k = c.k AND e.z = c.z
          AND (e.ax <= c.cx * 8192 + 4096) <> (e.bx <= c.cx * 8192 + 4096)
          AND (CASE WHEN e.bx > e.ax
               THEN (c.cx * 8192 + 4096 - e.ax) * (e.by2 - e.ay)
                    < (c.cy * 8192 + 4096 - e.ay) * (e.bx - e.ax)
               ELSE (c.cx * 8192 + 4096 - e.ax) * (e.by2 - e.ay)
                    > (c.cy * 8192 + 4096 - e.ay) * (e.bx - e.ax)
               END)
    ) % 2 = 1
),
tiles AS (
    SELECT z, cx, cy, count(*) AS cnt FROM fills GROUP BY 1, 2, 3
)
SELECT z, count(*) AS n_tiles, CAST(sum(cnt) AS BIGINT) AS n_fill,
       CAST(sum(cx) AS BIGINT) AS x_sum, CAST(sum(cy) AS BIGINT) AS y_sum
FROM tiles GROUP BY z
"""


def sql_kcore(k: int = 5, rounds: int = 3) -> str:
    """Mirror of ``q_kcore``: the peeling loop fully unrolled — round r
    degrees over edges whose BOTH endpoints survived round r-1 (same
    distinct least/greatest edge set as ``sql_triangles``)."""
    parts = ["""
WITH n AS (SELECT count(*) AS nn FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * doc_id + t.a) % n.nn AS dst
    FROM documents CROSS JOIN (VALUES (7), (13), (29)) t(a) CROSS JOIN n
),
edges0 AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM e0 WHERE src <> dst
)"""]
    prev = "edges0"
    for r in range(1, rounds + 1):
        parts.append(f""",
d{r} AS (
    SELECT node, count(*) AS deg
    FROM (SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev})
    GROUP BY node
),
a{r} AS (SELECT node FROM d{r} WHERE deg >= {k})""")
        if r < rounds:
            parts.append(f""",
edges{r} AS (
    SELECT e.a, e.b FROM {prev} e
    JOIN a{r} x ON e.a = x.node
    JOIN a{r} y ON e.b = y.node
)""")
            prev = f"edges{r}"
    parts.append(f"""
SELECT d.doc_id AS node_id,
       CAST(coalesce(dd.deg, 0) AS BIGINT) AS deg,
       CAST(CASE WHEN aa.node IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core
FROM documents d
LEFT JOIN d{rounds} dd ON dd.node = d.doc_id
LEFT JOIN a{rounds} aa ON aa.node = d.doc_id
""")
    return "".join(parts)


def sql_cms_counts(w: int = 1024, probe_mod: int = 7) -> str:
    """Mirror of ``sketch.cms_counts``: rebuilds the d=4 x w register table
    in HUGEINT arithmetic (same hash61 chain + per-row affine post-mix) and
    takes min over the probe key's cells."""
    from .stages.sketch import CMS_ROWS

    rows_vals = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(CMS_ROWS))
    return f"""
WITH {_hash61_ctes("events", "user_id")},
rws AS (SELECT * FROM (VALUES {rows_vals}) v(i, a, b)),
cells AS (
    SELECT r.i AS row_i,
           CAST(((CAST(_h AS HUGEINT) * r.a + r.b) % {_H61}) % {w} AS BIGINT)
             AS col,
           count(*) AS cnt
    FROM _hh CROSS JOIN rws r
    GROUP BY 1, 2
),
probes AS (
    SELECT user_id, _h, count(*) AS true_n
    FROM _hh WHERE user_id % {probe_mod} = 0
    GROUP BY user_id, _h
)
SELECT p.user_id,
       CAST(min(c.cnt) AS BIGINT) AS est,
       CAST(any_value(p.true_n) AS BIGINT) AS true_n
FROM probes p
JOIN rws r ON TRUE
JOIN cells c
  ON c.row_i = r.i
 AND c.col = CAST(((CAST(p._h AS HUGEINT) * r.a + r.b) % {_H61}) % {w} AS BIGINT)
GROUP BY p.user_id
"""


def sql_pareto_front() -> str:
    """Mirror of ``events.pareto_front``: per-cents max ts, then keep rows
    whose ts strictly exceeds every higher-cents max (staircase window) —
    equivalent to the NOT EXISTS dominance definition on distinct pairs."""
    return """
WITH d AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS cents,
           max(epoch_us(ts)) AS tsu
    FROM events GROUP BY 1
),
s AS (
    SELECT cents, tsu,
           max(tsu) OVER (ORDER BY cents DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max
    FROM d
)
SELECT cents, CAST(tsu AS BIGINT) AS tsu
FROM s WHERE prev_max IS NULL OR tsu > prev_max
"""


def sql_bloom_probe(bits: int = 1 << 14) -> str:
    """Mirror of ``training.q_bloom_probe``: rebuild the k=4 bit positions
    per build key (same hash61 chain + CMS affine post-mixes), union into
    the bit set, then AND the probe keys' positions against it."""
    from .stages.sketch import CMS_ROWS

    rows_vals = ", ".join(f"({a}, {b})" for a, b in CMS_ROWS)
    return f"""
WITH {_hash61_ctes("documents", "doc_id")},
rws AS (SELECT * FROM (VALUES {rows_vals}) v(a, b)),
bitset AS (
    SELECT DISTINCT
           CAST(((CAST(_h AS HUGEINT) * r.a + r.b) % {_H61}) % {bits} AS BIGINT)
             AS bit
    FROM _hh CROSS JOIN rws r
),
n AS (SELECT count(*) AS nn FROM documents),
probes AS (
    SELECT doc_id + t.off * n.nn AS key,
           CASE WHEN t.off = 0 THEN 1 ELSE 0 END AS present
    FROM documents CROSS JOIN (VALUES (0), (1)) t(off) CROSS JOIN n
),
ph0 AS (SELECT *, ((CAST(key AS HUGEINT) % {_H61})
                   * 1752450205419405103 + 1234567891011121314) % {_H61} AS _pa
        FROM probes),
ph1 AS (SELECT *, xor(CAST(_pa AS BIGINT), CAST(_pa AS BIGINT) // 536870912)
                   % {_H61} AS _pb FROM ph0),
ph2 AS (SELECT *, (CAST(_pb AS HUGEINT) * 1803867173528181589) % {_H61} AS _pc
        FROM ph1),
phh AS (SELECT *, xor(CAST(_pc AS BIGINT), CAST(_pc AS BIGINT) // 2147483648)
                   % {_H61} AS _ph FROM ph2)
SELECT p.key, CAST(p.present AS BIGINT) AS present,
       CAST(min(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS in_bloom
FROM phh p
CROSS JOIN rws r
LEFT JOIN bitset b
  ON b.bit = CAST(((CAST(p._ph AS HUGEINT) * r.a + r.b) % {_H61}) % {bits}
                  AS BIGINT)
GROUP BY p.key, p.present
"""


def sql_expr_classify() -> str:
    """Mirror of ``training.q_expr_classify``: the MultiExpression rule list
    as an ordered CASE (first match wins), patterns as LIKE."""
    return """
WITH c AS (
    SELECT doc_id, n_chars,
           CASE
             WHEN lang = 'zh' AND n_chars >= 300 THEN 'zh_long'
             WHEN text LIKE '%query%' OR text LIKE '%scan%' THEN 'query_page'
             WHEN source IN ('src1', 'src2') OR source LIKE 'src1%'
               THEN 'west_src'
             WHEN n_chars < 120 THEN 'short'
             ELSE 'other'
           END AS cls
    FROM documents
)
SELECT cls, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(min(doc_id) AS BIGINT) AS min_doc
FROM c GROUP BY cls
"""


def sql_tpch_q6() -> str:
    """Mirror of ``training.q_tpch_q6`` — integer cents x basis points."""
    return """
SELECT 0 AS grp,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cbp,
       CAST(count(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
GROUP BY 1
"""


def sql_tpch_q12() -> str:
    """Mirror of ``training.q_tpch_q12`` (conditional counts per flag)."""
    return """
SELECT l.l_returnflag AS shipmode,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= DATE '1996-01-01' AND l.l_shipdate < DATE '1997-01-01'
GROUP BY 1 ORDER BY 1
"""


def sql_tpch_q14() -> str:
    """Mirror of ``training.q_tpch_q14`` — both branches integer exact."""
    return """
SELECT 0 AS grp,
       CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS promo_rev_cbp,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS total_rev_cbp
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= DATE '1996-03-01' AND l.l_shipdate < DATE '1996-04-01'
GROUP BY 1
"""


def sql_edit_distance() -> str:
    """Mirror of ``training.q_edit_distance``."""
    return """
SELECT d1.doc_id // 2 AS pair_id, d1.doc_id AS a, d2.doc_id AS b,
       CAST(levenshtein(d1.text, d2.text) AS BIGINT) AS lev
FROM documents d1 JOIN documents d2 ON d2.doc_id = d1.doc_id + 1
WHERE d1.doc_id % 2 = 0
"""


def sql_topk_per_group(k: int = 3) -> str:
    """Mirror of ``training.q_topk_per_group``."""
    return f"""
SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(rk AS BIGINT) AS rk
FROM (
    SELECT lang, doc_id, n_chars,
           row_number() OVER (PARTITION BY lang
                              ORDER BY n_chars DESC, doc_id) AS rk
    FROM documents
) WHERE rk <= {k}
"""


def sql_bigram_surprisal(bigram_k: int = 512, unigram_k: int = 256) -> str:
    """Mirror of ``text.bigram_surprisal`` (token grammar of
    sql_vocab_topk; adjacency via list index + constant-bound series;
    bitlen via bin())."""
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
  FROM documents
),
bi AS (
  SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
  FROM tok JOIN generate_series(1, 65536) s(i) ON i <= len(ts) - 1
),
bc AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
vb AS (SELECT w1, w2, c12 FROM bc ORDER BY c12 DESC, w1, w2 LIMIT {bigram_k}),
u AS (
  SELECT w AS token, count(*) AS c
  FROM (SELECT unnest(ts) AS w FROM tok) GROUP BY w
),
vu AS (SELECT token, c FROM u ORDER BY c DESC, token LIMIT {unigram_k}),
costs AS (
  SELECT b.doc_id,
         greatest(0,
           length(bin(CAST(coalesce(vu.c, 1) AS BIGINT)))
           - length(bin(CAST(coalesce(vb.c12, 1) AS BIGINT)))) AS cost
  FROM bi b
  LEFT JOIN vu ON vu.token = b.w1
  LEFT JOIN vb ON vb.w1 = b.w1 AND vb.w2 = b.w2
),
agg AS (SELECT doc_id, count(*) AS n_pairs, sum(cost) AS bits
        FROM costs GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(a.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(a.bits, 0) AS BIGINT) AS bits
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def sql_bfs_reach(seed_mod: int = 101, hops: int = 3) -> str:
    """Mirror of ``q_bfs_reach``: hop sets unrolled (r_k = r_{k-1} UNION
    its neighbours; hop h = r_h EXCEPT r_{h-1})."""
    parts = [f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * doc_id + t.a) % n.nn AS dst
    FROM documents CROSS JOIN (VALUES (7), (13), (29)) t(a) CROSS JOIN n
),
e AS (
    SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
    FROM e0 WHERE src <> dst
),
r0 AS (SELECT doc_id AS node FROM documents WHERE doc_id % {seed_mod} = 0)"""]
    for h in range(1, hops + 1):
        parts.append(f""",
r{h} AS (
    SELECT node FROM r{h-1}
    UNION
    SELECT e.b FROM e JOIN r{h-1} r ON e.a = r.node
    UNION
    SELECT e.a FROM e JOIN r{h-1} r ON e.b = r.node
)""")
    sel = ["SELECT node AS node_id, CAST(0 AS BIGINT) AS hop FROM r0"]
    for h in range(1, hops + 1):
        sel.append(f"SELECT node, CAST({h} AS BIGINT) FROM"
                   f" (SELECT node FROM r{h} EXCEPT SELECT node FROM r{h-1})")
    parts.append("\n" + "\nUNION ALL\n".join(sel))
    return "".join(parts)


def sql_sssp_bounded(seed_mod: int = 101, rounds: int = 3,
                     w_lo: int = 1, w_span: int = 9) -> str:
    """Mirror of ``training.q_sssp_bounded``: Bellman-Ford rounds unrolled
    as min-plus joins (d_k = min(d_{k-1}, min over edges of d_{k-1} + w)),
    edge weights derived from the canonical deduped pair."""
    parts = [f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
e0 AS (
    SELECT doc_id AS src, (doc_id * doc_id + t.a) % n.nn AS dst
    FROM documents CROSS JOIN (VALUES (7), (13), (29)) t(a) CROSS JOIN n
),
e AS (
    SELECT a, b, {w_lo} + (a * 3 + b * 7) % {w_span} AS w FROM (
        SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        FROM e0 WHERE src <> dst)
),
d0 AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
       FROM documents WHERE doc_id % {seed_mod} = 0)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
d{k} AS (
    SELECT node, min(dist) AS dist FROM (
        SELECT node, dist FROM d{k-1}
        UNION ALL
        SELECT e.b AS node, d.dist + e.w FROM e JOIN d{k-1} d ON e.a = d.node
        UNION ALL
        SELECT e.a AS node, d.dist + e.w FROM e JOIN d{k-1} d ON e.b = d.node
    ) GROUP BY node
)""")
    parts.append(f"""
SELECT node AS node_id, CAST(dist AS BIGINT) AS dist FROM d{rounds}
ORDER BY 1""")
    return "".join(parts)


def sql_ks_drift() -> str:
    """Twin of ``training.q_ks_drift``: grid-aligned window cumsums, pair
    max of the cross-scaled ECDF gap."""
    return """
WITH h AS (SELECT source, n_chars AS v, count(*) AS n
           FROM documents GROUP BY 1, 2),
tot AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
vals AS (SELECT DISTINCT v FROM h),
grid AS (SELECT t.source, v.v, coalesce(h.n, 0) AS n
         FROM tot t CROSS JOIN vals v
         LEFT JOIN h ON h.source = t.source AND h.v = v.v),
cum AS (SELECT source, v,
               sum(n) OVER (PARTITION BY source ORDER BY v) AS c
        FROM grid)
SELECT ta.source AS src_a, tb.source AS src_b,
       ta.n AS n_a, tb.n AS n_b,
       CAST(max(abs(ca.c * tb.n - cb.c * ta.n)) AS BIGINT) AS d_num
FROM tot ta
JOIN tot tb ON ta.source < tb.source
JOIN cum ca ON ca.source = ta.source
JOIN cum cb ON cb.source = tb.source AND cb.v = ca.v
GROUP BY 1, 2, 3, 4 ORDER BY 1, 2
"""


def sql_chi2_cells() -> str:
    """Twin of ``training.q_chi2_cells``: margin joins over the contingency
    cells, integer deviation ``n * total - row * col``."""
    return """
WITH c AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rn FROM c GROUP BY 1),
s AS (SELECT source, CAST(sum(n) AS BIGINT) AS cn FROM c GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS tn FROM c)
SELECT c.lang, c.source, c.n,
       r.rn AS row_n, s.cn AS col_n, t.tn AS total_n,
       CAST(c.n * t.tn - r.rn * s.cn AS BIGINT) AS dev
FROM c
JOIN r USING (lang)
JOIN s USING (source)
CROSS JOIN t
ORDER BY 1, 2
"""


def sql_tpch_q4() -> str:
    """Mirror of ``training.q_tpch_q4`` (EXISTS semi-join priority census)."""
    return """
SELECT o.o_orderpriority AS o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= DATE '1996-07-01' AND o.o_orderdate < DATE '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1 ORDER BY 1
"""


def sql_tpch_q13() -> str:
    """Mirror of ``training.q_tpch_q13`` (order-count distribution incl.
    zero-order customers; urgent orders excluded)."""
    return """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
    SELECT c.c_custkey,
           CAST(count(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY 1
) GROUP BY 1 ORDER BY 1
"""


def sql_tpch_q15() -> str:
    """Mirror of ``training.q_tpch_q15`` (argmax-over-aggregate top
    supplier, revenue in exact integer cents x basis-points)."""
    return """
WITH rev AS (
    SELECT l_suppkey AS s_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) AS total_rev_cbp
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
    GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, r.total_rev_cbp
FROM rev r JOIN supplier s ON s.s_suppkey = r.s_suppkey
WHERE r.total_rev_cbp = (SELECT max(total_rev_cbp) FROM rev)
ORDER BY 1
"""


def sql_tpch_q17(brand: str = "Brand#23") -> str:
    """Mirror of ``training.q_tpch_q17`` — the 20%-of-average quantity
    test cross-multiplied to exact integers (5 * qty * n < sum_qty)."""
    return f"""
WITH lines AS (
    SELECT l.l_partkey,
           CAST(round(l.l_quantity) AS BIGINT) AS qty,
           CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = '{brand}'
),
agg AS (
    SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS s,
           CAST(count(*) AS BIGINT) AS n
    FROM lines GROUP BY 1
)
SELECT 0 AS grp,
       CAST(coalesce(sum(CASE WHEN 5 * l.qty * a.n < a.s
                               THEN l.price_c END), 0) AS BIGINT)
           AS sum_price_cents,
       CAST(coalesce(sum(CASE WHEN 5 * l.qty * a.n < a.s
                               THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_small_lines
FROM lines l JOIN agg a USING (l_partkey)
GROUP BY 1
"""


def _mentions_over(src: str, name: str) -> str:
    """MENTIONS_CTE parameterized over the id-providing relation ``src``
    (same integer arithmetic; used for v2-snapshot mirrors)."""
    return f"""
{name} AS (
    SELECT d.doc_id,
           j.j AS mention_idx,
           (d.doc_id * {P.LAT_MULT} + j.j * {P.LAT_STEP}) % {P.LAT_MOD} - {P.LAT_OFF} AS lat_mdeg,
           (d.doc_id * {P.LON_MULT} + j.j * {P.LON_STEP}) % {P.LON_MOD} - {P.LON_OFF} AS lon_mdeg
    FROM {src} d
    CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS j) j
    WHERE j.j < d.doc_id % 4
    UNION ALL
    SELECT d.doc_id,
           d.doc_id % 4 AS mention_idx,
           {P.HOT_LAT_BASE} + d.doc_id % {P.HOT_LAT_MOD} AS lat_mdeg,
           {P.HOT_LON_BASE} + d.doc_id % {P.HOT_LON_MOD} AS lon_mdeg
    FROM {src} d
    WHERE d.doc_id % {P.HOT_EVERY} = 0
)"""


def sql_tile_diff(zooms=(2, 6)) -> str:
    """Mirror of ``training.q_tile_diff``: the v2 snapshot's id set is
    (old ids with doc_id % 10 <> 0) + (n + id for id % 13 = 0); mentions
    re-derive from the SAME integer arithmetic over each id set, so the
    per-tile old/new counts and status are exact."""
    tx, ty = sql_tile_expr("m.lat_mdeg / 1000.0", "m.lon_mdeg / 1000.0",
                           "z.z")
    zl = ", ".join(str(z) for z in zooms)
    count_cte = (
        "SELECT z.z AS z, {tx} AS tile_x, {ty} AS tile_y, "
        "CAST(count(*) AS BIGINT) AS n "
        "FROM {m} m CROSS JOIN (SELECT UNNEST([{zl}]) AS z) z "
        "GROUP BY 1, 2, 3"
    )
    return f"""
WITH v2ids AS (
    SELECT doc_id FROM documents WHERE doc_id % 10 <> 0
    UNION ALL
    SELECT doc_id + (SELECT count(*) FROM documents) AS doc_id
    FROM documents WHERE doc_id % 13 = 0
),
{_mentions_over('documents', 'mold').lstrip()},
{_mentions_over('v2ids', 'mnew').lstrip()},
told AS ({count_cte.format(tx=tx, ty=ty, m='mold', zl=zl)}),
tnew AS ({count_cte.format(tx=tx, ty=ty, m='mnew', zl=zl)})
SELECT coalesce(o.z, w.z) AS z,
       coalesce(o.tile_x, w.tile_x) AS tile_x,
       coalesce(o.tile_y, w.tile_y) AS tile_y,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_old,
       CAST(coalesce(w.n, 0) AS BIGINT) AS n_new,
       CASE WHEN coalesce(o.n, 0) = 0 THEN 'added'
            WHEN coalesce(w.n, 0) = 0 THEN 'removed'
            WHEN o.n <> w.n THEN 'changed'
            ELSE 'same' END AS status
FROM told o FULL OUTER JOIN tnew w
  ON o.z = w.z AND o.tile_x = w.tile_x AND o.tile_y = w.tile_y
ORDER BY 1, 2, 3
"""


def sql_late_data(delay_us: int = 600_000_000) -> str:
    """Mirror of ``training.q_late_data`` — watermark in exact integer
    microseconds via a running-max window over arrival (event_id) order."""
    return f"""
WITH a AS (
    SELECT event_type, epoch_us(ts) AS tu,
           max(epoch_us(ts)) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
    FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(coalesce(sum(CASE WHEN tu < wm - {delay_us}
                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
FROM a GROUP BY 1 ORDER BY 1
"""


def sql_dsir_weights(vocab_k: int = 256, target_lang: str = "en") -> str:
    """Mirror of ``text.dsir_weights`` — add-one-smoothed integer bit
    log-ratio over the top-k raw vocabulary (same token grammar as
    ``sql_unigram_surprisal``)."""
    return f"""
WITH tok AS (
    SELECT doc_id, lang,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
c AS (
    SELECT token, CAST(count(*) AS BIGINT) AS r_n,
           CAST(sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)
                AS BIGINT) AS t_n
    FROM tok GROUP BY token
),
vocab AS (SELECT token, r_n, t_n FROM c ORDER BY r_n DESC, token
          LIMIT {vocab_k}),
scored AS (
    SELECT t.doc_id,
           CASE WHEN v.token IS NULL THEN 0
                ELSE length(bin(v.t_n + 1)) - length(bin(v.r_n + 1))
           END AS cost,
           CASE WHEN v.token IS NULL THEN 0 ELSE 1 END AS inv
    FROM tok t LEFT JOIN vocab v USING (token)
),
agg AS (
    SELECT doc_id, count(*) AS n_tokens, sum(inv) AS n_vocab,
           sum(cost) AS dsir_bits
    FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(a.n_vocab, 0) AS BIGINT) AS n_vocab,
       CAST(coalesce(a.dsir_bits, 0) AS BIGINT) AS dsir_bits
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def sql_gopher_rules() -> str:
    """Mirror of ``training.q_gopher_rules`` — same RE2 grammars as
    ``sql_text_stats``, ratios cross-multiplied to exact integers."""
    return r"""
WITH f AS (
    SELECT len(regexp_extract_all(text, '\S+')) AS n_w,
           len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS n_p,
           len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
               w -> w IN ('the', 'a', 'and', 'of', 'to', 'in'))) AS n_s,
           len(regexp_extract_all(text, '[a-zA-Z0-9]')) AS n_a
    FROM documents
),
g AS (
    SELECT (n_w >= 8 AND n_w <= 1024) AS ok_w,
           (2 * n_w <= n_a AND n_a <= 12 * n_w) AS ok_m,
           (n_p * 5 <= n_w) AS ok_p,
           (n_s >= 2) AS ok_s
    FROM f
)
SELECT 'all_pass' AS rule, CAST(sum(CASE WHEN ok_w AND ok_m AND ok_p
    AND ok_s THEN 1 ELSE 0 END) AS BIGINT) AS n_docs FROM g
UNION ALL SELECT 'mean_word_len', CAST(sum(CASE WHEN NOT ok_m
    THEN 1 ELSE 0 END) AS BIGINT) FROM g
UNION ALL SELECT 'punct_ratio', CAST(sum(CASE WHEN NOT ok_p
    THEN 1 ELSE 0 END) AS BIGINT) FROM g
UNION ALL SELECT 'stopwords', CAST(sum(CASE WHEN NOT ok_s
    THEN 1 ELSE 0 END) AS BIGINT) FROM g
UNION ALL SELECT 'words', CAST(sum(CASE WHEN NOT ok_w
    THEN 1 ELSE 0 END) AS BIGINT) FROM g
ORDER BY 1
"""


def sql_tpch_q8(region: str = "ASIA", nation_name: str = "NATION_7") -> str:
    """Mirror of ``training.q_tpch_q8`` — market-share numerator and
    denominator in exact integer cents x basis-points per order year."""
    return f"""
SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN sn.n_name = '{nation_name}'
                     THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                     ELSE 0 END) AS BIGINT) AS nation_rev_cbp,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS total_rev_cbp
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = cn.n_regionkey AND r.r_name = '{region}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY 1 ORDER BY 1
"""


def sql_ccnet_buckets(vocab_k: int = 256) -> str:
    """Mirror of ``training.q_ccnet_buckets`` — the sql_unigram_surprisal
    scoring CTE, per-lang quantile_disc terciles (same 1/3, 2/3 doubles
    as the engine), head/middle/tail census."""
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
    FROM documents
),
c AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
tot AS (SELECT count(*) AS nt FROM tok),
vocab AS (SELECT token, n FROM c ORDER BY n DESC, token LIMIT {vocab_k}),
scored AS (
    SELECT t.doc_id,
           length(bin((SELECT nt FROM tot)))
             - length(bin(CAST(coalesce(v.n, 1) AS BIGINT))) AS cost
    FROM tok t LEFT JOIN vocab v USING (token)
),
agg AS (SELECT doc_id, sum(cost) AS bits FROM scored GROUP BY doc_id),
docs AS (
    SELECT d.lang, CAST(coalesce(a.bits, 0) AS BIGINT) AS bits
    FROM documents d LEFT JOIN agg a USING (doc_id)
),
th AS (
    SELECT lang, quantile_disc(bits, 1.0/3) AS p33,
           quantile_disc(bits, 2.0/3) AS p67
    FROM docs GROUP BY lang
)
SELECT d.lang,
       CASE WHEN d.bits <= t.p33 THEN 'head'
            WHEN d.bits <= t.p67 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM docs d JOIN th t USING (lang)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sql_tile_compact(z: int = 4) -> str:
    """Mirror of ``training.q_tile_compact`` — unrolled per-level
    complete-sibling rollup (a parent is full iff its 4 children are
    full), output = full cells whose parent is not full."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", str(z))
    lvl_ctes = []
    prev = "occ"
    for lvl in range(z - 1, -1, -1):
        lvl_ctes.append(
            f"f{lvl} AS (SELECT x // 2 AS x, y // 2 AS y FROM {'occ' if lvl == z - 1 else f'f{lvl + 1}'} "
            f"GROUP BY 1, 2 HAVING count(*) = 4)")
        prev = f"f{lvl}"
    sels = [
        f"SELECT {z} AS z, x AS tile_x, y AS tile_y FROM occ "
        f"WHERE (x // 2, y // 2) NOT IN (SELECT (x, y) FROM f{z - 1})"
    ]
    for lvl in range(z - 1, 0, -1):
        sels.append(
            f"SELECT {lvl}, x, y FROM f{lvl} "
            f"WHERE (x // 2, y // 2) NOT IN (SELECT (x, y) FROM f{lvl - 1})")
    sels.append("SELECT 0, x, y FROM f0")
    ctes = ",\n".join(lvl_ctes)
    body = "\nUNION ALL\n".join(sels)
    return f"""
WITH {POINTS_CTE},
occ AS (SELECT DISTINCT {tx} AS x, {ty} AS y FROM points p),
{ctes}
{body}
ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Derived partsupp (TPC-H Q2/Q9/Q11/Q16/Q20) — the sf dirs carry no
# partsupp.parquet, so it is a deterministic integer function of part x
# supplier (pipelines/partsupp.py holds the engine-side closed forms):
# 4 suppliers per part by the 0-based dbgen quarter-stride rule, availqty
# and supplycost as modular hashes of (partkey, suppkey).
PARTSUPP_CTE = """
sup AS (SELECT CAST(count(*) AS BIGINT) AS s FROM supplier),
ps0 AS (
    SELECT CAST(p.p_partkey AS BIGINT) AS ps_partkey,
           (CAST(p.p_partkey AS BIGINT)
            + (CAST(p.p_partkey AS BIGINT) // sup.s)
              % greatest(sup.s // 4, 1)
            + g.i * greatest(sup.s // 4, 1)) % sup.s AS ps_suppkey
    FROM part p
    CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) g
    CROSS JOIN sup
),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 523 + ps_suppkey * 101) % 99900 + 100
               AS ps_supplycost_c
    FROM ps0
)"""


def sql_tpch_q2(region: str = "ASIA", max_size: int = 25,
                ptype: str = "SMALL") -> str:
    """Mirror of ``partsupp.q_tpch_q2`` — correlated min-cost supplier
    over the derived partsupp, ties kept."""
    return f"""
WITH {PARTSUPP_CTE}
SELECT s.s_acctbal, s.s_name, n.n_name,
       CAST(p.p_partkey AS BIGINT) AS p_partkey,
       CAST(ps.ps_supplycost_c AS BIGINT) AS ps_supplycost_c
FROM part p
JOIN partsupp ps ON ps.ps_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{region}'
WHERE p.p_size <= {max_size} AND p.p_type = '{ptype}'
  AND ps.ps_supplycost_c = (
      SELECT min(ps2.ps_supplycost_c)
      FROM partsupp ps2
      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
           AND r2.r_name = '{region}'
      WHERE ps2.ps_partkey = p.p_partkey)
"""


def sql_tpch_q9(name_like: str = "red") -> str:
    """Mirror of ``partsupp.q_tpch_q9`` — profit by (supplier nation,
    order year) in exact integer cents x (100 - disc_pct) minus
    supplycost_c x qty x 100."""
    return f"""
WITH {PARTSUPP_CTE}
SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - ps.ps_supplycost_c
                  * CAST(round(l.l_quantity) AS BIGINT) * 100)
            AS BIGINT) AS profit_cbp
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%{name_like}%'
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey
     AND ps.ps_suppkey = l.l_suppkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
"""


def sql_tpch_q11(frac_div: int = 2000) -> str:
    """Mirror of ``partsupp.q_tpch_q11`` — per-part stock value over the
    modal supplier nation (most suppliers, ties to smallest nationkey),
    HAVING value > total // frac_div (exact integer threshold)."""
    return f"""
WITH {PARTSUPP_CTE},
modal AS (
    SELECT s_nationkey AS nk FROM supplier
    GROUP BY 1 ORDER BY count(*) DESC, s_nationkey LIMIT 1
),
natps AS (
    SELECT ps.ps_partkey,
           CAST(ps.ps_supplycost_c * ps.ps_availqty AS BIGINT) AS v
    FROM partsupp ps
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN modal m ON m.nk = s.s_nationkey
),
tot AS (SELECT CAST(sum(v) AS BIGINT) AS t FROM natps)
SELECT ps_partkey, CAST(sum(v) AS BIGINT) AS value_c
FROM natps
GROUP BY 1
HAVING sum(v) > (SELECT t // {frac_div} FROM tot)
"""


def sql_tpch_q16(excl_brand: str = "Brand#13", excl_type: str = "ECONOMY",
                 sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 22)) -> str:
    """Mirror of ``partsupp.q_tpch_q16`` — distinct-supplier census by
    (brand, type, size); negative acctbal stands in for the spec's
    complaint-comment scan."""
    in_list = ", ".join(str(s) for s in sizes)
    return f"""
WITH {PARTSUPP_CTE}
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> '{excl_brand}' AND p.p_type <> '{excl_type}'
  AND p.p_size IN ({in_list})
  AND ps.ps_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


def sql_tpch_q20(name_prefix: str = "red ",
                 nation_name: str = "NATION_3") -> str:
    """Mirror of ``partsupp.q_tpch_q20`` — suppliers of one nation whose
    availqty exceeds half the 1996 shipped quantity of prefix-matched
    parts (2*availqty > qty_sum, exact integers; pairs with no 1996
    shipments drop out via the inner join, like the spec's NULL
    comparison)."""
    return f"""
WITH {PARTSUPP_CTE},
shipped AS (
    SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
           CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS BIGINT)
               AS qty_sum
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
         AND p.p_name LIKE '{name_prefix}%'
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY 1, 2
)
SELECT DISTINCT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name
FROM partsupp ps
JOIN shipped sh ON sh.pk = ps.ps_partkey AND sh.sk = ps.ps_suppkey
JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
     AND n.n_name = '{nation_name}'
WHERE 2 * ps.ps_availqty > sh.qty_sum
"""


def sql_kmeans_lloyd(k: int = 8, iters: int = 2) -> str:
    """Mirror of ``training.q_kmeans_lloyd`` — the Lloyd loop unrolled as
    a CTE chain over exploded (vec_id, dim, qv) fixed-point rows: per
    iteration an assignment (min integer d2, ties to smallest cluster)
    and a centroid update (``sum // count`` — DuckDB truncating integer
    division, matched by the engine's adjusted numpy floordiv); the final
    SELECT is the per-vector assignment under the last centroids."""
    parts = ["""
qvec AS (
    SELECT vec_id,
           unnest(generate_series(1, len(embedding))) AS dim,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 16384.0)
                AS BIGINT) AS qv
    FROM embeddings
),
cent0 AS (SELECT CAST(vec_id AS BIGINT) AS c, dim, qv
          FROM qvec WHERE vec_id < %d)""" % k]
    for i in range(iters):
        parts.append(f"""
d{i} AS (
    SELECT v.vec_id, c.c,
           CAST(sum((v.qv - c.qv) * (v.qv - c.qv)) AS BIGINT) AS d2
    FROM qvec v JOIN cent{i} c USING (dim) GROUP BY 1, 2
),
a{i} AS (
    SELECT vec_id, c FROM (
        SELECT vec_id, c,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
        FROM d{i}) WHERE rn = 1
),
cent{i + 1} AS (
    SELECT a.c, v.dim,
           CAST(CAST(sum(v.qv) AS BIGINT) // count(*) AS BIGINT) AS qv
    FROM a{i} a JOIN qvec v USING (vec_id) GROUP BY 1, 2
)""")
    body = ",".join(parts)
    return f"""
WITH {body}
SELECT vec_id, c AS cluster, d2 AS dist2 FROM (
    SELECT vec_id, c, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
    FROM (
        SELECT v.vec_id, c.c,
               CAST(sum((v.qv - c.qv) * (v.qv - c.qv)) AS BIGINT) AS d2
        FROM qvec v JOIN cent{iters} c USING (dim)
        GROUP BY 1, 2))
WHERE rn = 1
"""


def sql_tile_size_budget(zooms=(4, 8), budget: int = 2048) -> str:
    """Mirror of ``webgeo.q_tile_size_budget`` — the per-tile budget
    prefix as a windowed cumulative sum over the same deterministic cost
    and priority, with the (prio, doc, mention) total order."""
    tx, ty = sql_tile_expr("p.lat", "p.lon", "z.z")
    zl = ", ".join(str(z) for z in zooms)
    return f"""
WITH {POINTS_CTE},
feats AS (
    SELECT z.z AS z, {tx} AS tile_x, {ty} AS tile_y,
           p.doc_id, p.mention_idx,
           16 + p.doc_id % 64 AS cost,
           (p.doc_id * 31 + p.mention_idx * 7) % 1024 AS prio
    FROM points p CROSS JOIN (SELECT UNNEST([{zl}]) AS z) z
),
ranked AS (
    SELECT z, tile_x, tile_y, cost,
           sum(cost) OVER (PARTITION BY z, tile_x, tile_y
                           ORDER BY prio, doc_id, mention_idx
                           ROWS UNBOUNDED PRECEDING) AS cum
    FROM feats
)
SELECT z, tile_x, tile_y,
       CAST(count(*) FILTER (WHERE cum <= {budget}) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE cum > {budget}) AS BIGINT) AS n_dropped,
       CAST(coalesce(sum(cost) FILTER (WHERE cum <= {budget}), 0)
            AS BIGINT) AS bytes_kept
FROM ranked GROUP BY 1, 2, 3
"""


def sql_shard_plan(zooms=(2, 6), n_shards: int = 8) -> str:
    """Mirror of ``webgeo.q_shard_plan`` — the balanced contiguous-range
    shard assignment as a plain windowed prefix sum over the
    (z, x, y)-lexicographic tile key."""
    zmax = max(zooms)
    tx, ty = sql_tile_expr("p.lat", "p.lon", "z.z")
    zl = ", ".join(str(z) for z in zooms)
    return f"""
WITH {POINTS_CTE},
feats AS (
    SELECT (CAST(z.z AS BIGINT) << {2 * zmax}) + ({tx} << {zmax}) + {ty}
               AS key,
           16 + p.doc_id % 64 AS cost
    FROM points p CROSS JOIN (SELECT UNNEST([{zl}]) AS z) z
),
tiles AS (SELECT key, CAST(sum(cost) AS BIGINT) AS bytes
          FROM feats GROUP BY 1),
cum AS (
    SELECT key, bytes,
           CAST(sum(bytes) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cume
    FROM tiles
),
tot AS (SELECT CAST(sum(bytes) AS BIGINT) AS t FROM tiles)
SELECT CAST(((cume - bytes) * {n_shards}) // t AS BIGINT) AS shard,
       CAST(count(*) AS BIGINT) AS n_tiles,
       CAST(sum(bytes) AS BIGINT) AS bytes,
       CAST(min(key) AS BIGINT) AS key_min,
       CAST(max(key) AS BIGINT) AS key_max
FROM cum, tot
GROUP BY 1
"""


def sql_semdedup(k: int = 16, dim: int = 64) -> str:
    """Mirror of ``training.q_semdedup``: SEM_SCALE (512) fixed-point
    quantize, planted graded siblings (+1e6, amplitude 8*(id%8),
    alternating sign per dim), integer-L2 nearest-centroid assignment
    (ties -> smaller cid), then the pure-integer within-cluster cosine
    census dot>0 AND dot^2*625 >= 529*na*nb (tau = 0.92)."""
    return f"""
WITH q0 AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 512.0) AS BIGINT)) AS qv
    FROM embeddings
),
planted AS (
    SELECT vec_id, qv FROM q0
    UNION ALL
    SELECT vec_id + 1000000,
           list_transform(range(1, {dim + 1}),
               i -> qv[i] + 8 * (vec_id % 8) *
                    (CASE WHEN (i - 1 + vec_id) % 2 = 0 THEN 1 ELSE -1 END))
    FROM q0
),
cent AS (SELECT vec_id AS cid, qv AS cv FROM q0 WHERE vec_id < {k}),
dists AS (
    SELECT p.vec_id, c.cid,
           CAST(SUM((p.qv[r.i] - c.cv[r.i]) * (p.qv[r.i] - c.cv[r.i])) AS BIGINT) AS dist2
    FROM planted p CROSS JOIN cent c CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY 1, 2
),
best AS (
    SELECT vec_id, cid AS cluster,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
    FROM dists
),
asg AS (
    SELECT b.vec_id, b.cluster, p.qv
    FROM best b JOIN planted p USING (vec_id) WHERE rn = 1
),
dots AS (
    SELECT a.vec_id AS x,
           CAST(SUM(a.qv[r.i] * b.qv[r.i]) AS BIGINT) AS dot,
           CAST(SUM(a.qv[r.i] * a.qv[r.i]) AS BIGINT) AS na,
           CAST(SUM(b.qv[r.i] * b.qv[r.i]) AS BIGINT) AS nb
    FROM asg a JOIN asg b ON a.cluster = b.cluster AND b.vec_id < a.vec_id
    CROSS JOIN range(1, {dim + 1}) r(i)
    GROUP BY a.vec_id, b.vec_id
),
dups AS (
    SELECT x, CAST(count(*) AS BIGINT) AS n_dups FROM dots
    WHERE dot > 0 AND dot * dot * 625 >= 529 * na * nb
    GROUP BY 1
)
SELECT a.vec_id, a.cluster, COALESCE(d.n_dups, 0) AS n_dups
FROM asg a LEFT JOIN dups d ON a.vec_id = d.x
ORDER BY a.vec_id
"""


def sql_containment_pairs(threshold: float = 0.7, df_cap: int = 80) -> str:
    """Mirror of ``dedup.jaccard_pairs(metric="containment")``: set
    containment shared / least(na, nb) over rare tokens (df <= df_cap) on
    the 1/5 sample — same CTE chain as ``sql_jaccard_rare`` with the
    asymmetric final formula."""
    t = int(threshold * 1000)
    return f"""
WITH ws AS (
    SELECT doc_id, list_distinct({TOKENS_EXPR}) AS toks
    FROM documents WHERE doc_id % 5 = 0
),
alltoks AS (
    SELECT doc_id, UNNEST(toks) AS token FROM ws
),
df AS (SELECT token, count(*) AS df FROM alltoks GROUP BY 1),
rare AS (
    SELECT a.doc_id, a.token FROM alltoks a JOIN df USING (token)
    WHERE df.df <= {df_cap}
),
n AS (SELECT doc_id, count(*) AS n_tok FROM rare GROUP BY 1),
toks AS (SELECT r.doc_id, nn.n_tok, r.token FROM rare r JOIN n nn USING (doc_id)),
pairs AS (
    SELECT t1.doc_id AS a, t2.doc_id AS b, t1.n_tok AS na, t2.n_tok AS nb,
           count(*) AS shared
    FROM toks t1 JOIN toks t2 ON t1.token = t2.token AND t1.doc_id < t2.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT a, b, (shared * 1000) // least(na, nb) AS c1000
FROM pairs WHERE (shared * 1000) // least(na, nb) >= {t}
"""


def sql_url_canon_dedup() -> str:
    """Mirror of ``webgeo.q_url_canon_dedup``: the same messy-variant
    synthesis and the same RE2 regex chain, in the same order, as
    ``webgeo.canonicalize_urls`` (DuckDB's regexp engine is also RE2, and
    its regexp_replace is first-match-only unless 'g' — matching Arrow's
    max_replacements semantics step for step)."""
    pre = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    return rf"""
WITH ids AS (SELECT doc_id FROM documents),
variants AS (
    SELECT doc_id,
           'https://example' || (doc_id % 997) || '.com/p/' || doc_id AS url
    FROM ids
    UNION ALL
    SELECT doc_id,
           'HTTPS://EXAMPLE' || (doc_id % 997) || '.COM:443/p/' || doc_id ||
           '/?utm_source=feed&utm_campaign=c' || (doc_id % 5) ||
           '#frag' || (doc_id % 7)
    FROM ids
    UNION ALL
    SELECT doc_id,
           'https://example' || (doc_id % 997) || '.com/p/' || doc_id ||
           '?utm_ref=only'
    FROM ids WHERE doc_id % 3 = 0
),
canon AS (
    SELECT doc_id,
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(
                    lower(regexp_extract(url, '{pre}'))
                      || regexp_replace(url, '{pre}', ''),
                    '^(https://[^/:?#]+):443([/?#]|$)', '\1\2'),
                  '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
                '#.*$', ''),
              '&utm_[^&]*', '', 'g'),
            '\?utm_[^&]*&', '?'),
          '\?utm_[^&]*$', ''),
        '([^/])/$', '\1') AS url
    FROM variants
)
SELECT url, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(max(doc_id) AS BIGINT) AS doc_id
FROM canon GROUP BY 1
"""


def sql_extent_area() -> str:
    """Mirror of ``webgeo.q_extent_area``: the reference's turf-style
    spherical ring area (``GeoUtils.ringAreaMeters``) applied to each
    doc's mention bbox — the four edge terms in the same left-associated
    order as ``geo.geomops.bbox_area_meters_vec``."""
    factor = repr(6_371_008.8 * 6_371_008.8 / 2)
    return f"""
WITH {POINTS_CTE},
e AS (
    SELECT doc_id, count(*) AS n_mentions,
           min(lat_mdeg) AS lat_min, max(lat_mdeg) AS lat_max,
           min(lon_mdeg) AS lon_min, max(lon_mdeg) AS lon_max
    FROM points GROUP BY 1
),
r AS (
    SELECT doc_id, n_mentions,
           radians(lon_min / 1000.0) AS x1, radians(lon_max / 1000.0) AS x2,
           radians(lat_min / 1000.0) AS ry1, radians(lat_max / 1000.0) AS ry2
    FROM e
)
SELECT doc_id, CAST(n_mentions AS BIGINT) AS n_mentions,
       CAST(floor(abs((x2 - x1) * sin(ry1) + (x1 - x2) * sin(ry2)
                      + (x1 - x2) * sin(ry2) + (x2 - x1) * sin(ry1))
                  * {factor}) AS BIGINT) AS area_m2
FROM r ORDER BY doc_id
"""


def sql_translit_names() -> str:
    """Mirror of ``training.q_translit_names``: the hand-romanized EXPECTED
    latin strings are embedded as literals (written by hand from the
    documented romanization conventions, independent of the engine's
    table), joined on c_custkey % N."""
    from .functions.language import TRANSLIT_FIXTURES

    rows = ", ".join(
        "({}, '{}', '{}')".format(i, s.replace("'", "''"),
                                  t.replace("'", "''"))
        for i, (s, t) in enumerate(TRANSLIT_FIXTURES))
    return f"""
WITH m(idx, name_src, name_latin) AS (SELECT * FROM (VALUES {rows}))
SELECT c.c_custkey, m.name_src, m.name_latin
FROM customer c JOIN m ON m.idx = c.c_custkey % {len(TRANSLIT_FIXTURES)}
ORDER BY 1
"""


def sql_gis_reader_admin() -> str:
    """Shared mirror of ``webgeo.q_shapefile_src`` / ``q_geopackage_src``:
    the admin rectangle corners re-derived from ``nation`` with the
    IDENTICAL float64 chain (``sources/world.admin_rect``: -180.0 - 0.0005
    + col*72.0 etc.) and the same floor(x*1e4 + 0.5) integerization; ring
    and point counts are the writer's closed single-ring rectangle."""
    return """
SELECT n_nationkey AS admin_id,
       1 AS n_rings,
       5 AS n_points,
       CAST(floor((-180.0 - 0.0005 + CAST(n_nationkey % 5 AS DOUBLE) * 72.0)
                  * 10000 + 0.5) AS BIGINT) AS lon0_e4,
       CAST(floor((-85.0 - 0.0005 + CAST(n_nationkey // 5 AS DOUBLE) * 34.0)
                  * 10000 + 0.5) AS BIGINT) AS lat0_e4,
       CAST(floor(((-180.0 - 0.0005 + CAST(n_nationkey % 5 AS DOUBLE) * 72.0)
                   + 72.0) * 10000 + 0.5) AS BIGINT) AS lon1_e4,
       CAST(floor(((-85.0 - 0.0005 + CAST(n_nationkey // 5 AS DOUBLE) * 34.0)
                   + 34.0) * 10000 + 0.5) AS BIGINT) AS lat1_e4
FROM nation ORDER BY 1
"""

"""Synthetic admin polygons + POI tables, derived deterministically from the
sf testdata's ``nation`` / ``supplier`` tables.

Mirrors the role of the reference's Natural-Earth admin polygons
(``reader/NaturalEarthReader.java``) and POI point sources for the profile's
spatial joins (``geo/PolygonIndex.java`` / ``geo/PointIndex.java``).  All
geometry comes from pure arithmetic on the keys so the DuckDB oracle can
reproduce the join results with plain range predicates.

Admin rectangles: the 25 nations tile the lon/lat plane in a 5x4-ish grid.
Edges sit at ``X.0005`` offsets so no coordinate-mention grid point (which are
always multiples of 0.001 degrees) can ever fall exactly on an edge — the PIP
result is boundary-convention-free and bit-reproducible.

  col       = n_nationkey % 5          row      = n_nationkey // 5
  lon_west  = -180.0005 + col * 72     lat_south = -85.0005 + row * 34

POIs: one per supplier.
  lon_mdeg = (s_suppkey * 48271) % 360000 - 180000
  lat_mdeg = (s_suppkey * 16807) % 170000 - 85000
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..geo import wkb

ADMIN_COLS, ADMIN_ROWS = 5, 5
ADMIN_LON_W, ADMIN_LAT_H = 72.0, 34.0
ADMIN_EDGE_OFF = 0.0005
POI_LON_MULT, POI_LAT_MULT = 48271, 16807


def admin_rect(nationkey: int) -> tuple[float, float, float, float]:
    """(lon0, lat0, lon1, lat1) of the admin cell for one nation key."""
    col = nationkey % ADMIN_COLS
    row = nationkey // ADMIN_COLS
    lon0 = -180.0 - ADMIN_EDGE_OFF + col * ADMIN_LON_W
    lat0 = -85.0 - ADMIN_EDGE_OFF + row * ADMIN_LAT_H
    return lon0, lat0, lon0 + ADMIN_LON_W, lat0 + ADMIN_LAT_H


def admin_ring(nationkey: int) -> np.ndarray:
    lon0, lat0, lon1, lat1 = admin_rect(nationkey)
    return np.array(
        [[lon0, lat0], [lon1, lat0], [lon1, lat1], [lon0, lat1], [lon0, lat0]],
        dtype=np.float64,
    )


def load_admin_polygons(sf_dir: str) -> list[tuple[int, list[np.ndarray]]]:
    """[(admin_id, rings)] for the PolygonIndex — built once, broadcast."""
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    keys = t.column("n_nationkey").to_numpy()
    return [(int(k), [admin_ring(int(k))]) for k in keys]


def admin_table(sf_dir: str) -> pa.Table:
    """The admin_polygons table with WKB geometry (FIXTURES.md §2 schema)."""
    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    keys = t.column("n_nationkey").to_numpy()
    geoms = [wkb.encode_wkb("polygon", [admin_ring(int(k))]) for k in keys]
    return pa.table(
        {
            "admin_id": pa.array(keys, pa.int64()),
            "name": t.column("n_name"),
            "admin_level": pa.array(np.zeros(len(keys), dtype=np.int8)),
            "iso_code": pa.array([f"A{int(k):02d}" for k in keys]),
            "geom_wkb": pa.array(geoms, pa.binary()),
            "min_zoom": pa.array(np.zeros(len(keys), dtype=np.int8)),
            "max_zoom": pa.array(np.full(len(keys), 7, dtype=np.int8)),
        }
    )


def poi_mdeg(suppkey: np.ndarray):
    suppkey = np.asarray(suppkey, dtype=np.int64)
    lon = (suppkey * POI_LON_MULT) % 360000 - 180000
    lat = (suppkey * POI_LAT_MULT) % 170000 - 85000
    return lat, lon


def load_pois(sf_dir: str):
    """(ids, lon_deg, lat_deg) arrays for the PointIndex — built once, broadcast."""
    t = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey"])
    ids = t.column("s_suppkey").to_numpy().astype(np.int64)
    lat_m, lon_m = poi_mdeg(ids)
    return ids, lon_m / 1000.0, lat_m / 1000.0

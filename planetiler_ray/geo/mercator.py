"""Web-mercator projection kernel (pure numpy, vectorized).

Semantics mirror the reference's coordinate convention
(``/root/reference/planetiler-core/src/main/java/com/onthegomap/planetiler/geo/GeoUtils.java:44-48,164-198``):
the world is the unit square in "world coordinates" with the north-west corner
at (0, 0) and the south-east corner at (1, 1).  Tile (z, x, y) covers the
square ``[x / 2^z, (x+1) / 2^z) x [y / 2^z, (y+1) / 2^z)``.

All functions accept scalars or numpy arrays and are branch-free so they can
run inside ``map_batches`` over zero-copy Arrow column buffers.

IMPORTANT determinism note: the correctness oracle (DuckDB SQL in
``__ray_entry__.oracle_sql``) re-computes these formulas with the *same IEEE
double expression structure* — keep ``(lon + 180.0) / 360.0`` etc. literally
in sync with the SQL when editing.
"""

from __future__ import annotations

import numpy as np

# Max latitude such that the mercator projection is square: atan(sinh(pi)).
MAX_LAT = 85.05112877980659
MIN_LAT = -MAX_LAT


def lon_to_world_x(lon):
    """Longitude in degrees -> world x in [0, 1]."""
    return (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0


def lat_to_world_y(lat):
    """Latitude in degrees -> world y in [0, 1] (north pole = 0)."""
    lat = np.asarray(lat, dtype=np.float64)
    sin_lat = np.sin(np.radians(np.clip(lat, MIN_LAT, MAX_LAT)))
    # Equivalent to (1 - ln(tan(pi/4 + lat/2)) / pi) / 2 but numerically nicer.
    y = 0.5 - 0.25 * np.log((1.0 + sin_lat) / (1.0 - sin_lat)) / np.pi
    return np.clip(y, 0.0, 1.0)


def world_x_to_lon(x):
    return np.asarray(x, dtype=np.float64) * 360.0 - 180.0


def world_y_to_lat(y):
    y = np.asarray(y, dtype=np.float64)
    return np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y))))


def world_to_tile(world, z):
    """World coordinate in [0, 1] -> integer tile index at zoom z, clamped."""
    n = np.int64(1) << np.int64(z)
    t = np.floor(np.asarray(world, dtype=np.float64) * np.float64(n)).astype(np.int64)
    return np.clip(t, 0, n - 1)


def lonlat_to_tile(lon, lat, z):
    """(lon, lat) degrees -> (tile_x, tile_y) at zoom z.

    DuckDB-oracle-mirrored: tx = least(greatest(floor((lon+180)/360 * 2^z), 0), 2^z-1).
    """
    return world_to_tile(lon_to_world_x(lon), z), world_to_tile(lat_to_world_y(lat), z)


def encode_flat_location(lon, lat):
    """Pack (lon, lat) into one int64 with ~1e-7 deg precision.

    Same idea as the reference's node-location packing
    (``GeoUtils.encodeFlatLocation``, GeoUtils.java:204-226): two 31-bit
    quantized world coordinates.  Used by the OSM-style way<-node join.
    """
    qx = np.minimum((lon_to_world_x(lon) * (1 << 31)).astype(np.int64), (1 << 31) - 1)
    qy = np.minimum((lat_to_world_y(lat) * (1 << 31)).astype(np.int64), (1 << 31) - 1)
    return (qx << np.int64(32)) | qy


def decode_flat_location(packed):
    packed = np.asarray(packed, dtype=np.int64)
    qx = packed >> np.int64(32)
    qy = packed & np.int64(0xFFFFFFFF)
    scale = 1.0 / (1 << 31)
    return world_x_to_lon(qx * scale), world_y_to_lat(qy * scale)

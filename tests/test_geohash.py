"""Geohash kernel (geo/geohash.py) unit tests — pinned against the classic
public test vector and a scalar reference implementation."""

import numpy as np

from planetiler_ray.geo import geohash as GH


def _scalar_geohash(lat: float, lon: float, precision: int) -> str:
    """Textbook bisection geohash (geohash.org algorithm)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True  # longitude first
    while len(bits) < 5 * precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[5 * i : 5 * i + 5]:
            v = v * 2 + b
        out.append(GH.ALPHABET[v])
    return "".join(out)


def test_classic_vector():
    # the canonical example from the original geohash description
    got = GH.encode(np.array([57.64911]), np.array([10.40744]), 6)
    assert got[0] == "u4pruy"


def test_matches_scalar_reference():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89.9, 89.9, 200)
    lon = rng.uniform(-179.9, 179.9, 200)
    for prec in (1, 3, 5):
        got = GH.encode(lat, lon, prec)
        for i in range(len(lat)):
            assert got[i] == _scalar_geohash(float(lat[i]), float(lon[i]), prec)


def test_prefix_hierarchy():
    # precision-(k+1) geohash of the same point extends the precision-k one
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.9, 89.9, 64)
    lon = rng.uniform(-179.9, 179.9, 64)
    g3 = GH.encode(lat, lon, 3)
    g5 = GH.encode(lat, lon, 5)
    assert all(b.startswith(a) for a, b in zip(g3, g5))


def test_edge_clamp():
    # lat=90 / lon=180 clamp into the last cell instead of overflowing
    got = GH.encode(np.array([90.0, -90.0]), np.array([180.0, -180.0]), 4)
    assert got[0] == "z" * 4 and got[1] == "0" * 4

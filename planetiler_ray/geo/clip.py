"""Tile slicing: cut world-coordinate geometries into per-tile clipped pieces.

Re-expresses the semantics of the reference's geojson-vt-derived stripe
clipper (``render/TiledGeometry.java:198-699``): a geometry at zoom ``z`` is
scaled into "tile units" (1 unit = 1 tile), cut into x-columns with a ±buffer,
each column cut into y-rows, and each piece emitted in tile-local *pixel*
coordinates (0..extent, extending ±buffer_px).  Interior tiles of large
polygons are detected without per-tile clipping via crossing-parity on the
column center-line ("filled tiles", cf. ``TiledGeometry.java:502-699``) and
emitted as canonical full-tile squares — this is the skew bomb the reference
warns about (one ocean polygon -> millions of tiles), so fills are emitted
lazily by the caller using :func:`polygon_tiles` as a generator.

Coordinate conventions follow :mod:`planetiler_ray.geo.mercator`: world unit
square, NW = (0,0).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

DEFAULT_EXTENT = 256
DEFAULT_BUFFER_PX = 4.0


# --------------------------------------------------------------------------
# Low-level clipping primitives (axis-aligned half-planes / slabs)
# --------------------------------------------------------------------------

def clip_ring_halfplane(ring: np.ndarray, axis: int, bound: float, keep_ge: bool) -> np.ndarray | None:
    """Sutherland-Hodgman clip of a closed ring against one half-plane.

    Returns a closed ring (first == last) or None when fully clipped away.
    """
    pts = ring[:-1] if len(ring) > 1 and np.array_equal(ring[0], ring[-1]) else ring
    n = len(pts)
    if n < 3:
        return None
    c = pts[:, axis]
    inside = c >= bound if keep_ge else c <= bound
    if inside.all():
        out = pts
        return np.vstack([out, out[:1]])
    if not inside.any():
        return None
    out: list[np.ndarray] = []
    for i in range(n):
        j = (i + 1) % n
        a, b = pts[i], pts[j]
        ia, ib = inside[i], inside[j]
        if ia:
            out.append(a)
        if ia != ib:
            t = (bound - a[axis]) / (b[axis] - a[axis])
            p = a + t * (b - a)
            p[axis] = bound  # exact on the clip line
            out.append(p)
    if len(out) < 3:
        return None
    arr = np.array(out)
    return np.vstack([arr, arr[:1]])


def clip_ring_slab(ring: np.ndarray, axis: int, lo: float, hi: float) -> np.ndarray | None:
    r = clip_ring_halfplane(ring, axis, lo, True)
    if r is None:
        return None
    return clip_ring_halfplane(r, axis, hi, False)


def clip_line_slab(coords: np.ndarray, axis: int, lo: float, hi: float) -> list[np.ndarray]:
    """Clip a polyline to the slab lo <= coord[axis] <= hi -> list of pieces."""
    c = coords[:, axis]
    n = len(coords)
    if n < 2:
        return []
    if c.min() >= lo and c.max() <= hi:
        return [coords]
    pieces: list[np.ndarray] = []
    cur: list[np.ndarray] = []
    for i in range(n - 1):
        a, b = coords[i], coords[i + 1]
        ca, cb = a[axis], b[axis]
        a_in = lo <= ca <= hi
        b_in = lo <= cb <= hi
        if a_in:
            if not cur:
                cur.append(a)
            if b_in:
                cur.append(b)
            else:
                bound = hi if cb > hi else lo
                t = (bound - ca) / (cb - ca)
                p = a + t * (b - a)
                p[axis] = bound
                cur.append(p)
                pieces.append(np.array(cur))
                cur = []
        else:
            if b_in:
                bound = hi if ca > hi else lo
                t = (bound - ca) / (cb - ca)
                p = a + t * (b - a)
                p[axis] = bound
                cur = [p, b]
            else:
                # both outside: may still cross the whole slab
                if (ca < lo and cb > hi) or (ca > hi and cb < lo):
                    t1 = (lo - ca) / (cb - ca)
                    t2 = (hi - ca) / (cb - ca)
                    p1 = a + min(t1, t2) * (b - a)
                    p2 = a + max(t1, t2) * (b - a)
                    p1[axis] = lo if ca < lo else hi
                    p2[axis] = hi if ca < lo else lo
                    pieces.append(np.array([p1, p2]))
    if len(cur) >= 2:
        pieces.append(np.array(cur))
    return pieces


# --------------------------------------------------------------------------
# Tile slicing
# --------------------------------------------------------------------------

def _ring_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def _parity_intervals(rings: list[np.ndarray], x_line: float) -> np.ndarray:
    """Sorted y-crossings of a vertical line with all ring edges (even-odd).

    Pairs (y[0], y[1]), (y[2], y[3]), ... are the inside intervals — the
    IntRangeSet-parity idea of ``TiledGeometry.java:544-597``.
    """
    ys: list[np.ndarray] = []
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        m = (x0 <= x_line) != (x1 <= x_line)
        if m.any():
            t = (x_line - x0[m]) / (x1[m] - x0[m])
            ys.append(y0[m] + t * (y1[m] - y0[m]))
    if not ys:
        return np.empty(0)
    out = np.concatenate(ys)
    out.sort()
    return out


def line_tiles(coords_world: np.ndarray, z: int, buffer_px: float = DEFAULT_BUFFER_PX,
               extent: int = DEFAULT_EXTENT, wrap_x: bool = True
               ) -> Iterator[tuple[int, int, list[np.ndarray]]]:
    """Slice one world-coordinate polyline at zoom z.

    Yields ``(tile_x, tile_y, [piece_px, ...])`` with pieces in tile-local
    pixel coordinates.

    ``wrap_x`` (antimeridian, ``TiledGeometry.sliceIntoTiles:201-208``):
    crossing geometries are represented with CONTINUOUS world x beyond [0, 1]
    (lon past ±180, same as the reference's mercator coords) and emitted
    columns are taken mod 2^z — no clamping of the x slice range.
    """
    n = 1 << z
    buf = buffer_px / extent
    scaled = coords_world * n
    x0 = int(np.floor(scaled[:, 0].min() - buf))
    x1 = int(np.floor(scaled[:, 0].max() + buf))
    if not (wrap_x and n > 1):
        x0, x1 = max(0, x0), min(n - 1, x1)
    for cx in range(x0, x1 + 1):
        col_pieces = clip_line_slab(scaled, 0, cx - buf, cx + 1 + buf)
        if not col_pieces:
            continue
        ymin = min(p[:, 1].min() for p in col_pieces)
        ymax = max(p[:, 1].max() for p in col_pieces)
        ry0 = max(0, int(np.floor(ymin - buf)))
        ry1 = min(n - 1, int(np.floor(ymax + buf)))
        for cy in range(ry0, ry1 + 1):
            out: list[np.ndarray] = []
            for piece in col_pieces:
                for sub in clip_line_slab(piece, 1, cy - buf, cy + 1 + buf):
                    local = (sub - np.array([cx, cy])) * extent
                    if len(local) >= 2:
                        out.append(local)
            if out:
                yield cx % n, cy, out


def fill_ring_px(buffer_px: float = DEFAULT_BUFFER_PX, extent: int = DEFAULT_EXTENT) -> np.ndarray:
    """The canonical full-tile square ring (CW in screen coords), buffered."""
    b = buffer_px
    e = extent + buffer_px
    return np.array([[-b, -b], [e, -b], [e, e], [-b, e], [-b, -b]], dtype=np.float64)


def polygon_tiles(rings_world: list[np.ndarray], z: int, buffer_px: float = DEFAULT_BUFFER_PX,
                  extent: int = DEFAULT_EXTENT, wrap_x: bool = True
                  ) -> Iterator[tuple[int, int, list[np.ndarray], bool]]:
    """Slice one world-coordinate polygon (exterior + holes) at zoom z.

    Yields ``(tile_x, tile_y, rings_px, is_fill)``.  ``is_fill`` tiles get the
    canonical full-square ring and were detected via center-line parity
    without clipping (generator — callers stream fills instead of
    materializing millions of interior-tile rows at once).
    ``wrap_x``: crossing polygons use continuous world x beyond [0, 1];
    emitted columns are taken mod 2^z.
    """
    n = 1 << z
    buf = buffer_px / extent
    scaled = [r * n for r in rings_world]
    ext = scaled[0]
    x0 = int(np.floor(ext[:, 0].min() - buf))
    x1 = int(np.floor(ext[:, 0].max() + buf))
    if not (wrap_x and n > 1):
        x0, x1 = max(0, x0), min(n - 1, x1)
    for cx in range(x0, x1 + 1):
        lo, hi = cx - buf, cx + 1 + buf
        col_rings: list[np.ndarray] = []
        for r in scaled:
            cr = clip_ring_slab(r, 0, lo, hi)
            if cr is not None and abs(_ring_area(cr)) > 0:
                col_rings.append(cr)
        if not col_rings:
            continue
        ymin = min(r[:, 1].min() for r in col_rings)
        ymax = max(r[:, 1].max() for r in col_rings)
        ry0 = max(0, int(np.floor(ymin - buf)))
        ry1 = min(n - 1, int(np.floor(ymax + buf)))
        # rows touched by any boundary edge *of the unclipped geometry* within
        # this buffered column (a clipped ring adds artificial vertical edges
        # on the slab bounds which must not count as "boundary")
        touched = np.zeros(ry1 - ry0 + 2, dtype=bool)  # last slot = overflow
        for r in scaled:
            ex0, ey0 = r[:-1, 0], r[:-1, 1]
            ex1, ey1 = r[1:, 0], r[1:, 1]
            m = (np.minimum(ex0, ex1) <= hi) & (np.maximum(ex0, ex1) >= lo)
            if not m.any():
                continue
            ylo = np.minimum(ey0[m], ey1[m]) - buf
            yhi = np.maximum(ey0[m], ey1[m]) + buf
            a = np.clip(np.floor(ylo).astype(np.int64) - ry0, 0, len(touched) - 1)
            b = np.clip(np.floor(yhi).astype(np.int64) - ry0, 0, len(touched) - 1)
            for aa, bb in zip(a, b):
                touched[aa : bb + 1] = True
        inside_iv = _parity_intervals(scaled, cx + 0.5)
        for cy in range(ry0, ry1 + 1):
            if not touched[cy - ry0]:
                # untouched row: box is fully inside or fully outside
                yc = cy + 0.5
                k = np.searchsorted(inside_iv, yc)
                if k % 2 == 1:  # center inside -> filled tile
                    yield cx % n, cy, [fill_ring_px(buffer_px, extent)], True
                continue
            out: list[np.ndarray] = []
            for r in col_rings:
                cr = clip_ring_slab(r, 1, cy - buf, cy + 1 + buf)
                if cr is not None and abs(_ring_area(cr)) > 1e-12:
                    out.append((cr - np.array([cx, cy])) * extent)
            if out:
                yield cx % n, cy, out, False


def point_tiles_vec(world_x: np.ndarray, world_y: np.ndarray, z: int,
                    buffer_px: float = DEFAULT_BUFFER_PX, extent: int = DEFAULT_EXTENT,
                    wrap_x: bool = True):
    """Vectorized point slicing: each point lands in its tile plus any of the
    8 neighbors whose buffered box contains it (cf. the point fast-path,
    ``TiledGeometry.java:245-268``).

    ``wrap_x``: x wraps across the antimeridian (the reference re-slices with
    a ±2^z offset, ``TiledGeometry.sliceIntoTiles:201-208``): the virtual
    neighbor tile -1 becomes 2^z - 1 with local pixel coords computed from
    the virtual position, so a point at lon≈180 also buffers into the
    westmost column and vice versa.

    Returns ``(src_index, tile_x, tile_y, px, py)`` arrays; ``px, py`` are
    tile-local pixel coordinates (may lie in [-buffer, extent+buffer]).
    """
    n = np.int64(1) << np.int64(z)
    buf = buffer_px / extent
    sx = np.asarray(world_x, dtype=np.float64) * np.float64(n)
    sy = np.asarray(world_y, dtype=np.float64) * np.float64(n)
    base_x = np.clip(np.floor(sx).astype(np.int64), 0, n - 1)
    base_y = np.clip(np.floor(sy).astype(np.int64), 0, n - 1)
    src, txs, tys, pxs = [], [], [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            tx = base_x + dx
            ty = base_y + dy
            if wrap_x and n > 1:
                x_ok = np.ones_like(tx, dtype=bool)
            else:
                x_ok = (tx >= 0) & (tx < n)
            ok = x_ok & (ty >= 0) & (ty < n)
            ok &= (sx >= tx - buf) & (sx <= tx + 1 + buf)
            ok &= (sy >= ty - buf) & (sy <= ty + 1 + buf)
            idx = np.flatnonzero(ok)
            if len(idx):
                src.append(idx)
                txs.append(tx[idx] % n if wrap_x else tx[idx])
                tys.append(ty[idx])
                pxs.append((sx[idx] - tx[idx]) * extent)
    if not src:
        e = np.empty(0, dtype=np.int64)
        return e, e, e, np.empty(0), np.empty(0)
    src = np.concatenate(src)
    tx = np.concatenate(txs)
    ty = np.concatenate(tys)
    px = np.concatenate(pxs)
    py = (sy[src] - ty) * extent
    return src, tx, ty, px, py

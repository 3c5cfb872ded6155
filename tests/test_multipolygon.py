"""Multipolygon assembly tests (OsmMultipolygon semantics: stitching,
reversal, area-sorted nesting, holes, islands-in-holes)."""

import numpy as np

from planetiler_ray.geo.multipolygon import assemble_multipolygon, nest_rings, stitch_rings


def _sq(x0, y0, s):
    return np.array(
        [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
        dtype=float,
    )


def test_stitch_two_halves():
    # square split into two open segments, one reversed
    a = np.array([[0, 0], [4, 0], [4, 4]], dtype=float)
    b = np.array([[0, 0], [0, 4], [4, 4]], dtype=float)  # needs reversal
    rings, _ = stitch_rings([a, b])
    assert len(rings) == 1
    assert len(rings[0]) >= 5
    assert (rings[0][0] == rings[0][-1]).all()


def test_nest_hole_and_island():
    outer = _sq(0, 0, 10)
    hole = _sq(2, 2, 6)
    island = _sq(4, 4, 2)
    polys = nest_rings([island, outer, hole])  # shuffled input order
    assert len(polys) == 2  # outer-with-hole + island
    sizes = sorted(len(p) for p in polys)
    assert sizes == [1, 2]  # island has no holes; outer has one


def test_assemble_full():
    # outer as two segments + closed hole
    a = np.array([[0, 0], [10, 0], [10, 10]], dtype=float)
    b = np.array([[10, 10], [0, 10], [0, 0]], dtype=float)
    hole = _sq(3, 3, 2)
    polys = assemble_multipolygon([a, b, hole])
    assert len(polys) == 1
    assert len(polys[0]) == 2  # exterior + hole
    # exterior is the big ring
    ext = polys[0][0]
    assert ext[:, 0].max() == 10


def test_unclosable_dropped():
    dangling = np.array([[0, 0], [5, 5]], dtype=float)
    polys = assemble_multipolygon([dangling, _sq(0, 0, 2)])
    assert len(polys) == 1  # only the closed square survives


def test_repair_bowtie_and_figure_eight():
    """snapAndFixPolygon-class repair: self-intersecting rings untwist into
    simple nested polygons; valid input is unchanged (modulo snapping)."""
    import numpy as np

    from planetiler_ray.geo.repair import repair_polygon, untwist_ring

    # bowtie: crosses itself at (5, 5)
    bow = np.array([[0.0, 0], [10, 10], [10, 0], [0, 10], [0, 0]])
    pieces = untwist_ring(bow)
    assert len(pieces) == 2
    areas = sorted(abs(0.5 * np.cross(p[:-1], p[1:]).sum()) for p in pieces)
    assert np.allclose(areas, [25.0, 25.0])
    polys = repair_polygon([bow])
    assert len(polys) == 2 and all(len(p) == 1 for p in polys)

    # valid square with a valid hole: unchanged structure
    sq = np.array([[0.0, 0], [10, 0], [10, 10], [0, 10], [0, 0]])
    hole = np.array([[2.0, 2], [4, 2], [4, 4], [2, 4], [2, 2]])
    polys = repair_polygon([sq, hole])
    assert len(polys) == 1 and len(polys[0]) == 2

    # degenerate sliver collapses to nothing after snapping
    sliver = np.array([[0.0, 0], [10, 0.001], [10, 0.002], [0, 0.003], [0, 0]])
    assert repair_polygon([sliver], precision=1.0) == []


def test_repair_bowtie_any_start_vertex():
    """Regression (code review): untwisted lobes start at the shared split
    point; nesting must not classify one lobe as the other's hole for ANY
    traversal start."""
    import numpy as np

    from planetiler_ray.geo.repair import repair_polygon

    base = [(0.0, 0), (10, 10), (10, 0), (0, 10)]
    for s in range(4):
        ring = np.array([base[(s + i) % 4] for i in range(4)] + [base[s]])
        polys = repair_polygon([ring])
        assert len(polys) == 2 and all(len(p) == 1 for p in polys), (s, polys)

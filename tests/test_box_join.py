"""box_overlap_pairs (stages/joins.py) — grid scatter + exactly-once
emission vs a brute-force quadratic reference."""

import numpy as np
import pyarrow as pa
import ray

from planetiler_ray.stages.joins import box_overlap_pairs


def _brute(doc, x0, x1, y0, y1, cap):
    keep = ((x1 - x0) <= cap) & ((y1 - y0) <= cap)
    idx = np.flatnonzero(keep)
    out = set()
    for ii in range(len(idx)):
        for jj in range(ii + 1, len(idx)):
            a, b = idx[ii], idx[jj]
            if (x0[a] <= x1[b] and x0[b] <= x1[a]
                    and y0[a] <= y1[b] and y0[b] <= y1[a]):
                out.add((min(doc[a], doc[b]), max(doc[a], doc[b])))
    return out


def test_box_join_matches_brute(ray_session):
    rng = np.random.default_rng(3)
    n = 300
    cap = 5000
    x0 = rng.integers(-170000, 160000, n)
    y0 = rng.integers(-80000, 70000, n)
    # mix of compact boxes (joinable) and wide ones (filtered out)
    w = np.where(rng.random(n) < 0.8,
                 rng.integers(0, cap, n), rng.integers(cap + 1, 40000, n))
    h = np.where(rng.random(n) < 0.8,
                 rng.integers(0, cap, n), rng.integers(cap + 1, 40000, n))
    x1, y1 = x0 + w, y0 + h
    doc = rng.permutation(n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc, pa.int64()),
        "lon_min": pa.array(x0, pa.int64()),
        "lon_max": pa.array(x1, pa.int64()),
        "lat_min": pa.array(y0, pa.int64()),
        "lat_max": pa.array(y1, pa.int64()),
    }))
    got_tbl = box_overlap_pairs(ds, span_cap=cap).to_pandas()
    got = set(zip(got_tbl["doc_a"], got_tbl["doc_b"]))
    want = _brute(doc, x0, x1, y0, y1, cap)
    # exactly-once: no duplicate rows either
    assert len(got_tbl) == len(got) == len(want)
    assert got == want


def test_box_join_boundary_touch(ray_session):
    # boxes sharing only an edge/corner DO count (closed-interval overlap),
    # and the pair is emitted exactly once even when it spans 4 grid cells
    cap = 1000
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "lon_min": pa.array([-500, 500], pa.int64()),
        "lon_max": pa.array([500, 1500], pa.int64()),
        "lat_min": pa.array([-500, 500], pa.int64()),
        "lat_max": pa.array([500, 1500], pa.int64()),
    }))
    got = box_overlap_pairs(ds, span_cap=cap).to_pandas()
    assert list(map(tuple, got.values.tolist())) == [(1, 2)]

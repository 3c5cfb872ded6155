"""Line merging for per-tile post-processing — ``FeatureMerge.mergeLineStrings``
+ ``util/LoopLineMerger.java`` semantics (simplified but behavior-pinned):

* endpoints snapped to a grid (default 1/16 px = the MVT integer lattice,
  mirroring the reference's snap-to-grid);
* segments sharing a snapped endpoint of degree 2 are joined end-to-end;
* stubs shorter than ``min_length`` that dangle off junctions are dropped;
* remaining chains shorter than ``min_length`` are dropped.

Junction-preserving: endpoints with degree != 2 are never merged through, so
road intersections survive (the reference's "merge strokes by straightest
angle" picks one continuation; we keep chains split at junctions — a
documented simplification that preserves geometry, only splitting differs).
"""

from __future__ import annotations

import numpy as np

SNAP = 16.0  # quantization steps per pixel (MVT 4096/256)


def _key(pt) -> tuple[int, int]:
    return (int(round(pt[0] * SNAP)), int(round(pt[1] * SNAP)))


def _length(c: np.ndarray) -> float:
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def merge_lines(segments: list[np.ndarray], min_length: float = 0.0) -> list[np.ndarray]:
    """Join segments at degree-2 snapped endpoints; drop short pieces."""
    segs = [np.asarray(s, dtype=np.float64) for s in segments if len(s) >= 2]
    if not segs:
        return []
    # endpoint degree map
    degree: dict[tuple[int, int], int] = {}
    for s in segs:
        for pt in (s[0], s[-1]):
            k = _key(pt)
            degree[k] = degree.get(k, 0) + 1
    # adjacency: endpoint -> list of (segment index, is_start)
    adj: dict[tuple[int, int], list[tuple[int, bool]]] = {}
    for i, s in enumerate(segs):
        adj.setdefault(_key(s[0]), []).append((i, True))
        adj.setdefault(_key(s[-1]), []).append((i, False))
    used = [False] * len(segs)
    out: list[np.ndarray] = []
    for i in range(len(segs)):
        if used[i]:
            continue
        used[i] = True
        chain = segs[i]
        # extend forward then backward through degree-2 joins
        for forward in (True, False):
            while True:
                end = chain[-1] if forward else chain[0]
                k = _key(end)
                if degree.get(k, 0) != 2:
                    break
                nxt = [(j, st) for j, st in adj.get(k, []) if not used[j]]
                if len(nxt) != 1:
                    break
                j, at_start = nxt[0]
                used[j] = True
                piece = segs[j] if at_start else segs[j][::-1]
                if forward:
                    chain = np.vstack([chain, piece[1:]])
                else:
                    chain = np.vstack([piece[::-1][:-1], chain])
        if _length(chain) >= min_length:
            out.append(chain)
    # deterministic order: by first coordinate
    out.sort(key=lambda c: (c[0, 0], c[0, 1], len(c)))
    return out

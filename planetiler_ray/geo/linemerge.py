"""Line merging for per-tile post-processing — ``FeatureMerge.mergeLineStrings``
+ ``util/LoopLineMerger.java`` semantics (simplified but behavior-pinned):

* endpoints snapped to a grid (default 1/16 px = the MVT integer lattice,
  mirroring the reference's snap-to-grid);
* segments sharing a snapped endpoint of degree 2 are joined end-to-end;
* stubs shorter than ``min_length`` that dangle off junctions are dropped;
* remaining chains shorter than ``min_length`` are dropped.

Junction handling: by default endpoints with degree != 2 are never merged
through (geometry-preserving splits); with ``strokes=True`` the straightest
pair is merged through each junction (:func:`merge_strokes`), matching the
reference's "merge strokes by straightest angle" phase.
"""

from __future__ import annotations

import numpy as np

SNAP = 16.0  # quantization steps per pixel (MVT 4096/256)


def _key(pt) -> tuple[int, int]:
    return (int(round(pt[0] * SNAP)), int(round(pt[1] * SNAP)))


def _length(c: np.ndarray) -> float:
    d = np.diff(c, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def _angle_between(a_dir: np.ndarray, b_dir: np.ndarray) -> float:
    """Turn angle (radians, 0 = straight through) between an incoming
    direction and an outgoing direction."""
    na = np.hypot(*a_dir)
    nb = np.hypot(*b_dir)
    if na == 0 or nb == 0:
        return np.pi
    cosv = float(np.clip(np.dot(a_dir, b_dir) / (na * nb), -1.0, 1.0))
    return float(np.arccos(cosv))


def merge_strokes(chains: list[np.ndarray], max_turn: float = np.pi / 4) -> list[np.ndarray]:
    """Straightest-angle stroke merging at junctions (the reference's "merge
    strokes by straightest angle", ``LoopLineMerger`` stroke phase): chains
    meeting at a shared snapped endpoint are greedily paired by smallest turn
    angle (must be < ``max_turn``) and joined through the junction; remaining
    arms stay split.  Deterministic: junctions processed in sorted key order,
    candidate pairs in (angle, chain index) order."""
    chains = [np.asarray(c, dtype=np.float64) for c in chains]
    # endpoint -> [(chain idx, is_start)]
    while True:
        adj: dict[tuple[int, int], list[tuple[int, bool]]] = {}
        for i, c in enumerate(chains):
            adj.setdefault(_key(c[0]), []).append((i, True))
            adj.setdefault(_key(c[-1]), []).append((i, False))
        merged_any = False
        for k in sorted(adj):
            arms = adj[k]
            if len(arms) < 2:
                continue
            # direction INTO the junction for each arm
            dirs = []
            for i, at_start in arms:
                c = chains[i]
                if c is None:
                    dirs.append(None)
                    continue
                v = (c[0] - c[1]) if at_start else (c[-1] - c[-2])
                dirs.append(-v)  # incoming direction
            pairs = []
            for a in range(len(arms)):
                for b in range(a + 1, len(arms)):
                    if dirs[a] is None or dirs[b] is None or arms[a][0] == arms[b][0]:
                        continue
                    turn = _angle_between(dirs[a], -dirs[b])
                    if turn < max_turn:
                        pairs.append((turn, a, b))
            used: set[int] = set()
            used_chains: set[int] = set()  # a merged chain's endpoints/flags are stale
            for turn, a, b in sorted(pairs):
                if a in used or b in used:
                    continue
                ia, sa = arms[a]
                ib, sb = arms[b]
                if ia in used_chains or ib in used_chains:
                    continue  # e.g. a loop whose other arm was already merged
                if chains[ia] is None or chains[ib] is None:
                    continue
                ca = chains[ia] if not sa else chains[ia][::-1]  # ends at k
                cb = chains[ib] if sb else chains[ib][::-1]      # starts at k
                chains[ia] = np.vstack([ca, cb[1:]])
                chains[ib] = None
                used.add(a)
                used.add(b)
                used_chains.update((ia, ib))
                merged_any = True
            if merged_any:
                break  # adjacency is stale; rebuild
        chains = [c for c in chains if c is not None]
        if not merged_any:
            return chains


def merge_lines(segments: list[np.ndarray], min_length: float = 0.0,
                strokes: bool = False) -> list[np.ndarray]:
    """Join segments at degree-2 snapped endpoints; drop short pieces.

    ``strokes=True`` additionally merges the straightest pair through
    junctions of degree > 2 (see :func:`merge_strokes`)."""
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
        out.append(chain)
    if strokes:
        out = merge_strokes(out)
    out = [c for c in out if _length(c) >= min_length]
    # deterministic order: by first coordinate
    out.sort(key=lambda c: (c[0, 0], c[0, 1], len(c)))
    return out

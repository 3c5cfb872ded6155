"""Bucketed high-cardinality sum aggregation.

Ray Data's built-in ``groupby(keys).aggregate(Sum(...))`` is the right tool
for SMALL key spaces, but at 10^5+ distinct keys its per-task overhead
measured ~2-10x slower than one hash-bucket shuffle with a vectorized
lexsort + ``np.add.reduceat`` merge body (see ``pipelines/osm.overlay_area``
/ ``pipelines/training.q_tpch_q18`` — the finding that motivated this
helper).  The reference hits the same wall with its feature-group merge and
solves it the same way: ONE exchange keyed on a bounded bucket, vectorized
within-group bodies (``collection/FeatureGroup.java`` sort-then-scan).

Scale notes:
* the shuffle volume is the PARTIAL table (distinct keys per batch), never
  the raw rows — callers must pre-aggregate per batch first;
* ``n_buckets`` bounds group size at ~n_distinct/n_buckets; buckets come
  from a splitmix-mixed hash of all key columns so hot ranges spread;
* an optional ``having`` predicate runs INSIDE the merge so the output can
  shrink to survivors before leaving the group (HAVING pushdown).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(h: np.ndarray) -> np.ndarray:
    h = h * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(31)
    return h


def count_min_partial(keys: list[str], count_col: str,
                      mins: list[tuple[str, str]] | None = None):
    """``map_batches`` body that collapses duplicate ``keys`` rows WITHIN
    the batch into (count partial, min partials) — the pre-aggregation
    step :func:`bucketed_sum`'s contract requires, shared so pair-emitting
    callers (``dedup._dedup_pairs``, ``ann.embedding_neardup``,
    ``ann.mutual_nn``) ship only distinct per-batch keys through the
    exchange instead of the raw candidate-pair stream (ADVICE r3).

    ``mins``: (in_col, out_col) pairs reduced with ``np.minimum.reduceat``.
    Output columns: ``keys + [count_col] + min-outs`` (all int64)."""
    mins = mins or []

    def partial(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            cols = {k: pa.array([], pa.int64()) for k in keys}
            cols[count_col] = pa.array([], pa.int64())
            for _, o in mins:
                cols[o] = pa.array([], pa.int64())
            return pa.table(cols)
        karr = [batch.column(k).to_numpy() for k in keys]
        order = np.lexsort(karr[::-1])
        ks = [a[order] for a in karr]
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for a in ks:
            new[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], n)
        cols = {k: pa.array(a[starts], pa.int64()) for k, a in zip(keys, ks)}
        cols[count_col] = pa.array(
            (ends - starts).astype(np.int64), pa.int64())
        for c, o in mins:
            cols[o] = pa.array(
                np.minimum.reduceat(batch.column(c).to_numpy()[order], starts)
                .astype(np.int64), pa.int64())
        return pa.table(cols)

    return partial


def bucketed_sum(ds, keys: list[str], sums: list[tuple[str, str]],
                 n_buckets: int | None = None, having=None,
                 mins: list[tuple[str, str]] | None = None):
    """``SELECT keys, sum(part) AS out [, min(col) AS out2] ... GROUP BY
    keys [HAVING ...]`` over int64 columns, as one bucket shuffle +
    reduceat merge.

    ``keys``: int64 key columns.  ``sums``: (partial_col, out_col) pairs.
    ``mins``: (col, out_col) pairs reduced with ``np.minimum.reduceat``.
    ``having``: optional ``f(key_arrays: dict, out_arrays: dict) -> bool
    mask`` applied inside the merge.  Returns a Dataset with columns
    ``keys + sums-outs + mins-outs`` (int64).
    """
    if n_buckets is None:
        # scale the merge fan-out with the cluster (the flagship's
        # shuffle_partitions knob): 64 on a 32-core box, 2x cores beyond —
        # a fixed 64 would cap the reduce wave on >32-core clusters
        from ..pipelines.flagship import shuffle_partitions

        n_buckets = shuffle_partitions()
    mins = mins or []
    out_schema = pa.schema(
        [(k, pa.int64()) for k in keys]
        + [(o, pa.int64()) for _, o in sums]
        + [(o, pa.int64()) for _, o in mins])

    def tag(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, np.uint64)
        for k in keys:
            h = _mix64(h + batch.column(k).to_numpy().astype(np.uint64) * _MIX)
        b = (h % np.uint64(n_buckets)).astype(np.int64)
        return batch.append_column("_bagg", pa.array(b, pa.int64()))

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return out_schema.empty_table()
        karr = [g.column(k).to_numpy() for k in keys]
        order = np.lexsort(karr[::-1])
        ks = [a[order] for a in karr]
        new = np.zeros(len(order), dtype=bool)
        new[0] = True
        for a in ks:
            new[1:] |= a[1:] != a[:-1]
        starts = np.flatnonzero(new)
        kvals = {k: a[starts] for k, a in zip(keys, ks)}
        ovals = {
            out: np.add.reduceat(g.column(part).to_numpy()[order], starts)
            for part, out in sums
        }
        for col, out in mins:
            ovals[out] = np.minimum.reduceat(
                g.column(col).to_numpy()[order], starts)
        if having is not None:
            mask = having(kvals, ovals)
            kvals = {k: v[mask] for k, v in kvals.items()}
            ovals = {k: v[mask] for k, v in ovals.items()}
        cols = {k: pa.array(v, pa.int64()) for k, v in kvals.items()}
        cols.update({k: pa.array(v.astype(np.int64), pa.int64())
                     for k, v in ovals.items()})
        return pa.table(cols)

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_bagg")
        .map_groups(merge, batch_format="pyarrow")
    )

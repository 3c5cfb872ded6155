"""Incremental corpus processing: snapshot diff between two document
Datasets (the recurring-crawl story — at 100 TB you reprocess the DELTA,
not the corpus; the reference's analogue is tile-archive resume/refresh).

``corpus_diff`` classifies every doc id as added / removed / changed /
same using 128-bit content hashes, with ONE side-tagged hash-bucket
shuffle (the ``pipelines/osm.py`` join pattern): both snapshots stream
their (id, hash) projections — never the text — into id-hash buckets,
and each bucket classifies thousands of ids with one lexsort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def corpus_diff(old_ds, new_ds, id_col: str = "doc_id", col: str = "text",
                n_buckets: int = 64):
    """-> Dataset (doc_id, status) for every id in either snapshot.

    status: 'added' (only in new), 'removed' (only in old), 'changed'
    (both, different content hash), 'same'.  Hash equality stands in for
    text equality (FNV-128 — the dedup suite's accepted collision class).
    Ids must be unique within each snapshot (the classifier reads exactly
    the two rows of a both-sides run).
    """
    from ..functions.vhash import fnv128_arrow

    def project(side: int):
        def f(batch: pa.Table) -> pa.Table:
            s = batch.column(col)
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            hi, lo = fnv128_arrow(s)
            ids = batch.column(id_col).to_numpy()
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "h_hi": pa.array(hi.astype(np.int64), pa.int64()),
                    "h_lo": pa.array(lo.astype(np.int64), pa.int64()),
                    "side": pa.array(np.full(len(ids), side, np.int8), pa.int8()),
                    "bucket": pa.array(
                        (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                         >> np.uint64(40)).astype(np.int64) % n_buckets,
                        pa.int64(),
                    ),
                }
            )

        return f

    tagged = old_ds.map_batches(project(0), batch_format="pyarrow").union(
        new_ds.map_batches(project(1), batch_format="pyarrow")
    )

    STATUS = np.array(["removed", "added", "changed", "same"], dtype=object)

    def classify(g: pa.Table) -> pa.Table:
        ids = g.column("doc_id").to_numpy()
        side = g.column("side").to_numpy()
        hi = g.column("h_hi").to_numpy()
        lo = g.column("h_lo").to_numpy()
        order = np.lexsort((side, ids))
        i, s = ids[order], side[order]
        h1, h2 = hi[order], lo[order]
        first = np.ones(len(i), dtype=bool)
        first[1:] = i[1:] != i[:-1]
        starts = np.flatnonzero(first)
        runlen = np.diff(np.append(starts, len(i)))
        # runlen == 1: present on one side only -> status by that side
        one = runlen == 1
        code = np.empty(len(starts), dtype=np.int64)
        code[one] = s[starts[one]]  # 0 -> removed, 1 -> added
        both = ~one
        bs = starts[both]
        same = (h1[bs] == h1[bs + 1]) & (h2[bs] == h2[bs + 1])
        code[both] = np.where(same, 3, 2)
        return pa.table(
            {
                "doc_id": pa.array(i[starts], pa.int64()),
                "status": pa.array(STATUS[code].tolist(), pa.string()),
            }
        )

    return (
        tagged.groupby("bucket")
        .map_groups(lambda g: classify(g.drop_columns(["bucket"])),
                    batch_format="pyarrow")
    )

"""Iterative graph algorithms over edge Datasets.

PageRank here is deliberately INTEGER fixed-point (ranks in 1e-9 units,
floor division everywhere): float PageRank sums in data-dependent order,
so no two engines agree bitwise — the integer formulation makes a fixed
iteration count exactly mirrorable in SQL (unrolled CTEs), the same trick
the quantile/median operators use to stay hash-identical under the gate.

Scale shape (broadcast variant): the rank vector (8 B x V) is ``ray.put``
once per iteration and every batch of edges contributes per-batch partial
(dst, sum) rows into a small ``groupby`` — edges stream, never
materialize.  Driver state is O(V); fine to ~10^8-10^9 nodes on a fat
driver node (the webtext case: V = hosts or documents, E = links >> V).
Past that, swap the broadcast for the repo's hash-bucket join pattern
(``pipelines/osm.py``) — two shuffles per iteration, documented fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pagerank_int(edges_ds, n_nodes: int, iters: int = 5,
                 damping_pct: int = 85, scale: int = 10**9,
                 src_col: str = "src", dst_col: str = "dst"):
    """Integer PageRank over dense node ids [0, n_nodes).

    r0 = scale // n;  each iteration:
      contrib(s->d) = r[s] // outdeg[s]
      r'[d] = (scale // n * (100 - damping_pct)) // 100
              + (damping_pct * sum(contrib into d)) // 100
    Dangling mass is dropped (standard simplification — mirrored in SQL).
    Returns a pandas DataFrame (node_id, rank) — V rows, driver-sized by
    design; wrap in ``ray.data.from_pandas`` if a Dataset is needed.
    """
    import ray
    from ray.data.aggregate import Sum

    base = (scale // n_nodes * (100 - damping_pct)) // 100

    deg_df = edges_ds.groupby(src_col).count().to_pandas()
    deg = np.zeros(n_nodes, dtype=np.int64)
    deg[deg_df[src_col].to_numpy()] = deg_df["count()"].to_numpy()

    ranks = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    for _ in range(iters):
        handle = ray.put((ranks, deg))

        def partial(batch: pa.Table) -> pa.Table:
            r, d = ray.get(handle)
            s = batch.column(src_col).to_numpy()
            t = batch.column(dst_col).to_numpy()
            c = r[s] // np.maximum(d[s], 1)
            agg = pd.DataFrame({"dst": t, "c": c}).groupby("dst", as_index=False)["c"].sum()
            return pa.table(
                {
                    "dst": pa.array(agg["dst"].to_numpy(), pa.int64()),
                    "c_part": pa.array(agg["c"].to_numpy(), pa.int64()),
                }
            )

        sums = (
            edges_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c_part", alias_name="c"))
            .to_pandas()
        )
        new = np.full(n_nodes, base, dtype=np.int64)
        if len(sums):
            idx = sums["dst"].to_numpy()
            new[idx] = base + damping_pct * sums["c"].to_numpy() // 100
        ranks = new
    return pd.DataFrame({"node_id": np.arange(n_nodes, dtype=np.int64),
                         "rank": ranks})

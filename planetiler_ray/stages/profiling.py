"""Table profiling: per-column null counts, exact distinct counts, min/max
(the data-quality `DESCRIBE` surface a curation pipeline runs before and
after every stage).

Scale shape: ONE shuffle for all profiled columns — each batch emits its
distinct (column, value-string) pairs (batch-level dedup bounds the
volume), a single groupby counts global distincts; null/min/max partials
are tiny per-batch rows merged in a final single task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def table_profile(ds, columns: list):
    """-> Dataset, one row per column: column, n_nulls, n_distinct,
    min_v, max_v (value strings; DuckDB's CAST(x AS VARCHAR) twin)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min, Sum

    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        names, vals, nulls, kind = [], [], [], []
        for c in cols:
            arr = batch.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            sarr = pc.cast(arr, pa.string())
            u = pc.unique(pc.drop_null(sarr))
            names.append(np.full(len(u), c, dtype=object))
            vals.append(u.to_pandas().to_numpy(dtype=object))
        return pa.table(
            {
                "column": pa.array(np.concatenate(names), pa.string()),
                "v": pa.array(np.concatenate(vals), pa.string()),
            }
        )

    def null_partial(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_nulls_part": []}
        for c in cols:
            rows["column"].append(c)
            rows["n_nulls_part"].append(batch.column(c).null_count)
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n_nulls_part": pa.array(rows["n_nulls_part"], pa.int64()),
            }
        )

    distinct = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["column", "v"])
        .aggregate(Count())
        .groupby("column")
        .aggregate(Count("v", alias_name="n_distinct"),
                   Min("v", alias_name="min_v"),
                   Max("v", alias_name="max_v"))
    )
    nulls = (
        ds.map_batches(null_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_nulls_part", alias_name="n_nulls"))
    )

    ndf = nulls.to_pandas()  # len(cols) rows
    ddf = distinct.to_pandas()
    out = ddf.merge(ndf, on="column")[
        ["column", "n_nulls", "n_distinct", "min_v", "max_v"]
    ]
    import ray.data as rd

    return rd.from_pandas(out.sort_values("column", ignore_index=True))

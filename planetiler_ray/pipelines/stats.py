"""Archive statistics — ``util/TilesetSummaryStatistics.java`` /
``util/TileSizeStats.java`` / ``util/LayerAttrStats.java`` analogues:
per-zoom tile counts + size percentiles, top-N biggest tiles, per-layer
attribute schema stats ("tilestats" metadata).

All computed as Dataset aggregations over the assembled tiles / tile rows —
partial per batch, tiny groupby over partials (no driver-side loops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Mean, Sum


def zoom_summary(tiles_ds) -> pd.DataFrame:
    """Per zoom: n_tiles, total/max/mean bytes (weighted avg like the
    reference's archive stats)."""
    out = (
        tiles_ds.groupby("z")
        .aggregate(
            Count(alias_name="n_tiles"),
            Sum("n_bytes", alias_name="total_bytes"),
            Max("n_bytes", alias_name="max_bytes"),
            Mean("n_bytes", alias_name="mean_bytes"),
            Sum("n_features", alias_name="n_features"),
        )
        .to_pandas()
        .sort_values("z", ignore_index=True)
    )
    return out


def biggest_tiles(tiles_ds, n: int = 10) -> pd.DataFrame:
    """Top-N tiles by encoded size (the reference's biggest-tiles report)."""
    return (
        tiles_ds.select_columns(["z", "tile_x", "tile_y", "n_bytes", "n_features"])
        .sort("n_bytes", descending=True)
        .limit(n)
        .to_pandas()
    )


def tile_weights_summary(tiles_ds) -> pd.DataFrame:
    """Traffic-weighted per-zoom archive stats — ``util/TileWeights.java``
    (weights.merge / getZoomWeight) + ``TilesetSummaryStatistics.java:162``
    (weighted average respecting weight-per-zoom) analogue.

    The reference downloads 90 days of openstreetmap.org tile-traffic logs
    (``TopOsmTiles``); with no network the weight is a deterministic
    synthetic stand-in computed FROM the tile address, so the oracle can
    mirror it exactly::

        weight(z, x, y) = ((x*73856093 + y*19349663 + z*83492791) % 997) + 1

    Output per zoom (exact int64, no division so the hash is stable):
    ``n_tiles``, ``weight_sum`` (the reference's per-zoom weight
    normalizer) and ``wfeat_sum`` = sum(weight * n_features) (the weighted
    numerator; the reference weights gzipped bytes, which are
    encode-dependent — feature counts are the SQL-mirrorable core).
    Partial per batch -> tiny groupby-sum: no driver loops, one small
    shuffle of ~n_zooms rows per block.
    """

    def partial(batch: pa.Table) -> pa.Table:
        z = batch.column("z").to_numpy().astype(np.int64)
        x = batch.column("tile_x").to_numpy().astype(np.int64)
        y = batch.column("tile_y").to_numpy().astype(np.int64)
        nf = batch.column("n_features").to_numpy().astype(np.int64)
        w = (x * 73856093 + y * 19349663 + z * 83492791) % 997 + 1
        uz, inv = np.unique(z, return_inverse=True)
        nt = np.bincount(inv).astype(np.int64)
        ws = np.zeros(len(uz), np.int64)
        np.add.at(ws, inv, w)
        wf = np.zeros(len(uz), np.int64)
        np.add.at(wf, inv, w * nf)
        return pa.table(
            {"z": pa.array(uz, pa.int64()),
             "nt_part": pa.array(nt, pa.int64()),
             "ws_part": pa.array(ws, pa.int64()),
             "wf_part": pa.array(wf, pa.int64())}
        )

    return (
        tiles_ds.select_columns(["z", "tile_x", "tile_y", "n_features"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("z")
        .aggregate(
            Sum("nt_part", alias_name="n_tiles"),
            Sum("ws_part", alias_name="weight_sum"),
            Sum("wf_part", alias_name="wfeat_sum"),
        )
        .to_pandas()
        .sort_values("z", ignore_index=True)
    )


def top_weighted_tiles(tiles_ds, k: int = 20):
    """The hot-tile report — ``util/TopOsmTiles.java`` analogue (the
    reference downloads 90-day OSM tile-traffic logs and keeps the top-N
    per zoom for :func:`tile_weights_summary`'s weighting; here the weight
    is the same deterministic synthetic stand-in so the ranking has an
    exact SQL twin).

    Scale shape: per-batch partial top-k under the FULL tie-break order
    (w desc, then z/x/y asc — a total order, so the global top-k set is
    unique), then one tiny sort+limit over n_blocks x k candidate rows —
    never a global sort of the tile table (the ``brute_topk`` pattern).
    """

    def partial(batch: pa.Table) -> pa.Table:
        z = batch.column("z").to_numpy().astype(np.int64)
        x = batch.column("tile_x").to_numpy().astype(np.int64)
        y = batch.column("tile_y").to_numpy().astype(np.int64)
        nf = batch.column("n_features").to_numpy().astype(np.int64)
        w = (x * 73856093 + y * 19349663 + z * 83492791) % 997 + 1
        order = np.lexsort((y, x, z, -w))[:k]
        return pa.table({
            "z": pa.array(z[order], pa.int64()),
            "tile_x": pa.array(x[order], pa.int64()),
            "tile_y": pa.array(y[order], pa.int64()),
            "w": pa.array(w[order], pa.int64()),
            "n_features": pa.array(nf[order], pa.int64()),
        })

    return (
        tiles_ds.select_columns(["z", "tile_x", "tile_y", "n_features"])
        .map_batches(partial, batch_format="pyarrow")
        .sort(["w", "z", "tile_x", "tile_y"],
              descending=[True, False, False, False])
        .limit(k)
    )


def layer_attr_stats(tile_rows_ds, attr_cols: list[str]) -> pd.DataFrame:
    """Per (layer, attribute): count + inferred type — LayerAttrStats'
    "tilestats" metadata.  Partial counts per batch, groupby-sum over
    partials."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        layer = batch.column("layer").to_pylist()
        rows = []
        for c in attr_cols:
            if c not in batch.column_names:
                continue
            col = batch.column(c)
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            typ = str(col.type)
            df = pd.DataFrame({"layer": layer, "valid": valid})
            g = df[df["valid"]].groupby("layer").size()
            for lname, cnt in g.items():
                rows.append((lname, c, typ, int(cnt)))
        if not rows:
            return pa.table(
                {"layer": pa.array([], pa.string()),
                 "attribute": pa.array([], pa.string()),
                 "type": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64())}
            )
        la, at, ty, np_ = zip(*rows)
        return pa.table(
            {"layer": pa.array(la, pa.string()),
             "attribute": pa.array(at, pa.string()),
             "type": pa.array(ty, pa.string()),
             "n_part": pa.array(np_, pa.int64())}
        )

    return (
        tile_rows_ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["layer", "attribute", "type"])
        .aggregate(Sum("n_part", alias_name="n_values"))
        .to_pandas()
    )


def archive_metadata(tiles_ds, profile, extra: dict | None = None) -> dict:
    """The metadata.json document written next to archives (tilestats)."""
    zs = zoom_summary(tiles_ds)
    big = biggest_tiles(tiles_ds, 10)
    return {
        "name": profile.name,
        "description": profile.description,
        "layers": list(profile.layers),
        "minzoom": int(zs["z"].min()) if len(zs) else 0,
        "maxzoom": int(zs["z"].max()) if len(zs) else 0,
        "tile_count": int(zs["n_tiles"].sum()) if len(zs) else 0,
        "total_bytes": int(zs["total_bytes"].sum()) if len(zs) else 0,
        "by_zoom": zs.to_dict(orient="records"),
        "biggest_tiles": big.to_dict(orient="records"),
        **(extra or {}),
    }

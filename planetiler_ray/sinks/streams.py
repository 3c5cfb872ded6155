"""Stream sinks: one line per tile for piping into other tools
(``stream/WriteableCsvArchive.java`` / ``WriteableJsonStreamArchive.java``
capability).  Embarrassingly parallel (``write_csv`` / ``write_json`` over the
tiles Dataset); tile bytes are base64.
"""

from __future__ import annotations

import base64

import pyarrow as pa


def _encode(batch: pa.Table) -> pa.Table:
    b64 = [
        base64.b64encode(b).decode("ascii")
        for b in batch.column("tile_gz").to_pylist()
    ]
    return pa.table(
        {
            "z": batch.column("z"),
            "x": batch.column("tile_x"),
            "y": batch.column("tile_y"),
            "encoded_data": pa.array(b64, pa.string()),
        }
    )


def write_csv_archive(tiles_ds, out_dir: str):
    """tiles -> CSV files (z, x, y, base64(tile))."""
    tiles_ds.map_batches(_encode, batch_format="pyarrow").write_csv(out_dir)


def write_json_archive(tiles_ds, out_dir: str):
    """tiles -> NDJSON files ({"z":..,"x":..,"y":..,"encoded_data":..})."""
    tiles_ds.map_batches(_encode, batch_format="pyarrow").write_json(out_dir)

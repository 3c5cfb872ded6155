"""MBTiles sink (sqlite, stdlib sqlite3 — no extra deps).

Semantics mirrored from the reference's ``mbtiles/Mbtiles.java:374,560-770``:
* schema: ``metadata(name, value)`` + tiles addressed as
  (zoom_level, tile_column, tile_row) with the TMS y-flip
  (``row = 2^z - 1 - y``);
* batched prepared inserts;
* optional COMPACT mode: ``tiles`` becomes a view over ``tiles_shallow`` (map)
  + ``tiles_data`` (images) deduplicating identical tile blobs by content
  hash — the ocean-tile dedup.

SQLite is inherently single-writer, so (like the reference's writer thread,
``TileArchiveWriter.java:436-484``) this sink consumes the tiles Dataset ON
THE DRIVER via ``iter_batches`` — streaming, bounded memory, but serial.  At
cluster scale you shard into one MBTiles per tile-range partition (the files
sink is the parallel path); this sink exists for archive-format parity.
"""

from __future__ import annotations

import json
import sqlite3

import numpy as np


class MBTiles:
    def __init__(self, path: str, compact: bool = True):
        self.conn = sqlite3.connect(path)
        self.compact = compact
        c = self.conn
        c.execute("PRAGMA synchronous=OFF")
        c.execute("PRAGMA journal_mode=MEMORY")
        c.execute("CREATE TABLE IF NOT EXISTS metadata (name TEXT, value TEXT)")
        if compact:
            c.execute(
                "CREATE TABLE IF NOT EXISTS tiles_shallow ("
                " zoom_level INTEGER, tile_column INTEGER, tile_row INTEGER,"
                " tile_data_id INTEGER,"
                " PRIMARY KEY (zoom_level, tile_column, tile_row)) WITHOUT ROWID"
            )
            c.execute(
                "CREATE TABLE IF NOT EXISTS tiles_data ("
                " tile_data_id INTEGER PRIMARY KEY, tile_data BLOB)"
            )
            c.execute(
                "CREATE VIEW IF NOT EXISTS tiles AS SELECT zoom_level, tile_column,"
                " tile_row, tile_data FROM tiles_shallow JOIN tiles_data USING (tile_data_id)"
            )
        else:
            c.execute(
                "CREATE TABLE IF NOT EXISTS tiles (zoom_level INTEGER,"
                " tile_column INTEGER, tile_row INTEGER, tile_data BLOB,"
                " PRIMARY KEY (zoom_level, tile_column, tile_row)) WITHOUT ROWID"
            )
        self._hash_to_id: dict[int, int] = {}
        self._next_data_id = 1

    def put_metadata(self, meta: dict):
        self.conn.executemany(
            "INSERT INTO metadata (name, value) VALUES (?, ?)",
            [(k, v if isinstance(v, str) else json.dumps(v)) for k, v in meta.items()],
        )

    def write_batch(self, zs, xs, ys, blobs, hashes):
        """Insert one batch (TMS flip applied here)."""
        rows_shallow = []
        rows_data = []
        for z, x, y, blob, h in zip(zs, xs, ys, blobs, hashes):
            tms_row = (1 << int(z)) - 1 - int(y)
            if self.compact:
                h = int(h)
                data_id = self._hash_to_id.get(h)
                if data_id is None:
                    data_id = self._next_data_id
                    self._next_data_id += 1
                    self._hash_to_id[h] = data_id
                    rows_data.append((data_id, blob))
                rows_shallow.append((int(z), int(x), tms_row, data_id))
            else:
                rows_shallow.append((int(z), int(x), tms_row, blob))
        if self.compact:
            if rows_data:
                self.conn.executemany(
                    "INSERT INTO tiles_data (tile_data_id, tile_data) VALUES (?, ?)",
                    rows_data,
                )
            self.conn.executemany(
                "INSERT INTO tiles_shallow (zoom_level, tile_column, tile_row,"
                " tile_data_id) VALUES (?, ?, ?, ?)",
                rows_shallow,
            )
        else:
            self.conn.executemany(
                "INSERT INTO tiles (zoom_level, tile_column, tile_row, tile_data)"
                " VALUES (?, ?, ?, ?)",
                rows_shallow,
            )

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        row = (1 << z) - 1 - y
        cur = self.conn.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level=? AND tile_column=?"
            " AND tile_row=?",
            (z, x, row),
        ).fetchone()
        return None if cur is None else cur[0]

    def close(self):
        self.conn.commit()
        self.conn.close()


def write_mbtiles(tiles_ds, path: str, metadata: dict | None = None,
                  compact: bool = True) -> dict:
    """Stream a tiles Dataset (tile_id, z, tile_x, tile_y, tile_gz,
    content_hash, ...) into an MBTiles file.  Returns summary stats."""
    db = MBTiles(path, compact=compact)
    meta = {
        "name": "planetiler_ray", "format": "pbf", "type": "baselayer",
        "version": "1", "minzoom": "0", "maxzoom": "14",
        "bounds": "-180,-85.05113,180,85.05113", "center": "0,0,0",
        "compression": "gzip",
    }
    meta.update(metadata or {})
    db.put_metadata(meta)
    n = 0
    total = 0
    for batch in tiles_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        zs = batch.column("z").to_numpy()
        xs = batch.column("tile_x").to_numpy()
        ys = batch.column("tile_y").to_numpy()
        blobs = batch.column("tile_gz").to_pylist()
        hashes = batch.column("content_hash").to_numpy()
        db.write_batch(zs, xs, ys, blobs, hashes)
        n += len(zs)
        total += int(sum(len(b) for b in blobs))
    unique = db._next_data_id - 1 if compact else n
    db.close()
    return {"n_tiles": n, "n_bytes": total, "n_unique_blobs": unique}

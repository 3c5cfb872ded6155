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
                  compact: bool = True, parallel: bool = True) -> dict:
    """Stream a tiles Dataset (tile_id, z, tile_x, tile_y, tile_gz,
    content_hash, ...) into an MBTiles file.  Returns summary stats.

    ``parallel=True`` (compact mode only): per-range packing (local blob
    dedup, TMS flip, column flattening) runs as a vectorized
    ``map_batches`` stage; the single sqlite writer only resolves
    cross-range blob ids over UNIQUE hashes and bulk-inserts pre-packed
    arrays — same split as the PMTiles packer (sqlite stays the one
    writer, like the reference's ``TileArchiveWriter`` thread)."""
    if parallel and compact:
        return _write_mbtiles_parallel(tiles_ds, path, metadata)
    db = MBTiles(path, compact=compact)
    db.put_metadata(_default_meta(metadata))
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


def _default_meta(metadata: dict | None) -> dict:
    meta = {
        "name": "planetiler_ray", "format": "pbf", "type": "baselayer",
        "version": "1", "minzoom": "0", "maxzoom": "14",
        "bounds": "-180,-85.05113,180,85.05113", "center": "0,0,0",
        "compression": "gzip",
    }
    meta.update(metadata or {})
    return meta


def _pack_mbt_range(batch):
    """One output row per input batch: locally-deduped blobs
    (first-occurrence order) + flattened (z, x, tms_row, local_idx)
    arrays — all the per-tile Python work, off the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = ("n", "total", "uhash", "ulen", "data", "z", "x", "row", "li")
    n = batch.num_rows
    if n == 0:
        return pa.table({c: pa.array(
            [], pa.large_binary() if c not in ("n", "total") else pa.int64())
            for c in cols})
    zs = batch.column("z").to_numpy().astype(np.int64)
    xs = batch.column("tile_x").to_numpy().astype(np.int64)
    ys = batch.column("tile_y").to_numpy().astype(np.int64)
    tms = (np.int64(1) << zs) - 1 - ys
    hashes = batch.column("content_hash").to_numpy()
    if hashes.dtype != np.int64:
        hashes = hashes.view(np.int64)
    arr = batch.column("tile_gz").combine_chunks()
    lens_all = pc.binary_length(arr).to_numpy().astype(np.int64)
    uniqvals, first_idx, inv_idx = np.unique(
        hashes, return_index=True, return_inverse=True)
    occ = np.argsort(first_idx, kind="stable")
    sel = first_idx[occ]
    rank = np.empty(len(uniqvals), np.int64)
    rank[occ] = np.arange(len(occ))
    local_idx = rank[inv_idx]
    data = b"".join(arr.take(pa.array(sel, pa.int64())).to_pylist())
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "total": pa.array([int(lens_all.sum())], pa.int64()),
        "uhash": pa.array([uniqvals[occ].tobytes()], pa.large_binary()),
        "ulen": pa.array([lens_all[sel].tobytes()], pa.large_binary()),
        "data": pa.array([data], pa.large_binary()),
        "z": pa.array([zs.tobytes()], pa.large_binary()),
        "x": pa.array([xs.tobytes()], pa.large_binary()),
        "row": pa.array([tms.tobytes()], pa.large_binary()),
        "li": pa.array([local_idx.tobytes()], pa.large_binary()),
    })


def _write_mbtiles_parallel(tiles_ds, path: str,
                            metadata: dict | None = None,
                            range_rows: int = 65536) -> dict:
    db = MBTiles(path, compact=True)
    db.put_metadata(_default_meta(metadata))
    conn = db.conn
    hash_to_id = db._hash_to_id
    next_id = 1
    n = 0
    total = 0
    packed = tiles_ds.map_batches(_pack_mbt_range, batch_format="pyarrow",
                                  batch_size=range_rows)
    for b in packed.iter_batches(batch_size=None, batch_format="pyarrow"):
        for i in range(b.num_rows):
            rows_n = int(b.column("n")[i].as_py())
            if rows_n == 0:
                continue
            n += rows_n
            total += int(b.column("total")[i].as_py())
            uhash = np.frombuffer(b.column("uhash")[i].as_py(), np.int64)
            ulen = np.frombuffer(b.column("ulen")[i].as_py(), np.int64)
            data = b.column("data")[i].as_py()
            loc_off = np.cumsum(ulen) - ulen
            gids = np.empty(len(uhash), np.int64)
            new_rows = []
            mv = memoryview(data)
            for j in range(len(uhash)):
                got = hash_to_id.get(int(uhash[j]))
                if got is None:
                    got = next_id
                    next_id += 1
                    hash_to_id[int(uhash[j])] = got
                    new_rows.append(
                        (got, mv[int(loc_off[j]):int(loc_off[j] + ulen[j])]))
                gids[j] = got
            if new_rows:
                conn.executemany(
                    "INSERT INTO tiles_data (tile_data_id, tile_data)"
                    " VALUES (?, ?)", new_rows)
            zs = np.frombuffer(b.column("z")[i].as_py(), np.int64)
            xs = np.frombuffer(b.column("x")[i].as_py(), np.int64)
            rows = np.frombuffer(b.column("row")[i].as_py(), np.int64)
            li = np.frombuffer(b.column("li")[i].as_py(), np.int64)
            ids = gids[li]
            conn.executemany(
                "INSERT INTO tiles_shallow (zoom_level, tile_column,"
                " tile_row, tile_data_id) VALUES (?, ?, ?, ?)",
                zip(zs.tolist(), xs.tolist(), rows.tolist(), ids.tolist()))
    db._next_data_id = next_id
    db.close()
    return {"n_tiles": n, "n_bytes": total, "n_unique_blobs": next_id - 1}

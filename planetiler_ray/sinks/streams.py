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


# ------------------------------------------------------ proto stream sink --

# Hand-rolled protobuf for the reference's stream-archive schema
# (``planetiler-core/src/main/proto/stream_archive_proto.proto`` +
# ``stream/WriteableProtoStreamArchive.java``): length-delimited Entry
# messages — Entry{tile=1|initialization=2|finish=3}, TileEntry{x=1,y=2,z=3,
# encoded_data=4}, FinishEntry{metadata=1}, Metadata{name=1,...,min_zoom=9,
# max_zoom=10,tile_compression=13}.  Wire format per the public protobuf
# encoding spec; primitives shared with the MVT codec.

from ..geo.mvt import _field, _len_delim, _read_varint, _varint  # noqa: E402

TILE_COMPRESSION_GZIP = 1


def _tile_entry(x: int, y: int, z: int, data: bytes) -> bytes:
    body = bytearray()
    if x:
        body += _field(1, 0) + _varint(x)
    if y:
        body += _field(2, 0) + _varint(y)
    if z:
        body += _field(3, 0) + _varint(z)
    body += _len_delim(4, data)
    return _len_delim(1, bytes(body))  # Entry.tile = 1


def _metadata_msg(meta: dict) -> bytes:
    m = bytearray()
    for field_no, key in ((1, "name"), (2, "description"), (3, "attribution"),
                          (4, "version"), (5, "type"), (6, "format")):
        v = meta.get(key)
        if v:
            m += _len_delim(field_no, str(v).encode("utf-8"))
    if "min_zoom" in meta:
        m += _field(9, 0) + _varint(int(meta["min_zoom"]))
    if "max_zoom" in meta:
        m += _field(10, 0) + _varint(int(meta["max_zoom"]))
    m += _field(13, 0) + _varint(TILE_COMPRESSION_GZIP)
    return bytes(m)


def write_proto_stream(tiles_ds, path: str, metadata: dict | None = None) -> int:
    """Stream tiles into ONE length-delimited proto file: initialization
    entry, one TileEntry per tile, finish entry with metadata.  The stream
    format is inherently single-consumer/ordered, so the driver streams
    batches (``iter_batches``) — for the cluster-scale layout use
    :func:`write_proto_stream_shards`.  Returns the number of tiles."""
    n = 0
    with open(path, "wb") as f:
        f.write(_varint(0))  # initialization: empty Entry, length-delimited
        for batch in tiles_ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
            xs = batch.column("tile_x").to_numpy()
            ys = batch.column("tile_y").to_numpy()
            zs = batch.column("z").to_numpy()
            blobs = batch.column("tile_gz").to_pylist()
            for x, y, z, blob in zip(xs, ys, zs, blobs):
                msg = _tile_entry(int(x), int(y), int(z), blob)
                f.write(_varint(len(msg)))
                f.write(msg)
                n += 1
        fin = _len_delim(3, _len_delim(1, _metadata_msg(metadata or {})))
        f.write(_varint(len(fin)))
        f.write(fin)
    return n


def write_proto_stream_shards(tiles_ds, out_dir: str, n_shards: int = 64):
    """Sharded proto streams (one file per hash shard, written in parallel
    from the workers via ``map_groups`` — the scale path; each shard is a
    valid stream minus the init/finish framing, as the reference's
    ``--tile-write-threads`` secondary files also are).  Executes EAGERLY
    and returns the per-shard summary Dataset (already materialized —
    a lazy return would silently write nothing if discarded)."""
    import os

    import numpy as np
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        s = batch.column("tile_id").to_numpy() % n_shards
        return batch.append_column("shard", pa.array(s, pa.int64()))

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        shard = int(g["shard"].iloc[0])
        with open(f"{out_dir}/shard-{shard:05d}.pbstream", "wb") as f:
            for x, y, z, blob in zip(g["tile_x"], g["tile_y"], g["z"], g["tile_gz"]):
                msg = _tile_entry(int(x), int(y), int(z), blob)
                f.write(_varint(len(msg)))
                f.write(msg)
        return pd.DataFrame({"shard": [shard], "n_tiles": [len(g)]})

    return (
        tiles_ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .materialize()
    )


def read_proto_stream(path: str):
    """Generator over a proto stream file: yields ("init", None),
    ("tile", (x, y, z, data)), ("finish", metadata_dict) — the parsing shape
    of the reference's documented consumer loop."""
    buf = memoryview(open(path, "rb").read())
    off = 0
    while off < len(buf):
        size, off = _read_varint(buf, off)
        msg = buf[off : off + size]
        off += size
        if size == 0:
            yield "init", None
            continue
        moff = 0
        while moff < len(msg):
            tag, moff = _read_varint(msg, moff)
            field_no, wire = tag >> 3, tag & 7
            ln, moff = _read_varint(msg, moff)
            payload = msg[moff : moff + ln]
            moff += ln
            if field_no == 1:  # TileEntry
                x = y = z = 0
                data = b""
                poff = 0
                while poff < len(payload):
                    t2, poff = _read_varint(payload, poff)
                    f2, w2 = t2 >> 3, t2 & 7
                    if w2 == 0:
                        v, poff = _read_varint(payload, poff)
                        if f2 == 1:
                            x = v
                        elif f2 == 2:
                            y = v
                        elif f2 == 3:
                            z = v
                    else:
                        l2, poff = _read_varint(payload, poff)
                        if f2 == 4:
                            data = bytes(payload[poff : poff + l2])
                        poff += l2
                yield "tile", (x, y, z, data)
            elif field_no == 2:
                yield "init", None
            elif field_no == 3:  # FinishEntry{metadata=1}
                meta: dict = {}
                poff = 0
                while poff < len(payload):
                    t2, poff = _read_varint(payload, poff)
                    f2, w2 = t2 >> 3, t2 & 7
                    l2, poff = _read_varint(payload, poff)
                    sub = payload[poff : poff + l2]
                    poff += l2
                    if f2 == 1:
                        soff = 0
                        names = {1: "name", 2: "description", 3: "attribution",
                                 4: "version", 5: "type", 6: "format"}
                        while soff < len(sub):
                            t3, soff = _read_varint(sub, soff)
                            f3, w3 = t3 >> 3, t3 & 7
                            if w3 == 0:
                                v, soff = _read_varint(sub, soff)
                                if f3 == 9:
                                    meta["min_zoom"] = v
                                elif f3 == 10:
                                    meta["max_zoom"] = v
                                elif f3 == 13:
                                    meta["tile_compression"] = v
                            else:
                                l3, soff = _read_varint(sub, soff)
                                if f3 in names:
                                    meta[names[f3]] = bytes(sub[soff : soff + l3]).decode("utf-8")
                                soff += l3
                yield "finish", meta

"""PMTiles v3 sink + reader (single-file, Hilbert-clustered archive).

Implements the public PMTiles v3 spec (github.com/protomaps/PMTiles):
127-byte header, gzipped root directory (varint-encoded: tile-id deltas,
run lengths, lengths, offsets), gzipped JSON metadata, leaf directories
(when needed), then tile data.  Mirrors the reference's
``pmtiles/WriteablePmtiles.java`` capabilities: Hilbert tile ordering +
content dedup (identical blobs share one data range).

The global Hilbert order is produced by the upstream Dataset sort (the same
distributed sort the reference does with ExternalMergeSort); the writer
itself streams on the driver (single file = single writer, like the
reference).  PMTiles tile ids are the standard z-offset + per-zoom Hilbert
index — our ``geo.tile.encode_tile_id(..., HILBERT)`` layout matches.
"""

from __future__ import annotations

import gzip
import json
import struct

import numpy as np

from ..geo import tile as T

MAGIC = b"PMTiles"
SPEC_VERSION = 3
HEADER_LEN = 127

TILE_TYPE_MVT = 1
COMPRESSION_GZIP = 2


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf, off):
    shift = val = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def serialize_directory(entries: list[tuple[int, int, int, int]]) -> bytes:
    """entries: (tile_id, offset, length, run_length), sorted by tile_id."""
    out = bytearray(_varint(len(entries)))
    last = 0
    for tid, _, _, _ in entries:
        out += _varint(tid - last)
        last = tid
    for _, _, _, rl in entries:
        out += _varint(rl)
    for _, _, ln, _ in entries:
        out += _varint(ln)
    prev_off = prev_len = None
    for _, off, ln, _ in entries:
        if prev_off is not None and off == prev_off + prev_len:
            out += _varint(0)
        else:
            out += _varint(off + 1)
        prev_off, prev_len = off, ln
    return bytes(out)


def _varints_np(vals: np.ndarray) -> bytes:
    """Vectorized LEB128 varint stream — byte-identical to mapping
    :func:`_varint` over ``vals`` (the parallel packer's serializer)."""
    v = vals.astype(np.uint64)
    n = len(v)
    if n == 0:
        return b""
    nb = np.ones(n, np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1 << (7 * k))).astype(np.int64)
    pos = np.cumsum(nb) - nb
    out = np.zeros(int(nb.sum()), np.uint8)
    rem = v.copy()
    for k in range(10):
        m = nb > k
        if not m.any():
            break
        byte = (rem[m] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nb[m] > k + 1).astype(np.uint8)
        out[pos[m] + k] = byte | (cont << 7)
        rem[m] >>= np.uint64(7)
    return out.tobytes()


def serialize_directory_arrays(tids: np.ndarray, offs: np.ndarray,
                               lens: np.ndarray, rls: np.ndarray) -> bytes:
    """Vectorized :func:`serialize_directory` over int64 arrays —
    byte-identical output (differential-tested)."""
    n = len(tids)
    out = bytearray(_varint(n))
    if n == 0:
        return bytes(out)
    deltas = np.empty(n, np.int64)
    deltas[0] = tids[0]
    deltas[1:] = tids[1:] - tids[:-1]
    out += _varints_np(deltas)
    out += _varints_np(rls)
    out += _varints_np(lens)
    # offset stream: 0 = contiguous with previous entry, else offset + 1
    enc = offs + 1
    contig = np.zeros(n, dtype=bool)
    contig[1:] = offs[1:] == offs[:-1] + lens[:-1]
    enc[contig] = 0
    out += _varints_np(enc)
    return bytes(out)


def deserialize_directory(data: bytes) -> list[tuple[int, int, int, int]]:
    n, off = _read_varint(data, 0)
    tids, rls, lens, offs = [], [], [], []
    last = 0
    for _ in range(n):
        d, off = _read_varint(data, off)
        last += d
        tids.append(last)
    for _ in range(n):
        v, off = _read_varint(data, off)
        rls.append(v)
    for _ in range(n):
        v, off = _read_varint(data, off)
        lens.append(v)
    prev_off = prev_len = 0
    for i in range(n):
        v, off = _read_varint(data, off)
        if v == 0:
            o = prev_off + prev_len
        else:
            o = v - 1
        offs.append(o)
        prev_off, prev_len = o, lens[i]
    return list(zip(tids, offs, lens, rls))


def _header(root_off, root_len, meta_off, meta_len, leaf_off, leaf_len,
            data_off, data_len, n_addressed, n_entries, n_contents,
            min_zoom, max_zoom,
            bounds_e7=(-180_0000000, -85_0000000, 180_0000000, 85_0000000)) -> bytes:
    h = bytearray(HEADER_LEN)
    h[0:7] = MAGIC
    h[7] = SPEC_VERSION
    struct.pack_into("<Q", h, 8, root_off)
    struct.pack_into("<Q", h, 16, root_len)
    struct.pack_into("<Q", h, 24, meta_off)
    struct.pack_into("<Q", h, 32, meta_len)
    struct.pack_into("<Q", h, 40, leaf_off)
    struct.pack_into("<Q", h, 48, leaf_len)
    struct.pack_into("<Q", h, 56, data_off)
    struct.pack_into("<Q", h, 64, data_len)
    struct.pack_into("<Q", h, 72, n_addressed)
    struct.pack_into("<Q", h, 80, n_entries)
    struct.pack_into("<Q", h, 88, n_contents)
    h[96] = 1  # clustered (tile data is in hilbert order)
    h[97] = COMPRESSION_GZIP  # internal compression
    h[98] = COMPRESSION_GZIP  # tile compression
    h[99] = TILE_TYPE_MVT
    h[100] = min_zoom
    h[101] = max_zoom
    # bounds (E7 ints) from actual tile coverage; center = bounds midpoint
    struct.pack_into("<i", h, 102, bounds_e7[0])
    struct.pack_into("<i", h, 106, bounds_e7[1])
    struct.pack_into("<i", h, 110, bounds_e7[2])
    struct.pack_into("<i", h, 114, bounds_e7[3])
    h[118] = min_zoom  # center zoom
    struct.pack_into("<i", h, 119, (bounds_e7[0] + bounds_e7[2]) // 2)
    struct.pack_into("<i", h, 123, (bounds_e7[1] + bounds_e7[3]) // 2)
    return bytes(h)


MAX_ROOT_ENTRIES = 16384


def write_pmtiles(tiles_ds, path: str, metadata: dict | None = None,
                  parallel: bool = True) -> dict:
    """Stream a tiles Dataset into a PMTiles v3 file.

    ``parallel=True`` (default): per-Hilbert-range packing runs as a
    vectorized ``map_batches`` stage (local blob dedup, run-length entry
    detection, bbox/zoom partials) and the driver only resolves
    cross-range blob dedup + streams pre-packed bytes — the SURVEY §7.1
    step-6 split (parallel encode, sequential packer, like the
    reference's ``TileArchiveWriter.java:436-484`` ordered writer fed by
    parallel encoders).  Byte-identical to the serial path
    (differential-tested).  ``parallel=False``: the original per-tile
    driver loop.
    """
    if parallel:
        return _write_pmtiles_parallel(tiles_ds, path, metadata)
    return _write_pmtiles_serial(tiles_ds, path, metadata)


def _write_pmtiles_serial(tiles_ds, path: str,
                          metadata: dict | None = None) -> dict:
    """Single-driver-loop packer (the differential reference for
    :func:`_write_pmtiles_parallel`).

    The Dataset is sorted by Hilbert tile id via the distributed sort
    (``ds.sort``) — the driver then streams batches in order, dedups blobs by
    content hash, and packs directories.
    """
    hl = tiles_ds.map_batches(_add_hilbert, batch_format="pyarrow").sort("hilbert_id")
    entries: list[tuple[int, int, int, int]] = []
    blob_off: dict[int, tuple[int, int]] = {}
    data = bytearray()
    n_addressed = 0
    minz, maxz = 99, 0
    wx0 = wy0 = 1.0  # world-coordinate coverage box (y down)
    wx1 = wy1 = 0.0
    for batch in hl.iter_batches(batch_size=4096, batch_format="pyarrow"):
        hids = batch.column("hilbert_id").to_numpy()
        blobs = batch.column("tile_gz").to_pylist()
        hashes = batch.column("content_hash").to_numpy()
        zs = batch.column("z").to_numpy()
        if len(zs):
            inv = 1.0 / (1 << zs.astype(np.int64))
            txs = batch.column("tile_x").to_numpy() * inv
            tys = batch.column("tile_y").to_numpy() * inv
            wx0 = min(wx0, float(txs.min()))
            wx1 = max(wx1, float((txs + inv).max()))
            wy0 = min(wy0, float(tys.min()))
            wy1 = max(wy1, float((tys + inv).max()))
        for hid, blob, h, z in zip(hids, blobs, hashes, zs):
            n_addressed += 1
            minz, maxz = min(minz, int(z)), max(maxz, int(z))
            loc = blob_off.get(int(h))
            if loc is None:
                loc = (len(data), len(blob))
                data += blob
                blob_off[int(h)] = loc
            off, ln = loc
            if entries and entries[-1][1] == off and entries[-1][0] + entries[-1][3] == hid:
                # extend run of identical consecutive tiles
                tid0, o0, l0, rl = entries[-1]
                entries[-1] = (tid0, o0, l0, rl + 1)
            else:
                entries.append((int(hid), off, ln, 1))
    # directories
    meta_gz = gzip.compress(json.dumps(metadata or {"name": "planetiler_ray"}).encode(), mtime=0)
    if len(entries) <= MAX_ROOT_ENTRIES:
        root = gzip.compress(serialize_directory(entries), mtime=0)
        leaves = b""
        n_root = len(entries)
    else:
        # split into leaf directories of 8k entries; root points at leaves
        leaf_dirs = []
        root_entries = []
        leaf_bytes = bytearray()
        for i in range(0, len(entries), 8192):
            chunk = entries[i : i + 8192]
            ser = gzip.compress(serialize_directory(chunk), mtime=0)
            root_entries.append((chunk[0][0], len(leaf_bytes), len(ser), 0))
            leaf_bytes += ser
            leaf_dirs.append(ser)
        root = gzip.compress(serialize_directory(root_entries), mtime=0)
        leaves = bytes(leaf_bytes)
        n_root = len(root_entries)
    root_off = HEADER_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_gz)
    data_off = leaf_off + len(leaves)
    if n_addressed:
        from ..geo import mercator

        bounds_e7 = (
            int(round(mercator.world_x_to_lon(wx0) * 1e7)),
            int(round(mercator.world_y_to_lat(wy1) * 1e7)),  # y down: wy1 = south
            int(round(mercator.world_x_to_lon(wx1) * 1e7)),
            int(round(mercator.world_y_to_lat(wy0) * 1e7)),
        )
    else:
        bounds_e7 = (-180_0000000, -85_0000000, 180_0000000, 85_0000000)
    header = _header(root_off, len(root), meta_off, len(meta_gz), leaf_off,
                     len(leaves), data_off, len(data), n_addressed,
                     len(entries), len(blob_off), minz if n_addressed else 0, maxz,
                     bounds_e7=bounds_e7)
    with open(path, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta_gz)
        f.write(leaves)
        f.write(data)
    return {
        "n_tiles": n_addressed,
        "n_entries": len(entries),
        "n_unique_blobs": len(blob_off),
        "n_bytes": len(data),
    }


def _add_hilbert(batch):
    import pyarrow as pa

    hid = T.convert_tile_id(batch.column("tile_id").to_numpy(), T.XYZ, T.HILBERT)
    return batch.append_column("hilbert_id", pa.array(hid, pa.int64()))


_PACK_SCHEMA_COLS = ("n_addressed", "minz", "maxz", "wx0", "wx1", "wy0",
                     "wy1", "uhash", "ulen", "data", "etid", "ebi", "elen",
                     "erl")


def _pack_range(batch) -> "pa.Table":
    """Vectorized per-range packer: one output ROW per sorted input batch —
    locally-deduped blob bytes (first-occurrence order), run-length entry
    arrays (the serial writer's extension rule, vectorized), bbox/zoom
    partials.  The driver stream only touches range summaries."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = batch.num_rows
    if n == 0:
        return pa.table({c: pa.array([], pa.large_binary()
                                     if c in ("uhash", "ulen", "data", "etid",
                                              "ebi", "elen", "erl")
                                     else (pa.float64() if c.startswith("w")
                                           else pa.int64()))
                         for c in _PACK_SCHEMA_COLS})
    hids = batch.column("hilbert_id").to_numpy()
    hashes = batch.column("content_hash").to_numpy()
    if hashes.dtype != np.int64:
        hashes = hashes.view(np.int64)
    arr = batch.column("tile_gz").combine_chunks()
    lens_all = pc.binary_length(arr).to_numpy().astype(np.int64)
    zs = batch.column("z").to_numpy().astype(np.int64)
    inv = 1.0 / (1 << zs)
    txs = batch.column("tile_x").to_numpy() * inv
    tys = batch.column("tile_y").to_numpy() * inv

    uniqvals, first_idx, inv_idx = np.unique(
        hashes, return_index=True, return_inverse=True)
    occ = np.argsort(first_idx, kind="stable")   # occurrence order
    sel = first_idx[occ]
    rank = np.empty(len(uniqvals), np.int64)
    rank[occ] = np.arange(len(occ))
    local_idx = rank[inv_idx]
    data = b"".join(arr.take(pa.array(sel, pa.int64())).to_pylist())

    brk = np.ones(n, dtype=bool)
    brk[1:] = (local_idx[1:] != local_idx[:-1]) | (hids[1:] != hids[:-1] + 1)
    starts = np.flatnonzero(brk)
    rl = np.diff(np.append(starts, n))
    return pa.table({
        "n_addressed": pa.array([n], pa.int64()),
        "minz": pa.array([int(zs.min())], pa.int64()),
        "maxz": pa.array([int(zs.max())], pa.int64()),
        "wx0": pa.array([float(txs.min())], pa.float64()),
        "wx1": pa.array([float((txs + inv).max())], pa.float64()),
        "wy0": pa.array([float(tys.min())], pa.float64()),
        "wy1": pa.array([float((tys + inv).max())], pa.float64()),
        "uhash": pa.array([uniqvals[occ].tobytes()], pa.large_binary()),
        "ulen": pa.array([lens_all[sel].tobytes()], pa.large_binary()),
        "data": pa.array([data], pa.large_binary()),
        "etid": pa.array([hids[starts].tobytes()], pa.large_binary()),
        "ebi": pa.array([local_idx[starts].tobytes()], pa.large_binary()),
        "elen": pa.array([lens_all[starts].tobytes()], pa.large_binary()),
        "erl": pa.array([rl.astype(np.int64).tobytes()], pa.large_binary()),
    })


def _write_pmtiles_parallel(tiles_ds, path: str, metadata: dict | None = None,
                            range_rows: int = 65536) -> dict:
    """Parallel-encode / sequential-pack PMTiles writer (byte-identical to
    :func:`_write_pmtiles_serial`): ranges of the Hilbert-sorted stream are
    packed in parallel workers; the driver resolves cross-range blob dedup
    over UNIQUE hashes only, merges boundary runs, appends pre-packed data
    bytes to a temp file, and serializes directories with the vectorized
    varint kernel."""
    import os
    import shutil

    hl = (tiles_ds.map_batches(_add_hilbert, batch_format="pyarrow")
          .sort("hilbert_id")
          .map_batches(_pack_range, batch_format="pyarrow",
                       batch_size=range_rows))
    tmp = path + ".data.tmp"
    blob_off: dict[int, int] = {}
    e_tid: list[np.ndarray] = []
    e_off: list[np.ndarray] = []
    e_len: list[np.ndarray] = []
    e_rl: list[np.ndarray] = []
    last = None  # pending (tid, off, ln, rl) — may extend across ranges
    data_pos = 0
    n_addressed = 0
    minz, maxz = 99, 0
    wx0 = wy0 = 1.0
    wx1 = wy1 = 0.0
    with open(tmp, "wb") as df:
        for b in hl.iter_batches(batch_size=None, batch_format="pyarrow"):
            for i in range(b.num_rows):
                n_addr = int(b.column("n_addressed")[i].as_py())
                if n_addr == 0:
                    continue
                n_addressed += n_addr
                minz = min(minz, int(b.column("minz")[i].as_py()))
                maxz = max(maxz, int(b.column("maxz")[i].as_py()))
                wx0 = min(wx0, float(b.column("wx0")[i].as_py()))
                wx1 = max(wx1, float(b.column("wx1")[i].as_py()))
                wy0 = min(wy0, float(b.column("wy0")[i].as_py()))
                wy1 = max(wy1, float(b.column("wy1")[i].as_py()))
                uhash = np.frombuffer(b.column("uhash")[i].as_py(), np.int64)
                ulen = np.frombuffer(b.column("ulen")[i].as_py(), np.int64)
                data = b.column("data")[i].as_py()
                tid = np.frombuffer(b.column("etid")[i].as_py(), np.int64)
                bi = np.frombuffer(b.column("ebi")[i].as_py(), np.int64)
                eln = np.frombuffer(b.column("elen")[i].as_py(), np.int64)
                erl = np.frombuffer(b.column("erl")[i].as_py(), np.int64)

                # cross-range dedup over UNIQUE blobs only
                loc_off = np.cumsum(ulen) - ulen
                goffs = np.empty(len(uhash), np.int64)
                spans: list[list[int]] = []  # coalesced new-blob byte spans
                for j in range(len(uhash)):
                    got = blob_off.get(int(uhash[j]))
                    if got is None:
                        blob_off[int(uhash[j])] = data_pos
                        goffs[j] = data_pos
                        data_pos += int(ulen[j])
                        ls, le = int(loc_off[j]), int(loc_off[j] + ulen[j])
                        if spans and spans[-1][1] == ls:
                            spans[-1][1] = le
                        else:
                            spans.append([ls, le])
                    else:
                        goffs[j] = got
                mv = memoryview(data)
                for ls, le in spans:
                    df.write(mv[ls:le])

                eoff = goffs[bi]
                # boundary run merge with the pending entry (the serial
                # writer's extension rule across range edges)
                if (last is not None and len(tid)
                        and eoff[0] == last[1]
                        and last[0] + last[3] == tid[0]):
                    last = (last[0], last[1], last[2], last[3] + int(erl[0]))
                    tid, eoff, eln, erl = tid[1:], eoff[1:], eln[1:], erl[1:]
                if len(tid):
                    if last is not None:
                        e_tid.append(np.array([last[0]], np.int64))
                        e_off.append(np.array([last[1]], np.int64))
                        e_len.append(np.array([last[2]], np.int64))
                        e_rl.append(np.array([last[3]], np.int64))
                    if len(tid) > 1:
                        e_tid.append(tid[:-1])
                        e_off.append(eoff[:-1])
                        e_len.append(eln[:-1])
                        e_rl.append(erl[:-1])
                    last = (int(tid[-1]), int(eoff[-1]), int(eln[-1]),
                            int(erl[-1]))
    if last is not None:
        e_tid.append(np.array([last[0]], np.int64))
        e_off.append(np.array([last[1]], np.int64))
        e_len.append(np.array([last[2]], np.int64))
        e_rl.append(np.array([last[3]], np.int64))
    tids = np.concatenate(e_tid) if e_tid else np.array([], np.int64)
    offs = np.concatenate(e_off) if e_off else np.array([], np.int64)
    lens = np.concatenate(e_len) if e_len else np.array([], np.int64)
    rls = np.concatenate(e_rl) if e_rl else np.array([], np.int64)
    n_entries = len(tids)

    meta_gz = gzip.compress(
        json.dumps(metadata or {"name": "planetiler_ray"}).encode(), mtime=0)
    if n_entries <= MAX_ROOT_ENTRIES:
        root = gzip.compress(serialize_directory_arrays(tids, offs, lens, rls), mtime=0)
        leaves = b""
    else:
        root_entries = []
        leaf_bytes = bytearray()
        for i in range(0, n_entries, 8192):
            ser = gzip.compress(serialize_directory_arrays(
                tids[i:i + 8192], offs[i:i + 8192],
                lens[i:i + 8192], rls[i:i + 8192]), mtime=0)
            root_entries.append((int(tids[i]), len(leaf_bytes), len(ser), 0))
            leaf_bytes += ser
        root = gzip.compress(serialize_directory(root_entries), mtime=0)
        leaves = bytes(leaf_bytes)
    root_off = HEADER_LEN
    meta_off = root_off + len(root)
    leaf_off = meta_off + len(meta_gz)
    data_off = leaf_off + len(leaves)
    if n_addressed:
        from ..geo import mercator

        bounds_e7 = (
            int(round(mercator.world_x_to_lon(wx0) * 1e7)),
            int(round(mercator.world_y_to_lat(wy1) * 1e7)),
            int(round(mercator.world_x_to_lon(wx1) * 1e7)),
            int(round(mercator.world_y_to_lat(wy0) * 1e7)),
        )
    else:
        bounds_e7 = (-180_0000000, -85_0000000, 180_0000000, 85_0000000)
    header = _header(root_off, len(root), meta_off, len(meta_gz), leaf_off,
                     len(leaves), data_off, data_pos, n_addressed,
                     n_entries, len(blob_off),
                     minz if n_addressed else 0, maxz, bounds_e7=bounds_e7)
    with open(path, "wb") as f:
        f.write(header)
        f.write(root)
        f.write(meta_gz)
        f.write(leaves)
        with open(tmp, "rb") as src:
            shutil.copyfileobj(src, f, length=1 << 22)
    os.remove(tmp)
    return {
        "n_tiles": n_addressed,
        "n_entries": n_entries,
        "n_unique_blobs": len(blob_off),
        "n_bytes": data_pos,
    }


class PMTilesReader:
    """Minimal reader for round-trip tests."""

    def __init__(self, path: str):
        self.f = open(path, "rb")
        h = self.f.read(HEADER_LEN)
        assert h[0:7] == MAGIC, "bad magic"
        (self.root_off,) = struct.unpack_from("<Q", h, 8)
        (self.root_len,) = struct.unpack_from("<Q", h, 16)
        (self.meta_off,) = struct.unpack_from("<Q", h, 24)
        (self.meta_len,) = struct.unpack_from("<Q", h, 32)
        (self.leaf_off,) = struct.unpack_from("<Q", h, 40)
        (self.leaf_len,) = struct.unpack_from("<Q", h, 48)
        (self.data_off,) = struct.unpack_from("<Q", h, 56)
        (self.data_len,) = struct.unpack_from("<Q", h, 64)
        (self.n_addressed,) = struct.unpack_from("<Q", h, 72)
        self.min_zoom, self.max_zoom = h[100], h[101]
        self.f.seek(self.root_off)
        self.root = deserialize_directory(gzip.decompress(self.f.read(self.root_len)))
        self.has_leaves = self.leaf_len > 0

    def metadata(self) -> dict:
        self.f.seek(self.meta_off)
        return json.loads(gzip.decompress(self.f.read(self.meta_len)))

    def _lookup(self, entries, hid):
        lo, hi = 0, len(entries) - 1
        best = None
        while lo <= hi:
            mid = (lo + hi) // 2
            if entries[mid][0] <= hid:
                best = entries[mid]
                lo = mid + 1
            else:
                hi = mid - 1
        return best

    def get_tile(self, z: int, x: int, y: int) -> bytes | None:
        hid = int(T.encode_tile_id(z, x, y, T.HILBERT))
        e = self._lookup(self.root, hid)
        if e is None:
            return None
        if self.has_leaves:
            tid, off, ln, rl = e
            self.f.seek(self.leaf_off + off)
            leaf = deserialize_directory(gzip.decompress(self.f.read(ln)))
            e = self._lookup(leaf, hid)
            if e is None:
                return None
        tid, off, ln, rl = e
        if hid >= tid + max(rl, 1):
            return None
        self.f.seek(self.data_off + off)
        return self.f.read(ln)

    def close(self):
        self.f.close()

"""Archive verification / diff tools — ``util/CompareArchives.java`` /
``mbtiles/Verify.java`` analogues: tile-by-tile comparison of two archives
(any mix of files / shard / MBTiles / PMTiles), plus a basic validity check.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .geo import mvt


def _iter_files_archive(path: str):
    for z in sorted(os.listdir(path)):
        if not z.isdigit():
            continue
        zdir = os.path.join(path, z)
        for x in sorted(os.listdir(zdir)):
            xdir = os.path.join(zdir, x)
            for y in sorted(os.listdir(xdir)):
                if y.endswith(".pbf"):
                    with open(os.path.join(xdir, y), "rb") as f:
                        yield int(z), int(x), int(y[:-4]), f.read()


def _iter_shard_archive(path: str):
    import pyarrow.parquet as pq

    shard_dir = os.path.join(path, "shards")
    for name in sorted(os.listdir(shard_dir)):
        t = pq.read_table(os.path.join(shard_dir, name))
        for i in range(t.num_rows):
            yield (
                int(t.column("z")[i].as_py()),
                int(t.column("tile_x")[i].as_py()),
                int(t.column("tile_y")[i].as_py()),
                t.column("tile_gz")[i].as_py(),
            )


def _iter_mbtiles(path: str):
    import sqlite3

    conn = sqlite3.connect(path)
    for z, col, row, data in conn.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        " ORDER BY zoom_level, tile_column, tile_row"
    ):
        yield int(z), int(col), (1 << int(z)) - 1 - int(row), data
    conn.close()


def iter_archive(path: str):
    """Yield (z, x, y, gzipped_bytes) for any supported archive layout."""
    if os.path.isdir(path):
        if os.path.isdir(os.path.join(path, "shards")):
            yield from _iter_shard_archive(path)
        else:
            yield from _iter_files_archive(path)
    elif path.endswith(".mbtiles"):
        yield from _iter_mbtiles(path)
    elif path.endswith(".pmtiles"):
        import gzip as _gzip

        from .geo import tile as T
        from .sinks.pmtiles import PMTilesReader, deserialize_directory

        r = PMTilesReader(path)
        if r.has_leaves:
            # root entries point into the leaf section; walk each leaf
            tile_entries = []
            for tid, off, ln, rl in r.root:
                r.f.seek(r.leaf_off + off)
                tile_entries.extend(deserialize_directory(_gzip.decompress(r.f.read(ln))))
        else:
            tile_entries = r.root
        for tid, off, ln, rl in tile_entries:
            for k in range(max(rl, 1)):
                z, x, y = T.decode_tile_id(tid + k, T.HILBERT)
                r.f.seek(r.data_off + off)
                yield int(z), int(x), int(y), r.f.read(ln)
        r.close()
    else:
        raise ValueError(f"unknown archive {path}")


@dataclass
class CompareResult:
    n_a: int = 0
    n_b: int = 0
    n_match: int = 0
    only_a: list = field(default_factory=list)
    only_b: list = field(default_factory=list)
    diff: list = field(default_factory=list)

    @property
    def identical(self) -> bool:
        return not self.only_a and not self.only_b and not self.diff


def compare_archives(path_a: str, path_b: str, max_report: int = 20) -> CompareResult:
    """Tile-by-tile diff of two archives (CompareArchives semantics)."""
    a = {(z, x, y): d for z, x, y, d in iter_archive(path_a)}
    res = CompareResult(n_a=len(a))
    seen = set()
    for z, x, y, d in iter_archive(path_b):
        res.n_b += 1
        key = (z, x, y)
        seen.add(key)
        if key not in a:
            if len(res.only_b) < max_report:
                res.only_b.append(key)
        elif a[key] != d:
            if len(res.diff) < max_report:
                res.diff.append(key)
        else:
            res.n_match += 1
    for key in a:
        if key not in seen and len(res.only_a) < max_report:
            res.only_a.append(key)
    return res


def verify_archive(path: str, decode_sample: int = 50) -> dict:
    """Basic validity: every sampled tile gunzips + MVT-decodes; counts per
    zoom (mbtiles/Verify.java semantics)."""
    by_zoom: dict[int, int] = {}
    checked = 0
    for z, x, y, d in iter_archive(path):
        by_zoom[z] = by_zoom.get(z, 0) + 1
        if checked < decode_sample:
            layers = mvt.decode_tile(mvt.gunzip_tile(d))
            assert isinstance(layers, dict)
            checked += 1
    return {"by_zoom": by_zoom, "n_tiles": sum(by_zoom.values()), "decoded": checked}

"""GeoPackage reader — ``reader/GeoPackageReader.java`` capability without
GDAL: a GeoPackage is a plain SQLite database (public OGC 12-128r18 spec)
whose feature tables carry geometry as a GPB blob (magic ``GP``, flags,
srs_id, optional envelope) wrapping standard WKB — all parseable with the
stdlib ``sqlite3`` and our own WKB codec.

Scale pattern: the driver reads only ``gpkg_contents`` + min/max rowid
(tiny); the feature rows are read in PARALLEL by rowid-range tasks, one
sqlite connection per task (``read_geopackage`` returns a Dataset of
``rowid BETWEEN lo AND hi`` partitions — the standard partitioned-JDBC-scan
shape).  NaturalEarth's sqlite distribution reads through the same path
(``NaturalEarthReader.java`` capability).
"""

from __future__ import annotations

import sqlite3
import struct

import pyarrow as pa

import ray
import ray.data


def parse_gpb(blob: bytes) -> bytes:
    """GeoPackage geometry blob -> the embedded WKB bytes."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env_code = (flags >> 1) & 0x7
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(env_code)
    if env_len is None:
        raise ValueError(f"invalid envelope contents indicator {env_code}")
    return blob[8 + env_len :]


def make_gpb(wkb: bytes, srs_id: int = 4326) -> bytes:
    """WKB -> minimal GeoPackage geometry blob (no envelope) — used by the
    test-fixture writer and the GeoPackage sink."""
    return b"GP" + bytes([0, 0b00000001]) + struct.pack("<i", srs_id) + wkb


def list_feature_tables(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type = 'features'"
        ).fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def _geometry_column(con: sqlite3.Connection, table: str) -> str:
    row = con.execute(
        "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?",
        (table,),
    ).fetchone()
    if row is None:
        raise ValueError(f"{table} has no gpkg_geometry_columns entry")
    return row[0]


def read_geopackage(path: str, table: str | None = None,
                    rows_per_task: int = 50_000) -> ray.data.Dataset:
    """GeoPackage feature table -> Dataset of rows with ``geom_wkb`` (binary)
    plus every attribute column.  Parallel rowid-range scan."""
    if table is None:
        tables = list_feature_tables(path)
        if len(tables) != 1:
            raise ValueError(f"specify table=, found {tables}")
        table = tables[0]
    con = sqlite3.connect(path)
    try:
        geom_col = _geometry_column(con, table)
        lo, hi = con.execute(
            f'SELECT min(rowid), max(rowid) FROM "{table}"'
        ).fetchone()
        info = [(r[1], r[2]) for r in con.execute(f'PRAGMA table_info("{table}")')]
    finally:
        con.close()
    if lo is None:
        return ray.data.from_items([])
    cols = [name for name, _ in info]
    attr_cols = [c for c in cols if c != geom_col]

    def _arrow_type(decl: str):
        d = (decl or "").upper()
        if "INT" in d:
            return pa.int64()
        if any(k in d for k in ("REAL", "FLOA", "DOUB")):
            return pa.float64()
        if "BLOB" in d:
            return pa.binary()
        return pa.string()

    decl_types = {name: _arrow_type(decl) for name, decl in info}
    ranges = [
        {"lo": s, "hi": min(s + rows_per_task - 1, hi)}
        for s in range(lo, hi + 1, rows_per_task)
    ]

    def read_range(batch: pa.Table) -> pa.Table:
        out_tables = []
        for lo_i, hi_i in zip(batch.column("lo").to_pylist(),
                              batch.column("hi").to_pylist()):
            c = sqlite3.connect(path)
            try:
                sel = ", ".join(f'"{x}"' for x in attr_cols)
                rows = c.execute(
                    f'SELECT {sel}, "{geom_col}" FROM "{table}" '
                    f"WHERE rowid BETWEEN ? AND ?",
                    (lo_i, hi_i),
                ).fetchall()
            finally:
                c.close()
            if not rows:
                continue
            def _col(vals, name):
                try:
                    return pa.array(vals, decl_types[name])
                except (pa.ArrowInvalid, pa.ArrowTypeError):
                    return pa.array(vals)  # sqlite dynamic typing fallback

            cols_out: dict = {
                name: _col([r[i] for r in rows], name)
                for i, name in enumerate(attr_cols)
            }
            cols_out["geom_wkb"] = pa.array(
                [parse_gpb(r[-1]) if r[-1] is not None else None for r in rows],
                pa.binary(),
            )
            out_tables.append(pa.table(cols_out))
        if not out_tables:
            # typed empty arrays (from the sqlite declared types) — a plain
            # pa.array([]) is null-typed and breaks schema promotion when Ray
            # concatenates with non-empty typed blocks (sparse rowid ranges)
            return pa.table(
                {c: pa.array([], decl_types[c]) for c in attr_cols}
                | {"geom_wkb": pa.array([], pa.binary())}
            )
        return pa.concat_tables(out_tables, promote_options="default")

    return ray.data.from_items(ranges).map_batches(
        read_range, batch_format="pyarrow", batch_size=1
    )


def write_geopackage(path: str, table: str, names: list[str],
                     attrs: dict[str, list], wkbs: list[bytes],
                     srs_id: int = 4326) -> None:
    """Minimal GeoPackage writer (spec-conformant core tables) — serves the
    test fixtures and small exports; not the cluster-scale sink."""
    con = sqlite3.connect(path)
    try:
        con.executescript(
            """
CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
  srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
  organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
  definition TEXT NOT NULL, description TEXT);
CREATE TABLE IF NOT EXISTS gpkg_contents (
  table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL, identifier TEXT,
  description TEXT, last_change TEXT, min_x REAL, min_y REAL,
  max_x REAL, max_y REAL, srs_id INTEGER);
CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
  table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL,
  geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
  z TINYINT NOT NULL, m TINYINT NOT NULL);
"""
        )
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES "
            "('WGS 84', 4326, 'EPSG', 4326, 'GEOGCS[...]', NULL)"
        )
        attr_defs = ", ".join(f'"{n}" TEXT' for n in names)
        con.execute(
            f'CREATE TABLE "{table}" (fid INTEGER PRIMARY KEY, {attr_defs}, geom BLOB)'
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents (table_name, data_type, srs_id) "
            "VALUES (?, 'features', ?)",
            (table, srs_id),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?, 'geom', "
            "'GEOMETRY', ?, 0, 0)",
            (table, srs_id),
        )
        n = len(wkbs)
        for i in range(n):
            vals = [attrs[k][i] for k in names]
            ph = ", ".join("?" for _ in names)
            con.execute(
                f'INSERT INTO "{table}" (fid, {", ".join(chr(34)+n_+chr(34) for n_ in names)}, geom) '
                f"VALUES (?, {ph}, ?)",
                (i + 1, *vals, make_gpb(wkbs[i], srs_id)),
            )
        con.commit()
    finally:
        con.close()

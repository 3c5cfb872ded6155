"""Shapefile reader — ``reader/ShapefileReader.java`` capability without
GDAL: the ESRI shapefile format is a public spec (ESRI whitepaper, 1998) —
``.shp`` geometry records, ``.shx`` fixed-width record index, ``.dbf``
(dBASE III) fixed-width attributes — all parseable with numpy/struct.

Scale pattern: the driver reads only the tiny ``.shx`` index; record RANGES
fan out to parallel tasks that seek directly into ``.shp``/``.dbf``
(``read_shapefile`` returns a Dataset).  Geometry converts to our WKB
(polygon rings re-nested by the shapefile winding rule: clockwise = outer).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray
import ray.data

SHAPE_NULL = 0
SHAPE_POINT = 1
SHAPE_POLYLINE = 3
SHAPE_POLYGON = 5
SHAPE_MULTIPOINT = 8


# ------------------------------------------------------------------- read --

def read_shx(path_shx: str) -> np.ndarray:
    """.shx -> (n_records, 2) int64 [byte offset, content length] (bytes)."""
    raw = open(path_shx, "rb").read()
    body = np.frombuffer(raw[100:], dtype=">i4").reshape(-1, 2).astype(np.int64)
    return body * 2  # stored in 16-bit words


def read_dbf_header(path_dbf: str):
    raw = open(path_dbf, "rb").read(32)
    n_records = struct.unpack("<i", raw[4:8])[0]
    header_size = struct.unpack("<h", raw[8:10])[0]
    record_size = struct.unpack("<h", raw[10:12])[0]
    fields = []
    hdr = open(path_dbf, "rb").read(header_size)
    off = 32
    while off < header_size - 1 and hdr[off] != 0x0D:
        fd = hdr[off : off + 32]
        name = fd[:11].split(b"\x00")[0].decode("ascii", "replace")
        ftype = chr(fd[11])
        flen = fd[16]
        fields.append((name, ftype, flen))
        off += 32
    return n_records, header_size, record_size, fields


def _dbf_value(raw: bytes, ftype: str):
    s = raw.decode("latin-1").strip()
    if ftype in ("N", "F"):
        if not s:
            return None
        try:
            return int(s) if ftype == "N" and "." not in s else float(s)
        except ValueError:
            return None
    if ftype == "L":
        return s in ("Y", "y", "T", "t")
    return s


def shp_record_to_wkb(content: bytes):
    """One .shp record content -> (kind, wkb bytes) or None for null shapes."""
    from ..geo import wkb
    from ..geo.multipolygon import nest_rings

    stype = struct.unpack("<i", content[:4])[0]
    if stype == SHAPE_NULL:
        return None
    if stype == SHAPE_POINT:
        x, y = struct.unpack("<2d", content[4:20])
        return "point", wkb.encode_wkb("point", np.array([[x, y]]))
    if stype == SHAPE_MULTIPOINT:
        n = struct.unpack("<i", content[36:40])[0]
        pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(-1, 2)
        return "multipoint", wkb.encode_wkb("multipoint", pts.copy())
    if stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
        n_parts, n_points = struct.unpack("<2i", content[36:44])
        parts = np.frombuffer(content, dtype="<i4", count=n_parts, offset=44)
        pts = np.frombuffer(
            content, dtype="<f8", count=2 * n_points, offset=44 + 4 * n_parts
        ).reshape(-1, 2)
        bounds = np.append(parts, n_points)
        rings = [pts[bounds[i] : bounds[i + 1]].copy() for i in range(n_parts)]
        if stype == SHAPE_POLYLINE:
            if len(rings) == 1:
                return "linestring", wkb.encode_wkb("linestring", rings[0])
            return "multilinestring", wkb.encode_wkb("multilinestring", rings)
        # polygon: shapefile has no explicit outer/hole structure — re-nest
        # by containment (the winding convention CW=outer is advisory; the
        # containment nest is what the reference's geometry factory does)
        polys = nest_rings(rings)
        if len(polys) == 1:
            return "polygon", wkb.encode_wkb("polygon", polys[0])
        return "multipolygon", wkb.encode_wkb("multipolygon", polys)
    raise ValueError(f"unsupported shape type {stype}")


def read_shapefile(path_shp: str, records_per_task: int = 20_000) -> ray.data.Dataset:
    """Shapefile -> Dataset with ``geom_wkb``, ``kind`` + .dbf attributes."""
    base = path_shp[:-4] if path_shp.endswith(".shp") else path_shp
    idx = read_shx(base + ".shx")
    n_rec, dbf_hdr, dbf_rec, fields = read_dbf_header(base + ".dbf")
    n = min(len(idx), n_rec)
    ranges = [
        {"start": s, "end": min(s + records_per_task, n)}
        for s in range(0, n, records_per_task)
    ]

    def read_range(batch: pa.Table) -> pa.Table:
        outs = []
        shp = open(base + ".shp", "rb")
        dbf = open(base + ".dbf", "rb")
        try:
            for s, e in zip(batch.column("start").to_pylist(),
                            batch.column("end").to_pylist()):
                kinds, wkbs = [], []
                attrs: dict[str, list] = {f[0]: [] for f in fields}
                for r in range(s, e):
                    off, ln = idx[r]
                    shp.seek(off + 8)
                    res = shp_record_to_wkb(shp.read(int(ln)))
                    kinds.append(res[0] if res else None)
                    wkbs.append(res[1] if res else None)
                    dbf.seek(dbf_hdr + r * dbf_rec + 1)  # +1 deletion flag
                    rec = dbf.read(dbf_rec - 1)
                    pos = 0
                    for name, ftype, flen in fields:
                        attrs[name].append(_dbf_value(rec[pos : pos + flen], ftype))
                        pos += flen
                cols = {k: pa.array(v) for k, v in attrs.items()}
                cols["kind"] = pa.array(kinds, pa.string())
                cols["geom_wkb"] = pa.array(wkbs, pa.binary())
                outs.append(pa.table(cols))
        finally:
            shp.close()
            dbf.close()
        return pa.concat_tables(outs, promote_options="default")

    return ray.data.from_items(ranges).map_batches(
        read_range, batch_format="pyarrow", batch_size=1
    )


# --------------------------------------------- minimal writer (fixtures) --

def write_shapefile(base_path: str, kinds: list[str], geoms: list,
                    fields: list[tuple[str, str, int]], attrs: dict[str, list]) -> None:
    """Minimal .shp/.shx/.dbf writer for test fixtures and small exports.

    ``geoms``: per record, (n,2) array for point/linestring or list of rings
    for polygon (matching ``kinds``).
    """
    recs = []
    for kind, g in zip(kinds, geoms):
        if kind == "point":
            pt = np.asarray(g, dtype=np.float64).reshape(-1)[:2]
            recs.append(struct.pack("<i2d", SHAPE_POINT, pt[0], pt[1]))
        elif kind in ("linestring", "polygon"):
            rings = [np.asarray(g, dtype=np.float64)] if kind == "linestring" else [
                np.asarray(r, dtype=np.float64) for r in g
            ]
            allp = np.vstack(rings)
            parts = np.cumsum([0] + [len(r) for r in rings[:-1]]).astype("<i4")
            stype = SHAPE_POLYLINE if kind == "linestring" else SHAPE_POLYGON
            body = struct.pack(
                "<i4d2i", stype, allp[:, 0].min(), allp[:, 1].min(),
                allp[:, 0].max(), allp[:, 1].max(), len(rings), len(allp)
            )
            body += parts.tobytes() + allp.astype("<f8").tobytes()
            recs.append(body)
        else:
            raise ValueError(kind)
    # .shp + .shx
    shp = bytearray(100)
    shx = bytearray(100)
    offsets = []
    pos = 100
    for i, body in enumerate(recs):
        offsets.append((pos, len(body)))
        shp += struct.pack(">2i", i + 1, len(body) // 2)
        shp += body
        pos += 8 + len(body)
    struct.pack_into(">i", shp, 0, 9994)
    struct.pack_into(">i", shp, 24, len(shp) // 2)
    struct.pack_into("<i", shp, 28, 1000)
    xs = np.concatenate([np.atleast_2d(np.asarray(g if k != "polygon" else np.vstack(g)))
                         for k, g in zip(kinds, geoms)])
    struct.pack_into("<i", shp, 32, SHAPE_POLYGON if "polygon" in kinds else SHAPE_POINT)
    struct.pack_into("<4d", shp, 36, xs[:, 0].min(), xs[:, 1].min(),
                     xs[:, 0].max(), xs[:, 1].max())
    for off, ln in offsets:
        shx += struct.pack(">2i", off // 2, ln // 2)
    struct.pack_into(">i", shx, 0, 9994)
    struct.pack_into(">i", shx, 24, len(shx) // 2)
    struct.pack_into("<i", shx, 28, 1000)
    struct.pack_into("<i", shx, 32, SHAPE_POLYGON if "polygon" in kinds else SHAPE_POINT)
    open(base_path + ".shp", "wb").write(bytes(shp))
    open(base_path + ".shx", "wb").write(bytes(shx))
    # .dbf
    rec_size = 1 + sum(f[2] for f in fields)
    hdr_size = 32 + 32 * len(fields) + 1
    dbf = bytearray()
    dbf += struct.pack("<4B i 2h 20x", 3, 24, 1, 1, len(recs), hdr_size, rec_size)
    for name, ftype, flen in fields:
        fd = bytearray(32)
        fd[:11] = name.encode("ascii")[:11].ljust(11, b"\x00")
        fd[11] = ord(ftype)
        fd[16] = flen
        dbf += fd
    dbf += b"\x0d"
    for i in range(len(recs)):
        dbf += b" "
        for name, ftype, flen in fields:
            v = attrs[name][i]
            s = ("" if v is None else str(v))[:flen]
            if ftype == "N":
                dbf += s.rjust(flen).encode("ascii")
            else:
                dbf += s.ljust(flen).encode("latin-1")
    dbf += b"\x1a"
    open(base_path + ".dbf", "wb").write(bytes(dbf))

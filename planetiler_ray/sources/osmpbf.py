"""Hand-rolled ``.osm.pbf`` reader/writer (no protobuf library).

The reference's defining input format (``reader/osm/OsmInputFile.java``,
``reader/osm/PbfDecoder.java``) — re-implemented from the PUBLIC format
spec (https://wiki.openstreetmap.org/wiki/PBF_Format, fileformat.proto +
osmformat.proto), the same way ``geo/mvt.py`` hand-rolls the MVT protobuf.

Wire structure::

    file   := repeated [ int32-BE header_len ][ BlobHeader ][ Blob ]
    BlobHeader := type:1(string "OSMHeader"|"OSMData") indexdata:2 datasize:3
    Blob       := raw:1 | raw_size:2 + zlib_data:3
    OSMData    -> PrimitiveBlock:
        stringtable:1 { s:1 repeated bytes }
        primitivegroup:2 repeated { nodes:1 dense:2 ways:3 relations:4 }
        granularity:17 (default 100 nanodeg) lat_offset:19 lon_offset:20
    DenseNodes := id:1 (packed sint64 delta) lat:8 lon:9 (packed sint64
        delta, value = .000000001 * (offset + granularity * v))
        keys_vals:10 (packed int32, k,v string-table ids, 0 ends a node)
    Way      := id:1 keys:2 vals:3 (packed uint32) refs:8 (packed sint64 delta)
    Relation := id:1 keys:2 vals:3 roles_sid:8 memids:9 (packed sint64
        delta) types:10 (packed enum 0=node 1=way 2=relation)

Scale design: the hot payload (dense node ids/lats/lons, way refs) is
decoded with NUMPY-VECTORIZED varint/zigzag/delta kernels — one pass over
the packed buffer per block, no per-value Python.  Per-entity message
framing (a few fields each, <=8k entities per block) stays a thin scalar
loop.  The Ray reader scans the blob index driver-side (O(#blobs) tiny
reads) and fans blob decoding out via ``from_items -> map_batches``, so a
planet file decodes in parallel with streaming backpressure.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

# ------------------------------------------------------- varint kernels --


from ..geo.varint import (  # shared vectorized kernels
    pack_varints2,
    scatter_segments as _scatter_segments,
    segment_sum as _segment_sum,
    unpack_varints,
    zigzag_decode,
    zigzag_encode,
)


def pack_varints(vals: np.ndarray) -> np.ndarray:
    return pack_varints2(vals)[0]


def delta_encode(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.int64)
    return np.diff(x, prepend=np.int64(0))


def delta_decode(d: np.ndarray) -> np.ndarray:
    return np.cumsum(np.ascontiguousarray(d, dtype=np.int64))


def segmented_delta_decode(d: np.ndarray, seg_lens: np.ndarray) -> np.ndarray:
    """Per-segment delta decode (each segment restarts at 0) in one pass."""
    d = np.ascontiguousarray(d, dtype=np.int64)
    c = np.cumsum(d)
    starts = np.concatenate([[0], np.cumsum(seg_lens)])[:-1]
    base = np.where(starts > 0, c[starts - 1], 0)
    return c - np.repeat(base, seg_lens)


# ------------------------------------------------- scalar proto helpers --


def _varint(v: int) -> bytes:
    out = bytearray()
    v = int(v)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf, off: int):
    shift = 0
    val = 0
    while True:
        b = buf[off]
        off += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, off
        shift += 7


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_delim(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _scan_fields(buf):
    """Yield (field_num, wire_type, value) over one message.  wire 0 ->
    int value; wire 2 -> memoryview payload; wire 5/1 -> raw bytes."""
    off = 0
    n = len(buf)
    while off < n:
        key, off = _read_varint(buf, off)
        num, wire = key >> 3, key & 7
        if wire == 0:
            v, off = _read_varint(buf, off)
            yield num, wire, v
        elif wire == 2:
            ln, off = _read_varint(buf, off)
            yield num, wire, buf[off : off + ln]
            off += ln
        elif wire == 5:
            yield num, wire, buf[off : off + 4]
            off += 4
        elif wire == 1:
            yield num, wire, buf[off : off + 8]
            off += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")


# ---------------------------------------------------------------- writer --

GRANULARITY = 100  # nanodegrees per unit (the format default)
BLOCK_ENTITIES = 8000


class PbfWriter:
    """Streaming .osm.pbf writer (fixture generator + export sink).

    Entities must be appended in the conventional file order (nodes, then
    ways, then relations) if the output should read like a planet dump;
    the decoder does not care.
    """

    def __init__(self, path: str, granularity: int = GRANULARITY,
                 compress: bool = True):
        self.f = open(path, "wb")
        self.granularity = granularity
        self.compress = compress
        self._write_header_blob()

    # -- framing --

    def _write_blob(self, blob_type: str, payload: bytes):
        if self.compress:
            z = zlib.compress(payload, 6)
            blob = _field(2, 0) + _varint(len(payload)) + _len_delim(3, z)
        else:
            blob = _len_delim(1, payload)
        header = (
            _len_delim(1, blob_type.encode())
            + _field(3, 0) + _varint(len(blob))
        )
        self.f.write(struct.pack(">i", len(header)))
        self.f.write(header)
        self.f.write(blob)

    def _write_header_blob(self):
        hb = (
            _len_delim(4, b"OsmSchema-V0.6")
            + _len_delim(4, b"DenseNodes")
            + _len_delim(16, b"planetiler_ray")
        )
        self._write_blob("OSMHeader", hb)

    def _string_table(self, strings: list[bytes]) -> bytes:
        # index 0 must be the empty string (delimiter semantics)
        return b"".join(_len_delim(1, s) for s in strings)

    def _primitive_block(self, group: bytes, strings: list[bytes]) -> bytes:
        out = _len_delim(1, self._string_table(strings)) + _len_delim(2, group)
        if self.granularity != 100:
            out += _field(17, 0) + _varint(self.granularity)
        return out

    # -- entities --

    def write_dense_nodes(self, ids: np.ndarray, lat_nano: np.ndarray,
                          lon_nano: np.ndarray, tags: list | None = None,
                          info: dict | None = None):
        """tags: optional list (len = n nodes) of [(k, v), ...] per node;
        info: optional DenseInfo arrays {version, timestamp, changeset,
        uid} (delta-coded on the wire)."""
        g = self.granularity
        ids = np.ascontiguousarray(ids, np.int64)
        la = np.ascontiguousarray(lat_nano, np.int64) // g
        lo = np.ascontiguousarray(lon_nano, np.int64) // g
        for s in range(0, len(ids), BLOCK_ENTITIES):
            e = min(len(ids), s + BLOCK_ENTITIES)
            strings = [b""]
            sid = {b"": 0}
            kv = []
            if tags is not None:
                for i in range(s, e):
                    for k, v in tags[i]:
                        for t in (k.encode(), v.encode()):
                            if t not in sid:
                                sid[t] = len(strings)
                                strings.append(t)
                        kv.append(sid[k.encode()])
                        kv.append(sid[v.encode()])
                    kv.append(0)
            dense = _len_delim(
                1, pack_varints(zigzag_encode(delta_encode(ids[s:e]))).tobytes()
            )
            if info is not None:
                di = _len_delim(
                    1, pack_varints(np.asarray(info["version"][s:e], np.uint64)).tobytes()
                )
                for fn, key in ((2, "timestamp"), (3, "changeset"), (4, "uid")):
                    if key in info:
                        di += _len_delim(fn, pack_varints(zigzag_encode(
                            delta_encode(np.asarray(info[key][s:e], np.int64))
                        )).tobytes())
                dense += _len_delim(5, di)
            dense += (
                _len_delim(8, pack_varints(zigzag_encode(delta_encode(la[s:e]))).tobytes())
                + _len_delim(9, pack_varints(zigzag_encode(delta_encode(lo[s:e]))).tobytes())
            )
            if tags is not None and any(len(tags[i]) for i in range(s, e)):
                dense += _len_delim(
                    10, pack_varints(np.array(kv, np.uint64)).tobytes()
                )
            self._write_blob(
                "OSMData", self._primitive_block(_len_delim(2, dense), strings)
            )

    def write_ways(self, ids: np.ndarray, refs_flat: np.ndarray,
                   refs_lens: np.ndarray, tags: list | None = None):
        """Vectorized block emitter: every varint (ids, per-way delta-coded
        refs, tag sids, all length prefixes) is packed in ONE
        ``pack_varints2`` call per field across the whole block, and the
        message framing is assembled with arithmetic offsets + segment
        scatters — no per-way Python packing (round-3 rework: the per-way
        loop was 516k numpy calls / 23 s for a 150k-way fixture; this
        emits the identical bytes in ~1 s)."""
        ids = np.ascontiguousarray(ids, np.int64)
        refs_lens = np.ascontiguousarray(refs_lens, np.int64)
        roffs = np.concatenate([[0], np.cumsum(refs_lens)])
        for s in range(0, len(ids), BLOCK_ENTITIES):
            e = min(len(ids), s + BLOCK_ENTITIES)
            strings = [b""]
            sid = {b"": 0}
            key_sids, val_sids, tag_lens = [], [], np.zeros(e - s, np.int64)
            if tags is not None:
                for i in range(s, e):
                    for k, v in tags[i] or ():
                        for t in (k.encode(), v.encode()):
                            if t not in sid:
                                sid[t] = len(strings)
                                strings.append(t)
                        key_sids.append(sid[k.encode()])
                        val_sids.append(sid[v.encode()])
                    tag_lens[i - s] = len(tags[i] or ())
            group = _encode_ways_block(
                ids[s:e],
                np.asarray(refs_flat[roffs[s] : roffs[e]], np.int64),
                refs_lens[s:e],
                np.array(key_sids, np.uint64),
                np.array(val_sids, np.uint64),
                tag_lens,
            )
            self._write_blob(
                "OSMData", self._primitive_block(group.tobytes(), strings)
            )

    def write_relations(self, ids: np.ndarray, mem_flat: np.ndarray,
                        mem_lens: np.ndarray, types_flat: np.ndarray,
                        roles_flat: list, tags: list | None = None):
        """types: 0=node 1=way 2=relation; roles_flat: list[str] per member.
        Same vectorized block emitter as :meth:`write_ways` (fields 8/9/10:
        roles_sid, delta-coded memids, types)."""
        ids = np.ascontiguousarray(ids, np.int64)
        mem_lens = np.ascontiguousarray(mem_lens, np.int64)
        moffs = np.concatenate([[0], np.cumsum(mem_lens)])
        for s in range(0, len(ids), BLOCK_ENTITIES):
            e = min(len(ids), s + BLOCK_ENTITIES)
            strings = [b""]
            sid = {b"": 0}
            key_sids, val_sids = [], []
            tag_lens = np.zeros(e - s, np.int64)
            if tags is not None:
                for i in range(s, e):
                    for k, v in tags[i] or ():
                        for t in (k.encode(), v.encode()):
                            if t not in sid:
                                sid[t] = len(strings)
                                strings.append(t)
                        key_sids.append(sid[k.encode()])
                        val_sids.append(sid[v.encode()])
                    tag_lens[i - s] = len(tags[i] or ())
            rids = np.empty(int(moffs[e] - moffs[s]), np.uint64)
            for j, r in enumerate(roles_flat[moffs[s] : moffs[e]]):
                rb = r.encode()
                if rb not in sid:
                    sid[rb] = len(strings)
                    strings.append(rb)
                rids[j] = sid[rb]
            lens = mem_lens[s:e]
            mems = np.asarray(mem_flat[moffs[s] : moffs[e]], np.int64)
            group = _encode_entity_block(
                0x22, ids[s:e],  # field 4: PrimitiveGroup.relations
                [
                    (0x42, rids, lens),  # roles_sid
                    (0x4A, _delta_zigzag_flat(mems, lens), lens),  # memids
                    (0x52, np.asarray(types_flat[moffs[s] : moffs[e]], np.uint64), lens),
                ],
                np.array(key_sids, np.uint64), np.array(val_sids, np.uint64),
                tag_lens,
            )
            self._write_blob(
                "OSMData", self._primitive_block(group.tobytes(), strings)
            )

    def close(self):
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _encode_entity_block(frame_byte: int, ids: np.ndarray,
                         packed_fields: list, key_sids: np.ndarray,
                         val_sids: np.ndarray, tag_lens: np.ndarray) -> np.ndarray:
    """All messages of one entity kind (Way / Relation) as a flat uint8
    array — byte-identical to the per-entity scalar framing, fully
    vectorized (every varint of the block packed in one ``pack_varints2``
    call per field; framing assembled by arithmetic offsets + segment
    scatters).

    ``packed_fields``: ordered ``(header_byte, flat_uint64_values, lens)``
    for the trailing packed fields (e.g. Way.refs = ``(0x42, zz, lens)``;
    Relation roles/memids/types = fields 8/9/10).  Wire layout per entity::

        frame_byte varint(body_len)
          0x08 varint(id)
          [0x12 varint(len) packed-keys] [0x1A varint(len) packed-vals]
          {header varint(len) packed-values}  x len(packed_fields)
    """
    n = len(ids)
    if n == 0:
        return np.empty(0, np.uint8)
    packed_ids, id_nb = pack_varints2(ids.astype(np.uint64))

    ht = tag_lens > 0
    packed_keys, key_nb = pack_varints2(key_sids)
    packed_vals, val_nb = pack_varints2(val_sids)
    keys_blen = _segment_sum(key_nb, tag_lens)
    vals_blen = _segment_sum(val_nb, tag_lens)
    keypref = valpref = np.empty(0, np.uint8)
    keypref_nb = np.zeros(n, np.int64)
    valpref_nb = np.zeros(n, np.int64)
    if ht.any():
        keypref, kp_nb = pack_varints2(keys_blen[ht].astype(np.uint64))
        valpref, vp_nb = pack_varints2(vals_blen[ht].astype(np.uint64))
        keypref_nb[ht] = kp_nb
        valpref_nb[ht] = vp_nb
    tag_part = np.where(
        ht, 1 + keypref_nb + keys_blen + 1 + valpref_nb + vals_blen, 0
    )

    fields = []  # (header, packed, blen, pref, pref_nb)
    fields_part = np.zeros(n, np.int64)
    for header, values, lens in packed_fields:
        packed, nb = pack_varints2(values)
        blen = _segment_sum(nb, np.ascontiguousarray(lens, np.int64))
        pref, pref_nb = pack_varints2(blen.astype(np.uint64))
        fields.append((header, packed, blen, pref, pref_nb))
        fields_part += 1 + pref_nb + blen

    body_len = 1 + id_nb + tag_part + fields_part
    blpref, bl_nb = pack_varints2(body_len.astype(np.uint64))
    frame_len = 1 + bl_nb + body_len
    off = np.concatenate([[0], np.cumsum(frame_len)])
    out = np.zeros(int(off[-1]), np.uint8)
    p = off[:-1]
    out[p] = frame_byte
    _scatter_segments(out, p + 1, blpref, bl_nb)
    q = p + 1 + bl_nb
    out[q] = 0x08  # .id
    _scatter_segments(out, q + 1, packed_ids, id_nb)
    q = q + 1 + id_nb
    if ht.any():
        out[q[ht]] = 0x12  # .keys
        _scatter_segments(out, q[ht] + 1, keypref, keypref_nb[ht])
        _scatter_segments(out, q + 1 + keypref_nb, packed_keys, keys_blen)
        q2 = q + np.where(ht, 1 + keypref_nb + keys_blen, 0)
        out[q2[ht]] = 0x1A  # .vals
        _scatter_segments(out, q2[ht] + 1, valpref, valpref_nb[ht])
        _scatter_segments(out, q2 + 1 + valpref_nb, packed_vals, vals_blen)
        q = q2 + np.where(ht, 1 + valpref_nb + vals_blen, 0)
    for header, packed, blen, pref, pref_nb in fields:
        out[q] = header
        _scatter_segments(out, q + 1, pref, pref_nb)
        _scatter_segments(out, q + 1 + pref_nb, packed, blen)
        q = q + 1 + pref_nb + blen
    return out


def _delta_zigzag_flat(values_flat: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Per-segment delta encode + zigzag over a flat array (vectorized)."""
    starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
    d = np.ascontiguousarray(values_flat, np.int64).copy()
    if len(d):
        d[1:] -= values_flat[:-1]
        d[starts[lens > 0]] = values_flat[starts[lens > 0]]
    return zigzag_encode(d)


def _encode_ways_block(ids, refs_flat, refs_lens, key_sids, val_sids,
                       tag_lens) -> np.ndarray:
    zz = _delta_zigzag_flat(refs_flat, refs_lens)
    return _encode_entity_block(
        0x1A, ids, [(0x42, zz, refs_lens)], key_sids, val_sids, tag_lens
    )


# ---------------------------------------------------------------- reader --


def scan_blobs(path: str) -> list[dict]:
    """Driver-side blob index: O(#blobs) tiny reads, no payload decode —
    the parallel-read split points (OsmInputFile.java's block iteration)."""
    out = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">i", raw)[0]
            header = f.read(hlen)
            btype, datasize = "", 0
            for num, wire, val in _scan_fields(header):
                if num == 1:
                    btype = bytes(val).decode()
                elif num == 3:
                    datasize = val
            off = f.tell()
            out.append({"path": path, "offset": off, "size": datasize, "type": btype})
            f.seek(off + datasize)
    return out


def _blob_payload(blob: bytes) -> bytes:
    raw = zdata = None
    for num, wire, val in _scan_fields(blob):
        if num == 1:
            raw = bytes(val)
        elif num == 3:
            zdata = bytes(val)
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("Blob has neither raw nor zlib_data")


def read_pbf_header(path: str) -> dict:
    """Decode the OSMHeader blob -> {bbox_nano, required_features,
    optional_features, writingprogram, source}.  A reader should refuse
    files whose required_features it does not implement
    (OsmInputFile.java's schema validation)."""
    hdr = next((b for b in scan_blobs(path) if b["type"] == "OSMHeader"), None)
    if hdr is None:
        raise ValueError(f"{path}: no OSMHeader blob")
    with open(path, "rb") as f:
        f.seek(hdr["offset"])
        payload = _blob_payload(f.read(hdr["size"]))
    out = {
        "bbox_nano": None, "required_features": [], "optional_features": [],
        "writingprogram": None, "source": None,
    }
    for num, wire, val in _scan_fields(payload):
        if num == 1:  # HeaderBBox: left/right/top/bottom sint64 nanodeg
            bb = {}
            for fn, fw, fv in _scan_fields(val):
                bb[fn] = int(zigzag_decode(np.array([fv], np.uint64))[0])
            out["bbox_nano"] = (bb.get(1), bb.get(2), bb.get(3), bb.get(4))
        elif num == 4:
            out["required_features"].append(bytes(val).decode())
        elif num == 5:
            out["optional_features"].append(bytes(val).decode())
        elif num == 16:
            out["writingprogram"] = bytes(val).decode()
        elif num == 17:
            out["source"] = bytes(val).decode()
    return out


SUPPORTED_FEATURES = {"OsmSchema-V0.6", "DenseNodes"}


def check_required_features(path: str) -> dict:
    """Raise if the file requires a feature this reader does not implement
    (e.g. HistoricalInformation) — mirror of the reference's input gate."""
    hdr = read_pbf_header(path)
    missing = [f for f in hdr["required_features"] if f not in SUPPORTED_FEATURES]
    if missing:
        raise ValueError(f"{path}: unsupported required_features {missing}")
    return hdr


def _decode_string_table(buf) -> list[str]:
    return [bytes(v).decode("utf-8") for num, _, v in _scan_fields(buf) if num == 1]


def _kv_dicts(keys: np.ndarray, vals: np.ndarray, strings: list[str]) -> list:
    return [
        {strings[k]: strings[v] for k, v in zip(ks, vs)}
        for ks, vs in zip(keys, vals)
    ]


def decode_primitive_block(payload: bytes) -> dict:
    """PrimitiveBlock -> dict of entity arrays.

    Returns ``{"nodes": {...}, "ways": {...}, "relations": {...}}`` where
    the hot columns are int64 numpy arrays and variable-length per-entity
    data comes flat + lens (Arrow list layout, no Python row objects).
    """
    granularity, lat_off, lon_off = 100, 0, 0
    strings: list[str] = []
    groups = []
    for num, wire, val in _scan_fields(payload):
        if num == 1:
            strings = _decode_string_table(val)
        elif num == 2:
            groups.append(val)
        elif num == 17:
            granularity = val
        elif num == 19:
            lat_off = val
        elif num == 20:
            lon_off = val

    nodes = {"id": [], "lat_nano": [], "lon_nano": [], "tags": []}
    ways = {"id": [], "refs_flat": [], "refs_lens": [], "tags": []}
    rels = {
        "id": [], "mem_flat": [], "mem_lens": [], "types_flat": [],
        "roles_flat": [], "tags": [],
    }
    g = np.int64(granularity)

    for grp in groups:
        way_bodies, rel_bodies = [], []
        for num, wire, val in _scan_fields(grp):
            if num == 2:  # DenseNodes
                ids = la = lo = None
                kv = np.empty(0, np.int64)
                info = {}
                for fn, fw, fv in _scan_fields(val):
                    b = np.frombuffer(bytes(fv), np.uint8)
                    if fn == 1:
                        ids = delta_decode(zigzag_decode(unpack_varints(b)))
                    elif fn == 5:  # DenseInfo (versions/timestamps/...)
                        info = _decode_dense_info(fv)
                    elif fn == 8:
                        la = delta_decode(zigzag_decode(unpack_varints(b)))
                    elif fn == 9:
                        lo = delta_decode(zigzag_decode(unpack_varints(b)))
                    elif fn == 10:
                        kv = unpack_varints(b).astype(np.int64)
                if ids is None:
                    continue
                nodes["id"].append(ids)
                nodes["lat_nano"].append(lat_off + g * la)
                nodes["lon_nano"].append(lon_off + g * lo)
                nodes["tags"].append(_dense_tags(kv, len(ids), strings))
                for k in ("version", "timestamp", "changeset", "uid"):
                    nodes.setdefault(k, []).append(
                        info.get(k, np.zeros(len(ids), np.int64))
                    )
            elif num == 1:  # non-dense Nodes (rare)
                nid, nla, nlo, ntags = _decode_plain_node(val, strings)
                nodes["id"].append(np.array([nid], np.int64))
                nodes["lat_nano"].append(np.array([lat_off + g * nla], np.int64))
                nodes["lon_nano"].append(np.array([lon_off + g * nlo], np.int64))
                nodes["tags"].append([ntags])
                for k in ("version", "timestamp", "changeset", "uid"):
                    nodes.setdefault(k, []).append(np.zeros(1, np.int64))
            elif num == 3:
                way_bodies.append(val)
            elif num == 4:
                rel_bodies.append(val)
        if way_bodies:
            _decode_ways(way_bodies, strings, ways)
        if rel_bodies:
            _decode_relations(rel_bodies, strings, rels)

    def _cat(chunks, dtype=np.int64):
        return (
            np.concatenate(chunks).astype(dtype)
            if chunks
            else np.empty(0, dtype)
        )

    return {
        "nodes": {
            "id": _cat(nodes["id"]),
            "lat_nano": _cat(nodes["lat_nano"]),
            "lon_nano": _cat(nodes["lon_nano"]),
            "tags": [t for chunk in nodes["tags"] for t in chunk],
            **{
                k: _cat(nodes[k])
                for k in ("version", "timestamp", "changeset", "uid")
                if k in nodes
            },
        },
        "ways": {
            "id": _cat(ways["id"]),
            "refs_flat": _cat(ways["refs_flat"]),
            "refs_lens": _cat(ways["refs_lens"]),
            "tags": ways["tags"],
        },
        "relations": {
            "id": _cat(rels["id"]),
            "mem_flat": _cat(rels["mem_flat"]),
            "mem_lens": _cat(rels["mem_lens"]),
            "types_flat": _cat(rels["types_flat"]),
            "roles_flat": rels["roles_flat"],
            "tags": rels["tags"],
        },
    }


def _decode_dense_info(buf) -> dict:
    """DenseInfo (osmformat.proto): version packed int32; timestamp /
    changeset / uid packed DELTA-coded sint64/sint32 -> absolute int64
    arrays."""
    out = {}
    for num, wire, val in _scan_fields(buf):
        b = np.frombuffer(bytes(val), np.uint8)
        if num == 1:
            out["version"] = unpack_varints(b).astype(np.int64)
        elif num == 2:
            out["timestamp"] = delta_decode(zigzag_decode(unpack_varints(b)))
        elif num == 3:
            out["changeset"] = delta_decode(zigzag_decode(unpack_varints(b)))
        elif num == 4:
            out["uid"] = delta_decode(zigzag_decode(unpack_varints(b)))
    return out


def _dense_tags(kv: np.ndarray, n: int, strings: list[str]) -> list:
    if len(kv) == 0:
        return [{} for _ in range(n)]
    out = []
    idx = 0
    for _ in range(n):
        tags = {}
        while idx < len(kv) and kv[idx] != 0:
            k = strings[kv[idx]]
            v = strings[kv[idx + 1]]
            tags[k] = v
            idx += 2
        idx += 1  # skip the 0 delimiter
        out.append(tags)
    return out


def _decode_plain_node(buf, strings):
    nid = la = lo = 0
    ks, vs = [], []
    for num, wire, val in _scan_fields(buf):
        if num == 1:
            nid = zigzag_decode(np.array([val], np.uint64))[0]
        elif num == 2:
            ks = unpack_varints(np.frombuffer(bytes(val), np.uint8))
        elif num == 3:
            vs = unpack_varints(np.frombuffer(bytes(val), np.uint8))
        elif num == 8:
            la = zigzag_decode(np.array([val], np.uint64))[0]
        elif num == 9:
            lo = zigzag_decode(np.array([val], np.uint64))[0]
    tags = {strings[k]: strings[v] for k, v in zip(ks, vs)}
    return int(nid), int(la), int(lo), tags


def _unpack_regions(regions: list) -> tuple[np.ndarray, np.ndarray]:
    """Decode MANY packed-varint byte regions in one concatenated pass ->
    (flat values, per-region value counts).  Region boundaries fall on
    varint boundaries, so counts are the end-byte tallies per region —
    this replaces the per-entity ``unpack_varints`` calls that dominated
    the round-3 decode profile (48k numpy calls per block)."""
    concat = np.frombuffer(b"".join(regions), np.uint8)
    region_lens = np.array([len(r) for r in regions], np.int64)
    vals = unpack_varints(concat)
    is_end = (concat & 0x80) == 0
    cum_ends = np.concatenate([[0], np.cumsum(is_end)])
    bounds = np.concatenate([[0], np.cumsum(region_lens)])
    counts = cum_ends[bounds[1:]] - cum_ends[bounds[:-1]]
    return vals, counts


def _tag_dicts(keys: np.ndarray, vals: np.ndarray, lens: np.ndarray,
               strings: list) -> list:
    """Per-entity tag dicts from flat key/val string ids."""
    if not lens.any():
        return [{}] * len(lens)
    offs = np.concatenate([[0], np.cumsum(lens)])
    return [
        {
            strings[keys[j]]: strings[vals[j]]
            for j in range(offs[i], offs[i + 1])
        }
        for i in range(len(lens))
    ]


def _decode_ways(bodies, strings, ways):
    """Frame loop per way (byte regions only), then ONE vectorized
    varint/zigzag/segmented-delta pass over every way's refs and one
    concatenated pass each for keys/vals."""
    ids = np.empty(len(bodies), np.int64)
    ref_regions, key_regions, val_regions = [], [], []
    for i, body in enumerate(bodies):
        wid = 0
        refs_buf = ks_buf = vs_buf = b""
        for num, wire, val in _scan_fields(body):
            if num == 1:
                wid = val
            elif num == 2:
                ks_buf = bytes(val)
            elif num == 3:
                vs_buf = bytes(val)
            elif num == 8:
                refs_buf = bytes(val)
        ids[i] = wid
        ref_regions.append(refs_buf)
        key_regions.append(ks_buf)
        val_regions.append(vs_buf)
    vals, lens = _unpack_regions(ref_regions)
    refs = segmented_delta_decode(zigzag_decode(vals), lens)
    kflat, klens = _unpack_regions(key_regions)
    vflat, _ = _unpack_regions(val_regions)
    ways["tags"].extend(
        _tag_dicts(kflat.astype(np.int64), vflat.astype(np.int64), klens, strings)
    )
    ways["id"].append(ids)
    ways["refs_flat"].append(refs)
    ways["refs_lens"].append(lens)


def _decode_relations(bodies, strings, rels):
    ids = np.empty(len(bodies), np.int64)
    mem_regions, type_regions, role_regions = [], [], []
    key_regions, val_regions = [], []
    for i, body in enumerate(bodies):
        rid = 0
        mem_buf = typ_buf = rol_buf = ks_buf = vs_buf = b""
        for num, wire, val in _scan_fields(body):
            if num == 1:
                rid = val
            elif num == 2:
                ks_buf = bytes(val)
            elif num == 3:
                vs_buf = bytes(val)
            elif num == 8:
                rol_buf = bytes(val)
            elif num == 9:
                mem_buf = bytes(val)
            elif num == 10:
                typ_buf = bytes(val)
        ids[i] = rid
        mem_regions.append(mem_buf)
        type_regions.append(typ_buf)
        role_regions.append(rol_buf)
        key_regions.append(ks_buf)
        val_regions.append(vs_buf)
    vals, lens = _unpack_regions(mem_regions)
    mems = segmented_delta_decode(zigzag_decode(vals), lens)
    types, _ = _unpack_regions(type_regions)
    roles_sid, _ = _unpack_regions(role_regions)
    kflat, klens = _unpack_regions(key_regions)
    vflat, _ = _unpack_regions(val_regions)
    rels["tags"].extend(
        _tag_dicts(kflat.astype(np.int64), vflat.astype(np.int64), klens, strings)
    )
    rels["id"].append(ids)
    rels["mem_flat"].append(mems)
    rels["mem_lens"].append(lens)
    rels["types_flat"].append(types.astype(np.int64))
    rels["roles_flat"].extend(strings[s] for s in roles_sid.astype(np.int64))


def read_blob_entities(path: str, offset: int, size: int) -> dict:
    with open(path, "rb") as f:
        f.seek(offset)
        blob = f.read(size)
    return decode_primitive_block(_blob_payload(blob))


# ------------------------------------------------------------ Ray reader --


def _data_blob_items(path: str) -> list[dict]:
    return [b for b in scan_blobs(path) if b["type"] == "OSMData"]


def read_pbf_nodes(path: str):
    """Dataset of (node_id, lat_mdeg, lon_mdeg) — millidegrees are exact
    for fixtures written at the default granularity (nanodeg % 1e6 == 0);
    lat_nano/lon_nano are also kept for full precision."""
    import ray

    def decode(batch: pa.Table) -> pa.Table:
        outs = []
        for p, off, sz in zip(
            batch.column("path").to_pylist(),
            batch.column("offset").to_pylist(),
            batch.column("size").to_pylist(),
        ):
            ent = read_blob_entities(p, off, sz)["nodes"]
            if len(ent["id"]) == 0:
                continue
            outs.append(
                pa.table(
                    {
                        "node_id": pa.array(ent["id"], pa.int64()),
                        "lat_mdeg": pa.array(ent["lat_nano"] // 1_000_000, pa.int64()),
                        "lon_mdeg": pa.array(ent["lon_nano"] // 1_000_000, pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {c: pa.array([], pa.int64())
                 for c in ("node_id", "lat_mdeg", "lon_mdeg")}
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(_data_blob_items(path)).map_batches(
        decode, batch_format="pyarrow"
    )


def read_pbf_way_refs(path: str):
    """Dataset of exploded way refs: (way_id, seq, node_id) — the exact
    input shape of the existing shuffle join (``pipelines/osm.py``)."""
    import ray

    def decode(batch: pa.Table) -> pa.Table:
        outs = []
        for p, off, sz in zip(
            batch.column("path").to_pylist(),
            batch.column("offset").to_pylist(),
            batch.column("size").to_pylist(),
        ):
            ent = read_blob_entities(p, off, sz)["ways"]
            if len(ent["id"]) == 0:
                continue
            lens = ent["refs_lens"]
            wid = np.repeat(ent["id"], lens)
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            seq = np.arange(len(ent["refs_flat"]), dtype=np.int64) - np.repeat(starts, lens) + 1
            outs.append(
                pa.table(
                    {
                        "way_id": pa.array(wid, pa.int64()),
                        "seq": pa.array(seq, pa.int64()),
                        "node_id": pa.array(ent["refs_flat"], pa.int64()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("way_id", "seq", "node_id")}
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(_data_blob_items(path)).map_batches(
        decode, batch_format="pyarrow"
    )


def read_pbf_relation_members(path: str):
    """Dataset of (rel_id, member_idx, member_id, member_type, role)."""
    import ray

    def decode(batch: pa.Table) -> pa.Table:
        outs = []
        for p, off, sz in zip(
            batch.column("path").to_pylist(),
            batch.column("offset").to_pylist(),
            batch.column("size").to_pylist(),
        ):
            ent = read_blob_entities(p, off, sz)["relations"]
            if len(ent["id"]) == 0:
                continue
            lens = ent["mem_lens"]
            rid = np.repeat(ent["id"], lens)
            starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
            idx = np.arange(len(ent["mem_flat"]), dtype=np.int64) - np.repeat(starts, lens)
            outs.append(
                pa.table(
                    {
                        "rel_id": pa.array(rid, pa.int64()),
                        "member_idx": pa.array(idx, pa.int64()),
                        "member_id": pa.array(ent["mem_flat"], pa.int64()),
                        "member_type": pa.array(ent["types_flat"], pa.int64()),
                        "role": pa.array(ent["roles_flat"], pa.string()),
                    }
                )
            )
        if not outs:
            return pa.table(
                {
                    "rel_id": pa.array([], pa.int64()),
                    "member_idx": pa.array([], pa.int64()),
                    "member_id": pa.array([], pa.int64()),
                    "member_type": pa.array([], pa.int64()),
                    "role": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(outs)

    return ray.data.from_items(_data_blob_items(path)).map_batches(
        decode, batch_format="pyarrow"
    )


# ------------------------------------------------------------- Ray sink --


def write_pbf_nodes_shards(ds, out_dir: str):
    """Sharded .osm.pbf export of a (node_id, lat_mdeg, lon_mdeg) Dataset:
    each batch becomes a standalone shard file (own OSMHeader + blobs), so
    the write is parallel and resumable; every shard is independently
    readable by ``read_pbf_nodes``.  Returns a manifest Dataset
    (path, n_nodes)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("node_id").to_numpy()
        if len(ids) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_nodes": pa.array([], pa.int64())})
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        la = batch.column("lat_mdeg").to_numpy()[order] * 1_000_000
        lo = batch.column("lon_mdeg").to_numpy()[order] * 1_000_000
        path = os.path.join(out_dir, f"nodes-{int(ids[0]):012d}.osm.pbf")
        tmp = path + ".tmp"
        with PbfWriter(tmp) as w:
            w.write_dense_nodes(ids, la, lo)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_nodes": pa.array([len(ids)], pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow", batch_size=65536)


def write_pbf_ways_shards(ds, out_dir: str, n_buckets: int = 64):
    """Sharded .osm.pbf export of an exploded (way_id, seq, node_id) refs
    Dataset.  Ways are re-assembled per way-id hash bucket (whole ways per
    shard regardless of input batching) and each bucket becomes one shard
    file.  Returns a manifest Dataset (path, n_ways)."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch.column("way_id").to_numpy() % n_buckets
        return batch.append_column("wbucket", pa.array(b, pa.int64()))

    def write_bucket(g: pa.Table) -> pa.Table:
        wid = g.column("way_id").to_numpy()
        if len(wid) == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_ways": pa.array([], pa.int64())})
        seq = g.column("seq").to_numpy()
        nid = g.column("node_id").to_numpy()
        order = np.lexsort((seq, wid))
        wid, nid = wid[order], nid[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(wid)) + 1])
        ids = wid[starts]
        lens = np.diff(np.append(starts, len(wid)))
        bucket = int(ids[0]) % n_buckets
        path = os.path.join(out_dir, f"ways-{bucket:05d}.osm.pbf")
        tmp = path + ".tmp"
        with PbfWriter(tmp) as w:
            w.write_ways(ids, nid, lens)
        os.replace(tmp, path)
        return pa.table({"path": pa.array([path], pa.string()),
                         "n_ways": pa.array([len(ids)], pa.int64())})

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(
            lambda g: write_bucket(g.drop_columns(["wbucket"])),
            batch_format="pyarrow",
        )
    )

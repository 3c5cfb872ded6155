"""Round-trip and wire-format tests for the hand-rolled .osm.pbf codec
(``sources/osmpbf.py`` — PbfDecoder.java / OsmInputFile.java semantics)."""

import os

import numpy as np
import pytest

from planetiler_ray.sources.osmpbf import (
    PbfWriter,
    delta_decode,
    delta_encode,
    pack_varints,
    read_blob_entities,
    scan_blobs,
    segmented_delta_decode,
    unpack_varints,
    zigzag_decode,
    zigzag_encode,
)


def _ref_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_varint_roundtrip_and_wire_parity():
    vals = np.concatenate(
        [
            np.array([0, 1, 127, 128, 300, 16383, 16384, 2**32 - 1,
                      2**63 - 1, 2**64 - 1], np.uint64),
            np.random.default_rng(1).integers(0, 2**62, 500).astype(np.uint64),
        ]
    )
    packed = pack_varints(vals)
    assert packed.tobytes() == b"".join(_ref_varint(int(v)) for v in vals)
    assert np.array_equal(unpack_varints(packed), vals)


def test_zigzag_delta():
    x = np.array([0, -1, 1, -2, 2**40, -(2**40), 7], np.int64)
    assert np.array_equal(zigzag_decode(zigzag_encode(x)), x)
    assert np.array_equal(zigzag_encode(np.array([0, -1, 1, -2, 2])),
                          np.array([0, 1, 2, 3, 4], np.uint64))
    assert np.array_equal(delta_decode(delta_encode(x)), x)


def test_segmented_delta_decode():
    segs = [np.array([5, 7, 3]), np.array([100]), np.array([-4, -4])]
    flat = np.concatenate([delta_encode(s) for s in segs])
    lens = np.array([len(s) for s in segs])
    assert np.array_equal(segmented_delta_decode(flat, lens),
                          np.concatenate(segs))


@pytest.fixture
def pbf_file(tmp_path):
    path = str(tmp_path / "t.osm.pbf")
    ids = np.array([10, 20, 35, 4000, 4001], np.int64)
    lat = np.array([45_000, -85_000, 0, 12_345, 12_346], np.int64) * 1_000_000
    lon = np.array([-180_000, 179_999, 5, -7, 8], np.int64) * 1_000_000
    with PbfWriter(path) as w:
        w.write_dense_nodes(
            ids, lat, lon,
            tags=[[("place", "city")], [], [], [("name", "x"), ("pop", "7")], []],
        )
        w.write_ways(
            np.array([1, 2], np.int64),
            np.array([10, 20, 35, 4000, 4001, 10], np.int64),
            np.array([3, 3], np.int64),
            tags=[[("highway", "primary")], []],
        )
        w.write_relations(
            np.array([99], np.int64),
            np.array([1, 2, 10], np.int64),
            np.array([3], np.int64),
            np.array([1, 1, 0], np.int64),
            ["outer", "inner", "admin_centre"],
            tags=[[("type", "multipolygon")]],
        )
    return path, ids, lat, lon


def test_file_roundtrip(pbf_file):
    path, ids, lat, lon = pbf_file
    blobs = scan_blobs(path)
    assert blobs[0]["type"] == "OSMHeader"
    data = [b for b in blobs if b["type"] == "OSMData"]
    ents = [read_blob_entities(path, b["offset"], b["size"]) for b in data]
    nodes = next(e["nodes"] for e in ents if len(e["nodes"]["id"]))
    assert np.array_equal(nodes["id"], ids)
    assert np.array_equal(nodes["lat_nano"], lat)
    assert np.array_equal(nodes["lon_nano"], lon)
    assert nodes["tags"][0] == {"place": "city"}
    assert nodes["tags"][1] == {}
    assert nodes["tags"][3] == {"name": "x", "pop": "7"}
    ways = next(e["ways"] for e in ents if len(e["ways"]["id"]))
    assert np.array_equal(ways["id"], [1, 2])
    assert np.array_equal(ways["refs_flat"], [10, 20, 35, 4000, 4001, 10])
    assert np.array_equal(ways["refs_lens"], [3, 3])
    assert ways["tags"] == [{"highway": "primary"}, {}]
    rels = next(e["relations"] for e in ents if len(e["relations"]["id"]))
    assert np.array_equal(rels["id"], [99])
    assert np.array_equal(rels["mem_flat"], [1, 2, 10])
    assert np.array_equal(rels["types_flat"], [1, 1, 0])
    assert rels["roles_flat"] == ["outer", "inner", "admin_centre"]
    assert rels["tags"] == [{"type": "multipolygon"}]


def test_uncompressed_blob(tmp_path):
    path = str(tmp_path / "raw.osm.pbf")
    ids = np.array([1, 2, 3], np.int64)
    with PbfWriter(path, compress=False) as w:
        w.write_dense_nodes(ids, ids * 1_000_000, -ids * 1_000_000)
    b = [x for x in scan_blobs(path) if x["type"] == "OSMData"][0]
    ent = read_blob_entities(path, b["offset"], b["size"])
    assert np.array_equal(ent["nodes"]["id"], ids)
    assert np.array_equal(ent["nodes"]["lat_nano"], ids * 1_000_000)


def test_custom_granularity(tmp_path):
    path = str(tmp_path / "g.osm.pbf")
    ids = np.array([5], np.int64)
    # granularity 1000: values exactly divisible survive
    with PbfWriter(path, granularity=1000) as w:
        w.write_dense_nodes(ids, np.array([123_000]), np.array([-456_000]))
    b = [x for x in scan_blobs(path) if x["type"] == "OSMData"][0]
    ent = read_blob_entities(path, b["offset"], b["size"])
    assert ent["nodes"]["lat_nano"][0] == 123_000
    assert ent["nodes"]["lon_nano"][0] == -456_000


def test_ray_readers(pbf_file, ray_session):
    from planetiler_ray.sources.osmpbf import read_pbf_nodes, read_pbf_way_refs

    path, ids, lat, lon = pbf_file
    ndf = read_pbf_nodes(path).to_pandas().sort_values("node_id")
    assert list(ndf["node_id"]) == list(ids)
    assert list(ndf["lat_mdeg"]) == list(lat // 1_000_000)
    wdf = read_pbf_way_refs(path).to_pandas().sort_values(["way_id", "seq"])
    assert list(wdf["node_id"]) == [10, 20, 35, 4000, 4001, 10]
    assert list(wdf["seq"]) == [1, 2, 3, 1, 2, 3]


def test_pbf_shard_sinks(tmp_path, ray_session):
    import ray.data

    from planetiler_ray.sources.osmpbf import (
        read_pbf_nodes,
        read_pbf_way_refs,
        write_pbf_nodes_shards,
        write_pbf_ways_shards,
    )

    nodes = ray.data.from_items(
        [{"node_id": int(i), "lat_mdeg": int(i % 170000 - 85000),
          "lon_mdeg": int((i * 7) % 360000 - 180000)} for i in range(1, 501)]
    )
    man = write_pbf_nodes_shards(nodes, str(tmp_path / "nodes")).to_pandas()
    assert man["n_nodes"].sum() == 500
    back = []
    for p in man["path"]:
        back.append(read_pbf_nodes(p).to_pandas())
    import pandas as pd

    allb = pd.concat(back).sort_values("node_id").reset_index(drop=True)
    assert len(allb) == 500
    assert allb["lat_mdeg"].tolist() == [i % 170000 - 85000 for i in range(1, 501)]

    refs = ray.data.from_items(
        [{"way_id": int(w), "seq": int(s), "node_id": int(w * 100 + s)}
         for w in range(1, 41) for s in range(1, (w % 5) + 3)]
    )
    man2 = write_pbf_ways_shards(refs, str(tmp_path / "ways"), n_buckets=4).to_pandas()
    assert man2["n_ways"].sum() == 40
    got = pd.concat([read_pbf_way_refs(p).to_pandas() for p in man2["path"]])
    got = got.sort_values(["way_id", "seq"]).reset_index(drop=True)
    exp = refs.to_pandas().sort_values(["way_id", "seq"]).reset_index(drop=True)
    assert got.equals(exp)


def test_dense_info_and_header(tmp_path):
    from planetiler_ray.sources.osmpbf import (
        check_required_features,
        read_blob_entities,
        read_pbf_header,
    )

    path = str(tmp_path / "info.osm.pbf")
    ids = np.array([1, 5, 9], np.int64)
    info = {
        "version": np.array([1, 3, 2], np.int64),
        "timestamp": np.array([1_600_000_000, 1_600_000_050, 1_599_999_000], np.int64),
        "changeset": np.array([77, 77, 90], np.int64),
        "uid": np.array([42, -1, 42], np.int64),
    }
    with PbfWriter(path) as w:
        w.write_dense_nodes(ids, ids * 1_000_000, ids * 2_000_000, info=info)
    hdr = read_pbf_header(path)
    assert hdr["required_features"] == ["OsmSchema-V0.6", "DenseNodes"]
    assert hdr["writingprogram"] == "planetiler_ray"
    check_required_features(path)  # no raise
    b = [x for x in scan_blobs(path) if x["type"] == "OSMData"][0]
    ent = read_blob_entities(path, b["offset"], b["size"])["nodes"]
    assert np.array_equal(ent["version"], info["version"])
    assert np.array_equal(ent["timestamp"], info["timestamp"])
    assert np.array_equal(ent["changeset"], info["changeset"])
    assert np.array_equal(ent["uid"], info["uid"])

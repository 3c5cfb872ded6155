"""OSM-style way ⋈ node shuffle-join pipeline tests."""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"


def test_way_assembly_matches_oracle(ray_session):
    from planetiler_ray.pipelines import osm

    df = osm.assemble_ways(SF).to_pandas().sort_values("way_id", ignore_index=True)
    con = duckdb.connect()
    for t in ["lineitem", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    exp = con.execute(osm.sql_way_assembly()).fetchdf().sort_values(
        "way_id", ignore_index=True
    )
    assert len(df) == len(exp)
    for col in ["way_id", "n_nodes", "len2_sum", "first_node", "last_node"]:
        assert (df[col].astype("int64") == exp[col].astype("int64")).all(), col


def test_way_lines(ray_session):
    from planetiler_ray.geo import wkb
    from planetiler_ray.pipelines import osm

    df = osm.way_lines_ds(SF).to_pandas()
    assert len(df) > 0
    k, coords = wkb.decode_wkb(df.iloc[0]["geom_wkb"])
    assert k == "linestring" and len(coords) == df.iloc[0]["n_nodes"]


def test_shard_layout_roundtrip(ray_session, tmp_path):
    from planetiler_ray.geo import mvt
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.sinks.files import read_shard_tile

    out = str(tmp_path / "shards")
    df = flagship.build_archive(SF, out, zooms=[2, 6], n_buckets=32, layout="shard")
    assert df.n_tiles.sum() > 0
    blob = read_shard_tile(out, 6, 32, 22, n_buckets=32)
    assert blob is not None
    d = mvt.decode_tile(mvt.gunzip_tile(blob))
    assert "places" in d
    # resume skips
    df2 = flagship.build_archive(SF, out, zooms=[2, 6], n_buckets=32, layout="shard")
    assert df2.skipped.all()


def test_native_join_equivalent(ray_session):
    """Ray's native Dataset.join produces the same joined rows as our
    explicit bucketed hash join."""
    from planetiler_ray.pipelines import osm

    cols = ["way_id", "seq", "node_id", "lat_mdeg", "lon_mdeg"]
    a = (
        osm.join_way_nodes(SF)
        .to_pandas()[cols]
        .sort_values(cols, ignore_index=True)
    )
    b = (
        osm.join_way_nodes_native(SF, num_partitions=4)
        .to_pandas()[cols]
        .sort_values(cols, ignore_index=True)
    )
    assert len(a) == len(b)
    for c in cols:
        assert (a[c].astype("int64") == b[c].astype("int64")).all(), c


def test_membership_role_encoding_roundtrip():
    """rel_id | role << 48 packing (OsmReader.java:679-701 semantics)."""
    import numpy as np

    from planetiler_ray.pipelines.osm import decode_membership, encode_membership

    rel = np.array([1, 999_999_999_999, 0, 123456], dtype=np.int64)
    role = np.array([1, 2, 3, 15], dtype=np.int64)
    enc = encode_membership(rel, role)
    r2, ro2 = decode_membership(enc)
    np.testing.assert_array_equal(r2, rel)
    np.testing.assert_array_equal(ro2, role)


def test_ancestor_closure_cycle_safe():
    """DFS closure terminates on relation cycles (visited-set semantics of
    OsmReader.getRelationInfosForRelationId)."""
    import pandas as pd

    from planetiler_ray.pipelines.osm import _ancestor_closure

    edges = pd.DataFrame(
        {"rel_id": [1, 2, 3, 10], "parent_id": [2, 3, 1, 11], "role_id": [3, 3, 3, 3]}
    )
    c = _ancestor_closure(edges)
    assert {p for p, _, _ in c[1]} == {2, 3}  # cycle closed without 1 itself
    assert c[10] == [(11, 3, 1)]

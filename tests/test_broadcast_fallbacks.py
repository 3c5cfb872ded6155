"""Parity between the broadcast-node-store fast paths and their exchange
fallbacks, plus bucketed-graph edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray

SF = "/root/testdata/sf0.001"


def test_joined_way_rows_fallback_parity(ray_session):
    from planetiler_ray.pipelines import osm

    cols = ["way_id", "seq", "node_id", "lat_mdeg", "lon_mdeg", "wbucket"]
    a = osm.joined_way_rows(SF).to_pandas().sort_values(
        ["way_id", "seq", "node_id"], ignore_index=True)
    b = osm.joined_way_rows(SF, node_broadcast_max=0).to_pandas().sort_values(
        ["way_id", "seq", "node_id"], ignore_index=True)
    pd.testing.assert_frame_equal(a[cols], b[cols])


def test_map_match_fallback_parity(ray_session):
    from planetiler_ray.pipelines import osm

    a = osm.map_match(SF).to_pandas().sort_values(
        "probe_id", ignore_index=True)
    b = osm.map_match(SF, node_broadcast_max=0).to_pandas().sort_values(
        "probe_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_bucketed_graph_empty_and_tiny(ray_session):
    from planetiler_ray.stages import graph

    # graph with a single self-loop: canonical edge set is EMPTY
    e = ray.data.from_pandas(pd.DataFrame({"src": [3], "dst": [3]}))
    kc = graph.kcore_bucketed(e, n_nodes=5, k=1, rounds=2,
                              n_buckets=4).to_pandas()
    assert len(kc) == 5 and (kc["deg"] == 0).all() and (
        kc["in_core"] == 0).all()
    pr = graph.pagerank_bucketed(e, n_nodes=5, iters=2,
                                 n_buckets=4).to_pandas()
    bb = graph.pagerank_int(e, n_nodes=5, iters=2)
    pd.testing.assert_frame_equal(
        bb, pr.sort_values("node_id", ignore_index=True))
    tri = graph.triangles_bucketed(e, n_nodes=5, n_buckets=4).to_pandas()
    assert tri["n_triangles"].iloc[0] == 0 and tri["n_edges"].iloc[0] == 0


def test_bucketed_graph_more_buckets_than_nodes(ray_session):
    from planetiler_ray.stages import graph

    e = ray.data.from_pandas(
        pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]}))
    bb = graph.sssp_rounds(e, n_nodes=4, seed_mod=101,
                           rounds=3).reset_index(drop=True)
    bk = graph.sssp_bucketed(e, n_nodes=4, seed_mod=101, rounds=3,
                             n_buckets=64).to_pandas().sort_values(
        "node_id", ignore_index=True)
    pd.testing.assert_frame_equal(bb, bk)

"""Connected-components clustering over near-dup pair Datasets."""

import numpy as np


def test_connected_components_chains_and_stars(ray_session):
    import ray.data

    from planetiler_ray.stages.dedup import connected_components

    # chain 1-2-3-4-5 (diameter 4), star 10-{11,12,13}, pair 20-21,
    # plus a bridge merging the star into the chain via 5-10
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13),
             (20, 21), (5, 10)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    out = connected_components(ds).to_pandas().sort_values("node")
    comp = dict(zip(out["node"], out["comp"]))
    assert {comp[n] for n in (1, 2, 3, 4, 5, 10, 11, 12, 13)} == {1}
    assert comp[20] == comp[21] == 20
    assert len(comp) == 11


def test_connected_components_singleton_pairs(ray_session):
    import ray.data

    from planetiler_ray.stages.dedup import connected_components

    ds = ray.data.from_items([{"a": 7, "b": 3}])
    out = connected_components(ds).to_pandas()
    assert sorted(out["comp"]) == [3, 3]

"""Sharded documents/ input layout: read parallelism from files (the
100 TB arrival shape), no repartition on the read path, byte-identical
tiles vs the single-file layout."""

import os

import pytest

SF = "/root/testdata/sf0.001"


def test_sharded_documents_parity(ray_session, tmp_path):
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.sources.pages import documents_path, shard_documents

    sh = shard_documents(SF, str(tmp_path / "sf"), n_shards=8)
    assert documents_path(sh).endswith("/documents")
    assert documents_path(SF).endswith("documents.parquet")
    assert len(os.listdir(os.path.join(sh, "documents"))) == 8

    a = flagship.tiles_ds(SF, zooms=[0, 2, 4]).to_pandas().sort_values(
        "tile_id", ignore_index=True)
    b = flagship.tiles_ds(sh, zooms=[0, 2, 4]).to_pandas().sort_values(
        "tile_id", ignore_index=True)
    assert len(a) == len(b)
    assert (a["content_hash"] == b["content_hash"]).all()

    # idempotent re-shard
    sh2 = shard_documents(SF, str(tmp_path / "sf"), n_shards=8)
    assert sh2 == sh


def test_sharded_read_has_no_repartition(ray_session, tmp_path):
    """The sharded layout's execution plan must NOT contain a Repartition
    stage — parallelism comes from the input files."""
    from planetiler_ray.pipelines import webgeo
    from planetiler_ray.sources.pages import shard_documents

    sh = shard_documents(SF, str(tmp_path / "sf"), n_shards=8)
    plan_sharded = str(webgeo.pages_ds(sh).materialize().stats())
    assert "Repartition" not in plan_sharded
    plan_single = str(webgeo.pages_ds(SF).materialize().stats())
    assert "Repartition" in plan_single

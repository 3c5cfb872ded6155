"""Files archive sink: ``{out}/{z}/{x}/{y}.pbf`` directory tree.

Mirrors the reference's ``files/WriteableFilesArchive.java`` (its simplest,
embarrassingly-parallel archive) — our FIRST sink, and the resumable one:
tiles are bucketed by ``tile_id >> BUCKET_SHIFT``; each bucket writes its
tiles then an atomic manifest (tmp + rename).  A rerun skips buckets whose
manifest already exists — that is the per-partition lineage / checkpoint
resume required by BASELINE.json's north_rule (the reference's analogue is
``--reuse_featuredb``, ``Planetiler.java:862-979``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from ..stages.assemble import hash_bucket, make_bucket_assembler


def add_bucket(batch: pa.Table, n_buckets: int = 1024) -> pa.Table:
    return batch.append_column(
        "bucket",
        pa.array(hash_bucket(batch.column("tile_id").to_numpy(), n_buckets), pa.int64()),
    )


def make_bucket_writer(out_dir: str, lineage: dict | None = None):
    """map_groups body over ``bucket``: writes one bucket's tiles + manifest.

    Returns per-bucket summary rows (bucket, n_tiles, n_bytes, skipped).
    """

    def write_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(manifest_dir, exist_ok=True)
        manifest_path = os.path.join(manifest_dir, f"bucket_{bucket}.json")
        if os.path.exists(manifest_path):
            return pa.table(
                {
                    "bucket": pa.array([bucket], pa.int64()),
                    "n_tiles": pa.array([group.num_rows], pa.int64()),
                    "n_bytes": pa.array([0], pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        zs = group.column("z").to_numpy()
        xs = group.column("tile_x").to_numpy()
        ys = group.column("tile_y").to_numpy()
        blobs = group.column("tile_gz").to_pylist()
        hashes = group.column("content_hash").to_numpy()
        total = 0
        entries = []
        for z, x, y, blob, h in zip(zs, xs, ys, blobs, hashes):
            d = os.path.join(out_dir, str(int(z)), str(int(x)))
            os.makedirs(d, exist_ok=True)
            path = os.path.join(d, f"{int(y)}.pbf")
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
            total += len(blob)
            entries.append([int(z), int(x), int(y), int(h)])
        manifest = {
            "bucket": bucket,
            "n_tiles": len(entries),
            "n_bytes": total,
            "tiles": entries,
            "lineage": lineage or {},
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, manifest_path)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int64()),
                "n_tiles": pa.array([len(entries)], pa.int64()),
                "n_bytes": pa.array([total], pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    return write_bucket


def make_shard_writer(out_dir: str, lineage: dict | None = None):
    """Per-bucket SHARD writer: one parquet file per bucket holding (tile_id,
    z, x, y, tile_gz, content_hash) — the cluster-scale output layout (ONE
    file per partition, not one per tile; cf. the reference's single-file
    archives).  Same atomic manifest + skip semantics as the files layout.
    """
    import pyarrow.parquet as pq

    def write_bucket(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        manifest_dir = os.path.join(out_dir, "_manifest")
        os.makedirs(manifest_dir, exist_ok=True)
        shard_dir = os.path.join(out_dir, "shards")
        os.makedirs(shard_dir, exist_ok=True)
        manifest_path = os.path.join(manifest_dir, f"bucket_{bucket}.json")
        shard_path = os.path.join(shard_dir, f"bucket_{bucket}.parquet")
        n_bytes = int(sum(len(b) for b in group.column("tile_gz").to_pylist()))
        tmp = shard_path + ".tmp"
        tbl = group.drop_columns(["bucket"]).sort_by("tile_id")
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, shard_path)
        manifest = {
            "bucket": bucket,
            "n_tiles": group.num_rows,
            "n_bytes": n_bytes,
            "shard": os.path.basename(shard_path),
            "lineage": lineage or {},
        }
        mt = manifest_path + ".tmp"
        with open(mt, "w") as f:
            json.dump(manifest, f)
        os.replace(mt, manifest_path)
        return pa.table(
            {
                "bucket": pa.array([bucket], pa.int64()),
                "n_tiles": pa.array([group.num_rows], pa.int64()),
                "n_bytes": pa.array([n_bytes], pa.int64()),
                "skipped": pa.array([False]),
            }
        )

    return write_bucket


def make_assemble_write_bucket(profile, out_dir: str, lineage: dict | None = None,
                               layout: str = "files"):
    """map_groups body over ``bucket`` of RAW tile rows: assemble all tiles of
    the bucket, write them, manifest atomically.  If the bucket's manifest
    already exists the whole bucket (assembly included) is SKIPPED — that's
    the checkpoint-resume fast path.

    ``layout``: "files" = ``{z}/{x}/{y}.pbf`` tree (reference files-archive
    parity); "shard" = one parquet shard per bucket (the at-scale layout).
    """

    assembler = make_bucket_assembler(profile)
    writer = (make_bucket_writer(out_dir, lineage) if layout == "files"
              else make_shard_writer(out_dir, lineage))

    def assemble_write(group: pa.Table) -> pa.Table:
        bucket = int(group.column("bucket")[0].as_py())
        manifest_path = os.path.join(out_dir, "_manifest", f"bucket_{bucket}.json")
        if os.path.exists(manifest_path):
            with open(manifest_path) as f:
                m = json.load(f)
            return pa.table(
                {
                    "bucket": pa.array([bucket], pa.int64()),
                    "n_tiles": pa.array([m["n_tiles"]], pa.int64()),
                    "n_bytes": pa.array([m["n_bytes"]], pa.int64()),
                    "skipped": pa.array([True]),
                }
            )
        tiles = assembler(group.drop_columns(["bucket"]))
        tiles = tiles.append_column(
            "bucket", pa.array(np.full(tiles.num_rows, bucket), pa.int64())
        )
        return writer(tiles)

    return assemble_write


def write_files_archive(tile_rows_ds, out_dir: str, profile, lineage: dict | None = None,
                        n_buckets: int = 1024, layout: str = "files"):
    """Assemble + write an archive from RAW tile rows in ONE shuffle:
    groupby(bucket) -> per-bucket assemble + write.  Returns summary Dataset.
    """
    os.makedirs(out_dir, exist_ok=True)
    return (
        tile_rows_ds.map_batches(
            add_bucket, batch_format="pyarrow", fn_kwargs={"n_buckets": n_buckets}
        )
        .groupby("bucket")
        .map_groups(make_assemble_write_bucket(profile, out_dir, lineage, layout),
                    batch_format="pyarrow")
    )


def read_shard_tile(out_dir: str, z: int, x: int, y: int, n_buckets: int = 1024) -> bytes | None:
    """Random tile lookup in the sharded layout (bucket by tile-id hash)."""
    import pyarrow.parquet as pq

    from ..geo import tile as T

    tid = int(T.encode_tile_id(z, x, y))
    bucket = int(hash_bucket(np.array([tid]), n_buckets)[0])
    path = os.path.join(out_dir, "shards", f"bucket_{bucket}.parquet")
    if not os.path.exists(path):
        return None
    t = pq.read_table(path, filters=[("tile_id", "=", tid)])
    if t.num_rows == 0:
        return None
    return t.column("tile_gz")[0].as_py()


def read_tile(out_dir: str, z: int, x: int, y: int) -> bytes:
    with open(os.path.join(out_dir, str(z), str(x), f"{y}.pbf"), "rb") as f:
        return f.read()

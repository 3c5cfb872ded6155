"""Resource preflight estimation (the reference's pre-run disk/RAM check,
``Planetiler.java:998-1065`` + ``util/ResourceUsage.java``): predict stage
row counts, shuffle bytes and peak object-store footprint BEFORE a build,
and warn when the cluster looks too small.

Method: parquet FOOTERS give exact input row/byte counts for free; the
doc-derived stages are measured by running the REAL pipeline over a
bounded sample (first ``sample_rows`` documents, small supporting tables
symlinked) and scaling linearly by ``n_docs * repl / sample``.  Linear
scaling is exact for per-document emission and an UPPER bound once the
pre-shuffle label-grid combiner starts pruning (more docs => more rows
over each grid cap), so the estimate errs safe — the direction you want
when deciding whether a 100 TB job fits the object store.  Distinct-tile
counts do NOT scale linearly; the report gives the sampled count as a
lower bound and ``min(zoom-universe, rows)`` as the cap.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _sample_sf_dir(sf_dir: str, sample_rows: int) -> tuple[str, int]:
    """Temp sf-layout dir: first ``sample_rows`` documents + symlinks to
    every other (small) table.  Returns (tmp_dir, sampled_doc_count)."""
    tmp = tempfile.mkdtemp(prefix="preflight_")
    pf = pq.ParquetFile(os.path.join(sf_dir, "documents.parquet"))
    batches = []
    got = 0
    for b in pf.iter_batches(batch_size=min(sample_rows, 65536)):
        batches.append(b)
        got += b.num_rows
        if got >= sample_rows:
            break
    tbl = pa.Table.from_batches(batches)
    if tbl.num_rows > sample_rows:
        tbl = tbl.slice(0, sample_rows)
    pq.write_table(tbl, os.path.join(tmp, "documents.parquet"))
    for f in os.listdir(sf_dir):
        if f != "documents.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(tmp, f))
    return tmp, tbl.num_rows


def _tile_universe(zooms) -> int:
    zs = zooms if zooms is not None else range(15)
    return int(sum(4**int(z) for z in zs))


def estimate_build(sf_dir: str, zooms=None, repl: int = 1,
                   n_buckets: int = 1024, sample_rows: int = 500) -> dict:
    """Estimate the flagship build's footprint.  Returns a dict of
    predictions + ``warnings`` (list of strings)."""
    import shutil

    import ray

    from . import flagship

    meta = pq.read_metadata(os.path.join(sf_dir, "documents.parquet"))
    n_docs = meta.num_rows
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f))
        for f in os.listdir(sf_dir) if f.endswith(".parquet"))

    sample_rows = min(sample_rows, n_docs)
    tmp, sampled = _sample_sf_dir(sf_dir, sample_rows)
    try:
        pr = flagship.point_rows_ds(tmp, zooms).materialize()
        point_rows_s = pr.count()
        point_bytes_s = pr.size_bytes()
        tiles_s = pr.map_batches(
            lambda b: pa.table({"tile_id": pa.array(
                np.unique(b.column("tile_id").to_numpy()), pa.int64())}),
            batch_format="pyarrow").groupby("tile_id").count().count()
        ar = flagship.admin_rows_ds(tmp, zooms).materialize()
        admin_rows = ar.count()      # independent of the documents table
        admin_bytes = ar.size_bytes()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    scale = (n_docs * repl) / max(sampled, 1)
    point_rows = int(point_rows_s * scale)
    point_bytes = int(point_bytes_s * scale)
    shuffle_rows = point_rows + admin_rows
    shuffle_bytes = point_bytes + admin_bytes
    universe = _tile_universe(zooms)
    tiles_lo = tiles_s
    tiles_hi = int(min(universe, shuffle_rows))
    # tile archive bytes: tile-row payloads gzip to roughly 10-25% once
    # encoded; use 25% of shuffle bytes as the safe (upper) planning figure
    out_bytes_hi = int(shuffle_bytes * 0.25)

    warnings = []
    obj_store = None
    try:
        if ray.is_initialized():
            obj_store = int(ray.cluster_resources().get(
                "object_store_memory", 0)) or None
    except Exception:
        pass
    # the sort-based groupby holds map outputs + reduce inputs; 2x the
    # shuffle payload is the planning figure (spill beyond it is fine but
    # slow)
    peak_object_store = 2 * shuffle_bytes
    if obj_store and peak_object_store > obj_store:
        warnings.append(
            f"estimated shuffle peak {peak_object_store/2**30:.1f} GiB "
            f"exceeds object store {obj_store/2**30:.1f} GiB — expect "
            "spilling; raise cluster memory or shard the input")
    rows_per_bucket = shuffle_rows / max(n_buckets, 1)
    if rows_per_bucket > 2_000_000:
        warnings.append(
            f"~{rows_per_bucket/1e6:.1f}M rows/bucket at n_buckets="
            f"{n_buckets}; raise n_buckets to "
            f"{int(shuffle_rows // 500_000)} to keep assembly groups "
            "under ~500k rows")

    return {
        "sf_dir": sf_dir,
        "zooms": list(zooms) if zooms is not None else list(range(15)),
        "repl": repl,
        "n_docs": n_docs * repl,
        "sampled_docs": sampled,
        "input_bytes": input_bytes,
        "est_point_rows": point_rows,
        "admin_rows": admin_rows,
        "est_shuffle_rows": shuffle_rows,
        "est_shuffle_bytes": shuffle_bytes,
        "est_peak_object_store_bytes": peak_object_store,
        "est_tiles_min": tiles_lo,
        "est_tiles_max": tiles_hi,
        "est_archive_bytes_max": out_bytes_hi,
        "object_store_bytes": obj_store,
        "warnings": warnings,
    }


def format_plan(est: dict) -> str:
    gib = 2**30
    lines = [
        f"plan for {est['sf_dir']} zooms={est['zooms']} repl={est['repl']}",
        f"  input:   {est['n_docs']:>14,} docs   "
        f"{est['input_bytes']/gib:8.2f} GiB parquet",
        f"  rows:    {est['est_shuffle_rows']:>14,} tile rows "
        f"({est['est_point_rows']:,} points + {est['admin_rows']:,} admin)",
        f"  shuffle: {est['est_shuffle_bytes']/gib:8.2f} GiB payload, "
        f"~{est['est_peak_object_store_bytes']/gib:.2f} GiB object-store peak",
        f"  tiles:   {est['est_tiles_min']:,} .. {est['est_tiles_max']:,}; "
        f"archive <= {est['est_archive_bytes_max']/gib:.2f} GiB",
    ]
    for w in est["warnings"]:
        lines.append(f"  WARNING: {w}")
    if not est["warnings"]:
        lines.append("  fits: no warnings")
    return "\n".join(lines)

"""WebDataset-style sharded tar sink/source for document corpora.

The de-facto interchange layout for large-scale LLM/multimodal training
(Webdataset: https://github.com/webdataset/webdataset — public format:
a POSIX tar whose members group by key prefix; sample key.txt carries the
payload, key.json the metadata).  Stdlib ``tarfile`` only.

Scale shape mirrors the tile sinks: one tar per id-hash shard written by
the task that owns the shard's rows (ONE groupby), atomic tmp+rename with
a JSON manifest per shard — a rerun skips finished shards (resumability
contract of `sinks/files.py`).  Readers stream members per shard in
parallel.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import numpy as np
import pyarrow as pa


def write_webdataset(ds, out_dir: str, n_shards: int = 64,
                     id_col: str = "doc_id", text_col: str = "text",
                     meta_cols: tuple = ()):
    """Write documents as ``shard-%05d.tar`` under ``out_dir``.

    Returns the manifest list (shard, n_samples, bytes).  Deterministic:
    samples sort by id within their id-hash shard, so re-runs produce
    byte-identical tars.
    """
    meta_cols = tuple(meta_cols)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        sh = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
              >> np.uint64(41)).astype(np.int64) % n_shards
        return batch.append_column("_shard", pa.array(sh, pa.int64()))

    os.makedirs(os.path.join(out_dir, "_manifest"), exist_ok=True)

    def write_shard(g: pa.Table) -> pa.Table:
        shard = int(g.column("_shard")[0].as_py())
        name = f"shard-{shard:05d}.tar"
        path = os.path.join(out_dir, name)
        mpath = os.path.join(out_dir, "_manifest", name + ".json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            return pa.table({"shard": pa.array([shard], pa.int64()),
                             "n_samples": pa.array([m["n_samples"]], pa.int64()),
                             "n_bytes": pa.array([m["n_bytes"]], pa.int64()),
                             "skipped": pa.array([True])})
        ids = g.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        texts = g.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        metas = {c: g.column(c).to_pylist() for c in meta_cols}
        tmp = path + ".tmp"
        with tarfile.open(tmp, "w") as tf:
            for i in order:
                key = f"{int(ids[i]):012d}"
                payload = texts[int(i)].as_py().encode("utf-8")
                ti = tarfile.TarInfo(name=f"{key}.txt")
                ti.size = len(payload)
                ti.mtime = 0  # frozen: byte-identical re-runs
                tf.addfile(ti, io.BytesIO(payload))
                meta = {c: metas[c][int(i)] for c in meta_cols}
                mb = json.dumps(meta, sort_keys=True).encode("utf-8")
                tj = tarfile.TarInfo(name=f"{key}.json")
                tj.size = len(mb)
                tj.mtime = 0
                tf.addfile(tj, io.BytesIO(mb))
        os.replace(tmp, path)
        n_bytes = os.path.getsize(path)
        mtmp = mpath + ".tmp"
        with open(mtmp, "w") as f:
            json.dump({"shard": shard, "n_samples": len(ids),
                       "n_bytes": n_bytes}, f)
        os.replace(mtmp, mpath)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "n_samples": pa.array([len(ids)], pa.int64()),
                         "n_bytes": pa.array([n_bytes], pa.int64()),
                         "skipped": pa.array([False])})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pyarrow")
    )


def read_webdataset(out_dir: str, meta_cols: tuple = ()):
    """Stream a webdataset directory back into a Dataset
    (doc_id, text, *meta_cols) — shards decode in parallel."""
    import ray

    shards = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir)
        if f.endswith(".tar")
    )

    def decode(batch):
        rows = {"doc_id": [], "text": []}
        for c in meta_cols:
            rows[c] = []
        for path in batch["path"]:
            with tarfile.open(path, "r") as tf:
                pending = {}
                for member in tf:
                    key, ext = member.name.rsplit(".", 1)
                    pending.setdefault(key, {})[ext] = tf.extractfile(member).read()
                for key in sorted(pending):
                    d = pending[key]
                    rows["doc_id"].append(int(key))
                    rows["text"].append(d["txt"].decode("utf-8"))
                    meta = json.loads(d["json"]) if "json" in d else {}
                    for c in meta_cols:
                        rows[c].append(meta.get(c))
        out = {"doc_id": pa.array(rows["doc_id"], pa.int64()),
               "text": pa.array(rows["text"], pa.string())}
        for c in meta_cols:
            out[c] = pa.array(rows[c])
        return pa.table(out)

    return ray.data.from_items(
        [{"path": p} for p in shards]
    ).map_batches(decode, batch_format="pandas", batch_size=1)

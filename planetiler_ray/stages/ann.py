"""Similarity search over embedding columns (list<float>).

* :func:`brute_topk` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), each batch does one float64 matmul against it and emits
  per-batch partial top-k rows; a final tiny groupby keeps the global top-k.
  This is the oracle-checkable baseline (DuckDB ``list_cosine_similarity``).
* :func:`ivf_topk` — IVF-style scale path: vectors are bucketed by nearest
  centroid (k-means-lite on a sample, deterministic seed); queries probe the
  ``n_probe`` nearest centroid buckets only.  Approximate -> rows-only check.
* :func:`embedding_neardup` — near-duplicate pairs with cosine >= tau via the
  same bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = batch.column(col)
    if arr.num_chunks > 0:
        flat = np.concatenate([c.flatten().to_numpy(zero_copy_only=False) for c in arr.chunks])
    else:
        flat = arr.flatten().to_numpy(zero_copy_only=False)
    dim = len(arr[0])
    return flat.reshape(-1, dim).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.sqrt((m * m).sum(axis=1, keepdims=True))
    n[n == 0] = 1.0
    return m / n


def brute_topk(ds, queries_handle, k: int = 5, id_col: str = "vec_id",
               col: str = "embedding"):
    """Exact cosine top-k of each broadcast query vs the whole Dataset.

    ``queries_handle``: ray.put((query_ids, query_matrix)) or the raw tuple.
    Output rows: query_id, rank (1-based), neighbor_id.  Self-matches are
    excluded.  Ranking ties break on smaller neighbor_id.
    """
    import ray
    from ray.data.aggregate import AggregateFn  # noqa: F401  (doc pointer)

    def partial(batch: pa.Table) -> pa.Table:
        q = queries_handle
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        q_ids, q_mat = q
        m = _normalize(_to_matrix(batch, col))
        sims = _normalize(np.asarray(q_mat, dtype=np.float64)) @ m.T  # (nq, nb)
        ids = batch.column(id_col).to_numpy()
        nq, nb = sims.shape
        kk = min(k + 1, nb)  # +1 to survive dropping self below
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for i in range(nq):
            out_q.append(np.full(kk, q_ids[i], dtype=np.int64))
            out_id.append(ids[part[i]])
            out_s.append(sims[i, part[i]])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["query_id"] != group["neighbor_id"]]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final, batch_format="pandas")
    )


# ----------------------------------------------------------------- IVF-ish --

def train_centroids(sample: np.ndarray, n_clusters: int = 16, iters: int = 10,
                    seed: int = 13) -> np.ndarray:
    """Deterministic k-means-lite (Lloyd on a sample) for IVF bucketing."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_topk(ds, queries_handle, centroids_handle, k: int = 5, n_probe: int = 4,
             id_col: str = "vec_id", col: str = "embedding"):
    """IVF approximate top-k: per batch, only vectors whose centroid is among
    each query's ``n_probe`` probed centroids contribute candidates."""
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        q = queries_handle
        c = centroids_handle
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        if isinstance(c, ray.ObjectRef):
            c = ray.get(c)
        q_ids, q_mat = q
        cent = np.asarray(c)
        m = _normalize(_to_matrix(batch, col))
        ids = batch.column(id_col).to_numpy()
        vec_cent = np.argmax(m @ cent.T, axis=1)
        qn = _normalize(np.asarray(q_mat, dtype=np.float64))
        probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
        out_q, out_id, out_s = [], [], []
        for i in range(len(qn)):
            mask = np.isin(vec_cent, probe[i])
            if not mask.any():
                continue
            sims = qn[i] @ m[mask].T
            cand_ids = ids[mask]
            kk = min(k + 1, len(cand_ids))
            part = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(kk, q_ids[i], dtype=np.int64))
            out_id.append(cand_ids[part])
            out_s.append(sims[part])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "sim": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["query_id"] != group["neighbor_id"]]
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final, batch_format="pandas")
    )


def embedding_neardup(ds, tau: float = 0.95, id_col: str = "vec_id",
                      col: str = "embedding", n_clusters: int = 16):
    """Near-duplicate pairs (cosine >= tau, a < b) via centroid bucketing:
    same-bucket pairs only (approximate; near-dups nearly always share the
    nearest centroid).  groupby(bucket) -> pairwise cosine inside the group."""
    import ray

    sample = np.stack(ds.limit(2048).to_pandas()[col].to_numpy()).astype(np.float64)
    cent = train_centroids(sample, n_clusters)
    cent_ref = ray.put(cent)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        m = _normalize(_to_matrix(batch, col))
        b = np.argmax(m @ np.asarray(c).T, axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "bucket": pa.array(b.astype(np.int64), pa.int64()),
                col: batch.column(col),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].to_numpy()
        m = _normalize(np.stack(group[col].to_numpy()).astype(np.float64))
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        mask = sims[ii, jj] >= tau
        a, b = ids[ii[mask]], ids[jj[mask]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a": a2, "b": b2,
                             "sim1000": (sims[ii[mask], jj[mask]] * 1000).astype(np.int64)})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )

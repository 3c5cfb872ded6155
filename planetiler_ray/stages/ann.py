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


def _group_neardup_pairs(ids: np.ndarray, m: np.ndarray, tau: float,
                         cap: int, depth: int = 0):
    """All (a<b, cos>=tau) pairs within one bucket, bounded memory/work.

    Buckets above ``cap`` are recursively bisected by a deterministic
    projection split (direction = farthest vector from the min-id vector;
    median threshold guarantees progress), so no group ever does an
    O(n^2) GEMM over millions of rows — the round-1 scale fix.  Pairs
    straddling a split are missed (the operator is approximate by design;
    the multi-probe bucket emission upstream catches boundary near-dups).
    """
    n = len(ids)
    if n < 2:
        return []
    if n <= cap or depth >= 24:
        # row-chunked GEMM: peak memory is chunk x n (~64 MB of float64),
        # bounded for ANY cap — a bucket at cap no longer allocates an
        # n x n similarity matrix (the round-3 ADVICE fix)
        out = []
        step = max(1, 8_000_000 // max(n, 1))
        for i0 in range(0, n, step):
            i1 = min(n, i0 + step)
            sims = m[i0:i1] @ m.T  # (i1-i0, n)
            ii, jj = np.nonzero(sims >= tau)
            keep = jj > ii + i0  # upper triangle only
            ii, jj = ii[keep], jj[keep]
            a, b = ids[ii + i0], ids[jj]
            swap = a > b
            out.append((np.where(swap, b, a), np.where(swap, a, b),
                        (sims[ii, jj] * 1000).astype(np.int64)))
        return out
    anchor = m[int(np.argmin(ids))]
    far = m[int(np.argmax(m @ anchor * -1.0))]
    axis = far - anchor
    norm = np.linalg.norm(axis)
    proj = m @ (axis / norm) if norm > 0 else m[:, 0]
    thr = np.median(proj)
    left = proj <= thr
    if left.all() or not left.any():  # degenerate (all identical): force halve
        left = np.arange(n) < n // 2
    out = _group_neardup_pairs(ids[left], m[left], tau, cap, depth + 1)
    out += _group_neardup_pairs(ids[~left], m[~left], tau, cap, depth + 1)
    return out


def embedding_neardup(ds, tau: float = 0.95, id_col: str = "vec_id",
                      col: str = "embedding", n_clusters: int | None = None,
                      count_hint: int | None = None, n_probe: int = 2,
                      cap: int = 4096, centroids=None):
    """Near-duplicate pairs (cosine >= tau, a < b) via centroid bucketing.

    Scale design (round-2 rework of the fixed-16-bucket version):
    * ``n_clusters`` grows with the corpus (``count_hint`` rows / ~512 per
      bucket) so bucket population is O(1), not O(N);
    * each vector is emitted into its ``n_probe`` nearest centroid buckets
      (multi-probe) so near-dups straddling a centroid boundary still
      co-occur; duplicate pairs are removed by a combining aggregate;
    * residual oversize buckets are recursively split inside the group
      (:func:`_group_neardup_pairs`) — never an O(n^2) all-pairs blow-up.
    """
    import ray

    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        if n_clusters is None:
            n = count_hint if count_hint is not None else ds.count()
            n_clusters = int(max(16, min(1 << 20, np.ceil(n / 512))))
        # NOTE: ds.limit() order depends on block layout — pass ``centroids``
        # trained from a deterministic sample when reproducibility matters
        sample = np.stack(ds.limit(2048).to_pandas()[col].to_numpy()).astype(np.float64)
        cent = train_centroids(sample, n_clusters)
    cent_ref = ray.put(cent)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = np.asarray(ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref)
        m = _normalize(_to_matrix(batch, col))
        sims = m @ c.T
        k = min(n_probe, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        idx = np.tile(np.arange(len(m), dtype=np.int64), k)
        rep = batch.select([id_col, col]).take(pa.array(idx))
        return rep.append_column(
            "bucket", pa.array(top.T.reshape(-1).astype(np.int64), pa.int64())
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        # a vector probed into 2 buckets can appear twice in one group
        group = group.drop_duplicates(subset=[id_col])
        ids = group[id_col].to_numpy()
        m = _normalize(np.stack(group[col].to_numpy()).astype(np.float64))
        chunks = _group_neardup_pairs(ids, m, tau, cap)
        if not chunks:
            return pd.DataFrame({"a": [], "b": [], "sim1000": []}, dtype=np.int64)
        return pd.DataFrame(
            {
                "a": np.concatenate([c[0] for c in chunks]),
                "b": np.concatenate([c[1] for c in chunks]),
                "sim1000": np.concatenate([c[2] for c in chunks]),
            }
        )

    cand = (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    from .bucketagg import bucketed_sum, count_min_partial

    # per-batch (a,b) partial so only distinct per-batch pairs are
    # shuffled (bucketed_sum's pre-aggregation contract, ADVICE r3)
    part = cand.map_batches(
        count_min_partial(["a", "b"], "_one", [("sim1000", "sim1000")]),
        batch_format="pyarrow",
    )
    return bucketed_sum(
        part, ["a", "b"], [("_one", "_n")], mins=[("sim1000", "sim1000")]
    ).select_columns(["a", "b", "sim1000"])


# ------------------------------------------------- product quantization --


def train_pq(sample: np.ndarray, n_subspaces: int = 8, n_codes: int = 256,
             iters: int = 10, seed: int = 29) -> np.ndarray:
    """Deterministic PQ codebooks (Jegou et al. 2011, "Product Quantization
    for Nearest Neighbor Search"): split the (normalized) vector into
    ``n_subspaces`` contiguous sub-vectors, k-means each subspace on the
    sample.  Returns (n_subspaces, n_codes, sub_dim) float64.

    At 100 TB this is the memory story: a 64-dim float32 vector (256 B)
    compresses to ``n_subspaces`` uint8 codes (8 B) — the whole corpus'
    codes fit in RAM for the ADC scan while raw vectors stay in Parquet.
    """
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n, dim = sample.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    k = min(n_codes, n)
    books = np.empty((n_subspaces, k, sub), dtype=np.float64)
    for s in range(n_subspaces):
        x = sample[:, s * sub:(s + 1) * sub]
        idx = rng.choice(n, size=k, replace=False)
        cent = x[idx].copy()
        for _ in range(iters):
            # squared L2 assignment (PQ quantizes raw sub-vectors, not angles)
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                m = assign == c
                if m.any():
                    cent[c] = x[m].mean(axis=0)
        books[s] = cent
    return books


def _pq_codes(m: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode normalized vectors -> (n, n_subspaces) uint8 codes (one
    argmin-of-squared-distance GEMM per subspace, vectorized)."""
    n_sub, k, sub = books.shape
    codes = np.empty((len(m), n_sub), dtype=np.uint8)
    for s in range(n_sub):
        x = m[:, s * sub:(s + 1) * sub]
        # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
        d = -2.0 * (x @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
        codes[:, s] = np.argmin(d, axis=1)
    return codes


def pq_encode(ds, codebooks_handle, id_col: str = "vec_id",
              col: str = "embedding"):
    """Dataset op: vec_id + PQ codes (fixed-size binary, n_subspaces bytes)."""
    import ray

    def enc(batch: pa.Table) -> pa.Table:
        books = codebooks_handle
        if isinstance(books, ray.ObjectRef):
            books = ray.get(books)
        m = _normalize(_to_matrix(batch, col))
        codes = _pq_codes(m, books)
        n_sub = codes.shape[1]
        buf = pa.py_buffer(np.ascontiguousarray(codes).tobytes())
        arr = pa.Array.from_buffers(pa.binary(n_sub), len(codes), [None, buf])
        return pa.table({id_col: batch.column(id_col), "pq_code": arr})

    return ds.map_batches(enc, batch_format="pyarrow")


def pq_topk(ds, queries_handle, codebooks_handle, k: int = 5,
            rescore: int = 4, id_col: str = "vec_id", col: str = "embedding"):
    """PQ/ADC approximate cosine top-k with exact candidate rescoring.

    Per batch: encode vectors once (uint8 codes), build each query's ADC
    lookup table LUT[s, code] = q_s . c_{s,code} (n_subspaces x n_codes —
    tiny), approximate sim = sum_s LUT[s, code_s] via ONE gather-sum over
    the codes matrix, select k*rescore ADC candidates, rescore those few
    exactly against the raw in-batch vectors, emit exact-sim partials;
    the final merge is the same tiny per-query groupby as brute/IVF.
    The scan's per-vector cost is n_subspaces lookups instead of a dim-wide
    multiply-add — the classic IVFADC scan shape, expressed as a streaming
    ``map_batches`` with broadcast codebooks.  Approximate by design
    (candidate selection can miss), hence rows-only at the gate; recall is
    pinned by unit test against :func:`brute_topk`.
    """
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        q = queries_handle
        b = codebooks_handle
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        if isinstance(b, ray.ObjectRef):
            b = ray.get(b)
        q_ids, q_mat = q
        books = np.asarray(b)
        n_sub, n_codes, sub = books.shape
        m = _normalize(_to_matrix(batch, col))
        ids = batch.column(id_col).to_numpy()
        codes = _pq_codes(m, books)
        qn = _normalize(np.asarray(q_mat, dtype=np.float64))
        nq = len(qn)
        # LUTs for all queries at once: (nq, n_sub, n_codes)
        luts = np.einsum("qsd,scd->qsc", qn.reshape(nq, n_sub, sub), books)
        flat_codes = codes.astype(np.int64) + \
            (np.arange(n_sub, dtype=np.int64) * n_codes)[None, :]
        out_q, out_id, out_s = [], [], []
        kk = min(k * rescore + 1, len(ids))
        for i in range(nq):
            approx = luts[i].ravel()[flat_codes].sum(axis=1)
            cand = np.argpartition(-approx, kk - 1)[:kk]
            exact = qn[i] @ m[cand].T
            out_q.append(np.full(kk, q_ids[i], dtype=np.int64))
            out_id.append(ids[cand])
            out_s.append(exact)
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


# ------------------------------------------------------- cluster assignment --

KMEANS_SCALE = 1 << 14  # power-of-two: x * SCALE is an EXACT float64 multiply


def quantize_embedding(m: np.ndarray) -> np.ndarray:
    """float embedding matrix -> int64 fixed-point (floor(x * 2^14)).

    Both the multiply (power of two) and floor are bit-deterministic, so a
    SQL twin computing ``floor(CAST(x AS DOUBLE) * 16384.0)`` lands on the
    SAME integers — squared distances then compare exactly (int64, ~2^40
    max: also exactly representable if an engine sums in doubles)."""
    return np.floor(m.astype(np.float64) * float(KMEANS_SCALE)).astype(np.int64)


def kmeans_assign(ds, centroids_q: np.ndarray, id_col: str = "vec_id",
                  col: str = "embedding"):
    """Nearest-centroid assignment (the Lloyd-iteration map kernel and the
    IVF routing step, done as an EXACT integer op): for each vector, the
    centroid minimising the fixed-point squared L2 distance, ties broken on
    the smaller centroid index.

    Scale: centroids are a tiny broadcast (ray.put upstream / closure
    capture here — k x d int64), each batch does one vectorized (B, k, d)
    distance reduction; no shuffle at all.  Output: (vec_id, cluster,
    dist2) with dist2 the exact integer distance (what a driver would feed
    the centroid-update groupby of a full Lloyd loop —
    ``train_centroids`` holds the sampled-driver variant)."""
    cq = centroids_q  # (k, d) int64
    k = cq.shape[0]

    def assign(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(col).to_numpy(zero_copy_only=False))
        q = quantize_embedding(m)  # (B, d) int64
        # |q - c|^2 = |q|^2 - 2 q.c + |c|^2 — GEMM form, int64-exact
        # (dot < 64 * 2^34 ~ 2^40, far under both int64 and float53 limits)
        dots = q @ cq.T                                   # (B, k)
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * dots
            + (cq * cq).sum(axis=1)[None, :]
        )
        best = d2.argmin(axis=1)  # first occurrence = smallest centroid idx
        return pa.table(
            {
                "vec_id": batch.column(id_col),
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                "dist2": pa.array(d2[np.arange(len(best)), best], pa.int64()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def mutual_nn(ds, centroids_q: np.ndarray, id_col: str = "vec_id",
              col: str = "embedding", n_buckets: int = 32):
    """Reciprocal nearest neighbours within integer k-means cells — the
    matching/dedup primitive (image-dedup RNN, bitext mining): pairs
    (a < b) where each is the other's nearest neighbour inside its
    assigned cell.  Everything fixed-point integer, so the answer is
    deterministic and the DuckDB twin (:func:`oracle.sql_mutual_nn`)
    agrees bitwise.

    Scale: assignment is the zero-shuffle :func:`kmeans_assign` kernel;
    the ONE exchange groups by cell (grow ``len(centroids_q)`` with the
    corpus — N/512-style, as ``embedding_neardup`` does — so cells stay
    O(1)); the in-cell NN is a row-chunked integer GEMM (bounded memory at
    any cell size); the mutual check is a tiny (a, b) groupby keeping
    pairs seen from BOTH directions."""
    import ray

    cq = np.asarray(centroids_q, dtype=np.int64)

    def assign_keep(batch: pa.Table) -> pa.Table:
        m = quantize_embedding(
            np.stack(batch.column(col).to_numpy(zero_copy_only=False))
        )
        d2 = (
            (m * m).sum(axis=1, keepdims=True)
            - 2 * (m @ cq.T)
            + (cq * cq).sum(axis=1)[None, :]
        )
        return pa.table(
            {
                id_col: batch.column(id_col),
                col: batch.column(col),
                "cell": pa.array(d2.argmin(axis=1).astype(np.int64), pa.int64()),
            }
        )

    def nn_in_cell(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        order = np.argsort(ids)  # id-ascending => argmin tie = smaller id
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "dist2": pa.array([], pa.int64())}
            )
        q = quantize_embedding(
            np.stack(g.column(col).to_numpy(zero_copy_only=False))
        )[order]
        sq = (q * q).sum(axis=1)
        nn_id = np.empty(n, dtype=np.int64)
        nn_d = np.empty(n, dtype=np.int64)
        step = max(1, 8_000_000 // n)  # row-chunked GEMM, bounded memory
        big = np.iinfo(np.int64).max
        for i0 in range(0, n, step):
            i1 = min(n, i0 + step)
            d2 = sq[i0:i1, None] - 2 * (q[i0:i1] @ q.T) + sq[None, :]
            d2[np.arange(i1 - i0), np.arange(i0, i1)] = big  # no self
            j = d2.argmin(axis=1)
            nn_id[i0:i1] = ids[j]
            nn_d[i0:i1] = d2[np.arange(i1 - i0), j]
        return pa.table(
            {
                "a": pa.array(np.minimum(ids, nn_id), pa.int64()),
                "b": pa.array(np.maximum(ids, nn_id), pa.int64()),
                "dist2": pa.array(nn_d, pa.int64()),
            }
        )

    nn = (
        ds.map_batches(assign_keep, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(lambda g: nn_in_cell(g.drop_columns(["cell"])),
                    batch_format="pyarrow")
    )
    # bucketed merge with the mutuality test (n_dir == 2) fused as HAVING;
    # per-batch partial first (each direction is emitted exactly once, so
    # the within-batch count is a valid direction-count partial)
    from .bucketagg import bucketed_sum, count_min_partial

    part = nn.map_batches(
        count_min_partial(["a", "b"], "_one", [("dist2", "dist2")]),
        batch_format="pyarrow",
    )
    return bucketed_sum(
        part, ["a", "b"], [("_one", "n_dir")], mins=[("dist2", "dist2")],
        having=lambda kv, ov: ov["n_dir"] == 2,
    ).select_columns(["a", "b", "dist2"])


def ivf_exact_topk(ds, centroids_q: np.ndarray, query_ids, queries_q: np.ndarray,
                   k: int = 5, n_probe: int = 2, id_col: str = "vec_id",
                   col: str = "embedding"):
    """IVF top-k where EVERY step is a deterministic integer op, so the
    whole inverted-file search path (route -> probe -> scan -> rank) has a
    bitwise SQL twin (:func:`oracle.sql_ivf_exact`) — the exact-oracle
    companion to the float approximate :func:`ivf_topk` (reference parity:
    the IVFADC routing of Jegou et al., done as Ray Data streaming scan).

    * centroids/queries are tiny broadcast int64 fixed-point matrices
      (closure capture; ``ray.put`` upstream on a real cluster);
    * per batch: ONE (B, k_cent) GEMM routes vectors to their nearest
      centroid (ties -> smaller cid), ONE (B, nq) GEMM scores all queries,
      then each query keeps its k best probed candidates — per-batch
      partial top-k, so the shuffle moves O(nq * k) rows per batch;
    * final merge is a tiny per-query group sort (ties -> smaller vec_id).

    Approximation structure is IDENTICAL to real IVF (probing can miss true
    neighbors in unprobed lists) — but deterministically so, which is what
    makes it oracle-checkable."""
    cq = np.asarray(centroids_q, dtype=np.int64)
    qq = np.asarray(queries_q, dtype=np.int64)
    qids = np.asarray(query_ids, dtype=np.int64)
    # probe sets: stable argsort on integer distance == ties to smaller cid
    dqc = ((qq[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)  # (nq, ncent)
    probes = np.argsort(dqc, axis=1, kind="stable")[:, :n_probe]  # (nq, n_probe)

    def partial(batch: pa.Table) -> pa.Table:
        m = quantize_embedding(
            np.stack(batch.column(col).to_numpy(zero_copy_only=False))
        )
        ids = batch.column(id_col).to_numpy()
        # route: nearest centroid, ties -> first (= smaller cid) via argmin
        d2c = (
            (m * m).sum(axis=1, keepdims=True)
            - 2 * (m @ cq.T)
            + (cq * cq).sum(axis=1)[None, :]
        )
        clus = d2c.argmin(axis=1)
        # score all queries at once: (B, nq) integer distances
        d2q = (
            (m * m).sum(axis=1, keepdims=True)
            - 2 * (m @ qq.T)
            + (qq * qq).sum(axis=1)[None, :]
        )
        out_q, out_id, out_d = [], [], []
        for i in range(len(qids)):
            mask = np.isin(clus, probes[i]) & (ids != qids[i])
            if not mask.any():
                continue
            cand_ids = ids[mask]
            d2 = d2q[mask, i]
            kk = min(k, len(cand_ids))
            sel = np.lexsort((cand_ids, d2))[:kk]
            out_q.append(np.full(kk, qids[i], dtype=np.int64))
            out_id.append(cand_ids[sel])
            out_d.append(d2[sel])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()),
                 "neighbor_id": pa.array([], pa.int64()),
                 "dist2": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_id), pa.int64()),
                "dist2": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["dist2", "neighbor_id"]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "dist2"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final, batch_format="pandas")
    )


# ------------------------------------------------------------ SemDeDup --

SEM_SCALE = 512  # power-of-two fixed point for the integer cosine test


def sem_quantize(m: np.ndarray) -> np.ndarray:
    """float matrix -> int64 fixed point at the SEMDEDUP scale (floor of an
    exact power-of-two float64 multiply, like :func:`quantize_embedding`
    but coarse enough that the *squared* integer cosine comparison
    ``dot^2 * den >= num * na * nb`` stays inside int64: for unit-norm
    inputs perturbed by <= +-56/dim, |q| <= 568 so dot <= 64 * 568^2 ~
    2^24.3 and dot^2 * 625 ~ 2^57.9 < 2^63."""
    return np.floor(m.astype(np.float64) * float(SEM_SCALE)).astype(np.int64)


def semdedup_census(ds, centroids_q: np.ndarray, tau_num: int = 529,
                    tau_den: int = 625, id_col: str = "vec_id",
                    col: str = "qv"):
    """SemDeDup (Abbas et al. 2023) as an EXACT integer census: assign each
    quantized vector to its nearest centroid (integer L2 argmin, ties ->
    smaller centroid id), then within each cluster count, for every vector
    ``x``, the earlier-id vectors ``y`` with cos(x, y) >= tau — the
    SemDeDup keep rule is ``n_dups == 0``.  tau is the rational
    sqrt(tau_num/tau_den) (defaults: 23^2/25^2 -> tau = 0.92) so the test
    is the pure-integer ``dot > 0 AND dot^2*tau_den >= tau_num*na*nb`` —
    no float division, bit-identical to the DuckDB twin.

    Scale design: centroids are a tiny (k x d int64) broadcast closure;
    assignment is one vectorized distance reduction per batch (no
    shuffle); the per-cluster pairwise census runs inside ONE
    groupby(cluster) exchange of narrow (id, qv) rows.  k is the SemDeDup
    paper's knob — it grows with the corpus (N / target-cluster-size), so
    the per-group GEMM is O(target^2 * d) regardless of N; pairs
    straddling clusters are invisible BY DESIGN (the paper's semantics,
    not an approximation we add).  The in-group matmul runs in float64,
    which is exact here: every product < 2^53 by the sem_quantize bound.

    Output: (vec_id, cluster, n_dups) per input row.
    """
    cq = np.ascontiguousarray(np.asarray(centroids_q, dtype=np.int64))

    def assign(batch: pa.Table) -> pa.Table:
        q = np.stack(batch.column(col).to_numpy(zero_copy_only=False)).astype(np.int64)
        d2 = (
            (q * q).sum(axis=1, keepdims=True)
            - 2 * (q @ cq.T)
            + (cq * cq).sum(axis=1)[None, :]
        )
        best = d2.argmin(axis=1)  # first occurrence = smallest centroid id
        return pa.table(
            {
                id_col: batch.column(id_col),
                "cluster": pa.array(best.astype(np.int64), pa.int64()),
                col: batch.column(col),
            }
        )

    def census(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(id_col, ignore_index=True)
        ids = g[id_col].to_numpy().astype(np.int64)
        q = np.stack(g[col].to_numpy()).astype(np.float64)
        dots = np.rint(q @ q.T).astype(np.int64)  # exact: products < 2^53
        n = np.diag(dots).copy()
        cond = (dots > 0) & (dots * dots * tau_den >= tau_num * np.outer(n, n))
        # count strictly-earlier matches per row (ids sorted ascending)
        n_dups = np.tril(cond, k=-1).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.full(len(ids), int(g["cluster"].iloc[0]), np.int64),
                "n_dups": n_dups,
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(census, batch_format="pandas")
    )

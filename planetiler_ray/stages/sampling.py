"""Deterministic sampling operators (training-data ops).

* :func:`stratified_sample` — exact top-k per group under a deterministic
  multiplicative hash ranking: a reproducible uniform-ish stratified
  sample whose SQL twin is a ``row_number() OVER (PARTITION BY ...)``
  (same hash, same tiebreak), so the driver can value-check it.
* ``hash_sample`` (Bernoulli-style 1/m keep by hash) lives in
  ``pipelines/training.q_hash_sample``.

Scale pattern: each batch keeps its own per-group top-k partial (the
group cardinality is small — strata like language or event type), so only
``n_blocks * n_groups * k`` candidate rows reach the final exact
per-group rank — never a full shuffle of the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HASH_MULT = 2654435761  # Knuth multiplicative constant (shared w/ oracle)
HASH_MOD = 1 << 32


def _rank_topk(group_keys: np.ndarray, hv: np.ndarray, ids: np.ndarray,
               k: int) -> np.ndarray:
    """Indices of rows ranked < k within their group by (hv, id)."""
    order = np.lexsort((ids, hv, group_keys))
    gk = group_keys[order]
    new = np.ones(len(gk), dtype=bool)
    new[1:] = gk[1:] != gk[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(gk)))
    rank = np.arange(len(gk)) - np.repeat(starts, lens)
    return order[rank < k]


def stratified_sample(ds, group_col: str, id_col: str, k: int = 20):
    """Exact deterministic k-per-group sample ranked by
    ``(id * KNUTH) % 2^32`` then id."""

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        hv = (ids.astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
        gvals = batch.column(group_col)
        # factorize group values to int codes for the lexsort
        codes = gvals.combine_chunks().dictionary_encode().indices.to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        keep = _rank_topk(codes, hv, ids, k)
        out = batch.take(pa.array(np.sort(keep)))
        ids_k = out.column(id_col).to_numpy()
        hv_k = (ids_k.astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(HASH_MOD)
        return out.append_column("hv", pa.array(hv_k.astype(np.int64), pa.int64()))

    def final(g: pa.Table) -> pa.Table:
        ids = g.column(id_col).to_numpy()
        hv = g.column("hv").to_numpy()
        codes = (
            g.column(group_col).combine_chunks().dictionary_encode()
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = _rank_topk(codes, hv, ids, k)
        return g.take(pa.array(np.sort(keep)))

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(final, batch_format="pyarrow")
    )


def weighted_sample(ds, weight_bp_fn, key_col: str, denom: int = 10_000):
    """Deterministic importance sampling: keep a row iff
    ``hash61(key) % denom < weight_bp`` where ``weight_bp`` in [0, denom]
    is a per-row importance weight (e.g. a quality score).  Reproducible
    (re-runs keep identical rows — the resumability story the reference's
    deterministic samplers provide) and exactly SQL-mirrorable since
    :func:`..stages.sketch.hash61` is HUGEINT-expressible.

    ``weight_bp_fn(batch) -> np.ndarray[int64]`` computes the weights
    vectorized per batch; sampling itself is one hash + compare, no
    shuffle, no driver state.
    """
    import pyarrow as pa

    from .sketch import hash61

    def keep(batch: pa.Table) -> pa.Table:
        w = np.asarray(weight_bp_fn(batch), dtype=np.int64)
        h = hash61(batch.column(key_col).to_numpy().astype(np.int64))
        sel = (h % np.uint64(denom)).astype(np.int64) < w
        return batch.filter(pa.array(sel))

    return ds.map_batches(keep, batch_format="pyarrow")


def dataset_split(ds, key_col: str, val_bp: int = 100, test_bp: int = 100,
                  denom: int = 10_000):
    """Deterministic train/val/test assignment: split by
    ``hash61(key) % denom`` thresholds (val < val_bp <= test < val_bp +
    test_bp <= train).  Reproducible across runs and engines (the
    Mersenne-61 hash has a HUGEINT SQL twin), shuffle-free, and
    automatically stratified in expectation across any grouping because
    the hash is independent of every feature.
    """
    import pyarrow as pa

    from .sketch import hash61

    SPLITS = np.array(["val", "test", "train"], dtype=object)

    def assign(batch: pa.Table) -> pa.Table:
        h = hash61(batch.column(key_col).to_numpy().astype(np.int64))
        r = (h % np.uint64(denom)).astype(np.int64)
        code = np.where(r < val_bp, 0, np.where(r < val_bp + test_bp, 1, 2))
        return batch.append_column(
            "split", pa.array(SPLITS[code].tolist(), pa.string())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def proportional_sample(ds, group_col: str, id_col: str, total: int = 100,
                        target_bp: dict | None = None):
    """Exact proportional stratified sampling by largest-remainder
    apportionment: stratum g gets floor(total*n_g/N) slots plus one of the
    ``total - sum(floor)`` leftovers in (remainder DESC, group ASC) order —
    the allocation every "sample 1M docs preserving the language mix" job
    needs, with zero drift (allocations sum to ``total`` exactly).

    Scale shape: pass 1 is the bounded per-group count (combiner ->
    groupby-sum -> driver apportionment over #groups rows); pass 2 ranks
    rows inside each stratum by the SQL-mirrorable M61 hash (ties id ASC)
    with per-batch partial top-k(g) and a per-group exact finish — the
    row stream never sorts globally.
    """
    from ray.data.aggregate import Sum

    from .sketch import hash61

    def cpart(batch: pa.Table) -> pa.Table:
        g = (pa.table({"g": batch.column(group_col)})
             .group_by("g").aggregate([("g", "count")]))
        return pa.table({group_col: g.column("g"),
                         "n_part": g.column("g_count")})

    cdf = (
        ds.map_batches(cpart, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # bounded by #strata
    )
    n = cdf["n"].to_numpy().astype(np.int64)
    names = cdf[group_col].to_numpy()
    if target_bp is None:
        N = int(n.sum())
        fl = n * total // N
        rem = (n * total) % N
    else:
        # data-mixing mode: apportion by TARGET weights (basis points),
        # not observed proportions — then cap at the stratum's actual size
        # (no redistribution; documented under-fill for tiny strata)
        w = np.array([int(target_bp.get(str(g), 0)) for g in names], np.int64)
        W = int(w.sum())
        fl = w * total // W
        rem = (w * total) % W
    order = np.lexsort((names, -rem))
    extra = total - int(fl.sum())
    bump = np.zeros(len(n), np.int64)
    bump[order[:extra]] = 1
    alloc = {str(g): int(min(k, c)) for g, k, c in zip(names, fl + bump, n)}

    def keep_rank(batch: pa.Table, exact: bool) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        hv = hash61(ids)
        gvals = batch.column(group_col)
        if isinstance(gvals, pa.ChunkedArray):
            gvals = gvals.combine_chunks()
        gnp = np.asarray(gvals.to_pandas(), dtype=object)
        kk = np.array([alloc.get(str(g), 0) for g in gnp], np.int64)
        codes = gvals.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, hv, codes))
        gk = codes[order]
        new = np.ones(len(gk), dtype=bool)
        new[1:] = gk[1:] != gk[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(gk)))
        rank = np.arange(len(gk)) - np.repeat(starts, lens)
        keep = order[rank < kk[order]]
        out = batch.take(pa.array(np.sort(keep)))
        return pa.table({group_col: out.column(group_col),
                         id_col: out.column(id_col)})

    return (
        ds.map_batches(lambda b: keep_rank(b, False), batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(lambda g: keep_rank(g, True), batch_format="pyarrow")
    )

"""Deduplication operator suite over document tables (training-data ops).

Each operator is a Ray-Data pipeline builder over a ``documents``-shaped
Dataset (doc_id:int64, text:string, ...):

* :func:`exact_dedup` — content-hash partition + per-group first
  (hash inside ``map_batches``, tiny ``groupby`` over partials).
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash + banded
  LSH: shingle -> 64 minhashes -> band rows -> ``groupby(band)`` -> pairs.
* :func:`simhash64` — 64-bit SimHash with 4-block hamming blocking.
* :func:`jaccard_pairs` — EXACT word-set Jaccard pairs via inverted-index
  blocking (complete for any threshold > 0: J>0 implies a shared token) —
  the oracle-checkable twin of the probabilistic LSH path.
* :func:`embedding_neardup` lives in ``stages/ann.py`` (cosine >= tau).

Scale notes: minhash/simhash signatures are fixed-width int columns
(vectorized numpy); candidate generation is the only shuffle and it is keyed
by (band_id, band_hash) / simhash block — bounded fan-out, skew-safe because
band buckets cap at the duplicate-cluster size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------- hashing --

_M61 = (1 << 61) - 1


def tokenize_words(text: pd.Series) -> pd.Series:
    return text.str.lower().str.findall(r"[a-z0-9]+")


def _fnv64(s: str) -> int:
    v = 14695981039346656037
    for b in s.encode("utf-8"):
        v = ((v ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return v


# natural-language shingle/word distributions are heavy-tailed: a bounded
# memo on string->hash turns the per-doc hashing loop into dict lookups
_HASH_CACHE: dict[str, int] = {}
_HASH_CACHE_MAX = 1 << 20


def _fnv64_cached(s: str) -> int:
    h = _HASH_CACHE.get(s)
    if h is None:
        h = _fnv64(s)
        if len(_HASH_CACHE) < _HASH_CACHE_MAX:
            _HASH_CACHE[s] = h
    return h


def word_shingles(text: pd.Series, k: int = 3) -> pd.Series:
    """k-word shingle hash sets per doc (list of uint64 per row)."""
    toks = tokenize_words(text)

    def shingle(ws: list[str]) -> np.ndarray:
        if len(ws) < k:
            joined = [" ".join(ws)] if ws else []
        else:
            joined = [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]
        return np.unique(
            np.fromiter((_fnv64_cached(s) for s in joined), dtype=np.uint64,
                        count=len(joined))
        )

    return toks.map(shingle)


# ------------------------------------------------------------- exact dedup --

def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    import hashlib

    hs = [
        int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big", signed=False)
        for t in batch.column(col).to_pylist()
    ]
    return batch.append_column(
        "content_hash", pa.array(np.array(hs, dtype=np.uint64).astype(np.int64), pa.int64())
    )


def exact_dedup(ds, col: str = "text"):
    """Dataset -> (content groups): keep_id = min doc_id, n_dups per group.

    Scale pattern: hash per batch (vectorized-ish), partial (hash -> min,count)
    per batch, then a small groupby over partials.
    """
    from ray.data.aggregate import Count, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, col)
        df = (
            b.select(["content_hash", "doc_id"])
            .to_pandas()
            .groupby("content_hash", as_index=False)
            .agg(keep_part=("doc_id", "min"), n_part=("doc_id", "size"))
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("content_hash")
        .aggregate(Min("keep_part", alias_name="keep_id"), Sum("n_part", alias_name="n_dups"))
    )


# ------------------------------------------------------------ minhash LSH --

MINHASH_PERMS = 64
LSH_BANDS = 16  # 4 rows per band


def _perm_params(n: int = MINHASH_PERMS, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _M61, n, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _M61, n, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def minhash_of_shingles(sh: np.ndarray) -> np.ndarray:
    """(n_shingles,) uint64 -> (MINHASH_PERMS,) uint64 signature."""
    if len(sh) == 0:
        return np.full(MINHASH_PERMS, np.uint64(_M61), dtype=np.uint64)
    x = sh.astype(np.uint64)[None, :]
    v = (_PERM_A[:, None] * (x % np.uint64(_M61)) + _PERM_B[:, None]) % np.uint64(_M61)
    return v.min(axis=1)


def minhash_signatures(ds, col: str = "text", k: int = 3):
    """Adds sig_0..sig_{BANDS-1}: each band value = hash of its 4 minhashes."""

    def sig(batch: pa.Table) -> pa.Table:
        text = batch.column(col).to_pandas()
        shingles = word_shingles(text, k)
        sigs = np.stack([minhash_of_shingles(s) for s in shingles])  # (n, 64)
        rows_per_band = MINHASH_PERMS // LSH_BANDS
        out = {"doc_id": batch.column("doc_id")}
        for b in range(LSH_BANDS):
            block = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            # mix the band rows into one uint64 bucket key
            key = np.zeros(len(sigs), dtype=np.uint64)
            for c in range(rows_per_band):
                key = key * np.uint64(1099511628211) + block[:, c]
            out[f"band_{b}"] = pa.array(key.astype(np.int64), pa.int64())
        return pa.table(out)

    return ds.map_batches(sig, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds):
    """Band signatures -> candidate near-dup pairs (a < b), deduplicated."""

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        bands, keys, docs = [], [], []
        for b in range(LSH_BANDS):
            bands.append(np.full(len(doc), b, dtype=np.int64))
            keys.append(batch.column(f"band_{b}").to_numpy())
            docs.append(doc)
        return pa.table(
            {
                "band": pa.array(np.concatenate(bands), pa.int64()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii], "b": ids[jj]})

    cand = (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


# ---------------------------------------------------------------- simhash --

_WORD_BITS_CACHE: dict[str, np.ndarray] = {}


def _word_bits(w: str) -> np.ndarray:
    bits = _WORD_BITS_CACHE.get(w)
    if bits is None:
        h = np.uint64(_fnv64_cached(w))
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        if len(_WORD_BITS_CACHE) < _HASH_CACHE_MAX:
            _WORD_BITS_CACHE[w] = bits
    return bits


def simhash64(text: pd.Series) -> np.ndarray:
    """Classic 64-bit SimHash over word features (cached per-word bit
    vectors; vocabulary is heavy-tailed so the cache hit rate is ~100%)."""
    toks = tokenize_words(text)
    out = np.zeros(len(text), dtype=np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, ws in enumerate(toks):
        if not ws:
            continue
        score = np.zeros(64, dtype=np.int64)
        for w in ws:
            score += _word_bits(w)
        pos = score * 2 > len(ws)
        out[i] = np.uint64(weights[pos].sum())
    return out


def add_simhash(batch: pa.Table, col: str = "text") -> pa.Table:
    sh = simhash64(batch.column(col).to_pandas())
    return batch.append_column("simhash", pa.array(sh.astype(np.int64), pa.int64()))


def simhash_candidates(ds, max_hamming: int = 3, col: str = "text"):
    """SimHash near-dup pairs: 4-block blocking (Hamming<=3 => one identical
    16-bit block), verify hamming inside the group."""

    def explode(batch: pa.Table) -> pa.Table:
        b2 = add_simhash(batch, col)
        sh = b2.column("simhash").to_numpy().astype(np.uint64)
        doc = b2.column("doc_id").to_numpy()
        blocks, keys, docs, sigs = [], [], [], []
        for blk in range(4):
            blocks.append(np.full(len(sh), blk, dtype=np.int64))
            keys.append(((sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)).astype(np.int64))
            docs.append(doc)
            sigs.append(sh.astype(np.int64))
        return pa.table(
            {
                "block": pa.array(np.concatenate(blocks), pa.int64()),
                "key": pa.array(np.concatenate(keys), pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "simhash": pa.array(np.concatenate(sigs), pa.int64()),
            }
        )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sh = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        x = sh[ii] ^ sh[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - np.uint64(1))
        m = ham <= max_hamming
        return pd.DataFrame({"a": ids[ii][m], "b": ids[jj][m], "hamming": ham[m]})

    cand = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["block", "key"])
        .map_groups(pairs, batch_format="pandas")
    )
    return cand.groupby(["a", "b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# -------------------------------------------------- exact jaccard (oracle) --

def jaccard_pairs(ds, threshold: float = 0.5, col: str = "text"):
    """EXACT distinct-word-set Jaccard >= threshold pairs (a < b).

    Inverted-index blocking: token -> docs groupby, pairwise counts summed,
    then J = shared / (na + nb - shared).  Complete (no false negatives) —
    the oracle twin of the MinHash estimate.  Output: a, b, j1000 (Jaccard in
    integer permille, computed as floor to stay float-free).
    """
    from ray.data.aggregate import Sum

    def explode_tokens(batch: pa.Table) -> pa.Table:
        toks = tokenize_words(batch.column(col).to_pandas()).map(
            lambda ws: sorted(set(ws))
        )
        doc = batch.column("doc_id").to_numpy()
        n = toks.map(len).to_numpy()
        return pa.table(
            {
                "token": pa.array([t for ts in toks for t in ts], pa.string()),
                "doc_id": pa.array(np.repeat(doc, n), pa.int64()),
                "n_tokens": pa.array(np.repeat(n, n), pa.int64()),
            }
        )

    def token_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        nt = g["n_tokens"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "na": [], "nb": [], "shared_part": []}, dtype=np.int64)
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"a": ids[ii], "b": ids[jj], "na": nt[ii], "nb": nt[jj],
             "shared_part": np.ones(len(ii), dtype=np.int64)}
        )

    shared = (
        ds.map_batches(explode_tokens, batch_format="pyarrow")
        .groupby("token")
        .map_groups(token_pairs, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("shared_part", alias_name="shared"),
                   Sum("na", alias_name="na_sum"), Sum("nb", alias_name="nb_sum"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        sh = batch.column("shared").to_numpy()
        na = batch.column("na_sum").to_numpy() // np.maximum(sh, 1)
        nb = batch.column("nb_sum").to_numpy() // np.maximum(sh, 1)
        union = na + nb - sh
        j1000 = (sh * 1000) // np.maximum(union, 1)
        m = j1000 >= int(threshold * 1000)
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(m)),
                "b": batch.column("b").filter(pa.array(m)),
                "j1000": pa.array(j1000[m], pa.int64()),
            }
        )

    return shared.map_batches(finish, batch_format="pyarrow")

"""Deduplication operator suite over document tables (training-data ops).

Each operator is a Ray-Data pipeline builder over a ``documents``-shaped
Dataset (doc_id:int64, text:string, ...):

* :func:`exact_dedup` — 128-bit content-hash partition + per-group first
  (hash inside ``map_batches``, tiny ``groupby`` over partials).
* :func:`minhash_signatures` / :func:`lsh_candidate_pairs` — MinHash + banded
  LSH: shingle -> 64 minhashes -> band rows -> ``groupby(band)`` -> pairs.
* :func:`simhash64` / :func:`simhash_candidates` — 64-bit SimHash with
  Manku-style block blocking (6 blocks, any-3 exact => 20 tables of ~33-bit
  keys; complete for hamming <= 3, bucket population ~N/2^33).
* :func:`jaccard_pairs` — EXACT word-set Jaccard pairs via inverted-index
  blocking; ``df_cap`` excludes tokens above a document-frequency cap from
  the similarity universe (mirrored by the oracle), bounding every index
  group — the stop-word quadratic killer at 100 TB.
* :func:`embedding_neardup` lives in ``stages/ann.py`` (cosine >= tau).

Scale notes (round-2 rework): all string hashing is vectorized over Arrow
buffers (``functions/vhash.fnv64_arrow`` — no per-row Python); candidate
buckets are bounded (wide block keys + ``pair_cap`` star-edge fallback for
boilerplate mega-clusters); pair dedup across tables/bands is a combining
``aggregate`` instead of a ``map_groups`` over millions of tiny groups.
"""

from __future__ import annotations

from itertools import chain, combinations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.vhash import fnv64_arrow

# ---------------------------------------------------------------- hashing --

_M61 = (1 << 61) - 1
_COMBINE_PRIME = np.uint64(1099511628211)


def tokenize_words(text: pd.Series) -> pd.Series:
    return text.str.lower().str.findall(r"[a-z0-9]+")


def char_ngrams(text: pd.Series, n: int = 4) -> pd.Series:
    """Character n-gram lists per doc (positional substrings of the raw
    text — mirrorable in SQL via substr over a positions join)."""
    return text.map(
        lambda s: [s[i : i + n] for i in range(len(s) - n + 1)] if len(s) >= n else []
    )


def _flat_tokens(text):
    """Tokenize a batch -> (flat Arrow string array, per-doc lengths).

    Arrow-native (round 3): lower + regex split + list_flatten run in C and
    the flat token array feeds ``fnv64_arrow`` directly — no Python word
    lists (the old ``findall`` + ``chain`` materialized millions of str
    objects per batch).  Token grammar identical to ``tokenize_words``
    (runs of [a-z0-9] on the lowercased text; parity-tested).

    ``text``: a pyarrow (Chunked)Array — the zero-copy hot path (round 5:
    callers pass batch columns straight through, no per-batch pandas
    conversion) — or a pandas Series (converted)."""
    import pyarrow.compute as pc

    if isinstance(text, pa.ChunkedArray):
        col = text.combine_chunks()
    elif isinstance(text, pa.Array):
        col = text
    else:
        col = pa.Array.from_pandas(text.astype(str))
    low = pc.utf8_lower(col)
    parts = pc.split_pattern_regex(low, "[^a-z0-9]+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = pc.list_flatten(parts)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    offs = parts.offsets.to_numpy()
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    cum = np.concatenate([[0], np.cumsum(nonempty)])
    lens = (cum[offs[1:]] - cum[offs[:-1]]).astype(np.int64)
    return flat.filter(pa.array(nonempty)), lens


def _shingle_flat(text: pd.Series, k: int = 3):
    """k-word shingle hashes for a batch, flat.

    Returns ``(sh, starts)``: doc i's shingle hashes are
    ``sh[starts[i]:starts[i+1]]`` (uint64, not deduplicated — harmless for
    min-based signatures).  Shingle hash = FNV-combine of the k word hashes
    (words hashed once, vectorized; no joined-string construction).
    Docs with 0 < n < k words contribute one combined all-words shingle.
    """
    flat, lens = _flat_tokens(text)
    n = len(lens)
    if len(flat) == 0:
        return np.empty(0, np.uint64), np.zeros(n + 1, np.int64)
    wh = fnv64_arrow(flat)
    word_start = np.concatenate([[0], np.cumsum(lens)])
    n_sh = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    starts = np.concatenate([[0], np.cumsum(n_sh)]).astype(np.int64)
    sh = np.empty(int(starts[-1]), dtype=np.uint64)
    # full k-windows, all docs at once: rolling combine over the flat word
    # hashes, masked to windows that stay inside one doc
    if len(wh) >= k:
        roll = wh[: len(wh) - k + 1].copy()
        for j in range(1, k):
            roll = roll * _COMBINE_PRIME + wh[j : len(wh) - k + 1 + j]
    big = np.flatnonzero(lens >= k)
    for i in big:
        s, e = starts[i], starts[i + 1]
        sh[s:e] = roll[word_start[i] : word_start[i] + (e - s)]
    # short docs (0 < n < k): one combined shingle over all their words
    with np.errstate(over="ignore"):  # uint64 wrap is the hash semantics
        for i in np.flatnonzero((lens > 0) & (lens < k)):
            v = wh[word_start[i]]
            for j in range(1, lens[i]):
                v = v * _COMBINE_PRIME + wh[word_start[i] + j]
            sh[starts[i]] = v
    return sh, starts


def word_shingles(text: pd.Series, k: int = 3) -> pd.Series:
    """k-word shingle hash sets per doc (list of sorted-unique uint64)."""
    sh, starts = _shingle_flat(text, k)
    return pd.Series(
        [np.unique(sh[starts[i] : starts[i + 1]]) for i in range(len(text))],
        index=text.index,
    )


# ------------------------------------------------------------- exact dedup --

def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append hash_hi/hash_lo (128-bit two-seed FNV split into two int64).

    64 bits birthday-collide around 2^32 items — guaranteed collisions at
    10^12 docs, silently merging distinct content.  128 bits keep the
    collision probability negligible at any practical corpus size.

    The hash is purely internal (the dedup output exposes keep_id/n_dups,
    and the oracle groups by the text itself).  Round 3 measured THREE
    candidate implementations on document-length rows — per-row C digest
    over zero-copy buffer slices, the byte-sweep FNV pair, a power-table
    polynomial hash — and the C digest won ~10x (see
    ``functions/vmd5.digest_rows``): numpy "vectorization" loses to
    SHA-NI when rows are hundreds of bytes long.
    """
    from ..functions.vmd5 import digest128_u64_arrow

    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    his, los = digest128_u64_arrow(c)
    return batch.append_column(
        "hash_hi", pa.array(his.astype(np.int64), pa.int64())
    ).append_column("hash_lo", pa.array(los.astype(np.int64), pa.int64()))


def exact_dedup(ds, col: str = "text"):
    """Dataset -> (content groups): keep_id = min doc_id, n_dups per group.

    Scale pattern: hash per batch, partial (hash -> min,count) per batch,
    then ONE bucket shuffle over partials keyed by the full 128-bit hash
    (``stages/bucketagg`` reduceat merge — distinct-content cardinality is
    ~corpus size, the regime where the built-in Aggregate is ~2x slower).
    """
    from .bucketagg import bucketed_sum

    def partial(batch: pa.Table) -> pa.Table:
        b = add_content_hash(batch, col)
        hi = b.column("hash_hi").to_numpy()
        lo = b.column("hash_lo").to_numpy()
        doc = b.column("doc_id").to_numpy()
        order = np.lexsort((doc, lo, hi))
        hi_s, lo_s, doc_s = hi[order], lo[order], doc[order]
        new = np.concatenate(
            [[True], (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(hi_s))
        return pa.table({
            "hash_hi": pa.array(hi_s[starts], pa.int64()),
            "hash_lo": pa.array(lo_s[starts], pa.int64()),
            "keep_part": pa.array(doc_s[starts], pa.int64()),  # min: sorted
            "n_part": pa.array(ends - starts, pa.int64()),
        })

    return bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["hash_hi", "hash_lo"], [("n_part", "n_dups")],
        mins=[("keep_part", "keep_id")],
    ).select_columns(["hash_hi", "hash_lo", "keep_id", "n_dups"])


# --------------------------------------------------------- pair utilities --

PAIR_CAP = 256


def _bucket_pairs(ids: np.ndarray, cap: int = PAIR_CAP):
    """Candidate index pairs for one bucket, bounded.

    Buckets up to ``cap``: all pairs.  Larger (a boilerplate mega-cluster):
    star edges to the min id — m-1 edges keep the connected component (and
    thus any dedup clustering) identical while avoiding the O(m^2) pair
    explosion flagged in round 1.  ``ids`` must be sorted ascending.
    """
    m = len(ids)
    if m < 2:
        return (np.empty(0, np.int64),) * 2
    if m <= cap:
        ii, jj = np.triu_indices(m, k=1)
        return ii.astype(np.int64), jj.astype(np.int64)
    return np.zeros(m - 1, dtype=np.int64), np.arange(1, m, dtype=np.int64)


def _runs_pairs(run_starts: np.ndarray, run_lens: np.ndarray, cap: int):
    """Index pairs (i < j positions) within MANY runs at once, vectorized —
    ``_bucket_pairs`` semantics (all pairs <= cap, star edges above) without
    a per-run Python call.  Elements within a run must be sorted by doc id
    so position order implies id order."""
    n = int(run_lens.sum())
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    pos = np.arange(n, dtype=np.int64) - np.repeat(run_starts, run_lens)
    m = np.repeat(run_lens, run_lens)
    small = m <= cap
    # pairs per element: k previous partners in small runs, 1 star edge in big
    ppe = np.where(pos == 0, 0, np.where(small, pos, 1))
    total = int(ppe.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    jj = np.repeat(np.arange(n, dtype=np.int64), ppe)
    rstart = np.repeat(run_starts, run_lens)
    pair_off = np.concatenate([[0], np.cumsum(ppe)])[:-1]
    ii = (
        np.arange(total, dtype=np.int64)
        - np.repeat(pair_off, ppe)
        + np.repeat(rstart, ppe)
    )
    return ii, jj


def _dedup_pairs(cand, extra_min: dict | None = None):
    """Distinct (a, b) via a combining aggregate (NOT map_groups over
    millions of tiny groups); ``extra_min``: {col: alias} kept as Min.
    Uses the bucketed reduceat merge — pair-key cardinality is the
    candidate-pair count, exactly the regime where the built-in Aggregate
    measured ~2x slower (see ``stages/bucketagg``)."""
    from .bucketagg import bucketed_sum, count_min_partial

    mins = [(col, alias) for col, alias in (extra_min or {}).items()]
    keep = ["a", "b"] + [alias for _, alias in mins]
    # per-batch partial first (count + min per distinct (a,b)) so only
    # distinct per-batch pairs cross the exchange, honoring bucketed_sum's
    # pre-aggregation contract (ADVICE r3)
    part = cand.map_batches(
        count_min_partial(["a", "b"], "_one", mins), batch_format="pyarrow")
    return bucketed_sum(
        part, ["a", "b"], [("_one", "_n")],
        mins=[(alias, alias) for _, alias in mins],
    ).select_columns(keep)


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
    """Adds band_0..band_{BANDS-1}: each band value = hash of its 4 minhashes.

    Fully vectorized: one flat shingle array per batch, per-permutation
    vector ops + ``minimum.reduceat`` at doc boundaries.
    """

    def sig(batch: pa.Table) -> pa.Table:
        sh, starts = _shingle_flat(batch.column(col), k)
        n = batch.num_rows
        sigs = np.full((n, MINHASH_PERMS), np.uint64(_M61), dtype=np.uint64)
        ne = np.flatnonzero(np.diff(starts) > 0)
        if len(ne):
            st = starts[:-1][ne]
            x = sh % np.uint64(_M61)
            for p in range(MINHASH_PERMS):
                v = (_PERM_A[p] * x + _PERM_B[p]) % np.uint64(_M61)
                sigs[ne, p] = np.minimum.reduceat(v, st)
        rows_per_band = MINHASH_PERMS // LSH_BANDS
        out = {"doc_id": batch.column("doc_id")}
        for b in range(LSH_BANDS):
            block = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            key = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                key = key * _COMBINE_PRIME + block[:, c]
            out[f"band_{b}"] = pa.array(key.astype(np.int64), pa.int64())
        return pa.table(out)

    return ds.map_batches(sig, batch_format="pyarrow")


LSH_PAIR_BUCKETS = 256


def lsh_candidate_pairs(sig_ds, cap: int = PAIR_CAP):
    """Band signatures -> candidate near-dup pairs (a < b), deduplicated.

    Round-3 scale fix: grouping by the raw (band, key) made ``map_groups``
    fire once per ~2-member bucket — millions of tiny pandas calls.  The
    shuffle key is now a HASH BUCKET of (band, key): each group call gets
    thousands of complete buckets and emits every run's pairs with one
    lexsort + the vectorized ``_runs_pairs`` kernel.
    """

    def explode(batch: pa.Table) -> pa.Table:
        doc = batch.column("doc_id").to_numpy()
        bands, keys, docs = [], [], []
        for b in range(LSH_BANDS):
            bands.append(np.full(len(doc), b, dtype=np.int64))
            keys.append(batch.column(f"band_{b}").to_numpy())
            docs.append(doc)
        band = np.concatenate(bands)
        key = np.concatenate(keys)
        bkt = (
            (key.view(np.uint64) ^ (band.view(np.uint64) * _COMBINE_PRIME))
            * np.uint64(0x9E3779B97F4A7C15)
        ) >> np.uint64(64 - 8)  # top bits -> 256 buckets
        return pa.table(
            {
                "band": pa.array(band, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "bkt": pa.array(bkt.astype(np.int64), pa.int64()),
            }
        )

    def pairs_bucket(g: pa.Table) -> pa.Table:
        band = g.column("band").to_numpy()
        key = g.column("key").to_numpy()
        doc = g.column("doc_id").to_numpy()
        order = np.lexsort((doc, key, band))
        band, key, doc = band[order], key[order], doc[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(doc)))
        ii, jj = _runs_pairs(starts, lens, cap)
        return pa.table(
            {"a": pa.array(doc[ii], pa.int64()), "b": pa.array(doc[jj], pa.int64())}
        )

    cand = (
        sig_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(
            lambda g: pairs_bucket(g.drop_columns(["bkt"])),
            batch_format="pyarrow",
        )
    )
    return _dedup_pairs(cand)


# ---------------------------------------------------------------- simhash --

def simhash64(text: pd.Series) -> np.ndarray:
    """Classic 64-bit SimHash over word features.

    Vectorized: all words of the batch hashed in one ``fnv64_arrow`` call,
    then 64 bit-column passes with ``add.reduceat`` at doc boundaries —
    bit-identical to the round-1 per-doc loop.
    """
    flat, lens = _flat_tokens(text)
    n = len(text)
    out = np.zeros(n, dtype=np.uint64)
    if len(flat) == 0:
        return out
    wh = fnv64_arrow(flat)
    word_start = np.concatenate([[0], np.cumsum(lens)])[:-1]
    ne = np.flatnonzero(lens > 0)
    starts = word_start[ne]
    half = lens[ne]
    acc = np.zeros(len(ne), dtype=np.uint64)
    for j in range(64):
        bit = ((wh >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        sc = np.add.reduceat(bit, starts)
        acc |= np.uint64(1 << j) * (sc * 2 > half).astype(np.uint64)
    out[ne] = acc
    return out


def add_simhash(batch: pa.Table, col: str = "text") -> pa.Table:
    sh = simhash64(batch.column(col))
    return batch.append_column("simhash", pa.array(sh.astype(np.int64), pa.int64()))


# Manku-style blocking (Detecting Near-Duplicates for Web Crawling, WWW'07):
# split 64 bits into N_BLOCKS; hamming <= 3 flips bits in at most 3 blocks,
# so at least N_BLOCKS-3 blocks are clean and SOME combination of
# BLOCKS_EXACT clean blocks matches exactly -> one table per combination,
# keyed by the concatenated block values (~33-bit keys, so bucket
# population is ~N/2^33 instead of N/2^16 — the round-1 scale fix).
N_BLOCKS = 6
BLOCKS_EXACT = 3  # complete for max_hamming <= N_BLOCKS - BLOCKS_EXACT
_BLOCK_WIDTHS = (11, 11, 11, 11, 10, 10)
_BLOCK_OFFS = tuple(int(x) for x in np.concatenate([[0], np.cumsum(_BLOCK_WIDTHS)[:-1]]))
_TABLES = tuple(combinations(range(N_BLOCKS), BLOCKS_EXACT))


def _block_values(sh: np.ndarray) -> list[np.ndarray]:
    return [
        ((sh >> np.uint64(_BLOCK_OFFS[b])) & np.uint64((1 << _BLOCK_WIDTHS[b]) - 1))
        for b in range(N_BLOCKS)
    ]


def simhash_candidates(ds, max_hamming: int = 3, col: str = "text",
                       cap: int = PAIR_CAP):
    """SimHash near-dup pairs with hamming <= ``max_hamming`` (<= 3).

    The BLOCKING is complete: any such pair shares all blocks of at least
    one table, so it co-occurs in that table's bucket; hamming is verified
    inside the group.  Pair EMISSION degrades in buckets over ``cap``
    (boilerplate mega-clusters): only star edges to the bucket min are
    verified there, so non-star pairs inside a mega-bucket are not emitted
    — connected components (the dedup use) stay intact; pass a larger
    ``cap`` if exhaustive pair lists matter more than bounding the work.
    """
    if max_hamming > N_BLOCKS - BLOCKS_EXACT:
        raise ValueError(
            f"blocking is complete only for hamming <= {N_BLOCKS - BLOCKS_EXACT}"
        )

    def explode(batch: pa.Table) -> pa.Table:
        b2 = add_simhash(batch, col)
        sh = b2.column("simhash").to_numpy().astype(np.uint64)
        doc = b2.column("doc_id").to_numpy()
        blocks = _block_values(sh)
        tabs, keys, docs, sigs = [], [], [], []
        for t, combo in enumerate(_TABLES):
            key = np.zeros(len(sh), dtype=np.uint64)
            for b in combo:
                key = (key << np.uint64(11)) | blocks[b]
            tabs.append(np.full(len(sh), t, dtype=np.int64))
            keys.append(key.astype(np.int64))
            docs.append(doc)
            sigs.append(sh.astype(np.int64))
        tab = np.concatenate(tabs)
        key = np.concatenate(keys)
        # hash-bucket shuffle key (round-3 fix: whole buckets per group
        # call instead of a map_groups per ~2-member (table, key) group)
        bkt = (
            (key.view(np.uint64) ^ (tab.view(np.uint64) * _COMBINE_PRIME))
            * np.uint64(0x9E3779B97F4A7C15)
        ) >> np.uint64(64 - 8)
        return pa.table(
            {
                "table": pa.array(tab, pa.int64()),
                "key": pa.array(key, pa.int64()),
                "doc_id": pa.array(np.concatenate(docs), pa.int64()),
                "simhash": pa.array(np.concatenate(sigs), pa.int64()),
                "bkt": pa.array(bkt.astype(np.int64), pa.int64()),
            }
        )

    def pairs_bucket(g: pa.Table) -> pa.Table:
        tab = g.column("table").to_numpy()
        key = g.column("key").to_numpy()
        doc = g.column("doc_id").to_numpy()
        sh = g.column("simhash").to_numpy().astype(np.uint64)
        order = np.lexsort((doc, key, tab))
        tab, key, doc, sh = tab[order], key[order], doc[order], sh[order]
        new = np.ones(len(doc), dtype=bool)
        new[1:] = (tab[1:] != tab[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(doc)))
        ii, jj = _runs_pairs(starts, lens, cap)
        empty = pa.table(
            {c: pa.array([], pa.int64()) for c in ("a", "b", "hamming")}
        )
        if len(ii) == 0:
            return empty
        x = sh[ii] ^ sh[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        while True:
            nz = x != 0
            if not nz.any():
                break
            ham[nz] += 1
            x = x & (x - np.uint64(1))
        m = ham <= max_hamming
        return pa.table(
            {
                "a": pa.array(doc[ii][m], pa.int64()),
                "b": pa.array(doc[jj][m], pa.int64()),
                "hamming": pa.array(ham[m], pa.int64()),
            }
        )

    cand = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(
            lambda g: pairs_bucket(g.drop_columns(["bkt"])),
            batch_format="pyarrow",
        )
    )
    return _dedup_pairs(cand, extra_min={"hamming": "hamming"})


# -------------------------------------------------- exact jaccard (oracle) --

def jaccard_pairs(ds, threshold: float = 0.5, col: str = "text",
                  df_cap: int | None = None, tokenize=None,
                  metric: str = "jaccard"):
    """EXACT distinct-word-set similarity >= threshold pairs (a < b).

    Inverted-index blocking: token -> docs groupby, pairwise counts summed,
    then J = shared / (na + nb - shared).  Output: a, b, j1000 (Jaccard in
    integer permille, floored to stay float-free).

    ``metric="containment"`` switches the final formula to set CONTAINMENT
    of the smaller side, shared / min(na, nb) — the quote/boilerplate-
    detection metric (a short doc fully embedded in a long one scores 1.0
    where Jaccard is tiny).  Everything upstream (explode, inverted index,
    pair partials) is shared; only the finish arithmetic differs, and the
    output column becomes ``c1000``.

    ``df_cap`` (the 100-TB scale knob): tokens present in more than
    ``df_cap`` docs are EXCLUDED from the similarity universe — Jaccard is
    then over rare tokens only, exactly (the oracle mirrors the same
    filter), and every inverted-index group is bounded at ``df_cap`` rows,
    killing the stop-word quadratic blow-up.  The cap set is computed with
    a first aggregate pass and broadcast (it is small by construction:
    at most total-token-occurrences / df_cap distinct tokens).
    ``df_cap=None`` keeps the full-vocabulary exact semantics (safe only
    when no token is hot — e.g. pre-sampled corpora).
    """
    import ray
    from ray.data.aggregate import Sum

    custom_tok = tokenize is not None
    if tokenize is None:
        tokenize = tokenize_words

    def _distinct_doc_tokens(batch: pa.Table):
        """(token Array, doc_id np, per-row doc row-index np) — DISTINCT
        (doc, token) pairs.  Default grammar runs fully Arrow-native
        (round 5: C tokenize + one lexsort dedup, no Python sets); a
        custom ``tokenize`` callable keeps the pandas contract."""
        doc = batch.column("doc_id").to_numpy()
        if custom_tok:
            toks = tokenize(batch.column(col).to_pandas()).map(
                lambda ws: sorted(set(ws)))
            n = toks.map(len).to_numpy()
            flat = pa.array(list(chain.from_iterable(toks)), pa.string())
            return flat, doc, np.repeat(np.arange(len(doc)), n)
        flat, lens = _flat_tokens(batch.column(col))
        row = np.repeat(np.arange(len(doc), dtype=np.int64), lens)
        # distinct (row, token): dedup on (row, 64-bit token hash) — same
        # accepted FNV-collision class as the rest of the dedup suite
        th = fnv64_arrow(flat)
        order = np.lexsort((th, row))
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = (row[order][1:] != row[order][:-1]) | (
            th[order][1:] != th[order][:-1])
        sel = order[keep]
        return flat.take(pa.array(sel, pa.int64())), doc, row[sel]

    stop_ref = None
    if df_cap is not None:
        from ray.data.aggregate import Count

        def explode_distinct(batch: pa.Table) -> pa.Table:
            flat, _, _ = _distinct_doc_tokens(batch)
            return pa.table(
                {"token": flat,
                 "_one": pa.array(np.ones(len(flat), np.int64), pa.int64())}
            )

        df_tbl = (
            ds.map_batches(explode_distinct, batch_format="pyarrow")
            .groupby("token")
            .aggregate(Count(alias_name="df"))
        )
        # hot-token set is tiny by construction — bounded driver pull
        hot = df_tbl.map_batches(
            lambda b: b.filter(pa.compute.greater(b.column("df"), df_cap)),
            batch_format="pyarrow",
        ).to_pandas()
        stop_ref = ray.put(list(hot["token"]))

    def explode_tokens(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, doc, row = _distinct_doc_tokens(batch)
        if stop_ref is not None:
            stop = ray.get(stop_ref)
            if len(stop):
                keep = pc.invert(pc.is_in(
                    flat, value_set=pa.array(stop, pa.string()))).to_numpy(
                    zero_copy_only=False)
                flat = flat.filter(pa.array(keep))
                row = row[keep]
        n_per_doc = np.bincount(row, minlength=len(doc)).astype(np.int64)
        return pa.table(
            {
                "token": flat,
                "doc_id": pa.array(doc[row], pa.int64()),
                "n_tokens": pa.array(n_per_doc[row], pa.int64()),
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

    out_col = "c1000" if metric == "containment" else "j1000"

    def finish(batch: pa.Table) -> pa.Table:
        sh = batch.column("shared").to_numpy()
        na = batch.column("na_sum").to_numpy() // np.maximum(sh, 1)
        nb = batch.column("nb_sum").to_numpy() // np.maximum(sh, 1)
        if metric == "containment":
            denom = np.minimum(na, nb)
        else:
            denom = na + nb - sh
        v1000 = (sh * 1000) // np.maximum(denom, 1)
        m = v1000 >= int(threshold * 1000)
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(m)),
                "b": batch.column("b").filter(pa.array(m)),
                out_col: pa.array(v1000[m], pa.int64()),
            }
        )

    return shared.map_batches(finish, batch_format="pyarrow")


# --------------------------------------------- component clustering --


def fastss_pairs(ds, col: str = "host", max_group: int = 64):
    """Edit-distance-1 string pairs via DELETION-NEIGHBORHOOD blocking
    (FastSS): every distinct string emits itself plus each 1-deletion
    variant; strings sharing a variant are candidates (complete for
    lev<=1: a substitution shares the both-sides deletion, an indel shares
    the undeleted original); the exact Levenshtein DP verifies.

    Scale shape: the variant fan-out runs over the DISTINCT key table
    (bounded by vocabulary x avg length, not corpus rows), candidates
    bucket by variant hash (groups are tiny — ``max_group`` caps the
    pathological bucket with the same star fallback as the LSH path),
    pair dedup is ONE groupby, verification is per-pair vectorized DP.
    Output: (host_a, host_b) with lev == 1, a < b lexicographically.
    """
    from ray.data.aggregate import Count

    from .text import _levenshtein_np

    def distinct_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return pa.table({col: v.unique()})

    keys = (
        ds.map_batches(distinct_partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def variants(batch: pa.Table) -> pa.Table:
        vs, hs = [], []
        for h in batch.column(col).to_pylist():
            vs.append(h)
            hs.append(h)
            for i in range(len(h)):
                vs.append(h[:i] + h[i + 1:])
                hs.append(h)
        return pa.table({"variant": pa.array(vs, pa.string()),
                         col: pa.array(hs, pa.string())})

    def pairs_in_group(g: pa.Table) -> pa.Table:
        hs = sorted(set(g.column(col).to_pylist()))[:max_group]
        a, b = [], []
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                a.append(hs[i])
                b.append(hs[j])
        return pa.table({"host_a": pa.array(a, pa.string()),
                         "host_b": pa.array(b, pa.string())})

    cand = (
        keys.map_batches(variants, batch_format="pyarrow")
        .groupby("variant")
        .map_groups(lambda g: pairs_in_group(g.drop_columns(["variant"])),
                    batch_format="pyarrow")
        .groupby(["host_a", "host_b"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def verify(batch: pa.Table) -> pa.Table:
        a = batch.column("host_a").to_pylist()
        b = batch.column("host_b").to_pylist()
        ok = [
            _levenshtein_np(x.encode(), y.encode()) == 1 for x, y in zip(a, b)
        ]
        return batch.filter(pa.array(ok))

    return cand.map_batches(verify, batch_format="pyarrow")


def connected_components(edges_ds, a_col: str = "a", b_col: str = "b",
                         n_buckets: int = 64, max_rounds: int = 32):
    """Connected components over a near-dup pair Dataset -> (node, comp)
    with ``comp`` = min node id of the component — the final clustering
    step of a dedup pipeline (pick one representative per component).

    Distributed min-label propagation: each round ships every node's
    current label across its edges (bucketed shuffle join, same pattern as
    the OSM way⋈node join) and keeps the per-node min.  Rounds are bounded
    by the component diameter; near-dup components are stars/cliques from
    the pair emitters (diameter <= ~2 per blocking table), so a handful of
    rounds converges — ``max_rounds`` guards pathological chains.  Labels
    are materialized once per round (the iterative-algorithm exception to
    no-mid-pipeline-materialize: each round's output IS the next input).
    Convergence is detected with an O(1) aggregate (sum of labels is
    strictly decreasing until fixpoint).
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col).to_numpy()
        b = batch.column(b_col).to_numpy()
        # both directions so labels flow both ways
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = edges_ds.map_batches(to_edges, batch_format="pyarrow").materialize()

    labels = (
        edges.groupby("u")
        .aggregate(Min("v", alias_name="_dummy"))
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("u"),
                    "label": t.column("u"),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    # narrow overloaded exchange (the join_way_nodes discipline): label
    # rows carry (a=node, b=label, side=0), edge rows (a=u, b=v, side=1) —
    # two int64 key columns instead of four null-padded ones
    def tag_lab(batch: pa.Table) -> pa.Table:
        a = batch.column("node").to_numpy()
        return pa.table({
            "a": batch.column("node"), "b": batch.column("label"),
            "bkt": pa.array(a % n_buckets, pa.int64()),
            "side": pa.array(np.zeros(batch.num_rows, np.int8), pa.int8()),
        })

    def tag_edge(batch: pa.Table) -> pa.Table:
        a = batch.column("u").to_numpy()
        return pa.table({
            "a": batch.column("u"), "b": batch.column("v"),
            "bkt": pa.array(a % n_buckets, pa.int64()),
            "side": pa.array(np.ones(batch.num_rows, np.int8), pa.int8()),
        })

    def join_bucket(g: pa.Table) -> pa.Table:
        # rows: label side (node, label) + edge side (u, v); emit (v, label[u])
        import pyarrow.compute as pc

        is_lab = pc.equal(g.column("side"), 0)
        lab_t = g.filter(is_lab)
        edge_t = g.filter(pc.invert(is_lab))
        nodes = lab_t.column("a").to_numpy()
        labs = lab_t.column("b").to_numpy()
        order = np.argsort(nodes, kind="stable")
        nodes_s, labs_s = nodes[order], labs[order]
        u = edge_t.column("a").to_numpy()
        pos = np.searchsorted(nodes_s, u)
        pos_c = np.minimum(pos, max(len(nodes_s) - 1, 0))
        ok = (len(nodes_s) > 0) & (pos < len(nodes_s))
        ok = ok & (nodes_s[pos_c] == u) if len(nodes_s) else np.zeros(len(u), bool)
        hit = np.flatnonzero(ok)
        return pa.table(
            {
                "node": pa.array(
                    np.concatenate([edge_t.column("b").to_numpy()[hit], nodes]),
                    pa.int64(),
                ),
                "cand": pa.array(np.concatenate([labs_s[pos[hit]], labs]), pa.int64()),
            }
        )

    prev_sum = None
    for _ in range(max_rounds):
        lab_side = labels.map_batches(tag_lab, batch_format="pyarrow")
        edge_side = edges.map_batches(tag_edge, batch_format="pyarrow")
        labels = (
            lab_side.union(edge_side)
            .groupby("bkt")
            .map_groups(
                lambda g: join_bucket(g.drop_columns(["bkt"])),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Min("cand", alias_name="label"))
            .materialize()
        )
        s = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if prev_sum is not None and s == prev_sum:
            break
        prev_sum = s
    return labels.map_batches(
        lambda t: pa.table(
            {"node": t.column("node"), "comp": t.column("label")}
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------- line dedup --


def _explode_lines(batch: pa.Table, col: str = "text") -> pa.Table:
    """One row per line: doc_id, ord (0-based position), line, 128-bit
    line hash — all array-level (split_pattern + list_flatten + repeat)."""
    import pyarrow.compute as pc

    from ..functions.vmd5 import digest128_u64_arrow

    s = batch.column(col)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    ls = pc.split_pattern(s, "\n")
    counts = pc.list_value_length(ls).to_numpy().astype(np.int64)
    flat = pc.list_flatten(ls)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc = np.repeat(batch.column("doc_id").to_numpy(), counts)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    ordv = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, counts)
    hi, lo = digest128_u64_arrow(flat)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "ord": pa.array(ordv, pa.int64()),
            "line": flat,
            "h_hi": pa.array(hi.astype(np.int64), pa.int64()),
            "h_lo": pa.array(lo.astype(np.int64), pa.int64()),
        }
    )


def _member2(hi: np.ndarray, lo: np.ndarray, bhi_s: np.ndarray,
             blo_s: np.ndarray) -> np.ndarray:
    """Exact vectorized membership of (hi, lo) rows in a (lex-sorted by
    hi-then-lo) reference pair set: searchsorted range on hi, single-probe
    lo compare (the overwhelmingly common range==1 case), with a loop ONLY
    over hi-collision ranges (rare by construction: reference set is small)."""
    n = len(hi)
    match = np.zeros(n, dtype=bool)
    if len(bhi_s) == 0 or n == 0:
        return match
    left = np.searchsorted(bhi_s, hi, "left")
    right = np.searchsorted(bhi_s, hi, "right")
    one = right - left == 1
    idx = np.minimum(left, len(bhi_s) - 1)
    match[one] = blo_s[idx[one]] == lo[one]
    for i in np.nonzero(right - left > 1)[0]:
        match[i] = lo[i] in blo_s[left[i]:right[i]]
    return match


def line_dedup(ds, max_df: int = 10, col: str = "text", n_buckets: int = 64):
    """Corpus-level duplicate-LINE removal (the C4/RefinedWeb boilerplate
    scrub): drop every line whose exact content appears in more than
    ``max_df`` documents' lines corpus-wide, then reassemble each document
    from its surviving lines in original order.

    Output: doc_id, n_lines, n_kept, clean_text ('' when everything was
    boilerplate — fully-scrubbed docs are still emitted).

    Scale shape: pass 1 streams line-hash partial counts into a small
    ``groupby`` (volume = distinct lines per batch, not lines); the >max_df
    survivor set is BROADCAST (``ray.put``) — bounded by total_lines/max_df
    distinct values and in practice tiny (boilerplate is, by definition,
    repeated); pass 2 re-explodes, marks keep via exact 128-bit membership,
    and reassembles per doc-hash bucket with one in-group lexsort + list
    offsets + ``pc.binary_join`` (no per-doc Python).  If the survivor set
    ever outgrew a broadcast, the same mark step drops onto the repo's
    hash-bucket join pattern (``pipelines/osm.py``) — documented fallback,
    not needed at any tested scale.
    """
    import ray

    def df_partial(batch: pa.Table) -> pa.Table:
        # distinct (h_hi, h_lo) counts per batch, lexsort+run-boundary
        # (numpy, no pandas groupby) + a hash bucket for the merge shuffle
        t = _explode_lines(batch, col)
        hi = t.column("h_hi").to_numpy()
        lo = t.column("h_lo").to_numpy()
        order = np.lexsort((lo, hi))
        hi_s, lo_s = hi[order], lo[order]
        new = np.concatenate(
            [[True], (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(hi_s))
        return pa.table({
            "h_hi": pa.array(hi_s[starts], pa.int64()),
            "h_lo": pa.array(lo_s[starts], pa.int64()),
            "c_part": pa.array(ends - starts, pa.int64()),
            "hbucket": pa.array(
                (hi_s[starts].astype(np.uint64) % np.uint64(n_buckets))
                .astype(np.int64), pa.int64()),
        })

    def df_merge(g: pa.Table) -> pa.Table:
        # fused merge + >max_df HAVING filter per hash bucket: output is
        # the tiny boilerplate set, never the full distinct-line table
        # (built-in two-key Sum Aggregate at distinct-line cardinality
        # measured ~2x slower than this bucket body)
        if g.num_rows == 0:  # guard: reduceat(starts=[0]) raises on empty
            return pa.schema([("h_hi", pa.int64()), ("h_lo", pa.int64()),
                              ("c", pa.int64())]).empty_table()
        hi = g.column("h_hi").to_numpy()
        lo = g.column("h_lo").to_numpy()
        cp = g.column("c_part").to_numpy()
        order = np.lexsort((lo, hi))
        hi_s, lo_s = hi[order], lo[order]
        new = np.concatenate(
            [[True], (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])])
        starts = np.flatnonzero(new)
        c = np.add.reduceat(cp[order], starts)
        keep = c > max_df
        return pa.table({
            "h_hi": pa.array(hi_s[starts][keep], pa.int64()),
            "h_lo": pa.array(lo_s[starts][keep], pa.int64()),
            "c": pa.array(c[keep], pa.int64()),
        })

    boiler = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(df_merge, batch_format="pyarrow")
        .to_pandas()  # post-aggregation, filtered: small by construction
    )
    if "h_hi" not in boiler.columns:  # empty result loses its schema
        boiler = pd.DataFrame({"h_hi": [], "h_lo": []})
    bhi = boiler["h_hi"].to_numpy(dtype=np.int64)
    blo = boiler["h_lo"].to_numpy(dtype=np.int64)
    order = np.lexsort((blo, bhi))
    handle = ray.put((bhi[order], blo[order]))

    def mark(batch: pa.Table) -> pa.Table:
        t = _explode_lines(batch, col)
        bhi_s, blo_s = ray.get(handle)
        drop = _member2(
            t.column("h_hi").to_numpy(), t.column("h_lo").to_numpy(),
            bhi_s, blo_s,
        )
        doc = t.column("doc_id").to_numpy()
        bucket = (doc.astype(np.uint64) * _COMBINE_PRIME
                  % np.uint64(n_buckets)).astype(np.int64)
        return (
            t.select(["doc_id", "ord", "line"])
            .append_column("keep", pa.array(~drop))
            .append_column("bucket", pa.array(bucket, pa.int64()))
        )

    def assemble(g: pa.Table) -> pa.Table:
        doc = g.column("doc_id").to_numpy()
        ordv = g.column("ord").to_numpy()
        keep = g.column("keep").to_numpy(zero_copy_only=False)
        lines = g.column("line")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        order = np.lexsort((ordv, doc))
        doc_s = doc[order]
        keep_s = keep[order]
        run_start = np.ones(len(doc_s), dtype=bool)
        run_start[1:] = doc_s[1:] != doc_s[:-1]
        starts = np.nonzero(run_start)[0]
        bounds = np.concatenate([starts, [len(doc_s)]])
        n_lines = np.diff(bounds)
        n_kept = np.add.reduceat(keep_s.astype(np.int64), starts)
        n_kept[n_lines == 0] = 0  # reduceat quirk on empty runs (unreachable)
        kept_lines = lines.take(pa.array(order[keep_s], pa.int64()))
        offsets = np.concatenate([[0], np.cumsum(n_kept)])
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), kept_lines
        )
        import pyarrow.compute as pc2

        return pa.table(
            {
                "doc_id": pa.array(doc_s[starts], pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "clean_text": pc2.binary_join(la, "\n"),
            }
        )

    return (
        ds.map_batches(mark, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: assemble(g.drop_columns(["bucket"])),
            batch_format="pyarrow",
        )
    )


# ------------------------------------------------------ decontamination --


def probe_gram_hashes(ds, k: int = 3, mod: int = 97, col: str = "text"):
    """Benchmark-probe k-gram hash set for :func:`decontaminate`.

    Derives one probe per doc with ``doc_id % mod == 0`` (its first k
    words), hashed with the SAME FNV word-combine as ``_shingle_flat`` so
    probe and corpus grams live in one hash space.  In production the probe
    list is an external benchmark suite (a small file); this derivation
    keeps the demo self-contained and SQL-mirrorable.  Returns a sorted
    unique uint64 array (small: |docs|/mod entries, driver-collected
    post-filter like the other broadcast small sides).
    """
    def partial(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        m = d % mod == 0
        out = np.empty(0, np.uint64)
        if m.any():
            texts = batch.column(col).combine_chunks().filter(pa.array(m))
            flat, lens = _flat_tokens(texts)
            wh = fnv64_arrow(flat)
            ws = np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.int64)
            ok = lens >= k
            if ok.any():
                with np.errstate(over="ignore"):
                    v = wh[ws[ok]].copy()
                    for j in range(1, k):
                        v = v * _COMBINE_PRIME + wh[ws[ok] + j]
                out = v
        return pa.table({"probe_h": pa.array(out, pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.unique(parts["probe_h"].to_numpy(dtype=np.uint64))


def split_leakage(ds, k: int = 5, val_bp: int = 100, test_bp: int = 100,
                  col: str = "text"):
    """Train->test contamination audit: for every TEST-split document (the
    ``dataset_split`` M61 rule), how many of its word-k-gram positions
    also occur in ANY train document — the leakage check run before
    trusting held-out metrics.

    Scale plan (the broadcast side is always the SMALL split): pass 1
    collects the test split's distinct shingle hashes (bounded by the 1%
    split); pass 2 streams the TRAIN split and keeps only shingles in
    that broadcast set (matched set <= test shingles, collected small);
    pass 3 re-streams test docs and counts positions whose shingle is in
    the matched set.  Three linear passes, zero row-level shuffles.
    Output: (doc_id, n_leaked, leaked) for test docs.
    """
    import ray

    from .sketch import hash61

    def split_mask(batch: pa.Table, want: str) -> np.ndarray:
        h = hash61(batch.column("doc_id").to_numpy().astype(np.int64)) % 10000
        if want == "test":
            return (h >= val_bp) & (h < val_bp + test_bp)
        return h >= val_bp + test_bp  # train

    def test_shingles(batch: pa.Table) -> pa.Table:
        m = split_mask(batch, "test")
        sh = np.empty(0, np.uint64)
        if m.any():
            sh, _ = _shingle_flat(
                batch.column(col).combine_chunks().filter(pa.array(m)), k)
        return pa.table({"sh": pa.array(np.unique(sh), pa.uint64())})

    tsh = np.unique(
        ds.map_batches(test_shingles, batch_format="pyarrow")
        .to_pandas()["sh"].to_numpy(dtype=np.uint64))  # bounded: test split
    t_handle = ray.put(tsh)

    def train_matches(batch: pa.Table) -> pa.Table:
        m = split_mask(batch, "train")
        out = np.empty(0, np.uint64)
        if m.any():
            sh, _ = _shingle_flat(
                batch.column(col).combine_chunks().filter(pa.array(m)), k)
            ph = _resolve_handle(t_handle)
            if len(ph) and len(sh):
                pos = np.minimum(np.searchsorted(ph, sh), len(ph) - 1)
                out = np.unique(sh[ph[pos] == sh])
        return pa.table({"sh": pa.array(out, pa.uint64())})

    matched = np.unique(
        ds.map_batches(train_matches, batch_format="pyarrow")
        .to_pandas()["sh"].to_numpy(dtype=np.uint64))  # <= |test shingles|
    m_handle = ray.put(matched)

    def mark_test(batch: pa.Table) -> pa.Table:
        m = split_mask(batch, "test")
        sub = batch.filter(pa.array(m))
        if sub.num_rows == 0:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "n_leaked": pa.array([], pa.int64()),
                "leaked": pa.array([], pa.bool_()),
            })
        sh, starts = _shingle_flat(sub.column(col), k)
        ph = _resolve_handle(m_handle)
        if len(ph) and len(sh):
            pos = np.minimum(np.searchsorted(ph, sh), len(ph) - 1)
            hit = (ph[pos] == sh).astype(np.int64)
        else:
            hit = np.zeros(len(sh), np.int64)
        c = np.concatenate([[0], np.cumsum(hit)])
        n = c[starts[1:]] - c[starts[:-1]]
        return pa.table({
            "doc_id": sub.column("doc_id"),
            "n_leaked": pa.array(n, pa.int64()),
            "leaked": pa.array(n > 0),
        })

    return ds.map_batches(mark_test, batch_format="pyarrow")


def _resolve_handle(h):
    import ray as _r

    return _r.get(h) if isinstance(h, _r.ObjectRef) else h


def decontaminate(ds, probes_handle, k: int = 3, col: str = "text"):
    """Benchmark decontamination (GPT-3/Lee-et-al. style): per doc, count
    word-k-gram positions whose gram is in the broadcast probe set.

    Output: doc_id, n_hits, contaminated — a training pipeline filters on
    ``~contaminated``.  Scale shape: probe set broadcast once (``ray.put``),
    per-batch vectorized shingle hashing (`_shingle_flat`) + sorted
    searchsorted membership; no shuffle at all.  Equality is in 64-bit
    shingle-hash space (the oracle compares gram STRINGS — divergence needs
    an FNV collision, same accepted class as the dedup suite).
    """
    import ray

    def mark(batch: pa.Table) -> pa.Table:
        text = batch.column(col).to_pandas()
        sh, starts = _shingle_flat(text, k)
        ph = _resolve_probes(probes_handle)
        if len(ph) and len(sh):
            pos = np.minimum(np.searchsorted(ph, sh), len(ph) - 1)
            hit = (ph[pos] == sh).astype(np.int64)
        else:
            hit = np.zeros(len(sh), np.int64)
        c = np.concatenate([[0], np.cumsum(hit)])
        n_hits = c[starts[1:]] - c[starts[:-1]]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_hits": pa.array(n_hits, pa.int64()),
                "contaminated": pa.array(n_hits > 0),
            }
        )

    def _resolve_probes(h):
        import ray as _r

        return _r.get(h) if isinstance(h, _r.ObjectRef) else h

    return ds.map_batches(mark, batch_format="pyarrow")


# ------------------------------------------------- duplicated substrings --


def _span_shingles(batch: pa.Table, length: int, stride: int,
                   col: str = "text") -> tuple:
    """Vectorized fixed-length span extraction: every document contributes
    a ``length``-byte window at byte offsets 0, stride, 2*stride, ...
    (last window fully inside the doc).  One fancy-index over the flat
    UTF-8 buffer builds ALL windows at once — no per-row slicing.

    Returns (matrix, doc_rep): (n_spans, length) uint8 matrix + the doc id
    of each span.  ASCII-only inputs make byte offsets == char offsets,
    which is what lets the DuckDB ``substr`` oracle mirror this exactly;
    non-ASCII inputs raise (the operator is still correct byte-wise, but
    the oracle contract would silently diverge).
    """
    s = batch.column(col)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    if s.null_count:
        raise ValueError("dup_spans: null text not supported")
    arr = s.cast(pa.large_string())
    n = len(arr)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    lens = offs[1:] - offs[:-1]
    if np.any(data[offs[0]:offs[-1]] > 127):
        raise ValueError("dup_spans: non-ASCII text breaks the char==byte "
                         "oracle contract")
    npos = np.where(lens >= length, (lens - length) // stride + 1, 0)
    total = int(npos.sum())
    doc_rep = np.repeat(batch.column("doc_id").to_numpy(), npos)
    if total == 0:
        return np.empty((0, length), np.uint8), doc_rep
    excl = np.concatenate([[0], np.cumsum(npos)[:-1]])
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(excl, npos)
    starts = np.repeat(offs[:-1], npos) + pos_in_doc * stride
    matrix = data[starts[:, None] + np.arange(length)]
    return matrix, doc_rep


def _merge_span_doc(matrix: np.ndarray, doc: np.ndarray,
                    counts: np.ndarray | None = None) -> tuple:
    """Collapse (span, doc) rows to distinct pairs with summed counts via
    one structured-array sort (C-speed, no Python per row)."""
    length = matrix.shape[1]
    rec = np.empty(len(doc), dtype=[("sh", np.void, length), ("doc", np.int64)])
    rec["sh"] = np.ascontiguousarray(matrix).view(
        np.dtype((np.void, length))).reshape(-1)
    rec["doc"] = doc
    order = np.argsort(rec, kind="stable")
    rs = rec[order]
    first = np.ones(len(rs), dtype=bool)
    first[1:] = rs[1:] != rs[:-1]
    starts = np.flatnonzero(first)
    c = np.ones(len(rs), np.int64) if counts is None else counts[order]
    merged = np.add.reduceat(c, starts) if len(starts) else np.empty(0, np.int64)
    return rs[starts], merged, starts, first


def dup_spans(ds, length: int = 32, stride: int = 16, col: str = "text",
              id_col: str = "doc_id", n_buckets: int = 64):
    """Exact duplicated-substring detection (the detection pass of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models Better",
    stride-``stride`` windowing in place of the single-machine suffix
    array): for every document, count the fixed-stride ``length``-char
    windows whose exact content also appears in at least one OTHER
    document.  Output: one row per affected doc — (doc_id, n_dup_spans).

    Scale shape: per-batch vectorized window extraction (ONE fancy-index
    over the flat UTF-8 buffer), per-batch (span, doc)->count partial
    collapse (structured sort, cuts shuffle volume by the in-batch dup
    factor), ONE hash-bucket shuffle on the span content (buckets hold
    many spans — never a per-span tiny group), per-bucket cross-doc test
    + per-doc partial sums, then a small ``groupby(doc_id)`` over partials.
    A span repeated in millions of docs costs linear work (its rows list),
    never a pairwise blow-up.  Shuffle volume is ~length/stride x corpus
    bytes (2x at the defaults) before the in-batch collapse.
    """
    from ray.data.aggregate import Sum

    def extract(batch: pa.Table) -> pa.Table:
        matrix, doc = _span_shingles(batch, length, stride, col=col)
        pairs, cnt, _, _ = _merge_span_doc(matrix, doc)
        sh_bytes = np.frombuffer(pairs["sh"].tobytes(), np.uint8).reshape(
            -1, length)
        h = np.full(len(pairs), 14695981039346656037, dtype=np.uint64)
        for j in range(length):
            h = (h ^ sh_bytes[:, j].astype(np.uint64)) * _COMBINE_PRIME
        buf = pa.py_buffer(sh_bytes.tobytes())
        sh_arr = pa.Array.from_buffers(pa.binary(length), len(pairs), [None, buf])
        return pa.table(
            {
                "bucket": pa.array((h % np.uint64(n_buckets)).astype(np.int64),
                                   pa.int64()),
                "sh": sh_arr,
                "doc_id": pa.array(pairs["doc"], pa.int64()),
                "n_pos": pa.array(cnt, pa.int64()),
            }
        )

    def bucket_dups(g: pa.Table) -> pa.Table:
        sh = g.column("sh")
        if isinstance(sh, pa.ChunkedArray):
            sh = sh.combine_chunks()
        matrix = np.frombuffer(sh.buffers()[1], dtype=np.uint8).reshape(
            -1, length)[sh.offset:sh.offset + len(sh)]
        doc = g.column("doc_id").to_numpy()
        cnt = g.column("n_pos").to_numpy()
        pairs, merged, starts, _ = _merge_span_doc(matrix, doc, cnt)
        # span-run boundaries over the distinct (span, doc) rows
        sh_only = pairs["sh"]
        new_span = np.ones(len(pairs), dtype=bool)
        new_span[1:] = sh_only[1:] != sh_only[:-1]
        span_start = np.flatnonzero(new_span)
        span_docs = np.diff(np.append(span_start, len(pairs)))
        dup_row = np.repeat(span_docs, span_docs) >= 2
        d, c = pairs["doc"][dup_row], merged[dup_row]
        if len(d) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64())})
        od = np.argsort(d, kind="stable")
        d_s, c_s = d[od], c[od]
        fd = np.ones(len(d_s), dtype=bool)
        fd[1:] = d_s[1:] != d_s[:-1]
        ds_idx = np.flatnonzero(fd)
        return pa.table(
            {
                "doc_id": pa.array(d_s[ds_idx], pa.int64()),
                "n_part": pa.array(np.add.reduceat(c_s, ds_idx), pa.int64()),
            }
        )

    return (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: bucket_dups(g.drop_columns(["bucket"])),
                    batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_part", alias_name="n_dup_spans"))
    )

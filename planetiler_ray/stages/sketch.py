"""Distributed cardinality sketches (HyperLogLog).

The 100-TB use case: "distinct users per event type" over 10^12 rows —
an exact distinct is a full shuffle of every (type, user) pair, while the
HLL register table is ``groups x 2^p`` integers built from per-batch
partials and merged with ``max``: constant state per group, one tiny
all-to-all.

Everything here is EXACTLY mirrorable in ANSI SQL (the correctness gate's
whole point), which drives two design choices:

* the value hash is multiplicative hashing modulo the Mersenne prime
  M61 = 2^61 - 1 — DuckDB computes it with HUGEINT arithmetic, numpy with
  a decomposed 128-bit multiply (`_mulmod61`); both produce identical
  integers, unlike any builtin ``hash()``.
* rho uses TRAILING zeros of the non-register bits (Flajolet-Martin
  style), because ``w & -w`` is a power of two whose float ``log2`` is
  exact in both engines; leading-zero counts have no exact SQL analogue.

Reference for the estimator: Flajolet et al. 2007 (HyperLogLog), with the
small-range linear-counting correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

M61 = (1 << 61) - 1
# random-looking odd constants < M61 (avalanche validated by the estimate
# accuracy unit test, which fails loudly if register occupancy is skewed)
HASH_A = 1752450205419405103
HASH_B = 1803867173528181589
HASH_C = 1234567891011121314
_MASK32 = np.uint64(0xFFFFFFFF)


def _mulmod61(a: np.ndarray, b: int) -> np.ndarray:
    """(a * b) mod (2^61 - 1) for uint64 a < 2^61, scalar b < 2^61 —
    decomposed 32-bit-half multiply (numpy wraps at 2^64; we need the
    true 128-bit product), then reduction via 2^61 === 1 (mod M61)."""
    a = a.astype(np.uint64)
    b = np.uint64(b)
    a0, a1 = a & _MASK32, a >> np.uint64(32)
    b0, b1 = b & _MASK32, b >> np.uint64(32)
    t = a0 * b0
    k = t >> np.uint64(32)
    lo = t & _MASK32
    t = a1 * b0 + k
    k2 = t & _MASK32
    w2 = t >> np.uint64(32)
    t = a0 * b1 + k2
    k3 = t >> np.uint64(32)
    hi = a1 * b1 + w2 + k3          # true high 64 bits
    lo = lo | (t << np.uint64(32))  # true low 64 bits (wrapping ok)
    # x = hi*2^64 + lo;  2^64 === 8 (mod M61);  lo = l1*2^61 + l0 === l1+l0
    s = np.uint64(8) * hi + (lo >> np.uint64(61)) + (lo & np.uint64(M61))
    return s % np.uint64(M61)


def hash61(v: np.ndarray) -> np.ndarray:
    """Murmur-style mix into [0, 2^61-1): multiply mod M61 interleaved
    with xor-shift folds.  The folds are the crucial nonlinearity — a
    purely multiplicative (affine) hash maps consecutive ids to an
    arithmetic progression whose trailing-zero pattern is near-
    deterministic, which biases the HLL estimator ~40% high (observed).
    Both steps stay SQL-expressible: DuckDB ``xor()`` + ``//`` shifts."""
    h = v.astype(np.uint64) % np.uint64(M61)
    h = (_mulmod61(h, HASH_A) + np.uint64(HASH_C)) % np.uint64(M61)
    h = (h ^ (h >> np.uint64(29))) % np.uint64(M61)
    h = _mulmod61(h, HASH_B)
    return (h ^ (h >> np.uint64(31))) % np.uint64(M61)


def hll_registers(ds, group_col: str, value_col: str, p: int = 8):
    """Sparse HLL register table per group: (group, register, max_rho).

    register = h % 2^p, w = h // 2^p, rho = trailing_zeros(w) + 1
    (w == 0 -> 61 - p + 1).  Per-batch partial max per (group, register)
    -> one small ``groupby().max()``; rows out <= groups x 2^p regardless
    of input size.  ``p >= 6`` keeps ``w < 2^55`` so the float log2 of the
    isolated lowest bit is exact (same guarantee the SQL mirror relies on).
    """
    from ray.data.aggregate import Max

    if not 6 <= p <= 16:
        raise ValueError("p must be in [6, 16]")
    m_mask = np.uint64((1 << p) - 1)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy().astype(np.int64)
        h = hash61(v)
        reg = (h & m_mask).astype(np.int64)
        w = h >> np.uint64(p)
        lowest = w & (~w + np.uint64(1))
        rho = np.where(
            w == 0, 61 - p + 1,
            np.log2(np.maximum(lowest, np.uint64(1)).astype(np.float64)).astype(np.int64) + 1,
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "g": batch.column(group_col).to_pandas(),
                "register": reg,
                "rho": rho,
            }
        )
        out = df.groupby(["g", "register"], as_index=False)["rho"].max()
        return pa.table(
            {
                group_col: pa.array(out["g"]),
                "register": pa.array(out["register"].to_numpy(), pa.int64()),
                "max_rho": pa.array(out["rho"].to_numpy(), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group_col, "register"])
        .aggregate(Max("max_rho", alias_name="max_rho"))
    )


def hll_estimate(registers: pd.DataFrame, group_col: str, p: int = 8) -> pd.DataFrame:
    """Cardinality estimate per group from a sparse register table
    (harmonic mean + linear-counting small-range correction)."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for g, sub in registers.groupby(group_col):
        zeros = m - len(sub)
        s = zeros * 1.0 + np.power(2.0, -sub["max_rho"].to_numpy()).sum()
        e = alpha * m * m / s
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)
        out.append({group_col: g, "estimate": float(e)})
    return pd.DataFrame(out)


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------

# per-row affine post-mix constants (a_i, b_i) applied to the avalanched
# hash61 value — independence across rows comes from the multipliers, the
# avalanche from hash61 itself (same reasoning as the HLL register split)
CMS_ROWS = (
    (1752450205419405103, 97531),
    (1803867173528181589, 86420),
    (1234567891011121314, 13579),
    (1469598103934665603, 24680),
)


def cms_counts(ds, key_col: str = "user_id", w: int = 1024,
               probe_mod: int = 7):
    """Count-Min Sketch frequency estimation (Cormode–Muthukrishnan) with
    probe verification — the streaming heavy-hitter counter.

    Build: per batch, each key increments d=4 register cells
    ``(i, ((hash61(key)·a_i + b_i) mod M61) mod w)``; per-batch partials are
    a bounded ``bincount`` over the d·w cell domain -> ONE groupby-sum ->
    a d·w register table (4096 ints, driver-sized by design, broadcast
    back).  Estimate(key) = min_i reg[i, col_i(key)] — always >= the true
    count (sketch guarantee, pinned in tests AND by the oracle, which
    rebuilds the identical registers in HUGEINT arithmetic).

    Probes: keys with ``key % probe_mod == 0`` get (estimate, true count)
    side by side; true counts come from an exact distributed groupby over
    the same pass.  Output: (user_id, est, true_n).
    """
    from ray.data.aggregate import Sum

    d = len(CMS_ROWS)

    def cols_for(h: np.ndarray) -> list[np.ndarray]:
        out = []
        for a, b in CMS_ROWS:
            c = ((_mulmod61(h, a) + np.uint64(b)) % np.uint64(M61)) % np.uint64(w)
            out.append(c.astype(np.int64))
        return out

    def reg_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key_col).to_numpy().astype(np.int64)
        h = hash61(v)
        idx = np.concatenate(
            [i * w + c for i, c in enumerate(cols_for(h))]
        )
        cnt = np.bincount(idx, minlength=d * w)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "cell": pa.array(nz.astype(np.int64), pa.int64()),
                "c_part": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    regs = (
        ds.map_batches(reg_partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("c_part", alias_name="cnt"))
        .to_pandas()
    )
    reg = np.zeros(d * w, dtype=np.int64)
    if len(regs):
        reg[regs["cell"].to_numpy()] = regs["cnt"].to_numpy()

    def true_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key_col).to_numpy().astype(np.int64)
        v = v[v % probe_mod == 0]
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "t_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def estimate(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy().astype(np.int64)
        h = hash61(u)
        est = np.min(
            np.stack([reg[i * w + c] for i, c in enumerate(cols_for(h))]),
            axis=0,
        )
        return batch.append_column("est", pa.array(est.astype(np.int64), pa.int64()))

    return (
        ds.map_batches(true_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("t_part", alias_name="true_n"))
        .map_batches(estimate, batch_format="pyarrow")
        .select_columns(["user_id", "est", "true_n"])
    )


# Bloom filter: k=4 bit positions from the same affine post-mixes as CMS
BLOOM_BITS = 1 << 14  # 16384 bits


def bloom_probe(build_ds, probe_ds, key_col: str = "doc_id",
                probe_key_col: str = "key", bits: int = BLOOM_BITS):
    """Bloom-filter membership (Bloom 1970) — the pre-join/dedup gate: build
    a bit array over the BUILD side's keys, then flag every PROBE key whose
    k=4 positions are all set.

    Build: per-batch partials set bits into a bounded ``bincount`` domain ->
    ONE groupby-max -> a ``bits``-wide bitmap (2 KiB here, driver-sized and
    broadcast — on a cluster, ``ray.put`` once).  Probe: vectorized bit
    lookups per batch; NO shuffle touches the probe stream (that is the
    bloom's whole point vs a semi-join).  False positives are inherent and
    EXACTLY reproduced by the oracle, which rebuilds the identical bitmap
    in HUGEINT arithmetic.  Output: (key, in_bloom).
    """
    from ray.data.aggregate import Max

    def positions(h: np.ndarray) -> list[np.ndarray]:
        out = []
        for a, b in CMS_ROWS:
            p = ((_mulmod61(h, a) + np.uint64(b)) % np.uint64(M61)) % np.uint64(bits)
            out.append(p.astype(np.int64))
        return out

    def bit_partial(batch: pa.Table) -> pa.Table:
        v = batch.column(key_col).to_numpy().astype(np.int64)
        idx = np.unique(np.concatenate(positions(hash61(v))))
        return pa.table(
            {
                "bit": pa.array(idx, pa.int64()),
                "one": pa.array(np.ones(len(idx), np.int64), pa.int64()),
            }
        )

    bitsdf = (
        build_ds.map_batches(bit_partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Max("one", alias_name="set1"))
        .to_pandas()
    )
    bitmap = np.zeros(bits, dtype=bool)
    if len(bitsdf):
        bitmap[bitsdf["bit"].to_numpy()] = True

    def probe(batch: pa.Table) -> pa.Table:
        v = batch.column(probe_key_col).to_numpy().astype(np.int64)
        inb = np.ones(len(v), dtype=bool)
        for p in positions(hash61(v)):
            inb &= bitmap[p]
        # pass-through: keep the probe stream's other columns intact
        return batch.append_column(
            "in_bloom", pa.array(inb.astype(np.int64), pa.int64())
        )

    return probe_ds.map_batches(probe, batch_format="pyarrow")

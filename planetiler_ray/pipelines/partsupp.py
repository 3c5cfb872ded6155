"""TPC-H partsupp-family queries (Q2 / Q9 / Q11 / Q16 / Q20) over a
DETERMINISTICALLY DERIVED partsupp table.

The sf dirs carry no ``partsupp.parquet``, so the table is defined as a
pure integer function of ``part`` x ``supplier`` — 4 suppliers per part
chosen by the public TPC-H dbgen quarter-stride rule (0-based here), and
availqty / supplycost as splittable modular hashes of (partkey, suppkey):

    S     = count(supplier)                (scale-consistent: 10/100/1000)
    q     = max(S // 4, 1)
    rot   = (pk // S) % q                  (per-part rotation)
    sk_i  = (pk + rot + i*q) % S           for i in 0..3   (4 distinct, S>=4)
    ps_availqty     = (pk*31  + sk*17 ) % 9999  + 1
    ps_supplycost_c = (pk*523 + sk*101) % 99900 + 100      (integer cents)

Both the engine (numpy closed forms below) and the DuckDB oracle (the
``PARTSUPP_CTE`` in oracle.py) derive the SAME table, so every query is
exact-oracle checkable.  The closed form also gives the engine a
membership test — ``d = (sk - pk - rot) mod S;  member iff d % q == 0 and
d // q < 4`` — so fact-table scans (lineitem) can probe partsupp WITHOUT
materializing it, which is the 100-TB trick: partsupp never ships, only
the (bounded) dimension scan that generates it and per-batch partials do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..stages.bucketagg import bucketed_sum

# 1996 calendar year in epoch microseconds (same constants as tpch_q5).
_Y1996_LO_US = 820_454_400_000_000
_Y1996_HI_US = 852_076_800_000_000


def supplier_count(sf_dir: str) -> int:
    """Row count from the parquet footer — no data read."""
    return pq.ParquetFile(f"{sf_dir}/supplier.parquet").metadata.num_rows


def derive_rows(pk: np.ndarray, s_count: int):
    """Expand partkeys to the 4 partsupp rows each: returns int64 arrays
    (pk4, sk4, availqty4, supplycost_c4), each ``4 * len(pk)`` long with a
    part's rows contiguous (enables in-batch per-part reductions)."""
    pk = pk.astype(np.int64)
    S = np.int64(s_count)
    q = max(s_count // 4, 1)
    rot = (pk // S) % q
    pk4 = np.repeat(pk, 4)
    base4 = np.repeat(pk + rot, 4)
    i4 = np.tile(np.arange(4, dtype=np.int64), pk.size)
    sk4 = (base4 + i4 * q) % S
    avail4 = (pk4 * 31 + sk4 * 17) % 9999 + 1
    cost4 = (pk4 * 523 + sk4 * 101) % 99900 + 100
    return pk4, sk4, avail4, cost4


def member_avail_cost(pk: np.ndarray, sk: np.ndarray, s_count: int):
    """Closed-form partsupp probe for arbitrary (pk, sk) pairs: returns
    (member mask, availqty, supplycost_c) without materializing the table
    — the fact-scan side of every partsupp join."""
    pk = pk.astype(np.int64)
    sk = sk.astype(np.int64)
    S = np.int64(s_count)
    q = np.int64(max(s_count // 4, 1))
    rot = (pk // S) % q
    d = (sk - pk - rot) % S
    member = (d % q == 0) & (d // q < 4)
    avail = (pk * 31 + sk * 17) % 9999 + 1
    cost = (pk * 523 + sk * 101) % 99900 + 100
    return member, avail, cost


def _region_suppliers(sf_dir: str, region: str):
    """Sorted suppkeys of one region plus aligned (acctbal, name, nation
    name) arrays — the broadcast small side (suppliers are a bounded
    dimension; ship once per actor, not per batch)."""
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    rkey = {n: k for k, n in zip(reg["r_regionkey"], reg["r_name"])}[region]
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nname = {int(k): str(n) for k, n, r in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist(),
        nat.column("n_regionkey").to_pylist()) if int(r) == rkey}
    supp = pq.read_table(f"{sf_dir}/supplier.parquet")
    sk = supp.column("s_suppkey").to_numpy()
    nk = supp.column("s_nationkey").to_numpy()
    keep = np.isin(nk, np.array(sorted(nname), np.int64))
    order = np.argsort(sk[keep], kind="stable")
    return (
        sk[keep][order].astype(np.int64),
        supp.column("s_acctbal").to_numpy()[keep][order],
        np.array(supp.column("s_name").to_pylist(), object)[keep][order],
        np.array([nname[int(k)] for k in nk[keep][order]], object),
    )


def q_tpch_q2(sf_dir: str, region: str = "ASIA", max_size: int = 25,
              ptype: str = "SMALL"):
    """TPC-H Q2 (minimum-cost supplier): for each part of one type within
    a size range, the region supplier(s) offering the minimum supplycost
    — the correlated-min-subquery shape.  (``p_size <= max_size`` instead
    of the spec's single size so the result is non-empty at every sf.)

    Scale plan: ZERO shuffles.  partsupp rows derive in-batch from the
    part scan with a part's 4 rows contiguous, so the correlated
    ``min(ps_supplycost)`` collapses to a masked row-wise ``reshape(-1,
    4).min(axis=1)``; region suppliers (bounded dimension) broadcast as
    sorted arrays.  Ties keep every min-cost supplier, like the spec."""
    rsk, racct, rname, rnat = _region_suppliers(sf_dir, region)
    S = supplier_count(sf_dir)
    BIG = np.int64(1 << 60)

    def body(batch: pa.Table) -> pa.Table:
        keep = (batch.column("p_size").to_numpy() <= max_size) & \
            (np.array(batch.column("p_type").to_pylist()) == ptype)
        pk = batch.column("p_partkey").to_numpy()[keep]
        out_empty = pa.table({
            "s_acctbal": pa.array([], pa.float64()),
            "s_name": pa.array([], pa.string()),
            "n_name": pa.array([], pa.string()),
            "p_partkey": pa.array([], pa.int64()),
            "ps_supplycost_c": pa.array([], pa.int64()),
        })
        if pk.size == 0:
            return out_empty
        pk4, sk4, _, cost4 = derive_rows(pk, S)
        pos = np.searchsorted(rsk, sk4)
        posc = np.minimum(pos, max(rsk.size - 1, 0))
        hit = (rsk.size > 0) & (pos < rsk.size)
        hit = hit & (rsk[posc] == sk4) if rsk.size else \
            np.zeros(sk4.size, bool)
        cost_m = np.where(hit, cost4, BIG)
        cmin = cost_m.reshape(-1, 4).min(axis=1)
        win = hit & (cost_m == np.repeat(cmin, 4))
        if not win.any():
            return out_empty
        p = pos[win]
        return pa.table({
            "s_acctbal": pa.array(racct[p], pa.float64()),
            "s_name": pa.array(list(rname[p]), pa.string()),
            "n_name": pa.array(list(rnat[p]), pa.string()),
            "p_partkey": pa.array(pk4[win], pa.int64()),
            "ps_supplycost_c": pa.array(cost4[win], pa.int64()),
        })

    return ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size", "p_type"],
    ).map_batches(body, batch_format="pyarrow")


def q_tpch_q9(sf_dir: str, name_like: str = "red"):
    """TPC-H Q9 (product-type profit): profit by (supplier nation, order
    year) over lineitems of name-matched parts, where profit nets out the
    derived partsupp supplycost — the 6-way join whose only BIG-BIG edge
    is lineitem x orders.

    Scale plan: part filter broadcasts as a sorted partkey array
    (bounded dimension); the partsupp probe is the closed-form membership
    test (no partsupp materialization, no extra join); supplier->nation
    broadcasts; the one exchange is the side-tagged orderkey bucket
    pattern (q5/q7's), whose body fuses the probe join with a
    (nation, year) bincount partial; a <=25x7-row groupby-sum finishes.
    Profit in exact integer cents x (100 - disc_pct) minus cost_c x qty
    x 100 — bitwise-matchable by DuckDB."""
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pname = np.array(part.column("p_name").to_pylist())
    bkeys = np.sort(part.column("p_partkey").to_numpy()[
        np.char.find(pname, name_like) >= 0].astype(np.int64))
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    ssk = supp.column("s_suppkey").to_numpy()
    order = np.argsort(ssk, kind="stable")
    ssk = ssk[order].astype(np.int64)
    snat = supp.column("s_nationkey").to_numpy()[order].astype(np.int64)
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nname = {int(k): str(n) for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}
    S = supplier_count(sf_dir)
    N_BUCKETS = 64

    def orders_side(batch: pa.Table) -> pa.Table:
        okey = batch.column("o_orderkey").to_numpy().astype(np.int64)
        years = (batch.column("o_orderdate").to_numpy()
                 .astype("datetime64[us]").astype("datetime64[Y]")
                 .astype(np.int64) + 1970)
        m = okey.size
        return pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "o_year": pa.array(years, pa.int64()),
            "s_nation": pa.nulls(m, pa.int64()),
            "amount": pa.nulls(m, pa.int64()),
            "side": pa.array(np.zeros(m, np.int8), pa.int8()),
            "obucket": pa.array(okey % N_BUCKETS, pa.int64()),
        })

    def line_side(batch: pa.Table) -> pa.Table:
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(bkeys, pk)
        posc = np.minimum(pos, max(bkeys.size - 1, 0))
        hit = (bkeys.size > 0) & (pos < bkeys.size)
        hit = hit & (bkeys[posc] == pk) if bkeys.size else \
            np.zeros(pk.size, bool)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        member, _, cost_c = member_avail_cost(pk, sk, S)
        keep = hit & member
        pk, sk, cost_c = pk[keep], sk[keep], cost_c[keep]
        price_c = np.round(batch.column("l_extendedprice")
                           .to_numpy()[keep] * 100).astype(np.int64)
        disc_pct = np.round(batch.column("l_discount")
                            .to_numpy()[keep] * 100).astype(np.int64)
        qty = np.round(batch.column("l_quantity")
                       .to_numpy()[keep]).astype(np.int64)
        amount = price_c * (100 - disc_pct) - cost_c * qty * 100
        okey = batch.column("l_orderkey").to_numpy()[keep].astype(np.int64)
        spos = np.searchsorted(ssk, sk)
        m = okey.size
        return pa.table({
            "l_orderkey": pa.array(okey, pa.int64()),
            "o_year": pa.nulls(m, pa.int64()),
            "s_nation": pa.array(snat[np.minimum(spos, ssk.size - 1)],
                                 pa.int64()),
            "amount": pa.array(amount, pa.int64()),
            "side": pa.array(np.ones(m, np.int8), pa.int8()),
            "obucket": pa.array(okey % N_BUCKETS, pa.int64()),
        })

    def bucket_body(g: pa.Table) -> pa.Table:
        empty = pa.table({"s_nation": pa.array([], pa.int64()),
                          "o_year": pa.array([], pa.int64()),
                          "amount_part": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        side = g.column("side").to_numpy()
        om = side == 0
        okeys = g.column("l_orderkey").to_numpy()[om]
        lm = ~om
        lkey = g.column("l_orderkey").to_numpy()[lm]
        if okeys.size == 0 or lkey.size == 0:
            return empty
        order = np.argsort(okeys, kind="stable")
        okeys_s = okeys[order]
        years_s = g.column("o_year").to_numpy()[om][order]
        pos = np.searchsorted(okeys_s, lkey)
        posc = np.minimum(pos, okeys_s.size - 1)
        hit = (pos < okeys_s.size) & (okeys_s[posc] == lkey)
        if not hit.any():
            return empty
        nat_h = g.column("s_nation").to_numpy()[lm][hit]
        amt_h = g.column("amount").to_numpy()[lm][hit]
        yr_h = years_s[posc[hit]]
        key = nat_h * 8192 + yr_h
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "s_nation": pa.array(u // 8192, pa.int64()),
            "o_year": pa.array(u % 8192, pa.int64()),
            "amount_part": pa.array(
                np.bincount(inv, amt_h).astype(np.int64), pa.int64()),
        })

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderdate"],
        ).map_batches(orders_side, batch_format="pyarrow")
        .union(ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice", "l_discount"],
        ).map_batches(line_side, batch_format="pyarrow"))
        .groupby("obucket")
        .map_groups(lambda g: bucket_body(g.drop_columns(["obucket"])),
                    batch_format="pyarrow")
        .groupby(["s_nation", "o_year"])
        .aggregate(Sum("amount_part", alias_name="profit_cbp"))
    )

    def name_back(batch: pa.Table) -> pa.Table:
        nk = batch.column("s_nation").to_numpy()
        return pa.table({
            "n_name": pa.array([nname[int(k)] for k in nk], pa.string()),
            "o_year": batch.column("o_year"),
            "profit_cbp": batch.column("profit_cbp"),
        })

    return agg.map_batches(name_back, batch_format="pyarrow")


def q_tpch_q11(sf_dir: str, frac_div: int = 2000):
    """TPC-H Q11 (important stock): per-part partsupp value
    (supplycost x availqty) over the MODAL supplier nation's suppliers
    (most suppliers, ties to the smallest nationkey — deterministic and
    non-empty at every sf, unlike a fixed nation name), keeping parts
    whose value exceeds ``total // frac_div`` — the global-scalar HAVING.

    Scale plan: partkeys are globally unique in the part scan, so the
    GROUP BY ps_partkey needs NO exchange — a part's 4 derived rows are
    batch-local and collapse with a masked ``reshape(-1, 4).sum(axis=1)``.
    The global total comes from a first streaming pass emitting one
    partial per batch (a scalar aggregate, no materialization); the
    second pass filters by the broadcast threshold.  Two cheap dimension
    scans instead of one cached one — nothing holds the table."""
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    snat = supp.column("s_nationkey").to_numpy()
    nkey = int(np.bincount(snat).argmax())  # modal nation, ties -> min key
    nsk = np.sort(supp.column("s_suppkey").to_numpy()[
        snat == nkey].astype(np.int64))
    S = supplier_count(sf_dir)

    def per_part(batch: pa.Table) -> pa.Table:
        pk = batch.column("p_partkey").to_numpy()
        if pk.size == 0:
            return pa.table({"ps_partkey": pa.array([], pa.int64()),
                             "value_c": pa.array([], pa.int64())})
        pk4, sk4, avail4, cost4 = derive_rows(pk, S)
        member = np.isin(sk4, nsk)
        val = np.where(member, avail4 * cost4, 0)
        per = val.reshape(-1, 4).sum(axis=1)
        any_m = member.reshape(-1, 4).any(axis=1)
        return pa.table({
            "ps_partkey": pa.array(pk[any_m].astype(np.int64), pa.int64()),
            "value_c": pa.array(per[any_m], pa.int64()),
        })

    def read():
        return ray.data.read_parquet(f"{sf_dir}/part.parquet",
                                     columns=["p_partkey"]
                                     ).map_batches(per_part,
                                                   batch_format="pyarrow")

    from ray.data.aggregate import Sum

    total = read().aggregate(Sum("value_c", alias_name="t"))["t"] or 0
    threshold = int(total) // frac_div

    def keep(batch: pa.Table) -> pa.Table:
        m = batch.column("value_c").to_numpy() > threshold
        return batch.filter(pa.array(m))

    return read().map_batches(keep, batch_format="pyarrow")


def q_tpch_q16(sf_dir: str, excl_brand: str = "Brand#13",
               excl_type: str = "ECONOMY",
               sizes: tuple = (1, 4, 7, 10, 13, 16, 19, 22)):
    """TPC-H Q16 (supplier-cnt by part attrs): count DISTINCT suppliers
    per (brand, type, size) over filtered parts, excluding "complaint"
    suppliers (negative acctbal stands in for the spec's comment scan —
    the sf tables carry no s_comment).

    Scale plan: partsupp derives in-batch from the part scan; the
    complaint set broadcasts (bounded); per-batch dedup collapses
    duplicate (brand, type, size, suppkey) rows before ONE exchange
    bucketed on (brand#, size) — a group's rows always co-locate, so the
    body's pandas drop_duplicates + size() is exact.  Groups are bounded
    (brands x types x sizes x <=S rows)."""
    import pyarrow.compute as pc

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_acctbal"])
    bad = np.sort(supp.column("s_suppkey").to_numpy()[
        supp.column("s_acctbal").to_numpy() < 0].astype(np.int64))
    S = supplier_count(sf_dir)
    size_arr = np.array(sorted(sizes), np.int64)
    N_BUCKETS = 32

    def expand(batch: pa.Table) -> pa.Table:
        brand = np.array(batch.column("p_brand").to_pylist())
        ptyp = np.array(batch.column("p_type").to_pylist())
        psz = batch.column("p_size").to_numpy().astype(np.int64)
        keep = (brand != excl_brand) & (ptyp != excl_type) & \
            np.isin(psz, size_arr)
        pk = batch.column("p_partkey").to_numpy()[keep]
        empty = pa.table({
            "p_brand": pa.array([], pa.string()),
            "p_type": pa.array([], pa.string()),
            "p_size": pa.array([], pa.int64()),
            "ps_suppkey": pa.array([], pa.int64()),
            "gbucket": pa.array([], pa.int64()),
        })
        if pk.size == 0:
            return empty
        _, sk4, _, _ = derive_rows(pk, S)
        ok = ~np.isin(sk4, bad)
        if not ok.any():
            return empty
        brand4 = np.repeat(brand[keep], 4)[ok]
        typ4 = np.repeat(ptyp[keep], 4)[ok]
        sz4 = np.repeat(psz[keep], 4)[ok]
        sk = sk4[ok]
        # brand number ("Brand#NN") gives an int surrogate for bucketing;
        # dedup within the batch on the full tuple via the surrogate key
        bnum = np.array([int(b.rsplit("#", 1)[1]) for b in
                         np.unique(brand4)], np.int64)
        bmap = {b: n for b, n in zip(np.unique(brand4), bnum)}
        bn4 = np.array([bmap[b] for b in brand4], np.int64)
        tn4 = np.unique(typ4, return_inverse=True)[1].astype(np.int64)
        surro = ((bn4 * 64 + tn4) * 64 + sz4) * np.int64(S) + sk
        _, first = np.unique(surro, return_index=True)
        return pa.table({
            "p_brand": pa.array(list(brand4[first]), pa.string()),
            "p_type": pa.array(list(typ4[first]), pa.string()),
            "p_size": pa.array(sz4[first], pa.int64()),
            "ps_suppkey": pa.array(sk[first], pa.int64()),
            "gbucket": pa.array((bn4[first] * 64 + sz4[first]) % N_BUCKETS,
                                pa.int64()),
        })

    def count_distinct(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({
                "p_brand": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int64()),
                "supplier_cnt": pa.array([], pa.int64()),
            })
        df = g.to_pandas().drop_duplicates()
        out = (df.groupby(["p_brand", "p_type", "p_size"], sort=False)
               ["ps_suppkey"].nunique().reset_index(name="supplier_cnt"))
        return pa.table({
            "p_brand": pa.array(out["p_brand"], pa.string()),
            "p_type": pa.array(out["p_type"], pa.string()),
            "p_size": pa.array(out["p_size"].to_numpy(np.int64), pa.int64()),
            "supplier_cnt": pa.array(
                out["supplier_cnt"].to_numpy(np.int64), pa.int64()),
        })

    return (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_brand", "p_type", "p_size"],
        ).map_batches(expand, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(lambda g: count_distinct(g.drop_columns(["gbucket"])),
                    batch_format="pyarrow")
    )


def q_tpch_q20(sf_dir: str, name_prefix: str = "red ",
               nation_name: str = "NATION_3"):
    """TPC-H Q20 (excess-stock suppliers): suppliers of one nation holding
    availqty > 50% of the quantity they shipped of name-matched parts in
    1996 — the nested EXISTS-with-aggregate shape.

    Scale plan: part prefix filter broadcasts as a sorted partkey array;
    the lineitem scan keeps only rows passing the closed-form partsupp
    membership + nation + 1996 filters, pre-aggregates (pk, sk) -> qty
    per batch, and ONE :func:`bucketed_sum` exchange merges the partials
    with the HAVING (2*availqty > qty_sum, recomputed closed-form from
    the keys) fused INSIDE the merge; the survivor suppkeys are a tiny
    native groupby."""
    from ray.data.aggregate import Count

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pname = np.array(part.column("p_name").to_pylist())
    bkeys = np.sort(part.column("p_partkey").to_numpy()[
        np.char.startswith(pname, name_prefix)].astype(np.int64))
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nkey = {str(n): int(k) for k, n in zip(
        nat.column("n_nationkey").to_pylist(),
        nat.column("n_name").to_pylist())}[nation_name]
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey", "s_name"])
    ssk = supp.column("s_suppkey").to_numpy().astype(np.int64)
    nat_sk = np.sort(ssk[supp.column("s_nationkey").to_numpy() == nkey])
    sname = {int(k): str(n) for k, n in zip(
        supp.column("s_suppkey").to_pylist(),
        supp.column("s_name").to_pylist())}
    S = supplier_count(sf_dir)

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"ps_partkey": pa.array([], pa.int64()),
                          "ps_suppkey": pa.array([], pa.int64()),
                          "qty_part": pa.array([], pa.int64())})
        ship = batch.column("l_shipdate").cast(pa.int64()).to_numpy()
        pk = batch.column("l_partkey").to_numpy().astype(np.int64)
        sk = batch.column("l_suppkey").to_numpy().astype(np.int64)
        pos = np.searchsorted(bkeys, pk)
        posc = np.minimum(pos, max(bkeys.size - 1, 0))
        hit = (bkeys.size > 0) & (pos < bkeys.size)
        hit = hit & (bkeys[posc] == pk) if bkeys.size else \
            np.zeros(pk.size, bool)
        member, _, _ = member_avail_cost(pk, sk, S)
        keep = (hit & member & np.isin(sk, nat_sk)
                & (ship >= _Y1996_LO_US) & (ship < _Y1996_HI_US))
        if not keep.any():
            return empty
        pk, sk = pk[keep], sk[keep]
        qty = np.round(batch.column("l_quantity").to_numpy()[keep]
                       ).astype(np.int64)
        key = pk * np.int64(S) + sk
        u, inv = np.unique(key, return_inverse=True)
        return pa.table({
            "ps_partkey": pa.array(u // S, pa.int64()),
            "ps_suppkey": pa.array(u % S, pa.int64()),
            "qty_part": pa.array(np.bincount(inv, qty).astype(np.int64),
                                 pa.int64()),
        })

    def excess(kvals: dict, ovals: dict) -> np.ndarray:
        _, avail, _ = member_avail_cost(
            kvals["ps_partkey"], kvals["ps_suppkey"], S)
        return 2 * avail > ovals["qty_sum"]

    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(partial, batch_format="pyarrow")
    survivors = bucketed_sum(lines, ["ps_partkey", "ps_suppkey"],
                             [("qty_part", "qty_sum")], having=excess)

    def name_back(batch: pa.Table) -> pa.Table:
        sk = batch.column("ps_suppkey").to_numpy()
        return pa.table({
            "s_suppkey": batch.column("ps_suppkey"),
            "s_name": pa.array([sname[int(k)] for k in sk], pa.string()),
        })

    return (
        survivors.groupby("ps_suppkey").aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
        .map_batches(name_back, batch_format="pyarrow")
    )

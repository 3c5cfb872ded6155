"""Iterative graph algorithms over edge Datasets.

PageRank here is deliberately INTEGER fixed-point (ranks in 1e-9 units,
floor division everywhere): float PageRank sums in data-dependent order,
so no two engines agree bitwise — the integer formulation makes a fixed
iteration count exactly mirrorable in SQL (unrolled CTEs), the same trick
the quantile/median operators use to stay hash-identical under the gate.

Scale shape (broadcast variant): the rank vector (8 B x V) is ``ray.put``
once per iteration and every batch of edges contributes per-batch partial
(dst, sum) rows into a small ``groupby`` — edges stream, never
materialize.  Driver state is O(V); fine to ~10^8 nodes on a fat
driver node (the webtext case: V = hosts or documents, E = links >> V).

Past ``BROADCAST_MAX_NODES`` the driver-resident vector itself becomes the
bottleneck (10^9-10^10 web-graph nodes = 8-80 GB of int64 ranks), so every
algorithm here also has a ``*_bucketed`` variant where the per-node state
(rank / alive / frontier / distance) lives as a HASH-PARTITIONED sparse
Dataset and meets the cached edge set through the repo's side-tagged
single-exchange join (``pipelines/osm.join_way_nodes`` discipline — never
assume the side table fits, ``reader/osm/OsmReader.java:534-550``).  Each
iteration costs a bounded number of bucket exchanges (2-3) instead of a
broadcast; results stay Datasets end to end.  Both paths are bitwise
identical (integer arithmetic, order-independent reductions), so they
share one SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: Above this node count the broadcast variants refuse (driver vector would
#: exceed ~1 GB); callers dispatch to the ``*_bucketed`` variants instead.
BROADCAST_MAX_NODES = 1 << 27


def _canon_edges(edges_ds, src_col: str, dst_col: str):
    """Dedup to the canonical undirected edge set (a < b, self-loops
    dropped) — ONE (a, b) groupby, shared by every undirected algorithm."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy()
        t = batch.column(dst_col).to_numpy()
        m = s != t
        return pa.table(
            {
                "a": pa.array(np.minimum(s[m], t[m]), pa.int64()),
                "b": pa.array(np.maximum(s[m], t[m]), pa.int64()),
            }
        )

    return (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )


def _node_range(n_nodes: int):
    """Distributed [0, n_nodes) node table (column ``node``) — the bucketed
    variants' replacement for ``np.arange(n_nodes)`` driver vectors.
    Blocks sized ~1M nodes (floor 2x cores) — ``ray.data.range``'s default
    block count is tuned for row-heavy pipelines and fragments a small
    range into hundreds of near-empty exchange inputs."""
    import ray

    from ..pipelines.flagship import shuffle_partitions

    blocks = max(shuffle_partitions() // 2, -(-n_nodes // 1_000_000))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("id").cast(pa.int64())})

    return ray.data.range(
        n_nodes, override_num_blocks=blocks
    ).map_batches(rename, batch_format="pyarrow")


def _tag_kpq(key: np.ndarray, p: np.ndarray, q: np.ndarray,
             side: int, n_buckets: int) -> pa.Table:
    """Narrow overloaded exchange schema (key, p, q, bucket, side) — the
    ``osm.join_way_nodes`` layout: no null-padded columns, int8 side."""
    return pa.table(
        {
            "key": pa.array(key, pa.int64()),
            "p": pa.array(p, pa.int64()),
            "q": pa.array(q, pa.int64()),
            "bucket": pa.array(key % n_buckets, pa.int64()),
            "side": pa.array(np.full(len(key), side, np.int8), pa.int8()),
        }
    )


def _split_sides(g: pa.Table):
    """(state_tbl, other_tbl) halves of one side-tagged exchange group."""
    import pyarrow.compute as pc

    m = pc.equal(g.column("side"), 1)
    return g.filter(m), g.filter(pc.invert(m))


def _state_lookup(state_t: pa.Table, probe: np.ndarray):
    """(values, found_mask) of the sparse state (key=node, p=value) at
    ``probe`` node ids — sort + searchsorted, the bucket-join probe."""
    nid = state_t.column("key").to_numpy()
    if len(nid) == 0:
        z = np.zeros(len(probe), dtype=np.int64)
        return z, np.zeros(len(probe), dtype=bool)
    order = np.argsort(nid, kind="stable")
    nid_s = nid[order]
    val_s = state_t.column("p").to_numpy()[order]
    pos = np.searchsorted(nid_s, probe)
    pos_c = np.minimum(pos, len(nid_s) - 1)
    found = (pos < len(nid_s)) & (nid_s[pos_c] == probe)
    return val_s[pos_c], found


def pagerank_int(edges_ds, n_nodes: int, iters: int = 5,
                 damping_pct: int = 85, scale: int = 10**9,
                 src_col: str = "src", dst_col: str = "dst"):
    """Integer PageRank over dense node ids [0, n_nodes).

    r0 = scale // n;  each iteration:
      contrib(s->d) = r[s] // outdeg[s]
      r'[d] = (scale // n * (100 - damping_pct)) // 100
              + (damping_pct * sum(contrib into d)) // 100
    Dangling mass is dropped (standard simplification — mirrored in SQL).
    Returns a pandas DataFrame (node_id, rank) — V rows, driver-sized by
    design; wrap in ``ray.data.from_pandas`` if a Dataset is needed.
    """
    import ray
    from ray.data.aggregate import Sum

    base = (scale // n_nodes * (100 - damping_pct)) // 100

    deg_df = edges_ds.groupby(src_col).count().to_pandas()
    deg = np.zeros(n_nodes, dtype=np.int64)
    deg[deg_df[src_col].to_numpy()] = deg_df["count()"].to_numpy()

    ranks = np.full(n_nodes, scale // n_nodes, dtype=np.int64)
    for _ in range(iters):
        handle = ray.put((ranks, deg))

        def partial(batch: pa.Table) -> pa.Table:
            r, d = ray.get(handle)
            s = batch.column(src_col).to_numpy()
            t = batch.column(dst_col).to_numpy()
            c = r[s] // np.maximum(d[s], 1)
            agg = pd.DataFrame({"dst": t, "c": c}).groupby("dst", as_index=False)["c"].sum()
            return pa.table(
                {
                    "dst": pa.array(agg["dst"].to_numpy(), pa.int64()),
                    "c_part": pa.array(agg["c"].to_numpy(), pa.int64()),
                }
            )

        sums = (
            edges_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c_part", alias_name="c"))
            .to_pandas()
        )
        new = np.full(n_nodes, base, dtype=np.int64)
        if len(sums):
            idx = sums["dst"].to_numpy()
            new[idx] = base + damping_pct * sums["c"].to_numpy() // 100
        ranks = new
    return pd.DataFrame({"node_id": np.arange(n_nodes, dtype=np.int64),
                         "rank": ranks})


def triangle_count(edges_ds, n_nodes: int, n_buckets: int = 64,
                   src_col: str = "src", dst_col: str = "dst") -> pd.DataFrame:
    """Exact triangle count via the degree-ordered node-iterator (the
    standard scalable formulation: orient every undirected edge from the
    lower-(degree, id) endpoint, emit wedges only at each triangle's
    unique apex, then close wedges against the edge set).

    Scale shape: degree ordering bounds per-node out-degree at O(sqrt(E)),
    so total wedges are O(E^1.5) worst-case and near-linear on power-law
    web graphs; the degree vector is O(V) driver state broadcast once
    (same contract as :func:`pagerank_int`); wedge emission is a
    vectorized self-merge inside src-hash buckets; closure is Ray Data's
    native hash join — wedges stream through it, never materializing on
    the driver.  Count is enumeration-order independent, so the DuckDB
    twin can enumerate at the min-ID apex instead and still agree."""
    import ray
    from ray.data.aggregate import Count

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy()
        d = batch.column(dst_col).to_numpy()
        keep = s != d
        return pa.table(
            {
                "a": pa.array(np.minimum(s[keep], d[keep]), pa.int64()),
                "b": pa.array(np.maximum(s[keep], d[keep]), pa.int64()),
            }
        )

    e = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["a", "b"])
    )
    n_edges = e.count()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [batch.column("a").to_numpy(), batch.column("b").to_numpy()]
        )
        cnt = np.bincount(nodes, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {"node": pa.array(nz, pa.int64()),
             "d_part": pa.array(cnt[nz], pa.int64())}
        )

    from ray.data.aggregate import Sum

    deg_df = (
        e.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d_part", alias_name="deg"))
        .to_pandas()  # O(V) driver state, pagerank_int contract
    )
    deg = np.zeros(n_nodes, dtype=np.int64)
    deg[deg_df["node"].to_numpy()] = deg_df["deg"].to_numpy()
    # rank[node] = position in (degree, id) order; each triangle's unique
    # apex is its min-rank vertex
    rank = np.empty(n_nodes, dtype=np.int64)
    rank[np.lexsort((np.arange(n_nodes), deg))] = np.arange(n_nodes)
    rank_ref = ray.put(rank)

    def orient(batch: pa.Table) -> pa.Table:
        r = ray.get(rank_ref) if isinstance(rank_ref, ray.ObjectRef) else rank_ref
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        a_low = r[a] < r[b]
        src = np.where(a_low, a, b)
        dst = np.where(a_low, b, a)
        return pa.table(
            {
                "wsrc": pa.array(src, pa.int64()),
                "wdst": pa.array(dst, pa.int64()),
                "wbucket": pa.array(src % n_buckets, pa.int64()),
            }
        )

    def wedges(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["wbucket"]).to_pandas()
        m = df.merge(df, on="wsrc")  # vectorized per-apex neighbor pairing
        m = m[m["wdst_x"] < m["wdst_y"]]
        n = len(m)
        return pa.table(
            {
                "a": pa.array(m["wdst_x"].to_numpy(), pa.int64()),
                "b": pa.array(m["wdst_y"].to_numpy(), pa.int64()),
                "w": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
                "is_e": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            }
        )

    w = (
        e.map_batches(orient, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag_edge(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "w": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "is_e": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
            }
        )

    # closure via union + ONE (a, b) groupby (not a binary hash join: the
    # same exchange cost, and it degrades gracefully when many hash
    # partitions are empty) — a wedge is a triangle iff its (a, b) group
    # also contains the edge row; distinct apexes can close on the same
    # pair, hence Sum(w) not a flag
    from ray.data.aggregate import Max

    closed = (
        w.union(e.map_batches(tag_edge, batch_format="pyarrow"))
        .groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="nw"), Max("is_e", alias_name="ne"))
    )

    def tri_partial(batch: pa.Table) -> pa.Table:
        nw = batch.column("nw").to_numpy()
        ne = batch.column("ne").to_numpy()
        return pa.table(
            {"tri_part": pa.array([int((nw * (ne > 0)).sum())], pa.int64())}
        )

    n_tri = int(
        closed.map_batches(tri_partial, batch_format="pyarrow").sum("tri_part")
        or 0
    )
    return pd.DataFrame(
        {"n_triangles": np.array([n_tri], dtype=np.int64),
         "n_edges": np.array([n_edges], dtype=np.int64)}
    )


def kcore_peel(edges_ds, n_nodes: int, k: int = 3, rounds: int = 3,
               src_col: str = "src", dst_col: str = "dst"):
    """Bounded-round k-core peeling over the deduped undirected graph.

    Round r: ``deg_r(v)`` = number of distinct undirected edges with BOTH
    endpoints alive; ``alive_r = alive_{r-1} AND deg_r >= k``.  Fixed round
    count keeps the semantics exactly unrollable in SQL (same trick as
    ``pagerank_int``); full convergence is the same loop run until the
    alive bitmap stops changing.

    Scale shape: the canonical edge set is deduped with ONE (a, b) groupby
    and cached (loop-invariant — re-deriving it every round would repeat
    the shuffle); each round broadcasts the alive bitmap (``ray.put``,
    1 bit/node) and computes degrees as per-batch partials -> a small
    groupby-sum, exactly the ``pagerank_int`` iteration pattern.  Returns
    a pandas (node_id, deg, in_core) — V-sized driver result by design.
    """
    import ray
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy()
        t = batch.column(dst_col).to_numpy()
        m = s != t
        return pa.table(
            {
                "a": pa.array(np.minimum(s[m], t[m]), pa.int64()),
                "b": pa.array(np.maximum(s[m], t[m]), pa.int64()),
            }
        )

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()  # loop-invariant, reused every round (spillable)
    )

    alive = np.ones(n_nodes, dtype=bool)
    deg = np.zeros(n_nodes, dtype=np.int64)
    for _ in range(rounds):
        handle = ray.put(alive)

        def partial(batch: pa.Table, handle=handle) -> pa.Table:
            al = ray.get(handle)
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            m = al[a] & al[b]
            ids = np.concatenate([a[m], b[m]])
            u, c = np.unique(ids, return_counts=True)
            return pa.table(
                {
                    "node": pa.array(u, pa.int64()),
                    "d_part": pa.array(c, pa.int64()),
                }
            )

        dd = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("d_part", alias_name="deg"))
            .to_pandas()
        )
        deg = np.zeros(n_nodes, dtype=np.int64)
        if len(dd):
            deg[dd["node"].to_numpy()] = dd["deg"].to_numpy()
        alive &= deg >= k

    return pd.DataFrame(
        {
            "node_id": np.arange(n_nodes, dtype=np.int64),
            "deg": deg,
            "in_core": alive.astype(np.int64),
        }
    )


def bfs_hops(edges_ds, n_nodes: int, seed_mod: int = 101, hops: int = 3,
             src_col: str = "src", dst_col: str = "dst"):
    """Bounded-hop BFS reachability from a seed set over the deduped
    undirected graph — the frontier-expansion primitive (k-hop ego nets,
    contamination spread, link-graph crawl depth).

    Same iteration shape as :func:`kcore_peel`: the loop-invariant edge
    set is deduped once and cached; each hop broadcasts the reached bitmap
    (``ray.put``) and discovers the new frontier with per-batch partial
    distincts -> one small groupby.  Fixed hop count keeps the SQL twin
    fully unrollable.  Returns pandas (node_id, hop) for reached nodes,
    hop = BFS distance (0 = seed), min over ties by construction.
    """
    import ray

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy()
        t = batch.column(dst_col).to_numpy()
        m = s != t
        return pa.table(
            {
                "a": pa.array(np.minimum(s[m], t[m]), pa.int64()),
                "b": pa.array(np.maximum(s[m], t[m]), pa.int64()),
            }
        )

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()  # loop-invariant, reused every hop (spillable)
    )

    hop = np.full(n_nodes, -1, dtype=np.int64)
    hop[np.arange(n_nodes) % seed_mod == 0] = 0
    for h in range(1, hops + 1):
        handle = ray.put(hop >= 0)

        def frontier(batch: pa.Table, handle=handle) -> pa.Table:
            r = ray.get(handle)
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            new = np.concatenate([b[r[a] & ~r[b]], a[r[b] & ~r[a]]])
            return pa.table({"node": pa.array(np.unique(new), pa.int64())})

        nf = (
            edges.map_batches(frontier, batch_format="pyarrow")
            .groupby("node")
            .count()
            .to_pandas()
        )
        if not len(nf):
            break
        hop[nf["node"].to_numpy()] = h

    reached = np.flatnonzero(hop >= 0)
    return pd.DataFrame({"node_id": reached, "hop": hop[reached]})


def sssp_rounds(edges_ds, n_nodes: int, seed_mod: int = 101, rounds: int = 3,
                w_lo: int = 1, w_span: int = 9,
                src_col: str = "src", dst_col: str = "dst"):
    """Bounded-round single-source-set shortest paths (Bellman-Ford with
    simultaneous relaxation) — the WEIGHTED companion of :func:`bfs_hops`
    (link-graph crawl cost, weighted contamination spread, road-network
    reach with per-edge costs).

    Edge weights are derived deterministically from the canonical endpoint
    pair (``w = w_lo + (a*3 + b*7) % w_span``) AFTER dedup so both engine
    and SQL twin see identical weights.  Each round relaxes every edge
    against the PREVIOUS round's distance vector (Jacobi, not Gauss-Seidel
    — that is what makes a fixed round count exactly unrollable in SQL).

    Scale shape: identical to :func:`bfs_hops` — the loop-invariant edge
    set is deduped once and cached; each round broadcasts the O(V) distance
    vector (``ray.put``) and collects per-batch (node, min-candidate)
    partials into one small groupby-min.  Returns pandas
    (node_id, dist) for nodes reached within ``rounds`` relaxations.
    """
    import ray
    from ray.data.aggregate import Min

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy()
        t = batch.column(dst_col).to_numpy()
        m = s != t
        return pa.table(
            {
                "a": pa.array(np.minimum(s[m], t[m]), pa.int64()),
                "b": pa.array(np.maximum(s[m], t[m]), pa.int64()),
            }
        )

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()  # loop-invariant, reused every round (spillable)
    )

    INF = np.int64(2**62)
    dist = np.full(n_nodes, INF, dtype=np.int64)
    dist[np.arange(n_nodes) % seed_mod == 0] = 0
    for _ in range(rounds):
        handle = ray.put(dist)

        def relax(batch: pa.Table, handle=handle) -> pa.Table:
            d = ray.get(handle)
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            w = w_lo + (a * 3 + b * 7) % w_span
            # candidates in both directions where the source end is reached
            ma = d[a] < INF
            mb = d[b] < INF
            node = np.concatenate([b[ma], a[mb]])
            cand = np.concatenate([d[a][ma] + w[ma], d[b][mb] + w[mb]])
            if not len(node):
                return pa.table({"node": pa.array([], pa.int64()),
                                 "d_cand": pa.array([], pa.int64())})
            # per-batch partial min before the exchange
            order = np.lexsort((cand, node))
            node, cand = node[order], cand[order]
            first = np.ones(len(node), dtype=bool)
            first[1:] = node[1:] != node[:-1]
            return pa.table({"node": pa.array(node[first], pa.int64()),
                             "d_cand": pa.array(cand[first], pa.int64())})

        mins = (
            edges.map_batches(relax, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Min("d_cand", alias_name="d"))
            .to_pandas()
        )
        if len(mins):
            idx = mins["node"].to_numpy()
            dist[idx] = np.minimum(dist[idx], mins["d"].to_numpy())

    reached = np.flatnonzero(dist < INF)
    return pd.DataFrame({"node_id": reached, "dist": dist[reached]})


# ---------------------------------------------------------------------------
# Bucketed (no-driver-state) variants — the 100 TB path.  Per-node state is
# a hash-partitioned SPARSE Dataset; each iteration is a bounded number of
# side-tagged bucket exchanges against the cached edge set.  Bitwise
# identical to the broadcast variants (shared SQL oracles).
# ---------------------------------------------------------------------------


def _buckets(n_buckets: int | None) -> int:
    if n_buckets is not None:
        return n_buckets
    from ..pipelines.flagship import shuffle_partitions

    return shuffle_partitions()



def _compact(ds, nb: int):
    """Coalesce an iteration-state Dataset to ``nb`` blocks before
    materializing: the sort-based groupby emits one (often near-empty)
    block per INPUT block, so un-compacted loop state grows by the edge
    block count every iteration and exchange overhead compounds
    (measured: 5-iteration pagerank 69 s -> 11 s at sf0.1)."""
    return ds.repartition(nb).materialize()


def pagerank_bucketed(edges_ds, n_nodes: int, iters: int = 5,
                      damping_pct: int = 85, scale: int = 10**9,
                      src_col: str = "src", dst_col: str = "dst",
                      n_buckets: int | None = None):
    """:func:`pagerank_int` with the rank vector as a hash-partitioned
    sparse Dataset instead of a driver numpy array.

    Setup: out-degree is ONE bucket exchange of per-batch count partials,
    then attached to every edge through ONE side-tagged join (loop
    invariant, cached).  Each iteration: exchange 1 joins the sparse rank
    state to edges on ``src`` (absent node => the iteration's default
    rank — uniform at i=0, teleport ``base`` after) and pre-aggregates
    (dst, contrib) partials IN the group body; exchange 2 is a
    ``bucketed_sum`` over dst.  Nothing driver-resident is ever O(V);
    the returned Dataset is (node_id, rank) for all V nodes.
    """
    import ray
    from .bucketagg import bucketed_sum, count_min_partial

    nb = _buckets(n_buckets)
    base = (scale // n_nodes * (100 - damping_pct)) // 100

    deg_ds = bucketed_sum(
        edges_ds.map_batches(count_min_partial([src_col], "d_part"),
                             batch_format="pyarrow"),
        keys=[src_col], sums=[("d_part", "deg")], n_buckets=nb)

    def tag_edge(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column(src_col).to_numpy(),
                        batch.column(dst_col).to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 0, nb)

    def tag_deg(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column(src_col).to_numpy(),
                        batch.column("deg").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    def attach_deg(g: pa.Table) -> pa.Table:
        state_t, edge_t = _split_sides(g)
        src = edge_t.column("key").to_numpy()
        deg, _ = _state_lookup(state_t, src)  # every src has an out-degree
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": edge_t.column("p"),
                "deg": pa.array(deg, pa.int64()),
            }
        )

    edges_deg = (
        edges_ds.map_batches(tag_edge, batch_format="pyarrow")
        .union(deg_ds.map_batches(tag_deg, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(attach_deg, batch_format="pyarrow")
        .repartition(nb)
        .materialize()  # loop-invariant, reused every iteration (spillable)
    )

    def tag_edge_deg(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("src").to_numpy(),
                        batch.column("dst").to_numpy(),
                        batch.column("deg").to_numpy(), 0, nb)

    def tag_rank(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        batch.column("rank").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    state = None  # sparse (node, rank); None => uniform default everywhere
    default = scale // n_nodes
    for _ in range(iters):
        tagged = edges_deg.map_batches(tag_edge_deg, batch_format="pyarrow")
        if state is not None:
            tagged = tagged.union(
                state.map_batches(tag_rank, batch_format="pyarrow"))

        def contrib(g: pa.Table, default=default) -> pa.Table:
            state_t, edge_t = _split_sides(g)
            src = edge_t.column("key").to_numpy()
            dst = edge_t.column("p").to_numpy()
            deg = edge_t.column("q").to_numpy()
            r, found = _state_lookup(state_t, src)
            r = np.where(found, r, default)
            c = r // np.maximum(deg, 1)
            if len(dst) == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "c_part": pa.array([], pa.int64())})
            order = np.argsort(dst, kind="stable")
            ds_, cs = dst[order], c[order]
            new = np.ones(len(ds_), dtype=bool)
            new[1:] = ds_[1:] != ds_[:-1]
            starts = np.flatnonzero(new)
            return pa.table(
                {
                    "dst": pa.array(ds_[starts], pa.int64()),
                    "c_part": pa.array(np.add.reduceat(cs, starts), pa.int64()),
                }
            )

        sums = bucketed_sum(
            tagged.groupby("bucket").map_groups(contrib, batch_format="pyarrow"),
            keys=["dst"], sums=[("c_part", "c")], n_buckets=nb)

        def to_rank(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy()
            return pa.table(
                {
                    "node": batch.column("dst"),
                    "rank": pa.array(base + damping_pct * c // 100, pa.int64()),
                }
            )

        state = _compact(sums.map_batches(to_rank, batch_format="pyarrow"), nb)
        default = base

    # densify: every node gets its sparse rank or the final default
    def tag_node(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        np.zeros(batch.num_rows, np.int64),
                        np.zeros(batch.num_rows, np.int64), 0, nb)

    def densify(g: pa.Table, default=default) -> pa.Table:
        state_t, node_t = _split_sides(g)
        nodes = node_t.column("key").to_numpy()
        r, found = _state_lookup(state_t, nodes)
        return pa.table(
            {
                "node_id": pa.array(nodes, pa.int64()),
                "rank": pa.array(np.where(found, r, default), pa.int64()),
            }
        )

    return (
        _node_range(n_nodes).map_batches(tag_node, batch_format="pyarrow")
        .union(state.map_batches(tag_rank, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(densify, batch_format="pyarrow")
    )


def triangles_bucketed(edges_ds, n_nodes: int, n_buckets: int | None = None,
                       src_col: str = "src", dst_col: str = "dst"):
    """:func:`triangle_count` without the V-sized driver degree/rank
    vectors: orientation compares endpoint DEGREES directly ((deg, id)
    lexicographic — the same total order the broadcast variant's rank
    array encodes), so the degree table stays a Dataset and is attached
    to each edge through two side-tagged exchanges (key=a, then key=b).
    Wedge emission and closure are unchanged.  Count-identical to the
    broadcast variant (the enumeration order differs, the triangle set
    does not).  Returns a 1-row Dataset (n_triangles, n_edges).
    """
    import ray
    from ray.data.aggregate import Max, Sum

    from .bucketagg import bucketed_sum

    nb = _buckets(n_buckets)
    e = _canon_edges(edges_ds, src_col, dst_col).materialize()
    n_edges = e.count()

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [batch.column("a").to_numpy(), batch.column("b").to_numpy()])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "d_part": pa.array(c, pa.int64())})

    deg_ds = bucketed_sum(
        e.map_batches(deg_partial, batch_format="pyarrow"),
        keys=["node"], sums=[("d_part", "deg")], n_buckets=nb)

    def tag_deg(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        batch.column("deg").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    def tag_edge(key_col, other_col, carry_col=None):
        def tag(batch: pa.Table) -> pa.Table:
            carry = (batch.column(carry_col).to_numpy() if carry_col
                     else np.zeros(batch.num_rows, np.int64))
            return _tag_kpq(batch.column(key_col).to_numpy(),
                            batch.column(other_col).to_numpy(), carry, 0, nb)
        return tag

    def attach(out_key, out_other, out_deg, carry_out=None):
        def body(g: pa.Table) -> pa.Table:
            state_t, edge_t = _split_sides(g)
            keys = edge_t.column("key").to_numpy()
            d, _ = _state_lookup(state_t, keys)
            cols = {
                out_key: pa.array(keys, pa.int64()),
                out_other: edge_t.column("p"),
                out_deg: pa.array(d, pa.int64()),
            }
            if carry_out:
                cols[carry_out] = edge_t.column("q")
            return pa.table(cols)
        return body

    dt = deg_ds.map_batches(tag_deg, batch_format="pyarrow")
    # attach deg(a), then deg(b) (carried through the second exchange)
    e_da = (
        e.map_batches(tag_edge("a", "b"), batch_format="pyarrow")
        .union(dt)
        .groupby("bucket")
        .map_groups(attach("a", "b", "da"), batch_format="pyarrow")
    )

    def tag_eb(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("b").to_numpy(),
                        batch.column("a").to_numpy(),
                        batch.column("da").to_numpy(), 0, nb)

    e_dd = (
        e_da.map_batches(tag_eb, batch_format="pyarrow")
        .union(dt)
        .groupby("bucket")
        .map_groups(attach("b", "a", "db", carry_out="da"),
                    batch_format="pyarrow")
    )

    def orient(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        da = batch.column("da").to_numpy()
        db = batch.column("db").to_numpy()
        a_low = (da < db) | ((da == db) & (a < b))
        src = np.where(a_low, a, b)
        dst = np.where(a_low, b, a)
        return pa.table(
            {
                "wsrc": pa.array(src, pa.int64()),
                "wdst": pa.array(dst, pa.int64()),
                "wbucket": pa.array(src % nb, pa.int64()),
            }
        )

    def wedges(g: pa.Table) -> pa.Table:
        df = g.drop_columns(["wbucket"]).to_pandas()
        m = df.merge(df, on="wsrc")
        m = m[m["wdst_x"] < m["wdst_y"]]
        n = len(m)
        return pa.table(
            {
                "a": pa.array(m["wdst_x"].to_numpy(), pa.int64()),
                "b": pa.array(m["wdst_y"].to_numpy(), pa.int64()),
                "w": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
                "is_e": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
            }
        )

    w = (
        e_dd.map_batches(orient, batch_format="pyarrow")
        .groupby("wbucket")
        .map_groups(wedges, batch_format="pyarrow")
    )

    def tag_edge_row(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "w": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "is_e": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
            }
        )

    closed = (
        w.union(e.map_batches(tag_edge_row, batch_format="pyarrow"))
        .groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="nw"), Max("is_e", alias_name="ne"))
    )

    def tri_partial(batch: pa.Table) -> pa.Table:
        nw = batch.column("nw").to_numpy()
        ne = batch.column("ne").to_numpy()
        return pa.table(
            {"tri_part": pa.array([int((nw * (ne > 0)).sum())], pa.int64())})

    n_tri = int(
        closed.map_batches(tri_partial, batch_format="pyarrow").sum("tri_part")
        or 0)
    return ray.data.from_items(
        [{"n_triangles": n_tri, "n_edges": n_edges}])


def kcore_bucketed(edges_ds, n_nodes: int, k: int = 3, rounds: int = 3,
                   src_col: str = "src", dst_col: str = "dst",
                   n_buckets: int | None = None):
    """:func:`kcore_peel` with the alive set as a sparse Dataset.

    Round r: two semi-join exchanges drop edges with a dead endpoint
    (key=a then key=b against the alive node set — round 1 skips both,
    everything is alive), one ``bucketed_sum`` of per-batch endpoint-count
    partials gives ``deg_r``; ``alive_r = {v: deg_r(v) >= k}`` stays a
    Dataset.  A node dead in an earlier round has no surviving edges, so
    its degree is 0 — exactly the broadcast semantics.  Returns a Dataset
    (node_id, deg, in_core) over all V nodes.
    """
    from .bucketagg import bucketed_sum

    nb = _buckets(n_buckets)
    edges = _canon_edges(edges_ds, src_col, dst_col).materialize()

    def tag_ab(key_col, other_col):
        def tag(batch: pa.Table) -> pa.Table:
            return _tag_kpq(batch.column(key_col).to_numpy(),
                            batch.column(other_col).to_numpy(),
                            np.zeros(batch.num_rows, np.int64), 0, nb)
        return tag

    def tag_alive(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        np.zeros(batch.num_rows, np.int64),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    def keep_alive(key_out, other_out):
        def body(g: pa.Table) -> pa.Table:
            state_t, edge_t = _split_sides(g)
            keys = edge_t.column("key").to_numpy()
            _, found = _state_lookup(state_t, keys)
            return pa.table(
                {
                    key_out: pa.array(keys[found], pa.int64()),
                    other_out: pa.array(
                        edge_t.column("p").to_numpy()[found], pa.int64()),
                }
            )
        return body

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [batch.column("a").to_numpy(), batch.column("b").to_numpy()])
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": pa.array(u, pa.int64()),
                         "d_part": pa.array(c, pa.int64())})

    alive = None  # None => all alive (round 1)
    deg_ds = None
    for _ in range(rounds):
        if alive is None:
            surv = edges
        else:
            at = alive.map_batches(tag_alive, batch_format="pyarrow")
            surv = (
                edges.map_batches(tag_ab("a", "b"), batch_format="pyarrow")
                .union(at)
                .groupby("bucket")
                .map_groups(keep_alive("a", "b"), batch_format="pyarrow")
                .map_batches(tag_ab("b", "a"), batch_format="pyarrow")
                .union(at)
                .groupby("bucket")
                .map_groups(keep_alive("b", "a"), batch_format="pyarrow")
            )
        deg_ds = _compact(bucketed_sum(
            surv.map_batches(deg_partial, batch_format="pyarrow"),
            keys=["node"], sums=[("d_part", "deg")], n_buckets=nb), nb)

        def survivors(batch: pa.Table) -> pa.Table:
            m = batch.column("deg").to_numpy() >= k
            return pa.table(
                {"node": pa.array(batch.column("node").to_numpy()[m],
                                  pa.int64())})

        alive = deg_ds.map_batches(survivors, batch_format="pyarrow")

    def tag_deg(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        batch.column("deg").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    def tag_node(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        np.zeros(batch.num_rows, np.int64),
                        np.zeros(batch.num_rows, np.int64), 0, nb)

    def densify(g: pa.Table) -> pa.Table:
        state_t, node_t = _split_sides(g)
        nodes = node_t.column("key").to_numpy()
        d, found = _state_lookup(state_t, nodes)
        d = np.where(found, d, 0)
        return pa.table(
            {
                "node_id": pa.array(nodes, pa.int64()),
                "deg": pa.array(d, pa.int64()),
                "in_core": pa.array((d >= k).astype(np.int64), pa.int64()),
            }
        )

    return (
        _node_range(n_nodes).map_batches(tag_node, batch_format="pyarrow")
        .union(deg_ds.map_batches(tag_deg, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(densify, batch_format="pyarrow")
    )


def bfs_bucketed(edges_ds, n_nodes: int, seed_mod: int = 101, hops: int = 3,
                 src_col: str = "src", dst_col: str = "dst",
                 n_buckets: int | None = None):
    """:func:`bfs_hops` with the frontier and reached sets as Datasets.

    Hop h: exchange 1 joins the frontier to the cached bidirectional
    adjacency on the from-node and emits candidate neighbours (deduped in
    the group body); exchange 2 anti-joins candidates against the reached
    set — survivors are the new frontier at hop h, unioned into reached.
    Early-exits when a frontier is empty.  Returns (node_id, hop).
    """
    nb = _buckets(n_buckets)
    edges = _canon_edges(edges_ds, src_col, dst_col)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        return pa.table(
            {
                "frm": pa.array(np.concatenate([a, b]), pa.int64()),
                "to": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def seed(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy()
        s = nodes[nodes % seed_mod == 0]
        return pa.table({"node": pa.array(s, pa.int64()),
                         "hop": pa.array(np.zeros(len(s), np.int64),
                                         pa.int64())})

    reached = (
        _node_range(n_nodes).map_batches(seed, batch_format="pyarrow")
        .materialize()
    )
    frontier = reached

    def tag_adj(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("frm").to_numpy(),
                        batch.column("to").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 0, nb)

    def tag_nodes_side(side):
        def tag(batch: pa.Table) -> pa.Table:
            return _tag_kpq(batch.column("node").to_numpy(),
                            np.zeros(batch.num_rows, np.int64),
                            np.zeros(batch.num_rows, np.int64), side, nb)
        return tag

    def neighbours(g: pa.Table) -> pa.Table:
        state_t, edge_t = _split_sides(g)
        frm = edge_t.column("key").to_numpy()
        _, found = _state_lookup(state_t, frm)
        to = edge_t.column("p").to_numpy()[found]
        return pa.table({"node": pa.array(np.unique(to), pa.int64())})

    for h in range(1, hops + 1):
        cand = (
            adj.map_batches(tag_adj, batch_format="pyarrow")
            .union(frontier.map_batches(tag_nodes_side(1),
                                        batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(neighbours, batch_format="pyarrow")
        )

        def anti(g: pa.Table, h=h) -> pa.Table:
            state_t, cand_t = _split_sides(g)
            u = np.unique(cand_t.column("key").to_numpy())
            _, found = _state_lookup(state_t, u)
            nn = u[~found]
            return pa.table({"node": pa.array(nn, pa.int64()),
                             "hop": pa.array(np.full(len(nn), h, np.int64),
                                             pa.int64())})

        frontier = (
            cand.map_batches(tag_nodes_side(0), batch_format="pyarrow")
            .union(reached.map_batches(tag_nodes_side(1),
                                       batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(anti, batch_format="pyarrow")
            .repartition(nb)
            .materialize()
        )
        if frontier.count() == 0:
            break
        reached = _compact(reached.union(frontier), nb)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node_id": batch.column("node"),
                         "hop": batch.column("hop")})

    return reached.map_batches(rename, batch_format="pyarrow")


def sssp_bucketed(edges_ds, n_nodes: int, seed_mod: int = 101,
                  rounds: int = 3, w_lo: int = 1, w_span: int = 9,
                  src_col: str = "src", dst_col: str = "dst",
                  n_buckets: int | None = None):
    """:func:`sssp_rounds` with the distance vector as a sparse Dataset
    (absent = unreached/INF).

    Round r: exchange 1 joins the sparse distances to the cached weighted
    bidirectional adjacency on the from-node and emits per-group partial
    min (to, dist + w) candidates; exchange 2 is a bucketed MIN over the
    union of candidates and the previous distances (Jacobi — candidates
    are relaxed against round r-1 only, same as the broadcast variant and
    the unrolled SQL twin).  Returns (node_id, dist) for reached nodes.
    """
    from .bucketagg import bucketed_sum

    nb = _buckets(n_buckets)
    edges = _canon_edges(edges_ds, src_col, dst_col)

    def both_dirs_w(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        w = w_lo + (a * 3 + b * 7) % w_span
        return pa.table(
            {
                "frm": pa.array(np.concatenate([a, b]), pa.int64()),
                "to": pa.array(np.concatenate([b, a]), pa.int64()),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }
        )

    adj = edges.map_batches(both_dirs_w, batch_format="pyarrow").materialize()

    def seed(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy()
        s = nodes[nodes % seed_mod == 0]
        return pa.table({"node": pa.array(s, pa.int64()),
                         "dist": pa.array(np.zeros(len(s), np.int64),
                                          pa.int64())})

    dist = (
        _node_range(n_nodes).map_batches(seed, batch_format="pyarrow")
        .materialize()
    )

    def tag_adj(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("frm").to_numpy(),
                        batch.column("to").to_numpy(),
                        batch.column("w").to_numpy(), 0, nb)

    def tag_dist(batch: pa.Table) -> pa.Table:
        return _tag_kpq(batch.column("node").to_numpy(),
                        batch.column("dist").to_numpy(),
                        np.zeros(batch.num_rows, np.int64), 1, nb)

    def relax(g: pa.Table) -> pa.Table:
        state_t, edge_t = _split_sides(g)
        frm = edge_t.column("key").to_numpy()
        d, found = _state_lookup(state_t, frm)
        to = edge_t.column("p").to_numpy()[found]
        cand = d[found] + edge_t.column("q").to_numpy()[found]
        if len(to) == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "d_part": pa.array([], pa.int64())})
        order = np.lexsort((cand, to))
        to, cand = to[order], cand[order]
        first = np.ones(len(to), dtype=bool)
        first[1:] = to[1:] != to[:-1]
        return pa.table({"node": pa.array(to[first], pa.int64()),
                         "d_part": pa.array(cand[first], pa.int64())})

    def as_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "d_part": batch.column("dist")})

    for _ in range(rounds):
        cands = (
            adj.map_batches(tag_adj, batch_format="pyarrow")
            .union(dist.map_batches(tag_dist, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(relax, batch_format="pyarrow")
        )
        merged = bucketed_sum(
            cands.union(dist.map_batches(as_partial, batch_format="pyarrow")),
            keys=["node"], sums=[], mins=[("d_part", "dist")], n_buckets=nb)
        dist = _compact(merged, nb)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"node_id": batch.column("node"),
                         "dist": batch.column("dist")})

    return dist.map_batches(rename, batch_format="pyarrow")

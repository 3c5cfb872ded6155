"""Iterative graph algorithms over edge Datasets.

PageRank here is deliberately INTEGER fixed-point (ranks in 1e-9 units,
floor division everywhere): float PageRank sums in data-dependent order,
so no two engines agree bitwise — the integer formulation makes a fixed
iteration count exactly mirrorable in SQL (unrolled CTEs), the same trick
the quantile/median operators use to stay hash-identical under the gate.

Scale shape (broadcast variant): the rank vector (8 B x V) is ``ray.put``
once per iteration and every batch of edges contributes per-batch partial
(dst, sum) rows into a small ``groupby`` — edges stream, never
materialize.  Driver state is O(V); fine to ~10^8-10^9 nodes on a fat
driver node (the webtext case: V = hosts or documents, E = links >> V).
Past that, swap the broadcast for the repo's hash-bucket join pattern
(``pipelines/osm.py``) — two shuffles per iteration, documented fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


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

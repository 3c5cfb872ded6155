"""Stream-shaped operators over the ``events`` table (event_id, ts, user_id,
event_type, value, props): tumbling windows, sessionization, as-of join.

Ray Data has no event-time windowing, so (per the public guidance) windows
are expressed as ``groupby(key).map_groups`` over ts-sorted groups — the
ordering assumption is per-user, enforced by sorting inside the group.  All
outputs are integer/exact so the DuckDB oracle can mirror them with window
functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min
WINDOW_US = 3600 * 1_000_000  # 1 hour


def tumbling_window(ds, n_buckets: int = 64):
    """Per (user_id, 1h window): n events + sum(value) in integer cents.

    Scale pattern: per-batch partial aggregation (numpy lexsort+reduceat),
    then ONE user-hash bucket shuffle with a fused reduceat merge body —
    the built-in two-key Sum Aggregate at ~#(user,hour) cardinality
    measured ~2x slower than the bucket pattern (same finding as
    ``osm.overlay_area`` / ``training.q_tpch_q18``)."""

    _empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "window_id": pa.array([], pa.int64()),
        "n_part": pa.array([], pa.int64()),
        "cents_part": pa.array([], pa.int64()),
        "ubucket": pa.array([], pa.int64()),
    })

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty
        uid = batch.column("user_id").to_numpy()
        win = batch.column("ts").cast(pa.int64()).to_numpy() // WINDOW_US
        cents = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        order = np.lexsort((win, uid))
        uid_s, win_s, cents_s = uid[order], win[order], cents[order]
        new = np.concatenate(
            [[True], (uid_s[1:] != uid_s[:-1]) | (win_s[1:] != win_s[:-1])])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(uid_s))
        return pa.table({
            "user_id": pa.array(uid_s[starts], pa.int64()),
            "window_id": pa.array(win_s[starts], pa.int64()),
            "n_part": pa.array(ends - starts, pa.int64()),
            "cents_part": pa.array(np.add.reduceat(cents_s, starts), pa.int64()),
            "ubucket": pa.array(uid_s[starts] % n_buckets, pa.int64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty.drop_columns(["n_part", "cents_part", "ubucket"]) \
                .append_column("n_events", pa.array([], pa.int64())) \
                .append_column("sum_cents", pa.array([], pa.int64()))
        uid = g.column("user_id").to_numpy()
        win = g.column("window_id").to_numpy()
        np_ = g.column("n_part").to_numpy()
        cp = g.column("cents_part").to_numpy()
        order = np.lexsort((win, uid))
        uid_s, win_s = uid[order], win[order]
        new = np.concatenate(
            [[True], (uid_s[1:] != uid_s[:-1]) | (win_s[1:] != win_s[:-1])])
        starts = np.flatnonzero(new)
        return pa.table({
            "user_id": pa.array(uid_s[starts], pa.int64()),
            "window_id": pa.array(win_s[starts], pa.int64()),
            "n_events": pa.array(np.add.reduceat(np_[order], starts), pa.int64()),
            "sum_cents": pa.array(np.add.reduceat(cp[order], starts), pa.int64()),
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ubucket")
        .map_groups(merge, batch_format="pyarrow")
    )


def _bucketed_by_user(ds, n_buckets: int = 64):
    """Tag a user-hash bucket so group bodies process THOUSANDS of users per
    call with one lexsort (the per-tiny-group ``groupby(user_id)`` form is
    the classic shuffle-overhead killer at scale)."""

    def tag(batch: pa.Table) -> pa.Table:
        b = batch.column("user_id").to_numpy() % n_buckets
        return batch.append_column("ubucket", pa.array(b, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow").groupby("ubucket")


def sessionize(ds, gap_us: int = SESSION_GAP_US, n_buckets: int = 64):
    """Session windows per user (gap > 30min starts a new session).

    Output: user_id, session_id (0-based per user), n_events,
    start_us, end_us (epoch micros).  Vectorized per user-hash bucket:
    one lexsort + run-boundary cumsum + reduceat over the whole bucket.
    """

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        new = first | np.concatenate([[True], (t[1:] - t[:-1]) > gap_us])
        # 0-based session id per user: cumsum of session starts minus the
        # cumulative count at each user's first row
        starts_cum = np.cumsum(new)
        base = np.maximum.accumulate(np.where(first, starts_cum, 0))
        sid = starts_cum - base
        sess_start = np.flatnonzero(new)
        sess_end = np.append(sess_start[1:], len(u))
        return pa.table(
            {
                "user_id": pa.array(u[sess_start], pa.int64()),
                "session_id": pa.array(sid[sess_start], pa.int64()),
                "n_events": pa.array(sess_end - sess_start, pa.int64()),
                "start_us": pa.array(t[sess_start], pa.int64()),
                "end_us": pa.array(t[sess_end - 1], pa.int64()),
            }
        )

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


def running_total(ds, n_buckets: int = 64):
    """Per-event cumulative spend per user — the ordered-window aggregate
    ``SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    UNBOUNDED PRECEDING)``.

    Ray Data has no ordered window operator; the scale-correct expression
    is the user-hash bucket (thousands of users per group call): one
    lexsort per bucket, then a segment-offset cumsum (no per-user Python,
    no per-tiny-group shuffle).  Integer cents -> the DuckDB twin
    (``oracle.sql_running_total``) matches bitwise."""

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        cents = np.round(
            g.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        order = np.lexsort((eid, ts, uid))
        u, c = uid[order], cents[order]
        n = len(u)
        first = np.concatenate([[True], u[1:] != u[:-1]])
        cum = np.cumsum(c)
        # prefix sum just BEFORE each user's first row, broadcast down the
        # segment (sign-safe: indexes, not max-accumulated sums)
        seg_start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        running = cum - (cum - c)[seg_start]
        return pa.table(
            {
                "event_id": pa.array(eid[order], pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "running_cents": pa.array(running, pa.int64()),
            }
        )

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


def peak_concurrency(ds, range_us: int = 6 * 3_600_000_000,
                     gap_us: int = SESSION_GAP_US):
    """Peak simultaneous sessions (the classic interval sweep-line,
    distributed): sessionize, emit +1/-1 deltas at session start / end+1,
    then a DISTRIBUTED PREFIX over time ranges — per-range delta totals ->
    driver-side exclusive offsets (tiny) -> per-range in-order prefix max
    candidates -> one-row final reduce.  No global sort, no sequential
    scan of the full timeline.

    Output: one row (peak, t_at_peak) with t_at_peak = earliest micros
    reaching the peak.
    """
    sessions = sessionize(ds, gap_us=gap_us).materialize()  # aggregate-sized

    def deltas(batch: pa.Table) -> pa.Table:
        s0 = batch.column("start_us").to_numpy()
        e0 = batch.column("end_us").to_numpy() + 1
        t = np.concatenate([s0, e0])
        d = np.concatenate([np.ones(len(s0), np.int64),
                            np.full(len(e0), -1, np.int64)])
        df = pd.DataFrame({"t": t, "d": d}).groupby("t", as_index=False).sum()
        df["range_id"] = df["t"] // range_us
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    dts = sessions.map_batches(deltas, batch_format="pyarrow")
    totals = (
        dts.map_batches(
            lambda b: pa.table({"range_id": b.column("range_id"),
                                "d_part": b.column("d")}),
            batch_format="pyarrow")
        .groupby("range_id")
        .aggregate(Sum("d_part", alias_name="d"))
        .to_pandas()  # timeline/range_us rows: tiny
        .sort_values("range_id")
    )
    offsets = {
        int(r): int(o) for r, o in zip(
            totals["range_id"],
            np.concatenate([[0], np.cumsum(totals["d"].to_numpy())[:-1]]))
    }

    def range_peak(g: pa.Table) -> pa.Table:
        t = g.column("t").to_numpy()
        d = g.column("d").to_numpy()
        rid = int(g.column("range_id").to_numpy()[0])
        # deltas may arrive pre-grouped per batch but split across batches:
        # regroup by t inside the range, then prefix
        ut, inv = np.unique(t, return_inverse=True)
        dd = np.zeros(len(ut), np.int64)
        np.add.at(dd, inv, d)
        c = np.cumsum(dd) + offsets.get(rid, 0)
        best = int(c.max())
        at = int(ut[np.flatnonzero(c == best)[0]])
        return pa.table({
            "peak": pa.array([best], pa.int64()),
            "t_at_peak": pa.array([at], pa.int64()),
        })

    def final(batch: pa.Table) -> pa.Table:
        p = batch.column("peak").to_numpy()
        t = batch.column("t_at_peak").to_numpy()
        best = int(p.max())
        at = int(t[p == best].min())
        return pa.table({
            "peak": pa.array([best], pa.int64()),
            "t_at_peak": pa.array([at], pa.int64()),
        })

    return (
        dts.groupby("range_id")
        .map_groups(range_peak, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pyarrow")
    )


def inter_event_gaps(ds, cap_min: int = 120, n_buckets: int = 64):
    """Inter-arrival-time histogram: the gap between each user's
    consecutive events, bucketed to minutes and capped at ``cap_min`` —
    the ``lag()`` window shape (engagement/burstiness analysis), done
    without an ordered-window operator: one lexsort per user-hash bucket,
    a same-user diff, then per-bucket partial histograms -> ONE tiny
    groupby-sum over <= cap_min+1 rows.

    Output: (gap_min, n_gaps) with gap_min = min(gap // 60s, cap_min).
    """
    from ray.data.aggregate import Sum

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        u, t = uid[order], ts[order]
        same = u[1:] == u[:-1]
        gaps = (t[1:] - t[:-1])[same]
        bucket = np.minimum(gaps // 60_000_000, cap_min)
        ub, c = np.unique(bucket, return_counts=True)
        return pa.table(
            {"gap_min": pa.array(ub, pa.int64()),
             "n_part": pa.array(c, pa.int64())}
        )

    return (
        _bucketed_by_user(ds, n_buckets)
        .map_groups(lambda g: per_bucket(g.drop_columns(["ubucket"])),
                    batch_format="pyarrow")
        .groupby("gap_min")
        .aggregate(Sum("n_part", alias_name="n_gaps"))
    )


def max_streak(ds, n_buckets: int = 64):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands shape (day - dense rank is constant within an island)
    done without a window operator: per user-hash bucket, one lexsort over
    (user, day), distinct days, island boundaries where the day step != 1,
    then a segment-max of island lengths.

    Output: (user_id, max_streak) in whole days.
    """

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        day = g.column("ts").cast(pa.int64()).to_numpy() // 86_400_000_000
        order = np.lexsort((day, uid))
        u, d = uid[order], day[order]
        # distinct (user, day)
        keep = np.ones(len(u), bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        # island starts: new user OR day gap != 1
        new_island = first.copy()
        new_island[1:] |= (d[1:] - d[:-1]) != 1
        isl_start = np.flatnonzero(new_island)
        isl_len = np.diff(np.append(isl_start, len(u)))
        isl_user = u[isl_start]
        # max island length per user (islands of one user are consecutive)
        ufirst = np.concatenate([[True], isl_user[1:] != isl_user[:-1]])
        ustart = np.flatnonzero(ufirst)
        best = np.maximum.reduceat(isl_len, ustart)
        return pa.table({
            "user_id": pa.array(isl_user[ustart], pa.int64()),
            "max_streak": pa.array(best.astype(np.int64), pa.int64()),
        })

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


def event_seq(ds, n_buckets: int = 64):
    """Per-user ordered behaviour-sequence string (the classic sequence
    feature for recommendation/LLM training rows): initials of event_type
    concatenated in (ts, event_id) order — ``string_agg(... ORDER BY)`` in
    the DuckDB twin.

    Vectorized inside the user-hash bucket: one ``utf8_slice_codeunits``
    pass gives the initial bytes (the kernel's values buffer IS the byte
    sequence in row order), one lexsort orders them, and per-user strings
    are O(1) buffer slices on segment boundaries — no per-event Python."""
    import pyarrow.compute as pc

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        fc = pc.utf8_slice_codeunits(g.column("event_type"), 0, 1)
        if isinstance(fc, pa.ChunkedArray):
            fc = fc.combine_chunks()
        # ascii initials: the values buffer holds exactly 1 byte per row
        codes = np.frombuffer(fc.buffers()[2], np.uint8)[: len(fc)]
        order = np.lexsort((eid, ts, uid))
        u = uid[order]
        blob = codes[order].tobytes()
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        ends = np.append(starts[1:], len(u))
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "seq": pa.array(
                    [blob[s:e].decode("ascii") for s, e in zip(starts, ends)],
                    pa.string(),
                ),
                "n_events": pa.array(ends - starts, pa.int64()),
            }
        )

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_counts(ds, types=EVENT_TYPES):
    """Per-user one-hot event-type count pivot (wide feature row per user).

    Scale pattern: the pivot happens INSIDE map_batches (per-batch partial
    wide counts), so the shuffle moves one narrow row per (user, batch) and
    the final exchange is a plain groupby-sum over ``len(types)`` int
    columns — never a tall (user, type) intermediate."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["user_id", "event_type"]).to_pandas()
        d = pd.get_dummies(t["event_type"])
        for ty in types:
            if ty not in d.columns:
                d[ty] = 0
        d = d[list(types)].astype(np.int64)
        d["user_id"] = t["user_id"]
        part = d.groupby("user_id", as_index=False).sum()
        return pa.Table.from_pandas(part, preserve_index=False)

    aggs = [Sum(ty, alias_name=f"n_{ty}") for ty in types]
    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "user_id"
    ).aggregate(*aggs)


def hourly_active(ds, window_us: int = WINDOW_US):
    """Distinct active users per time window (the exact companion of the
    ``hll_users`` sketch): per-batch (window, user) dedup partials, one
    pair-level groupby to finish the distinct, then a tiny per-window
    count — the shuffle moves at most one row per (window, user, batch),
    never raw events."""

    def partial(batch: pa.Table) -> pa.Table:
        win = batch.column("ts").cast(pa.int64()).to_numpy() // window_us
        t = pa.table(
            {"window_id": pa.array(win, pa.int64()),
             "user_id": batch.column("user_id")}
        )
        return t.group_by(["window_id", "user_id"]).aggregate([])

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["window_id", "user_id"])
        .count()
        .groupby("window_id")
        .count()
        .map_batches(
            lambda t: t.rename_columns(["window_id", "n_users"]),
            batch_format="pyarrow",
        )
    )


def latest_per_user(ds, n_buckets: int = 64):
    """Latest event per user (argmax by (ts, event_id)) — the upsert /
    CDC log-compaction primitive.  Per-batch partial argmax reduces each
    batch to <= one row per user BEFORE the exchange; the user-hash
    bucket then repeats the same reduction over partials."""

    def reduce_tbl(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts_us").to_numpy() if "ts_us" in g.column_names else (
            g.column("ts").cast(pa.int64()).to_numpy()
        )
        eid = g.column("event_id").to_numpy()
        order = np.lexsort((eid, ts, uid))
        u = uid[order]
        last = np.append(u[1:] != u[:-1], True)  # segment maxima
        keep = order[last]
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "ts_us": pa.array(ts[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
                "event_type": g.column("event_type").take(pa.array(keep)),
            }
        )

    partials = ds.map_batches(reduce_tbl, batch_format="pyarrow")
    return _bucketed_by_user(partials, n_buckets).map_groups(
        lambda g: reduce_tbl(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


T0_US = 788_918_400_000_000  # 1995-01-01, below every event ts


def interval_join_views(ds, window_us: int = WINDOW_US, n_buckets: int = 64):
    """Event-time interval join (the Flink/KSQL band-join primitive): for
    each purchase, the number of 'view' events by the same user in
    [t - window, t).

    Vectorized inside user-hash buckets with ONE composite-key
    searchsorted pair per bucket: views sort once by key = local_uid *
    2^48 + (ts - T0) (ts-offset < 2^48, dense local uids — no per-user
    or per-purchase Python); count = hi - lo.  The window lower bound
    can't underflow into the previous user's band because window_us <<
    2^48 - max offset."""

    def per_bucket(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_pandas().to_numpy()
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy() - T0_US
        eid = g.column("event_id").to_numpy()
        local = np.unique(uid, return_inverse=True)[1].astype(np.int64)
        key = (local << np.int64(48)) + ts
        is_v = et == "view"
        is_p = et == "purchase"
        vkeys = np.sort(key[is_v])
        pk = key[is_p]
        lo = np.searchsorted(vkeys, pk - window_us, side="left")
        hi = np.searchsorted(vkeys, pk, side="left")
        return pa.table(
            {
                "event_id": pa.array(eid[is_p], pa.int64()),
                "n_prior_views": pa.array(hi - lo, pa.int64()),
            }
        )

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


def rank_in_group(ds, group_col: str = "event_type", with_pctl: bool = False):
    """Exact ``RANK() OVER (PARTITION BY group ORDER BY cents)`` for every
    row — WITHOUT a global sort shuffle.

    Two streaming passes over the same pruned read:
    1. per-batch (group, cents) partial counts -> small groupby-sum; the
       merged histogram is bounded by the VALUE DOMAIN (distinct price
       points), not the corpus, so it collects to the driver and
       broadcasts as per-group sorted values + exclusive cumulative
       counts (rank of v = #rows below v + 1 — RANK tie semantics by
       construction);
    2. a map pass looks each row's rank up via ``np.searchsorted``.

    The classic alternative (sort every row within its partition) is the
    ``median_by_type`` scale-killer shape this repo eliminated; this is
    the rank analogue of that histogram fix."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col).to_pandas()
        cents = np.round(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        part = (
            pd.DataFrame({group_col: g, "cents": cents})
            .groupby([group_col, "cents"], as_index=False)
            .size()
            .rename(columns={"size": "n_part"})
        )
        return pa.Table.from_pandas(part, preserve_index=False)

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby([group_col, "cents"])
        .aggregate(Sum("n_part", alias_name="n"))
        .to_pandas()  # bounded: one row per distinct (group, price point)
        .sort_values([group_col, "cents"])
    )
    cdf = {}
    for gname, sub in hist.groupby(group_col):
        vals = sub["cents"].to_numpy()
        cnts = sub["n"].to_numpy()
        below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        cdf[gname] = (vals, below, int(cnts.sum()))

    import ray as _ray

    cdf_ref = _ray.put(cdf)

    def lookup(batch: pa.Table) -> pa.Table:
        table = _ray.get(cdf_ref) if isinstance(cdf_ref, _ray.ObjectRef) else cdf_ref
        g = batch.column(group_col).to_pandas().to_numpy()
        cents = np.round(
            batch.column("value").to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        rnk = np.empty(len(g), dtype=np.int64)
        tot = np.empty(len(g), dtype=np.int64)
        for gname in np.unique(g):
            m = g == gname
            vals, below, n_grp = table[gname]
            rnk[m] = below[np.searchsorted(vals, cents[m], side="left")] + 1
            tot[m] = n_grp
        out = {
            "event_id": batch.column("event_id"),
            group_col: batch.column(group_col),
            "cents": pa.array(cents, pa.int64()),
            "rnk": pa.array(rnk, pa.int64()),
        }
        if with_pctl:
            # integer percentile bucket 0..99 (feature-normalization form)
            out["pctl"] = pa.array((rnk - 1) * 100 // tot, pa.int64())
        return pa.table(out)

    return ds.map_batches(lookup, batch_format="pyarrow")


def asof_join_views(ds, n_buckets: int = 64):
    """For each 'click' event: the most recent 'view' event of the same user
    at ts' <= ts (as-of backward join within the user partition).

    Output: event_id, user_id, view_event_id (-1 when none).  Vectorized
    per user-hash bucket: lexsort, then a forward-fill of view event ids
    that RESETS at user boundaries (maximum.accumulate over row positions).
    """

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        eid = g.column("event_id").to_numpy()
        et = g.column("event_type")
        is_view = pc.equal(et, "view").to_numpy(zero_copy_only=False)
        is_click = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        u, e = uid[order], eid[order]
        v = is_view[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        # forward-fill the POSITION of the last view; a fill is valid only
        # if it happened at or after the current user's first row (both
        # sides are monotone position accumulations, so no cross-user leak)
        pos = np.arange(len(u), dtype=np.int64)
        last_view_pos = np.maximum.accumulate(np.where(v, pos, -1))
        user_start = np.maximum.accumulate(np.where(first, pos, -1))
        ok = last_view_pos >= user_start
        last_view = np.where(ok, e[np.maximum(last_view_pos, 0)], -1)
        m = is_click[order]
        return pa.table(
            {
                "event_id": pa.array(e[m], pa.int64()),
                "user_id": pa.array(u[m], pa.int64()),
                "view_event_id": pa.array(last_view[m], pa.int64()),
            }
        )

    return _bucketed_by_user(ds, n_buckets).map_groups(
        lambda g: per_bucket(g.drop_columns(["ubucket"])), batch_format="pyarrow"
    )


def sliding_window(ds, window_us: int = WINDOW_US, slide_us: int = WINDOW_US // 2):
    """Sliding windows (1h window, 30min slide): each event lands in
    window_us/slide_us windows; per (user, window start): count + sum cents.

    Expressed as a flat-map (emit one row per covering window) + the partial
    aggregation combiner — the standard batch restatement of sliding windows.
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    k = window_us // slide_us

    def expand(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "value"]).to_pandas()
        tsu = df["ts"].astype("int64").to_numpy()
        cents = (df["value"] * 100).round().astype("int64").to_numpy()
        user = df["user_id"].to_numpy()
        rows = {"user_id": [], "win_start": [], "cents": []}
        for j in range(k):
            start = ((tsu - j * slide_us) // window_us) * window_us + j * slide_us
            ok = start >= 0
            rows["user_id"].append(user[ok])
            rows["win_start"].append(start[ok])
            rows["cents"].append(cents[ok])
        out = pd.DataFrame(
            {
                "user_id": np.concatenate(rows["user_id"]),
                "win_start": np.concatenate(rows["win_start"]),
                "cents": np.concatenate(rows["cents"]),
            }
        )
        g = out.groupby(["user_id", "win_start"], as_index=False).agg(
            n_part=("cents", "size"), cents_part=("cents", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["user_id", "win_start"])
        .aggregate(Sum("n_part", alias_name="n_events"),
                   Sum("cents_part", alias_name="sum_cents"))
    )


def median_by_type(ds):
    """Exact lower-median (quantile_disc 0.5) of value-cents per event_type.

    Scale shape (round-3 rework): ``groupby(event_type)`` with ~5 distinct
    keys would ship N/5 rows into ONE task and sort them — unbounded.
    Instead each batch emits (event_type, cents) -> count partials (the
    cents domain is bounded), a groupby-sum merges the per-type histograms,
    and the exact discrete quantile is read off the merged histogram — the
    per-type group is now O(distinct cents), never O(rows).
    """
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        cents = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        df = pd.DataFrame(
            {"event_type": batch.column("event_type").to_pandas(), "cents": cents}
        )
        out = df.groupby(["event_type", "cents"], as_index=False).size()
        return pa.table(
            {
                "event_type": pa.array(out["event_type"], pa.string()),
                "cents": pa.array(out["cents"].to_numpy(), pa.int64()),
                "n_part": pa.array(out["size"].to_numpy(), pa.int64()),
            }
        )

    def quantile_from_hist(g: pa.Table) -> pa.Table:
        et = g.column("event_type").to_numpy(zero_copy_only=False)
        cents = g.column("cents").to_numpy()
        cnt = g.column("n_part").to_numpy()
        order = np.lexsort((cents, et))
        et, cents, cnt = et[order], cents[order], cnt[order]
        new = np.ones(len(et), dtype=bool)
        new[1:] = et[1:] != et[:-1]
        gstart = np.flatnonzero(new)
        glen = np.diff(np.append(gstart, len(et)))
        totals = np.add.reduceat(cnt, gstart)
        # discrete quantile: smallest value with cumulative count >= ceil(q*n)
        cum = np.cumsum(cnt)
        base = np.repeat(cum[gstart] - cnt[gstart], glen)
        within = cum - base
        target = np.repeat(np.ceil(0.5 * totals).astype(np.int64), glen)
        hit = within >= target
        # first hit per group
        idx = np.flatnonzero(hit)
        grp_of = np.cumsum(new) - 1
        first_hit = np.full(len(gstart), len(et), dtype=np.int64)
        np.minimum.at(first_hit, grp_of[idx], idx)
        return pa.table(
            {
                "event_type": pa.array(et[gstart].tolist(), pa.string()),
                "median_cents": pa.array(cents[first_hit], pa.int64()),
                "n_events": pa.array(totals, pa.int64()),
            }
        )

    merged = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby(["event_type", "cents"])
        .aggregate(Sum("n_part", alias_name="n_part"))
    )
    # merged histogram is small (types x distinct cents); one final task
    return merged.repartition(1).map_batches(
        quantile_from_hist, batch_format="pyarrow", batch_size=None
    )


def grouped_quantiles(ds, group_col: str, value_col: str, qs=(0.5, 0.9, 0.99),
                      out_prefix: str = "p"):
    """Exact multi-quantile per group over an integer-domain value column
    (generalizes :func:`median_by_type`'s histogram design — DuckDB
    ``quantile_disc(q)`` = ceil(q*n)-th smallest, verified empirically).

    Scale shape: per-batch (group, value) -> count partials (volume is
    distinct values per batch, never rows), one small ``groupby`` merge of
    the histograms, quantiles read off each group's merged histogram in a
    single final task — per-group state is O(distinct values), independent
    of row count.  Output columns: group_col, ``{prefix}{q*100}`` per q,
    n_rows.
    """
    from ray.data.aggregate import Sum

    qs = tuple(qs)
    names = [f"{out_prefix}{int(round(q * 100))}" for q in qs]

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "g": batch.column(group_col).to_pandas(),
                "v": batch.column(value_col).to_numpy().astype(np.int64),
            }
        )
        out = df.groupby(["g", "v"], as_index=False).size()
        return pa.table(
            {
                group_col: pa.array(out["g"]),
                "v": pa.array(out["v"].to_numpy(), pa.int64()),
                "n_part": pa.array(out["size"].to_numpy(), pa.int64()),
            }
        )

    def from_hist(t: pa.Table) -> pa.Table:
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy()
        cnt = t.column("n_part").to_numpy()
        order = np.lexsort((v, g))
        g, v, cnt = g[order], v[order], cnt[order]
        new = np.ones(len(g), dtype=bool)
        new[1:] = g[1:] != g[:-1]
        gstart = np.flatnonzero(new)
        glen = np.diff(np.append(gstart, len(g)))
        totals = np.add.reduceat(cnt, gstart)
        cum = np.cumsum(cnt)
        base = np.repeat(cum[gstart] - cnt[gstart], glen)
        within = cum - base
        grp_of = np.cumsum(new) - 1
        cols = {group_col: pa.array(g[gstart].tolist())}
        for q, name in zip(qs, names):
            target = np.repeat(np.ceil(q * totals).astype(np.int64), glen)
            idx = np.flatnonzero(within >= target)
            first_hit = np.full(len(gstart), len(g), dtype=np.int64)
            np.minimum.at(first_hit, grp_of[idx], idx)
            cols[name] = pa.array(v[first_hit], pa.int64())
        cols["n_rows"] = pa.array(totals, pa.int64())
        return pa.table(cols)

    merged = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby([group_col, "v"])
        .aggregate(Sum("n_part", alias_name="n_part"))
    )
    return merged.repartition(1).map_batches(
        from_hist, batch_format="pyarrow", batch_size=None
    )


WEEK_US = 7 * 86400 * 1_000_000


def retention(ds, bucket_us: int = WEEK_US, n_buckets: int = 64):
    """Cohort retention matrix: users bucketed by their FIRST event's week,
    counted once per (cohort, week-offset) they were active in.

    Output: cohort_w, week_offset (active week - cohort week), n_users.

    Scale shape: the user-hash bucket co-locates each user's whole event
    stream, so cohort (min ts) and the distinct active-week set both fall
    out of ONE in-bucket lexsort — no user-level join, no distinct-count
    shuffle; the cross-bucket merge is a tiny (cohorts x offsets) sum.
    """
    from ray.data.aggregate import Sum

    def per_bucket(g: pa.Table) -> pa.Table:
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        w = ts // bucket_us
        order = np.lexsort((w, uid))
        u, wk = uid[order], w[order]
        first_u = np.concatenate([[True], u[1:] != u[:-1]])
        # distinct (user, week) pairs
        pair_new = first_u | np.concatenate([[True], wk[1:] != wk[:-1]])
        # cohort week per row = the week at the user's first (sorted) row
        upos = np.maximum.accumulate(np.where(first_u, np.arange(len(u)), -1))
        cohort = wk[upos]
        sel = pair_new
        df = (
            pd.DataFrame(
                {
                    "cohort_w": cohort[sel],
                    "week_offset": wk[sel] - cohort[sel],
                }
            )
            .groupby(["cohort_w", "week_offset"], as_index=False)
            .size()
        )
        return pa.table(
            {
                "cohort_w": pa.array(df["cohort_w"].to_numpy(), pa.int64()),
                "week_offset": pa.array(df["week_offset"].to_numpy(), pa.int64()),
                "n_part": pa.array(df["size"].to_numpy(), pa.int64()),
            }
        )

    return (
        _bucketed_by_user(ds, n_buckets)
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["ubucket"])),
            batch_format="pyarrow",
        )
        .groupby(["cohort_w", "week_offset"])
        .aggregate(Sum("n_part", alias_name="n_users"))
    )


def funnel(ds, steps=("view", "click", "purchase"), n_buckets: int = 64):
    """Ordered conversion funnel: how many users performed step1, step1
    then step2 (at ts >= the first step1), then step3 (ts >= the first
    qualifying step2) — the first-match-in-order semantics of product
    funnels.  Output: one row, n_s1 / n_s2 / n_s3 user counts.

    Scale shape: per user-hash bucket, each step level is one segment-min
    (reduceat) over the user's rows filtered by the previous level's
    threshold — no per-user Python; buckets emit 3 partial counts and the
    merge is a 3-integer sum.
    """
    from ray.data.aggregate import Sum

    s1, s2, s3 = steps

    def per_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        et = g.column("event_type")
        order = np.lexsort((ts, uid))
        u, t = uid[order], ts[order]
        m1 = pc.equal(et, s1).to_numpy(zero_copy_only=False)[order]
        m2 = pc.equal(et, s2).to_numpy(zero_copy_only=False)[order]
        m3 = pc.equal(et, s3).to_numpy(zero_copy_only=False)[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = u[1:] != u[:-1]
        gid = np.cumsum(first) - 1
        n_users = int(first.sum())
        BIG = np.iinfo(np.int64).max

        def level_min(mask: np.ndarray, thresh: np.ndarray) -> np.ndarray:
            """Per-user min ts among rows with mask and ts >= thresh[user]
            (thresh = BIG -> user disqualified)."""
            ok = mask & (t >= thresh[gid])
            vals = np.where(ok, t, BIG)
            out = np.full(n_users, BIG, dtype=np.int64)
            np.minimum.at(out, gid[ok], vals[ok])
            return out

        t1 = level_min(m1, np.zeros(n_users, dtype=np.int64))
        t2 = level_min(m2, t1)
        t3 = level_min(m3, t2)
        return pa.table(
            {
                "n_s1": pa.array([int((t1 < BIG).sum())], pa.int64()),
                "n_s2": pa.array([int((t2 < BIG).sum())], pa.int64()),
                "n_s3": pa.array([int((t3 < BIG).sum())], pa.int64()),
            }
        )

    def total(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_s1": [b["n_s1"].sum()],
                "n_s2": [b["n_s2"].sum()],
                "n_s3": [b["n_s3"].sum()],
            }
        )

    # bucket partials (one tiny row each) -> single-task exact sum
    return (
        _bucketed_by_user(ds, n_buckets)
        .map_groups(
            lambda g: per_bucket(g.drop_columns(["ubucket"])),
            batch_format="pyarrow",
        )
        .repartition(1)
        .map_batches(total, batch_format="pandas", batch_size=None)
    )


def window_ohlc(ds, window_us: int = WINDOW_US, n_buckets: int = 64):
    """Per (event_type, 1h window): open / close (value-cents of the first
    / last event by (ts, event_id)), lo / hi, n_events — the streaming
    OHLC shape, expressed as combinable partials.

    Scale shape: each batch emits per-(type, window) candidate partials
    (its own open/close candidates + lo/hi/n), so the shuffle moves
    O(distinct windows per batch), not rows; a window-hash bucket
    finalizes thousands of windows per group call with one lexsort.
    Deterministic: ties on ts break on event_id.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "event_type": batch.column("event_type").to_pandas(),
                "tsu": batch.column("ts").cast(pa.int64()).to_numpy(),
                "event_id": batch.column("event_id").to_numpy(),
                "cents": np.round(batch.column("value").to_numpy() * 100).astype(np.int64),
            }
        )
        df["w"] = df["tsu"] // window_us
        df = df.sort_values(["event_type", "w", "tsu", "event_id"],
                            ignore_index=True)
        g = df.groupby(["event_type", "w"], sort=False)
        first = g.head(1)
        last = g.tail(1)
        agg = g.agg(lo=("cents", "min"), hi=("cents", "max"),
                    n_part=("cents", "size")).reset_index()
        out = agg.merge(
            first[["event_type", "w", "tsu", "event_id", "cents"]].rename(
                columns={"tsu": "o_ts", "event_id": "o_eid", "cents": "o_cents"}),
            on=["event_type", "w"],
        ).merge(
            last[["event_type", "w", "tsu", "event_id", "cents"]].rename(
                columns={"tsu": "c_ts", "event_id": "c_eid", "cents": "c_cents"}),
            on=["event_type", "w"],
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        w = batch.column("w").to_numpy()
        et = batch.column("event_type").to_pandas()
        h = (w.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + pd.util.hash_array(et.to_numpy(dtype=object)).astype(np.uint64))
        return batch.append_column(
            "bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64), pa.int64())
        )

    def finalize(g: pa.Table) -> pa.Table:
        df = g.to_pandas()
        df = df.sort_values(["event_type", "w", "o_ts", "o_eid"],
                            ignore_index=True)
        gb = df.groupby(["event_type", "w"], sort=False)
        opens = gb.head(1)[["event_type", "w", "o_cents"]]
        df2 = df.sort_values(["event_type", "w", "c_ts", "c_eid"],
                             ignore_index=True)
        closes = df2.groupby(["event_type", "w"], sort=False).tail(1)[
            ["event_type", "w", "c_cents"]
        ]
        agg = gb.agg(lo=("lo", "min"), hi=("hi", "max"),
                     n_events=("n_part", "sum")).reset_index()
        out = (
            agg.merge(opens, on=["event_type", "w"])
            .merge(closes, on=["event_type", "w"])
            .rename(columns={"o_cents": "open_cents", "c_cents": "close_cents",
                             "w": "window_id"})
        )
        out = out[["event_type", "window_id", "open_cents", "close_cents",
                   "lo", "hi", "n_events"]]
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: finalize(g.drop_columns(["bucket"])),
                    batch_format="pyarrow")
    )


def pareto_front(ds, x_col: str = "value", y_col: str = "ts"):
    """2-D Pareto front (skyline query): the set of DISTINCT (cents, tsu)
    pairs not dominated by any other event (maximize both value and
    recency) — the multi-objective filter shape (e.g. best quality-vs-
    freshness corpus snapshots).

    The front is an ASSOCIATIVE reduction: the front of a union is the
    front of the concatenated partial fronts.  So each batch reduces to
    its own staircase (per-x max y, then strictly-increasing-y scan on x
    descending — fully vectorized), the tiny partial fronts gather onto
    one block, and the same kernel runs once more.  No global sort, no
    all-to-all: the shuffle volume is the partial-front rows only.
    """

    def staircase(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"cents": pa.array([], pa.int64()),
                             "tsu": pa.array([], pa.int64())})
        if "cents" in batch.column_names:
            x = batch.column("cents").to_numpy()
            y = batch.column("tsu").to_numpy()
        else:
            df = batch.select([x_col, y_col]).to_pandas()
            x = (df[x_col] * 100).round().astype("int64").to_numpy()
            y = df[y_col].astype("int64").to_numpy()
        order = np.lexsort((-y, -x))  # x desc, y desc
        xs, ys = x[order], y[order]
        first = np.concatenate([[True], xs[1:] != xs[:-1]])  # max y per x
        xs, ys = xs[first], ys[first]
        run = np.maximum.accumulate(ys)
        keep = np.concatenate([[True], ys[1:] > run[:-1]])  # strict staircase
        return pa.table(
            {
                "cents": pa.array(xs[keep], pa.int64()),
                "tsu": pa.array(ys[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(staircase, batch_format="pyarrow")
        .repartition(1)  # partial fronts are tiny (staircase of the data)
        .map_batches(staircase, batch_format="pyarrow")
    )


def decay_score(ds, max_shift: int = 40):
    """Exponentially time-decayed heat per event type with EXACT integer
    halving (the freshness-weighted ranking signal): each positive-cents
    event contributes ``cents >> min(age_hours, max_shift)`` relative to
    the corpus's max event hour.  Two streaming passes: a tiny max-hour
    aggregate, then per-batch (type, heat, n) partials -> ONE bounded
    groupby-sum.  Bit-shift halving keeps the decay bitwise-mirrorable
    (``cents // (1 << shift)`` on positive ints in SQL)."""
    from ray.data.aggregate import Sum

    def hour_partial(batch: pa.Table) -> pa.Table:
        h = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        return pa.table({"h": pa.array([int(h.max())] if len(h) else [],
                                       pa.int64())})

    ref = ds.map_batches(hour_partial, batch_format="pyarrow").max("h")

    def partial(batch: pa.Table) -> pa.Table:
        et = np.asarray(batch.column("event_type").to_pandas(), dtype=object)
        cents = np.round(batch.column("value").to_numpy() * 100).astype(np.int64)
        h = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        pos = cents > 0
        et, cents, h = et[pos], cents[pos], h[pos]
        shift = np.minimum(ref - h, max_shift)
        c = cents >> shift
        df = pd.DataFrame({"event_type": et, "c": c})
        agg = df.groupby("event_type", as_index=False).agg(
            heat_part=("c", "sum"), n_part=("c", "size"))
        return pa.Table.from_pandas(agg, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("heat_part", alias_name="heat"),
                   Sum("n_part", alias_name="n_events"))
    )


def rolling_active(ds, w: int = 24):
    """Sliding-window distinct users ("rolling DAU"): for every hour that
    appears in the data, how many DISTINCT users were active in the
    trailing ``w``-hour window (h-w+1 .. h).

    Exact without per-window re-distincting: ONE user-hash-bucket
    exchange of per-batch-deduped (user, hour) pairs; each bucket body
    merges every user's active hours into coverage intervals [h, h+w-1]
    (a run continues while the next active hour is < prev + w), drops
    +1/-1 into a PARTIAL difference histogram over the bounded hour
    axis, and emits (hour, cover_part) rows — then one tiny
    ``groupby(h)`` sum merges buckets.  No stage ever holds more than
    its bucket's pairs + the hour axis; the output hour set is the
    hours that actually appear (hour presence flags ride the same
    partials).  SQL twin: banded self-join with count(DISTINCT user)."""
    from ray.data.aggregate import Max, Sum

    n_buckets = 64

    def partial(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        h = batch.column("ts").cast(pa.int64()).to_numpy() // 3_600_000_000
        df = pd.DataFrame({"user_id": uid, "h": h}).drop_duplicates()
        df["ub"] = df["user_id"].to_numpy() % n_buckets
        return pa.Table.from_pandas(df, preserve_index=False)

    def bucket_cover(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "cover_part": pa.array([], pa.int64()),
                             "present": pa.array([], pa.int64())})
        uid = g.column("user_id").to_numpy()
        h = g.column("h").to_numpy()
        order = np.lexsort((h, uid))
        uid, h = uid[order], h[order]
        # batch-level dedup may leave cross-batch (user, hour) dupes —
        # drop them here (sorted, so adjacent)
        first = np.concatenate([[True], (uid[1:] != uid[:-1])
                                | (h[1:] != h[:-1])])
        uid, h = uid[first], h[first]
        lo, hi = int(h.min()), int(h.max())
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        prev_h = np.concatenate([[0], h[:-1]])
        start = np.where(same & (prev_h + w > h), prev_h + w, h)
        end = h + w - 1
        diff = np.zeros(hi - lo + w + 2, np.int64)
        np.add.at(diff, start - lo, 1)
        np.add.at(diff, end - lo + 1, -1)
        # coverage extends w-1 hours past this bucket's last activity —
        # other buckets may have PRESENT hours there, so keep the tail
        cover = np.cumsum(diff)[: hi - lo + w]
        present = np.zeros(hi - lo + w, np.int64)
        present[np.unique(h) - lo] = 1
        nz = np.flatnonzero((cover > 0) | (present > 0))
        return pa.table({
            "h": pa.array(nz + lo, pa.int64()),
            "cover_part": pa.array(cover[nz], pa.int64()),
            "present": pa.array(present[nz], pa.int64()),
        })

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(lambda g: bucket_cover(g.drop_columns(["ub"])),
                    batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("cover_part", alias_name="active_users"),
                   Max("present", alias_name="present"))
    )

    def keep_present(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = batch.filter(pc.equal(batch.column("present"), 1))
        return out.select(["h", "active_users"])

    return merged.map_batches(keep_present, batch_format="pyarrow")


def active_seconds(ds, window_us: int = 1_800_000_000):
    """Per-user total COVERED time: the union length of the per-event
    activity windows [ts, ts + window) — "time on site" without
    double-counting overlaps (the sessionize-adjacent engagement metric).

    Scale shape: the user-hash bucket exchange, then one lexsort per
    bucket and pure run algebra: within a user, an event extends coverage
    by ``min(window, ts - prev_ts)`` (overlap-clipped), the first event
    contributes the full window.  Exact integer microseconds; SQL twin
    via the same lag algebra."""
    from ray.data.aggregate import Sum

    n_buckets = 64

    def tag(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return pa.table({
            "user_id": batch.column("user_id"),
            "tsu": batch.column("ts").cast(pa.int64()),
            "ub": pa.array(uid % n_buckets, pa.int64()),
        })

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "us_part": pa.array([], pa.int64())})
        uid = g.column("user_id").to_numpy()
        tsu = g.column("tsu").to_numpy()
        order = np.lexsort((tsu, uid))
        uid, tsu = uid[order], tsu[order]
        same = np.concatenate([[False], uid[1:] == uid[:-1]])
        prev = np.concatenate([[0], tsu[:-1]])
        contrib = np.where(same, np.minimum(window_us, tsu - prev),
                           window_us).astype(np.int64)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(uid)) + 1])
        total = np.add.reduceat(contrib, starts)
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "us_part": pa.array(total, pa.int64()),
        })

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("ub")
        .map_groups(lambda g: per_bucket(g.drop_columns(["ub"])),
                    batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("us_part", alias_name="covered_us"))
    )

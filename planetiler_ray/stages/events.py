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


def tumbling_window(ds):
    """Per (user_id, 1h window): n events + sum(value) in integer cents.

    Scale pattern: per-batch partial aggregation, then a small groupby-sum.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["user_id", "ts", "value"]).to_pandas()
        win = (df["ts"].astype("int64") // WINDOW_US).astype("int64")
        cents = (df["value"] * 100).round().astype("int64")
        g = (
            pd.DataFrame({"user_id": df["user_id"], "window_id": win, "cents": cents})
            .groupby(["user_id", "window_id"], as_index=False)
            .agg(n_part=("cents", "size"), cents_part=("cents", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["user_id", "window_id"])
        .aggregate(Sum("n_part", alias_name="n_events"),
                   Sum("cents_part", alias_name="sum_cents"))
    )


def sessionize(ds, gap_us: int = SESSION_GAP_US):
    """Session windows per user (gap > 30min starts a new session).

    Output: user_id, session_id (0-based per user), n_events,
    start_us, end_us (epoch micros).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy()
        new = np.concatenate([[True], np.diff(ts) > gap_us])
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"session_id": sid, "ts": ts})
            .groupby("session_id", as_index=False)
            .agg(n_events=("ts", "size"), start_us=("ts", "min"), end_us=("ts", "max"))
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        return out

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


def asof_join_views(ds):
    """For each 'click' event: the most recent 'view' event of the same user
    at ts' <= ts (as-of backward join within the user partition).

    Output: event_id, user_id, view_event_id (-1 when none).
    """

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        is_view = (g["event_type"] == "view").to_numpy()
        ev_id = g["event_id"].to_numpy()
        last_view = np.where(is_view, ev_id, -1)
        last_view = pd.Series(last_view).replace(-1, np.nan).ffill().fillna(-1).astype("int64").to_numpy()
        m = (g["event_type"] == "click").to_numpy()
        return pd.DataFrame(
            {
                "event_id": ev_id[m],
                "user_id": g["user_id"].to_numpy()[m],
                "view_event_id": last_view[m],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")


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
    """Exact lower-median (quantile_disc 0.5) of value-cents per event_type —
    deterministic integer output, groupby + sorted per-group rank."""
    import pyarrow as pa

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.sort((g["value"] * 100).round().astype("int64").to_numpy())
        # discrete quantile: smallest value with cumulative probability >= q
        # (1-based index ceil(q*n)) — matches DuckDB quantile_disc
        idx = int(np.ceil(0.5 * len(cents))) - 1
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "median_cents": [int(cents[idx])],
             "n_events": [len(cents)]}
        )

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")

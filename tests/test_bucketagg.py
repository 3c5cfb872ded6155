"""bucketed_sum vs a pandas groupby reference on random int tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from planetiler_ray.stages.bucketagg import bucketed_sum


def _mk(n=5_000, k=700, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "a": rng.integers(0, k, n).astype(np.int64),
        "b": rng.integers(0, 7, n).astype(np.int64),
        "v": rng.integers(-50, 50, n).astype(np.int64),
        "w": rng.integers(0, 1000, n).astype(np.int64),
    })


def test_bucketed_sum_matches_pandas(ray_session):
    df = _mk()
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = (
        bucketed_sum(ds, ["a", "b"], [("v", "sv")], mins=[("w", "mw")])
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False)
        .agg(sv=("v", "sum"), mw=("w", "min"))
        .sort_values(["a", "b"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got.astype(np.int64), want.astype(np.int64))


def test_bucketed_sum_having(ray_session):
    df = _mk(seed=5)
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(4)
    got = (
        bucketed_sum(ds, ["a"], [("v", "sv")],
                     having=lambda kv, ov: ov["sv"] > 10)
        .to_pandas()
        .sort_values("a", ignore_index=True)
    )
    want = df.groupby("a", as_index=False).agg(sv=("v", "sum"))
    want = want[want["sv"] > 10].reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype(np.int64), want.astype(np.int64))


def test_count_min_partial_matches_pandas():
    from planetiler_ray.stages.bucketagg import count_min_partial

    df = _mk(n=2_000, k=120, seed=11)
    batch = pa.Table.from_pandas(df)
    got = (
        count_min_partial(["a", "b"], "_one", [("w", "mw")])(batch)
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False)
        .agg(_one=("v", "size"), mw=("w", "min"))
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert (got["a"] == want["a"]).all()
    assert (got["b"] == want["b"]).all()
    assert (got["_one"] == want["_one"]).all()
    assert (got["mw"] == want["mw"]).all()


def test_count_min_partial_empty_batch():
    from planetiler_ray.stages.bucketagg import count_min_partial

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "w": pa.array([], pa.int64())})
    out = count_min_partial(["a", "b"], "_one", [("w", "mw")])(empty)
    assert out.num_rows == 0
    assert out.column_names == ["a", "b", "_one", "mw"]

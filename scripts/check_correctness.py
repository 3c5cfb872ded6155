"""Local mini version of the driver's correctness gate: run each queries()
entry and its oracle_sql() twin on an sf dir, compare row count + sorted
value hash.  Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def _to_pandas(res):
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWS ray={len(ray_df)} sql={len(sql_df)}")
        ok = False
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        print(f"  [{name}] SCHEMA ray={rc} sql={sc}")
        return False
    a, b = canon(ray_df), canon(sql_df)
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            ak, bk = av.dtype.kind, bv.dtype.kind
            if (ak == "f") != (bk == "f"):
                # int-on-one-side / float-on-the-other: the driver's value
                # hash sees different representations even when numerically
                # equal (e.g. DuckDB HUGEINT -> pandas float64).  Hard fail.
                print(f"  [{name}] DTYPE col {col}: ray={av.dtype} sql={bv.dtype}")
                ok = False
                continue
            if ak == "f":
                import numpy as np

                match = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                match = av.astype(str).equals(bv.astype(str))
        except Exception as e:  # pragma: no cover
            print(f"  [{name}] col {col} compare error: {e}")
            match = False
        if not match:
            ok = False
            if len(av) == len(bv):
                diff = (av.astype(str) != bv.astype(str))
                print(f"  [{name}] VALUES differ in col {col}: {int(diff.sum())} rows")
                print(pd.concat([a[diff].head(3).add_prefix("ray_"),
                                 b[diff].head(3).add_prefix("sql_")], axis=1))
            else:
                print(f"  [{name}] col {col}: cannot diff (row counts differ)")
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_ok = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ray_df = _to_pandas(fn(sf_dir))
        if name not in oracles:
            print(f"[{name}] rows-only: {len(ray_df)} rows (no oracle)")
            continue
        sql_df = con.execute(oracles[name]).fetchdf()
        if compare(name, ray_df, sql_df):
            print(f"[{name}] OK ({len(ray_df)} rows)")
            n_ok += 1
        else:
            print(f"[{name}] FAIL")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Derived-partsupp TPC-H family (Q2/Q9/Q11/Q16/Q20) — derivation
invariants + DuckDB oracle parity at sf0.001."""

import duckdb
import numpy as np
import pandas as pd

from planetiler_ray.pipelines import partsupp

SF = "/root/testdata/sf0.001"
TABLES = ["part", "supplier", "nation", "region", "lineitem", "orders"]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def test_derive_rows_distinct_and_in_range():
    for s_count in (4, 10, 100, 1000):
        pk = np.arange(0, 5000, 7, dtype=np.int64)
        pk4, sk4, avail4, cost4 = partsupp.derive_rows(pk, s_count)
        assert pk4.size == 4 * pk.size
        sks = sk4.reshape(-1, 4)
        # 4 DISTINCT suppliers per part whenever S >= 4
        assert all(len(set(r.tolist())) == 4 for r in sks)
        assert sk4.min() >= 0 and sk4.max() < s_count
        assert avail4.min() >= 1 and avail4.max() <= 9999
        assert cost4.min() >= 100 and cost4.max() < 100000


def test_membership_matches_derivation():
    s_count = 10
    pk = np.arange(0, 200, dtype=np.int64)
    pk4, sk4, avail4, cost4 = partsupp.derive_rows(pk, s_count)
    m, avail, cost = partsupp.member_avail_cost(pk4, sk4, s_count)
    assert m.all()
    np.testing.assert_array_equal(avail, avail4)
    np.testing.assert_array_equal(cost, cost4)
    # non-members: exhaustive (pk, sk) grid minus the derived set
    grid_pk = np.repeat(pk, s_count)
    grid_sk = np.tile(np.arange(s_count, dtype=np.int64), pk.size)
    gm, _, _ = partsupp.member_avail_cost(grid_pk, grid_sk, s_count)
    derived = set(zip(pk4.tolist(), sk4.tolist()))
    expect = np.array([(a, b) in derived
                       for a, b in zip(grid_pk.tolist(), grid_sk.tolist())])
    np.testing.assert_array_equal(gm, expect)


def test_partsupp_cte_matches_derive_rows():
    from planetiler_ray import oracle

    got = _con().execute(
        f"WITH {oracle.PARTSUPP_CTE} SELECT * FROM partsupp ORDER BY 1, 2"
    ).fetchdf()
    import pyarrow.parquet as pq

    pk = pq.read_table(f"{SF}/part.parquet",
                       columns=["p_partkey"]).column(0).to_numpy()
    s_count = partsupp.supplier_count(SF)
    pk4, sk4, avail4, cost4 = partsupp.derive_rows(
        pk.astype(np.int64), s_count)
    order = np.lexsort((sk4, pk4))
    np.testing.assert_array_equal(got["ps_partkey"].to_numpy(), pk4[order])
    np.testing.assert_array_equal(got["ps_suppkey"].to_numpy(), sk4[order])
    np.testing.assert_array_equal(got["ps_availqty"].to_numpy(),
                                  avail4[order])
    np.testing.assert_array_equal(got["ps_supplycost_c"].to_numpy(),
                                  cost4[order])


def _parity(name: str, fn, ray_session):
    import __ray_entry__ as e

    df = _canon(fn(SF).to_pandas())
    exp = _canon(_con().execute(e.oracle_sql()[name]).fetchdf())
    assert list(df.columns) == list(exp.columns)
    assert len(df) == len(exp) and len(df) > 0
    for col in df.columns:
        if df[col].dtype.kind == "f":
            np.testing.assert_allclose(df[col].to_numpy(),
                                       exp[col].to_numpy(), rtol=0, atol=0)
        else:
            assert list(df[col]) == list(exp[col]), col


def test_tpch_q2_parity(ray_session):
    _parity("tpch_q2", partsupp.q_tpch_q2, ray_session)


def test_tpch_q9_parity(ray_session):
    _parity("tpch_q9", partsupp.q_tpch_q9, ray_session)


def test_tpch_q11_parity(ray_session):
    _parity("tpch_q11", partsupp.q_tpch_q11, ray_session)


def test_tpch_q16_parity(ray_session):
    _parity("tpch_q16", partsupp.q_tpch_q16, ray_session)


def test_tpch_q20_parity(ray_session):
    _parity("tpch_q20", partsupp.q_tpch_q20, ray_session)

"""TPC-H Q12/Q14-shaped join aggregates — DuckDB oracle parity."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["lineitem", "orders", "part"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_tpch_q12_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import training

    df = (
        training.q_tpch_q12(SF)
        .to_pandas()
        .sort_values("shipmode", ignore_index=True)
    )
    exp = _con().execute(e.oracle_sql()["tpch_q12"]).fetchdf()
    assert list(df["shipmode"]) == list(exp["shipmode"])
    for col in ["high_line_count", "low_line_count"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64),
        )
    assert (df["high_line_count"] + df["low_line_count"] > 0).all()


def test_tpch_q14_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import training

    df = training.q_tpch_q14(SF).to_pandas()
    exp = _con().execute(e.oracle_sql()["tpch_q14"]).fetchdf()
    assert len(df) == 1
    assert int(df["promo_rev_cbp"][0]) == int(exp["promo_rev_cbp"][0])
    assert int(df["total_rev_cbp"][0]) == int(exp["total_rev_cbp"][0])
    assert 0 < int(df["promo_rev_cbp"][0]) < int(df["total_rev_cbp"][0])

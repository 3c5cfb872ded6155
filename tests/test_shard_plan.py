"""shard_plan — oracle parity + contiguity/balance invariants."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_shard_plan_parity_and_invariants(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import webgeo

    df = (webgeo.q_shard_plan(SF).to_pandas()
          .sort_values("shard", ignore_index=True))
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    exp = (con.execute(e.oracle_sql()["shard_plan"]).fetchdf()
           .sort_values("shard", ignore_index=True))
    assert len(df) == len(exp) > 0
    for col in ["shard", "n_tiles", "bytes", "key_min", "key_max"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64), err_msg=col)
    # contiguity: shard key ranges are disjoint and ordered
    assert (df["key_min"] <= df["key_max"]).all()
    assert (df["key_min"].to_numpy()[1:] > df["key_max"].to_numpy()[:-1]).all()
    # every shard id is in range and non-trivial (floor assignment can
    # only overshoot a shard by the bytes of ONE tile, so with hot z2
    # tiles the strongest safe balance claim is occupancy + ordering)
    assert set(df["shard"]) <= set(range(8))
    assert (df["bytes"] > 0).all() and (df["n_tiles"] > 0).all()

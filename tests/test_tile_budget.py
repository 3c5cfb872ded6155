"""tile_size_budget — oracle parity + budget-invariant checks."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_tile_size_budget_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import webgeo

    df = (webgeo.q_tile_size_budget(SF).to_pandas()
          .sort_values(["z", "tile_x", "tile_y"], ignore_index=True))
    con = duckdb.connect()
    for t in ["documents", "customer", "nation", "region", "supplier",
              "part", "orders", "lineitem", "events", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    exp = (con.execute(e.oracle_sql()["tile_size_budget"]).fetchdf()
           .sort_values(["z", "tile_x", "tile_y"], ignore_index=True))
    assert len(df) == len(exp) > 0
    for col in ["z", "tile_x", "tile_y", "n_kept", "n_dropped", "bytes_kept"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64), err_msg=col)
    # budget invariants: kept bytes never exceed the budget; something
    # is dropped somewhere (the low-zoom tiles overflow by construction)
    assert (df["bytes_kept"] <= 2048).all()
    assert (df["n_dropped"] > 0).any()
    assert (df["n_kept"] > 0).all()  # cheapest feature always fits

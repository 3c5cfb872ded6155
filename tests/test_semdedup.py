"""SemDeDup census — oracle parity + keep-rule semantics."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF}/embeddings.parquet')"
    )
    return con


def test_semdedup_parity(ray_session):
    import __ray_entry__ as e
    from planetiler_ray.pipelines import training

    df = (training.q_semdedup(SF).to_pandas()
          .sort_values("vec_id", ignore_index=True))
    exp = (_con().execute(e.oracle_sql()["semdedup"]).fetchdf()
           .sort_values("vec_id", ignore_index=True))
    assert len(df) == len(exp) > 0
    for col in ["vec_id", "cluster", "n_dups"]:
        np.testing.assert_array_equal(
            df[col].to_numpy().astype(np.int64),
            exp[col].to_numpy().astype(np.int64))


def test_semdedup_keep_rule(ray_session):
    from planetiler_ray.pipelines import training

    df = training.q_semdedup(SF).to_pandas()
    orig = df[df.vec_id < 1_000_000]
    sib = df[df.vec_id >= 1_000_000].copy()
    # random unit vectors are near-orthogonal: every original is kept
    assert (orig["n_dups"] == 0).all()
    # zero-amplitude siblings (vec_id % 8 == 0) are exact duplicates of
    # their original; when co-clustered they MUST be flagged
    sib["base"] = sib["vec_id"] - 1_000_000
    zero_amp = sib[sib["base"] % 8 == 0]
    co = zero_amp.merge(orig[["vec_id", "cluster"]], left_on="base",
                        right_on="vec_id", suffixes=("", "_orig"))
    same = co[co["cluster"] == co["cluster_orig"]]
    assert len(same) > 0 and (same["n_dups"] >= 1).all()
    # max-amplitude siblings (base % 8 == 7, cos ~ 0.75 << 0.92) never flag
    far = sib[sib["base"] % 8 == 7]
    assert (far["n_dups"] == 0).all()
    # and the boundary is genuinely exercised: some siblings flagged,
    # some not
    assert 0 < (sib["n_dups"] > 0).sum() < len(sib)

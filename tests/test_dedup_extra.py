"""Connected-components clustering over near-dup pair Datasets."""

import numpy as np


def test_connected_components_chains_and_stars(ray_session):
    import ray.data

    from planetiler_ray.stages.dedup import connected_components

    # chain 1-2-3-4-5 (diameter 4), star 10-{11,12,13}, pair 20-21,
    # plus a bridge merging the star into the chain via 5-10
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (10, 12), (10, 13),
             (20, 21), (5, 10)]
    ds = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
    out = connected_components(ds).to_pandas().sort_values("node")
    comp = dict(zip(out["node"], out["comp"]))
    assert {comp[n] for n in (1, 2, 3, 4, 5, 10, 11, 12, 13)} == {1}
    assert comp[20] == comp[21] == 20
    assert len(comp) == 11


def test_connected_components_singleton_pairs(ray_session):
    import ray.data

    from planetiler_ray.stages.dedup import connected_components

    ds = ray.data.from_items([{"a": 7, "b": 3}])
    out = connected_components(ds).to_pandas()
    assert sorted(out["comp"]) == [3, 3]


def test_decontaminate_counts_probe_gram_positions(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import dedup

    # doc 0 (id % 97 == 0) supplies probe "alpha beta gamma"; doc 5 repeats
    # it twice, doc 6 contains it once mid-text, doc 7 is clean, doc 8 has
    # only 2 words (short-doc path).
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta"},
        {"doc_id": 5, "text": "alpha beta gamma x alpha beta gamma"},
        {"doc_id": 6, "text": "zz Alpha BETA gamma yy"},
        {"doc_id": 7, "text": "nothing to see here at all"},
        {"doc_id": 8, "text": "two words"},
    ]
    ds = ray.data.from_items(rows)
    probes = dedup.probe_gram_hashes(ds, k=3, mod=97)
    assert len(probes) == 1
    out = (
        dedup.decontaminate(ds, ray.put(probes), k=3)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    assert out.loc[0, "n_hits"] == 1 and bool(out.loc[0, "contaminated"])
    assert out.loc[5, "n_hits"] == 2
    assert out.loc[6, "n_hits"] == 1  # case-insensitive token grammar
    assert out.loc[7, "n_hits"] == 0 and not bool(out.loc[7, "contaminated"])
    assert out.loc[8, "n_hits"] == 0


def test_pq_topk_recall_vs_brute(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import ann

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    df = embs.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q_ids = df["vec_id"].to_numpy()[:8]
    q_mat = mat[:8]
    handle = ray.put((q_ids, q_mat))
    brute = ann.brute_topk(embs, handle, k=5).to_pandas()
    books = ann.train_pq(mat, n_subspaces=8, n_codes=64)
    pq = ann.pq_topk(embs, handle, ray.put(books), k=5).to_pandas()
    # recall@5 of the ADC+rescore scan vs exact cosine
    hits = 0
    for qid in q_ids:
        b = set(brute[brute.query_id == qid]["neighbor_id"])
        p = set(pq[pq.query_id == qid]["neighbor_id"])
        hits += len(b & p)
    recall = hits / (5 * len(q_ids))
    assert recall >= 0.7, recall
    # rescored sims are exact, so any candidate ALSO in brute's top-k keeps
    # identical rank ordering within the intersection
    assert set(pq.columns) == {"query_id", "rank", "neighbor_id"}


def test_pq_encode_roundtrip_distortion(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import ann

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    df = embs.to_pandas()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    books = ann.train_pq(mat, n_subspaces=8, n_codes=64)
    out = ann.pq_encode(embs, ray.put(books)).to_pandas()
    assert len(out) == len(df)
    code = np.frombuffer(b"".join(out["pq_code"]), np.uint8).reshape(-1, 8)
    # reconstruct and check mean cosine(orig, recon) is high
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = out["vec_id"].to_numpy().argsort()
    code = code[order][df["vec_id"].to_numpy().argsort().argsort()]
    recon = np.concatenate(
        [books[s][code[:, s]] for s in range(8)], axis=1
    )
    recon /= np.maximum(np.linalg.norm(recon, axis=1, keepdims=True), 1e-12)
    cos = (norm * recon).sum(axis=1)
    assert cos.mean() > 0.8, cos.mean()


def test_hll_estimate_accuracy(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import sketch

    # two groups with known cardinalities 10_000 and 500; rows repeat
    # values (HLL must be insensitive to multiplicity)
    rng = np.random.default_rng(11)
    rows_a = rng.integers(0, 10_000, size=30_000)
    rows_b = rng.integers(50_000, 50_500, size=5_000)
    import pandas as pd

    df = pd.DataFrame(
        {
            "g": ["a"] * len(rows_a) + ["b"] * len(rows_b),
            "v": np.concatenate([rows_a, rows_b]).astype(np.int64),
        }
    )
    true_a = len(np.unique(rows_a))
    true_b = len(np.unique(rows_b))
    ds = ray.data.from_pandas(df)
    regs = sketch.hll_registers(ds, "g", "v", p=8).to_pandas()
    est = sketch.hll_estimate(regs, "g", p=8).set_index("g")["estimate"]
    assert abs(est["a"] - true_a) / true_a < 0.15, (est["a"], true_a)
    assert abs(est["b"] - true_b) / true_b < 0.15, (est["b"], true_b)


def test_hll_register_merge_is_max(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from planetiler_ray.stages import sketch

    # the sketch of a union equals the register-wise max of the parts
    v1 = np.arange(0, 4000, dtype=np.int64)
    v2 = np.arange(2000, 6000, dtype=np.int64)
    d1 = pd.DataFrame({"g": "x", "v": v1})
    d2 = pd.DataFrame({"g": "x", "v": v2})
    r1 = sketch.hll_registers(ray.data.from_pandas(d1), "g", "v").to_pandas()
    r2 = sketch.hll_registers(ray.data.from_pandas(d2), "g", "v").to_pandas()
    ru = sketch.hll_registers(
        ray.data.from_pandas(pd.concat([d1, d2])), "g", "v"
    ).to_pandas()
    merged = (
        pd.concat([r1, r2])
        .groupby(["g", "register"], as_index=False)["max_rho"]
        .max()
    )
    a = ru.sort_values(["register"], ignore_index=True)[["register", "max_rho"]]
    b = merged.sort_values(["register"], ignore_index=True)[["register", "max_rho"]]
    assert a.equals(b)


def test_pagerank_uniform_on_ring(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from planetiler_ray.stages.graph import pagerank_int

    # ring graph: every node has in-degree == out-degree == 1 -> PageRank
    # is exactly uniform at every iteration (integer arithmetic included)
    n = 64
    e = pd.DataFrame({"src": np.arange(n), "dst": (np.arange(n) + 1) % n})
    out = pagerank_int(ray.data.from_pandas(e), n_nodes=n, iters=4)
    assert out["rank"].nunique() == 1
    r = out["rank"].iloc[0]
    scale = 10**9
    base = (scale // n * 15) // 100
    assert r == base + 85 * (scale // n) // 100


def test_pagerank_sink_attracts_mass(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from planetiler_ray.stages.graph import pagerank_int

    # star: all nodes point at node 0 -> node 0's rank dominates
    n = 32
    e = pd.DataFrame({"src": np.arange(1, n), "dst": np.zeros(n - 1, np.int64)})
    out = pagerank_int(ray.data.from_pandas(e), n_nodes=n, iters=5).set_index("node_id")
    assert out.loc[0, "rank"] > 10 * out.loc[1, "rank"]

def test_kmeans_assign_ties_and_exactness(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import ann

    # two IDENTICAL centroids: ties must go to the smaller centroid id
    cent = ann.quantize_embedding(np.array([[0.5, 0.5], [0.5, 0.5],
                                            [-1.0, -1.0]]))
    ds = ray.data.from_items(
        [{"vec_id": i, "embedding": v}
         for i, v in enumerate([[0.5, 0.5], [-0.9, -0.9], [0.0, 0.0]])]
    )
    out = (ann.kmeans_assign(ds, cent).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert out["cluster"].tolist() == [0, 2, 0]
    assert out.loc[0, "dist2"] == 0
    # dist2 is the exact integer squared distance
    q = ann.quantize_embedding(np.array([[-0.9, -0.9]]))[0]
    assert out.loc[1, "dist2"] == ((q - cent[2]) ** 2).sum()


def test_ivf_exact_full_probe_equals_brute(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import ann

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    df = embs.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = ann.quantize_embedding(np.stack(df["embedding"].to_numpy()))
    ids = df["vec_id"].to_numpy()
    k_cent, nq, k = 4, 3, 5
    # probing EVERY list makes IVF exhaustive: must equal the integer brute
    # top-k (ties on smaller vec_id)
    out = ann.ivf_exact_topk(embs, mat[:k_cent], ids[k_cent:k_cent + nq],
                             mat[k_cent:k_cent + nq], k=k,
                             n_probe=k_cent).to_pandas()
    for j in range(nq):
        qid = ids[k_cent + j]
        d2 = ((mat - mat[k_cent + j]) ** 2).sum(axis=1)
        keep = ids != qid
        order = np.lexsort((ids[keep], d2[keep]))[:k]
        expect = ids[keep][order]
        got = out[out.query_id == qid].sort_values("rank")["neighbor_id"]
        assert got.tolist() == expect.tolist()

def test_triangle_count_known_graphs(ray_session):
    import ray.data

    from planetiler_ray.stages.graph import triangle_count

    # K4 on {0,1,2,3} (4 triangles) + square 4-5-6-7 with diagonal 4-6
    # (2 triangles) + dangling edge 7-8 (0); duplicate/reversed edges and
    # a self-loop must be canonicalized away
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (4, 5), (5, 6), (6, 7), (7, 4), (4, 6), (6, 4), (5, 4),
             (7, 8), (8, 8)]
    ds = ray.data.from_items([{"src": a, "dst": b} for a, b in edges])
    out = triangle_count(ds, n_nodes=9)
    assert out["n_triangles"].iloc[0] == 6
    assert out["n_edges"].iloc[0] == 12

def test_mutual_nn_matches_numpy_reference(ray_session):
    import numpy as np
    import ray

    from planetiler_ray.stages import ann

    sf = "/root/testdata/sf0.001"
    embs = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                 columns=["vec_id", "embedding"])
    df = embs.to_pandas().sort_values("vec_id").reset_index(drop=True)
    mat = ann.quantize_embedding(np.stack(df["embedding"].to_numpy()))
    ids = df["vec_id"].to_numpy()
    k_cent = 4
    cq = mat[:k_cent]
    out = ann.mutual_nn(embs, cq).to_pandas().sort_values(["a", "b"])
    # numpy reference: same assignment, per-cell NN, both-directions check
    d2c = ((mat[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
    cell = d2c.argmin(axis=1)
    nn = {}
    for c in range(k_cent):
        m = np.flatnonzero(cell == c)
        if len(m) < 2:
            continue
        sub = mat[m]
        d2 = ((sub[:, None, :] - sub[None, :, :]) ** 2).sum(axis=2)
        np.fill_diagonal(d2, np.iinfo(np.int64).max)
        j = d2.argmin(axis=1)  # ids[m] ascending -> ties to smaller id
        for i in range(len(m)):
            nn[ids[m[i]]] = (ids[m[j[i]]], d2[i, j[i]])
    expect = sorted(
        (min(v, u), max(v, u), d) for v, (u, d) in nn.items()
        if nn.get(u, (None,))[0] == v and v < u
    )
    got = list(zip(out["a"], out["b"], out["dist2"]))
    assert got == expect and len(expect) > 0


def test_ks_drift_oracle_parity(ray_session):
    """Engine vs DuckDB twin at sf0.001 — integer-exact KS numerators."""
    import duckdb

    from planetiler_ray import oracle
    from planetiler_ray.pipelines import training

    sf = "/root/testdata/sf0.001"
    eng = (training.q_ks_drift(sf).to_pandas()
           .sort_values(["src_a", "src_b"], ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    ora = con.execute(oracle.sql_ks_drift()).fetchdf()
    assert eng["d_num"].tolist() == ora["d_num"].astype("int64").tolist()
    assert eng["n_a"].tolist() == ora["n_a"].astype("int64").tolist()
    # KS scaled-D is bounded by n_a * n_b and positive for distinct sources
    assert ((eng["d_num"] >= 0) & (eng["d_num"] <= eng["n_a"] * eng["n_b"])).all()


def test_chi2_cells_oracle_parity(ray_session):
    import duckdb

    from planetiler_ray import oracle
    from planetiler_ray.pipelines import training

    sf = "/root/testdata/sf0.001"
    eng = (training.q_chi2_cells(sf).to_pandas()
           .sort_values(["lang", "source"], ignore_index=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    ora = con.execute(oracle.sql_chi2_cells()).fetchdf()
    for c in ["n", "row_n", "col_n", "total_n", "dev"]:
        assert eng[c].tolist() == ora[c].astype("int64").tolist(), c
    # margins reconstruct from the present cells exactly
    assert (eng["n"].groupby(eng["lang"]).transform("sum")
            == eng["row_n"]).all()
    assert int(eng["n"].sum()) == int(eng["total_n"].iloc[0])

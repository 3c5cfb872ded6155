"""WebDataset tar sink/source round trip + resumability."""

import os

import pandas as pd


def test_webdataset_roundtrip_and_resume(ray_session, tmp_path):
    import ray

    from planetiler_ray.sinks.webdataset import read_webdataset, write_webdataset

    df = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": [f"document number {i} body" for i in range(100)],
            "lang": [["en", "fr", "de"][i % 3] for i in range(100)],
        }
    )
    out = str(tmp_path / "wds")
    ds = ray.data.from_pandas(df)
    m1 = write_webdataset(ds, out, n_shards=8, meta_cols=("lang",)).to_pandas()
    assert m1["n_samples"].sum() == 100
    assert not m1["skipped"].any()
    tars = [f for f in os.listdir(out) if f.endswith(".tar")]
    assert len(tars) == len(m1)

    back = read_webdataset(out, meta_cols=("lang",)).to_pandas()
    back = back.sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(back, df[["doc_id", "text", "lang"]])

    # re-run: every shard has a manifest -> all skipped, tars untouched
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in tars}
    m2 = write_webdataset(ds, out, n_shards=8, meta_cols=("lang",)).to_pandas()
    assert m2["skipped"].all()
    assert m2["n_samples"].sum() == 100
    for f in tars:
        assert os.path.getmtime(os.path.join(out, f)) == mtimes[f]


def test_corpus_cli_stats_and_wds(tmp_path):
    """CLI smoke: corpus stats + wds export run in a fresh process (the
    CLI owns its own Ray session)."""
    import json
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "planetiler_ray", "corpus", "stats",
         "--sf", "/root/testdata/sf0.001", "--cpus", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["n_docs"] == 500 and out["total_chars"] > 0

    wds_dir = str(tmp_path / "wds")
    r2 = subprocess.run(
        [sys.executable, "-m", "planetiler_ray", "corpus", "wds",
         "--sf", "/root/testdata/sf0.001", "--out", wds_dir,
         "--shards", "4", "--cpus", "2"],
        capture_output=True, text=True, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-800:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["samples"] == 500 and out2["shards"] == 4

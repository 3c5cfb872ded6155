"""Mid-build KILL + resume proof for the bucket-manifest lineage story
(BASELINE.json north rule; reference analogue ``--reuse_featuredb``,
``Planetiler.java:862-979``): a flagship shard build is SIGKILLed after N
buckets committed their atomic manifests; the resumed build must skip
exactly those buckets (no re-execution) and the final archive must be
byte-identical to a clean single-run build."""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

SF = "/root/testdata/sf0.001"
ZOOMS = [0, 2, 4, 6]
N_BUCKETS = 16

_CHILD = r"""
import sys, time
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False,
         logging_level="ERROR")
import planetiler_ray.sinks.files as F

# slow each bucket down so the parent can kill us mid-build
_orig = F.make_assemble_write_bucket

def slow(profile, out_dir, lineage=None, layout="files"):
    f = _orig(profile, out_dir, lineage, layout)
    def g(group):
        time.sleep(0.5)
        return f(group)
    return g

F.make_assemble_write_bucket = slow
from planetiler_ray.pipelines import flagship
flagship.build_archive(sys.argv[1], sys.argv[2], zooms=[0, 2, 4, 6],
                       n_buckets=16, layout="shard")
"""


@pytest.mark.timeout(300)
def test_sigkill_mid_build_then_resume(ray_session, tmp_path):
    out = str(tmp_path / "killed")
    ref = str(tmp_path / "clean")
    mdir = os.path.join(out, "_manifest")

    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # child owns its own local Ray
    proc = subprocess.Popen(
        [sys.executable, "-c", _CHILD, SF, out],
        cwd="/root/repo", env=env, start_new_session=True,
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            done = len(os.listdir(mdir)) if os.path.isdir(mdir) else 0
            if done >= 3:
                break
            if proc.poll() is not None:
                break
            time.sleep(0.05)
        # hard kill of the whole process group (driver + raylet + workers)
        # — no cleanup, no atexit, exactly a node death
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)
    finally:
        proc.wait()
    # wait for the manifest dir to go quiescent (a worker mid-rename can
    # still land a manifest in the instant around the kill; the on-disk
    # state at RESUME time is what the contract is about)
    prev = -1
    for _ in range(40):
        cur = len(os.listdir(mdir)) if os.path.isdir(mdir) else 0
        if cur == prev:
            break
        prev = cur
        time.sleep(0.25)
    pre_done = sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []
    if not pre_done or len(pre_done) >= N_BUCKETS:
        pytest.skip(f"kill window missed ({len(pre_done)} buckets done)")

    pre_stat = {}
    for m in pre_done:
        b = json.load(open(os.path.join(mdir, m)))
        shard = os.path.join(out, "shards", b["shard"])
        st = os.stat(shard)
        pre_stat[b["bucket"]] = (st.st_mtime_ns, st.st_size)

    # resume in-process (the surviving cluster re-runs the same job)
    from planetiler_ray.pipelines import flagship

    df = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=N_BUCKETS,
                                layout="shard")
    done_buckets = set(pre_stat)
    skipped = set(df[df.skipped].bucket.tolist())
    assert skipped == done_buckets  # completed work skipped, nothing else
    # completed shards untouched (no re-execution, not even a rewrite)
    for b, (mt, size) in pre_stat.items():
        st = os.stat(os.path.join(out, "shards", f"bucket_{b}.parquet"))
        assert (st.st_mtime_ns, st.st_size) == (mt, size)
    # no stray temp files survive the resume
    assert not [f for f in os.listdir(os.path.join(out, "shards"))
                if f.endswith(".tmp")]

    # final archive byte-identical to a clean single-run build
    flagship.build_archive(SF, ref, zooms=ZOOMS, n_buckets=N_BUCKETS,
                           layout="shard")
    shards = sorted(os.listdir(os.path.join(out, "shards")))
    assert shards == sorted(os.listdir(os.path.join(ref, "shards")))
    for s in shards:
        a = open(os.path.join(out, "shards", s), "rb").read()
        b = open(os.path.join(ref, "shards", s), "rb").read()
        assert a == b, f"shard {s} differs after kill+resume"


def test_stray_tmp_shard_is_rebuilt(ray_session, tmp_path):
    """A kill DURING a shard write leaves bucket_N.parquet.tmp and no
    manifest — resume must rebuild that bucket cleanly."""
    from planetiler_ray.pipelines import flagship

    out = str(tmp_path / "a")
    df = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=N_BUCKETS,
                                layout="shard")
    victim = int(df.bucket.iloc[0])
    mpath = os.path.join(out, "_manifest", f"bucket_{victim}.json")
    spath = os.path.join(out, "shards", f"bucket_{victim}.parquet")
    good = open(spath, "rb").read()
    os.remove(mpath)
    os.remove(spath)
    with open(spath + ".tmp", "wb") as f:
        f.write(b"garbage-from-killed-writer")
    df2 = flagship.build_archive(SF, out, zooms=ZOOMS, n_buckets=N_BUCKETS,
                                 layout="shard")
    rebuilt = df2[~df2.skipped]
    assert rebuilt.bucket.tolist() == [victim]
    assert open(spath, "rb").read() == good

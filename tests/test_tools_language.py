"""Archive compare/verify tools + language utils tests."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_language_utils():
    from planetiler_ray.functions import language as L

    s = pd.Series(["Paris", "Zürich", "Москва", "東京"])
    lat = L.is_latin(s)
    assert lat.tolist() == [True, True, False, False]
    tr = L.transliterate(pd.Series(["Zürich", "café"]))
    assert tr.tolist() == ["Zurich", "cafe"]
    out = L.latin_name(s, pd.Series([None, None, "Moscow", None]))
    assert out.tolist()[0] == "Paris"
    assert out.tolist()[2] == "Moscow"
    assert L.valid_name_key("name:en") and L.valid_name_key("name:zh-Hant")
    assert not L.valid_name_key("name") and not L.valid_name_key("name:xyz123")


def test_translation_joiner(ray_session):
    import pyarrow as pa
    import ray

    from planetiler_ray.functions.language import TranslationJoiner

    handle = ray.put({1: {"en": "One", "de": "Eins"}, 2: {"en": "Two"}})
    j = TranslationJoiner(handle, ["en", "de"], key_col="qid")
    batch = pa.table({"qid": [1, 2, 3, None]})
    out = j(batch)
    assert out.column("name_en").to_pylist() == ["One", "Two", None, None]
    assert out.column("name_de").to_pylist() == ["Eins", None, None, None]


def test_compare_and_verify_archives(ray_session, tmp_path):
    from planetiler_ray.pipelines import flagship
    from planetiler_ray.tools import compare_archives, verify_archive

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    flagship.build_archive(SF, a, zooms=[2, 4], n_buckets=16)
    flagship.build_archive(SF, b, zooms=[2, 4], n_buckets=16)
    res = compare_archives(a, b)
    assert res.identical and res.n_match == res.n_a == res.n_b > 0
    v = verify_archive(a)
    assert v["n_tiles"] == res.n_a and set(v["by_zoom"]) == {2, 4}
    # shard layout comparable against files layout
    c = str(tmp_path / "c")
    flagship.build_archive(SF, c, zooms=[2, 4], n_buckets=16, layout="shard")
    res2 = compare_archives(a, c)
    assert res2.identical


def test_cli_compare_exit_codes(ray_session, tmp_path):
    """CLI compare: exit 0 on identical archives, 1 on diff."""
    import subprocess
    import sys

    from planetiler_ray.pipelines import flagship

    a = str(tmp_path / "ca")
    b = str(tmp_path / "cb")
    flagship.build_archive(SF, a, zooms=[2], n_buckets=8)
    flagship.build_archive(SF, b, zooms=[2], n_buckets=8)
    r = subprocess.run([sys.executable, "-m", "planetiler_ray", "compare",
                        "--a", a, "--b", b], capture_output=True, text=True,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-500:]
    # mutate one tile -> exit 1
    import os

    zdir = os.path.join(b, "2")
    xdir = os.path.join(zdir, os.listdir(zdir)[0])
    victim = os.path.join(xdir, os.listdir(xdir)[0])
    with open(victim, "ab") as f:
        f.write(b"x")
    r2 = subprocess.run([sys.executable, "-m", "planetiler_ray", "compare",
                         "--a", a, "--b", b], capture_output=True, text=True,
                        cwd="/root/repo")
    assert r2.returncode == 1

"""URL canonicalizer kernel + containment metric unit coverage."""

import pyarrow as pa

from planetiler_ray.pipelines.webgeo import canonicalize_urls


def _canon(urls):
    return canonicalize_urls(pa.array(urls, pa.string())).to_pylist()


def test_canonicalize_rules():
    assert _canon([
        "HTTPS://Example.COM:443/p/1/?utm_source=a&utm_campaign=b#frag",
        "http://HOST.com:80/a?x=1&utm_ref=z&y=2",
        "https://h.com/p/2?utm_a=1&keep=2",
        "https://h.com/p/3?keep=1&utm_tail=9",
        "https://h.com/p/4?utm_only=1",
        "https://h.com/deep/path/",
        "https://h.com/UPPER/Path",       # path case preserved
        "https://h.com:8443/x",           # non-default port kept
        "not-a-url",                      # passthrough (no prefix match)
    ]) == [
        "https://example.com/p/1",
        "http://host.com/a?x=1&y=2",
        "https://h.com/p/2?keep=2",
        "https://h.com/p/3?keep=1",
        "https://h.com/p/4",
        "https://h.com/deep/path",
        "https://h.com/UPPER/Path",
        "https://h.com:8443/x",
        "not-a-url",
    ]


def test_canonicalize_idempotent():
    once = _canon(["HTTPS://A.COM:443/p/9/?utm_x=1#f", "https://a.com/p"])
    assert _canon(once) == once


def test_containment_vs_jaccard(ray_session):
    import ray

    from planetiler_ray.stages import dedup

    # doc 2's tokens are a strict subset of doc 1's: containment = 1.0,
    # Jaccard = 3/6 = 0.5
    ds = ray.data.from_items([
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 2, "text": "alpha beta gamma"},
    ])
    cont = dedup.jaccard_pairs(ds, threshold=0.9, metric="containment").to_pandas()
    assert len(cont) == 1 and int(cont["c1000"].iloc[0]) == 1000
    jac = dedup.jaccard_pairs(ds, threshold=0.9).to_pandas()
    assert len(jac) == 0

"""WARC reader/writer — record codec, CDX slab planning, Ray round trip."""

import numpy as np

from planetiler_ray.sources import warc


def test_record_roundtrip():
    html = b"<html><body>caf\xc3\xa9 & <x>1</x></body></html>"
    raw = warc.build_record("https://a.com/p/1", 1_700_000_000_123_456,
                            "fr", html)
    url, ts, lang, body = warc.parse_record(raw)
    assert url == "https://a.com/p/1"
    assert ts == 1_700_000_000_123_456
    assert lang == "fr"
    assert body == html


def test_shard_write_read(tmp_path):
    path = str(tmp_path / "s.warc.gz")
    urls = [f"https://h.com/{i}" for i in range(7)]
    ts = [1_000_000 * i for i in range(7)]
    langs = ["en", "fr", "de", "es", "it", "pt", "nl"]
    htmls = [f"<html>doc {i} ☃</html>".encode() for i in range(7)]
    n = warc.write_warc_shard(path, urls, ts, langs, htmls)
    assert n == 7
    entries = warc.read_cdx(path)
    assert [e[0] for e in entries] == urls
    # every record decompresses independently from its CDX byte range
    tab = warc._decode_slab(path, entries[3][1], entries[3][2])
    assert tab.column("url").to_pylist() == [urls[3]]
    assert tab.column("html").to_pylist() == [htmls[3]]
    # a multi-record slab walks the gzip member chain
    start = entries[2][1]
    end = entries[5][1] + entries[5][2]
    tab = warc._decode_slab(path, start, end - start)
    assert tab.column("url").to_pylist() == urls[2:6]
    assert tab.column("lang").to_pylist() == langs[2:6]


def test_warc_pages_ds(ray_session, tmp_path):
    path = str(tmp_path / "s.warc.gz")
    urls = [f"https://h.com/{i}" for i in range(40)]
    warc.write_warc_shard(
        path, urls, [0] * 40, ["en"] * 40,
        [f"<html>{i}</html>".encode() for i in range(40)])
    ds = warc.warc_pages_ds([path], slab_records=16)  # 3 slabs
    df = ds.to_pandas().sort_values("url", ignore_index=True)
    assert len(df) == 40
    assert sorted(df["url"]) == sorted(urls)
    assert df["warc_ts"].dtype == np.dtype("datetime64[us]")


def test_warc_pages_ds_empty(ray_session, tmp_path):
    path = str(tmp_path / "e.warc.gz")
    warc.write_warc_shard(path, [], [], [], [])
    ds = warc.warc_pages_ds([path])
    assert ds.count() == 0


def test_wet_roundtrip(ray_session, tmp_path):
    path = str(tmp_path / "s.wet.gz")
    urls = [f"https://h.com/{i}" for i in range(9)]
    texts = [f"doc {i} — café ☃\nline2" for i in range(9)]
    n = warc.write_wet_shard(path, urls, [42_000_000] * 9, ["fr"] * 9, texts)
    assert n == 9
    df = warc.wet_text_ds([path], slab_records=4).to_pandas().sort_values(
        "url", ignore_index=True)
    assert df["text"].tolist() == [t for _, t in sorted(zip(urls, texts))]
    assert (df["lang"] == "fr").all()


def test_wet_record_codec():
    raw = warc.build_conversion_record("https://x.com/a", 7, "de", "hällo\n")
    url, ts, lang, text = warc.parse_conversion_record(raw)
    assert (url, ts, lang, text) == ("https://x.com/a", 7, "de", "hällo\n")

"""Hand-rolled WARC 1.0 reader/writer (ISO 28500 — Common Crawl's container).

The input_hint's pages table is "Common-Crawl-style"; the real Common
Crawl ships as sharded ``.warc.gz`` files, so this module closes the
same source-format gap for web pages that ``sources/osmpbf.py`` closes
for OSM — re-implemented from the PUBLIC spec (ISO 28500 / the WARC 1.0
format; cf. the reference's reader-per-format surface,
``reader/osm/OsmInputFile.java`` for the pattern), no external library.

Layout mirrors Common Crawl exactly:

* each WARC record is its OWN gzip member, so any record decompresses
  independently from a byte range;
* every ``.warc.gz`` shard has a sidecar ``.cdx`` index line per record
  (``url offset length ts_us lang``) — the crawl-scale random-access
  contract (CC publishes exactly such CDX indexes);
* the Ray reader plans work from the tiny CDX files driver-side (one
  small read per shard) and fans record slabs out via
  ``from_items -> map_batches`` — streaming, resumable per shard, no
  driver-side content.

Record wire format (response records)::

    WARC/1.0\r\n
    WARC-Type: response\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: <iso8601>\r\n
    WARC-Identified-Content-Language: <lang>\r\n
    Content-Type: application/http; msgtype=response\r\n
    Content-Length: <n>\r\n
    \r\n
    HTTP/1.1 200 OK\r\n...\r\n\r\n<html bytes>
    \r\n\r\n
"""

from __future__ import annotations

import gzip
import os
import zlib

import numpy as np
import pyarrow as pa

_EPOCH_ISO = np.datetime64("1970-01-01T00:00:00", "us")


def _iso8601(ts_us: int) -> str:
    # WARC 1.1-style timestamp: fractional seconds kept when present
    s = str(_EPOCH_ISO + np.timedelta64(int(ts_us), "us"))
    if s.endswith(".000000"):
        s = s[:-7]
    return s + "Z"


def _parse_iso8601_us(s: str) -> int:
    return int(
        (np.datetime64(s.rstrip("Z"), "us") - _EPOCH_ISO)
        // np.timedelta64(1, "us")
    )


def build_record(url: str, ts_us: int, lang: str, html: bytes) -> bytes:
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n" + html
    )
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_iso8601(ts_us)}\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def parse_record(raw: bytes) -> tuple[str, int, str, bytes]:
    """One decompressed WARC record -> (url, ts_us, lang, html bytes)."""
    hdr_end = raw.index(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in raw[:hdr_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b": ")
        headers[k.decode().lower()] = v.decode()
    clen = int(headers["content-length"])
    http = raw[hdr_end + 4 : hdr_end + 4 + clen]
    body_off = http.index(b"\r\n\r\n") + 4
    return (
        headers["warc-target-uri"],
        _parse_iso8601_us(headers["warc-date"]),
        headers.get("warc-identified-content-language", ""),
        http[body_off:],
    )


def write_warc_shard(path: str, urls, ts_us, langs, htmls) -> int:
    """Write one CC-layout shard: per-record gzip members + ``.cdx``
    sidecar (``url\\toffset\\tlength\\tts_us\\tlang``).  Returns the
    record count.  mtime=0 in the gzip header keeps shard bytes
    deterministic for a given content."""
    cdx_lines = []
    off = 0
    with open(path, "wb") as f:
        for url, ts, lang, html in zip(urls, ts_us, langs, htmls):
            member = gzip.compress(
                build_record(str(url), int(ts), str(lang), bytes(html)),
                mtime=0,
            )
            f.write(member)
            cdx_lines.append(f"{url}\t{off}\t{len(member)}\t{int(ts)}\t{lang}")
            off += len(member)
    with open(path + ".cdx", "w") as f:
        f.write("\n".join(cdx_lines) + ("\n" if cdx_lines else ""))
    return len(cdx_lines)


def read_cdx(path: str) -> list[tuple[str, int, int, int, str]]:
    out = []
    with open(path + ".cdx") as f:
        for line in f:
            if not line.strip():
                continue
            url, off, ln, ts, lang = line.rstrip("\n").split("\t")
            out.append((url, int(off), int(ln), int(ts), lang))
    return out


def _decode_slab(path: str, offset: int, length: int) -> pa.Table:
    """Decompress + parse the gzip members in one contiguous byte range.
    Records are independent members, so a slab boundary never splits a
    decompression context (zlib's ``unused_data`` walks member chains)."""
    with open(path, "rb") as f:
        f.seek(offset)
        buf = f.read(length)
    urls, tss, langs, htmls = [], [], [], []
    pos = 0
    while pos < len(buf):
        d = zlib.decompressobj(wbits=31)
        raw = d.decompress(buf[pos:])
        consumed = len(buf) - pos - len(d.unused_data)
        pos += consumed
        url, ts, lang, html = parse_record(raw)
        urls.append(url)
        tss.append(ts)
        langs.append(lang)
        htmls.append(html)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.array(tss, dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "lang": pa.array(langs, pa.string()),
            "html": pa.array(htmls, pa.binary()),
        }
    )


def warc_pages_ds(paths: list[str], slab_records: int = 512):
    """Sharded ``.warc.gz`` -> Dataset(url, warc_ts, lang, html).

    Driver work is O(#records) tiny CDX text (no page content); decode
    fans out one task per ~``slab_records`` contiguous records.  A slab
    is a single seek+read+inflate pass — the same slab discipline as the
    PBF blob reader."""
    import ray

    items = []
    for p in paths:
        entries = read_cdx(p)
        for i in range(0, len(entries), slab_records):
            chunk = entries[i : i + slab_records]
            start = chunk[0][1]
            end = chunk[-1][1] + chunk[-1][2]
            items.append({"path": p, "offset": start, "length": end - start})
    if not items:  # empty corpus: preserve the schema
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "warc_ts": pa.array([], pa.timestamp("us")),
             "lang": pa.array([], pa.string()),
             "html": pa.array([], pa.binary())}))

    def decode(batch: pa.Table) -> pa.Table:
        tabs = [
            _decode_slab(p, o, ln)
            for p, o, ln in zip(
                batch.column("path").to_pylist(),
                batch.column("offset").to_pylist(),
                batch.column("length").to_pylist(),
            )
        ]
        return pa.concat_tables(tabs)

    return ray.data.from_items(items).map_batches(
        decode, batch_format="pyarrow", batch_size=1
    )


# ------------------------------------------------------------- WET side --

def build_conversion_record(url: str, ts_us: int, lang: str,
                            text: str) -> bytes:
    """WET-style ``conversion`` record: the extracted plain text of a page
    (what Common Crawl publishes as ``.warc.wet.gz``)."""
    body = text.encode()
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_iso8601(ts_us)}\r\n"
        f"WARC-Identified-Content-Language: {lang}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return head + body + b"\r\n\r\n"


def parse_conversion_record(raw: bytes) -> tuple[str, int, str, str]:
    hdr_end = raw.index(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in raw[:hdr_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b": ")
        headers[k.decode().lower()] = v.decode()
    clen = int(headers["content-length"])
    return (
        headers["warc-target-uri"],
        _parse_iso8601_us(headers["warc-date"]),
        headers.get("warc-identified-content-language", ""),
        raw[hdr_end + 4 : hdr_end + 4 + clen].decode(),
    )


def write_wet_shard(path: str, urls, ts_us, langs, texts) -> int:
    """CC-layout WET shard: per-record gzip members + ``.cdx`` sidecar."""
    cdx_lines = []
    off = 0
    with open(path, "wb") as f:
        for url, ts, lang, text in zip(urls, ts_us, langs, texts):
            member = gzip.compress(
                build_conversion_record(str(url), int(ts), str(lang),
                                        str(text)), mtime=0)
            f.write(member)
            cdx_lines.append(f"{url}\t{off}\t{len(member)}\t{int(ts)}\t{lang}")
            off += len(member)
    with open(path + ".cdx", "w") as f:
        f.write("\n".join(cdx_lines) + ("\n" if cdx_lines else ""))
    return len(cdx_lines)


def wet_text_ds(paths: list[str], slab_records: int = 512):
    """Sharded ``.wet.gz`` -> Dataset(url, warc_ts, lang, text)."""
    import ray

    items = []
    for p in paths:
        entries = read_cdx(p)
        for i in range(0, len(entries), slab_records):
            chunk = entries[i : i + slab_records]
            start = chunk[0][1]
            end = chunk[-1][1] + chunk[-1][2]
            items.append({"path": p, "offset": start, "length": end - start})
    if not items:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "warc_ts": pa.array([], pa.timestamp("us")),
             "lang": pa.array([], pa.string()),
             "text": pa.array([], pa.string())}))

    def decode(batch: pa.Table) -> pa.Table:
        urls, tss, langs, texts = [], [], [], []
        for p, o, ln in zip(batch.column("path").to_pylist(),
                            batch.column("offset").to_pylist(),
                            batch.column("length").to_pylist()):
            with open(p, "rb") as f:
                f.seek(o)
                buf = f.read(ln)
            pos = 0
            while pos < len(buf):
                d = zlib.decompressobj(wbits=31)
                raw = d.decompress(buf[pos:])
                pos += len(buf) - pos - len(d.unused_data)
                url, ts, lang, text = parse_conversion_record(raw)
                urls.append(url)
                tss.append(ts)
                langs.append(lang)
                texts.append(text)
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "warc_ts": pa.array(np.array(tss, dtype="datetime64[us]"),
                                 pa.timestamp("us")),
             "lang": pa.array(langs, pa.string()),
             "text": pa.array(texts, pa.string())})

    return ray.data.from_items(items).map_batches(
        decode, batch_format="pyarrow", batch_size=1)

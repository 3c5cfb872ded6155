"""Deterministic Common-Crawl-style `pages` synthesis + the FROZEN extractor.

The engine's primary input (BASELINE.json input_hint) is a Parquet table of
web pages ``(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``.  No such table ships in the sandbox, so we synthesize it
deterministically FROM the ``documents`` table of each sf dir: every
``doc_id`` yields one page whose text embeds 0..3 coordinate mentions (plus a
skew "hot spot" cluster and non-parsing decoys) computed by *pure integer
arithmetic on doc_id* — which lets the DuckDB oracle reconstruct the exact
same rows independently (see ``planetiler_ray.oracle``).

The per-row invariant required by BASELINE.json: ``extract_text(html)`` must
be byte-identical to the page ``text`` for every url — the html wraps the
text in boilerplate + entity escaping, and :func:`extract_text_series`
recovers it exactly.

Everything here is vectorized (pandas string kernels) and stateless — used
inside ``map_batches`` over the documents Dataset.

Coordinate mention model (all integers are millidegrees):
  n_mentions  = doc_id % 4
  lat_mdeg(j) = (doc_id * 9973 + j * 6151) % 170000 - 85000     # [-85, 85)
  lon_mdeg(j) = (doc_id * 7919 + j * 4817) % 360000 - 180000    # [-180, 180)
  style(j)    = j % 2   (0: "(lat, lon)"   1: "lat L lon M")
  hot mention (doc_id % 10 == 0, appended after the j mentions, Paris area):
  lat_mdeg    = 48800 + doc_id % 100
  lon_mdeg    = 2300 + doc_id % 97
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

LAT_MULT, LAT_STEP, LAT_MOD, LAT_OFF = 9973, 6151, 170000, 85000
LON_MULT, LON_STEP, LON_MOD, LON_OFF = 7919, 4817, 360000, 180000
HOT_EVERY = 10
HOT_LAT_BASE, HOT_LAT_MOD = 48800, 100
HOT_LON_BASE, HOT_LON_MOD = 2300, 97

DECOY_SUFFIX = (
    " Price: 95.123, 200.456 USD."
    " Not places: (95.123, 200.456) nor lat 12.345 lon 199.999."
)

_HTML_HEAD = (
    '<html><head><meta charset="utf-8"><title>Page %d</title></head>'
    "<body><nav>home | about | contact</nav><article>"
)
_HTML_TAIL = '</article><script>var trk="%s";</script><footer>(c) example</footer></body></html>'


def mention_mdeg(doc_id: np.ndarray, j: int):
    """(lat_mdeg, lon_mdeg) of mention j for each doc (int64 arrays)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    lat = (doc_id * LAT_MULT + j * LAT_STEP) % LAT_MOD - LAT_OFF
    lon = (doc_id * LON_MULT + j * LON_STEP) % LON_MOD - LON_OFF
    return lat, lon


def hot_mdeg(doc_id: np.ndarray):
    doc_id = np.asarray(doc_id, dtype=np.int64)
    return HOT_LAT_BASE + doc_id % HOT_LAT_MOD, HOT_LON_BASE + doc_id % HOT_LON_MOD


def _fmt(mdeg: np.ndarray) -> pd.Series:
    """Millidegrees -> decimal string with exactly 3 decimals ("12.345")."""
    return pd.Series(mdeg / 1000.0).map(lambda v: f"{v:.3f}")


def _mention_str(lat_mdeg, lon_mdeg, style: int) -> pd.Series:
    la, lo = _fmt(lat_mdeg), _fmt(lon_mdeg)
    if style == 0:
        return "(" + la + ", " + lo + ")"
    return "lat " + la + " lon " + lo


def build_text(doc_id: np.ndarray, base_text: pd.Series) -> pd.Series:
    """Page text = base document text + mentions + hot spot + decoys."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    n_m = doc_id % 4
    out = base_text.reset_index(drop=True).astype(str)
    for j in range(3):
        lat, lon = mention_mdeg(doc_id, j)
        part = " Location " + str(j) + ": " + _mention_str(lat, lon, j % 2) + "."
        out = out + pd.Series(np.where(n_m > j, part, ""))
    hlat, hlon = hot_mdeg(doc_id)
    hot = " Hot spot: " + _mention_str(hlat, hlon, 0) + "."
    out = out + pd.Series(np.where(doc_id % HOT_EVERY == 0, hot, ""))
    return out + DECOY_SUFFIX


def _escape(s: pd.Series) -> pd.Series:
    return (
        s.str.replace("&", "&amp;", regex=False)
        .str.replace("<", "&lt;", regex=False)
        .str.replace(">", "&gt;", regex=False)
    )


def _unescape(s: pd.Series) -> pd.Series:
    return (
        s.str.replace("&gt;", ">", regex=False)
        .str.replace("&lt;", "<", regex=False)
        .str.replace("&amp;", "&", regex=False)
    )


def build_html(doc_id: np.ndarray, text: pd.Series) -> pd.Series:
    head = pd.Series([_HTML_HEAD % i for i in np.asarray(doc_id)])
    tail = pd.Series([_HTML_TAIL % f"t{i % 31}" for i in np.asarray(doc_id)])
    return head + _escape(text.reset_index(drop=True)) + tail


REPL_STRIDE = 10_000_000


def replicate_documents(batch: pa.Table, repl: int) -> pa.Table:
    """Deterministic corpus amplification for throughput benchmarks: replica k
    of a document gets ``doc_id + k * REPL_STRIDE`` — the mention arithmetic
    then yields different (perturbed) coordinates per replica, so the
    amplified corpus is not trivially dedupable."""
    if repl <= 1:
        return batch
    n = batch.num_rows
    idx = pa.array(np.tile(np.arange(n, dtype=np.int64), repl), pa.int64())
    out = batch.take(idx)
    k = np.repeat(np.arange(repl, dtype=np.int64), n)
    doc_id = out.column("doc_id").to_numpy() + k * REPL_STRIDE
    return out.set_column(
        out.column_names.index("doc_id"), "doc_id", pa.array(doc_id, pa.int64())
    )


def synthesize_pages(batch: pa.Table) -> pa.Table:
    """``documents`` Arrow batch -> ``pages`` Arrow batch (map_batches body).

    Output schema: url:string, warc_ts:timestamp[us], html:binary,
    text:string, lang:string, doc_id:int64 (doc_id kept as the stable row id
    / lineage key).
    """
    doc_id = batch.column("doc_id").to_numpy()
    base = batch.column("text").to_pandas()
    text = build_text(doc_id, base)
    html = build_html(doc_id, text)
    url = pd.Series(["https://example%d.com/p/%d" % (i % 997, i) for i in doc_id])
    warc_ts = np.datetime64("2024-01-01T00:00:00", "us") + doc_id.astype("timedelta64[s]")
    return pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array([t.encode("utf-8") for t in html], pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
    )


def extract_text_series(html: pd.Series) -> pd.Series:
    """THE frozen extractor: html -> text, byte-identical to the original.

    Pulls the single ``<article>...</article>`` body and reverses entity
    escaping.  This is the per-row invariant surface (BASELINE.json
    input_hint: "byte-identical extracted text per url").
    """
    body = html.str.extract(r"(?s)<article>(.*)</article>", expand=False)
    return _unescape(body)


def extract_stage(batch: pa.Table) -> pa.Table:
    """map_batches body: pages batch -> adds ``extracted:string`` column
    (decodes html binary, runs the frozen extractor)."""
    html = batch.column("html").to_pandas().map(
        lambda b: b.decode("utf-8") if isinstance(b, (bytes, bytearray)) else str(b)
    )
    extracted = extract_text_series(html)
    return batch.append_column("extracted", pa.array(extracted, pa.string()))

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


# -- Arrow-native string assembly ------------------------------------------
# All hot-path synthesis runs on variable-width Arrow string buffers
# (`pc.binary_join_element_wise` / `pc.replace_substring`): measured 2-4x
# faster than both per-row %-formatting AND numpy fixed-width np.char ops
# (whose padded U-dtype copies lose badly on string workloads).  Public
# pd.Series wrappers remain for tests/interop; byte-identity with the
# original %-format output is pinned by the pages/geoparse oracles.


def _fmt_pa(mdeg: np.ndarray) -> pa.Array:
    """Millidegrees -> "12.345"-style string array (sign + whole + 3-digit
    zero-padded frac) — byte-identical to ``f"{mdeg/1000:.3f}"`` because
    every value has exactly 3 decimal digits and |mdeg| << 2**40."""
    import pyarrow.compute as pc

    mdeg = np.asarray(mdeg, dtype=np.int64)
    a = np.abs(mdeg)
    sign = pa.array(np.where(mdeg < 0, "-", ""), pa.string())
    whole = pc.cast(pa.array(a // 1000), pa.string())
    frac = pc.utf8_lpad(pc.cast(pa.array(a % 1000), pa.string()), 3, "0")
    return pc.binary_join_element_wise(sign, whole, ".", frac, "")


def _fmt(mdeg: np.ndarray) -> pd.Series:
    return _fmt_pa(mdeg).to_pandas()


def _mention_str_pa(lat_mdeg, lon_mdeg, style: int) -> pa.Array:
    import pyarrow.compute as pc

    la, lo = _fmt_pa(lat_mdeg), _fmt_pa(lon_mdeg)
    if style == 0:
        return pc.binary_join_element_wise("(", la, ", ", lo, ")", "")
    return pc.binary_join_element_wise("lat ", la, " lon ", lo, "")


def _mention_str(lat_mdeg, lon_mdeg, style: int) -> pd.Series:
    return _mention_str_pa(lat_mdeg, lon_mdeg, style).to_pandas()


def build_text_pa(doc_id: np.ndarray, base_text: pa.Array) -> pa.Array:
    """Page text = base document text + mentions + hot spot + decoys."""
    import pyarrow.compute as pc

    doc_id = np.asarray(doc_id, dtype=np.int64)
    n_m = doc_id % 4
    parts = [base_text]
    for j in range(3):
        lat, lon = mention_mdeg(doc_id, j)
        part = pc.binary_join_element_wise(
            f" Location {j}: ", _mention_str_pa(lat, lon, j % 2), ".", ""
        )
        parts.append(pc.if_else(pa.array(n_m > j), part, ""))
    hlat, hlon = hot_mdeg(doc_id)
    hot = pc.binary_join_element_wise(
        " Hot spot: ", _mention_str_pa(hlat, hlon, 0), ".", ""
    )
    parts.append(pc.if_else(pa.array(doc_id % HOT_EVERY == 0), hot, ""))
    parts.append(DECOY_SUFFIX)
    return pc.binary_join_element_wise(*parts, "")


def build_text(doc_id: np.ndarray, base_text: pd.Series) -> pd.Series:
    base = pa.Array.from_pandas(base_text.reset_index(drop=True).astype(str))
    return build_text_pa(doc_id, base).to_pandas()


def _escape_pa(arr: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    arr = pc.replace_substring(arr, "&", "&amp;")
    arr = pc.replace_substring(arr, "<", "&lt;")
    return pc.replace_substring(arr, ">", "&gt;")


def _unescape_pa(arr: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    arr = pc.replace_substring(arr, "&gt;", ">")
    arr = pc.replace_substring(arr, "&lt;", "<")
    return pc.replace_substring(arr, "&amp;", "&")


def _escape(s: pd.Series) -> pd.Series:
    return pd.Series(_escape_pa(pa.Array.from_pandas(s.astype(str))).to_pandas())


def _unescape(s: pd.Series) -> pd.Series:
    return pd.Series(_unescape_pa(pa.Array.from_pandas(s.astype(str))).to_pandas())


_HEAD_PRE, _HEAD_POST = _HTML_HEAD.split("%d")
_TAIL_PRE, _TAIL_POST = _HTML_TAIL.split("%s")


def build_html_pa(doc_id: np.ndarray, text: pa.Array) -> pa.Array:
    import pyarrow.compute as pc

    ids = np.asarray(doc_id, dtype=np.int64)
    id_s = pc.cast(pa.array(ids), pa.string())
    trk = pc.cast(pa.array(ids % 31), pa.string())
    return pc.binary_join_element_wise(
        _HEAD_PRE, id_s, _HEAD_POST, _escape_pa(text),
        _TAIL_PRE, "t", trk, _TAIL_POST, "",
    )


def build_html(doc_id: np.ndarray, text: pd.Series) -> pd.Series:
    t = pa.Array.from_pandas(text.reset_index(drop=True).astype(str))
    return build_html_pa(doc_id, t).to_pandas()


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


def urls_from_ids(doc_id: np.ndarray) -> pa.Array:
    """The ONE url constructor (https://example<id%997>.com/p/<id>) —
    shared by page synthesis and every url-keyed query so the engine and
    the oracle's url expression cannot drift."""
    import pyarrow.compute as pc

    ids = np.asarray(doc_id).astype(np.int64)
    return pc.binary_join_element_wise(
        "https://example", pc.cast(pa.array(ids % 997), pa.string()),
        ".com/p/", pc.cast(pa.array(ids), pa.string()), "",
    )


def synthesize_pages(batch: pa.Table) -> pa.Table:
    """``documents`` Arrow batch -> ``pages`` Arrow batch (map_batches body).

    Output schema: url:string, warc_ts:timestamp[us], html:binary,
    text:string, lang:string, doc_id:int64 (doc_id kept as the stable row id
    / lineage key).
    """
    import pyarrow.compute as pc

    doc_id = batch.column("doc_id").to_numpy()
    base = batch.column("text")
    if isinstance(base, pa.ChunkedArray):
        base = base.combine_chunks()
    text = build_text_pa(doc_id, base)
    html = build_html_pa(doc_id, text)
    url = urls_from_ids(doc_id)
    warc_ts = np.datetime64("2024-01-01T00:00:00", "us") + doc_id.astype("timedelta64[s]")
    return pa.table(
        {
            "url": url,
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            # string -> binary cast reuses the UTF-8 buffer (== .encode per row)
            "html": html.cast(pa.binary()),
            "text": text,
            "lang": batch.column("lang"),
            "doc_id": batch.column("doc_id"),
        }
    )


def extract_text_pa(html: pa.Array) -> pa.Array:
    """THE frozen extractor: html -> text, byte-identical to the original.

    Pulls the single ``<article>...</article>`` body (RE2 with (?s), same
    match semantics as the previous pandas extractor) and reverses entity
    escaping.  This is the per-row invariant surface (BASELINE.json
    input_hint: "byte-identical extracted text per url")."""
    import pyarrow.compute as pc

    body = pc.struct_field(
        pc.extract_regex(html, r"(?s)<article>(?P<b>.*)</article>"), "b"
    )
    return _unescape_pa(body)


def extract_text_series(html: pd.Series) -> pd.Series:
    return extract_text_pa(pa.Array.from_pandas(html.astype(str))).to_pandas()


def extract_stage(batch: pa.Table) -> pa.Table:
    """map_batches body: pages batch -> adds ``extracted:string`` column
    (decodes html binary, runs the frozen extractor)."""
    h = batch.column("html")
    if isinstance(h, pa.ChunkedArray):
        h = h.combine_chunks()
    if pa.types.is_binary(h.type) or pa.types.is_large_binary(h.type):
        h = h.cast(pa.string())  # zero-copy utf-8 view
    return batch.append_column("extracted", extract_text_pa(h))


def documents_path(sf_dir: str) -> str:
    """Input path for the documents table: the sharded directory layout
    ``{sf_dir}/documents/part-*.parquet`` when present (read parallelism
    comes from FILES, the way a 100 TB corpus arrives — no repartition
    needed), else the single ``documents.parquet``."""
    import os

    d = os.path.join(sf_dir, "documents")
    return d if os.path.isdir(d) else os.path.join(sf_dir, "documents.parquet")


def shard_documents(sf_dir: str, out_sf_dir: str, n_shards: int = 64) -> str:
    """Materialize an sf dir whose documents table is SHARDED into
    ``documents/part-NNNN.parquet`` (every other table symlinked, and
    ``documents.parquet`` symlinked too so single-file readers keep
    working).  Small-table implementation is a driver-side split; a real
    100 TB corpus is already sharded at the source (this helper exists so
    the bench/tests exercise the multi-file read path).  Idempotent."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_sf_dir, exist_ok=True)
    for f in os.listdir(sf_dir):
        dst = os.path.join(out_sf_dir, f)
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf_dir, f), dst)
    ddir = os.path.join(out_sf_dir, "documents")
    if os.path.isdir(ddir) and len(os.listdir(ddir)) == n_shards:
        return out_sf_dir
    os.makedirs(ddir, exist_ok=True)
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n = tbl.num_rows
    per = -(-n // n_shards)
    for i in range(n_shards):
        lo = min(i * per, n)
        pq.write_table(tbl.slice(lo, min(per, n - lo)),
                       os.path.join(ddir, f"part-{i:04d}.parquet"))
    return out_sf_dir

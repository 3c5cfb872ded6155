"""Geoparse: extract coordinate mentions from page text (vectorized regex).

The profile's flat-map analogue (``Profile.processFeature``,
SURVEY.md §2.2): one page row -> 0..N point-feature rows.  The FROZEN parse
grammar (changing it breaks the per-row oracle):

* pair form:    ``D.DDD, D.DDD``  (parenthesized or bare; 3 decimals exactly)
* labeled form: ``lat D.DDD lon D.DDD``

A match is ACCEPTED iff -85 <= lat <= 85 and -180 <= lon < 180 (web-mercator
usable range; the synthetic decoys are out-of-range on purpose).
``mention_idx`` counts accepted mentions per doc in document order.

Downstream geometry always re-derives degrees from the *integer millidegree*
columns (``lat_mdeg / 1000.0``) so Ray and the DuckDB oracle do bit-identical
double arithmetic regardless of float-parse ulp differences.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

MENTION_RE = re.compile(
    r"(-?\d{1,2}\.\d{3}), (-?\d{1,3}\.\d{3})"
    r"|lat (-?\d{1,2}\.\d{3}) lon (-?\d{1,3}\.\d{3})"
)

LAT_MIN, LAT_MAX = -85.0, 85.0
LON_MIN, LON_MAX = -180.0, 180.0


def parse_mentions(text: pd.Series, doc_id: np.ndarray) -> pd.DataFrame:
    """Vectorized: all accepted mentions of a batch of texts.

    Returns DataFrame(doc_id, mention_idx, lat_mdeg, lon_mdeg).
    """
    s = text.reset_index(drop=True)
    m = s.str.extractall(MENTION_RE)
    if len(m) == 0:
        return pd.DataFrame(
            {
                "doc_id": np.empty(0, np.int64),
                "mention_idx": np.empty(0, np.int64),
                "lat_mdeg": np.empty(0, np.int64),
                "lon_mdeg": np.empty(0, np.int64),
            }
        )
    lat_s = m[0].fillna(m[2])
    lon_s = m[1].fillna(m[3])
    lat = lat_s.astype(np.float64)
    lon = lon_s.astype(np.float64)
    ok = (lat >= LAT_MIN) & (lat <= LAT_MAX) & (lon >= LON_MIN) & (lon < LON_MAX)
    rows = m.index.get_level_values(0).to_numpy()[ok.to_numpy()]
    lat_mdeg = np.rint(lat.to_numpy()[ok.to_numpy()] * 1000.0).astype(np.int64)
    lon_mdeg = np.rint(lon.to_numpy()[ok.to_numpy()] * 1000.0).astype(np.int64)
    # mention_idx = running count of accepted mentions per source row
    # (rows are grouped & ordered by extractall)
    idx = np.zeros(len(rows), dtype=np.int64)
    if len(rows):
        new_doc = np.concatenate([[True], rows[1:] != rows[:-1]])
        seq = np.arange(len(rows), dtype=np.int64)
        start = np.maximum.accumulate(np.where(new_doc, seq, 0))
        idx = seq - start
    return pd.DataFrame(
        {
            "doc_id": np.asarray(doc_id, dtype=np.int64)[rows],
            "mention_idx": idx,
            "lat_mdeg": lat_mdeg,
            "lon_mdeg": lon_mdeg,
        }
    )


def geoparse_stage(batch: pa.Table, text_col: str = "extracted") -> pa.Table:
    """map_batches body: pages(+extracted) batch -> mention point rows.

    Output: doc_id, mention_idx, lat_mdeg, lon_mdeg, lat, lon, lang.
    """
    text = batch.column(text_col).to_pandas()
    doc_id = batch.column("doc_id").to_numpy()
    df = parse_mentions(text, np.arange(len(doc_id)))
    rowsel = df["doc_id"].to_numpy()  # positions within the batch
    out = pa.table(
        {
            "doc_id": pa.array(doc_id[rowsel], pa.int64()),
            "mention_idx": pa.array(df["mention_idx"].to_numpy(), pa.int64()),
            "lat_mdeg": pa.array(df["lat_mdeg"].to_numpy(), pa.int64()),
            "lon_mdeg": pa.array(df["lon_mdeg"].to_numpy(), pa.int64()),
            "lat": pa.array(df["lat_mdeg"].to_numpy() / 1000.0, pa.float64()),
            "lon": pa.array(df["lon_mdeg"].to_numpy() / 1000.0, pa.float64()),
            "lang": batch.column("lang").take(pa.array(rowsel, pa.int64())),
        }
    )
    return out

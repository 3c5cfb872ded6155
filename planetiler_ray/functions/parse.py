"""Scalar parsing library — vectorized analogues of the reference's
``util/Parse.java:35-226`` and ``util/Imposm3Parsers.java:29-100``.

All functions accept pandas Series (string) and return numpy arrays /
Series; usable inside ``map_batches`` bodies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_TRUE_VALUES = {"true", "yes", "1", "on"}
_FALSE_VALUES = {"false", "no", "0", "off", "", None}


def parse_long_or_null(s: pd.Series) -> pd.Series:
    """Leading-integer parse; NaN on failure (Parse.parseLongOrNull)."""
    return pd.to_numeric(s.str.extract(r"^\s*(-?\d+)", expand=False), errors="coerce")


def parse_round_int(s: pd.Series) -> pd.Series:
    """Parse as double then round half-away like Java Math.round."""
    v = pd.to_numeric(s, errors="coerce")
    return np.floor(v + 0.5)


def parse_bool(s: pd.Series) -> np.ndarray:
    """imposm3 bool semantics: "", "0", "false", "no" -> False; else True
    (Imposm3Parsers.bool)."""
    low = s.fillna("").str.strip().str.lower()
    return (~low.isin(["", "0", "false", "no"])).to_numpy()


def parse_bool_int(s: pd.Series) -> np.ndarray:
    return parse_bool(s).astype(np.int64)


def parse_direction(s: pd.Series) -> np.ndarray:
    """1 / -1 / 0 direction parse (Parse.direction): true/yes/1 -> 1,
    -1/reverse -> -1, else 0."""
    low = s.fillna("").str.strip().str.lower()
    out = np.zeros(len(s), dtype=np.int64)
    out[low.isin(["1", "yes", "true"]).to_numpy()] = 1
    out[low.isin(["-1", "reverse"]).to_numpy()] = -1
    return out


def parse_meters(s: pd.Series) -> pd.Series:
    """Unit-suffixed length -> meters (Parse.meters): plain number = m,
    'X ft'/'X\'' = feet, 'X mi' = miles, 'X km' = km, 'X nmi' = nautical."""
    low = s.fillna("").str.strip().str.lower()
    num = pd.to_numeric(low.str.extract(r"^(-?\d+(?:\.\d+)?)", expand=False),
                        errors="coerce")
    factor = pd.Series(np.ones(len(s)), index=low.index)
    factor[low.str.contains(r"(?:ft|feet|')\s*$", regex=True, na=False)] = 0.3048
    factor[low.str.contains(r"mi\s*$", na=False)] = 1609.344
    factor[low.str.contains(r"nmi\s*$", na=False)] = 1852.0
    factor[low.str.contains(r"km\s*$", na=False)] = 1000.0
    return num * factor


_Z_ORDER_HIGHWAYS = {
    "motorway": 9, "trunk": 8, "primary": 6, "secondary": 5, "tertiary": 4,
    "residential": 3, "unclassified": 3, "road": 3, "living_street": 2,
}


def wayzorder(highway: pd.Series, layer: pd.Series | None = None,
              bridge: pd.Series | None = None, tunnel: pd.Series | None = None) -> np.ndarray:
    """imposm3-compatible z-order (Imposm3Parsers.wayzorder / Parse.wayzorder):
    highway class rank + 10*layer + 10 if bridge - 10 if tunnel, clamped to
    the 22-bit sort-key range."""
    z = highway.fillna("").str.lower().map(_Z_ORDER_HIGHWAYS).fillna(0).to_numpy(dtype=np.float64)
    if layer is not None:
        z += 10.0 * pd.to_numeric(layer, errors="coerce").fillna(0).to_numpy()
    if bridge is not None:
        z += np.where(parse_bool(bridge), 10.0, 0.0)
    if tunnel is not None:
        z -= np.where(parse_bool(tunnel), 10.0, 0.0)
    return np.clip(z, -(1 << 21), (1 << 21) - 1).astype(np.int64)


def coalesce(*series):
    """First non-null per row (util/Coalesce.java)."""
    out = series[0].copy()
    for s in series[1:]:
        out = out.fillna(s) if hasattr(out, "fillna") else out
    return out

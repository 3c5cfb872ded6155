"""Dynamic nested-value accessor — ``reader/Struct.java:37-596`` capability.

Real GeoParquet / OSM sources carry nested tag maps and lists; profiles need
``struct.get("a.b[].c").as_int()``-style access without knowing the schema
up front.  :func:`of` wraps any primitive / dict / list / pyarrow scalar into
a :class:`Struct` with the reference's semantics:

* ``get(key)`` on maps resolves direct keys first, then dotted paths
  (``"a.b"``), with ``"a[]"`` flat-mapping over list children;
* ``get`` on lists broadcasts over elements (flat-map) for string keys and
  indexes for numeric keys;
* typed coercions: numbers truncate to int, strings parse leniently
  (``"1"`` -> 1, ``"yes"`` -> True), timestamps from epoch millis or ISO;
* ``NULL`` is an absorbing sentinel (``get`` chains never raise).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone


class Struct:
    """Base: a missing/primitive value.  Subclasses override selectively."""

    __slots__ = ("_value",)

    def __init__(self, value=None):
        self._value = value

    # ------------------------------------------------------------- access --
    def get(self, *keys) -> "Struct":
        if not keys:
            return NULL
        cur = self
        for k in keys:
            cur = cur._get_one(k)
            if cur.is_null():
                return NULL
        return cur

    def _get_one(self, key) -> "Struct":
        return NULL

    def flat_map(self, fn) -> "Struct":
        out = fn(self)
        return out if out is not None else NULL

    def or_else(self, fallback) -> "Struct":
        return self

    def as_list(self) -> list:
        return []

    def as_map(self) -> dict:
        return {}

    # ---------------------------------------------------------- coercions --
    def raw_value(self):
        return self._value

    def is_null(self) -> bool:
        return False

    def is_struct(self) -> bool:
        return False

    def as_int(self):
        return None

    def as_long(self):
        return self.as_int()

    def as_double(self):
        return None

    def as_bool(self):
        return None

    def as_string(self):
        v = self.raw_value()
        return None if v is None else str(v)

    def as_bytes(self):
        return None

    def as_timestamp(self):
        return None

    def as_json(self) -> str:
        return json.dumps(_unwrap(self), separators=(",", ":"))

    def __repr__(self):
        return f"Struct({self.raw_value()!r})"

    def __eq__(self, other):
        return isinstance(other, Struct) and self.raw_value() == other.raw_value()

    def __hash__(self):
        v = self.raw_value()
        # container values hash by canonical JSON (sorted keys, so dicts that
        # compare equal regardless of insertion order hash identically) —
        # keeps the hash/eq invariant for set/dict usage
        if isinstance(v, (dict, list)):
            return hash(json.dumps(v, sort_keys=True, separators=(",", ":"), default=str))
        return hash(v)


class _Null(Struct):
    def is_null(self) -> bool:
        return True

    def or_else(self, fallback) -> Struct:
        return of(fallback)

    def flat_map(self, fn) -> Struct:
        return NULL

    def as_string(self):
        return None

    def __repr__(self):
        return "Struct.NULL"


NULL = _Null()


class _Numeric(Struct):
    def as_int(self):
        return int(self._value)

    def as_double(self):
        return float(self._value)

    def as_timestamp(self):
        # epoch millis; float keeps sub-milli fraction (Numeric.asTimestamp)
        return datetime.fromtimestamp(self._value / 1000.0, tz=timezone.utc)


class _Bool(Struct):
    def as_bool(self):
        return self._value is True


_TRUE = {"true", "yes", "1", "on"}
_FALSE = {"false", "no", "0", "off", ""}


class _String(Struct):
    def as_string(self):
        return self._value

    def as_int(self):
        try:
            return int(self._value.strip())
        except ValueError:
            try:
                f = float(self._value.strip())
                return int(f) if f == int(f) else None
            except ValueError:
                return None

    def as_double(self):
        try:
            return float(self._value.strip())
        except ValueError:
            return None

    def as_bool(self):
        return self._value.strip().lower() in _TRUE

    def as_timestamp(self):
        try:
            return datetime.fromisoformat(self._value.replace("Z", "+00:00"))
        except ValueError:
            v = self.as_long()
            if v is not None:
                return datetime.fromtimestamp(v / 1000.0, tz=timezone.utc)
            return None


class _Binary(Struct):
    def as_bytes(self):
        return self._value

    def as_string(self):
        try:
            return self._value.decode("utf-8")
        except UnicodeDecodeError:
            return self._value.hex()


class _Timestamp(Struct):
    def as_timestamp(self):
        return self._value

    def as_long(self):
        return int(self._value.timestamp() * 1000)

    as_int = as_long


class _Map(Struct):
    def is_struct(self) -> bool:
        return True

    def _get_one(self, key) -> Struct:
        m = self._value
        if key in m:
            return m[key]
        if isinstance(key, str) and "." in key:
            first, rest = key.split(".", 1)
            if first.endswith("[]"):
                return self._get_one(first[:-2]).flat_map(lambda c: c._get_one(rest))
            return self._get_one(first)._get_one(rest)
        return NULL

    def as_map(self) -> dict:
        return dict(self._value)

    def as_string(self):
        return self.as_json()

    def raw_value(self):
        return {k: _unwrap(v) for k, v in self._value.items()}


class _List(Struct):
    def _get_one(self, key) -> Struct:
        if isinstance(key, bool):
            return NULL
        if isinstance(key, (int, float)):
            i = int(key)
            return self._value[i] if 0 <= i < len(self._value) else NULL
        if isinstance(key, str):
            import re

            k = re.sub(r"^\[\]\.?", "", key)
            return self.flat_map(lambda v: v._get_one(k))
        return NULL

    def flat_map(self, fn) -> Struct:
        out = []
        for v in self._value:
            r = fn(v)
            if r is None or r.is_null():
                continue
            if isinstance(r, _List):
                out.extend(r._value)
            else:
                out.append(r)
        if not out:
            return NULL
        if len(out) == 1:
            return out[0]
        return _List(out)

    def as_list(self) -> list:
        return list(self._value)

    def raw_value(self):
        return [_unwrap(v) for v in self._value]


def _unwrap(s: Struct):
    if isinstance(s, _Map):
        return {k: _unwrap(v) for k, v in s._value.items()}
    if isinstance(s, _List):
        return [_unwrap(v) for v in s._value]
    v = s._value
    if isinstance(v, datetime):
        return v.isoformat()
    return v


def of(o) -> Struct:
    """Wrap any value (incl. pyarrow scalars via ``.as_py()``)."""
    if o is None:
        return NULL
    if isinstance(o, Struct):
        return o
    if hasattr(o, "as_py"):  # pyarrow scalar (StructScalar, ListScalar, ...)
        return of(o.as_py())
    if isinstance(o, bool):
        return _Bool(o)
    if isinstance(o, (int, float)):
        return _Numeric(o)
    if isinstance(o, str):
        return _String(o)
    if isinstance(o, (bytes, bytearray)):
        return _Binary(bytes(o))
    if isinstance(o, datetime):
        return _Timestamp(o)
    if isinstance(o, dict):
        return _Map({k: s for k, v in o.items() if not (s := of(v)).is_null()})
    if isinstance(o, (list, tuple)):
        return _List([of(v) for v in o])
    raise TypeError(f"Unable to convert {o!r} ({type(o)})")

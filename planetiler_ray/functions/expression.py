"""Boolean match DSL — vectorized over Arrow batches.

Re-expresses the reference's ``expression/Expression.java:35-710`` (and/or/
not, matchAny with ``%contains%`` patterns, matchField, matchType,
matchSource, constant folding) and ``expression/MultiExpression.java:38-484``
(the layer-dispatch engine) as numpy mask evaluation over ``pa.Table``
batches — one vectorized pass per expression node instead of per-row
interpretation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class Expression:
    def evaluate(self, batch: pa.Table) -> np.ndarray:  # bool mask
        raise NotImplementedError

    def simplify(self) -> "Expression":
        return self

    def __and__(self, other):
        return And([self, other])

    def __or__(self, other):
        return Or([self, other])

    def __invert__(self):
        return Not(self)


@dataclass
class Constant(Expression):
    value: bool

    def evaluate(self, batch):
        return np.full(batch.num_rows, self.value)


TRUE = Constant(True)
FALSE = Constant(False)


@dataclass
class And(Expression):
    children: list

    def evaluate(self, batch):
        out = np.ones(batch.num_rows, dtype=bool)
        for c in self.children:
            out &= c.evaluate(batch)
            if not out.any():
                break
        return out

    def simplify(self):
        kids = [c.simplify() for c in self.children]
        flat = []
        for c in kids:
            if isinstance(c, Constant):
                if not c.value:
                    return FALSE
                continue
            if isinstance(c, And):
                flat.extend(c.children)
            else:
                flat.append(c)
        if not flat:
            return TRUE
        return flat[0] if len(flat) == 1 else And(flat)


@dataclass
class Or(Expression):
    children: list

    def evaluate(self, batch):
        out = np.zeros(batch.num_rows, dtype=bool)
        for c in self.children:
            out |= c.evaluate(batch)
            if out.all():
                break
        return out

    def simplify(self):
        kids = [c.simplify() for c in self.children]
        flat = []
        for c in kids:
            if isinstance(c, Constant):
                if c.value:
                    return TRUE
                continue
            if isinstance(c, Or):
                flat.extend(c.children)
            else:
                flat.append(c)
        if not flat:
            return FALSE
        return flat[0] if len(flat) == 1 else Or(flat)


@dataclass
class Not(Expression):
    child: Expression

    def evaluate(self, batch):
        return ~self.child.evaluate(batch)

    def simplify(self):
        c = self.child.simplify()
        if isinstance(c, Constant):
            return Constant(not c.value)
        if isinstance(c, Not):
            return c.child
        return Not(c)


def _col_str(batch: pa.Table, field: str) -> pa.ChunkedArray | None:
    if field not in batch.column_names:
        return None
    col = batch.column(field)
    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    return col


@dataclass
class MatchField(Expression):
    """True where the field exists and is non-null/non-empty
    (``matchField``)."""

    field: str

    def evaluate(self, batch):
        col = _col_str(batch, self.field)
        if col is None:
            return np.zeros(batch.num_rows, dtype=bool)
        ok = pc.fill_null(pc.and_(col.is_valid(), pc.not_equal(col, pa.scalar(""))), False)
        return ok.to_numpy(zero_copy_only=False).astype(bool)


@dataclass
class MatchAny(Expression):
    """True where field's value is any of ``values``; a value like
    ``"%foo%"`` matches substrings (``matchAny`` pattern semantics: leading/
    trailing %)."""

    field: str
    values: tuple

    def evaluate(self, batch):
        col = _col_str(batch, self.field)
        if col is None:
            return np.zeros(batch.num_rows, dtype=bool)
        exact = [str(v) for v in self.values if "%" not in str(v)]
        patterns = [str(v) for v in self.values if "%" in str(v)]
        out = np.zeros(batch.num_rows, dtype=bool)
        if exact:
            out |= pc.is_in(col, value_set=pa.array(exact, pa.string())).to_numpy(
                zero_copy_only=False
            )
        for p in patterns:
            regex = "^" + ".*".join(re.escape(part) for part in p.split("%")) + "$"
            m = pc.match_substring_regex(col, regex)
            out |= pc.fill_null(m, False).to_numpy(zero_copy_only=False)
        return out


@dataclass
class MatchType(Expression):
    """Geometry-kind dispatch (``matchType(point|linestring|polygon)``)."""

    kind: str

    def evaluate(self, batch):
        col = _col_str(batch, "kind")
        if col is None:
            return np.zeros(batch.num_rows, dtype=bool)
        return pc.equal(col, pa.scalar(self.kind)).to_numpy(zero_copy_only=False)


@dataclass
class MatchCmp(Expression):
    """Numeric comparison on a column: op in (==, !=, <, <=, >, >=)."""

    field: str
    op: str
    value: float

    _OPS = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
            "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}

    def evaluate(self, batch):
        if self.field not in batch.column_names:
            return np.zeros(batch.num_rows, dtype=bool)
        col = batch.column(self.field)
        m = self._OPS[self.op](col, pa.scalar(self.value))
        return pc.fill_null(m, False).to_numpy(zero_copy_only=False)


def match_any(field, *values):
    return MatchAny(field, tuple(values))


def match_field(field):
    return MatchField(field)


def match_type(kind):
    return MatchType(kind)


class MultiExpression:
    """[(payload, expression)] dispatch: per row, which payloads match.

    ``first_match`` returns the index of the first matching entry (-1 none) —
    the vectorized version of the reference's key-indexed evaluation.
    """

    def __init__(self, entries: list[tuple[object, Expression]]):
        self.entries = [(p, e.simplify()) for p, e in entries]

    def first_match(self, batch: pa.Table) -> np.ndarray:
        out = np.full(batch.num_rows, -1, dtype=np.int64)
        unresolved = np.ones(batch.num_rows, dtype=bool)
        for i, (_, e) in enumerate(self.entries):
            if not unresolved.any():
                break
            m = e.evaluate(batch) & unresolved
            out[m] = i
            unresolved &= ~m
        return out

    def all_matches(self, batch: pa.Table) -> list[np.ndarray]:
        return [e.evaluate(batch) for _, e in self.entries]

    def payload(self, i: int):
        return self.entries[i][0]


# -------------------------------------------------------------- YAML parse --

def expr_from_config(cfg) -> Expression:
    """Parse the custommap-style boolean config tree:

    {__all__: [...]}, {__any__: [...]}, {__not__: {...}},
    {field: value | [values]}, "__field__:name", {field__gt/ge/lt/le: v}.
    """
    if cfg is None or cfg is True:
        return TRUE
    if cfg is False:
        return FALSE
    if isinstance(cfg, str):
        if cfg.startswith("__field__:"):
            return MatchField(cfg.split(":", 1)[1])
        raise ValueError(f"bad expression string {cfg!r}")
    if isinstance(cfg, list):
        return Or([expr_from_config(c) for c in cfg]).simplify()
    if isinstance(cfg, dict):
        parts = []
        for k, v in cfg.items():
            if k == "__all__":
                parts.append(And([expr_from_config(c) for c in v]))
            elif k == "__any__":
                parts.append(Or([expr_from_config(c) for c in v]))
            elif k == "__not__":
                parts.append(Not(expr_from_config(v)))
            elif k == "__type__":
                parts.append(MatchType(str(v)))
            elif k.endswith("__gt"):
                parts.append(MatchCmp(k[:-4], ">", float(v)))
            elif k.endswith("__ge"):
                parts.append(MatchCmp(k[:-4], ">=", float(v)))
            elif k.endswith("__lt"):
                parts.append(MatchCmp(k[:-4], "<", float(v)))
            elif k.endswith("__le"):
                parts.append(MatchCmp(k[:-4], "<=", float(v)))
            else:
                vals = v if isinstance(v, list) else [v]
                parts.append(MatchAny(k, tuple(vals)))
        return And(parts).simplify()
    raise ValueError(f"bad expression config {cfg!r}")

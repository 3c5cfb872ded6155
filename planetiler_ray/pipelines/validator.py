"""Schema-conformance validator: YAML example specs run against a no-code
schema (``validator/BaseSchemaValidator.java:31-279`` +
``validator/SchemaSpecification.java:20-83`` semantics).

A spec lists examples of input source features and the vector-tile
features the schema should produce::

    examples:
      - name: en place kept
        input:
          source: points
          geometry: point
          tags: { lang: en }
        output:
          - layer: en_places
            geometry: point
            min_zoom: 2
            tags: { lang: en, cls: latin }

Matching mirrors the reference: expected/actual counts must agree, each
expected feature greedily pairs with the closest actual (layer match = 2,
geometry = 1, +1 per shared tag key, +1 per equal tag value), and null
expected fields are ignored (``validate(..., ignoreWhenNull=true)``).
``allow_extra_tags: false`` fails on any unexpected tag.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa
import yaml

from ..functions.expression import expr_from_config

PASS_BADGE = "\x1b[42m PASS \x1b[0m"
FAIL_BADGE = "\x1b[41m FAIL \x1b[0m"


@dataclass
class ExampleResult:
    name: str
    issues: list = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.issues


def _geometry_kind(geometry: str) -> str:
    """'point' | 'line' | 'polygon' | WKT string -> canonical kind
    (the validator only needs the type; reference parses full WKT)."""
    g = (geometry or "point").strip().lower()
    if g in ("point", "line", "polygon"):
        return {"line": "linestring"}.get(g, g)
    head = g.split("(", 1)[0].strip()
    kinds = {"point": "point", "linestring": "linestring", "polygon": "polygon",
             "multipoint": "point", "multilinestring": "linestring",
             "multipolygon": "polygon"}
    if head in kinds:
        return kinds[head]
    raise ValueError(
        f'Bad geometry: "{geometry}", must be "point" "line" "polygon" or WKT'
    )


def _tags_table(tags: dict) -> pa.Table:
    cols = {k: pa.array([None if v is None else str(v)], pa.string())
            for k, v in (tags or {}).items()}
    if not cols:
        cols = {"__empty__": pa.array([None], pa.string())}
    return pa.table(cols)


def _process_example_input(schema: dict, source: str, geometry: str,
                           tags: dict) -> list[dict]:
    """Run the schema's layers over ONE input feature -> produced features
    (the validator-side analogue of the per-batch ``_apply_layer``)."""
    batch = _tags_table(tags)
    kind = _geometry_kind(geometry)
    out = []
    for layer in schema.get("layers", []):
        if layer.get("source", "points") != (source or "points"):
            continue
        mask = expr_from_config(layer.get("filter")).simplify().evaluate(batch)
        if not bool(mask[0]):
            continue
        attrs = {}
        for a in layer.get("attrs", []):
            inc = a.get("include_when")
            if inc is not None:
                gate = expr_from_config(inc).evaluate(batch)
                if not bool(gate[0]):
                    continue
            if "column" in a:
                v = (tags or {}).get(a["column"])
                if v is not None:
                    attrs[a["key"]] = v
            else:
                attrs[a["key"]] = a.get("value")
        out_kind = kind
        if layer.get("geometry") in ("centroid", "point_on_surface",
                                     "innermost_point", "centroid_if_convex"):
            out_kind = "point"
        out.append(
            {
                "layer": layer["name"],
                "geometry": out_kind,
                "min_zoom": int(layer.get("min_zoom", 0)),
                "max_zoom": int(layer.get("max_zoom", 14)),
                "tags": attrs,
            }
        )
    return out


def _proximity(expected: dict, actual: dict) -> int:
    score = 0
    if expected.get("layer") == actual["layer"]:
        score += 2
    if _norm_geom(expected.get("geometry")) == actual["geometry"]:
        score += 1
    etags = expected.get("tags") or {}
    atags = actual["tags"]
    for k, v in etags.items():
        if k in atags:
            score += 1
            if _eq(v, atags[k]):
                score += 1
    return score


def _norm_geom(g):
    return None if g is None else _geometry_kind(str(g))


def _eq(expected, actual) -> bool:
    if expected == actual:
        return True
    # int/long/float spellings of the same number (reference numeric check)
    return (
        isinstance(expected, (int, float))
        and actual is not None
        and str(expected) == str(actual)
    ) or (isinstance(actual, (int, float)) and str(actual) == str(expected))


def _check(prefix: str, issues: list, expected, actual, ignore_when_null=True):
    if (not ignore_when_null or expected is not None) and not _eq(expected, actual):
        issues.append(f"{prefix}: expected <{expected!r}> actual <{actual!r}>")


def validate_example(schema: dict, example: dict) -> ExampleResult:
    name = example.get("name", "(unnamed)")
    res = ExampleResult(name)
    inp = example.get("input") or {}
    expected = example.get("output") or []
    if isinstance(expected, dict):  # ACCEPT_SINGLE_VALUE_AS_ARRAY
        expected = [expected]
    try:
        actual = _process_example_input(
            schema, inp.get("source"), inp.get("geometry", "point"),
            inp.get("tags") or {},
        )
    except Exception as e:  # mirror Try.apply: failures become example failures
        res.issues.append(f"exception: {e!r}")
        return res
    if len(actual) != len(expected):
        res.issues.append(
            f"Different number of elements, expected={len(expected)} actual={len(actual)}"
        )
        return res
    remaining = list(actual)
    for i, exp in enumerate(expected):
        best = max(remaining, key=lambda a: _proximity(exp, a))
        remaining.remove(best)
        prefix = f"feature[{i}]"
        _check(f"{prefix}.layer", res.issues, exp.get("layer"), best["layer"])
        _check(f"{prefix}.minzoom", res.issues, exp.get("min_zoom"), best["min_zoom"])
        _check(f"{prefix}.maxzoom", res.issues, exp.get("max_zoom"), best["max_zoom"])
        _check(f"{prefix}.geometry", res.issues, _norm_geom(exp.get("geometry")),
               best["geometry"])
        etags = exp.get("tags") or {}
        seen = set(best["tags"].keys())
        for tag, value in etags.items():
            _check(f'{prefix}.tags["{tag}"]', res.issues, value,
                   best["tags"].get(tag), ignore_when_null=False)
            seen.discard(tag)
        if exp.get("allow_extra_tags") is False:
            for tag in sorted(seen):
                _check(f'{prefix}.tags["{tag}"]', res.issues, None,
                       best["tags"].get(tag), ignore_when_null=False)
    return res


def validate(schema_src, spec_src) -> list[ExampleResult]:
    """schema_src / spec_src: YAML strings or dicts (pre-parsed)."""
    schema = schema_src if isinstance(schema_src, dict) else yaml.safe_load(schema_src)
    spec = spec_src if isinstance(spec_src, dict) else yaml.safe_load(spec_src)
    return [validate_example(schema, ex) for ex in (spec or {}).get("examples", [])]


def format_results(results: list[ExampleResult], color: bool = True) -> str:
    """The reference's CLI report: badge per example + summary line."""
    p = PASS_BADGE if color else "[PASS]"
    f = FAIL_BADGE if color else "[FAIL]"
    lines = []
    passed = failed = 0
    for r in results:
        if r.ok:
            passed += 1
            lines.append(f"{p} {r.name}")
        else:
            failed += 1
            lines.append(f"{f} {r.name}")
            for issue in r.issues:
                lines.append(f"  ● {issue}")
    summary = []
    if failed or not results:
        summary.append(f"{failed} failed")
    if passed or not results:
        summary.append(f"{passed} passed")
    if passed and failed:
        summary.append(f"{passed + failed} total")
    lines.append("")
    lines.append(", ".join(summary))
    return "\n".join(lines)


SAMPLE_SPEC = """
examples:
  - name: english place makes en_places with lang + constant cls
    input:
      source: points
      geometry: point
      tags: { lang: en, admin_id: "3" }
    output:
      - layer: en_places
        geometry: point
        min_zoom: 2
        max_zoom: 14
        tags: { lang: en, cls: latin }
  - name: german place is dropped
    input:
      source: points
      geometry: point
      tags: { lang: de }
    output: []
  - name: hot admin region emits both layers
    input:
      source: points
      geometry: point
      tags: { lang: fr, admin_id: "17" }
    output:
      - layer: en_places
        geometry: point
        tags: { lang: fr }
      - layer: hot_admin
        min_zoom: 0
        tags: { admin: "17" }
  - name: admin polygon label collapses to a point
    input:
      source: admin
      geometry: polygon
      tags: { name: Aland }
    output:
      - layer: admin_labels
        geometry: point
        tags: { label: Aland }
        allow_extra_tags: false
"""

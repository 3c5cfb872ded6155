"""Schema-conformance validator tests (BaseSchemaValidator.java semantics)."""

import subprocess
import sys

from planetiler_ray.pipelines import validator as V
from planetiler_ray.pipelines.yamlprofile import SAMPLE_SCHEMA


def test_sample_spec_passes():
    res = V.validate(SAMPLE_SCHEMA, V.SAMPLE_SPEC)
    assert all(r.ok for r in res), V.format_results(res, color=False)
    assert len(res) == 4


def test_count_mismatch_fails():
    spec = """
examples:
  - name: expects an extra feature
    input: { source: points, geometry: point, tags: { lang: en } }
    output:
      - layer: en_places
      - layer: ghost_layer
"""
    (r,) = V.validate(SAMPLE_SCHEMA, spec)
    assert not r.ok
    assert "Different number of elements, expected=2 actual=1" in r.issues[0]


def test_wrong_tag_value_reports_field():
    spec = """
examples:
  - name: wrong constant
    input: { source: points, geometry: point, tags: { lang: en } }
    output:
      - layer: en_places
        tags: { cls: cyrillic }
"""
    (r,) = V.validate(SAMPLE_SCHEMA, spec)
    assert not r.ok
    assert any('tags["cls"]' in i and "cyrillic" in i for i in r.issues)


def test_null_fields_ignored_and_single_output_accepted():
    # output as a single mapping (ACCEPT_SINGLE_VALUE_AS_ARRAY) and no
    # min/max zoom expectations -> only the stated fields are checked
    spec = """
examples:
  - name: minimal expectation
    input: { source: points, geometry: point, tags: { lang: fr } }
    output:
      layer: en_places
"""
    (r,) = V.validate(SAMPLE_SCHEMA, spec)
    assert r.ok, r.issues


def test_allow_extra_tags_false():
    spec = """
examples:
  - name: strict tags
    input: { source: points, geometry: point, tags: { lang: en } }
    output:
      - layer: en_places
        tags: { lang: en }
        allow_extra_tags: false
"""
    (r,) = V.validate(SAMPLE_SCHEMA, spec)
    assert not r.ok  # the constant cls=latin tag is unexpected
    assert any('tags["cls"]' in i for i in r.issues)


def test_bad_geometry_is_example_failure():
    spec = """
examples:
  - name: bad wkt
    input: { source: points, geometry: "blob(1 2)", tags: { lang: en } }
    output: []
"""
    (r,) = V.validate(SAMPLE_SCHEMA, spec)
    assert not r.ok
    assert "exception" in r.issues[0]


def test_cli_tests_flag(tmp_path):
    spec = tmp_path / "spec.yml"
    spec.write_text(V.SAMPLE_SPEC)
    out = subprocess.run(
        [sys.executable, "-m", "planetiler_ray", "verify", "--tests", str(spec)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "4 passed" in out.stdout

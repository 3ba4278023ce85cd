"""Renderer edge cases: Go float formatting (strconv 'f'/'e' shortest with
exponent cleanup), escaping, indent structure, load round-trips."""

import json

import pytest

from jsonschema_infer_spark.plans.render import (
    go_float,
    load_schema,
    render_schema,
)
from jsonschema_infer_spark.operators.state import finalize, get_primary_type, new_state
from jsonschema_infer_spark.config import default_config


@pytest.mark.parametrize(
    "v,want",
    [
        (19.99, "19.99"),
        (30.0, "30"),
        (0.0, "0"),
        (-0.0, "-0"),
        (1e21, "1e+21"),
        (1e-7, "1e-7"),
        (1.5e-7, "1.5e-7"),
        (1e20, "100000000000000000000"),
        (1e16, "10000000000000000"),
        (2.5e22, "2.5e+22"),
        (1e-10, "1e-10"),
        (0.0001, "0.0001"),
        (-3.25, "-3.25"),
    ],
)
def test_go_float(v, want):
    assert go_float(v) == want


def test_go_float_rejects_nonfinite():
    for v in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError):
            go_float(v)


def test_primary_type_tiebreak_deterministic():
    s = new_state()
    s["types"] = {"b": 2, "a": 2, "c": 1}
    assert get_primary_type(s) == "a"  # max count, then lexicographic


def test_render_control_chars():
    out = render_schema({"type": "string", "const": "a\tb\nc\x01"})
    assert "\\t" in out and "\\n" in out and "\\u0001" in out
    assert json.loads(out)["const"] == "a\tb\nc\x01"


def test_render_u2028_escaped_plain_unicode_kept():
    out = render_schema({"type": "string", "const": "x yé"})
    assert "\\u2028" in out and "é" in out


def test_load_renders_back_loaded_cache():
    src = (
        '{"$schema":"http://json-schema.org/draft-07/schema#","type":"object",'
        '"properties":{"a":{"type":"string","format":"email"}},"required":["a"]}'
    )
    state, cached = load_schema(src)
    assert render_schema(cached) == src
    # rebuild from synthetic-count state: same structure
    rebuilt = finalize(state, default_config())
    got = json.loads(render_schema(rebuilt))
    assert got["properties"]["a"] == {"type": "string", "format": "email"}
    assert got["required"] == ["a"]


def test_loaded_format_survives_elimination():
    """The always-true-detector semantics (jsonschema.go:278-282): a loaded
    format survives new samples that do NOT match it."""
    from jsonschema_infer_spark import SchemaInferrer

    g = SchemaInferrer()
    g.load(
        '{"type":"object","properties":{"e":{"type":"string","format":"email"}},'
        '"required":["e"]}'
    )
    g.add_sample('{"e": "definitely not an email"}')
    s = json.loads(g.generate())
    assert s["properties"]["e"]["format"] == "email"

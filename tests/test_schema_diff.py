"""plans.diff.schema_diff — schema-level drift between two inferred schemas.

The records must be deterministic (sorted), complete (every shape change
surfaces), and quiet (identical schemas -> empty diff; `example` is
provenance, not shape)."""

import json

from jsonschema_infer_spark import SchemaInferrer
from jsonschema_infer_spark.plans.diff import schema_diff, schema_diff_df


def _infer(samples):
    g = SchemaInferrer()
    for s in samples:
        g.add_sample(s)
    return json.loads(g.generate())


def test_identical_schemas_diff_empty():
    s = _infer(['{"a": 1, "b": "x"}', '{"a": 2}'])
    assert schema_diff(s, s) == []


def test_property_added_and_required():
    a = _infer(['{"a": 1}', '{"a": 2}'])
    b = _infer(['{"a": 1, "b": "x"}', '{"a": 2, "b": "y"}'])
    changes = {(r["path"], r["change"]) for r in schema_diff(a, b)}
    assert ("$.b", "property_added") in changes
    assert ("$.b", "required_added") in changes
    # exactly those two records — nothing else (e.g. provenance) leaks in
    assert len(schema_diff(a, b)) == 2


def test_property_removed_and_type_widened():
    a = _infer(['{"a": 1, "gone": true}'])
    b = _infer(['{"a": 1}', '{"a": "now a string"}'])
    recs = schema_diff(a, b)
    by = {(r["path"], r["change"]): r for r in recs}
    assert ("$.gone", "property_removed") in by
    r = by[("$.a", "type_changed")]
    assert r["before"] == '"integer"' and json.loads(r["after"]) == ["integer", "string"]


def test_format_and_const_transitions():
    a = _infer(['{"ts": "2026-01-01T00:00:00Z", "k": "fixed"}'])
    b = _infer(['{"ts": "not a timestamp", "k": "fixed"}', '{"ts": "x", "k": "moved"}'])
    changes = {(r["path"], r["change"]) for r in schema_diff(a, b)}
    assert ("$.ts", "format_removed") in changes
    assert ("$.k", "const_removed") in changes
    # reverse direction flips the labels
    rev = {(r["path"], r["change"]) for r in schema_diff(b, a)}
    assert ("$.ts", "format_added") in rev
    assert ("$.k", "const_added") in rev


def test_nested_paths_and_items_recursion():
    a = _infer(['{"o": {"x": 1}, "arr": [1, 2]}'])
    b = _infer(['{"o": {"x": 1, "y": 2}, "arr": ["s"]}'])
    changes = {(r["path"], r["change"]) for r in schema_diff(a, b)}
    assert ("$.o.y", "property_added") in changes
    assert ("$.arr[]", "type_changed") in changes


def test_output_sorted_and_stable():
    a = _infer(['{"b": 1, "a": 1}'])
    b = _infer(['{"c": "x", "a": "y"}'])
    recs = schema_diff(a, b)
    assert recs == sorted(
        recs, key=lambda r: (r["path"], r["change"], r["before"] or "", r["after"] or "")
    )
    assert recs == schema_diff(a, b)  # pure function, no hidden state


def test_schema_diff_df_stable_schema(spark):
    a = _infer(['{"a": 1}'])
    b = _infer(['{"a": 1, "b": 2}'])
    df = schema_diff_df(spark, a, b)
    assert [f.name for f in df.schema.fields] == ["path", "change", "before", "after"]
    rows = {(r.path, r.change) for r in df.collect()}
    assert ("$.b", "property_added") in rows


def test_empty_diff_df_has_schema(spark):
    s = _infer(['{"a": 1}'])
    df = schema_diff_df(spark, s, s)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["path", "change", "before", "after"]


def test_non_dict_subschemas_do_not_crash():
    # draft-06/07: boolean property schemas and list-valued items
    a = {"type": "object", "properties": {"x": True}}
    b = {"type": "object", "properties": {"x": {"type": "string"}}}
    recs = schema_diff(a, b)
    assert any(r["change"] == "schema_changed" and r["path"] == "$.x" for r in recs)
    la = {"type": "array", "items": [{"type": "string"}]}
    lb = {"type": "array", "items": {"type": "string"}}
    recs2 = schema_diff(la, lb)
    assert any(r["path"] == "$[]" for r in recs2)
    # equal non-dict sub-schemas diff empty
    assert schema_diff(a, a) == []

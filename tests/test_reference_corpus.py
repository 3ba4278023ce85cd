"""Port of the reference's full test suite to the new engine's local fold.

Source: /root/reference/jsonschema_test.go (43 tests, 1,958 lines) and
/root/reference/examples_test.go. Each test keeps the reference's structural
assertions; several add byte-level golden assertions derived from the Go
serialization rules (SURVEY.md §1.4) since no Go toolchain exists here.

The Go concurrency tests (jsonschema_test.go:775-885) are re-expressed as
merge-associativity tests in tests/test_merge_properties.py — the mutex-based
concurrency they exercise is precisely what the distributed merge replaces.
"""

import io
import json

import pytest

from jsonschema_infer_spark import SchemaInferrer, NoSamplesError, DRAFT06, DRAFT07
from jsonschema_infer_spark.config import default_config, CustomFormat, InferConfig


def infer(*samples, **opts):
    g = SchemaInferrer(**opts)
    for s in samples:
        g.add_sample(s)
    return g


def schema_of(*samples, **opts):
    return json.loads(infer(*samples, **opts).generate())


# --- type inference (jsonschema_test.go:10-54, 433-466, 994-1023) ------------


def test_basic_type_inference():
    s = schema_of(
        '{"name": "John", "age": 30, "active": true}',
        '{"name": "Jane", "age": 25, "active": false}',
    )
    assert len(s["required"]) == 3
    assert s["properties"]["name"]["type"] == "string"
    assert s["properties"]["age"]["type"] == "integer"
    assert s["properties"]["active"]["type"] == "boolean"


def test_number_vs_integer():
    s = schema_of('{"count": 10, "price": 19.99}', '{"count": 20, "price": 29.99}')
    assert s["properties"]["count"]["type"] == "integer"
    assert s["properties"]["price"]["type"] == "number"


def test_primitive_as_root():
    s = schema_of('"hello"', '"world"')
    assert s["type"] == "string"


def test_array_as_root():
    s = schema_of(
        '[{"id": 1, "name": "John"}, {"id": 2, "name": "Jane"}]',
        '[{"id": 3, "name": "Bob"}]',
    )
    assert s["type"] == "array"
    assert s["items"]["type"] == "object"
    assert len(s["items"]["properties"]) == 2
    assert s["items"]["properties"]["id"]["type"] == "integer"
    assert s["items"]["properties"]["name"]["type"] == "string"
    assert len(s["items"]["required"]) == 2


# --- required/optional (:56-96, 545-599) --------------------------------------


def test_optional_fields():
    s = schema_of('{"name": "John", "age": 30}', '{"name": "Jane"}',
                  '{"name": "Bob", "age": 40}')
    assert s["required"] == ["name"]
    assert "age" in s["properties"]


def test_array_of_objects():
    s = schema_of(
        '{"users": [{"id": 1, "name": "John"}, {"id": 2, "name": "Jane"}]}',
        '{"users": [{"id": 3, "name": "Bob"}]}',
    )
    users = s["properties"]["users"]
    assert users["type"] == "array"
    assert users["items"]["type"] == "object"
    assert users["items"]["properties"]["id"]["type"] == "integer"
    assert users["items"]["properties"]["name"]["type"] == "string"
    assert len(users["items"]["required"]) == 2


def test_array_of_objects_with_optional_fields():
    s = schema_of(
        '{"products": [{"id": 1, "name": "Product A", "price": 10.5},'
        ' {"id": 2, "name": "Product B"}]}',
        '{"products": [{"id": 3, "name": "Product C", "price": 20.0}]}',
    )
    items = s["properties"]["products"]["items"]
    assert sorted(items["required"]) == ["id", "name"]
    assert "price" in items["properties"]
    assert "price" not in items["required"]
    # 20.0 is an integral float -> "integer" observation joins 10.5's "number"
    assert items["properties"]["price"]["type"] == ["integer", "number"]


# --- nesting (:390-431, 601-655) ----------------------------------------------


def test_nested_objects():
    s = schema_of(
        '{"user": {"name": "John", "email": "john@example.com"}}',
        '{"user": {"name": "Jane", "email": "jane@example.com"}}',
    )
    user = s["properties"]["user"]
    assert user["type"] == "object"
    assert user["properties"]["name"]["type"] == "string"
    assert user["properties"]["email"]["type"] == "string"
    assert user["properties"]["email"]["format"] == "email"


def test_nested_arrays_of_objects():
    s = schema_of(
        '{"company": {"name": "Acme", "employees":'
        ' [{"name": "Alice", "role": "Engineer"}]}}',
        '{"company": {"name": "TechCo", "employees":'
        ' [{"name": "Bob", "role": "Designer"}, {"name": "Charlie", "role": "Manager"}]}}',
    )
    company = s["properties"]["company"]
    assert company["type"] == "object"
    employees = company["properties"]["employees"]
    assert employees["type"] == "array"
    assert employees["items"]["type"] == "object"
    assert employees["items"]["properties"]["name"]["type"] == "string"
    assert employees["items"]["properties"]["role"]["type"] == "string"


def test_array_handling():
    s = schema_of('{"tags": ["go", "json", "schema"]}', '{"tags": ["test", "unit"]}')
    tags = s["properties"]["tags"]
    assert tags["type"] == "array"
    assert tags["items"]["type"] == "string"


# --- format detection (:137-350, 1464-1518) -----------------------------------


def test_datetime_detection():
    s = schema_of('{"created_at": "2023-01-15T10:30:00Z"}',
                  '{"created_at": "2023-02-20T14:45:00Z"}')
    p = s["properties"]["created_at"]
    assert p["type"] == "string" and p["format"] == "date-time"


def test_email_detection():
    s = schema_of('{"email": "user@example.com"}', '{"email": "admin@test.org"}')
    p = s["properties"]["email"]
    assert p["type"] == "string" and p["format"] == "email"


def test_uuid_detection():
    s = schema_of('{"id": "550e8400-e29b-41d4-a716-446655440000"}',
                  '{"id": "6ba7b810-9dad-11d1-80b4-00c04fd430c8"}')
    p = s["properties"]["id"]
    assert p["type"] == "string" and p["format"] == "uuid"


def test_ipv4_detection():
    s = schema_of('{"ip": "192.168.1.1"}', '{"ip": "10.0.0.1"}')
    p = s["properties"]["ip"]
    assert p["type"] == "string" and p["format"] == "ipv4"


def test_ipv6_detection():
    s = schema_of('{"ip": "2001:0db8:85a3:0000:0000:8a2e:0370:7334"}',
                  '{"ip": "fe80::1"}')
    p = s["properties"]["ip"]
    assert p["type"] == "string" and p["format"] == "ipv6"


def test_url_detection():
    s = schema_of('{"website": "https://example.com"}',
                  '{"website": "http://test.org/path"}',
                  '{"website": "ftp://files.example.com/data"}')
    p = s["properties"]["website"]
    assert p["type"] == "string" and p["format"] == "uri"


def test_schema_version_with_formats():
    s = schema_of(
        '{"email": "user@example.com",'
        ' "uuid": "550e8400-e29b-41d4-a716-446655440000",'
        ' "ipv4": "192.168.1.1",'
        ' "ipv6": "2001:0db8:85a3:0000:0000:8a2e:0370:7334",'
        ' "url": "https://example.com/path"}',
        schema_version=DRAFT06,
    )
    assert s["$schema"] == DRAFT06
    for field, fmt in [("email", "email"), ("uuid", "uuid"), ("ipv4", "ipv4"),
                       ("ipv6", "ipv6"), ("url", "uri")]:
        assert s["properties"][field]["format"] == fmt, field


# --- custom formats (:887-937, 1025-1166, 1520-1568) ---------------------------


def _hex_color(s: str) -> bool:
    return (len(s) == 7 and s[0] == "#"
            and all(c in "0123456789abcdefABCDEF" for c in s[1:]))


def _phone(s: str) -> bool:
    return len(s) >= 10 and s[0] == "+" and s[1:].isdigit()


def _custom_config(*customs, builtin=True, **kw):
    from jsonschema_infer_spark.functions.formats import built_in_formats

    fmts = tuple(built_in_formats()) if builtin else ()
    return InferConfig(formats=fmts + customs, **kw)


def test_custom_format_detection():
    cfg = _custom_config(CustomFormat("hex-color", _hex_color))
    s = json.loads(infer('{"color": "#FF5733"}', '{"color": "#00FF00"}',
                         config=cfg).generate())
    p = s["properties"]["color"]
    assert p["type"] == "string" and p["format"] == "hex-color"


def test_multiple_custom_formats():
    cfg = _custom_config(CustomFormat("hex-color", _hex_color),
                         CustomFormat("phone", _phone))
    s = json.loads(infer('{"color": "#FF5733", "phone": "+1234567890"}',
                         '{"color": "#00FF00", "phone": "+9876543210"}',
                         config=cfg).generate())
    assert s["properties"]["color"]["format"] == "hex-color"
    assert s["properties"]["phone"]["format"] == "phone"


def test_without_built_in_formats():
    cfg = InferConfig(formats=())
    s = json.loads(infer('{"time": "2023-01-15T10:30:00Z", "email": "user@example.com"}',
                         '{"time": "2023-02-20T14:45:00Z", "email": "admin@test.org"}',
                         config=cfg).generate())
    assert "format" not in s["properties"]["time"]
    assert "format" not in s["properties"]["email"]


def test_custom_format_override():
    cfg = _custom_config(
        CustomFormat("my-date", lambda s: len(s) == 10 and s[4] == "-" and s[7] == "-"),
        builtin=False,
    )
    s = json.loads(infer('{"date": "2023-01-15"}', '{"date": "2024-12-31"}',
                         config=cfg).generate())
    assert s["properties"]["date"]["format"] == "my-date"


def test_schema_version_with_custom_formats():
    cfg = _custom_config(CustomFormat("hex-color", _hex_color),
                         schema_version=DRAFT06)
    s = json.loads(infer('{"color": "#FF5733"}', config=cfg).generate())
    assert s["$schema"] == DRAFT06
    assert s["properties"]["color"]["format"] == "hex-color"


# --- predefined types (:352-388) -----------------------------------------------


def test_predefined_types():
    s = schema_of(
        '{"created_at": "2023-01-15T10:30:00Z", "updated_at": "2023-01-15T10:30:00Z"}',
        '{"created_at": "2023-02-20T14:45:00Z", "updated_at": "2023-02-20T14:45:00Z"}',
        predefined={"created_at": "datetime", "updated_at": "datetime"},
    )
    assert s["properties"]["created_at"]["format"] == "date-time"
    assert s["properties"]["updated_at"]["format"] == "date-time"


def test_predefined_drops_const_and_required_is_kept():
    # forced scalar drops const/format/example (node.go:258-289), but the
    # required computation happens in the parent and is unaffected
    s = schema_of('{"k": "same"}', '{"k": "same"}', predefined={"k": "string"})
    assert s["properties"]["k"] == {"type": "string"}
    assert s["required"] == ["k"]


# --- null semantics (:1719-1802) ------------------------------------------------


def test_null_value_makes_field_optional():
    s = schema_of(
        '{"structure": "item", "type": "coordinates", "value": {'
        '"latitude": {"structure": "item", "type": "float", "value": 48.61319435},'
        '"longitude": {"structure": "item", "type": "float", "value": 7.6940764}}}',
        '{"structure": "item", "type": "coordinates", "value": null}',
    )
    assert "structure" in s["required"]
    assert "type" in s["required"]
    assert "value" not in s["required"]
    assert "value" in s["properties"]


def test_null_value_no_type_contamination():
    s = schema_of('{"name": "Alice", "score": 42}', '{"name": null, "score": 99}')
    assert s["properties"]["name"]["type"] == "string"
    assert "name" not in s.get("required", [])


def test_null_inside_arrays_is_observed():
    # unlike object properties, array items DO observe nulls (node.go:124-134);
    # single non-null type + null collapses back to the scalar type
    s = schema_of('{"xs": [1, null, 2]}')
    assert s["properties"]["xs"]["items"]["type"] == "integer"


# --- const (:1806-1889) ----------------------------------------------------------


def test_const_same_value():
    s = schema_of(
        '{"structure": "item", "type": "coordinates", "id": 1}',
        '{"structure": "item", "type": "coordinates", "id": 2}',
        '{"structure": "item", "type": "coordinates", "id": 3}',
    )
    assert s["properties"]["structure"]["const"] == "item"
    assert s["properties"]["type"]["const"] == "coordinates"
    assert "const" not in s["properties"]["id"]


def test_const_different_values():
    s = schema_of('{"name": "Alice", "active": true}', '{"name": "Bob", "active": false}')
    assert "const" not in s["properties"]["name"]
    assert "const" not in s["properties"]["active"]


def test_const_with_null_samples():
    s = schema_of('{"kind": "sensor", "value": 10}', '{"kind": null, "value": 20}',
                  '{"kind": "sensor", "value": 30}')
    assert s["properties"]["kind"]["const"] == "sensor"
    assert "kind" not in s.get("required", [])


def test_const_cross_type_values_differ():
    # Go raw interface equality: "1" (string) vs 1 (number) differ, and
    # true vs 1 differ even though Python's True == 1
    s = schema_of('{"a": "1", "b": true}', '{"a": 1, "b": 1}')
    assert "const" not in s["properties"]["a"]
    assert "const" not in s["properties"]["b"]


def test_const_integral_float_equals_int():
    # Go: both parse to float64(30) -> const kept, rendered as 30
    g = infer('{"v": 30}', '{"v": 30.0}')
    assert json.loads(g.generate())["properties"]["v"]["const"] == 30
    assert '"const":30' in g.generate()


# --- lifecycle (:468-484, 657-773, 1891-1957) ------------------------------------


def test_empty_samples():
    with pytest.raises(NoSamplesError):
        SchemaInferrer().generate()


def test_invalid_json():
    with pytest.raises(ValueError):
        SchemaInferrer().add_sample("{invalid json}")


def test_load_schema():
    g1 = infer('{"name": "John", "age": 30}', '{"name": "Jane", "age": 25}')
    schema_json = g1.generate()

    g2 = SchemaInferrer()
    g2.load(schema_json)
    loaded = json.loads(g2.generate())
    original = json.loads(schema_json)

    assert loaded["type"] == original["type"]
    assert len(loaded["properties"]) == len(original["properties"])
    assert loaded["properties"]["name"]["type"] == "string"
    assert loaded["properties"]["age"]["type"] == "integer"


def test_load_schema_and_add_samples():
    g1 = infer('{"name": "John", "age": 30}')
    schema_json = g1.generate()

    g2 = SchemaInferrer()
    g2.load(schema_json)
    g2.add_sample('{"name": "Bob", "age": 40, "email": "bob@example.com"}')

    s = json.loads(g2.generate())
    assert len(s["properties"]) == 3
    assert "email" in s["properties"]
    assert "email" not in s.get("required", [])


def test_load_rejects_non_object_root():
    g = SchemaInferrer()
    with pytest.raises(ValueError):
        g.load('{"type": "array", "items": {"type": "string"}}')


def test_generate_to_writer():
    g = infer('{"name": "Alice", "age": 30}')
    buf = io.StringIO()
    g.generate_to(buf)
    s = json.loads(buf.getvalue())
    assert s["properties"]["name"]["type"] == "string"
    # GenerateTo keeps the encoder's trailing newline (jsonschema.go:152-160)
    assert buf.getvalue().endswith("\n")


def test_generate_to_writer_no_samples():
    with pytest.raises(NoSamplesError):
        SchemaInferrer().generate_to(io.StringIO())


def test_with_indent_generate():
    g = infer('{"name": "Alice"}', indent="  ")
    out = g.generate()
    assert "\n" in out and "  " in out
    assert not out.endswith("\n")


def test_with_indent_generate_to():
    g = infer('{"name": "Alice"}', indent="\t")
    buf = io.StringIO()
    g.generate_to(buf)
    assert "\t" in buf.getvalue()


def test_generate_compact_by_default():
    assert "\n" not in infer('{"name": "Alice"}').generate()


def test_max_samples():
    # options.go:50-54, jsonschema.go:74-76: samples beyond the cap are ignored
    g = SchemaInferrer(max_samples=2)
    g.add_sample('{"a": 1}')
    g.add_sample('{"a": 2}')
    g.add_sample('{"a": 3, "b": "ignored"}')
    s = json.loads(g.generate())
    assert "b" not in s["properties"]
    assert g.sample_count == 2


# --- examples (:1168-1272; examples_test.go) --------------------------------------


def test_examples():
    s = schema_of('{"name": "John", "age": 30, "active": true, "tags": ["go", "json"]}',
                  '{"name": "Jane", "age": 25, "active": false, "tags": ["test"]}',
                  examples=True)
    assert s["properties"]["name"]["example"] == "John"
    assert s["properties"]["age"]["example"] == 30
    assert s["properties"]["active"]["example"] is True
    assert s["properties"]["tags"]["example"] == ["go", "json"]


def test_examples_with_nested_objects():
    s = schema_of('{"user": {"name": "John", "email": "john@example.com"}, "count": 5}',
                  '{"user": {"name": "Jane", "email": "jane@example.com"}, "count": 10}',
                  examples=True)
    assert s["properties"]["user"]["example"] == {
        "name": "John", "email": "john@example.com"}
    assert s["properties"]["user"]["properties"]["name"]["example"] == "John"
    assert s["properties"]["count"]["example"] == 5


def test_examples_disabled_by_default():
    s = schema_of('{"name": "John"}')
    assert "example" not in s["properties"]["name"]


def test_examples_explicitly_enabled():
    s = schema_of('{"name": "John"}', examples=True)
    assert s["properties"]["name"]["example"] == "John"


# --- schema versions (:1274-1462, 1570-1627) ----------------------------------------


def test_schema_version_default():
    assert schema_of('{"name": "John", "age": 30}')["$schema"] == DRAFT07


def test_schema_version_draft07_explicit():
    assert schema_of('{"name": "x"}', schema_version=DRAFT07)["$schema"] == DRAFT07


def test_schema_version_draft06():
    assert schema_of('{"name": "x"}', schema_version=DRAFT06)["$schema"] == DRAFT06


def test_schema_version_with_complex_types():
    s = schema_of(
        '{"user": {"name": "John", "email": "john@example.com",'
        ' "created": "2023-01-15T10:30:00Z"}, "tags": ["golang", "testing"], "count": 42}',
        '{"user": {"name": "Jane", "email": "jane@example.com",'
        ' "created": "2023-02-20T14:45:00Z"}, "tags": ["python", "devops", "docker"],'
        ' "count": 17}',
        schema_version=DRAFT06,
    )
    assert s["$schema"] == DRAFT06
    assert s["type"] == "object"
    assert s["properties"]["user"]["type"] == "object"
    assert s["properties"]["user"]["properties"]["email"]["format"] == "email"
    assert s["properties"]["user"]["properties"]["created"]["format"] == "date-time"
    assert s["properties"]["tags"]["type"] == "array"
    assert s["properties"]["tags"]["items"]["type"] == "string"
    assert s["properties"]["count"]["type"] == "integer"


def test_schema_version_incremental():
    g = SchemaInferrer(schema_version=DRAFT06)
    for sample in ['{"name": "John"}', '{"name": "Jane", "age": 25}',
                   '{"name": "Bob", "age": 30, "email": "bob@example.com"}']:
        g.add_sample(sample)
        assert g.get_current_schema()["$schema"] == DRAFT06
    assert json.loads(g.generate())["$schema"] == DRAFT06


# --- byte-level goldens (SURVEY.md §1.4 serialization rules) -----------------------


def test_golden_basic_compact():
    g = infer('{"name": "John", "age": 30, "active": true}',
              '{"name": "Jane", "age": 25, "active": false}')
    assert g.generate() == (
        '{"$schema":"http://json-schema.org/draft-07/schema#",'
        '"type":"object",'
        '"properties":{'
        '"active":{"type":"boolean"},'
        '"age":{"type":"integer"},'
        '"name":{"type":"string"}},'
        '"required":["active","age","name"]}'
    )


def test_golden_union_type_sorted():
    g = infer('{"v": 1}', '{"v": "x"}', '{"v": 1.5}')
    # sorted non-null union (node.go:168-183)
    assert '"type":["integer","number","string"]' in g.generate()


def test_golden_html_escaping():
    # encoding/json escapes < > & (jsonschema.go uses the default encoder)
    g = infer('{"u": "https://e.com/?a=1&b=<2>"}', examples=True)
    out = g.generate()
    assert "\\u0026" in out and "\\u003c" in out and "\\u003e" in out
    assert "&" not in out.replace("\\u0026", "")


def test_golden_indent_style():
    g = infer('{"name": "Alice"}', indent="  ")
    # (a single sample latches const, node.go:186-188 — Go emits it here too)
    assert g.generate() == (
        '{\n  "$schema": "http://json-schema.org/draft-07/schema#",\n'
        '  "type": "object",\n'
        '  "properties": {\n'
        '    "name": {\n      "type": "string",\n      "const": "Alice"\n    }\n  },\n'
        '  "required": [\n    "name"\n  ]\n}'
    )


def test_golden_integral_float_renders_as_int():
    g = infer('{"n": 2.0}', examples=True)
    out = g.generate()
    assert '"example":2' in out and "2.0" not in out


# --- mixed-type / union edge cases (bug-for-bug parity) -----------------------------


def test_union_collapses_when_only_null_second_type():
    s = schema_of('{"v": "x"}', '{"v": null}')
    # type list would be ["null","string"]; null dropped -> collapses to scalar
    # NOTE root-level null property: null SKIPS observation (object rule),
    # so use array items to exercise this path instead:
    s2 = schema_of('{"v": ["x", null]}')
    assert s["properties"]["v"]["type"] == "string"
    assert s2["properties"]["v"]["items"]["type"] == "string"


def test_primary_type_object_overwrites_union():
    # 2 objects vs 1 string: primary=object -> Type overwritten to "object"
    # (node.go:207) even though both types were observed
    s = schema_of('{"v": {"a": 1}}', '{"v": {"a": 2}}', '{"v": "s"}')
    assert s["properties"]["v"]["type"] == "object"
    assert "properties" in s["properties"]["v"]


def test_primary_type_string_keeps_union():
    # 2 strings vs 1 object: primary=string -> union survives, format applies
    s = schema_of('{"v": "a@b.com"}', '{"v": "c@d.org"}', '{"v": {"a": 1}}')
    assert s["properties"]["v"]["type"] == ["object", "string"]
    assert s["properties"]["v"]["format"] == "email"


def test_null_only_array_items():
    s = schema_of('{"v": [null, null]}')
    # single observed type "null": len(types)==1 -> Type = primary = "null"
    assert s["properties"]["v"]["items"]["type"] == "null"


def test_null_only_property_renders_empty_type():
    # Go: a never-observed node's Type is the empty string, and omitempty on
    # an `any` field only drops nil -> "type":"" is emitted (schema.go:8)
    g = infer('{"name": null}')
    assert g.generate() == (
        '{"$schema":"http://json-schema.org/draft-07/schema#",'
        '"type":"object","properties":{"name":{"type":""}}}'
    )


def test_empty_string_const_is_emitted():
    # interface holding "" is non-nil -> Go emits "const":""
    g = infer('""')
    assert '"const":""' in g.generate()


def test_false_const_is_emitted():
    g = infer('{"flag": false}', '{"flag": false}')
    assert '"const":false' in g.generate()


# --- integral-float demotion at the int64 boundary (node.go:296-301) ---------


def test_huge_integral_float_is_number():
    # Go demotes float64 -> "integer" iff v == float64(int64(v)); the int64
    # conversion clamps for |v| >= 2^63, so huge integral floats fail the
    # round-trip and stay "number" (node.go:296-301)
    s = schema_of('{"v": 1e19}', '{"v": 2e19}')
    assert s["properties"]["v"]["type"] == "number"


def test_int64_boundary_demotion():
    from jsonschema_infer_spark.operators.state import get_primitive_type

    assert get_primitive_type(float(2**63)) == "number"  # clamps in Go
    assert get_primitive_type(float(-(2**63))) == "integer"  # exact int64
    assert get_primitive_type(1.8446e19) == "number"
    assert get_primitive_type(-3.4028e38) == "number"
    assert get_primitive_type(9007199254740992.0) == "integer"
    assert get_primitive_type(float("inf")) == "number"
    assert get_primitive_type(float("nan")) == "number"

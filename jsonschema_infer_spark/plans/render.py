"""Go-byte-compatible JSON Schema rendering + the load/resume reverse path.

The reference marshals its Schema struct through encoding/json
(`/root/reference/jsonschema.go:119-146`, `/root/reference/schema.go:6-16`).
Byte-matching from Python requires replicating (SURVEY.md §1.4):

1. struct field order: $schema, type, properties, items, required, format,
   const, example, additionalProperties (all omitempty; additionalProperties
   is never set by the generator);
2. map keys (properties) sorted bytewise-ascending (Go map marshal);
3. compact by default ({"a":1}); SetIndent("", s) emits Go-style indent;
4. encoding/json HTML-escapes '<' '>' '&' as \\u003c \\u003e \\u0026 and
   U+2028/U+2029 as \\u2028/\\u2029; other non-ASCII stays raw UTF-8;
5. integral float64 marshals as "30", not "30.0";
6. Generate() strips the encoder's trailing newline (jsonschema.go:144-145);
   GenerateTo keeps it.
"""

from __future__ import annotations

import json
import math

FIELD_ORDER = (
    "$schema",
    "type",
    "properties",
    "items",
    "required",
    "format",
    "const",
    "example",
    "additionalProperties",
)

_ESCAPES = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "<": "\\u003c",
    ">": "\\u003e",
    "&": "\\u0026",
    " ": "\\u2028",
    " ": "\\u2029",
}


def _escape_string(s: str) -> str:
    out = ['"']
    for ch in s:
        esc = _ESCAPES.get(ch)
        if esc is not None:
            out.append(esc)
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def go_float(v: float) -> str:
    """strconv.AppendFloat(b, f, fmt, -1, 64) as encoding/json calls it:
    'f' format for 1e-6 <= |v| < 1e21 (and 0), else 'e' with the exponent's
    leading zero trimmed (e-09 -> e-9)."""
    if v != v or v in (math.inf, -math.inf):
        raise ValueError("unsupported float value in JSON")  # Go errors too
    if v == int(v) and abs(v) < 1e16:
        s = str(int(v))  # integral float64 -> "30" (shortest 'f')
        return "-0" if s == "0" and math.copysign(1.0, v) < 0 else s
    shortest = repr(v)  # Python repr = shortest round-trip digits
    mant, _, exp = shortest.partition("e")
    use_f = v == 0 or 1e-6 <= abs(v) < 1e21
    if not exp and use_f:
        return shortest
    # normalize to digits + exponent
    import decimal

    d = decimal.Decimal(shortest)
    sign, digits, dexp = d.as_tuple()
    digits_str = "".join(map(str, digits)).rstrip("0") or "0"
    ndigits = len(digits_str)
    # exponent of the leading digit (scientific): value = 0.d1d2... * 10^(point)
    point = len(digits) + dexp  # position of decimal point in digit string
    if use_f:
        if point <= 0:
            body = "0." + "0" * (-point) + digits_str
        elif point >= ndigits:
            body = digits_str + "0" * (point - ndigits)
        else:
            body = digits_str[:point] + "." + digits_str[point:]
        return ("-" if sign else "") + body
    e = point - 1
    mant_str = digits_str[0] + ("." + digits_str[1:] if ndigits > 1 else "")
    return ("-" if sign else "") + f"{mant_str}e{'+' if e >= 0 else '-'}{abs(e)}"


def _encode_value(v, indent: str, depth: int, parts: list) -> None:
    if v is None:
        parts.append("null")
    elif isinstance(v, bool):
        parts.append("true" if v else "false")
    elif isinstance(v, str):
        parts.append(_escape_string(v))
    elif isinstance(v, int):
        parts.append(str(v))
    elif isinstance(v, float):
        parts.append(go_float(v))
    elif isinstance(v, (list, tuple)):
        if not v:
            parts.append("[]")
            return
        parts.append("[")
        for i, item in enumerate(v):
            if i:
                parts.append(",")
            _newline(parts, indent, depth + 1)
            _encode_value(item, indent, depth + 1, parts)
        _newline(parts, indent, depth)
        parts.append("]")
    elif isinstance(v, dict):
        if not v:
            parts.append("{}")
            return
        parts.append("{")
        keys = sorted(v.keys())  # Go map marshal sorts keys
        for i, k in enumerate(keys):
            if i:
                parts.append(",")
            _newline(parts, indent, depth + 1)
            parts.append(_escape_string(k))
            parts.append(": " if indent else ":")
            _encode_value(v[k], indent, depth + 1, parts)
        _newline(parts, indent, depth)
        parts.append("}")
    else:
        raise TypeError(f"unsupported value in schema: {type(v)}")


def _newline(parts: list, indent: str, depth: int) -> None:
    if indent:
        parts.append("\n" + indent * depth)


def _encode_schema(schema: dict, indent: str, depth: int, parts: list) -> None:
    """Encode a schema dict honoring the Go struct field order."""
    present = [k for k in FIELD_ORDER if k in schema and not _omit(k, schema[k])]
    if not present:
        parts.append("{}")
        return
    parts.append("{")
    for i, k in enumerate(present):
        if i:
            parts.append(",")
        _newline(parts, indent, depth + 1)
        parts.append(_escape_string(k))
        parts.append(": " if indent else ":")
        v = schema[k]
        if k == "properties":
            # map[string]*Schema: sorted keys, schema-ordered values
            parts.append("{")
            pkeys = sorted(v.keys())
            for j, pk in enumerate(pkeys):
                if j:
                    parts.append(",")
                _newline(parts, indent, depth + 2)
                parts.append(_escape_string(pk))
                parts.append(": " if indent else ":")
                _encode_schema(v[pk], indent, depth + 2, parts)
            _newline(parts, indent, depth + 1)
            parts.append("}")
        elif k == "items":
            _encode_schema(v, indent, depth + 1, parts)
        else:
            _encode_value(v, indent, depth + 1, parts)
    _newline(parts, indent, depth)
    parts.append("}")


# Fields whose Go type is `any` (type, const, example) or a pointer
# (items, additionalProperties): omitempty only drops nil — an interface
# holding "" or false IS emitted ("type":"" for a never-observed node).
_ANY_FIELDS = frozenset({"type", "const", "example", "items", "additionalProperties"})


def _omit(field: str, v) -> bool:
    """Go omitempty per the Schema struct's field types (schema.go:6-16)."""
    if v is None:
        return True
    if field in _ANY_FIELDS:
        return False
    # string fields ($schema, format): omit ""; slices/maps: omit empty
    return v == "" or (isinstance(v, (list, dict)) and not v)


def render_schema(schema: dict, indent: str = "") -> str:
    """Render exactly as Generate() returns it (compact unless indent;
    no trailing newline)."""
    parts: list = []
    _encode_schema(schema, indent, 0, parts)
    return "".join(parts)


def render_schema_to(schema: dict, w, indent: str = "") -> None:
    """GenerateTo parity: encoder output INCLUDING the trailing newline
    (jsonschema.go:152-160 does not strip it)."""
    w.write(render_schema(schema, indent) + "\n")


# --- load / resume (reference Load, jsonschema.go:178-285) -------------------


def parse_schema(schema_json: str) -> dict:
    schema = json.loads(schema_json)
    if not isinstance(schema, dict):
        raise ValueError("schema must be a JSON object")
    return schema


def load_schema_into_state(schema: dict, parent_sample_count: int = 1) -> dict:
    """Reverse-engineer a schema into an observation state with synthetic
    counts (loadSchemaIntoNode, jsonschema.go:212-285): root count=1,
    required child = parent count, optional child = parent-1 clamped >=1,
    array items inherit, loaded string format pre-seeded so it always
    survives elimination (the Go always-true detector, jsonschema.go:278-282).
    Precision is explicitly lost (reference ARCHITECTURE.md:406-420)."""
    from ..operators.state import new_state

    t = schema.get("type")
    if isinstance(t, str):
        type_str = t
    elif isinstance(t, list):
        type_str = next((x for x in t if isinstance(x, str) and x != "null"), "")
        if not type_str:
            raise ValueError(f"unsupported type format: {t!r}")
    else:
        raise ValueError(f"unsupported type format: {type(t)}")

    node = new_state()
    node["types"][type_str] = parent_sample_count
    node["n"] = parent_sample_count

    if type_str == "array" and schema.get("items"):
        node["items"] = load_schema_into_state(schema["items"], parent_sample_count)

    if type_str == "object" and schema.get("properties"):
        required = set(schema.get("required") or [])
        for key, prop in schema["properties"].items():
            child_count = parent_sample_count
            if key not in required:
                child_count = max(parent_sample_count - 1, 1)
            node["props"][key] = load_schema_into_state(prop, child_count)

    if type_str == "string" and schema.get("format"):
        node["fmts"] = [schema["format"]]
        node["locked_fmts"] = [schema["format"]]
        node["str_n"] = parent_sample_count

    return node


def load_schema(schema_json: str) -> tuple:
    """Load() parity: returns (state, cached_schema_dict). Errors unless the
    root is an object schema (jsonschema.go:185-187)."""
    schema = parse_schema(schema_json)
    if schema.get("type") != "object":
        raise ValueError(
            f"only object schemas can be loaded, got: {schema.get('type')!r}"
        )
    state = load_schema_into_state(schema, 1)
    return state, schema

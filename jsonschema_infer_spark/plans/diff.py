"""Schema-level drift: structural diff between two inferred JSON Schemas.

The reference evolves a schema by loading a previous one and folding new
samples into it (`Load`, /root/reference/jsonschema.go:109-142) — evolution
happens silently inside the merge. At validation tier the operator teams
actually want is the REPORT: what changed between the schema inferred on
snapshot A and the one inferred on snapshot B (new fields, dropped fields,
type widenings, formats that stopped holding, consts that shattered). This
module is the dual of operators/drift.py: drift.py compares value
distributions, diff.py compares the inferred shapes.

Works on the plain JSON-Schema dicts produced by ``state.finalize`` /
``to_schema`` / ``plans.render.load_schema`` — and therefore on any
draft-06/07 schema the reference itself would emit.

Pure driver-side logic by design: schemas are O(columns), never O(rows);
the distributed work already happened in the two inference folds.
"""

from __future__ import annotations

import json


def _norm_type(t) -> tuple:
    """'integer' vs ['integer','string'] -> comparable sorted tuple."""
    if t is None:
        return ()
    if isinstance(t, str):
        return (t,)
    return tuple(sorted(t))


def _fmt(v) -> str | None:
    """Render a schema fragment value for the diff record (stable JSON)."""
    if v is None:
        return None
    return json.dumps(v, sort_keys=True, separators=(",", ":"))


def schema_diff(a: dict | None, b: dict | None, path: str = "$") -> list[dict]:
    """Change records between schema ``a`` (before) and ``b`` (after).

    Each record is ``{"path", "change", "before", "after"}`` with
    ``change`` one of: property_added, property_removed, type_changed,
    format_added, format_removed, format_changed, const_added,
    const_removed, const_changed, required_added, required_removed.
    Output is sorted by (path, change, before, after) — deterministic for
    tests, oracles and report sinks. ``example`` is ignored: it is
    first-sample provenance, not shape."""
    out: list[dict] = []
    # draft-06/07 allows non-object sub-schemas: boolean schemas (true /
    # false) and list-valued "items" (tuple validation). Those have no
    # keyword structure to recurse into — compare them wholesale.
    if not isinstance(a, (dict, type(None))) or not isinstance(b, (dict, type(None))):
        if _fmt(a) != _fmt(b):
            return [
                {
                    "path": path,
                    "change": "schema_changed",
                    "before": _fmt(a),
                    "after": _fmt(b),
                }
            ]
        return []
    a, b = a or {}, b or {}

    ta, tb = _norm_type(a.get("type")), _norm_type(b.get("type"))
    if ta != tb:
        out.append(
            {
                "path": path,
                "change": "type_changed",
                "before": _fmt(a.get("type")),
                "after": _fmt(b.get("type")),
            }
        )

    for key, label in (("format", "format"), ("const", "const")):
        va_present, vb_present = key in a, key in b
        va, vb = a.get(key), b.get(key)
        if va_present and not vb_present:
            out.append(
                {"path": path, "change": f"{label}_removed", "before": _fmt(va), "after": None}
            )
        elif vb_present and not va_present:
            out.append(
                {"path": path, "change": f"{label}_added", "before": None, "after": _fmt(vb)}
            )
        elif va_present and vb_present and va != vb:
            out.append(
                {
                    "path": path,
                    "change": f"{label}_changed",
                    "before": _fmt(va),
                    "after": _fmt(vb),
                }
            )

    req_a, req_b = set(a.get("required", ())), set(b.get("required", ()))
    for name in req_b - req_a:
        out.append(
            {"path": f"{path}.{name}", "change": "required_added", "before": None, "after": None}
        )
    for name in req_a - req_b:
        out.append(
            {"path": f"{path}.{name}", "change": "required_removed", "before": None, "after": None}
        )

    props_a, props_b = a.get("properties", {}), b.get("properties", {})
    _type_of = lambda p: p.get("type") if isinstance(p, dict) else p  # noqa: E731
    for name in props_b.keys() - props_a.keys():
        out.append(
            {
                "path": f"{path}.{name}",
                "change": "property_added",
                "before": None,
                "after": _fmt(_type_of(props_b[name])),
            }
        )
    for name in props_a.keys() - props_b.keys():
        out.append(
            {
                "path": f"{path}.{name}",
                "change": "property_removed",
                "before": _fmt(_type_of(props_a[name])),
                "after": None,
            }
        )
    for name in props_a.keys() & props_b.keys():
        out.extend(schema_diff(props_a[name], props_b[name], f"{path}.{name}"))

    if "items" in a or "items" in b:
        out.extend(schema_diff(a.get("items"), b.get("items"), f"{path}[]"))

    out.sort(key=lambda r: (r["path"], r["change"], r["before"] or "", r["after"] or ""))
    return out


def schema_diff_df(spark, a: dict | None, b: dict | None):
    """schema_diff as a stable-schema DataFrame (driver-query / sink form)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [
            StructField("path", StringType()),
            StructField("change", StringType()),
            StructField("before", StringType()),
            StructField("after", StringType()),
        ]
    )
    rows = [
        (r["path"], r["change"], r["before"], r["after"]) for r in schema_diff(a, b)
    ]
    return spark.createDataFrame(rows, schema)


def schema_path_rows(schema: dict | None) -> list[tuple]:
    """Explode an inferred JSON Schema into (path, type, required, format)
    rows — the row-form of the nested fold, comparable against an external
    derivation of the same rules from the raw data (required = the
    count-equality rule node.go:215, types = the observe lattice incl. the
    int64 round-trip demotion node.go:296-301, format = regex survivorship
    node.go:110-121). Paths use the same convention as ``schema_diff``:
    dots for object properties, ``[]`` suffix for array items (items carry
    ``required=False`` — the items node itself has no required flag).
    ``type`` is stringified verbatim (``str(['integer', 'number'])`` for
    unions; ``''`` for the null-only-property quirk), matching what a
    byte-render would emit. Driver-side: O(schema nodes), never O(rows)."""
    rows: list[tuple] = []

    def walk(prefix: str, node: dict) -> None:
        req = set(node.get("required", []))
        for name in sorted(node.get("properties", {})):
            child = node["properties"][name]
            path = f"{prefix}.{name}" if prefix else name
            rows.append(
                (path, str(child.get("type")), name in req,
                 child.get("format", ""))
            )
            walk(path, child)
        if "items" in node:
            item = node["items"]
            path = f"{prefix}[]"
            rows.append(
                (path, str(item.get("type")), False, item.get("format", ""))
            )
            walk(path, item)

    if schema:
        walk("", schema)
    rows.sort(key=lambda r: r[0])
    return rows

"""Adaptive columnar inference: JVM aggregation with a sample probe.

The classic ``infer_dataframe`` fold ships EVERY column's bytes through
Arrow to Python. Profiling shows the pure fold is ~10% of that stage; the
rest is scan + JVM->Python transfer. For FLAT tables (all primitive
columns — the transcript shape) almost all of SchemaState has a closed
form in built-in Spark aggregates:

* type counts        — static from the Spark type (+ an integral-count
                       aggregate for doubles: the reference demotes
                       integral float64 to "integer", node.go:296-301)
* required/optional  — count(col) vs count(*)
* const              — global min == max (with NaN guards)
* numeric/len ranges — min/max aggregates
* timestamp columns  — semantically RFC 3339 strings; render length has a
                       closed form over microsecond fractions

Three state components are NOT closed-form — format candidates, the
bounded distinct set, and const across mixed batches — but all three are
MONOTONE under observation: a format candidate eliminated by any subset of
rows is eliminated globally; a distinct set that overflowed on a subset is
overflowed globally. So a cheap exact fold over a SAMPLE yields proofs of
death that hold for the full table, and only the survivors need full-data
verification:

  pass 0 (probe):    exact arrow fold over ~sample_rows rows (monotone
                     facts only: dead formats, overflowed distincts)
  pass 1 (JVM agg):  one scan, no Python — everything closed-form
  pass 2 (distinct): count_distinct + collect_set for columns the probe
                     left alive (column-pruned scan, tiny)
  pass 3 (formats):  arrow fold of ONLY the string columns with surviving
                     candidates, evaluating ONLY those detectors

The assembled SchemaState is value-identical to the classic fold's (tests
byte-compare the rendered schemas and compare states), while the scan
stays in whole-stage codegen and the Python boundary carries kilobytes.

MEASURED TRADEOFF (10.4M-row transcript table, interleaved A/B): the
classic arrow fold is scan-bound — parquet decode dominates, and this
mode pays that scan 2-3x (probe + agg + distinct passes): columnar ~27s
vs adaptive ~38s at local[1], ~4.6s vs ~5.4s at local[8]. So ``columnar``
remains the default; this mode earns its keep as (a) the faster choice
when the Python boundary, not the scan, dominates (very wide tables,
non-columnar sources, expensive IPC), and (b) an independently-derived
oracle for the fold — two disjoint implementations agreeing on byte-level
output is strong evidence for both (tests/test_infer_adaptive.py).

Falls back to the classic fold for nested columns, custom formats (their
detectors must see real strings, including timestamp renderings),
``max_samples`` (Spark's limit is not deterministic across jobs) and
examples capture.
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..config import InferConfig, default_config
from ..operators import state as S
from ..operators.infer_spark import (
    InferResult,
    _eliminate_formats,
    _render_ts_us,
    fold_batches_columnar,
)
from ..plans.render import render_schema

_SAMPLE_ROWS = 8192

_SIMPLE = {
    T.BooleanType: "boolean",
    T.ByteType: "integer",
    T.ShortType: "integer",
    T.IntegerType: "integer",
    T.LongType: "integer",
    T.StringType: "string",
    T.BinaryType: "binary",
    T.DoubleType: "double",
    T.FloatType: "double",
}


def _kind(dtype) -> str | None:
    if isinstance(dtype, T.DecimalType):
        return "double"
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(dtype, T.DateType):
        return "date"
    return _SIMPLE.get(type(dtype))


def adaptive_applicable(df: DataFrame, config: InferConfig) -> bool:
    if config.max_samples > 0 or config.examples:
        return False
    builtin = {"date-time", "email", "uuid", "ipv6", "ipv4", "uri"}
    if any(name not in builtin for name in config.format_names()):
        # custom detectors are opaque Python — they must see every string
        return False
    return all(_kind(f.dataType) is not None for f in df.schema.fields)


def _ts_micros(c: str, dtype) -> F.Column:
    col = F.col(c)
    if isinstance(dtype, T.TimestampNTZType):
        # session tz is UTC in all our launch configs; NTZ values are
        # treated as UTC by the arrow fold as well
        col = col.cast("timestamp")
    return F.unix_micros(col)


def _ts_render_len(us: F.Column) -> F.Column:
    # extra chars = 1 ('.') + (6 - trailing zeros of the 6-digit fraction);
    # frac=500000 renders ".5" -> 2 (asserted against _render_ts_us in tests)
    frac = F.pmod(us, F.lit(1_000_000))
    fl = (
        F.when(frac == 0, 0)
        .when(frac % 100_000 == 0, 2)
        .when(frac % 10_000 == 0, 3)
        .when(frac % 1_000 == 0, 4)
        .when(frac % 100 == 0, 5)
        .when(frac % 10 == 0, 6)
        .otherwise(7)
    )
    return F.lit(20) + fl


def _agg_exprs(c: str, kind: str, dtype, need_const: bool) -> list:
    """Aggregates for one column. ``need_const`` is False when the probe
    already saw the const latch differ (monotone: differ on any subset =>
    differ globally), which lets us drop the min/max byte-comparison over
    wide string columns — the single most expensive aggregate."""
    q = f"`{c}`"
    col = F.col(q)
    out = [F.count(col).alias(f"{c}__n")]
    if kind == "integer":
        out += [F.min(col).alias(f"{c}__mn"), F.max(col).alias(f"{c}__mx")]
    elif kind == "double":
        d = col.cast("double")
        finite = d.isNotNull() & ~F.isnan(d) & (F.abs(d) != F.lit(float("inf")))
        # Go demotion = int64 round-trip (node.go:296-301): Spark's floor()
        # clamps to Long range so floor(d)==d already rejects |d| > 2^63,
        # but at exactly d == 2^63 the clamped long rounds back equal —
        # the explicit range bound keeps that edge "number" like Go
        go_int = (
            finite
            & (F.floor(d) == d)
            & (d >= F.lit(S.INT64_MIN_F))
            & (d < F.lit(S.INT64_MAX_EXCL_F))
        )
        out += [
            F.sum(F.when(go_int, 1).otherwise(0)).alias(f"{c}__nint"),
            F.sum(F.when(F.isnan(d), 1).otherwise(0)).alias(f"{c}__nnan"),
            F.min(F.when(~F.isnan(d), d)).alias(f"{c}__mn"),
            F.max(F.when(~F.isnan(d), d)).alias(f"{c}__mx"),
        ]
    elif kind == "boolean":
        out += [F.min(col).alias(f"{c}__mn"), F.max(col).alias(f"{c}__mx")]
    elif kind == "string":
        out += [
            F.min(F.length(col)).alias(f"{c}__lmn"),
            F.max(F.length(col)).alias(f"{c}__lmx"),
        ]
        if need_const:
            out += [F.min(col).alias(f"{c}__mn"), F.max(col).alias(f"{c}__mx")]
    elif kind == "timestamp":
        us = _ts_micros(c, dtype)
        rl = F.when(col.isNotNull(), _ts_render_len(us))
        out += [
            F.min(us).alias(f"{c}__mn"),
            F.max(us).alias(f"{c}__mx"),
            F.min(rl).alias(f"{c}__lmn"),
            F.max(rl).alias(f"{c}__lmx"),
        ]
    elif kind == "date":
        out += [
            F.min(col.cast("string")).alias(f"{c}__mn"),
            F.max(col.cast("string")).alias(f"{c}__mx"),
        ]
    # binary: count only
    return out


def _format_verify(df: DataFrame, candidates: dict, config: InferConfig) -> dict:
    """Exact survivor set per column: fold only the named columns, only the
    sample-surviving candidates, intersect across partitions."""
    import json as _json

    if not candidates:
        return {}
    cols = sorted(candidates)
    init = dict(candidates)

    def fold(batches):
        sts = {c: {"fmts": list(init[c]), "locked_fmts": []} for c in cols}
        for batch in batches:
            for i, f in enumerate(batch.schema):
                st = sts[f.name]
                if not st["fmts"]:
                    continue
                vals = batch.column(i).drop_null()
                if len(vals):
                    _eliminate_formats(st, vals, config)
        yield pa.RecordBatch.from_pydict(
            {"payload": pa.array([_json.dumps({c: sts[c]["fmts"] for c in cols})])}
        )

    rows = (
        df.select(*[F.col(f"`{c}`") for c in cols])
        .mapInArrow(fold, "payload string")
        .collect()
    )
    out = {}
    for c in cols:
        survivors = list(init[c])
        for r in rows:
            part = set(_json.loads(r.payload)[c])
            survivors = [f for f in survivors if f in part]
        out[c] = survivors
    return out


def _probe(df: DataFrame, config: InferConfig, sample_rows: int):
    """Exact fold over the table head (limit is pushed into the scan, so
    this touches one file split). A clustered layout can leave facts
    falsely ALIVE (e.g. conv-sorted data shows 2 conv_ids in 8k rows) —
    never falsely dead, so exactness is safe; the cost of a falsely-alive
    distinct column is filtered by the approx_count_distinct prefilter in
    pass 1 instead of an expensive exact pass."""
    batches = df.limit(sample_rows).toArrow().to_batches()
    st, rows = fold_batches_columnar(iter(batches), config)
    return st, rows


def infer_dataframe_adaptive(
    df: DataFrame,
    config: InferConfig | None = None,
    sample_rows: int = _SAMPLE_ROWS,
) -> InferResult:
    import time

    t0 = time.time()
    config = config or default_config()
    if not adaptive_applicable(df, config):
        raise ValueError(
            "adaptive inference requires flat primitive columns, built-in "
            "formats only, no max_samples/examples — use mode='columnar'"
        )
    fields = [(f.name, _kind(f.dataType), f.dataType) for f in df.schema.fields]

    # pass 0: probe — monotone facts only
    probe_state, probe_rows = _probe(df, config, sample_rows)
    probes = probe_state["props"]

    # pass 1: one JVM aggregation for all closed-form components; for
    # probe-alive distinct columns also an approx cardinality (a normal
    # aggregate — unlike count_distinct it adds no Expand to the plan),
    # used only as a prefilter: exact counting still gates the value set
    exprs = [F.count(F.lit(1)).alias("__total")]
    const_dead = set()
    probe_alive = set()
    for c, kind, dtype in fields:
        p = probes.get(c)
        dead = kind == "string" and p is not None and p["const_differ"]
        if dead:
            const_dead.add(c)
        exprs += _agg_exprs(c, kind, dtype, need_const=not dead)
        if kind != "binary" and (p is None or p["distinct"] is not None):
            probe_alive.add(c)
            exprs.append(
                F.approx_count_distinct(F.col(f"`{c}`")).alias(f"{c}__approx")
            )
    row = df.agg(*exprs).collect()[0].asDict()
    total = row["__total"]

    # distinct candidates: probe still alive AND approx cardinality within
    # 2x of the budget (5% rsd at 64 is +-a few — 2x is a safe margin; a
    # truly-small set can never be approximated above 2x the budget)
    live_distinct = []
    for c, kind, dtype in fields:
        if c not in probe_alive or row[f"{c}__n"] == 0:
            continue
        if kind == "double" and row[f"{c}__nnan"] > 0:
            continue  # NaN kills the distinct set in the fold
        if row[f"{c}__approx"] <= 2 * S.DISTINCT_LIMIT:
            live_distinct.append((c, kind, dtype))

    # pass 2a: exact cardinality for the survivors (column-pruned scan)
    counts = {}
    if live_distinct:
        r = df.agg(
            *[
                F.count_distinct(F.col(f"`{c}`")).alias(c)
                for c, _, _ in live_distinct
            ]
        ).collect()[0]
        counts = {c: r[c] for c, _, _ in live_distinct}
    small = [
        (c, kind, dtype)
        for c, kind, dtype in live_distinct
        if counts[c] <= S.DISTINCT_LIMIT
    ]
    # pass 2b: the actual value sets (tiny by construction)
    sets = {}
    if small:
        r = df.agg(
            *[F.collect_set(F.col(f"`{c}`")).alias(c) for c, _, _ in small]
        ).collect()[0]
        sets = {c: r[c] for c, _, _ in small}

    # pass 3: format survivors for string columns the probe left alive
    names = config.format_names()
    need_verify = {}
    for c, kind, dtype in fields:
        if kind != "string" or row[f"{c}__n"] == 0:
            continue
        p = probes.get(c)
        cand = list(names) if p is None or p["fmts"] is None else list(p["fmts"])
        if cand:
            need_verify[c] = cand
    fmt_survivors = _format_verify(df, need_verify, config)

    # assemble the root SchemaState
    root = S.new_state()
    root["n"] = total
    root["types"]["object"] = total
    for c, kind, dtype in fields:
        st = S.new_state()
        root["props"][c] = st
        n = row[f"{c}__n"]
        if n == 0:
            continue
        st["n"] = n

        if kind == "integer":
            st["types"]["integer"] = n
            mn, mx = int(row[f"{c}__mn"]), int(row[f"{c}__mx"])
            st["num_min"], st["num_max"] = float(mn), float(mx)
            if mn == mx:
                st["const"], st["const_set"] = ("integer", mn), True
            else:
                st["const_differ"] = True
            tagger = lambda v: ("integer", int(v))

        elif kind == "double":
            n_int = int(row[f"{c}__nint"])
            n_nan = int(row[f"{c}__nnan"])
            if n_int:
                st["types"]["integer"] = n_int
            if n - n_int:
                st["types"]["number"] = n - n_int
            if row[f"{c}__mn"] is not None:
                st["num_min"] = float(row[f"{c}__mn"])
                st["num_max"] = float(row[f"{c}__mx"])
            if n_nan:
                if n > 1:
                    st["const_differ"] = True
                else:
                    st["const"], st["const_set"] = ("number", float("nan")), True
            elif row[f"{c}__mn"] == row[f"{c}__mx"]:
                v = float(row[f"{c}__mn"])
                integral = S.is_go_integral(v)
                st["const"] = ("integer", int(v)) if integral else ("number", v)
                st["const_set"] = True
            else:
                st["const_differ"] = True

            def tagger(v):
                fv = float(v)
                if S.is_go_integral(fv):
                    return ("integer", int(fv))
                return ("number", fv)

        elif kind == "boolean":
            st["types"]["boolean"] = n
            mn, mx = row[f"{c}__mn"], row[f"{c}__mx"]
            if mn == mx:
                st["const"], st["const_set"] = ("boolean", bool(mn)), True
            else:
                st["const_differ"] = True
            tagger = lambda v: ("boolean", bool(v))

        elif kind == "string":
            st["types"]["string"] = n
            st["str_n"] = n
            st["len_min"] = int(row[f"{c}__lmn"])
            st["len_max"] = int(row[f"{c}__lmx"])
            if c in const_dead:
                st["const_differ"] = True
            elif row[f"{c}__mn"] == row[f"{c}__mx"]:
                st["const"], st["const_set"] = ("string", row[f"{c}__mn"]), True
            else:
                st["const_differ"] = True
            st["fmts"] = fmt_survivors.get(c, [])
            tagger = lambda v: ("string", v)

        elif kind == "timestamp":
            st["types"]["string"] = n
            st["str_n"] = n
            st["len_min"] = int(row[f"{c}__lmn"])
            st["len_max"] = int(row[f"{c}__lmx"])
            mn, mx = int(row[f"{c}__mn"]), int(row[f"{c}__mx"])
            if mn == mx:
                st["const"], st["const_set"] = ("string", _render_ts_us(mn)), True
            else:
                st["const_differ"] = True
            st["fmts"] = ["date-time"] if "date-time" in names else []
            tagger = lambda v: ("string", _render_ts_us(int(v)))

        elif kind == "date":
            st["types"]["string"] = n
            st["str_n"] = n
            st["len_min"] = st["len_max"] = 10
            mn, mx = row[f"{c}__mn"], row[f"{c}__mx"]
            if mn == mx:
                st["const"], st["const_set"] = ("string", mn), True
            else:
                st["const_differ"] = True
            # all renderings share the YYYY-MM-DD shape: one driver probe
            # (mirrors the fold's single-probe elimination)
            fst = {"fmts": list(names), "locked_fmts": []}
            _eliminate_formats(fst, pa.array([mn]), config)
            st["fmts"] = fst["fmts"]
            tagger = lambda v: ("string", v)

        elif kind == "binary":
            st["types"]["string"] = n
            st["const_differ"], st["const"] = True, None
            st["distinct"] = None
            continue

        # distinct assembly (binary handled above)
        if c in sets:
            vals = sets[c]
            if kind == "timestamp":
                # collect_set returns datetimes; go through micros
                r2 = (
                    df.select(_ts_micros(c, dtype).alias("us"))
                    .where(F.col("us").isNotNull())
                    .distinct()
                    .collect()
                )
                st["distinct"] = [tagger(x.us) for x in r2]
            else:
                st["distinct"] = [tagger(v) for v in vals]
            if len(st["distinct"]) > S.DISTINCT_LIMIT:
                st["distinct"] = None
        else:
            st["distinct"] = None

    schema = S.finalize(root, config)
    return InferResult(
        state=root,
        config=config,
        schema=schema,
        schema_json=render_schema(schema, config.indent),
        total_rows=total,
        partitions=[],
        wall_secs=time.time() - t0,
    )

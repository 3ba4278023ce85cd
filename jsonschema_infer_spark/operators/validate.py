"""Constraint compilation + vectorized validation.

The reference plans but never implements validation
(`/root/reference/FEATURES.md:172-174`); the north_rule mandates it. The
inferred schema (plus the SchemaState's constraint-mining extensions) is
compiled into built-in Spark Column predicates — NO per-row Python anywhere
(input_hint mandate): every check is a Catalyst expression eligible for
whole-stage codegen, predicate pushdown and column pruning.

Check taxonomy (SURVEY.md §2.5):
- row checks: required non-null, format regex, const equality, enum
  membership, numeric range, string length — compiled per column;
- key checks: uniqueness on (conv_id, turn_idx) — groupBy partial-agg
  (map-side combine; skew-tolerant) + semi-join for violating rows;
- ordering checks: dense turn_idx 0..n-1 per conv via pure aggregation
  (min/max/count/count_distinct — no window, no skew problem), plus ts
  monotonicity via a per-conv window (bounded group: a conversation's
  length is bounded, so the window never sees a pathological partition);
- per-partition verdicts over a deterministic bucket of conv_id (stable
  lineage for the checkpoint manifest).
"""

from __future__ import annotations

import re
import threading
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType

# --- format name -> Spark-side regex (JVM rlike; approximations are exact on
# the subsets the corresponding Python detectors accept — property-tested)

RX_EMAIL = r"^[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}$"
RX_UUID = (
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[1-5][0-9a-fA-F]{3}"
    r"-[89abAB][0-9a-fA-F]{3}-[0-9a-fA-F]{12}$"
)
RX_IPV4 = r"^(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}$"
# RFC 4291 textual forms incl. '::' compression and embedded IPv4 tail
_V4 = RX_IPV4[1:-1]
RX_IPV6 = (
    r"^("
    r"([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){1,6}"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:)"
    r"|([0-9A-Fa-f]{1,4}:){6}" + _V4
    + r"|([0-9A-Fa-f]{1,4}:){1,5}:" + _V4
    + r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4})?:" + _V4
    + r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){0,2}:" + _V4
    + r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){0,3}:" + _V4
    + r"|[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){0,4}:" + _V4
    + r"|:((:[0-9A-Fa-f]{1,4}){0,5}:" + _V4 + r"|:" + _V4 + r")"
    + r")$"
)
RX_DATETIME = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(Z|[+-]\d{2}:\d{2})$"
)
RX_URI = r"^(https?|ftps?)://([^/?#\s]*@)?[^/?#@\s:][^/?#\s]*.*$"


def format_predicate(col: Column, fmt: str, dtype=None) -> Column | None:
    """True iff the (non-null) value conforms to ``fmt``. Returns None when
    the format has no Spark-side check (unknown custom format)."""
    if fmt == "date-time":
        if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
            return F.lit(True)  # a temporal column is RFC 3339 by rendering
        return col.rlike(RX_DATETIME) & F.try_to_timestamp(col).isNotNull()
    if fmt == "email":
        return col.rlike(RX_EMAIL)
    if fmt == "uuid":
        return col.rlike(RX_UUID)
    if fmt == "ipv4":
        return col.rlike(RX_IPV4)
    if fmt == "ipv6":
        return col.rlike(RX_IPV6)
    if fmt == "uri":
        return col.rlike(RX_URI)
    return None


@dataclass
class Constraint:
    name: str  # e.g. "required:role", "format:ts:date-time"
    column: str
    kind: str  # required | format | const | enum | range | length
    predicate: Column  # True = row conforms (nulls pass unless required)


_KNOWN_FORMATS = {"date-time", "email", "uuid", "ipv4", "ipv6", "uri"}


def constraint_spec(
    schema: dict,
    state: dict | None = None,
    temporal_cols: set | None = None,
    enum_max: int = 16,
    with_ranges: bool = False,
    with_lengths: bool = False,
) -> list:
    """PURE-PYTHON constraint plan: what compile_constraints will build,
    as plain tuples (no py4j, no Spark session). Two uses: (a) the build
    half (`build_constraints`) turns it into Column predicates; (b) two
    specs compare with ``==`` — the prewarm path predicts the spec from a
    one-row-group sample and reuses its already-built (and codegen-warmed)
    constraints when the full-data spec lands identical.

    ``temporal_cols``: column names whose Spark/Arrow type is a
    timestamp/date (their date-time format check folds to TRUE — a
    temporal column is RFC 3339 by rendering)."""
    if schema.get("type") != "object":
        raise ValueError("row validation requires an object root schema")
    temporal = temporal_cols or set()
    required = set(schema.get("required") or [])
    out: list = []
    for name, prop in (schema.get("properties") or {}).items():
        if name in required:
            out.append(("required", name))
        fmt = prop.get("format")
        if fmt:
            out.append(
                (
                    "format",
                    name,
                    fmt,
                    # only date-time folds to TRUE on temporal columns
                    name in temporal and fmt == "date-time",
                    fmt in _KNOWN_FORMATS,
                )
            )
        if "const" in prop:
            out.append(("const", name, prop["const"]))
        st = (state or {}).get("props", {}).get(name) if state else None
        if st is not None:
            if (
                st["distinct"] is not None
                and 0 < len(st["distinct"]) <= enum_max
                and "const" not in prop
                and prop.get("type") in ("string", "integer", "boolean")
            ):
                out.append(
                    ("enum", name, tuple(v for _, v in st["distinct"]))
                )
            if with_ranges and st["num_min"] is not None:
                out.append(("range", name, st["num_min"], st["num_max"]))
            if with_lengths and st["len_min"] is not None:
                out.append(("length", name, st["len_min"], st["len_max"]))
    return out


def build_constraints(spec: list, custom_predicates: dict | None = None) -> list:
    """Build Column predicates from a `constraint_spec` plan (the py4j
    half — each expression node is a JVM round trip, ~0.5 s for a typical
    table, which is why the prewarm path builds off the critical path)."""
    out: list = []
    nullsafe = lambda c, p: c.isNull() | p  # noqa: E731
    for entry in spec:
        kind, name = entry[0], entry[1]
        col = F.col(name)
        if kind == "required":
            out.append(
                Constraint(f"required:{name}", name, "required", col.isNotNull())
            )
        elif kind == "format":
            fmt, temporal, known = entry[2], entry[3], entry[4]
            if known:
                pred = F.lit(True) if temporal else format_predicate(col, fmt)
            elif custom_predicates and fmt in custom_predicates:
                pred = custom_predicates[fmt](col)
            else:
                pred = None
            if pred is not None:
                out.append(
                    Constraint(
                        f"format:{name}:{fmt}", name, "format", nullsafe(col, pred)
                    )
                )
        elif kind == "const":
            out.append(
                Constraint(
                    f"const:{name}", name, "const",
                    nullsafe(col, col == F.lit(entry[2])),
                )
            )
        elif kind == "enum":
            out.append(
                Constraint(
                    f"enum:{name}", name, "enum",
                    nullsafe(col, col.isin(list(entry[2]))),
                )
            )
        elif kind == "range":
            out.append(
                Constraint(
                    f"range:{name}", name, "range",
                    nullsafe(col, col.between(entry[2], entry[3])),
                )
            )
        elif kind == "length":
            out.append(
                Constraint(
                    f"length:{name}", name, "length",
                    nullsafe(col, F.length(col).between(entry[2], entry[3])),
                )
            )
        else:  # pragma: no cover - spec is produced by constraint_spec
            raise ValueError(f"unknown constraint kind {kind!r}")
    return out


class UnsupportedArrowSpec(ValueError):
    """Raised when `arrow_violation_counter` cannot replicate a constraint
    spec entry bit-exactly — the caller must fall back to the Spark
    (Column-predicate) violations pass."""


def _spark_datetime_fields_ok(s: str) -> bool:
    """Field validation mirroring Spark's try_to_timestamp on strings that
    already matched RX_DATETIME (behavior pinned empirically on Spark 4.1:
    real calendar dates in the proleptic calendar — year 0000 is a leap
    year; hour<=23, no leap second; zone offset a valid java.time
    ZoneOffset, i.e. within +/-18:00 with minutes<=59; ANY number of
    fractional digits accepted)."""
    import calendar

    s = s.rstrip("\n")  # '$' admits one trailing newline in both engines
    y, mo, d = int(s[0:4]), int(s[5:7]), int(s[8:10])
    h, mi, sec = int(s[11:13]), int(s[14:16]), int(s[17:19])
    if not (1 <= mo <= 12) or not (1 <= d <= calendar.monthrange(y, mo)[1]):
        return False
    if h > 23 or mi > 59 or sec > 59:
        return False
    if s.endswith("Z"):
        return True
    off = s[-6:]
    oh, om = int(off[1:3]), int(off[4:6])
    return om <= 59 and (oh < 18 or (oh == 18 and om == 0))


def _spark_format_vec(fmt: str):
    """Vectorized (pd.Series[str] -> pd.Series[bool]) mirror of the SPARK
    format predicate (format_predicate's rlike regex, plus the
    try_to_timestamp gate for date-time) — NOT the Go-exact detectors in
    functions/formats (those define inference survivorship; validation
    compares against what the Spark violations pass would say, and the
    two acceptance sets differ outside the detector-accepted subset)."""
    import re as _re

    rx_by_fmt = {
        "email": RX_EMAIL,
        "uuid": RX_UUID,
        "ipv4": RX_IPV4,
        "ipv6": RX_IPV6,
        "uri": RX_URI,
    }
    if fmt == "date-time":
        rx = _re.compile(RX_DATETIME)

        def vec(series):
            ok = series.str.match(rx).fillna(False)
            if ok.any():
                sub = series[ok]
                ok.loc[ok] = [_spark_datetime_fields_ok(v) for v in sub]
            return ok

        return vec
    rx = _re.compile(rx_by_fmt[fmt])
    return lambda series: series.str.match(rx).fillna(False)


def arrow_violation_counter(spec: list, arrow_schema):
    """Vectorized arrow/numpy twin of ``build_constraints`` +
    ``violation_counts``: returns ``(names, count_batch)`` where
    ``count_batch(record_batch)`` yields an int64 numpy vector of
    per-constraint violation counts, bit-equal to the Spark predicates
    (equality fuzz-tested in tests/test_pipeline_fused.py).

    This is what lets the FUSED scan count violations in the same pass
    that infers the schema (see pipeline.infer_and_integrity_parquet's
    ``violation_spec``): when the prewarmed spec prediction matches the
    real inferred spec, the separate whole-table validation scan is
    skipped entirely — at 100 TB that is a full second read of the table.

    Semantics mirrored exactly:
    - required: violation iff NULL (col.isNotNull());
    - format (known detector): NULL passes; temporal-fold entries are
      constant TRUE (0 violations); otherwise a Python mirror of the
      SPARK predicate (format_predicate's rlike regex + the
      try_to_timestamp gate — see _spark_format_vec) judges each
      non-null string;
    - const/enum: NULL passes; non-null must equal / be a member;
    - range: NULL passes; numpy evaluates NOT(lo <= v <= hi) so NaN
      counts as a violation exactly like Spark's three-valued between;
    - length: NULL passes; utf8 character length bounds like F.length.

    Raises UnsupportedArrowSpec for anything whose Spark/arrow semantics
    could diverge (missing column, custom format, const/enum on a column
    type where lit() coercion isn't the identity)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    names: list = []
    checks: list = []
    schema_names = arrow_schema.names

    def _col_index(name: str) -> int:
        if name not in schema_names:
            raise UnsupportedArrowSpec(f"column {name!r} not in scan schema")
        return schema_names.index(name)

    def _is_str(typ) -> bool:
        return pa.types.is_string(typ) or pa.types.is_large_string(typ)

    for entry in spec:
        kind, name = entry[0], entry[1]
        j = _col_index(name)
        typ = arrow_schema.field(name).type
        if pa.types.is_dictionary(typ):  # parquet dict-encoded columns
            typ = typ.value_type
        if kind == "required":

            def fn(arr):
                return arr.null_count

            names.append(f"required:{name}")
            checks.append((j, fn))
        elif kind == "format":
            fmt, temporal, known = entry[2], entry[3], entry[4]
            if not known:
                # build_constraints skips unknown formats without a custom
                # predicate; custom predicates are Column-land — can't
                # guarantee bit-equality here
                raise UnsupportedArrowSpec(f"custom/unknown format {fmt!r}")
            if temporal:

                def fn(arr):
                    return 0

            elif _is_str(typ):
                vec = _spark_format_vec(fmt)

                def fn(arr, vec=vec):
                    vals = arr.drop_null()
                    if len(vals) == 0:
                        return 0
                    s = vals.to_pandas()
                    return int(len(s) - vec(s).sum())

            else:
                raise UnsupportedArrowSpec(
                    f"format {fmt!r} on non-string column {name!r} ({typ})"
                )
            names.append(f"format:{name}:{fmt}")
            checks.append((j, fn))
        elif kind in ("const", "enum"):
            vals = [entry[2]] if kind == "const" else list(entry[2])
            ok = (
                (_is_str(typ) and all(isinstance(v, str) for v in vals))
                or (
                    pa.types.is_integer(typ)
                    and all(
                        isinstance(v, int) and not isinstance(v, bool)
                        for v in vals
                    )
                )
                or (
                    pa.types.is_boolean(typ)
                    and all(isinstance(v, bool) for v in vals)
                )
                or (
                    pa.types.is_floating(typ)
                    and kind == "const"
                    and all(isinstance(v, (int, float)) for v in vals)
                )
            )
            if not ok:
                raise UnsupportedArrowSpec(
                    f"{kind} on {name!r}: values {vals!r} vs column type "
                    f"{typ} would rely on lit() coercion"
                )
            value_set = pa.array(vals, typ)

            def fn(arr, value_set=value_set):
                arr = arr.drop_null()
                if len(arr) == 0:
                    return 0
                hit = pc.sum(pc.is_in(arr, value_set=value_set)).as_py()
                return len(arr) - int(hit or 0)

            names.append(f"{kind}:{name}")
            checks.append((j, fn))
        elif kind == "range":
            lo, hi = entry[2], entry[3]
            if not (
                pa.types.is_integer(typ) or pa.types.is_floating(typ)
            ):
                raise UnsupportedArrowSpec(f"range on non-numeric {name!r}")

            def fn(arr, lo=lo, hi=hi):
                v = arr.drop_null().to_numpy(zero_copy_only=False)
                if len(v) == 0:
                    return 0
                return int((~((v >= lo) & (v <= hi))).sum())

            names.append(f"range:{name}")
            checks.append((j, fn))
        elif kind == "length":
            lo, hi = entry[2], entry[3]
            if not _is_str(typ):
                raise UnsupportedArrowSpec(f"length on non-string {name!r}")

            def fn(arr, lo=lo, hi=hi):
                s = arr.drop_null()
                if len(s) == 0:
                    return 0
                lens = pc.utf8_length(s)
                ok = pc.and_(
                    pc.greater_equal(lens, lo), pc.less_equal(lens, hi)
                )
                return len(s) - int(pc.sum(ok).as_py() or 0)

            names.append(f"length:{name}")
            checks.append((j, fn))
        else:
            raise UnsupportedArrowSpec(f"unknown constraint kind {kind!r}")

    def count_batch(batch) -> "np.ndarray":
        decoded: dict = {}

        def col(j):
            if j not in decoded:
                a = batch.column(j)
                if pa.types.is_dictionary(a.type):
                    a = a.cast(a.type.value_type)
                decoded[j] = a
            return decoded[j]

        return np.array(
            [fn(col(j)) for j, fn in checks], dtype=np.int64
        )

    return names, count_batch


def temporal_columns(df: DataFrame | None) -> set:
    """Names of timestamp/date columns (the set constraint_spec needs)."""
    if df is None:
        return set()
    return {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (TimestampType, TimestampNTZType, DateType))
    }


def compile_constraints(
    schema: dict,
    state: dict | None = None,
    df: DataFrame | None = None,
    enum_max: int = 16,
    with_ranges: bool = False,
    with_lengths: bool = False,
    custom_predicates: dict | None = None,
) -> list:
    """Compile a root object schema (finalize() output) into row constraints.

    ``state`` supplies the mined extensions (enum candidates, numeric and
    length ranges — reference roadmap FEATURES.md:72-94). Range/length checks
    default off: inferred bounds describe the sample, future rows may
    legitimately exceed them; enable explicitly for frozen snapshots.

    Thin wrapper over ``constraint_spec`` (pure plan) + ``build_constraints``
    (py4j expression building) — see those for the prewarm/reuse split.
    """
    return build_constraints(
        constraint_spec(
            schema,
            state=state,
            temporal_cols=temporal_columns(df),
            enum_max=enum_max,
            with_ranges=with_ranges,
            with_lengths=with_lengths,
        ),
        custom_predicates=custom_predicates,
    )


def violations(df: DataFrame, constraints: list, keep_cols: list | None = None) -> DataFrame:
    """Rows failing >=1 constraint, with the failed constraint names.

    One vectorized scan: every predicate is a Column, combined with
    array_compact(array(when(...))) — whole-stage-codegen friendly."""
    flags = [
        F.when(~c.predicate, F.lit(c.name)).otherwise(F.lit(None))
        for c in constraints
    ]
    cols = keep_cols if keep_cols is not None else df.columns
    out = df.select(
        *cols, F.array_compact(F.array(*flags)).alias("violations")
    )
    return out.filter(F.size("violations") > 0)


def violation_examples(
    df: DataFrame,
    constraints: list,
    keep_cols: list,
    k: int = 5,
    order_cols: list | None = None,
) -> DataFrame:
    """Up to ``k`` deterministic example rows per violated constraint —
    the triage view next to ``violation_counts``'s totals: (keep_cols...,
    constraint, example_rank), ordered by ``order_cols`` (default
    keep_cols) so reruns and engines agree on WHICH rows are the examples.

    Scale shape: the window runs over VIOLATING rows only (for healthy
    data a sliver of the table) partitioned by constraint — and Spark 4's
    WindowGroupLimit rewrite inserts a PARTIAL per-partition top-k below
    the exchange (plan-asserted in tests/test_plans.py), so the shuffle
    carries at most k rows per (constraint, input partition) even when a
    constraint fails everywhere. Always-true predicates constant-fold out
    of the plan entirely."""
    v = violations(df, constraints, keep_cols=keep_cols)
    ex = v.select(*keep_cols, F.explode("violations").alias("constraint"))
    from pyspark.sql import Window

    order = order_cols or keep_cols
    w = Window.partitionBy("constraint").orderBy(*order)
    return (
        ex.withColumn("example_rank", F.row_number().over(w))
        .filter(F.col("example_rank") <= k)
    )


# validation_scan mutates SESSION-GLOBAL confs; serialize concurrent scans
# (e.g. ValidationPrewarm's daemon thread vs the main thread) so two
# save/restore windows can never interleave and leave AQE=false pinned for
# the rest of the session. RLock: same-thread nesting stays legal and is
# made safe by the restore-only-if-unchanged logic below.
_SCAN_CONF_LOCK = threading.RLock()


@contextmanager
def validation_scan(
    spark,
    path: str,
    waves: int = 6,
    min_mpb: int = 16 << 20,
    max_mpb: int = 128 << 20,
):
    """Context manager yielding a DataFrame over ``path`` tuned for ONE
    full-table validation pass (``violation_counts`` / ``violating_rows``).

    The two knobs are session-global: concurrent scans are serialized on a
    module lock, and on exit each conf is restored only if its CURRENT
    value is still the one this block set (another thread that set its own
    value in between keeps it). Note any OTHER Spark job launched while a
    scan is open (e.g. the background integrity reduce) runs with these
    confs pinned — correctness is unaffected (AQE off / split size only
    change plan shape), but schedule long concurrent jobs outside the
    block when latency matters.

    Two session knobs are pinned for the duration (and restored on exit —
    they are read at ACTION time, so the collect must happen inside the
    block):

    - ``spark.sql.files.maxPartitionBytes`` sized so the scan yields about
      ``waves`` tasks per core instead of a fixed small value. Splits far
      below the parquet row-group size create tasks that decode nothing
      (a 2.5 GB file with ~11 MB row groups at 8 MiB splits is ~320 tasks,
      a quarter of them empty) — measured 1.4x slower at local[1] AND
      local[4] than right-sized splits on the bench table.
    - ``spark.sql.adaptive.enabled=false``. A whole-table agg has exactly
      one single-row exchange: AQE has nothing to re-plan, and its final-
      stage materialization added multi-second driver stalls in ~1/5 of
      measured runs (steady A/B: 8.3s vs 5.7s at local[1], 2.3s vs 1.7s
      at local[4], outliers to 10s only ever on the AQE side). Joins and
      skewed group-bys still want AQE — this pin is scoped to the
      validation scan only.
    """
    import os

    from .infer_spark import list_parquet_files

    files = list_parquet_files(path)
    # file sizes only (cheap stat, no data read) for the split math
    total = sum(os.path.getsize(f) for f in files)
    cores = spark.sparkContext.defaultParallelism
    mpb = max(min_mpb, min(max_mpb, total // max(cores * waves, 1)))
    with _SCAN_CONF_LOCK:
        keys = ("spark.sql.files.maxPartitionBytes", "spark.sql.adaptive.enabled")
        mine = {
            "spark.sql.files.maxPartitionBytes": str(int(mpb)),
            "spark.sql.adaptive.enabled": "false",
        }
        old = {}
        for k in keys:
            try:
                old[k] = spark.conf.get(k)
            except Exception:
                old[k] = None
        for k, v in mine.items():
            spark.conf.set(k, v)
        try:
            yield spark.read.parquet(path)
        finally:
            for k, v in old.items():
                try:
                    current = spark.conf.get(k)
                except Exception:
                    current = None
                if current != mine[k]:
                    continue  # someone else re-set it; keep their value
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)


def violation_counts(df: DataFrame, constraints: list) -> DataFrame:
    """Per-constraint violation counts in ONE aggregation pass (no explode):
    count(when(not pred)) per constraint, unpivoted to (constraint, n)."""
    aggs = [
        F.count(F.when(~c.predicate, F.lit(1))).alias(c.name) for c in constraints
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c.name}', `{c.name}`" for c in constraints)
    return wide.selectExpr(
        f"stack({len(constraints)}, {stack}) as (constraint, violation_count)"
    )


# --- key uniqueness (SURVEY.md §2.5) -----------------------------------------


def duplicate_keys(df: DataFrame, keys: list) -> DataFrame:
    """Keys appearing more than once. groupBy = map-side partial agg; at
    10^12 rows this shuffles only (key, count) pairs. AQE splits skewed
    reducers; the heavy-hitter keys themselves are exactly what we report."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def duplicate_rows(df: DataFrame, keys: list) -> DataFrame:
    """Full violating rows via LEFT SEMI join against the duplicate keys —
    the small side is duplicates-only, so Spark broadcasts it."""
    dups = duplicate_keys(df, keys).select(*keys)
    return df.join(F.broadcast(dups), on=keys, how="left_semi")


def referential_violations(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str | None = None,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Cross-table referential integrity: child keys with no matching parent
    row, as bounded ``(key, orphan_rows)`` counts rather than the orphan rows
    themselves (report the keys; fetch rows with a semi join when needed).

    Scale shape: the parent side is reduced to DISTINCT keys first, so a
    dimension-sized parent broadcasts and the check costs the child scan plus
    a map-side-combined groupBy of orphans only — no child shuffle before the
    anti join, no row-proportional shuffle after it unless most of the child
    is orphaned (at which point the orphan counts ARE the story). Set
    ``broadcast_parent=False`` for fact-to-fact checks where the key set
    itself is large; AQE then picks the join strategy.

    NULL child keys never match any parent (SQL join semantics) and are
    reported under the NULL key group — a FK column with NULLs surfaces as
    one row instead of disappearing."""
    parent_key = parent_key or child_key
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    return (
        child.join(keys, on=child_key, how="left_anti")
        .groupBy(child_key)
        .agg(F.count(F.lit(1)).alias("orphan_rows"))
    )


# --- referential turn-ordering (SURVEY.md §2.5) --------------------------------


def turn_ordering_violations(
    df: DataFrame, conv_col: str = "conv_id", idx_col: str = "turn_idx"
) -> DataFrame:
    """Conversations whose turn_idx is not dense 0..n-1.

    Pure aggregation — no window, no sort: dense 0..n-1 holds iff
    min==0 AND max==n_distinct-1 AND n_distinct==n (duplicates counted by
    n != n_distinct). Partial aggregation combines map-side, so hot
    conversations cost one reducer row each, not a sort of their turns.

    The distinct count is an explicit two-stage groupBy — (conv, turn)
    pre-aggregation, then per-conv — rather than ``count_distinct``:
    Catalyst expands count_distinct into an Expand+double-shuffle whose
    first stage AQE mis-coalesces under high parallelism (measured 41s vs
    11s at local[32] on a 10M-row table); the two-stage form is also the
    shape that salts naturally at 100 TB (the (conv, turn) stage shards
    hot conversations across reducers by turn_idx).

    NULL-key policy (shared with transcript_integrity_summary, which
    drops null keys in its arrow fold): rows with a NULL conv_id or NULL
    turn_idx are excluded from the ordering check — they are flagged by
    the required-column row constraints instead. This also preserves the
    count_distinct semantics the two-stage form replaces (count_distinct
    ignores NULLs; a naive groupBy would count the NULL group as one
    distinct turn and shift 'dup' verdicts to 'gap')."""
    g1 = (
        df.where(F.col(conv_col).isNotNull() & F.col(idx_col).isNotNull())
        .groupBy(conv_col, idx_col)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    g = g1.groupBy(conv_col).agg(
        F.sum("c").alias("n_turns"),
        F.min(idx_col).alias("min_idx"),
        F.max(idx_col).alias("max_idx"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    reasons = F.array_compact(
        F.array(
            F.when(F.col("min_idx") != 0, F.lit("nonzero_start")),
            F.when(
                F.col("max_idx") != F.col("n_distinct") - 1, F.lit("gap")
            ),
            F.when(F.col("n_distinct") != F.col("n_turns"), F.lit("dup_turn")),
        )
    )
    return (
        g.withColumn("reasons", reasons)
        .filter(F.size("reasons") > 0)
        .select(conv_col, "n_turns", "min_idx", "max_idx", "n_distinct", "reasons")
    )


def _integrity_fold(conv_col: str, idx_col: str):
    """Per-partition pandas pre-aggregation for transcript_integrity_summary:
    one output row per (conv, partition) with local count/min/max and the
    local UNIQUE turn list — exact cross-partition merge material at a
    fraction of the raw rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fold(batches):
        bs = list(batches)
        if not bs:
            return
        t = pa.Table.from_batches(bs)
        t = t.drop_null()
        if t.num_rows == 0:
            return
        # C++ hash aggregation, including the per-group distinct-value list
        g = t.group_by([conv_col]).aggregate(
            [
                (idx_col, "count"),
                (idx_col, "min"),
                (idx_col, "max"),
                (idx_col, "distinct"),
            ]
        )
        turns = g[f"{idx_col}_distinct"].cast(pa.list_(pa.int32()))
        conv_str = g[conv_col].cast(pa.string())
        # int64 conv hash, computed HERE (distributed, ~10 ms per task):
        # the driver merge finds multi-task convs by sorting these ints
        # instead of hash-aggregating millions of strings twice (measured
        # 3.4 s of a 6 s serial merge at 5M partials). Deterministic
        # (siphash, fixed key) and collision-safe by construction: a
        # collision only routes extra rows into the exact string-keyed
        # union path, never changes a result.
        import pandas as _pd

        ch = _pd.util.hash_array(
            conv_str.to_numpy(zero_copy_only=False).astype(object)
        ).view("int64")  # same bits; Spark's Arrow bridge lacks uint64
        out = pa.table(
            {
                "conv": conv_str,
                "ch": pa.array(ch, type=pa.int64()),
                "n": g[f"{idx_col}_count"].cast(pa.int64()),
                "mn": g[f"{idx_col}_min"].cast(pa.int32()),
                "mx": g[f"{idx_col}_max"].cast(pa.int32()),
                # local distinct count as its own column: the reduce's main
                # path then never decodes the list column (parquet column
                # pruning skips it entirely on the spill scan)
                "ndl": pc.list_value_length(turns).cast(pa.int64()),
                "turns": turns,
            }
        )
        yield from out.to_batches()

    return fold


def transcript_integrity_summary(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    distinct_strategy: str = "collect",
) -> dict:
    """Uniqueness of (conv, turn) AND dense-ordering per conv in ONE
    SHUFFLE-LIGHT pass.

    duplicate_keys and turn_ordering_violations each shuffle every raw
    (conv, turn) pair; at 100 TB that shuffle is the pipeline's largest
    cost. Here each partition pre-aggregates to one row per conversation —
    count, min, max, unique-turn list — in a vectorized pandas fold (the
    rows of a conversation are clustered by ingest/bucket layout, so almost
    every conv collapses to a single partial), and only the per-conv
    partials shuffle. The merge is exact: n_distinct is the size of the
    distinct union of the partials' unique-turn arrays (JVM array
    functions, no explode). Null keys are excluded.

    Returns {'dup_rows_excess': total rows beyond one per (conv, turn) key,
    'ordering_violations': #convs whose turn_idx is not dense 0..n-1} —
    ordering_violations matches turn_ordering_violations().count()."""
    partials = df.select(
        F.col(conv_col).cast("string").alias(conv_col),
        F.col(idx_col).cast("int").alias(idx_col),
    ).mapInArrow(
        _integrity_fold(conv_col, idx_col),
        "conv string, ch long, n long, mn int, mx int, ndl long, turns array<int>",
    )
    return _integrity_reduce(partials, strategy=distinct_strategy)


def _integrity_reduce(
    partials: DataFrame, strategy: str = "collect", reuse: str = "persist"
) -> dict:
    """Distributed merge of per-conv partials. Two strategies, identical
    results (fuzz-tested equality):

    - ``collect`` (default): one groupBy(conv) whose distinct union is
      size(array_distinct(flatten(collect_list(turns)))). One shuffle,
      one job. With short conversations (transcripts average a handful of
      turns) the conv-id strings dominate shuffle bytes anyway, so the
      arrays add little — measured fastest at every parallelism level on
      the bench table.
    - ``split``: the long-conversation scale path. A conv whose rows all
      landed in ONE map task (the clustered-layout majority) needs no
      cross-task union — its local distinct count (the ``ndl`` column) is
      exact, so the main aggregation carries five longs per conv and
      never touches the arrays (reading a parquet spill, column pruning
      skips the list column entirely); only convs split across tasks
      (task-boundary stragglers, hot convs) pay the exact array union,
      via a join AQE turns into a broadcast. Choose this when turn lists
      dominate partial bytes (avg turns/conv in the hundreds+) — there
      the collect form shuffles the whole turn universe, this one only
      the split convs'.

    ``reuse='persist'`` caches the partials for the split strategy's
    second reference — required when they come from a mapInArrow fold
    that would otherwise re-run; the native path passes ``'rescan'``
    because its partials are a parquet spill that re-scans pruned."""
    if strategy == "collect":
        return _integrity_reduce_collect(partials)
    if reuse == "persist":
        partials = partials.persist()
    try:
        return _integrity_reduce_split(partials)
    finally:
        if reuse == "persist":
            partials.unpersist()


def _integrity_finalize(g: DataFrame) -> dict:
    bad = (
        (F.col("min_idx") != 0)
        | (F.col("max_idx") != F.col("n_distinct") - 1)
        | (F.col("n_distinct") != F.col("n_turns"))
    )
    row = g.agg(
        F.sum(F.col("n_turns") - F.col("n_distinct")).alias("dup_rows_excess"),
        F.sum(F.when(bad, 1).otherwise(0)).alias("ordering_violations"),
    ).collect()[0]
    return {
        "dup_rows_excess": int(row.dup_rows_excess or 0),
        "ordering_violations": int(row.ordering_violations or 0),
    }


def _integrity_reduce_collect(partials: DataFrame) -> dict:
    g = partials.groupBy("conv").agg(
        F.sum("n").alias("n_turns"),
        F.min("mn").alias("min_idx"),
        F.max("mx").alias("max_idx"),
        F.size(F.array_distinct(F.flatten(F.collect_list("turns")))).alias(
            "n_distinct"
        ),
    )
    return _integrity_finalize(g)


def _integrity_reduce_split(partials: DataFrame) -> dict:
    base = (
        partials
        if "ndl" in partials.columns
        else partials.withColumn("ndl", F.size("turns"))
    )
    g1 = base.select("conv", "n", "mn", "mx", "ndl").groupBy("conv").agg(
        F.sum("n").alias("n_turns"),
        F.min("mn").alias("min_idx"),
        F.max("mx").alias("max_idx"),
        F.count(F.lit(1)).alias("parts"),
        F.sum("ndl").alias("nd_sum"),
    )
    multi = g1.filter(F.col("parts") > 1).select("conv")
    exact = (
        base.select("conv", "turns")
        .join(multi, "conv")
        .groupBy("conv")
        .agg(
            F.size(F.array_distinct(F.flatten(F.collect_list("turns")))).alias(
                "nd_exact"
            )
        )
    )
    g = g1.join(exact, "conv", "left").withColumn(
        "n_distinct", F.coalesce("nd_exact", "nd_sum")
    )
    return _integrity_finalize(g)


def _merge_partials_local(table) -> dict:
    """Vectorized driver-side merge of per-conv partials: numpy/arrow
    C-paths instead of a 5M-group Spark ObjectHashAggregate. Partials are
    ~2% of input rows, so this is MBs even for 10^8-turn inputs; beyond
    that, feed the partials into _integrity_reduce instead.

    Two-tier: a conv whose partials all came from ONE map task needs no
    grouping at all — its per-row (n, mn, mx, ndl) stats ARE the final
    per-conv stats, so singles are judged with plain row-wise numpy.
    Under a conv-clustered layout that is ~99% of the rows (only
    task-boundary stragglers + hot convs straddle tasks); only that
    small remainder pays dictionary encoding and the exact turn-set
    union. The previous form dictionary-encoded and bincounted ALL
    partial rows (five 5M-element passes), making this driver merge a
    ~10 s serial stage that capped measured scaling — Amdahl, not the
    host (kernel controls never saw it: they time the map side only).
    Multi-task detection is keyed on the spilled ``ch`` int64 conv hash
    when present (one int64 sort + searchsorted, ~0.4 s at 5M partials;
    hash collisions only route extra rows into the exact path below,
    which unions by the true conv strings — results are collision-proof).
    Tables without ``ch`` (older spills, hand-built partials) fall back
    to two string hash passes (value_counts + is_in, ~3.4 s at 5M). The
    string and list columns are never chunk-combined for the single-task
    majority — only the multi subset is gathered."""
    import numpy as np

    import pyarrow as pa
    import pyarrow.compute as pc

    if table.num_rows == 0:
        return {"dup_rows_excess": 0, "ordering_violations": 0}

    # Native widths throughout (mn/mx int32, n/ndl int64): to_numpy on
    # null-free arrow arrays is zero-copy; numpy promotes in the ufuncs.
    n = table.column("n").to_numpy(zero_copy_only=False)
    mn_r = table.column("mn").to_numpy(zero_copy_only=False)
    mx_r = table.column("mx").to_numpy(zero_copy_only=False)
    if "ndl" in table.schema.names:
        ndl = table.column("ndl").to_numpy(zero_copy_only=False)
    else:
        ndl = np.diff(
            table.column("turns").combine_chunks().offsets.to_numpy()
        )

    # ch fast path only when the column is null-free: a resumed checkpoint
    # mixing pre-ch part files with new ones unifies to a ch column with
    # nulls, whose to_numpy gives float64 NaNs — and pandas duplicated()
    # treats all NaNs as duplicates, silently routing every legacy row
    # through the slow exact-multi path. null_count is a metadata read.
    if "ch" in table.schema.names and table.column("ch").null_count == 0:
        import pandas as _pd

        ch = table.column("ch").to_numpy(zero_copy_only=False)
        # one C hash pass marks every row whose conv hash repeats
        # (Series, not Index: Index.duplicated pays a second full
        # is_unique hash pass; np.sort+searchsorted measured 0.76 s)
        multi = _pd.Series(ch).duplicated(keep=False).to_numpy()
    else:
        conv_all = table.column("conv").combine_chunks()
        vc = pc.value_counts(conv_all)
        dup_vals = vc.field("values").filter(
            pc.greater(vc.field("counts"), 1)
        )
        if len(dup_vals):
            multi = pc.is_in(conv_all, value_set=dup_vals).to_numpy(
                zero_copy_only=False
            )
        else:
            multi = np.zeros(len(n), dtype=bool)

    # Single-part convs: the row is the conv. Dense 0..n-1 ordering holds
    # iff mn == 0, mx == distinct-1, and no duplicate turn values.
    # Computed as ALL-rows totals minus the multi subset's contribution
    # (a tiny fancy-index gather) — boolean-mask gathers over 5M rows
    # cost more than the arithmetic they feed.
    dup_all = n - ndl
    bad_all = (mn_r != 0) | (mx_r != ndl - 1) | (ndl != n)
    dup_excess = int(dup_all.sum())
    bad = int(bad_all.sum())

    if multi.any():
        rows = np.flatnonzero(multi)
        dup_excess -= int(dup_all[rows].sum())
        bad -= int(bad_all[rows].sum())
        d2, b2 = _judge_multi_subset(
            table.select(["conv", "n", "mn", "mx", "turns"]).take(
                pa.array(rows)
            )
        )
        dup_excess += d2
        bad += b2

    return {"dup_rows_excess": dup_excess, "ordering_violations": bad}


def _judge_multi_subset(sub) -> tuple:
    """Exact per-conv judgment of partial rows whose conv may span map
    tasks (arrow table with conv/n/mn/mx/turns): groups by the TRUE conv
    string, unions the turn sets via one composite-key unique, and returns
    this subset's (dup_rows_excess, ordering_violations) contribution.
    Shared by `_merge_partials_local` (its multi branch) and
    `IncrementalSpillWatcher._resolve` — one kernel, one set of tests."""
    import numpy as np

    import pyarrow as pa
    import pyarrow.compute as pc

    conv_sub = sub.column("conv")
    if isinstance(conv_sub, pa.ChunkedArray):
        conv_sub = conv_sub.combine_chunks()
    codes = pc.dictionary_encode(conv_sub).indices.to_numpy(
        zero_copy_only=False
    )
    G = int(codes.max()) + 1
    n_sub = sub.column("n").to_numpy(zero_copy_only=False)
    n_turns = np.bincount(codes, weights=n_sub, minlength=G).astype(np.int64)
    mn = np.full(G, np.iinfo(np.int64).max)
    np.minimum.at(mn, codes, sub.column("mn").to_numpy(zero_copy_only=False))
    mx = np.full(G, np.iinfo(np.int64).min)
    np.maximum.at(mx, codes, sub.column("mx").to_numpy(zero_copy_only=False))
    turns = sub.column("turns")
    if isinstance(turns, pa.ChunkedArray):
        turns = turns.combine_chunks()
    lens = np.diff(turns.offsets.to_numpy())
    flat = turns.flatten().to_numpy(zero_copy_only=False)
    rep = np.repeat(codes.astype(np.int64, copy=False), lens)
    # exact distinct per conv via one composite-key unique. The +2^31
    # bias maps any int32 turn value into [0, 2^32), so the >>32 code
    # recovery is exact even for negative turn indices (without it a
    # negative turn would floor-shift into the neighboring conv code).
    key = rep * np.int64(1 << 32) + (
        flat.astype(np.int64, copy=False) + np.int64(1 << 31)
    )
    ukey = np.unique(key)
    n_distinct = np.bincount(ukey >> np.int64(32), minlength=G)
    dup_excess = int((n_turns - n_distinct).sum())
    bad = int(
        ((mn != 0) | (mx != n_distinct - 1) | (n_distinct != n_turns)).sum()
    )
    return dup_excess, bad


def transcript_integrity_parquet(
    spark,
    path: str,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    rg_per_task: int = 4,
) -> dict:
    """transcript_integrity_summary via the native-reader pattern: tasks
    read ONLY (conv, turn) from parquet row groups with pyarrow (skipping
    Spark's columnar->row->arrow conversion), pre-aggregate per conv with
    C++ hash_distinct, and merge the collected partials on the driver.
    Identical result to transcript_integrity_summary on the same data.

    Trade: fastest wall-clock at LOW parallelism (47s vs 75s at 1 core on
    30M rows) because the map side skips Spark's row pipeline, but the
    driver merge is serial — at high core counts the fully-distributed
    transcript_integrity_summary wins and scales (its reduce
    parallelizes). Pick summary for clusters, this for small boxes."""
    import io

    import pyarrow as pa

    from .infer_spark import _list_rg_tasks, list_parquet_files

    tasks = _list_rg_tasks(list_parquet_files(path), rg_per_task)
    fold = _integrity_fold(conv_col, idx_col)

    def run(spec):
        import pyarrow.parquet as pq

        f, lo, hi = spec
        pf = pq.ParquetFile(f)
        batches = pf.iter_batches(
            batch_size=65536,
            row_groups=list(range(lo, hi)),
            columns=[conv_col, idx_col],
        )

        def plain(bs):
            for b in bs:
                cols = [
                    c.cast(c.type.value_type)
                    if pa.types.is_dictionary(c.type)
                    else c
                    for c in b.columns
                ]
                yield pa.RecordBatch.from_arrays(cols, names=b.schema.names)

        out = list(fold(plain(batches)))
        sink = io.BytesIO()
        if out:
            with pa.ipc.new_stream(sink, out[0].schema) as w:
                for b in out:
                    w.write_batch(b)
        return sink.getvalue()

    blobs = spark.sparkContext.parallelize(tasks, max(len(tasks), 1)).map(run).collect()
    tables = [pa.ipc.open_stream(b).read_all() for b in blobs if b]
    if not tables:
        return {"dup_rows_excess": 0, "ordering_violations": 0}
    return _merge_partials_local(pa.concat_tables(tables))


def transcript_integrity_native(
    spark,
    path: str,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    rg_per_task: int = 4,
    spill_dir: str | None = None,
    distinct_strategy: str = "auto",
    local_merge_max_bytes: int = 256 << 20,
) -> dict:
    """transcript_integrity_summary with a native-reader MAP side and a
    runtime-picked reduce — the form that scales on both axes.

    ``distinct_strategy='auto'`` (default) decides the reduce from the
    measured spill size, the way AQE re-plans from shuffle statistics:
    partials under ``local_merge_max_bytes`` go through the vectorized
    driver merge (`_merge_partials_local` — arrow dictionary codes +
    numpy bincount, no shuffle, sub-second at bench scale), larger spills
    go through the distributed ``split`` reduce whose main aggregation
    carries five longs per conversation (arrays only for convs split
    across tasks). 'collect'/'split' force the distributed reduce;
    equality of every path is asserted in tests.

    The summary's map side pays Spark's columnar->row->arrow conversion on
    every raw row, which caps it CPU-side regardless of cores (measured on
    a 30.5M-turn table: integrity stage 12.0s @ local[8] -> 12.6s @
    local[32], flat, while native-reader inference scaled 31.9s -> 2.7s);
    transcript_integrity_parquet reads natively but merges partials
    serially on the driver (fast at 1 core, serial-capped). Here tasks
    read ONLY (conv, turn) off parquet row groups with pyarrow,
    pre-aggregate per conversation with C++ hash aggregation, spill the
    per-conv partials to parquet (a few % of the input bytes), and the
    partials feed the distributed _integrity_reduce.

    The spill is the same pattern a 1000-executor job uses at 100 TB:
    map partials land in shared storage (here the local FS both the
    driver and local-mode executors see; pass ``spill_dir`` on a real
    cluster to point at distributed storage), and the reduce is a plain
    map-side-combined aggregation AQE sizes freely. Result is identical
    to transcript_integrity_summary on the same data (tests assert)."""
    import os
    import shutil
    import tempfile

    from .infer_spark import _list_rg_tasks, list_parquet_files

    tasks = _list_rg_tasks(list_parquet_files(path), rg_per_task)
    fold = _integrity_fold(conv_col, idx_col)
    out_dir = spill_dir or tempfile.mkdtemp(prefix="jis_integrity_")
    os.makedirs(out_dir, exist_ok=True)

    def run(item):
        import pyarrow as pa
        import pyarrow.parquet as pq

        i, (f, lo, hi) = item
        pf = pq.ParquetFile(f)
        batches = pf.iter_batches(
            batch_size=65536,
            row_groups=list(range(lo, hi)),
            columns=[conv_col, idx_col],
        )

        def plain(bs):
            for b in bs:
                cols = [
                    c.cast(c.type.value_type)
                    if pa.types.is_dictionary(c.type)
                    else c
                    for c in b.columns
                ]
                yield pa.RecordBatch.from_arrays(cols, names=b.schema.names)

        out = list(fold(plain(batches)))
        if out:
            pq.write_table(
                pa.Table.from_batches(out),
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
            )
        return i

    try:
        spark.sparkContext.parallelize(
            list(enumerate(tasks)), max(len(tasks), 1)
        ).map(run).collect()
        return reduce_spilled_partials(
            spark, out_dir, distinct_strategy, local_merge_max_bytes
        )
    finally:
        if spill_dir is None:
            shutil.rmtree(out_dir, ignore_errors=True)


def reduce_spilled_partials(
    spark,
    out_dir: str,
    distinct_strategy: str = "auto",
    local_merge_max_bytes: int = 256 << 20,
) -> dict:
    """Merge a directory of spilled per-conv integrity partials (the
    parquet files written by `_integrity_fold` map tasks) into the final
    {dup_rows_excess, ordering_violations} dict.

    ``'auto'`` picks the reduce from the measured spill size, AQE-style:
    the spill size is now a known statistic. Small partials -> the
    vectorized driver merge (no shuffle at all, sub-second, and immune to
    the ObjectHashAggregate variance a 10^6-group array agg shows); large
    partials (10^9+ conversations) -> the distributed ``split`` reduce,
    whose main agg carries five longs per conv."""
    import glob as _glob
    import os

    spilled = _glob.glob(os.path.join(out_dir, "part-*.parquet"))
    if not spilled:
        return {"dup_rows_excess": 0, "ordering_violations": 0}
    strategy = distinct_strategy
    if strategy == "auto":
        if sum(os.path.getsize(p) for p in spilled) <= local_merge_max_bytes:
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            # read the globbed part files, not the directory: a torn
            # tmp file from a killed writer must never reach the reader
            return _merge_partials_local(
                _pa.concat_tables(
                    [_pq.read_table(p) for p in sorted(spilled)]
                )
            )
        strategy = "split"
    if strategy == "tree":
        return _integrity_reduce_tree(spark, sorted(spilled))
    return _integrity_reduce(
        spark.read.parquet(out_dir), strategy=strategy, reuse="rescan"
    )


class IncrementalSpillWatcher:
    """Consume completed integrity spill files WHILE the fused scan is
    still running, so the post-scan integrity reduce stops being a serial
    tail. Rev 6 made this the engine's largest remaining Amdahl term: the
    one-scan pipeline removed the compile + violations stages the
    background reduce used to hide behind, and paired rounds immediately
    showed 1.6-3.4 s of ``integrity_wait`` at BOTH parallelism levels —
    ~15-20% of the whole local[4] job, a direct efficiency cap.

    Everything except the cross-file duplicate resolution is additive
    per file, so it is ALL prepaid as each file lands (measured at the
    5M-conv bench spill: parquet decode ~2.8 s, single-part row
    judgment ~1.7 s cold — together most of the 3-4.4 s cold wait):

    - read + decode the part file;
    - the single-part judgment sums ``(n - ndl).sum()`` and the dense
      0..n-1 predicate count — exactly `_merge_partials_local`'s
      all-rows totals, which are per-row and hence per-file additive;
    - the file's ``ch`` hashes are argsorted once (the sorted copy and
      the row order are both reused by finalize's dup resolution) and
      copied into one growing pre-faulted buffer (see __init__).

    finalize() then: sorts the buffer's filled prefix IN PLACE — one
    allocation-free introsort, ~0.07-0.35 s at 5M hashes regardless of
    the host's fault-servicing state (rev 7's incremental
    insertion-merge spent 5-7 s of prepaid memory-bus traffic during
    the scan plus a 1.75 s serial tail fold, an O(n²/batch)
    pessimization; rev 8's finalize-time concat+radix was 0.2 s on a
    healthy host but 5-10 s inside degraded fault windows), flags
    duplicate ch VALUES with one equal-neighbor scan (~10 ms), gathers
    the ~1% of rows whose conv may span files, subtracts their prepaid
    single-part contributions, and judges them exactly via the same
    `_judge_multi_subset` kernel `_merge_partials_local` uses (union of
    true per-conv turn sets — ch collisions only route extra rows here,
    results are collision-proof). Measured finalize: ~0.3-0.5 s versus
    the 3-4.4 s cold reduce.

    The watcher aborts (finalize -> None) and the caller falls back to
    `reduce_spilled_partials` when: a file lacks the current spill
    schema (``ch``/``ndl`` present, ``ch`` null-free), accumulated bytes
    exceed ``max_bytes`` (the same cap that routes the cold path to the
    distributed ``split`` reduce), or the thread hit any exception.
    Spill files are only read, never deleted — the fallback and the
    caller's cleanup see the directory untouched.

    Safe-by-construction file visibility: `pipeline._fused_task` writes
    ``part-*.parquet.inprogress-<pid>`` and `os.replace`s to the final
    name, so the ``part-*.parquet`` glob only ever matches complete
    files; a task retry re-replacing a consumed file swaps in
    byte-identical content (the fold is deterministic) and an open
    handle keeps reading the old inode. On a real cluster this thread
    is free driver hardware, exactly like the background reduce it
    feeds."""

    def __init__(
        self,
        out_dir: str,
        poll_secs: float = 0.2,
        max_bytes: int = 256 << 20,
    ):
        import glob as _glob
        import os as _os

        self._dir = out_dir
        self._glob = lambda: _glob.glob(_os.path.join(out_dir, "part-*.parquet"))
        self._getsize = _os.path.getsize
        self._poll = poll_secs
        self._max_bytes = max_bytes
        self._seen: set = set()
        # (table, n, mn, mx, ndl, ch_sorted, argsort_order) per file;
        # each file's hashes are ALSO copied into one geometrically-grown
        # preallocated buffer as the file lands, so every page the global
        # duplicate scan touches is faulted DURING the scan — finalize
        # then sorts the filled prefix in place (allocation-free). On
        # this host page-fault servicing intermittently degrades ~100x
        # while raw bandwidth stays healthy, so a finalize-time 40 MB
        # concat+radix measured 0.2 s or 7 s depending on the moment;
        # the in-place introsort on pre-faulted pages measures ~0.07 s
        # in BOTH states. A real cluster's driver prefers this shape
        # too: the fault cost overlaps the scan instead of serializing
        # after it.
        self._files: list = []
        self._buf = None  # int64 buffer; filled prefix = self._len
        self._len = 0
        self._dup_sum = 0  # prepaid single-part totals (additive)
        self._bad_sum = 0
        self._bytes = 0
        # cheap wall-time accounting: where the prepay/finalize seconds go
        # (read by bench diagnostics; a handful of time.time() calls)
        self.stats: dict = {
            "files_total": 0,
            "files_finalize": 0,  # consumed inside finalize (tail wave)
            "decode_secs": 0.0,
            "prep_secs": 0.0,  # numpy post-decode (sums, argsort)
            "resolve_secs": 0.0,
            "finalize_consume_secs": 0.0,
            "join_wait_secs": 0.0,
            "dup_vals": 0,
            "matched_rows": 0,
        }
        self._in_finalize = False
        self._aborted = False
        self._error: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="jis-spill-watcher", daemon=True
        )
        self._thread.start()

    def _consume_ready(self) -> None:
        import numpy as np

        import pyarrow.parquet as _pq

        for p in sorted(self._glob()):
            if p in self._seen or self._aborted:
                continue
            self._seen.add(p)
            self._bytes += self._getsize(p)
            if self._bytes > self._max_bytes:
                # same size rule that sends the cold path distributed;
                # drop decoded state, keep files for the fallback
                self._abort()
                return
            _t0 = time.time()
            t = _pq.read_table(p)
            self.stats["decode_secs"] += time.time() - _t0
            self.stats["files_total"] += 1
            if self._in_finalize:
                self.stats["files_finalize"] += 1
            names = t.schema.names
            if (
                "ch" not in names
                or "ndl" not in names
                or t.column("ch").null_count != 0
                or (self._files and t.schema != self._files[0][0].schema)
            ):
                self._abort()
                return
            _t0 = time.time()
            ch = t.column("ch").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            mn = t.column("mn").to_numpy(zero_copy_only=False)
            mx = t.column("mx").to_numpy(zero_copy_only=False)
            ndl = t.column("ndl").to_numpy(zero_copy_only=False)
            # prepay the single-part judgment: per-row, hence additive
            self._dup_sum += int((n - ndl).sum())
            self._bad_sum += int(
                ((mn != 0) | (mx != ndl - 1) | (ndl != n)).sum()
            )
            # one argsort gives both the file's sorted hashes (reused by
            # the global dup-value detection's final radix sort and the
            # per-file matched-row search) and the original-row order (so
            # finalize can map matched sorted positions back to rows
            # without a per-row membership pass)
            order = np.argsort(ch, kind="stable")
            srt = ch[order]
            # copy into the growing pre-faulted buffer (see __init__)
            need = self._len + srt.size
            if self._buf is None or need > self._buf.size:
                cap = max(need, 1 << 20)
                if self._buf is not None:
                    cap = max(need, self._buf.size * 2)
                nb = np.empty(cap, dtype=np.int64)
                if self._len:
                    nb[: self._len] = self._buf[: self._len]
                self._buf = nb
            self._buf[self._len : need] = srt
            self._len = need
            self.stats["prep_secs"] += time.time() - _t0
            self._files.append((t, n, mn, mx, ndl, srt, order))

    def _abort(self) -> None:
        self._aborted = True
        self._files = []
        self._buf = None
        self._len = 0

    def _run(self) -> None:
        try:
            while not self._stop.wait(self._poll):
                self._consume_ready()
                if self._aborted:
                    return
        except BaseException as e:  # surfaced via finalize -> fallback
            self._error = e
            self._abort()

    def finalize(self) -> dict | None:
        """Join the poller, consume any files it hadn't seen, resolve the
        cross-file duplicates, and return the final counts — or None when
        the incremental path bailed (the caller must fall back to
        `reduce_spilled_partials`)."""
        _t0 = time.time()
        self._stop.set()
        self._thread.join()
        self.stats["join_wait_secs"] = time.time() - _t0
        if not self._aborted:
            try:
                _t0 = time.time()
                self._in_finalize = True
                self._consume_ready()
                self.stats["finalize_consume_secs"] = time.time() - _t0
            except BaseException as e:
                self._error = e
                self._abort()
        if self._aborted:
            if self._error is not None:
                import warnings

                warnings.warn(
                    "IncrementalSpillWatcher failed; falling back to the "
                    f"cold spill reduce: {self._error!r}",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return None
        if not self._files:
            return {"dup_rows_excess": 0, "ordering_violations": 0}
        try:
            _t0 = time.time()
            out = self._resolve()
            self.stats["resolve_secs"] = time.time() - _t0
            return out
        except BaseException as e:
            self._error = e
            import warnings

            warnings.warn(
                "IncrementalSpillWatcher finalize failed; falling back to "
                f"the cold spill reduce: {e!r}",
                RuntimeWarning,
                stacklevel=2,
            )
            return None

    def _resolve(self) -> dict:
        import numpy as np

        import pyarrow as pa

        # ONE in-place introsort of the pre-faulted buffer — zero
        # allocation at finalize (kind='stable' radix would allocate a
        # fresh workspace, which this host's degraded fault windows turn
        # into seconds); ~0.07-0.35 s at 5M hashes in EVERY host state
        _t0 = time.time()
        s = self._buf[: self._len]
        s.sort(kind="quicksort")
        self.stats["resolve_sort_secs"] = time.time() - _t0
        # duplicate ch VALUES = equal neighbors in the sorted array; a
        # value repeated within ONE file is included too (same semantics
        # as _merge_partials_local's duplicated(keep=False) mask)
        dup_excess, bad = self._dup_sum, self._bad_sum
        dup_vals = np.unique(s[1:][s[1:] == s[:-1]])
        self.stats["dup_vals"] = int(dup_vals.size)
        if dup_vals.size:
            # inverted membership: search the (few) duplicate values into
            # each file's sorted hashes — O(dups x log rows) + matched,
            # instead of a per-row pass over 5M hashes whose fresh 40 MB
            # allocations are exactly what this host's degraded windows
            # punish. Matched sorted positions map back to original rows
            # through the prepaid argsort.
            subs = []
            _tscan = time.time()
            for t, n, mn, mx, ndl, srt, order in self._files:
                lo = np.searchsorted(srt, dup_vals, side="left")
                hi = np.searchsorted(srt, dup_vals, side="right")
                cnt = hi - lo
                nz = cnt > 0
                total = int(cnt[nz].sum())
                if not total:
                    continue
                starts = lo[nz]
                lens = cnt[nz]
                ends = np.cumsum(lens)
                # concatenated ranges [starts_k, starts_k + lens_k)
                idx_sorted = (
                    np.arange(total)
                    - np.repeat(ends - lens, lens)
                    + np.repeat(starts, lens)
                )
                rows = np.sort(order[idx_sorted])
                # un-prepay the single-part judgment of spanning rows
                dup_excess -= int((n - ndl)[rows].sum())
                bad -= int(
                    ((mn != 0) | (mx != ndl - 1) | (ndl != n))[rows].sum()
                )
                self.stats["matched_rows"] += total
                subs.append(
                    t.select(["conv", "n", "mn", "mx", "turns"]).take(
                        pa.array(rows)
                    )
                )
            _tj = time.time()
            self.stats["resolve_scan_secs"] = _tj - _tscan
            d2, b2 = _judge_multi_subset(pa.concat_tables(subs))
            self.stats["resolve_judge_secs"] = time.time() - _tj
            dup_excess += d2
            bad += b2
        return {"dup_rows_excess": dup_excess, "ordering_violations": bad}


def _consolidate_partials(table):
    """Merge per-conv partial rows sharing a conv into ONE row each — the
    associative combine step of the tree reduce (same schema out, minus
    ``ch``: a consolidated table has one row per conv, so the multi-task
    detection hash buys nothing downstream). Same numpy kernel family as
    _merge_partials_local: dictionary codes + bincount/min/max.at + one
    composite-key unique for the exact per-conv turn union."""
    import numpy as np

    import pyarrow as pa
    import pyarrow.compute as pc

    cols = ["conv", "n", "mn", "mx", "ndl", "turns"]
    if table.num_rows == 0:
        return table.select([c for c in cols if c in table.schema.names])
    conv = table.column("conv")
    if isinstance(conv, pa.ChunkedArray):
        conv = conv.combine_chunks()
    enc = pc.dictionary_encode(conv)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uconv = enc.dictionary
    G = len(uconv)
    n = table.column("n").to_numpy(zero_copy_only=False)
    mn_r = table.column("mn").to_numpy(zero_copy_only=False)
    mx_r = table.column("mx").to_numpy(zero_copy_only=False)
    n2 = np.bincount(codes, weights=n, minlength=G).astype(np.int64)
    mn2 = np.full(G, np.iinfo(np.int32).max, dtype=np.int64)
    np.minimum.at(mn2, codes, mn_r)
    mx2 = np.full(G, np.iinfo(np.int32).min, dtype=np.int64)
    np.maximum.at(mx2, codes, mx_r)
    turns = table.column("turns")
    if isinstance(turns, pa.ChunkedArray):
        turns = turns.combine_chunks()
    lens = np.diff(turns.offsets.to_numpy())
    flat = turns.flatten().to_numpy(zero_copy_only=False)
    rep = np.repeat(codes, lens)
    # +2^31 bias: exact code recovery for negative int32 turn values
    key = rep * np.int64(1 << 32) + (
        flat.astype(np.int64, copy=False) + np.int64(1 << 31)
    )
    ukey = np.unique(key)
    ndl2 = np.bincount(ukey >> np.int64(32), minlength=G).astype(np.int64)
    uturn = (
        (ukey & np.int64(0xFFFFFFFF)) - np.int64(1 << 31)
    ).astype(np.int32)
    # np.unique sorts by composite key = (code, turn): offsets by cumsum
    offsets = np.zeros(G + 1, dtype=np.int32)
    np.cumsum(ndl2, out=offsets[1:])
    turns2 = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(uturn, type=pa.int32())
    )
    return pa.table(
        {
            "conv": uconv,
            "n": pa.array(n2, type=pa.int64()),
            "mn": pa.array(mn2.astype(np.int32), type=pa.int32()),
            "mx": pa.array(mx2.astype(np.int32), type=pa.int32()),
            "ndl": pa.array(ndl2, type=pa.int64()),
            "turns": turns2,
        }
    )


def _ipc_ser(table) -> bytes:
    import pyarrow as pa

    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return sink.getvalue().to_pybytes()


def _ipc_deser(buf: bytes):
    import pyarrow as pa

    return pa.ipc.open_stream(pa.py_buffer(buf)).read_all()


def _integrity_reduce_tree(spark, spilled: list, depth: int = 2) -> dict:
    """Tree-reduce escape hatch for huge partial spills: executors
    consolidate per-conv partials pairwise (treeReduce(depth)), so the
    driver merges ONE already-consolidated table instead of every partial
    row — its work drops from O(partial rows) to O(final convs in the
    root merge), and the per-level combine is the same associative numpy
    kernel the local merge uses. Compared to the ``split`` SQL reduce this
    keeps everything in arrow IPC buffers (no SQL job, no shuffle files) —
    the right shape when a long chain of map tasks produced many small
    spill files and the cluster is otherwise busy with SQL stages.
    Results are bit-identical to every other strategy (tests assert).

    Measured at 5M single-conv partials (avg 3 turns): the one-shot
    driver merge (_merge_partials_local) takes ~4.8 s serial; the
    consolidate kernel is ~10.5 s on the FULL table single-threaded but
    tree execution runs it on per-partition subsets in parallel
    (64 partitions -> ~78k rows -> ~0.2 s each) plus log-depth combines,
    and the driver's root merge of the consolidated table is ~2.9 s.
    The win is not wall-clock at 5M — it is that driver memory and time
    stop scaling with partial-row count (the Amdahl S-term r3 measured)."""

    def load(paths):
        import numpy as np

        import pyarrow as pa
        import pyarrow.parquet as pq

        tables = []
        for p in paths:
            t = pq.read_table(p)
            if "ndl" not in t.schema.names:  # legacy spills: derive it
                turns = t.column("turns")
                if isinstance(turns, pa.ChunkedArray):
                    turns = turns.combine_chunks()
                ndl = np.diff(turns.offsets.to_numpy()).astype(np.int64)
                t = t.append_column("ndl", pa.array(ndl, type=pa.int64()))
            tables.append(t.select(["conv", "n", "mn", "mx", "ndl", "turns"]))
        if not tables:
            return []
        return [_ipc_ser(_consolidate_partials(pa.concat_tables(tables)))]

    def combine(a: bytes, b: bytes) -> bytes:
        import pyarrow as pa

        return _ipc_ser(
            _consolidate_partials(
                pa.concat_tables([_ipc_deser(a), _ipc_deser(b)])
            )
        )

    n_parts = max(1, min(len(spilled), 64))
    rdd = spark.sparkContext.parallelize(spilled, n_parts).mapPartitions(load)
    merged = rdd.treeReduce(combine, depth=depth)
    return _merge_partials_local(_ipc_deser(merged))


def ts_regressions(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Turns whose ts is not strictly after the previous turn's ts.

    Uses a per-conversation window ordered by turn_idx. Conversation length
    is bounded (it is a dialog), so each window group is small — the shuffle
    distributes GROUPS, and skew in #turns-per-conv stays bounded; this is
    the one ordering check that genuinely needs sequence order."""
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    prev = F.lag(ts_col).over(w)
    return (
        df.select(conv_col, idx_col, ts_col, prev.alias("prev_ts"))
        .filter(F.col("prev_ts").isNotNull() & (F.col(ts_col) <= F.col("prev_ts")))
    )


# --- column stats (reference roadmap FEATURES.md:177-186) ----------------------


def column_stats(df: DataFrame, columns: list | None = None) -> DataFrame:
    """One-pass per-column profile: count, nulls, approx distinct, min/max
    (as strings), mean/stddev for numerics, length min/max for strings.
    Single agg job -> one tiny row, exploded into (column, ...) rows."""
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    numeric = {
        c
        for c in cols
        if dtypes[c] in ("tinyint", "smallint", "int", "bigint", "float", "double")
        or dtypes[c].startswith("decimal")
    }
    stringy = {c for c in cols if dtypes[c] in ("string", "varchar")}
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__n"),
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls"),
            F.approx_count_distinct(col).alias(f"{c}__approx_distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            (F.avg(col) if c in numeric else F.lit(None)).alias(f"{c}__mean"),
            (F.stddev(col) if c in numeric else F.lit(None)).alias(f"{c}__stddev"),
            (F.min(F.length(col)) if c in stringy else F.lit(None)).alias(
                f"{c}__len_min"
            ),
            (F.max(F.length(col)) if c in stringy else F.lit(None)).alias(
                f"{c}__len_max"
            ),
        ]
    wide = df.agg(*aggs)
    fields = [
        "n", "nulls", "approx_distinct", "min", "max", "mean", "stddev",
        "len_min", "len_max",
    ]
    parts = []
    for c in cols:
        struct = ", ".join(
            [f"'{c}'"]
            + [
                f"cast(`{c}__{fname}` as {'string' if fname in ('min', 'max') else 'double'})"
                for fname in fields
            ]
        )
        parts.append(f"({struct})")
    stack = f"stack({len(cols)}, {', '.join(p[1:-1] for p in parts)})"
    return wide.selectExpr(
        f"{stack} as (column, n, nulls, approx_distinct, min, max, mean, stddev, len_min, len_max)"
    )


def column_distinct_stats(df: DataFrame, columns: list | None = None) -> DataFrame:
    """EXACT per-column (column, n, nulls, n_distinct) in the 100 TB shape.

    ``k`` exact ``count_distinct``s in ONE agg make Catalyst plan an Expand
    (k+1 projections of every row) whose AQE coalescing mis-sizes at high
    parallelism (see CLAUDE.md) — and the expanded rows are shuffled before
    the partial distinct. This form avoids Expand entirely: one pruned
    single-column scan per column (columnar parquet: k pruned scans read
    the same total bytes as one full-width scan), each a plain two-stage
    HashAggregate distinct (map-side partial -> exact), the same explicit
    two-stage pattern as turn_ordering_violations. Per-column branches also
    let AQE right-size each shuffle independently. The k-row results join
    broadcast against one cheap no-distinct base agg for (n, nulls).

    Exactness matches count(DISTINCT c) bit-for-bit — this is the scale
    twin of the Expand form, not an approximation (column_stats carries the
    approx_count_distinct variant for profiles that tolerate ~2% error)."""
    from functools import reduce

    cols = columns or df.columns
    base = (
        df.agg(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.count(F.col(c)).alias("n"),
                        F.count(F.when(F.col(c).isNull(), 1)).alias("nulls"),
                    )
                    for c in cols
                ]
            ).alias("a")
        )
        .select(F.explode("a").alias("s"))
        .select("s.column", "s.n", "s.nulls")
    )
    branches = [
        df.select(F.col(c).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(F.lit(c).alias("column"), "n_distinct")
        for c in cols
    ]
    dc = reduce(lambda a, b: a.unionAll(b), branches)
    return base.join(F.broadcast(dc), "column").select(
        "column", "n", "nulls", "n_distinct"
    )


# --- per-partition verdicts (north_rule) ---------------------------------------


def partition_verdicts(
    df: DataFrame,
    constraints: list,
    bucket_col: str = "conv_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Pass/fail per deterministic bucket of ``bucket_col`` (stable across
    runs and cluster sizes — xxhash64 buckets, not physical partitions, so
    the manifest's lineage is reproducible). One aggregation pass."""
    bucket = F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(num_buckets)).alias(
        "bucket"
    )
    aggs = [F.count(F.lit(1)).alias("rows")] + [
        F.count(F.when(~c.predicate, 1)).alias(c.name) for c in constraints
    ]
    g = df.groupBy(bucket).agg(*aggs)
    total_viol = sum(F.col(c.name) for c in constraints) if constraints else F.lit(0)
    return g.withColumn("violation_total", total_viol).withColumn(
        "passed", F.col("violation_total") == 0
    )

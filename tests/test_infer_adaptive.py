"""Adaptive (JVM-agg + probe) inference must produce states and schemas
value-identical to the classic arrow fold."""

import math

import pytest

from pyspark.sql import functions as F

from jsonschema_infer_spark.operators.infer_spark import infer_dataframe


def _norm_state(st):
    if st is None:
        return None
    out = {}
    for k, v in st.items():
        if k == "props":
            out[k] = {name: _norm_state(c) for name, c in v.items()}
        elif k == "items":
            out[k] = _norm_state(v)
        elif k == "distinct":
            if v is None:
                out[k] = None
            else:
                out[k] = sorted(repr((t, x)) for t, x in v)
        elif k == "types":
            out[k] = {t: n for t, n in v.items() if n}
        elif k == "const" and v is not None:
            t, x = v
            out[k] = (t, "nan") if isinstance(x, float) and math.isnan(x) else v
        else:
            out[k] = v
    return out


def _assert_equivalent(df):
    classic = infer_dataframe(df, num_partitions=4)
    adaptive = infer_dataframe(df, mode="adaptive")
    assert adaptive.schema_json == classic.schema_json
    assert adaptive.total_rows == classic.total_rows
    assert _norm_state(adaptive.state) == _norm_state(classic.state)


def test_transcripts_clean(spark, tx_paths):
    _assert_equivalent(spark.read.parquet(tx_paths["clean"]))


def test_transcripts_violated(spark, tx_paths):
    _assert_equivalent(spark.read.parquet(tx_paths["viol"]))


def test_events_table(spark):
    _assert_equivalent(spark.read.parquet("/root/testdata/sf0.001/events.parquet"))


def test_edge_columns(spark):
    rows = []
    for i in range(300):
        rows.append(
            (
                i,
                42,  # const int
                2.0,  # integral const float -> integer
                float("nan") if i == 7 else float(i) / 3.0,
                float("inf") if i == 3 else float(i),
                f"550e8400-e29b-41d4-a716-44665544{i % 100:04d}"[:36],
                f"user{i}@example.com",
                "" if i % 50 == 0 else f"text value {i % 5}",
                None,  # all-null string
                i % 2 == 0,
                "red" if i % 3 == 0 else ("green" if i % 3 == 1 else "blue"),
            )
        )
    df = spark.createDataFrame(
        rows,
        "id long, c_int long, c_float double, with_nan double, with_inf double, "
        "uuid_col string, email_col string, texty string, nul string, "
        "flag boolean, enum3 string",
    )
    _assert_equivalent(df)


def test_timestamp_fractions(spark):
    df = spark.sql(
        """
        SELECT * FROM VALUES
          (TIMESTAMP'2026-01-01 00:00:00'),
          (TIMESTAMP'2026-01-01 00:00:00.5'),
          (TIMESTAMP'2026-01-01 00:00:00.123'),
          (TIMESTAMP'2026-01-01 00:00:00.123456'),
          (CAST(NULL AS TIMESTAMP))
        AS t(ts)
        """
    )
    _assert_equivalent(df)


def test_infer_parquet_matches_mapinarrow(spark, tx_paths):
    from jsonschema_infer_spark.operators.infer_spark import infer_parquet

    for key in ("clean", "viol"):
        path = tx_paths[key]
        a = infer_parquet(spark, path, rg_per_task=1)
        b = infer_dataframe(spark.read.parquet(path), num_partitions=4)
        assert a.schema_json == b.schema_json
        assert a.total_rows == b.total_rows
        assert _norm_state(a.state) == _norm_state(b.state)


def test_adaptive_rejects_nested(spark):
    df = spark.range(3).select(F.struct("id").alias("s"))
    with pytest.raises(ValueError):
        infer_dataframe(df, mode="adaptive")
    # auto silently falls back
    res = infer_dataframe(df, mode="auto")
    assert res.total_rows == 3


def test_huge_double_demotion(spark):
    # Go's int64 round-trip rule (node.go:296-301): |v| >= 2^63 integral
    # floats are "number"; -2^63 is exactly representable -> "integer"
    rows = [
        (1e19,),
        (-3.4028e38,),
        (float(2**63),),
        (float(-(2**63)),),
        (5.0,),
        (2.5,),
    ]
    df = spark.createDataFrame(rows, "d double")
    _assert_equivalent(df)
    classic = infer_dataframe(df, num_partitions=2)
    st = classic.state["props"]["d"]
    assert st["types"] == {"number": 4, "integer": 2}
    tags = dict((v, t) for t, v in st["distinct"])
    assert tags[5] == "integer" and tags[2.5] == "number"
    assert tags[1e19] == "number" and tags[float(2**63)] == "number"
    assert tags[-(2**63)] == "integer"


def test_ts_render_len_matches_actual_render(spark):
    from jsonschema_infer_spark.operators.infer_adaptive import _ts_render_len
    from jsonschema_infer_spark.operators.infer_spark import _render_ts_us

    base = 1767225600 * 1_000_000
    fracs = [0, 5, 10, 50, 100, 500, 5000, 50000, 100000, 120000, 123456,
             500000, 999999, 999990]
    us_vals = [base + f for f in fracs]
    df = spark.createDataFrame([(v,) for v in us_vals], "us long")
    got = [r.l for r in df.select(_ts_render_len(F.col("us")).alias("l")).collect()]
    want = [len(_render_ts_us(v)) for v in us_vals]
    assert got == want


def test_timestamp_render_len_columnar(spark):
    # the columnar fold's closed-form length table must equal the actual
    # trimmed RFC 3339 rendering (frac .5 -> ".5", 2 extra chars)
    df = spark.sql("SELECT TIMESTAMP'2026-01-01 00:00:00.5' AS ts")
    res = infer_dataframe(df, num_partitions=1)
    st = res.state["props"]["ts"]
    assert st["const"] == ("string", "2026-01-01T00:00:00.5Z")
    assert st["len_min"] == st["len_max"] == len("2026-01-01T00:00:00.5Z")

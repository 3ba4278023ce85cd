"""Property fuzz: adaptive and columnar inference agree on arbitrary flat
tables (random types, nulls, NaN/inf, near-const and format-shaped
strings)."""

import math

from hypothesis import HealthCheck, given, settings, strategies as st

from jsonschema_infer_spark.operators.infer_spark import infer_dataframe

from test_infer_adaptive import _norm_state

_strings = st.one_of(
    st.text(alphabet="ab@. ", min_size=0, max_size=8),
    st.just("user@example.com"),
    st.just("550e8400-e29b-41d4-a716-446655440000"),
    st.just("x"),
)
_doubles = st.one_of(
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(2.0),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)

_rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
        st.one_of(st.none(), _doubles),
        st.one_of(st.none(), _strings),
        st.one_of(st.none(), st.booleans()),
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(rows=_rows)
def test_adaptive_matches_columnar_on_random_tables(spark, rows):
    df = spark.createDataFrame(
        rows, "i long, d double, s string, b boolean"
    )
    # a const NaN/inf column makes the renderer raise, exactly like Go's
    # json.Marshal — both modes must then fail the same way
    try:
        classic = infer_dataframe(df, num_partitions=3)
        classic_err = None
    except ValueError as e:
        classic, classic_err = None, e
    try:
        adaptive = infer_dataframe(df, mode="adaptive", sample_rows=4)
        adaptive_err = None
    except ValueError as e:
        adaptive, adaptive_err = None, e
    assert (classic_err is None) == (adaptive_err is None)
    if classic is not None:
        assert adaptive.schema_json == classic.schema_json
        assert _norm_state(adaptive.state) == _norm_state(classic.state)

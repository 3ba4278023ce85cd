"""Property fuzz for operator equivalences: the shuffle-light integrity
summary vs the exact per-key operators, and the salted window check vs
the plain one, on adversarial random inputs (dups, gaps, nulls, hot
keys)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

from jsonschema_infer_spark.operators import skew, validate as V

_pairs = st.lists(
    st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c", "hot"])),
        st.one_of(st.none(), st.integers(0, 9)),
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(pairs=_pairs)
def test_integrity_summary_matches_exact_operators(spark, pairs):
    df = spark.createDataFrame(pairs, "conv_id string, turn_idx int").repartition(3)
    summ = V.transcript_integrity_summary(df)
    clean = df.dropna()
    expected_excess = sum(
        r.dup_count - 1
        for r in V.duplicate_keys(clean, ["conv_id", "turn_idx"]).collect()
    )
    assert summ["dup_rows_excess"] == expected_excess
    assert summ["ordering_violations"] == V.turn_ordering_violations(clean).count()


_turns = st.lists(
    st.tuples(
        st.sampled_from(["x", "y"]),
        st.integers(0, 12),
        st.floats(0, 100, allow_nan=False),
    ),
    min_size=2,
    max_size=30,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(turns=_turns)
def test_salted_ts_regressions_fuzz(spark, turns):
    # dedupe (conv, idx) so lag ordering is deterministic in both variants
    seen = set()
    rows = []
    for c, i, t in turns:
        if (c, i) not in seen:
            seen.add((c, i))
            rows.append((c, i, t))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts double")
    plain = sorted(
        (r.conv_id, r.turn_idx) for r in V.ts_regressions(df, ts_col="ts").collect()
    )
    salted = sorted(
        (r.conv_id, r.turn_idx)
        for r in skew.ts_regressions_salted(df, ts_col="ts", block=4).collect()
    )
    assert salted == plain

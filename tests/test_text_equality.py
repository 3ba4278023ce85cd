"""input_hint per-row invariant: per-turn text equality under stable
(conv_id, turn_idx) ordering — the engine must never perturb a turn's text,
and the stable ordering must make the comparison deterministic regardless
of physical partitioning."""

import pyarrow.parquet as pq


def _expected(path):
    tab = pq.read_table(path, columns=["conv_id", "turn_idx", "text"])
    return sorted(
        zip(
            tab["conv_id"].to_pylist(),
            tab["turn_idx"].to_pylist(),
            tab["text"].to_pylist(),
        )
    )


def test_per_turn_text_equality_under_stable_ordering(spark, tx_paths):
    expected = _expected(tx_paths["clean"])
    # hostile physical layout: repartition shuffles rows arbitrarily; the
    # stable (conv_id, turn_idx) total order must still reproduce the
    # source texts exactly, byte for byte
    df = (
        spark.read.parquet(tx_paths["clean"])
        .repartition(7)
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
    )
    got = [(r.conv_id, r.turn_idx, r.text) for r in df.collect()]
    assert got == expected


def test_generator_text_is_pure_function_of_key(spark):
    from jsonschema_infer_spark.sources.transcripts import generate_transcripts

    a = generate_transcripts(50, seed=9)
    b = generate_transcripts(50, seed=9)
    assert a.equals(b)

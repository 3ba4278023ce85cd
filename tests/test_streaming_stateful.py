"""Stateful streaming turn-order validation: violations emitted as turns
arrive, with GroupState surviving a restart via the streaming checkpoint."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from jsonschema_infer_spark.streaming.stateful import (
    streaming_turn_order_violations,
)

SCHEMA = "conv_id string, turn_idx int, ts timestamp"


def _write(dirpath, name, rows):
    tab = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array(
                [r[2] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(tab, os.path.join(dirpath, name))


def _run_cycle(spark, data_dir, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    q = (
        streaming_turn_order_violations(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.conv_id, r.turn_idx, r.kind)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stateful_violations_and_checkpoint_resume(spark, tmp_path):
    data = tmp_path / "stream_in"
    data.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "viol_out")

    # cycle 1: conv a clean 0..2; conv b has a gap (0 then 2)
    _write(str(data), "b0.parquet", [
        ("a", 0, 100), ("a", 1, 101), ("a", 2, 102),
        ("b", 0, 200), ("b", 2, 205),
    ])
    got1 = _run_cycle(spark, str(data), ckpt, out)
    assert got1 == {("b", 2, "gap")}

    # cycle 2 (new files, same checkpoint -> state resumes): conv a replays
    # turn 1 with an old ts; conv b continues cleanly from expected 3
    _write(str(data), "b1.parquet", [
        ("a", 1, 90),
        ("b", 3, 206),
    ])
    got2 = _run_cycle(spark, str(data), ckpt, out) - got1
    assert ("a", 1, "replay") in got2
    assert ("a", 1, "ts_regress") in got2  # ts 90 <= last seen 102
    assert not any(c == "b" for c, _, _ in got2)

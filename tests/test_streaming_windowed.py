"""Watermarked tumbling windows: finalized counts in append mode, and a
row later than the watermark is dropped."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from jsonschema_infer_spark.streaming.windowed import windowed_counts

SCHEMA = "conv_id string, ts timestamp"
HOUR = 3600


def _write(dirpath, name, rows):
    tab = pa.table(
        {
            "conv_id": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tab, os.path.join(dirpath, name))


def _cycle(spark, data_dir, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r.window_start.hour, r.n)
        for r in spark.read.parquet(out).collect()
    }


def test_windowed_counts_and_late_drop(spark, tmp_path):
    data = tmp_path / "win_in"
    data.mkdir()
    ckpt = str(tmp_path / "win_ckpt")
    out = str(tmp_path / "win_out")

    # cycle 1 — hour 0: three rows; hour 1: one row. Append mode emits a
    # window only in a batch whose STARTING watermark has passed its end,
    # so nothing is finalized yet.
    _write(str(data), "b0.parquet", [
        ("a", 10), ("a", 20), ("b", 30), ("a", 1 * HOUR + 10),
    ])
    got1 = _cycle(spark, str(data), ckpt, out)
    assert got1 == set()

    # cycle 2 — rows in hour 3 advance the post-batch watermark to ~2h;
    # this batch still runs with the old (~10s) watermark, so still no
    # emission.
    _write(str(data), "b1.parquet", [
        ("a", 3 * HOUR + 5), ("b", 3 * HOUR + 6),
    ])
    _cycle(spark, str(data), ckpt, out)

    # cycle 3 — starts with watermark ~2h6s: hours 0 and 1 finalize NOW,
    # the late hour-0 row in this batch is below the watermark and is
    # dropped (hour 0 emits 3, not 4); hour 3 stays open.
    _write(str(data), "b2.parquet", [
        ("c", 40),                        # late: dropped
        ("a", 4 * HOUR + 5),
    ])
    got3 = _cycle(spark, str(data), ckpt, out)
    assert (0, 3) in got3 and (0, 4) not in got3
    assert (1, 1) in got3
    assert not any(h == 3 for h, _ in got3)

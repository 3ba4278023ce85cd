"""Watermarked windowed aggregation over transcript/event streams.

Tumbling event-time windows with a watermark bound the aggregation state
(windows older than the watermark are finalized and emitted; rows arriving
later than the watermark are dropped — the documented late-data trade).
This is the streaming twin of the batch `events_hourly`/histogram queries:
same groupBy shape, plus time semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(
    stream_df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: list | None = None,
) -> DataFrame:
    """Per-window (optionally per-key) event counts in append mode: a
    window row is emitted exactly once, when the watermark passes its
    end — downstream sinks see finalized counts only."""
    keys = [F.window(F.col(ts_col), window).alias("win")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            *[F.col(c) for c in (group_cols or [])],
            "n",
        )
    )

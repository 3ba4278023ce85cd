"""Incremental (streaming) schema inference.

The reference is incremental by design — schema evolves per sample and
``GetCurrentSchema`` inspects it between samples
(`/root/reference/examples/incremental/main.go:15-41`,
`/root/reference/jsonschema.go:165-173`). The Spark-native analogue is
Structured Streaming with ``foreachBatch``: each micro-batch is folded with
the SAME distributed fold (operators/infer_spark.py) and merged into a
running SchemaState persisted next to the stream's checkpoint — the merge
associativity that powers batch parallelism is exactly what makes the
running state correct here too.

Late data needs no special handling for inference (the fold is
order-insensitive); watermarking matters only for windowed validation
aggregations layered on top (duplicate keys within a watermark, drift per
event-time window) — see ``streaming_duplicate_keys``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from ..config import InferConfig, default_config
from ..operators import state as S
from ..operators.infer_spark import infer_dataframe
from ..plans.render import render_schema


class IncrementalInferrer:
    """foreachBatch sink: fold micro-batches into a persistent SchemaState.

    Usage:
        inc = IncrementalInferrer(state_dir, config)
        q = (stream_df.writeStream.foreachBatch(inc)
             .option("checkpointLocation", ckpt).start())
        ... inc.current_schema_json() between batches ...
    """

    def __init__(
        self,
        state_dir: str,
        config: InferConfig | None = None,
        mode: str = "columnar",
        json_column: str | None = None,
    ):
        self.config = config or default_config()
        self.mode = mode
        self.json_column = json_column
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)
        self._state_path = os.path.join(state_dir, "schema_state.json")
        self.state = self._load()
        self.batches_seen = self._meta().get("last_batch", -1)

    def _load(self):
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return S.state_from_jsonable(json.load(f)["state"])
        return None

    def _meta(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                d = json.load(f)
            return {k: v for k, v in d.items() if k != "state"}
        return {}

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # exactly-once under retries: a replayed batch_id is skipped
        if batch_id <= self.batches_seen:
            return
        res = infer_dataframe(
            batch_df, self.config, mode=self.mode, json_column=self.json_column
        )
        self.state = S.merge(self.state, res.state)
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "last_batch": batch_id,
                    "rows_total": self.state["n"],
                    "state": S.state_to_jsonable(self.state),
                },
                f,
            )
        os.replace(tmp, self._state_path)
        self.batches_seen = batch_id

    def current_schema(self) -> dict:
        if self.state is None:
            raise ValueError("no batches folded yet")
        return S.finalize(self.state, self.config)

    def current_schema_json(self) -> str:
        return render_schema(self.current_schema(), self.config.indent)


def streaming_duplicate_keys(
    stream_df: DataFrame,
    keys: list,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming uniqueness check: keys seen more than once within the
    watermark horizon (update-mode aggregation; state is bounded by the
    watermark — late rows beyond it are dropped, the documented trade)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )

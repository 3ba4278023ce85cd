"""Custom stateful streaming operator: per-conversation turn-order
validation over an unbounded transcript stream.

The batch engine checks dense 0..n-1 ordering with a single aggregation
(validate.turn_ordering_violations) — possible only because it sees the
whole table. A stream cannot wait for "the whole conversation", so this
operator keeps per-conversation GroupState (`next_expected`, `last_ts`)
via ``applyInPandasWithState`` and emits a violation row the moment a
turn arrives out of order:

  kind = 'replay'      turn_idx below what was already consumed
  kind = 'gap'         turn_idx jumps past the expected next index
  kind = 'ts_regress'  timestamp not after the previous turn's

State is a 2-field tuple per conversation — O(active conversations), not
O(turns) — and survives restarts through the streaming checkpoint, which
is exercised in tests by running two availableNow cycles against the same
checkpoint dir (north_rule resumability, streaming flavor).

Group sizes are conversation-bounded, so the per-row Python loop inside a
group is bounded and the shuffle distributes conversations; hot
conversations shard no worse than the batch window variant (skew.py)."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id string, turn_idx int, kind string, expected int"
)
STATE_SCHEMA = "next_expected int, last_ts double"


def _make_fn(idx_col: str, ts_col: str):
    def fn(key, pdfs, state: GroupState):
        conv = key[0]
        if state.exists:
            next_expected, last_ts = state.get
        else:
            next_expected, last_ts = 0, None
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(idx_col)
            ts_secs = (
                pd.to_datetime(pdf[ts_col]).astype("int64") / 1e9
                if len(pdf)
                else pdf[ts_col]
            )
            for t, ts in zip(pdf[idx_col].tolist(), list(ts_secs)):
                if t < next_expected:
                    out.append((conv, int(t), "replay", int(next_expected)))
                elif t > next_expected:
                    out.append((conv, int(t), "gap", int(next_expected)))
                    next_expected = int(t) + 1
                else:
                    next_expected = int(t) + 1
                if last_ts is not None and ts <= last_ts:
                    out.append((conv, int(t), "ts_regress", -1))
                last_ts = float(ts)
        state.update((int(next_expected), float(last_ts) if last_ts else 0.0))
        yield pd.DataFrame(
            out, columns=["conv_id", "turn_idx", "kind", "expected"]
        )

    return fn


def streaming_turn_order_violations(
    stream_df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """Apply the stateful validator to a streaming transcript DataFrame."""
    return stream_df.groupBy(conv_col).applyInPandasWithState(
        _make_fn(idx_col, ts_col),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

"""Deterministic synthetic transcript tables (FIXTURES.md §A).

The primary input mandated by BASELINE.json `input_hint`:
(conv_id string, turn_idx int32, role string, text string, tool string,
ts timestamp). Generation is a pure function of (seed, n_convs, scale knobs),
fully vectorized in numpy so the >=10M-turn bench scale generates in seconds.

Per-turn text is a pure function of (conv_id, turn_idx) — per-turn text
equality under stable (conv_id, turn_idx) ordering is exactly checkable,
as the `input_hint` requires.

Conversation sizes follow a heavy-tailed (Zipf-like) distribution plus
explicit hot conversations, so groupBy/window checks exercise the skew path
the north_rule demands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ROLES = np.array(["user", "assistant", "system", "tool"])
ROLE_PROBS = np.array([0.42, 0.42, 0.04, 0.12])
ROLE_PROBS_SHIFTED = np.array([0.30, 0.50, 0.04, 0.16])
TOOLS = np.array(["search", "exec", "read", "write"])

BASE_TS = np.datetime64("2026-01-01T00:00:00", "s").astype("datetime64[us]")

_VOCAB = (
    "the quick brown fox jumps over lazy dog while agent replies with tool "
    "output and user asks about data pipeline schema validation spark shuffle "
    "partition skew checkpoint resume turn conversation transcript token "
    "model response context window stream batch merge fold state format"
).split()


def _mix(a: np.ndarray, b: np.ndarray | int) -> np.ndarray:
    """Cheap deterministic 64-bit mix (splitmix64 finalizer)."""
    h = (a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) ^ (
        np.asarray(b, dtype=np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
    )
    h ^= h >> np.uint64(31)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(29)
    return h


def _text_pool(pool_size: int, seed: int, min_words: int = 5,
               max_words: int = 60) -> np.ndarray:
    rng = np.random.default_rng(seed)
    pool = []
    for _ in range(pool_size):
        n = int(rng.integers(min_words, max_words + 1))
        pool.append(" ".join(rng.choice(_VOCAB, size=n)))
    return np.array(pool, dtype=object)


def generate_transcripts(
    n_convs: int,
    seed: int = 42,
    hot_convs: int = 0,
    hot_turns: int = 4096,
    avg_turns: float = 6.0,
    max_turns: int = 64,
    shifted: bool = False,
    text_pool_size: int = 4096,
) -> pa.Table:
    """Generate a clean transcript table as a pyarrow Table.

    ``shifted=True`` produces the drift snapshot (FIXTURES.md §C): role
    probabilities re-weighted, per-turn ts deltas x1.8, text lengths +40%,
    tool distribution unchanged.
    """
    rng = np.random.default_rng(seed)

    sizes = 1 + rng.poisson(avg_turns - 1, size=n_convs)
    sizes = np.minimum(sizes, max_turns)
    # Zipf-ish heavy tail: a few conversations get large sizes
    tail = rng.random(n_convs) < 0.02
    sizes[tail] = np.minimum(
        sizes[tail] + rng.zipf(1.8, size=int(tail.sum())), max_turns
    )
    if hot_convs > 0:
        sizes[:hot_convs] = hot_turns  # explicit skew: very hot conv_ids

    total = int(sizes.sum())
    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), sizes)
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    turn_idx = (np.arange(total, dtype=np.int64) - np.repeat(starts, sizes)).astype(
        np.int32
    )

    import pyarrow.compute as pc

    width = max(6, len(str(n_convs)))
    conv_ids = pc.binary_join_element_wise(
        "c", pc.utf8_lpad(pc.cast(pa.array(conv_num), pa.string()), width, "0"), ""
    )

    h = _mix(conv_num.astype(np.uint64), turn_idx.astype(np.uint64) + np.uint64(seed))

    probs = ROLE_PROBS_SHIFTED if shifted else ROLE_PROBS
    cum = np.cumsum(probs)
    u = (h % np.uint64(1_000_000)).astype(np.float64) / 1_000_000.0
    role_idx = np.searchsorted(cum, u, side="right").clip(0, 3)
    # 'system' only at turn_idx == 0
    role_idx[(role_idx == 2) & (turn_idx != 0)] = 0
    roles = pa.array(list(ROLES), type=pa.string()).take(pa.array(role_idx))

    tool_h = _mix(h, 7)
    tools = pc.if_else(
        pa.array(role_idx == 3),
        pa.array(list(TOOLS), type=pa.string()).take(
            pa.array((tool_h % 4).astype(int))
        ),
        pa.scalar(None, type=pa.string()),
    )

    # Text: dictionary-encoded against a pre-joined pool — elementwise string
    # construction at 10^7+ rows is the bottleneck, while a DictionaryArray is
    # O(rows) int32 indices (and parquet stores it dictionary-encoded, which is
    # also what a 100 TB corpus scan loves). Text stays a pure function of
    # (conv_id, turn_idx): index = mix(conv, turn) % pool.
    base_pool = _text_pool(text_pool_size, seed=seed ^ 0x5EED)
    variants = 16  # suffix variants per base entry -> 64k distinct texts
    psize = text_pool_size * variants
    entries = [""] + [
        f"{base_pool[j % text_pool_size]} #{j % 997:03d}" for j in range(psize)
    ]
    if shifted:
        # +40% mean length: 40% of rows map to extended entries
        entries += [
            (e + " " + base_pool[(j * 2654435761) % text_pool_size]) if e else ""
            for j, e in enumerate(entries)
        ]
    text_h = _mix(h, 11)
    idx = 1 + (text_h % np.uint64(psize)).astype(np.int64)
    idx[(text_h % np.uint64(100)) == np.uint64(0)] = 0  # p=0.01 empty text
    if shifted:
        long_mask = (text_h % np.uint64(10)) < np.uint64(4)
        idx = np.where(long_mask, idx + psize + 1, idx)
    texts = pa.DictionaryArray.from_arrays(
        pa.array(idx, type=pa.int32()), pa.array(entries, type=pa.string())
    )

    # ts: base + per-conv offset + strictly increasing per-turn deltas (1-300s)
    deltas = (1 + (_mix(h, 17) % np.uint64(300))).astype(np.int64)
    if shifted:
        deltas = (deltas.astype(np.float64) * 1.8).astype(np.int64)
    gcum = np.cumsum(deltas)
    conv_base = np.repeat(gcum[starts] - deltas[starts], sizes)
    within = gcum - conv_base
    conv_offset = np.repeat(
        (_mix(np.arange(n_convs, dtype=np.uint64), 23) % np.uint64(86400 * 30)).astype(
            np.int64
        ),
        sizes,
    )
    ts = BASE_TS + ((conv_offset + within) * 1_000_000).astype("timedelta64[us]")

    return pa.table(
        {
            "conv_id": conv_ids,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )



def _cast_string_chunked(col: pa.ChunkedArray, step: int = 1_000_000) -> pa.ChunkedArray:
    """Dictionary -> string cast in bounded slices: a single cast chunk of
    >2 GiB of text overflows arrow's 32-bit string offsets at bench scale."""
    chunks = []
    for i in range(0, len(col), step):
        chunks.append(col.slice(i, step).cast(pa.string()).combine_chunks())
    return pa.chunked_array(chunks, type=pa.string())


def decode(table: pa.Table) -> pa.Table:
    """Decode dictionary-encoded columns to plain strings (for pandas interop;
    Spark reads the dictionary-encoded parquet transparently either way)."""
    return pa.table(
        {
            n: _cast_string_chunked(col) if pa.types.is_dictionary(col.type) else col
            for n, col in zip(table.schema.names, table.columns)
        }
    )


def inject_violations(table: pa.Table, seed: int = 42) -> tuple[pa.Table, dict]:
    """Clean table + exact labeled violation injections (FIXTURES.md §A).

    Returns (violated_table, injection_log); the log IS the test oracle:
      - dup_keys: duplicated (conv_id, turn_idx) rows (~0.1% of rows)
      - gap_convs: convs with a turn_idx gap (one interior row removed)
      - shift_convs: convs whose turn_idx starts at 1 (non-zero start)
      - null_role_rows / null_text_rows: required columns nulled (~0.05%)
      - bad_role_rows: out-of-enum role "robot" (~0.02%)
      - ts_regression_convs: one ts regression inside the conv
    """
    rng = np.random.default_rng(seed ^ 0xB10C)
    # decode dictionary columns (pandas Categorical requires unique categories)
    table = decode(table)
    df = table.to_pandas()
    n = len(df)
    log: dict = {}

    # positional index per conversation, built ONCE (rows are generated in
    # turn order per conv, so grp[c][k] is the row with the k-th turn) —
    # per-conv boolean scans would be O(convs * n) at bench scale
    grp = df.groupby("conv_id", sort=False).indices

    # duplicates: sample rows, append copies
    dup_rows = rng.choice(n, size=max(1, n // 1000), replace=False)
    dup_df = df.iloc[dup_rows].copy()
    log["dup_keys"] = sorted(
        map(tuple, dup_df[["conv_id", "turn_idx"]].itertuples(index=False))
    )

    convs = df["conv_id"].unique()
    k_gap = max(1, len(convs) // 500)

    # gaps: remove one interior turn from selected convs (size >= 3)
    sizes = df.groupby("conv_id", sort=False)["turn_idx"].max()
    big = sizes[sizes >= 3].index.to_numpy()
    gap_convs = rng.choice(big, size=min(k_gap, len(big)), replace=False)
    drop_idx = [grp[c][1] for c in gap_convs]  # remove turn_idx==1 -> gap
    log["gap_convs"] = sorted(map(str, gap_convs))

    # non-zero starts: remove turn 0 from other convs
    # (sorted-set diff == np.setdiff1d output, without in1d's O(n*m)
    # object-dtype fallback that goes quadratic at bench scale)
    rest = np.array(sorted(set(big) - set(gap_convs)))
    shift_convs = rng.choice(rest, size=min(k_gap, len(rest)), replace=False)
    drop0 = [grp[c][0] for c in shift_convs]
    log["shift_convs"] = sorted(map(str, shift_convs))

    keep = np.ones(n, dtype=bool)
    keep[np.asarray(drop_idx + drop0, dtype=np.int64)] = False
    df = df.iloc[np.flatnonzero(keep)]

    df = (
        df._append(dup_df)
        if hasattr(df, "_append")
        else __import__("pandas").concat([df, dup_df])
    )
    df = df.reset_index(drop=True)
    n = len(df)

    # null required columns
    null_role = rng.choice(n, size=max(1, n // 2000), replace=False)
    mask = np.ones(n, dtype=bool)
    mask[null_role] = False
    remaining = np.flatnonzero(mask)
    null_text = rng.choice(remaining, size=max(1, n // 2000), replace=False)
    df.loc[null_role, "role"] = None
    df.loc[null_text, "text"] = None
    log["null_role_rows"] = sorted(
        map(tuple, df.loc[null_role, ["conv_id", "turn_idx"]].itertuples(index=False))
    )
    log["null_text_rows"] = sorted(
        map(tuple, df.loc[null_text, ["conv_id", "turn_idx"]].itertuples(index=False))
    )

    # out-of-enum role
    mask[null_text] = False
    pool2 = np.flatnonzero(mask)
    bad_role = rng.choice(pool2, size=max(1, n // 5000), replace=False)
    df.loc[bad_role, "role"] = "robot"
    log["bad_role_rows"] = sorted(
        map(tuple, df.loc[bad_role, ["conv_id", "turn_idx"]].itertuples(index=False))
    )

    # ts regression inside some convs: swap ts of turns 0 and 1
    reg_pool = np.array(sorted(set(convs) - set(gap_convs) - set(shift_convs)))
    reg_convs = rng.choice(
        reg_pool,
        size=min(max(1, len(convs) // 2000), len(convs)),
        replace=False,
    )
    grp2 = df.groupby("conv_id", sort=False).indices
    swap_a, swap_b = [], []
    for c in reg_convs:
        rows = grp2[c]
        if len(rows) >= 2:
            swap_a.append(rows[0])
            swap_b.append(rows[1])
    if swap_a:
        # one vectorized pass: per-row .loc setitem would copy the whole
        # block each time (quadratic at bench scale)
        ts = df["ts"].to_numpy().copy()
        a_idx = np.asarray(swap_a)
        b_idx = np.asarray(swap_b)
        ts[a_idx], ts[b_idx] = ts[b_idx].copy(), ts[a_idx].copy()
        df["ts"] = ts
    log["ts_regression_convs"] = sorted(map(str, reg_convs))

    # chunked conversion: one giant chunk would overflow arrow's 32-bit
    # string offsets (>2 GiB of text) at bench scale
    step = 1_000_000
    parts = [
        pa.Table.from_pandas(df.iloc[i : i + step], preserve_index=False).cast(
            table.schema
        )
        for i in range(0, len(df), step)
    ]
    return pa.concat_tables(parts), log


def write_parquet(table: pa.Table, path: str, row_group_size: int = 128 * 1024) -> str:
    """Write with small row groups: Spark's scan parallelism on a single
    parquet file is bounded by row-group count, so 1M-row default groups
    would cap a 10M-row bench table at ~10 tasks regardless of cores."""
    import pyarrow.parquet as pq

    pq.write_table(table, path, row_group_size=row_group_size)
    return path

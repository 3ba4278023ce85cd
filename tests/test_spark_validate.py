"""Validation operators vs the exact injection oracle (FIXTURES.md §A)."""

import pytest

from jsonschema_infer_spark.operators.infer_spark import infer_dataframe
from jsonschema_infer_spark.operators import validate as V


@pytest.fixture(scope="module")
def compiled(spark, tx_paths):
    clean = spark.read.parquet(tx_paths["clean"])
    viol = spark.read.parquet(tx_paths["viol"])
    res = infer_dataframe(clean, num_partitions=4)
    cons = V.compile_constraints(res.schema, state=res.state, df=viol)
    return res, cons, clean, viol, tx_paths["log"]


def test_row_constraint_counts_match_injections(compiled):
    res, cons, clean, viol, log = compiled
    counts = {
        r.constraint: r.violation_count
        for r in V.violation_counts(viol, cons).collect()
    }
    assert counts["required:role"] == len(log["null_role_rows"])
    assert counts["required:text"] == len(log["null_text_rows"])
    assert counts["enum:role"] == len(log["bad_role_rows"])
    # clean columns stay clean
    assert counts["required:conv_id"] == 0
    assert counts["format:ts:date-time"] == 0


def test_violation_rows_carry_reasons(compiled):
    res, cons, clean, viol, log = compiled
    rows = V.violations(viol, cons, keep_cols=["conv_id", "turn_idx", "role"]).collect()
    by_reason = {}
    for r in rows:
        for v in r.violations:
            by_reason.setdefault(v, set()).add((r.conv_id, r.turn_idx))
    assert by_reason["enum:role"] == set(map(tuple, log["bad_role_rows"]))
    assert by_reason["required:role"] == set(map(tuple, log["null_role_rows"]))


def test_clean_table_passes_all(compiled):
    res, cons, clean, viol, log = compiled
    assert V.violations(clean, cons).count() == 0
    verd = V.partition_verdicts(clean, cons, num_buckets=16)
    assert verd.filter("NOT passed").count() == 0


def test_duplicate_keys_match_injections(compiled):
    res, cons, clean, viol, log = compiled
    dups = {
        (r.conv_id, r.turn_idx)
        for r in V.duplicate_keys(viol, ["conv_id", "turn_idx"]).collect()
    }
    assert dups == set(map(tuple, log["dup_keys"]))
    # duplicate_rows returns 2 rows per duplicated key
    assert V.duplicate_rows(viol, ["conv_id", "turn_idx"]).count() == 2 * len(dups)
    assert V.duplicate_keys(clean, ["conv_id", "turn_idx"]).count() == 0


def test_turn_ordering_matches_injections(compiled):
    res, cons, clean, viol, log = compiled
    got = {r.conv_id: list(r.reasons) for r in V.turn_ordering_violations(viol).collect()}
    expected_convs = (
        set(log["gap_convs"])
        | set(log["shift_convs"])
        | {c for c, _ in log["dup_keys"]}
    )
    assert set(got) == expected_convs
    for c in log["gap_convs"]:
        assert "gap" in got[c]
    for c in log["shift_convs"]:
        assert "nonzero_start" in got[c]
    for c, _ in log["dup_keys"]:
        assert "dup_turn" in got[c]
    assert V.turn_ordering_violations(clean).count() == 0


def test_integrity_summary_matches_separate_operators(compiled):
    res, cons, clean, viol, log = compiled
    summ = V.transcript_integrity_summary(viol)
    assert summ["ordering_violations"] == V.turn_ordering_violations(viol).count()
    excess = sum(
        r.dup_count - 1
        for r in V.duplicate_keys(viol, ["conv_id", "turn_idx"]).collect()
    )
    assert summ["dup_rows_excess"] == excess
    clean_summ = V.transcript_integrity_summary(clean)
    assert clean_summ == {"dup_rows_excess": 0, "ordering_violations": 0}


def test_integrity_parquet_native_matches(spark, tx_paths):
    viol = spark.read.parquet(tx_paths["viol"])
    want = V.transcript_integrity_summary(viol)
    assert V.transcript_integrity_parquet(
        spark, tx_paths["viol"], rg_per_task=1
    ) == want
    # native map side + distributed reduce (the scaling form)
    assert V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1
    ) == want
    # the long-conversation split strategy: identical result
    assert V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1, distinct_strategy="split"
    ) == want
    assert V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1, distinct_strategy="collect"
    ) == want
    # auto with a zero threshold must route to the distributed reduce
    assert V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1, local_merge_max_bytes=0
    ) == want
    assert V.transcript_integrity_summary(viol, distinct_strategy="split") == want
    # tree-reduce escape hatch: executors consolidate pairwise, the driver
    # merges one consolidated table — identical counts
    assert V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1, distinct_strategy="tree"
    ) == want
    clean = V.transcript_integrity_native(spark, tx_paths["clean"], rg_per_task=1)
    assert clean == {"dup_rows_excess": 0, "ordering_violations": 0}


def test_consolidate_partials_associative_and_equal():
    """_consolidate_partials (the tree combine) must agree with
    _merge_partials_local on any split of the same partial rows, including
    negative turn indices and multi-part convs."""
    import pyarrow as pa

    data = {
        "conv": ["a", "b", "c", "c", "d", "d", "d"],
        "n": pa.array([3, 4, 3, 3, 2, 2, 1], type=pa.int64()),
        "mn": pa.array([0, 0, 0, 3, -2, 0, 2], type=pa.int32()),
        "mx": pa.array([2, 2, 2, 5, -1, 1, 2], type=pa.int32()),
        "ndl": pa.array([3, 3, 3, 3, 2, 2, 1], type=pa.int64()),
        "turns": pa.array(
            [[0, 1, 2], [0, 1, 2], [0, 1, 2], [3, 4, 5],
             [-2, -1], [0, 1], [2]],
            type=pa.list_(pa.int32()),
        ),
    }
    full = pa.table(data)
    want = V._merge_partials_local(full)
    one = V._consolidate_partials(full)
    # consolidated: one row per conv, and the local merge of it agrees
    assert one.num_rows == 4
    assert V._merge_partials_local(one) == want
    # associativity: consolidate halves, concat, consolidate again
    left = V._consolidate_partials(full.slice(0, 4))
    right = V._consolidate_partials(full.slice(4))
    again = V._consolidate_partials(pa.concat_tables([left, right]))
    assert V._merge_partials_local(again) == want
    # IPC round-trip used by treeReduce
    assert V._ipc_deser(V._ipc_ser(one)).equals(one)
    # empty table passes through
    assert V._consolidate_partials(full.slice(0, 0)).num_rows == 0


def test_ts_regressions_match_injections(compiled):
    res, cons, clean, viol, log = compiled
    got_convs = {r.conv_id for r in V.ts_regressions(viol).collect()}
    # injected regressions, plus duplicated turns (equal ts -> not strictly
    # increasing) — both are genuine ordering violations
    expected = set(log["ts_regression_convs"]) | {c for c, _ in log["dup_keys"]}
    assert got_convs == expected
    assert V.ts_regressions(clean).count() == 0


def test_column_stats(compiled):
    res, cons, clean, viol, log = compiled
    stats = {r.column: r for r in V.column_stats(clean).collect()}
    n = clean.count()
    assert stats["conv_id"].n == n and stats["conv_id"].nulls == 0
    assert stats["turn_idx"].min == "0"
    assert stats["tool"].nulls > 0
    assert stats["text"].len_min == 0.0  # empty strings exist (p=0.01)
    assert stats["turn_idx"].mean is not None


def test_partition_verdicts_deterministic(compiled):
    res, cons, clean, viol, log = compiled
    v1 = sorted(
        (r.bucket, r.rows, r.violation_total)
        for r in V.partition_verdicts(viol, cons, num_buckets=16).collect()
    )
    v2 = sorted(
        (r.bucket, r.rows, r.violation_total)
        for r in V.partition_verdicts(viol.repartition(13), cons, num_buckets=16).collect()
    )
    assert v1 == v2  # buckets are content-hash based, not physical partitions


def test_merge_partials_local_negative_turns():
    """Driver merge handles negative int32 turn indices in multi-part convs:
    the composite-key bias keeps the >>32 code recovery exact (an unbiased
    key would floor-shift a negative turn into the neighboring conv)."""
    import pyarrow as pa

    # conv "a" split across two map tasks with turns {-2,-1,0} / {0,1}:
    # n=5 rows, distinct=5? no: union{-2,-1,0,1} = 4 -> one dup-excess row,
    # min=-2 != 0 -> ordering violation. conv "b" is clean single-part.
    partials = pa.table(
        {
            "conv": ["a", "a", "b"],
            "n": pa.array([3, 2, 2], type=pa.int64()),
            "mn": pa.array([-2, 0, 0], type=pa.int32()),
            "mx": pa.array([0, 1, 1], type=pa.int32()),
            "ndl": pa.array([3, 2, 2], type=pa.int64()),
            "turns": pa.array(
                [[-2, -1, 0], [0, 1], [0, 1]], type=pa.list_(pa.int32())
            ),
        }
    )
    got = V._merge_partials_local(partials)
    assert got == {"dup_rows_excess": 1, "ordering_violations": 1}


def test_merge_partials_local_two_tier_vs_bruteforce():
    """The single-part fast path (rows judged without grouping) and the
    multi-part exact path agree with a per-conv brute force on every
    violation class: clean single, dup single, offset start, gapped
    range, clean 2-part split, 3-part split with cross-part duplicate
    turns, and the empty table."""
    import pyarrow as pa

    convs = {
        "clean_single": [[0, 1, 2]],
        "dup_single": [[0, 1, 1, 2]],       # n=4 nd=3
        "offset_single": [[1, 2, 3]],       # mn != 0
        "gap_single": [[0, 2]],             # mx != nd-1
        "clean_multi": [[0, 1, 2], [3, 4, 5]],
        "dupx_multi": [[0, 1, 2], [2, 3], [3, 4, 5]],  # dups across parts
    }
    rows = {"conv": [], "n": [], "mn": [], "mx": [], "ndl": [], "turns": []}
    for conv, parts in convs.items():
        for part in parts:
            uniq = sorted(set(part))
            rows["conv"].append(conv)
            rows["n"].append(len(part))
            rows["mn"].append(min(part))
            rows["mx"].append(max(part))
            rows["ndl"].append(len(uniq))
            rows["turns"].append(uniq)
    partials = pa.table(
        {
            "conv": rows["conv"],
            "n": pa.array(rows["n"], type=pa.int64()),
            "mn": pa.array(rows["mn"], type=pa.int32()),
            "mx": pa.array(rows["mx"], type=pa.int32()),
            "ndl": pa.array(rows["ndl"], type=pa.int64()),
            "turns": pa.array(rows["turns"], type=pa.list_(pa.int32())),
        }
    )
    # brute force over the raw per-conv turn multisets
    dup = bad = 0
    for parts in convs.values():
        flat = [t for p in parts for t in p]
        nd = len(set(flat))
        dup += len(flat) - nd
        if min(flat) != 0 or max(flat) != nd - 1 or nd != len(flat):
            bad += 1
    got = V._merge_partials_local(partials)
    assert got == {"dup_rows_excess": dup, "ordering_violations": bad}
    assert got == {"dup_rows_excess": 3, "ordering_violations": 4}

    empty = partials.slice(0, 0)
    assert V._merge_partials_local(empty) == {
        "dup_rows_excess": 0,
        "ordering_violations": 0,
    }


def test_referential_violations(spark):
    child = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (7, "d"), (7, "e"), (7, "f"), (None, "g")],
        "fk long, payload string",
    )
    parent = spark.createDataFrame(
        [(1, "p1"), (2, "p2"), (2, "p2dup"), (3, "p3")], "pk long, name string"
    )
    got = {
        (r.fk, r.orphan_rows)
        for r in V.referential_violations(child, parent, "fk", "pk").collect()
    }
    # 7 has no parent (3 rows); NULL fk matches nothing (1 row, reported);
    # 1 and 2 are covered (parent dup keys must not multiply matches)
    assert got == {(7, 3), (None, 1)}
    # non-broadcast path: identical result
    got2 = {
        (r.fk, r.orphan_rows)
        for r in V.referential_violations(
            child, parent, "fk", "pk", broadcast_parent=False
        ).collect()
    }
    assert got2 == got


def test_referential_violations_plan_broadcasts(spark):
    child = spark.range(0, 1000).withColumnRenamed("id", "fk")
    parent = spark.range(0, 500).withColumnRenamed("id", "pk")
    plan = V.referential_violations(child, parent, "fk", "pk")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_violation_examples_bounded_and_deterministic(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, "bad" if i % 2 else "ok", float(i)) for i in range(20)],
        "id long, status string, v double",
    )
    nullsafe = lambda c, p: c.isNull() | p  # noqa: E731
    cons = [
        V.Constraint("enum:status", "status", "enum",
                     nullsafe(F.col("status"), F.col("status") == "ok")),
        V.Constraint("range:v", "v", "range",
                     nullsafe(F.col("v"), F.col("v") < 15)),
        V.Constraint("never:fails", "id", "range",
                     nullsafe(F.col("id"), F.lit(True))),
    ]
    rows = V.violation_examples(df, cons, keep_cols=["id"], k=3).collect()
    by = {}
    for r in rows:
        by.setdefault(r.constraint, []).append((r.example_rank, r.id))
    # bounded at 3, deterministic order by id, ranks dense from 1
    assert sorted(by["enum:status"]) == [(1, 1), (2, 3), (3, 5)]
    assert sorted(by["range:v"]) == [(1, 15), (2, 16), (3, 17)]
    assert "never:fails" not in by
    # rerun identical (pure function of the data)
    again = V.violation_examples(df, cons, keep_cols=["id"], k=3).collect()
    assert {(r.constraint, r.example_rank, r.id) for r in again} == {
        (r.constraint, r.example_rank, r.id) for r in rows
    }


def test_validation_scan_tunes_and_restores_confs(spark, tx_paths, compiled):
    """validation_scan pins maxPartitionBytes + disables AQE for the block
    (read at action time), restores both on exit, and yields a scan whose
    results equal the untuned path."""
    res, cons, clean, viol, log = compiled
    before_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    baseline = {
        (r.constraint, r.violation_count)
        for r in V.violation_counts(viol, cons).collect()
    }
    with V.validation_scan(spark, tx_paths["viol"]) as vdf:
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes"))
        # clamped to [16 MiB, 128 MiB] regardless of file size
        assert (16 << 20) <= mpb <= (128 << 20)
        q = V.violation_counts(vdf, cons)
        # AQE genuinely off for this plan, not just the conf flipped
        assert "AdaptiveSparkPlan" not in q._jdf.queryExecution().toString()
        got = {(r.constraint, r.violation_count) for r in q.collect()}
    assert got == baseline
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == before_mpb
    assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe


def test_validation_scan_restores_confs_on_error(spark, tx_paths):
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    with pytest.raises(RuntimeError, match="boom"):
        with V.validation_scan(spark, tx_paths["viol"]):
            raise RuntimeError("boom")
    assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe


def test_merge_partials_local_hash_path_and_collisions():
    """The ``ch`` fast path equals the string fallback, and a hash
    COLLISION between two different convs only routes both through the
    exact string-keyed path — results unchanged (collision-proof by
    construction, not by hash quality)."""
    import pyarrow as pa

    import pandas as pd

    # clean single-part conv "a"; dup single "b"; 2-part clean "c"
    data = {
        "conv": ["a", "b", "c", "c"],
        "n": pa.array([3, 4, 3, 3], type=pa.int64()),
        "mn": pa.array([0, 0, 0, 3], type=pa.int32()),
        "mx": pa.array([2, 2, 2, 5], type=pa.int32()),
        "ndl": pa.array([3, 3, 3, 3], type=pa.int64()),
        "turns": pa.array(
            [[0, 1, 2], [0, 1, 2], [0, 1, 2], [3, 4, 5]],
            type=pa.list_(pa.int32()),
        ),
    }
    no_ch = pa.table(data)
    want = V._merge_partials_local(no_ch)
    assert want == {"dup_rows_excess": 1, "ordering_violations": 1}

    real = pd.util.hash_array(
        pa.array(data["conv"]).to_numpy(zero_copy_only=False).astype(object)
    ).view("int64")
    with_ch = no_ch.add_column(1, "ch", pa.array(real, type=pa.int64()))
    assert V._merge_partials_local(with_ch) == want

    # force a collision: single-part convs "a" and "b" share a hash ->
    # both take the exact path, keyed by their true conv strings
    collided = pa.table({**data, "ch": pa.array([7, 7, 9, 9], type=pa.int64())})
    collided = collided.select(
        ["conv", "ch", "n", "mn", "mx", "ndl", "turns"]
    )
    assert V._merge_partials_local(collided) == want

    # a resumed checkpoint mixing pre-ch part files with new ones unifies
    # to a ch column WITH NULLS; the fast path must be skipped (float64
    # NaNs make pandas duplicated() mark every legacy row a duplicate) and
    # the string fallback must give identical counts
    mixed = pa.table(
        {**data, "ch": pa.array([real[0], None, real[2], real[3]],
                                type=pa.int64())}
    ).select(["conv", "ch", "n", "mn", "mx", "ndl", "turns"])
    assert V._merge_partials_local(mixed) == want


def _spill_tables():
    """Two genuine-shaped spill tables (ch + ndl, like _fused_task writes):
    conv "a" spans both files with a duplicate turn and a non-zero start;
    everything else is clean."""
    import pyarrow as pa

    import pandas as pd

    def tbl(convs, ns, mns, mxs, turns):
        ch = pd.util.hash_array(
            pa.array(convs).to_numpy(zero_copy_only=False).astype(object)
        ).view("int64")
        return pa.table(
            {
                "conv": pa.array(convs, type=pa.string()),
                "ch": pa.array(ch, type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
                "mn": pa.array(mns, type=pa.int32()),
                "mx": pa.array(mxs, type=pa.int32()),
                "ndl": pa.array([len(t) for t in turns], type=pa.int64()),
                "turns": pa.array(turns, type=pa.list_(pa.int32())),
            }
        )

    t1 = tbl(["a", "b"], [3, 3], [1, 0], [3, 2], [[1, 2, 3], [0, 1, 2]])
    t2 = tbl(["a", "c"], [2, 2], [3, 0], [4, 1], [[3, 4], [0, 1]])
    # conv a: n=5, union{1,2,3,4}=4 -> 1 dup excess; mn=1 -> ordering bad
    return t1, t2


def test_incremental_spill_watcher_matches_cold(tmp_path):
    """The watcher's overlapped consume + finalize is bit-identical to the
    cold reduce_spilled_partials path on the same directory, including
    files that land AFTER the watcher started."""
    import time as _time

    import pyarrow.parquet as pq

    t1, t2 = _spill_tables()
    d = str(tmp_path)
    pq.write_table(t1, f"{d}/part-00000.parquet")
    w = V.IncrementalSpillWatcher(d, poll_secs=0.01)
    deadline = _time.time() + 5
    while not w._files and _time.time() < deadline:
        _time.sleep(0.01)
    assert w._files, "watcher never consumed the first file"
    pq.write_table(t2, f"{d}/part-00001.parquet")  # late arrival
    got = w.finalize()
    want = V._merge_partials_local(pq.read_table(d))
    assert got == want == {"dup_rows_excess": 1, "ordering_violations": 1}
    # cold path on the untouched directory agrees (spark unused locally)
    assert V.reduce_spilled_partials(None, d) == want
    # the stats surface bench/diag_integrity_wait.py reads: every file
    # accounted for, the one-shot resolve sort timed, dup values found
    assert w.stats["files_total"] == 2
    assert w.stats["dup_vals"] >= 1
    assert w.stats["matched_rows"] >= 2
    assert w.stats["resolve_sort_secs"] >= 0.0
    assert w.stats["decode_secs"] > 0.0


def test_incremental_spill_watcher_ignores_inprogress(tmp_path):
    """A torn ``.part-*.inprogress-<pid>`` temp file (writer killed between
    write and rename) is invisible to the watcher's glob AND to the cold
    path's reader."""
    import pyarrow.parquet as pq

    t1, t2 = _spill_tables()
    d = str(tmp_path)
    pq.write_table(t1, f"{d}/part-00000.parquet")
    with open(f"{d}/.part-00001.parquet.inprogress-42", "wb") as f:
        f.write(b"not a parquet footer")
    w = V.IncrementalSpillWatcher(d, poll_secs=0.01)
    got = w.finalize()
    assert got == V._merge_partials_local(t1)
    pq.write_table(t2, f"{d}/part-00001.parquet")
    assert V.reduce_spilled_partials(None, d) == V._merge_partials_local(
        __import__("pyarrow").concat_tables([t1, t2])
    )


def test_incremental_spill_watcher_overflow_and_mismatch_fall_back(tmp_path):
    """Byte-budget overflow and a schema-mismatched file both abort the
    incremental path (finalize -> None) with the directory left intact for
    the cold fallback."""
    import pyarrow.parquet as pq

    t1, t2 = _spill_tables()
    d1 = str(tmp_path / "overflow")
    (tmp_path / "overflow").mkdir()
    pq.write_table(t1, f"{d1}/part-00000.parquet")
    w = V.IncrementalSpillWatcher(d1, poll_secs=0.01, max_bytes=1)
    assert w.finalize() is None
    assert V.reduce_spilled_partials(None, d1) == V._merge_partials_local(t1)

    d2 = str(tmp_path / "mismatch")
    (tmp_path / "mismatch").mkdir()
    pq.write_table(t1, f"{d2}/part-00000.parquet")
    pq.write_table(t2.drop_columns(["ch"]), f"{d2}/part-00001.parquet")
    w2 = V.IncrementalSpillWatcher(d2, poll_secs=0.01)
    assert w2.finalize() is None


def test_incremental_spill_watcher_empty_dir(tmp_path):
    w = V.IncrementalSpillWatcher(str(tmp_path), poll_secs=0.01)
    assert w.finalize() == {"dup_rows_excess": 0, "ordering_violations": 0}


def test_incremental_spill_watcher_fuzz_vs_cold(tmp_path):
    """Seeded fuzz: random per-conv partials scattered over random file
    splits — watcher finalize must equal the cold kernel on every trial,
    including negative turns, convs spanning many files, duplicate turns
    across files, and FORCED ch collisions between different convs."""
    import random

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = random.Random(20260819)
    for trial in range(8):
        n_convs = rng.randint(1, 40)
        rows = []  # (conv, ch, turns_list)
        for c in range(n_convs):
            conv = f"conv{c}"
            # collide some hashes on purpose: different convs, same ch
            ch = c % max(1, n_convs // 3) if trial % 2 else c
            n_parts = rng.choice([1, 1, 1, 2, 3])
            for _ in range(n_parts):
                k = rng.randint(1, 5)
                lo = rng.choice([0, 0, 0, 1, -2])
                turns = sorted(
                    rng.sample(range(lo, lo + 8), k)
                )
                rows.append((conv, ch, turns))
        rng.shuffle(rows)
        n_files = rng.randint(1, max(2, len(rows) // 2))
        splits = [rows[i::n_files] for i in range(n_files)]
        d = tmp_path / f"trial{trial}"
        d.mkdir()
        for i, chunk in enumerate(c for c in splits if c):
            tbl = pa.table(
                {
                    "conv": pa.array([r[0] for r in chunk], type=pa.string()),
                    "ch": pa.array([r[1] for r in chunk], type=pa.int64()),
                    "n": pa.array(
                        [len(r[2]) + (1 if rng.random() < 0.3 else 0)
                         for r in chunk],
                        type=pa.int64(),
                    ),
                    "mn": pa.array([min(r[2]) for r in chunk], type=pa.int32()),
                    "mx": pa.array([max(r[2]) for r in chunk], type=pa.int32()),
                    "ndl": pa.array([len(r[2]) for r in chunk], type=pa.int64()),
                    "turns": pa.array(
                        [r[2] for r in chunk], type=pa.list_(pa.int32())
                    ),
                }
            )
            pq.write_table(tbl, str(d / f"part-{i:05d}.parquet"))
        w = V.IncrementalSpillWatcher(str(d), poll_secs=0.005)
        got = w.finalize()
        files = sorted(str(p) for p in d.glob("part-*.parquet"))
        want = V._merge_partials_local(
            pa.concat_tables([pq.read_table(p) for p in files])
        )
        assert got == want, f"trial {trial}: {got} != {want}"


def test_validation_scan_nested_and_concurrent_restore(spark, tx_paths):
    """Same-thread nesting is legal (RLock) and restores confs inside-out;
    a conf another actor re-set DURING the block is kept, not clobbered by
    the block's stale saved value."""
    before_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    before_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
    with V.validation_scan(spark, tx_paths["viol"]):
        inner_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")
        with V.validation_scan(spark, tx_paths["viol"], waves=12):
            assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        # inner restored to the outer block's pin (values equal here since
        # both scans read the same file set; AQE must still be off)
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
        assert (
            spark.conf.get("spark.sql.files.maxPartitionBytes") == inner_mpb
        )
    assert spark.conf.get("spark.sql.adaptive.enabled") == before_aqe
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == before_mpb

    # third-party re-set during the block survives the exit
    with V.validation_scan(spark, tx_paths["viol"]):
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    spark.conf.set("spark.sql.adaptive.enabled", before_aqe)


def test_integrity_fold_emits_deterministic_ch(spark, tx_paths):
    """Spilled partials carry the uint64 conv hash, identical across
    independent fold invocations (siphash with a fixed key, no
    PYTHONHASHSEED dependence)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    fold = V._integrity_fold("conv_id", "turn_idx")
    src = pq.read_table(tx_paths["viol"]).select(["conv_id", "turn_idx"])
    out1 = pa.Table.from_batches(list(fold(src.to_batches())))
    out2 = pa.Table.from_batches(list(fold(src.to_batches())))
    assert "ch" in out1.schema.names
    assert out1.schema.field("ch").type == pa.int64()
    assert out1.column("ch").to_pylist() == out2.column("ch").to_pylist()
    # hash is a pure function of conv: equal convs share it
    df = out1.select(["conv", "ch"]).to_pandas()
    assert (df.groupby("conv")["ch"].nunique() == 1).all()

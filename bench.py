#!/usr/bin/env python
"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "turns_per_sec": ..., "bench_rows": ...}

The flagship measurement is the transcript validation pipeline
(inference + constraint compile + full validation suite) over a
deterministic synthetic transcript table (seed-fixed, cached under
.cache/), reported as turns/sec — the BASELINE.json metric. Scaling
evidence across parallelism levels comes from bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "events_column_stats",
    "events_user_sessions",
    "q1_pricing_summary",
    "q3_revenue_topk",
    "region_revenue",
    "best_order_per_customer",
    "docs_token_stats",
    "docs_quality",
    "docs_top_jaccard",
    "events_type_drift",
    "events_type_psi",
    "events_value_psi",
    "events_value_ks",
    "events_value_ks_hist",
    "events_orphan_users",
    "events_violation_examples",
    "events_type_cap",
    "docs_repetition",
    "docs_decontaminate",
    "docs_split_profile",
    "embeddings_topk",
    "embeddings_cos_pairs",
    "embeddings_lsh_pairs",
    "embeddings_ivf_topk",
    "minhash_dups_docs",
    "simhash_near_docs",
    "infer_events_schema",
]

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


# --- host-health probes (shared with bench_scaling.py) -----------------------
# This microVM degrades on two independent axes for minutes at a time:
# page-fault servicing (the same 256 MB numpy copy measured 29 s and 0.08 s
# apart) and raw CPU clock (fixed single-thread burn 1.4 s healthy, 3.1 s
# degraded with 4-5% steal). Every benchmark number is gated on both.


def memcpy_gbps(size_mb: int = 256, reps: int = 3) -> float:
    """First-touch + copy bandwidth probe (best of reps), GB/s."""
    import numpy as np

    a = np.zeros(size_mb * 1024 * 1024 // 8)
    best = 1e9
    for _ in range(reps):
        t = time.time()
        b = a.copy()
        best = min(best, time.time() - t)
        del b
    return round(size_mb / 1024.0 / best, 2)


def _burn(_=None):
    s = 0
    for i in range(20_000_000):
        s += i % 7
    return s


def cpu_burn_secs() -> float:
    """Fixed-work single-thread probe, seconds (best of 2)."""
    best = 1e9
    for _ in range(2):
        t = time.time()
        _burn()
        best = min(best, time.time() - t)
    return round(best, 2)


def probe_health() -> tuple:
    """(mem GB/s, cpu burn secs, healthy?) — healthy needs BOTH axes."""
    gbps = memcpy_gbps()
    burn = cpu_burn_secs()
    return gbps, burn, gbps >= 2.0 and burn <= 2.0


def wait_healthy(max_wait_s: float = 600.0) -> tuple:
    """Block (bounded) until the host leaves a degraded window; fail-open
    on a permanently slow host. Returns the last (gbps, burn_s)."""
    deadline = time.time() + max_wait_s
    gbps, burn, ok = probe_health()
    while not ok and time.time() < deadline:
        print(
            f"  host degraded (mem {gbps} GB/s, burn {burn}s) — waiting 30s",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(30)
        gbps, burn, ok = probe_health()
    return gbps, burn


_PROBE_ARR = None


def _probe_init(size_mb: int) -> None:
    """Pool initializer: allocate + pre-fault each worker's source array
    OUTSIDE the timed region, so the timed copy carries the same traffic
    mix as memcpy_gbps' steady-state reps (copy + dest faults only)."""
    global _PROBE_ARR
    import numpy as np

    _PROBE_ARR = np.zeros(size_mb * 1024 * 1024 // 8)
    _PROBE_ARR += 1.0


def _copy_worker(_) -> float:
    t = time.time()
    b = _PROBE_ARR.copy()
    dt = time.time() - t
    del b
    return dt


def parallel_memcpy_gbps(procs: int, size_mb: int = 256, reps: int = 3) -> float:
    """AGGREGATE copy bandwidth with `procs` concurrent workers, GB/s —
    how much wider the one memory bus gets when threads multiply. The
    (bw_4N / bw_N) / 4 ratio is the hard ceiling for any memory-bound
    job's N->4N scaling efficiency on this host (bench_scaling.py reports
    it next to the measured pair). Wall-times the concurrent map of pure
    copies (sources pre-faulted in the pool initializer)."""
    import multiprocessing as mp

    best = 1e9
    with mp.Pool(procs, initializer=_probe_init, initargs=(size_mb,)) as p:
        p.map(_copy_worker, range(procs), chunksize=1)  # warm pool + pages
        for _ in range(reps):
            t0 = time.time()
            p.map(_copy_worker, range(procs), chunksize=1)
            best = min(best, time.time() - t0)
    return round(procs * size_mb / 1024.0 / best, 2)


def ensure_bench_transcripts(n_convs: int, seed: int = 42) -> str:
    """Generate-and-cache the bench transcript table (violated variant so the
    validation pass has real work)."""
    os.makedirs(CACHE, exist_ok=True)
    # v2: violated variant + small row groups (scan-parallelism fix)
    path = os.path.join(CACHE, f"transcripts_bench_v2_{n_convs}_{seed}.parquet")
    if not os.path.exists(path):
        from jsonschema_infer_spark.sources.transcripts import (
            generate_transcripts,
            inject_violations,
            write_parquet,
        )

        table = generate_transcripts(n_convs, seed=seed, hot_convs=3, hot_turns=4096)
        table, _log = inject_violations(table, seed=seed)
        write_parquet(table, path)
    return path


def run_transcript_pipeline(spark, path: str) -> dict:
    """The headline pipeline: infer schema -> compile constraints ->
    row validation + uniqueness + turn ordering, one timed end-to-end run."""
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.pipeline import infer_and_integrity_parquet

    df = spark.read.parquet(path)
    # task granularity scaled to the cluster (same rule as bench/pipeline_job)
    import pyarrow.parquet as pq

    cores = spark.sparkContext.defaultParallelism
    n_rg = pq.ParquetFile(path).num_row_groups
    rg_per_task = max(1, min(4, n_rg // (cores * 6)))
    t0 = time.time()
    # single-pass flow (same as bench/pipeline_job rev 6): predict the
    # constraint spec from row-group 0, count violations against it inside
    # the fused scan, confirm the prediction post-hoc; the classic
    # prewarm+validation_scan path remains as the miss fallback
    from jsonschema_infer_spark.operators.pipeline import (
        ValidationPrewarm,
        predict_constraint_spec,
    )

    pred_spec = predict_constraint_spec(path)
    pw = ValidationPrewarm(spark, path, spec=pred_spec)
    res, integ_fut, vcounts = infer_and_integrity_parquet(
        spark,
        path,
        rg_per_task=rg_per_task,
        integrity="background",
        violation_spec=pred_spec,
    )
    real_spec = V.constraint_spec(
        res.schema, state=res.state, temporal_cols=V.temporal_columns(df)
    )
    if frozenset(real_spec) == frozenset(pred_spec):
        agg_counts = vcounts
    else:
        cons = pw.constraints_for(res.schema, res.state, df)
        with V.validation_scan(spark, path) as vdf:
            agg_counts = {
                r.constraint: r.violation_count
                for r in V.violation_counts(vdf, cons).collect()
            }
    integ = integ_fut.result()
    secs = time.time() - t0
    rows = res.total_rows
    return {
        "rows": rows,
        "secs": secs,
        "turns_per_sec": rows / secs,
        "row_violations": int(sum(agg_counts.values())),
        "dup_rows_excess": integ["dup_rows_excess"],
        "ordering_violations": integ["ordering_violations"],
    }


def run_suite(
    spark, qs, sf_dir: str, n_convs: int, reps: int, pipe_reps: int
) -> tuple:
    """One pass over the transcript pipeline (one untimed warm-up, then
    best of ``pipe_reps``) followed by the headline queries (best of
    ``reps`` timed runs each, after one warm-up).

    The pipeline — the headline turns/sec metric — is measured FIRST,
    right after the caller's verified-healthy probe: this host's degraded
    windows arrive on minute timescales that a 15 s probe can't gate, so
    the most important number must sit closest to the probe instead of
    ~7 suite-minutes downstream (r4 measured the same steady-state
    pipeline at 0.87 s in isolation and 2.7 s at the tail of a suite
    whose mid-window had silently degraded). A mid-suite probe is
    returned so the output can label a window that collapsed between the
    pipeline and the query phase."""
    timings: dict = {}
    tx_path = ensure_bench_transcripts(n_convs)
    # The pipeline's warm-up curve is long (cold page-cache parquet scan,
    # codegen, Python-worker fork: rep0 runs 6-10x slower than steady
    # state, and reps keep improving through ~rep3) — measured 9.9s ->
    # 1.68 -> 1.49 -> 1.41 -> 1.0s on the 1.84M-row table. One untimed
    # warm-up plus best-of-N reports the steady-state rate a long-running
    # cluster sees, matching how the queries below are measured.
    run_transcript_pipeline(spark, tx_path)  # warm-up, untimed
    pipe: dict = {}
    for _ in range(pipe_reps):
        p = run_transcript_pipeline(spark, tx_path)
        if not pipe or p["turns_per_sec"] > pipe["turns_per_sec"]:
            pipe = p
    timings["transcript_pipeline"] = round(pipe["secs"], 3)
    mid_g, mid_b, _ = probe_health()

    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        # warm-up run: pay whole-stage-codegen compilation + IO cache once,
        # then time the steady-state execution (what a long-running cluster
        # actually sees)
        df.write.format("noop").mode("overwrite").save()
        best = 1e9
        for _ in range(reps):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()  # full exec, no collect
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    return timings, pipe, {"mid_gbps": mid_g, "mid_burn_s": mid_b}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "300000"))
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_QUERY_REPS", "3"))
    pipe_reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PIPE_REPS", "4")))
    max_attempts = int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .appName("jsonschema-infer-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()

    # Health-gated measurement: wait (bounded) for a healthy window, run
    # the suite best-of-N, re-probe after — if the window collapsed
    # mid-suite, run again and keep the per-query minima. Probes are
    # recorded in the output so a degraded-host number is labeled as such.
    timings: dict = {}
    pipe: dict = {}
    probes = []
    for attempt in range(max_attempts):
        pre_g, pre_b = wait_healthy()
        t, p, mid = run_suite(spark, qs, sf_dir, n_convs, reps, pipe_reps)
        post_g, post_b, post_ok = probe_health()
        probes.append(
            {"pre_gbps": pre_g, "pre_burn_s": pre_b,
             **mid,
             "post_gbps": post_g, "post_burn_s": post_b}
        )
        timings = {k: min(v, timings.get(k, 1e9)) for k, v in t.items()}
        if not pipe or p["turns_per_sec"] > pipe["turns_per_sec"]:
            pipe = p
        if post_ok:
            break
        print(
            f"  suite attempt {attempt + 1} tainted "
            f"(post mem {post_g} GB/s, burn {post_b}s)",
            file=sys.stderr,
            flush=True,
        )
    total = sum(timings.values())

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (incl. transcript inference+validation pipeline)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "turns_per_sec": round(pipe["turns_per_sec"], 1),
                "bench_rows": pipe["rows"],
                "cpus": int(cpus),
                "query_reps": reps,
                "host_probes": probes,
                "host_healthy": bool(probes and probes[-1]["post_gbps"] >= 2.0
                                     and probes[-1]["post_burn_s"] <= 2.0),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

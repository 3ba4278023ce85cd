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
    "minhash_dups_docs",
    "simhash_near_docs",
    "infer_events_schema",
]

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")


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
    # fused one-pass scan: inference + integrity partials off the same
    # native pyarrow row-group read (see operators/pipeline.py)
    res, integ = infer_and_integrity_parquet(spark, path, rg_per_task=rg_per_task)
    cons = V.compile_constraints(res.schema, state=res.state, df=df)
    agg = V.violation_counts(df, cons).collect()
    secs = time.time() - t0
    rows = res.total_rows
    return {
        "rows": rows,
        "secs": secs,
        "turns_per_sec": rows / secs,
        "row_violations": int(sum(r.violation_count for r in agg)),
        "dup_rows_excess": integ["dup_rows_excess"],
        "ordering_violations": integ["ordering_violations"],
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "300000"))

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
    timings: dict = {}
    total = 0.0
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        # warm-up run: pay whole-stage-codegen compilation + IO cache once,
        # then time the steady-state execution (what a long-running cluster
        # actually sees)
        df.write.format("noop").mode("overwrite").save()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()  # execute fully, no collect
        timings[name] = round(time.time() - t0, 3)
        total += timings[name]

    tx_path = ensure_bench_transcripts(n_convs)
    pipe = run_transcript_pipeline(spark, tx_path)
    timings["transcript_pipeline"] = round(pipe["secs"], 3)
    total += pipe["secs"]

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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

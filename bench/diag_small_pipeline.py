#!/usr/bin/env python
"""One-off diagnostic: per-rep stage timings of the fused pipeline on the
SMALL (sf0.1-sized, 1.84M-turn) bench table, steady state, one JVM.

bench.py r4 measured transcript_pipeline 2.7s (676k turns/s) vs r3's 0.97s
(1.9M turns/s) at healthy probes — this replays bench.run_transcript_pipeline
with stage-level and watcher-level instrumentation to find which rev 6-9
fixed cost dominates the small table.

    python bench/diag_small_pipeline.py --cores 32 --reps 5
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--data", default=".cache/transcripts_bench_v2_300000_42.parquet"
    )
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(max(args.cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .appName("jis-diag-small-pipeline")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators import pipeline as P

    captured = []
    real = V.IncrementalSpillWatcher

    class Capturing(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured.append(self)

    V.IncrementalSpillWatcher = Capturing

    df = spark.read.parquet(args.data)
    import pyarrow.parquet as pq

    cores = spark.sparkContext.defaultParallelism
    n_rg = pq.ParquetFile(args.data).num_row_groups
    rg_per_task = max(1, min(4, n_rg // (cores * 6)))
    print(f"n_rg={n_rg} cores={cores} rg_per_task={rg_per_task}", flush=True)

    for rep in range(args.reps):
        captured.clear()
        t0 = time.time()
        t = time.time()
        pred_spec = P.predict_constraint_spec(args.data)
        t_pred = time.time() - t
        t = time.time()
        pw = P.ValidationPrewarm(spark, args.data, spec=pred_spec)
        t_pw = time.time() - t
        t = time.time()
        res, integ_fut, vcounts = P.infer_and_integrity_parquet(
            spark,
            args.data,
            rg_per_task=rg_per_task,
            integrity="background",
            violation_spec=pred_spec,
        )
        t_fused = time.time() - t
        t = time.time()
        real_spec = V.constraint_spec(
            res.schema, state=res.state, temporal_cols=V.temporal_columns(df)
        )
        spec_hit = frozenset(real_spec) == frozenset(pred_spec)
        t_compile = time.time() - t
        t = time.time()
        integ = integ_fut.result()
        t_wait = time.time() - t
        secs = time.time() - t0
        w = captured[0] if captured else None
        out = {
            "rep": rep,
            "secs": round(secs, 3),
            "turns_per_sec": round(res.total_rows / secs, 1),
            "spec_hit": bool(spec_hit),
            "stage_secs": {
                "pred_spec": round(t_pred, 3),
                "prewarm_launch": round(t_pw, 3),
                "fused": round(t_fused, 3),
                "compile": round(t_compile, 3),
                "integrity_wait": round(t_wait, 3),
            },
            "watcher": (
                {
                    k: (round(v, 4) if isinstance(v, float) else v)
                    for k, v in w.stats.items()
                }
                if w is not None
                else None
            ),
        }
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-off diagnostic: where does the residual ``integrity_wait`` go?

Replays bench/pipeline_job.py's timed flow at one parallelism level,
captures the IncrementalSpillWatcher instance, and prints its stats
breakdown (prepaid decode vs finalize-tail decode vs resolve) next to the
stage timings. Run alone (no concurrent CPU work):

    python bench/diag_integrity_wait.py --cores 4 \
        --data .cache/transcripts_bench_v2_5000000_42.parquet
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=".cache/transcripts_bench_v2_5000000_42.parquet")
    ap.add_argument("--cores", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("jis-diag-integrity-wait")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators import pipeline as P

    # capture the watcher instance the pipeline constructs
    captured = []
    real = V.IncrementalSpillWatcher

    class Capturing(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            captured.append(self)

    P.IncrementalSpillWatcher = Capturing  # not used (pipeline imports inside fn)
    V.IncrementalSpillWatcher = Capturing

    df = spark.read.parquet(args.data)
    df.count()
    warm = spark.range(0, cores * 4, 1, cores * 4)
    warm.mapInArrow(lambda it: it, "id long").count()

    import pyarrow.parquet as pq

    n_rg = pq.ParquetFile(args.data).num_row_groups
    rg_per_task = max(1, min(4, n_rg // (cores * 6)))

    t0 = time.time()
    pred_spec = P.predict_constraint_spec(args.data)
    pw = P.ValidationPrewarm(spark, args.data, spec=pred_spec)
    res, integ_fut, vcounts = P.infer_and_integrity_parquet(
        spark,
        args.data,
        rg_per_task=rg_per_task,
        integrity="background",
        violation_spec=pred_spec,
    )
    t_fused = time.time() - t0
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
        "cores": cores,
        "rows": res.total_rows,
        "secs": round(secs, 3),
        "turns_per_sec": round(res.total_rows / secs, 1),
        "spec_hit": bool(spec_hit),
        "stage_secs": {
            "infer+integrity": round(t_fused, 2),
            "compile": round(t_compile, 2),
            "integrity_wait": round(t_wait, 2),
        },
        "watcher": (
            {k: (round(v, 3) if isinstance(v, float) else v) for k, v in w.stats.items()}
            if w is not None
            else None
        ),
        "integ": integ,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

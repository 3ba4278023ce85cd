#!/usr/bin/env python
"""Isolation experiment: where does the violations stage lose its 1->4
scaling (stage median 0.65 vs 0.848 for the fused scan)?

Hypothesis: a ~1s FIXED driver cost (py4j expression building + janino
codegen + AQE re-planning + task scheduling over ~320 8MiB splits) that
does not shrink with cores. Measure at local[1] and local[4]:
  - constraint compile wall (py4j round trips)
  - violations run 1 (cold codegen) vs runs 2-3 (warm) — the delta is
    one-time JVM cost; the warm floor is the true scan+eval cost
  - split size 8 MiB vs 64 MiB (task-count overhead)
  - AQE on vs off (re-planning overhead)

Usage: spark-submit --master local[N] bench/violations_isolation.py \
    --data .cache/transcripts_bench_v2_5000000_42.parquet --out /tmp/iso.json
"""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .appName("jis-violations-isolation")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.pipeline import infer_and_integrity_parquet

    # page-cache warm + real schema/state exactly as the pipeline job has
    # them when its violations stage starts
    res, integ = infer_and_integrity_parquet(spark, args.data, rg_per_task=4)

    out = {"cores": cores, "fused_secs": None, "variants": {}}

    t = time.time()
    df0 = spark.read.parquet(args.data)
    cons = V.compile_constraints(res.schema, state=res.state, df=df0)
    out["compile_secs"] = round(time.time() - t, 3)
    out["n_constraints"] = len(cons)

    for label, mpb, aqe in [
        ("8MiB+aqe", 8, True),
        ("64MiB+aqe", 64, True),
        ("8MiB-aqe", 8, False),
        ("64MiB-aqe", 64, False),
    ]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        df = spark.read.parquet(args.data)
        runs = []
        for _ in range(3):
            t = time.time()
            V.violation_counts(df, cons).collect()
            runs.append(round(time.time() - t, 3))
        out["variants"][label] = runs

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Interleaved A/B: violations stage under config A (pipeline's current:
AQE on, 8 MiB splits) vs B (AQE off, dynamic splits) — alternated per
round in one session so host-window flaps hit both sides. Fresh plan per
run (no shuffle reuse)."""

import argparse
import json
import statistics
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--mpb-b", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .appName("jis-violations-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.pipeline import infer_and_integrity_parquet

    res, _ = infer_and_integrity_parquet(spark, args.data, rg_per_task=4)
    cons = V.compile_constraints(
        res.schema, state=res.state, df=spark.read.parquet(args.data)
    )

    def run_once(mpb: int, aqe: bool) -> float:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        df = spark.read.parquet(args.data)
        t = time.time()
        V.violation_counts(df, cons).collect()
        return round(time.time() - t, 3)

    # warm both plan shapes once (codegen) before timing
    run_once(8, True)
    run_once(args.mpb_b, False)

    a, b = [], []
    for _ in range(args.rounds):
        a.append(run_once(8, True))
        b.append(run_once(args.mpb_b, False))
    print(
        json.dumps(
            {
                "cores": cores,
                "A_8MiB_aqe": a,
                "B_dyn_noaqe": b,
                "A_median": statistics.median(a),
                "B_median": statistics.median(b),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure the integrity-reduce strategies SERIALIZED after the fused scan
(background future awaited immediately — same work as eager, separately
timed), plus the tuned violations pass. Picks the pipeline config that is
robust to host windows (no driver/executor overlap contention)."""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .appName("jis-reduce-strategies")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.pipeline import infer_and_integrity_parquet

    df = spark.read.parquet(args.data)
    df.count()
    warm = spark.range(0, cores * 4, 1, cores * 4)
    warm.mapInArrow(lambda it: it, "id long").count()

    results = {}
    for rep in range(args.reps):
        for strat in ("auto", "split", "collect"):
            t0 = time.time()
            res, fut = infer_and_integrity_parquet(
                spark,
                args.data,
                rg_per_task=4,
                integrity="background",
                distinct_strategy=strat,
            )
            t_scan = time.time() - t0
            t = time.time()
            integ = fut.result()  # immediately awaited: serialized reduce
            t_reduce = time.time() - t
            t = time.time()
            cons = V.compile_constraints(res.schema, state=res.state, df=df)
            t_compile = time.time() - t
            t = time.time()
            with V.validation_scan(spark, args.data) as vdf:
                V.violation_counts(vdf, cons).collect()
            t_viol = time.time() - t
            row = {
                "scan": round(t_scan, 2),
                "reduce": round(t_reduce, 2),
                "compile": round(t_compile, 2),
                "viol": round(t_viol, 2),
                "total": round(time.time() - t0, 2),
                "dup": integ["dup_rows_excess"],
                "ord": integ["ordering_violations"],
            }
            results.setdefault(strat, []).append(row)
            print(strat, row, flush=True)
    print(json.dumps({"cores": cores, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""2x2 isolation: {tuned validation_scan vs legacy 8MiB+AQE} x
{integrity background vs eager} in one pipeline-shaped run each, same
session, to find why rev-3 rounds show inflated violations + integrity_wait
at local[4]."""

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
        .appName("jis-2x2")
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
        for tuned in (True, False):
            for mode in ("background", "eager"):
                t0 = time.time()
                res, integ = infer_and_integrity_parquet(
                    spark, args.data, rg_per_task=4, integrity=mode
                )
                t_fused = time.time() - t0
                t = time.time()
                cons = V.compile_constraints(res.schema, state=res.state, df=df)
                t_compile = time.time() - t
                t = time.time()
                if tuned:
                    with V.validation_scan(spark, args.data) as vdf:
                        V.violation_counts(vdf, cons).collect()
                else:
                    V.violation_counts(df, cons).collect()
                t_viol = time.time() - t
                t = time.time()
                if mode == "background":
                    integ = integ.result()
                t_wait = time.time() - t
                key = f"tuned={int(tuned)},integ={mode}"
                results.setdefault(key, []).append(
                    {
                        "fused": round(t_fused, 2),
                        "compile": round(t_compile, 2),
                        "viol": round(t_viol, 2),
                        "wait": round(t_wait, 2),
                        "total": round(time.time() - t0, 2),
                    }
                )
                print(key, results[key][-1], flush=True)
    print(json.dumps({"cores": cores, "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()

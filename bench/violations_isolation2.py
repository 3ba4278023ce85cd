#!/usr/bin/env python
"""Follow-up: confirm the AQE+8MiB violations pathology, print plans."""

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .appName("jis-violations-isolation2")
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
    df0 = spark.read.parquet(args.data)
    cons = V.compile_constraints(res.schema, state=res.state, df=df0)

    out = {"cores": cores, "variants": {}}
    for label, mpb, aqe in [
        ("8MiB+aqe", 8, True),
        ("8MiB-aqe", 8, False),
        ("64MiB+aqe", 64, True),
        ("64MiB-aqe", 64, False),
    ]:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        df = spark.read.parquet(args.data)
        q = V.violation_counts(df, cons)
        if args.explain:
            print(f"=== {label} ===")
            q.explain("formatted")
        runs = []
        for _ in range(3):
            t = time.time()
            q.collect()
            runs.append(round(time.time() - t, 3))
        out["variants"][label] = runs
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

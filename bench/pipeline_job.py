#!/usr/bin/env python
"""spark-submit job: transcript inference+validation pipeline at whatever
--master the launcher chose. Writes a one-line JSON result to --out.

Usage:
  spark-submit --master local[8] --py-files jis.zip bench/pipeline_job.py \
      --data .cache/transcripts_bench_*.parquet --out /tmp/result8.json
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shuffle-partitions", type=int, default=64)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.config(
            "spark.sql.shuffle.partitions", str(args.shuffle_partitions)
        )
        .config("spark.sql.adaptive.enabled", "true")
        # single-file parquet input: splits (and thus scan parallelism) are
        # file-size/maxPartitionBytes, bounded by row-group count — keep
        # splits small enough to feed every core at local[32]
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .appName("jis-scaling-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.infer_spark import infer_dataframe

    df = spark.read.parquet(args.data)

    # one warm-up scan so JIT/IO cache states are comparable across runs
    df.count()

    t0 = time.time()
    res = infer_dataframe(df)
    cons = V.compile_constraints(res.schema, state=res.state, df=df)
    agg = V.violation_counts(df, cons).collect()
    n_dup = V.duplicate_keys(df, ["conv_id", "turn_idx"]).count()
    n_ord = V.turn_ordering_violations(df).count()
    secs = time.time() - t0

    out = {
        "cores": cores,
        "rows": res.total_rows,
        "secs": round(secs, 3),
        "turns_per_sec": round(res.total_rows / secs, 1),
        "row_violations": int(sum(r.violation_count for r in agg)),
        "dup_keys": n_dup,
        "ordering_violations": n_ord,
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

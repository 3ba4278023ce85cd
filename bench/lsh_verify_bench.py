#!/usr/bin/env python
"""Micro-benchmark: LSH candidate verification, interpreted HOF cosine vs
the Arrow-batched numpy pair cosine (operators/similarity.pair_cosine_udf).

Builds a synthetic embedding table (n vectors, dim d, a few near-dup
clusters so the buckets produce real candidates), runs lsh_cosine_pairs
end-to-end with each verify implementation, and prints one JSON line with
wall seconds and the (identical) output sizes.

Usage: python bench/lsh_verify_bench.py [--n 100000] [--dim 64]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_table(spark, n: int, dim: int, seed: int = 42):
    import pandas as pd

    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-duplicate pairs so verification has real work
    for i in range(0, n // 20):
        j = (i * 17 + 1) % n
        base[j] = base[i] + rng.standard_normal(dim).astype(np.float32) * 0.02
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in base],
        }
    )
    return spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>"
    ).repartition(32)


def run_variant(df, use_pandas: bool, threshold: float, planes_n: int = 32, bands: int = 4):
    """lsh_cosine_pairs with the verify stage forced to one implementation."""
    from pyspark.sql import functions as F

    from jsonschema_infer_spark.operators import similarity as SIM

    if use_pandas:
        pairs = SIM.lsh_cosine_pairs(
            df, threshold=threshold, n_planes=planes_n, bands=bands
        )
    else:
        # reconstruct the pre-optimization verify: interpreted HOF cosine
        dim = len(df.select("embedding").first()[0])
        rng = np.random.default_rng(42)
        planes = rng.standard_normal((planes_n, dim))
        sig = SIM._plane_udf(planes)
        base = df.select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("v")
        ).withColumn("sig", sig(F.col("v")))
        rows_per_band = planes_n // bands
        mask = (1 << rows_per_band) - 1
        buckets = base.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("sig"), b * rows_per_band)
                            .bitwiseAND(F.lit(mask))
                            .alias("val"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select("id", "bb.band", "bb.val")
        cand = (
            buckets.alias("x")
            .join(buckets.alias("y"), ["band", "val"])
            .filter(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        vecs = base.select("id", "v")
        va = vecs.withColumnRenamed("id", "id_a").withColumnRenamed("v", "v_a")
        vb = vecs.withColumnRenamed("id", "id_b").withColumnRenamed("v", "v_b")
        sim = SIM.cosine(
            F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")
        )
        pairs = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .withColumn("cos_sim", F.round(sim, 4))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    t0 = time.time()
    n = pairs.count()
    return time.time() - t0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.9)
    # 64 planes / 4 bands = 16-bit bands: ~n^2 * bands / 2^16 random
    # collisions (~300k candidates at n=100k) while planted near-dups
    # (cos ~0.99, per-bit agreement ~0.98) still collide in some band with
    # probability ~99%. Fewer bits per band degenerates the buckets
    # (2-bit bands -> 4 buckets -> ~n^2/8 candidates) and the bench would
    # measure the candidate explosion, not the verify stage.
    ap.add_argument("--planes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .appName("lsh-verify-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    df = build_table(spark, args.n, args.dim).persist()
    df.count()  # materialize + warm workers

    # warm-up then best-of-2 per variant, interleaved
    results = {}
    # pandas first (its warm run also forks the python workers both share);
    # the interpreted-HOF variant is minutes-slow, so it gets ONE timed run —
    # the 10x+ gap it demonstrates dwarfs run-to-run noise.
    for label, use_pandas, reps in (
        ("pandas_blas", True, 2),
        ("hof_expr", False, 1),
    ):
        if reps > 1:
            run_variant(df, use_pandas, args.threshold, args.planes, args.bands)
        secs, n_pairs = min(
            (
                run_variant(df, use_pandas, args.threshold, args.planes, args.bands)
                for _ in range(reps)
            ),
            key=lambda t: t[0],
        )
        results[label] = {"secs": round(secs, 2), "pairs": n_pairs}
        print(f"# {label}: {results[label]}", flush=True)

    print(
        json.dumps(
            {
                "n_vectors": args.n,
                "dim": args.dim,
                "threshold": args.threshold,
                **results,
                "speedup": round(
                    results["hof_expr"]["secs"] / results["pandas_blas"]["secs"], 2
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

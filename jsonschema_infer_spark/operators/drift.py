"""Distribution-drift checks between two table snapshots (north_rule:
"KS/chi-square distribution-drift checks across Iceberg snapshots").

All heavy lifting is built-in Spark plumbing (SURVEY.md §4.2): category
histograms via groupBy partial aggregation, ECDFs via groupBy-on-value +
one ordered pass over the DISTINCT values (tiny compared to the data), or a
fixed-width histogram sketch for the 100 TB path. Only the final test
statistics (a handful of floats) are computed on the driver with
functions/stats.py.

Snapshots are any two DataFrames — in production two Iceberg snapshot reads
(``VERSION AS OF``) via sources/provider.py; in the sandbox two parquet
directories (same statistics code either way)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.stats import chi2_homogeneity, ks_two_sample_p


def categorical_drift(df_a: DataFrame, df_b: DataFrame, column: str) -> dict:
    """Chi-square homogeneity test on a categorical column's distribution.

    Each groupBy shuffles only (category, count) pairs — map-side combined,
    so cost is a scan regardless of table size."""
    ca = {r[0]: r[1] for r in df_a.groupBy(column).count().collect()}
    cb = {r[0]: r[1] for r in df_b.groupBy(column).count().collect()}
    ca.pop(None, None)
    cb.pop(None, None)
    out = chi2_homogeneity(ca, cb)
    out["column"] = column
    return out


def _exact_ks_d(df_a: DataFrame, df_b: DataFrame, col_expr) -> tuple:
    """Exact two-sample KS statistic D.

    Pre-aggregates per distinct value (groupBy = partial agg), then runs a
    cumulative window over the DISTINCT values only. Exactness costs a
    global sort of distinct values — right for tests/moderate cardinality;
    use mode='hist' at extreme scale."""
    a = df_a.select(col_expr.alias("v")).where(F.col("v").isNotNull())
    b = df_b.select(col_expr.alias("v")).where(F.col("v").isNotNull())
    u = a.withColumn("side", F.lit(1)).unionByName(b.withColumn("side", F.lit(0)))
    g = u.groupBy("v").agg(
        F.count(F.when(F.col("side") == 1, 1)).alias("ca"),
        F.count(F.when(F.col("side") == 0, 1)).alias("cb"),
    )
    n1 = a.count()
    n2 = b.count()
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    d_row = (
        g.select(
            F.abs(
                F.sum("ca").over(w) / F.lit(float(n1))
                - F.sum("cb").over(w) / F.lit(float(n2))
            ).alias("diff")
        )
        .agg(F.max("diff").alias("d"))
        .collect()[0]
    )
    return float(d_row.d), n1, n2


def _hist_ks_d(df_a: DataFrame, df_b: DataFrame, col_expr, bins: int) -> tuple:
    """Approximate KS D via a shared fixed-width histogram (error <= 1/bins
    in ECDF space plus binning error): two scans + tiny driver reduce —
    the 100 TB path (no global sort, no high-cardinality shuffle)."""
    a = df_a.select(col_expr.cast("double").alias("v")).where(F.col("v").isNotNull())
    b = df_b.select(col_expr.cast("double").alias("v")).where(F.col("v").isNotNull())
    bounds = (
        a.unionByName(b)
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()[0]
    )
    lo, hi = float(bounds.lo), float(bounds.hi)
    if hi <= lo:
        return 0.0, a.count(), b.count()

    def hist(df):
        return {
            r.bucket: r["count"]
            for r in df.select(
                F.width_bucket(F.col("v"), F.lit(lo), F.lit(hi), F.lit(bins)).alias(
                    "bucket"
                )
            )
            .groupBy("bucket")
            .count()
            .collect()
        }

    ha, hb = hist(a), hist(b)
    n1, n2 = sum(ha.values()), sum(hb.values())
    cum_a = cum_b = 0.0
    d = 0.0
    for k in range(1, bins + 2):  # width_bucket: hi falls in bins+1
        cum_a += ha.get(k, 0) / n1
        cum_b += hb.get(k, 0) / n2
        d = max(d, abs(cum_a - cum_b))
    return d, n1, n2


def numeric_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    column,
    mode: str = "exact",
    bins: int = 1024,
) -> dict:
    """Two-sample KS test on a numeric column (or Column expression)."""
    col_expr = F.col(column) if isinstance(column, str) else column
    if mode == "exact":
        d, n1, n2 = _exact_ks_d(df_a, df_b, col_expr)
    elif mode == "hist":
        d, n1, n2 = _hist_ks_d(df_a, df_b, col_expr, bins)
    else:
        raise ValueError("mode must be 'exact' or 'hist'")
    return {
        "column": str(column),
        "d": d,
        "n_a": n1,
        "n_b": n2,
        "p_value": ks_two_sample_p(d, n1, n2),
        "mode": mode,
    }


def ts_deltas(df: DataFrame, conv_col="conv_id", idx_col="turn_idx", ts_col="ts"):
    """Per-turn inter-arrival seconds (bounded per-conversation window)."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    # TIMESTAMP_NTZ has no direct double cast; go through TIMESTAMP
    secs = F.col(ts_col).cast("timestamp").cast("double")
    delta = secs - F.lag(secs).over(w)
    return df.select(delta.alias("delta")).where(F.col("delta").isNotNull())


def transcript_drift_report(
    snap_a: DataFrame, snap_b: DataFrame, alpha: float = 0.01, ks_mode: str = "exact"
) -> dict:
    """The transcript table's drift suite (FIXTURES.md §C): chi-square on
    role and tool, KS on text length and per-turn ts deltas."""
    checks = {
        "role_chi2": categorical_drift(snap_a, snap_b, "role"),
        "tool_chi2": categorical_drift(
            snap_a.where(F.col("tool").isNotNull()),
            snap_b.where(F.col("tool").isNotNull()),
            "tool",
        ),
        "text_len_ks": numeric_drift(
            snap_a, snap_b, F.length("text"), mode=ks_mode
        ),
        "ts_delta_ks": numeric_drift(
            ts_deltas(snap_a), ts_deltas(snap_b), "delta", mode=ks_mode
        ),
    }
    for name, c in checks.items():
        c["drifted"] = c["p_value"] < alpha
    checks["alpha"] = alpha
    return checks

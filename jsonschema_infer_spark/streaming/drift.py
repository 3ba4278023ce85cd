"""Streaming distribution-drift monitor (north_rule drift family, online).

The batch drift operators (`operators/drift.py`) compare two Iceberg
snapshots after the fact; this module watches a live stream and flags a
window the moment it finalizes. Two pieces compose:

1. `windowed_category_counts` — watermarked tumbling-window counts per
   category, append mode: a (window, category) row reaches the sink exactly
   once, when the watermark passes the window's end. All heavy lifting
   (the count aggregation over raw turns) happens here, distributed,
   map-side combined — the same plan shape as the batch `events_hourly`.
2. `category_drift_foreach_batch` — a `foreachBatch` verdict stage: each
   micro-batch carries only FINALIZED per-window category counts (a handful
   of rows per window — one per category), so the chi-square homogeneity
   test against the reference profile runs driver-side on already-reduced
   data, exactly like the batch path's driver-side p-value
   (`operators/drift.categorical_drift`). Verdicts append to a parquet sink.

At 10^12-turn scale the aggregation state is bounded by (windows within
watermark x categories), not by rows; the foreachBatch stage sees one row
per (window, category) ever, so the driver-side test is O(categories) per
window regardless of input volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.stats import chi2_homogeneity


def windowed_category_counts(
    stream_df: DataFrame,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Finalized per-window category counts in append mode (late rows
    beyond the watermark are dropped — the documented trade)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(cat_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(cat_col).alias("category"),
            "n",
        )
    )


OTHER_BUCKET = "__other__"


def _cap_category_counts(batch_df: DataFrame, key: str, k: int) -> DataFrame:
    """Bound a (window_start, key, n) batch to the top-``k`` keys per
    window (by count, key asc on ties — deterministic), folding the rest
    into one ``__other__`` row. Runs DISTRIBUTED inside foreachBatch (the
    batch is a plain DataFrame), so the driver collect that follows is
    O(windows x (k+1)) no matter how high-cardinality the category column
    is. Spark 4's WindowGroupLimit keeps the rank partial below the
    exchange, same shape as violation_examples."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n"), F.col(key).asc()
    )
    ranked = batch_df.withColumn("_rk", F.row_number().over(w))
    top = ranked.filter(F.col("_rk") <= k).drop("_rk")
    rest = (
        ranked.filter(F.col("_rk") > k)
        .groupBy("window_start")
        .agg(F.sum("n").alias("n"))
        .select("window_start", F.lit(OTHER_BUCKET).alias(key), "n")
    )
    return top.unionByName(rest)


def _fold_ref(ref: dict, window_keys: set) -> dict:
    """Fold the reference profile onto a capped window's key set: kept
    categories stay, everything else sums into ``__other__`` — both sides
    of the homogeneity/PSI test then share one partition of the category
    space (required for the statistics to mean anything)."""
    if OTHER_BUCKET not in window_keys:
        return ref
    kept = {
        k: v for k, v in ref.items() if k in window_keys and k != OTHER_BUCKET
    }
    kept[OTHER_BUCKET] = sum(
        v for k, v in ref.items() if k not in kept
    )
    return kept


def category_drift_foreach_batch(
    ref_counts: dict,
    out_path: str,
    alpha: float = 0.05,
    max_categories: int = 1000,
):
    """Build the foreachBatch callback: chi-square homogeneity of each
    finalized window's category counts vs ``ref_counts`` (e.g. the counts
    of the snapshot the schema was inferred from). Writes one verdict row
    per window to ``out_path``:

        window_start, n_window, chi2, dof, p_value, drifted

    The input batch is already one row per (window, category); windows
    with more than ``max_categories`` distinct values are capped
    DISTRIBUTED to the top-K plus one ``__other__`` fold (and the
    reference profile is folded onto the same key set), so the driver
    collect is O(windows x max_categories) even for an id-like column."""
    ref = {str(k): int(v) for k, v in ref_counts.items()}

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        rows = _cap_category_counts(
            batch_df, "category", max_categories
        ).collect()
        if not rows:
            return
        by_win: dict = {}
        for r in rows:
            by_win.setdefault(r.window_start, {})[str(r.category)] = int(r.n)
        out = []
        for win_start, counts in sorted(by_win.items()):
            res = chi2_homogeneity(_fold_ref(ref, set(counts)), counts)
            out.append(
                (
                    win_start,
                    int(sum(counts.values())),
                    float(res["statistic"]),
                    int(res["dof"]),
                    float(res["p_value"]),
                    bool(res["p_value"] < alpha),
                )
            )
        spark = batch_df.sparkSession
        (
            spark.createDataFrame(
                out,
                "window_start timestamp, n_window long, chi2 double, "
                "dof long, p_value double, drifted boolean",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(out_path)
        )

    return fb


def psi_drift_foreach_batch(
    ref_counts: dict,
    out_path: str,
    threshold: float = 0.25,
    eps: float = 1e-6,
    max_categories: int = 1000,
):
    """foreachBatch verdict stage computing the Population Stability Index
    of each finalized window's category (or bucket) counts vs the
    reference profile — the thresholded, p-value-free monitor ops teams
    page on (see operators/drift.psi_categorical for the batch twin).
    One verdict row per window: window_start, n_window, psi, drifted.

    Works on either upstream stage: `windowed_category_counts` (column
    ``category``) or `windowed_histogram_counts` (column ``bucket``).
    Category windows above ``max_categories`` are capped distributed to
    top-K + ``__other__`` with the reference folded to match (histogram
    buckets are already bounded by the fixed grid)."""
    from ..functions.stats import psi as _psi

    ref = {str(k): int(v) for k, v in ref_counts.items()}

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        key = "category" if "category" in batch_df.columns else "bucket"
        capped = (
            _cap_category_counts(batch_df, key, max_categories)
            if key == "category"
            else batch_df
        )
        rows = capped.collect()
        if not rows:
            return
        by_win: dict = {}
        for r in rows:
            by_win.setdefault(r.window_start, {})[str(r[key])] = int(r.n)
        out = []
        for win_start, counts in sorted(by_win.items()):
            v = _psi(_fold_ref(ref, set(counts)), counts, eps)
            out.append(
                (win_start, int(sum(counts.values())), float(v), bool(v > threshold))
            )
        spark = batch_df.sparkSession
        (
            spark.createDataFrame(
                out,
                "window_start timestamp, n_window long, psi double, "
                "drifted boolean",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(out_path)
        )

    return fb


def start_psi_drift_monitor(
    stream_df: DataFrame,
    ref_counts: dict,
    out_path: str,
    checkpoint: str,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    threshold: float = 0.25,
    trigger_available_now: bool = True,
):
    """PSI twin of `start_category_drift_monitor`: distributed windowed
    category counts -> driver-side PSI verdict per finalized window."""
    counts = windowed_category_counts(
        stream_df, cat_col, ts_col=ts_col, window=window, watermark=watermark
    )
    writer = (
        counts.writeStream.foreachBatch(
            psi_drift_foreach_batch(ref_counts, out_path, threshold=threshold)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_histogram_counts(
    stream_df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Finalized per-window fixed-width histogram counts (append mode).

    The bucket bounds are FIXED up front (taken from the reference
    snapshot's min/max, like the batch `_hist_ks_d` shares one grid across
    both sides) — a streaming job cannot re-derive global bounds per
    window without a second pass. Values outside [lo, hi] clamp into the
    edge buckets so the window's ECDF still sums to 1."""
    v = F.col(value_col).cast("double")
    bucket = F.greatest(
        F.lit(1),
        F.least(F.lit(bins), F.width_bucket(v, F.lit(lo), F.lit(hi), F.lit(bins))),
    )
    return (
        stream_df.where(v.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("window_start"), "bucket", "n")
    )


def ks_drift_foreach_batch(
    ref_hist: dict,
    out_path: str,
    bins: int = 64,
    alpha: float = 0.05,
):
    """foreachBatch verdict stage for numeric drift: approximate two-sample
    KS (shared fixed grid, error <= 1/bins in ECDF space) of each finalized
    window's histogram vs ``ref_hist`` ({bucket: count} on the same grid).
    One verdict row per window: window_start, n_window, ks_d, p_value,
    drifted."""
    from ..functions.stats import ks_two_sample_p

    ref = {int(k): int(v) for k, v in ref_hist.items()}
    n_ref = sum(ref.values())

    def fb(batch_df: DataFrame, epoch_id: int) -> None:
        rows = batch_df.collect()
        if not rows:
            return
        by_win: dict = {}
        for r in rows:
            by_win.setdefault(r.window_start, {})[int(r.bucket)] = int(r.n)
        out = []
        for win_start, hist in sorted(by_win.items()):
            n_win = sum(hist.values())
            cum_r = cum_w = d = 0.0
            for k in range(1, bins + 1):
                cum_r += ref.get(k, 0) / n_ref
                cum_w += hist.get(k, 0) / n_win
                d = max(d, abs(cum_r - cum_w))
            p = ks_two_sample_p(d, n_ref, n_win)
            out.append((win_start, n_win, float(d), float(p), bool(p < alpha)))
        spark = batch_df.sparkSession
        (
            spark.createDataFrame(
                out,
                "window_start timestamp, n_window long, ks_d double, "
                "p_value double, drifted boolean",
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(out_path)
        )

    return fb


def start_ks_drift_monitor(
    stream_df: DataFrame,
    ref_hist: dict,
    lo: float,
    hi: float,
    out_path: str,
    checkpoint: str,
    value_col: str,
    bins: int = 64,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    alpha: float = 0.05,
    trigger_available_now: bool = True,
):
    """Numeric twin of `start_category_drift_monitor`: distributed windowed
    histogram -> driver-side approximate-KS verdict per finalized window."""
    counts = windowed_histogram_counts(
        stream_df,
        value_col,
        lo,
        hi,
        bins=bins,
        ts_col=ts_col,
        window=window,
        watermark=watermark,
    )
    writer = (
        counts.writeStream.foreachBatch(
            ks_drift_foreach_batch(ref_hist, out_path, bins=bins, alpha=alpha)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_category_drift_monitor(
    stream_df: DataFrame,
    ref_counts: dict,
    out_path: str,
    checkpoint: str,
    cat_col: str,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    alpha: float = 0.05,
    trigger_available_now: bool = True,
):
    """Wire the two stages and start the query: distributed windowed counts
    -> driver-side chi-square verdict per finalized window -> parquet."""
    counts = windowed_category_counts(
        stream_df, cat_col, ts_col=ts_col, window=window, watermark=watermark
    )
    writer = (
        counts.writeStream.foreachBatch(
            category_drift_foreach_batch(ref_counts, out_path, alpha=alpha)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

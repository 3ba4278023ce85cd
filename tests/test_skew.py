"""Salted two-phase operators must agree exactly with the plain forms."""

from pyspark.sql import functions as F

from jsonschema_infer_spark.operators import skew, validate as V


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_count_matches_plain(spark, tx_paths):
    df = spark.read.parquet(tx_paths["viol"])
    plain = _rows(
        df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("count")),
        ["conv_id", "count"],
    )
    salted = _rows(skew.salted_count(df, ["conv_id"], buckets=8), ["conv_id", "count"])
    assert salted == plain


def test_salted_ts_regressions_match_plain(spark, tx_paths):
    df = spark.read.parquet(tx_paths["viol"])
    cols = ["conv_id", "turn_idx"]
    plain = _rows(V.ts_regressions(df), cols)
    # block smaller than conversation lengths so both passes do real work
    salted = _rows(skew.ts_regressions_salted(df, block=4), cols)
    assert salted == plain
    assert len(plain) > 0  # fixture injects regressions


def test_salted_ts_regressions_hot_conv(spark):
    """A hot conversation larger than the block size splits across groups;
    boundary stitching must still catch a regression placed exactly on a
    block edge."""
    rows = [("h", i, float(i)) for i in range(64)]
    rows[32] = ("h", 32, 10.0)  # regression at a block boundary (block=32)
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts double")
    got = _rows(skew.ts_regressions_salted(df, ts_col="ts", block=32), ["turn_idx"])
    plain = _rows(V.ts_regressions(df, ts_col="ts"), ["turn_idx"])
    assert got == plain
    assert (32,) in got  # caught by the boundary-stitch pass

"""Bucketed-table helpers: co-located joins and aggregations.

At 10^12 turns the dominant shuffles are joins/groupBys keyed on
``conv_id`` (or ``o_custkey``-style foreign keys). Writing both sides
bucketed by the join key — Iceberg ``bucket(N, conv_id)`` partition
transform in production, Spark ``bucketBy`` tables in the sandbox — lets
the planner prove co-partitioning and drop the Exchange on both sides:
the join becomes a per-bucket zip, no network. tests/test_bucketing.py
asserts the Exchange-free plan.

Rules of thumb encoded here:
- bucket count is a cluster-shape decision (2-4x executor count), fixed
  at write time; both sides MUST agree on it for co-located joins;
- sortBy within buckets additionally enables SortMergeJoin without the
  per-task sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list,
    buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs Catalyst
    plans this without an Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on, how)

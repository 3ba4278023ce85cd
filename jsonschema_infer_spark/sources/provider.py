"""Table providers: one interface, two physical sources.

The north_rule targets Iceberg tables with snapshot reads (drift checks
compare two snapshots). No Iceberg runtime jars exist in this sandbox
(verified under $SPARK_HOME/jars — SURVEY.md §7.0), so:

- IcebergProvider: the production path — ``spark.read.format("iceberg")``
  with ``snapshot-id`` / ``as-of-timestamp`` options and
  ``table.history`` metadata. Usable when the session is launched with
  ``--packages org.apache.iceberg:iceberg-spark-runtime-...``; constructing
  it without Iceberg support raises immediately with the spark-submit
  incantation in the message.
- ParquetSnapshotProvider: the sandbox/test path — a directory per
  snapshot (``<root>/<snapshot_id>/*.parquet``) emulating snapshot ids.

Drift checks (operators/drift.py) take two DataFrames, so the statistics
code is identical under either provider.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class TableProvider:
    def read(self, snapshot_id: str | None = None) -> DataFrame:
        raise NotImplementedError

    def snapshots(self) -> list:
        raise NotImplementedError

    def latest(self) -> str | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None


class IcebergProvider(TableProvider):
    """Production source: an Iceberg table name in a configured catalog."""

    def __init__(self, spark: SparkSession, table: str):
        self.spark = spark
        self.table = table
        try:
            spark._jvm.org.apache.iceberg.Table  # noqa: B018 probe for runtime jars
        except Exception as e:  # pragma: no cover - sandbox has no Iceberg jars
            raise RuntimeError(
                "Iceberg runtime not on the classpath; launch with e.g. "
                "spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-3.5_2.12:1.5.0 "
                "--conf spark.sql.catalog.my_cat=org.apache.iceberg.spark.SparkCatalog"
            ) from e

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        reader = self.spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(self.table)

    def snapshots(self) -> list:
        rows = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.history ORDER BY made_current_at"
        ).collect()
        return [str(r.snapshot_id) for r in rows]


class ParquetSnapshotProvider(TableProvider):
    """Sandbox source: <root>/<snapshot_id>/ parquet directories (snapshot
    ids sort lexicographically = time order), or a bare parquet path for a
    single-snapshot table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def _is_single(self) -> bool:
        return self.root.endswith(".parquet") or any(
            f.endswith(".parquet") for f in os.listdir(self.root)
        )

    def read(self, snapshot_id: str | None = None) -> DataFrame:
        if snapshot_id is None:
            if self._is_single():
                return self.spark.read.parquet(self.root)
            snapshot_id = self.latest()
            if snapshot_id is None:
                raise ValueError(f"no snapshots under {self.root}")
        return self.spark.read.parquet(os.path.join(self.root, snapshot_id))

    def snapshots(self) -> list:
        if self._is_single():
            return []
        return sorted(
            d
            for d in os.listdir(self.root)
            if os.path.isdir(os.path.join(self.root, d))
        )

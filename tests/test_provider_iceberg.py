"""IcebergProvider contract test: no Iceberg jars exist in this sandbox
(SURVEY.md §7.0), so the production code path — reader option building,
snapshot-id plumbing, the history query, and the constructor's classpath
probe — is exercised against a recording fake of the SparkSession surface
it touches. The statistics/drift code is provider-agnostic by design
(operators/drift.py takes DataFrames), so this pins the only
Iceberg-specific logic in the repo."""

import pytest

from jsonschema_infer_spark.sources.provider import (
    IcebergProvider,
    ParquetSnapshotProvider,
)


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def format(self, fmt):
        self.log.append(("format", fmt))
        return self

    def option(self, k, v):
        self.log.append(("option", k, v))
        return self

    def load(self, table):
        self.log.append(("load", table))
        return "df-sentinel"


class _FakeSpark:
    """Records every call IcebergProvider makes on the session surface."""

    def __init__(self, history_rows=()):
        self.log = []
        self._history_rows = list(history_rows)

    @property
    def read(self):
        return _FakeReader(self.log)

    def sql(self, q):
        self.log.append(("sql", q))
        rows = self._history_rows

        class _R:
            def collect(self):
                return rows

        return _R()


class _Row:
    def __init__(self, snapshot_id):
        self.snapshot_id = snapshot_id


def _provider(spark_fake, table="cat.db.tx"):
    # bypass the constructor's JVM classpath probe (no jars here) while
    # keeping every other production line live
    p = IcebergProvider.__new__(IcebergProvider)
    p.spark = spark_fake
    p.table = table
    return p


def test_constructor_raises_without_iceberg_jars():
    class _NoJvm:
        class _jvm:  # attribute access raises like a missing class would
            def __getattr__(self, name):
                raise AttributeError(name)

        _jvm = _jvm()

    with pytest.raises(RuntimeError, match="--packages org.apache.iceberg"):
        IcebergProvider(_NoJvm(), "cat.db.tx")


def test_read_latest_builds_plain_iceberg_reader():
    fake = _FakeSpark()
    out = _provider(fake).read()
    assert out == "df-sentinel"
    assert fake.log == [("format", "iceberg"), ("load", "cat.db.tx")]


def test_read_snapshot_sets_snapshot_id_option():
    fake = _FakeSpark()
    out = _provider(fake).read(snapshot_id="12345")
    assert out == "df-sentinel"
    assert fake.log == [
        ("format", "iceberg"),
        ("option", "snapshot-id", "12345"),
        ("load", "cat.db.tx"),
    ]


def test_snapshots_queries_history_in_time_order():
    fake = _FakeSpark(history_rows=[_Row(1), _Row(7), _Row(9)])
    p = _provider(fake)
    assert p.snapshots() == ["1", "7", "9"]
    assert p.latest() == "9"  # latest() re-queries history
    assert [k for k, *_ in fake.log] == ["sql", "sql"]
    q = fake.log[0][1]
    assert "cat.db.tx.history" in q and "ORDER BY made_current_at" in q


def test_parquet_provider_same_interface(spark, tmp_path):
    """Both providers serve the same TableProvider surface — the drift
    suite can take either; snapshot ids sort lexicographically."""
    root = tmp_path / "snaps"
    for snap, n in [("s1", 3), ("s2", 5)]:
        spark.range(n).write.parquet(str(root / snap))
    p = ParquetSnapshotProvider(spark, str(root))
    assert p.snapshots() == ["s1", "s2"]
    assert p.latest() == "s2"
    assert p.read("s1").count() == 3
    assert p.read().count() == 5  # latest by default

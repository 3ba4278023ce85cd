"""Mirror of the driver's correctness gate: every queries() entry runs on
Spark and, when an oracle_sql() twin exists, must match DuckDB on row count,
column names and order-insensitive values (floats rounded to 6).

Runs at sf0.001 for speed; the driver runs the same contract at sf0.01
(verified manually in the dev loop as well)."""

import glob
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
# signature/mapping oracle parquets must be built from the SAME sf the
# queries run on (the driver uses the default, sf0.01)
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF

import __spark_entry__ as E  # noqa: E402


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        t = os.path.basename(p).removesuffix(".parquet")
        c.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    return c


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    return v


def _norm(cols, rows):
    cols = list(cols)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        [cols[i] for i in order],
        sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows),
    )


ORACLED = sorted(E.oracle_sql().keys())
ROWS_ONLY = sorted(set(E.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, con, name):
    sdf = E.queries()[name](spark, SF)
    scols, srows = _norm(sdf.columns, [tuple(r) for r in sdf.collect()])
    cur = con.execute(E.oracle_sql()[name])
    ocols, orows = _norm([d[0] for d in cur.description], cur.fetchall())
    assert scols == ocols, f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    assert srows == orows, f"{name}: value mismatch"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    sdf = E.queries()[name](spark, SF)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"constraint", "violation_count"}
    # testdata events are clean -> no violations anywhere
    assert all(r.violation_count == 0 for r in rows)

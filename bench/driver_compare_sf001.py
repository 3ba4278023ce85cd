#!/usr/bin/env python
"""Replica of the driver's CORRECTNESS gate at its own scale (sf0.01).

tests/test_entry_oracle.py runs the identical contract at sf0.001 for
speed; scale-dependent divergence (top-k ties, sampling caps, histogram
edges) would only surface at the driver's sf0.01 — this script is the
pre-flight. Compares the FIRST 50 queries() entries (the driver's window)
against their oracle_sql() twins on row count, column names, and
order-insensitive values (floats rounded to 6, same normalization).

    PYTHONPATH=/root/repo python bench/driver_compare_sf001.py
"""

import glob
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.01"
os.environ["SPARK_GRAFT_ORACLE_SF"] = SF

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402


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


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.enabled", "false")
        .appName("jis-driver-compare-sf001")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for p in glob.glob(f"{SF}/*.parquet"):
        t = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    window = list(qs)[:50]
    report = {}
    n_bad = 0
    for name in window:
        try:
            df = qs[name](spark, SF)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            if name not in oracles:
                report[name] = {
                    "rows_only": True, "spark_rows": len(rows), "err": None
                }
                continue
            ocols, orows = None, None
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sc, sr = _norm(cols, rows)
            oc, onr = _norm(ocols, orows)
            entry = {
                "rows_match": len(rows) == len(orows),
                "schema_match": sc == oc,
                "hash_match": sr == onr,
                "spark_rows": len(rows),
                "oracle_rows": len(orows),
                "err": None,
            }
            if not (entry["rows_match"] and entry["schema_match"] and entry["hash_match"]):
                n_bad += 1
                # first divergent tuple for debugging
                diff = [
                    (a, b) for a, b in zip(sr, onr) if a != b
                ][:2] if len(sr) == len(onr) else []
                entry["first_diff"] = repr(diff)[:400]
            report[name] = entry
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            report[name] = {"err": f"{type(e).__name__}: {e}"[:400]}
        status = report[name].get("err") or (
            "ROWS-ONLY" if report[name].get("rows_only")
            else ("ok" if report[name].get("hash_match") else "MISMATCH")
        )
        print(f"  {name}: {status}", flush=True)

    print(json.dumps({"n": len(window), "bad": n_bad}))
    with open(os.path.join(REPO, ".cache", "driver_compare_sf001.json"), "w") as f:
        json.dump(report, f, indent=1)
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

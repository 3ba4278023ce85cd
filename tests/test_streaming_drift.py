"""Streaming drift monitor: finalized windows get a chi-square verdict vs
the reference profile; a window matching the reference passes, a skewed
window is flagged."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from jsonschema_infer_spark.streaming.drift import (
    start_category_drift_monitor,
    start_ks_drift_monitor,
)

SCHEMA = "role string, ts timestamp"
HOUR = 3600
REF = {"user": 30, "assistant": 30}


def _write(dirpath, name, rows):
    tab = pa.table(
        {
            "role": pa.array([r[0] for r in rows], pa.string()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tab, os.path.join(dirpath, name))


def _cycle(spark, data_dir, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(data_dir)
    q = start_category_drift_monitor(
        stream,
        REF,
        out_path=out,
        checkpoint=ckpt,
        cat_col="role",
        window="1 hour",
        watermark="1 hour",
    )
    q.awaitTermination(120)


def test_streaming_category_drift(spark, tmp_path):
    data = tmp_path / "drift_in"
    data.mkdir()
    ckpt = str(tmp_path / "drift_ckpt")
    out = str(tmp_path / "drift_out")

    # hour 0 mirrors the reference (balanced); hour 1 is all-user (drifted)
    h0 = [("user", 10 * i + 1) for i in range(6)] + [
        ("assistant", 10 * i + 2) for i in range(6)
    ]
    h1 = [("user", HOUR + 10 * i + 1) for i in range(9)]
    _write(str(data), "b0.parquet", h0 + h1)
    _cycle(spark, str(data), ckpt, out)

    # advance the watermark past hours 0 and 1 (two cycles: the watermark
    # a batch RUNS with is the one the previous batch ended on)
    _write(str(data), "b1.parquet", [("user", 3 * HOUR + 5)])
    _cycle(spark, str(data), ckpt, out)
    _write(str(data), "b2.parquet", [("user", 4 * HOUR + 5)])
    _cycle(spark, str(data), ckpt, out)

    got = {r.window_start.hour: r for r in spark.read.parquet(out).collect()}
    assert 0 in got and 1 in got
    assert got[0].n_window == 12 and not got[0].drifted
    assert got[0].chi2 == 0.0 and got[0].p_value == 1.0  # exact proportions
    assert got[1].n_window == 9 and got[1].drifted
    assert got[1].p_value < 0.05


NUM_SCHEMA = "v double, ts timestamp"


def _write_num(dirpath, name, rows):
    tab = pa.table(
        {
            "v": pa.array([r[0] for r in rows], pa.float64()),
            "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        }
    )
    pq.write_table(tab, os.path.join(dirpath, name))


def _cycle_num(spark, data_dir, ckpt, out):
    stream = spark.readStream.schema(NUM_SCHEMA).parquet(data_dir)
    q = start_ks_drift_monitor(
        stream,
        ref_hist={b: 10 for b in range(1, 11)},  # uniform on [0, 10)
        lo=0.0,
        hi=10.0,
        out_path=out,
        checkpoint=ckpt,
        value_col="v",
        bins=10,
        window="1 hour",
        watermark="1 hour",
    )
    q.awaitTermination(120)


def test_streaming_ks_drift(spark, tmp_path):
    data = tmp_path / "ks_in"
    data.mkdir()
    ckpt = str(tmp_path / "ks_ckpt")
    out = str(tmp_path / "ks_out")

    # hour 0 uniform like the reference; hour 1 all mass in the top bucket
    h0 = [(b + 0.5, 10 * b + 7) for b in range(10)] * 2
    h1 = [(9.5, HOUR + 10 * i + 1) for i in range(20)]
    _write_num(str(data), "b0.parquet", h0 + h1)
    _cycle_num(spark, str(data), ckpt, out)
    _write_num(str(data), "b1.parquet", [(5.0, 3 * HOUR + 5)])
    _cycle_num(spark, str(data), ckpt, out)
    _write_num(str(data), "b2.parquet", [(5.0, 4 * HOUR + 5)])
    _cycle_num(spark, str(data), ckpt, out)

    got = {r.window_start.hour: r for r in spark.read.parquet(out).collect()}
    assert 0 in got and 1 in got
    assert got[0].n_window == 20 and got[0].ks_d == 0.0 and not got[0].drifted
    assert got[1].n_window == 20 and abs(got[1].ks_d - 0.9) < 1e-9
    assert got[1].drifted and got[1].p_value < 0.05


def test_streaming_psi_drift(spark, tmp_path):
    from jsonschema_infer_spark.streaming.drift import start_psi_drift_monitor

    data = tmp_path / "psi_in"
    data.mkdir()
    ckpt = str(tmp_path / "psi_ckpt")
    out = str(tmp_path / "psi_out")

    def cycle():
        stream = spark.readStream.schema(SCHEMA).parquet(str(data))
        q = start_psi_drift_monitor(
            stream,
            REF,
            out_path=out,
            checkpoint=ckpt,
            cat_col="role",
            window="1 hour",
            watermark="1 hour",
        )
        q.awaitTermination(120)

    # hour 0 mirrors the reference proportions; hour 1 is all-user
    h0 = [("user", 10 * i + 1) for i in range(6)] + [
        ("assistant", 10 * i + 2) for i in range(6)
    ]
    h1 = [("user", HOUR + 10 * i + 1) for i in range(9)]
    _write(str(data), "b0.parquet", h0 + h1)
    cycle()
    _write(str(data), "b1.parquet", [("user", 3 * HOUR + 5)])
    cycle()
    _write(str(data), "b2.parquet", [("user", 4 * HOUR + 5)])
    cycle()

    got = {r.window_start.hour: r for r in spark.read.parquet(out).collect()}
    assert 0 in got and 1 in got
    assert got[0].psi == 0.0 and not got[0].drifted  # exact proportions
    assert got[1].drifted and got[1].psi > 0.25  # one-sided window

    # the verdict agrees with the pure function it delegates to
    from jsonschema_infer_spark.functions.stats import psi as psi_fn

    assert got[1].psi == psi_fn(REF, {"user": 9})


def test_category_cap_bounds_driver_rows_at_10k_categories(spark, tmp_path):
    """A 10k-distinct category column must not bloat the driver: the
    foreachBatch stage caps each window to top-K + __other__ DISTRIBUTED,
    the reference is folded onto the same key set, and totals are
    preserved."""
    import datetime as dt

    from jsonschema_infer_spark.functions.stats import chi2_homogeneity
    from jsonschema_infer_spark.streaming.drift import (
        OTHER_BUCKET,
        _cap_category_counts,
        _fold_ref,
        category_drift_foreach_batch,
    )

    win = dt.datetime(2026, 1, 1)
    rows = [(win, f"c{i:05d}", 1) for i in range(10_000)] + [(win, "hot", 500)]
    batch = spark.createDataFrame(
        rows, "window_start timestamp, category string, n long"
    )

    capped = _cap_category_counts(batch, "category", 10).collect()
    assert len(capped) == 11  # top-10 + __other__ — the driver bound
    by_cat = {r.category: r.n for r in capped}
    assert by_cat["hot"] == 500  # the heavy hitter survives
    assert OTHER_BUCKET in by_cat
    assert sum(by_cat.values()) == 10_500  # totals preserved exactly
    # deterministic tie-break: n=1 ties keep the smallest keys
    assert "c00000" in by_cat and "c00008" in by_cat

    ref = {f"c{i:05d}": 5 for i in range(10_000)}
    ref["hot"] = 100
    out = str(tmp_path / "cap_out")
    fb = category_drift_foreach_batch(ref, out, max_categories=10)
    fb(batch, 0)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert got[0].n_window == 10_500
    # the verdict equals the pure chi2 on the folded dicts
    want = chi2_homogeneity(_fold_ref(ref, set(by_cat)), by_cat)
    assert got[0].chi2 == float(want["statistic"])
    assert got[0].p_value == float(want["p_value"])
    # ref folded: 10 kept keys + everything else in __other__
    folded = _fold_ref(ref, set(by_cat))
    assert set(folded) == set(by_cat)
    assert sum(folded.values()) == sum(ref.values())

"""Fused one-pass pipeline == the standalone operators, value-identical.

The fused scan (pipeline.infer_and_integrity_parquet) must return exactly
the InferResult of infer_parquet AND the integrity dict of
transcript_integrity_native on the same files — the folds are shared code,
so any divergence is a wiring bug in the tee."""

import pytest

from jsonschema_infer_spark.config import default_config
from jsonschema_infer_spark.operators import validate as V
from jsonschema_infer_spark.operators.infer_spark import infer_parquet
from jsonschema_infer_spark.operators.pipeline import infer_and_integrity_parquet


def test_fused_matches_standalone_on_violated(spark, tx_paths):
    want_infer = infer_parquet(spark, tx_paths["viol"], rg_per_task=1)
    want_integ = V.transcript_integrity_native(
        spark, tx_paths["viol"], rg_per_task=1
    )
    res, integ = infer_and_integrity_parquet(
        spark, tx_paths["viol"], rg_per_task=1
    )
    assert res.schema_json == want_infer.schema_json
    assert res.total_rows == want_infer.total_rows
    assert integ == want_integ
    # and against the mapInArrow summary form, the third implementation
    viol = spark.read.parquet(tx_paths["viol"])
    assert integ == V.transcript_integrity_summary(viol)


def test_fused_matches_standalone_on_clean(spark, tx_paths):
    want_infer = infer_parquet(spark, tx_paths["clean"], rg_per_task=2)
    res, integ = infer_and_integrity_parquet(
        spark, tx_paths["clean"], rg_per_task=2
    )
    assert res.schema_json == want_infer.schema_json
    assert res.total_rows == want_infer.total_rows
    assert integ == {"dup_rows_excess": 0, "ordering_violations": 0}


def test_fused_background_integrity_matches_eager(spark, tx_paths):
    """integrity='background' returns (res, Future); the resolved dict and
    the InferResult are value-identical to the eager form, the spill dir
    is cleaned up after resolution, and a bad mode is refused."""
    want_res, want_integ = infer_and_integrity_parquet(
        spark, tx_paths["viol"], rg_per_task=1
    )
    res, fut = infer_and_integrity_parquet(
        spark, tx_paths["viol"], rg_per_task=1, integrity="background"
    )
    assert res.schema_json == want_res.schema_json
    assert res.total_rows == want_res.total_rows
    assert fut.result(timeout=120) == want_integ
    with pytest.raises(ValueError):
        infer_and_integrity_parquet(
            spark, tx_paths["viol"], integrity="later"
        )


def test_fused_distributed_reduce_matches(spark, tx_paths):
    # force the distributed split reduce (zero local-merge budget): same dict
    want = V.transcript_integrity_native(spark, tx_paths["viol"], rg_per_task=1)
    _, integ = infer_and_integrity_parquet(
        spark, tx_paths["viol"], rg_per_task=1, local_merge_max_bytes=0
    )
    assert integ == want


def test_fused_examples_capture_matches(spark, tx_paths):
    cfg = default_config(examples=True)
    want = infer_parquet(
        spark,
        tx_paths["viol"],
        config=cfg,
        rg_per_task=1,
        order_cols=["conv_id", "turn_idx"],
    )
    res, _ = infer_and_integrity_parquet(
        spark,
        tx_paths["viol"],
        config=cfg,
        rg_per_task=1,
        order_cols=["conv_id", "turn_idx"],
    )
    assert res.schema_json == want.schema_json


def test_fused_rejects_max_samples(spark, tx_paths):
    with pytest.raises(ValueError):
        infer_and_integrity_parquet(
            spark, tx_paths["viol"], config=default_config(max_samples=10)
        )


def test_fused_checkpoint_resume_and_lineage(spark, tx_paths, tmp_path):
    from jsonschema_infer_spark.checkpoint import fused_with_checkpoint
    from jsonschema_infer_spark.operators.pipeline import (
        infer_and_integrity_parquet,
    )

    import pyarrow.parquet as pq

    # re-materialize with small row groups so there are MANY fused tasks
    src = pq.read_table(tx_paths["viol"])
    path = str(tmp_path / "viol_multi_rg.parquet")
    pq.write_table(src, path, row_group_size=max(src.num_rows // 6, 1))
    ckpt = str(tmp_path / "fused_ckpt")

    # first run: tasks 0 and 1 "never finish"
    res1, integ1, man1 = fused_with_checkpoint(
        spark, path, ckpt, rg_per_task=1, _skip_tasks=[0, 1]
    )
    assert not man1["complete"]
    assert 0 not in man1["completed_tasks"] and 1 not in man1["completed_tasks"]
    # a partial manifest is still a valid partial result
    assert res1 is not None and res1.total_rows < spark.read.parquet(path).count()

    # resume: only the missing tasks fold; manifest completes
    res2, integ2, man2 = fused_with_checkpoint(spark, path, ckpt, rg_per_task=1)
    assert man2["complete"]
    assert res2.total_rows == spark.read.parquet(path).count()
    # lineage carries (file, row-group range, rows, secs) per task
    assert all(
        rec["file"] and rec["rows"] > 0 and len(rec["row_groups"]) == 2
        for rec in man2["per_task"]
    )

    # equals the unchecked pipeline on both outputs
    res_d, integ_d = infer_and_integrity_parquet(spark, path, rg_per_task=1)
    assert res2.schema_json == res_d.schema_json
    assert integ2 == integ_d

    # config/input mismatch is refused
    import pytest

    with pytest.raises(ValueError):
        fused_with_checkpoint(spark, path, ckpt, rg_per_task=2)


def test_fused_checkpoint_ignores_orphan_tmp_files(spark, tx_paths, tmp_path):
    from jsonschema_infer_spark.checkpoint import fused_with_checkpoint

    path = tx_paths["viol"]
    ckpt = str(tmp_path / "tmpfile_ckpt")
    res1, integ1, man1 = fused_with_checkpoint(spark, path, ckpt, rg_per_task=1)
    # simulate a writer killed between tmp write and os.replace
    import os

    states = os.path.join(ckpt, "states")
    with open(os.path.join(states, "state_000000.json.tmp.999"), "w") as f:
        f.write('{"truncat')  # torn write
    res2, integ2, man2 = fused_with_checkpoint(spark, path, ckpt, rg_per_task=1)
    assert res2.total_rows == res1.total_rows  # no double-count, no crash
    assert integ2 == integ1


def test_validation_prewarm_hit_and_miss(spark, tx_paths):
    """ValidationPrewarm predicts the constraint spec from row-group 0:
    on the fixture (one row group) the prediction is exact -> the
    pre-built, codegen-warmed constraints are returned verbatim; with a
    mismatched schema the fallback builds fresh. Both paths produce the
    same counts as compile_constraints."""
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.pipeline import (
        ValidationPrewarm,
        infer_and_integrity_parquet,
    )

    path = tx_paths["viol"]
    df = spark.read.parquet(path)

    pw = ValidationPrewarm(spark, path)
    res, _ = infer_and_integrity_parquet(spark, path)
    cons = pw.constraints_for(res.schema, res.state, df)
    assert pw.error is None
    assert pw.hit is True
    assert cons is pw.constraints  # the pre-built list, not a rebuild
    want = {
        (r.constraint, r.violation_count)
        for r in V.violation_counts(
            df, V.compile_constraints(res.schema, state=res.state, df=df)
        ).collect()
    }
    got = {
        (r.constraint, r.violation_count)
        for r in V.violation_counts(df, cons).collect()
    }
    assert got == want

    # miss: a schema whose spec can't match the sampled one
    pw2 = ValidationPrewarm(spark, path)
    other = {
        "type": "object",
        "properties": {"conv_id": {"type": "string"}},
        "required": ["conv_id"],
    }
    cons2 = pw2.constraints_for(other, {"props": {}}, df)
    assert pw2.hit is False
    assert [c.name for c in cons2] == ["required:conv_id"]


def test_constraint_spec_build_equals_compile(spark, tx_paths):
    """constraint_spec + build_constraints is compile_constraints."""
    from jsonschema_infer_spark.operators import validate as V
    from jsonschema_infer_spark.operators.infer_spark import infer_dataframe

    viol = spark.read.parquet(tx_paths["viol"])
    res = infer_dataframe(viol, num_partitions=4)
    spec = V.constraint_spec(
        res.schema, state=res.state, temporal_cols=V.temporal_columns(viol)
    )
    built = V.build_constraints(spec)
    direct = V.compile_constraints(res.schema, state=res.state, df=viol)
    assert [(c.name, c.kind, c.column) for c in built] == [
        (c.name, c.kind, c.column) for c in direct
    ]
    a = {(r.constraint, r.violation_count)
         for r in V.violation_counts(viol, built).collect()}
    b = {(r.constraint, r.violation_count)
         for r in V.violation_counts(viol, direct).collect()}
    assert a == b

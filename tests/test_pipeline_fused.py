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

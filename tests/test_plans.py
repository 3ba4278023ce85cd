"""Physical-plan assertions: the optimizations we rely on must actually be
in the executed plan, not just intended (predicate pushdown, column
pruning, broadcast joins, TakeOrdered top-k, whole-stage codegen)."""

import sys

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return E.queries()[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q3_pushdown_broadcast_topk(spark):
    p = _plan(spark, "q3_revenue_topk")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    # the BUILDING filter reaches the customer scan
    assert "PushedFilters" in p and "BUILDING" in p


def test_column_pruning_docs(spark):
    # token stats reads only doc_id + text, not the whole documents schema
    p = _plan(spark, "docs_token_stats")
    assert "ReadSchema" in p
    read = p[p.index("ReadSchema") :].splitlines()[0]
    assert "text" in read and "doc_id" in read
    assert "lang" not in read and "source" not in read


def test_whole_stage_codegen_agg(spark):
    df = E.queries()["q1_pricing_summary"](spark, SF)
    df.collect()  # AQE finalizes the plan (and codegen spans) on execution
    p = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen spans in the plan string
    assert "*(1)" in p
    assert "HashAggregate" in p
    # map-side combine before the exchange
    assert "partial_sum" in p


def test_broadcast_dims_region_revenue(spark):
    p = _plan(spark, "region_revenue")
    # nation and region are broadcast; no shuffle for those joins
    assert p.count("BroadcastHashJoin") >= 2


def test_anti_join_strategy(spark):
    p = _plan(spark, "unreferenced_parts")
    assert "LeftAnti" in p

"""Physical-plan audits: pin the plan shapes that matter at 100 TB
(pushdown, pruning, no cartesian blowups).  These are the properties
SCALE.md claims; this file makes them regression-checked."""

from __future__ import annotations

import pytest

from res2df_spark import suite

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return suite.QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    ["j4_region_revenue", "q3_top_orders", "a3_pair_aggregation", "j9_asof_join",
     "j8_chain_anti", "j5_neighbor_shift"],
)
def test_no_cartesian_or_nested_loop_on_fact_side(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    # BroadcastNestedLoopJoin is acceptable only against a broadcast
    # fixture side (r3/r5 style), never in these equi-join queries
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "j3_multikey_join")
    assert "PushedFilters" in plan
    assert "p_size" in plan  # the dim filter reaches the parquet scan


def test_column_pruning(spark):
    # a1 touches 7 of lineitem's 11 columns; the scan must not read more
    plan = _plan(spark, "a1_pricing_summary")
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l and "lineitem" in l]
    assert scan_lines, "no lineitem scan found"
    assert "l_orderkey" not in scan_lines[0]  # unused key column pruned
    assert "l_partkey" not in scan_lines[0]


def test_partial_aggregation_present(spark):
    # groupBy must partial-aggregate map-side (two HashAggregate levels)
    plan = _plan(spark, "a1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_explode_stays_shuffle_free(spark):
    plan = _plan(spark, "r1_unroll_range")
    # project+generate over the scan; the only exchange allowed is none
    assert "Exchange" not in plan

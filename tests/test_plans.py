"""Physical-plan regression tests (PLANS.md claims, pinned).

A refactor that silently breaks predicate pushdown, broadcast of the
dim side, or the top-k strategy would still pass value-equality tests
— these assertions catch the PLAN regressions that only show up as
100× cost at scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import kg.contract as contract

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_project_pushdown_and_pruning(spark):
    plan = _plan(contract.Q["filter_project"][0](spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThan(l_quantity,40.0)" in plan
    # column pruning: the 11-column table reads only the 5 referenced
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_comment" not in read and "l_shipdate" in read


def test_join_inner_broadcasts_dim_side(spark):
    plan = _plan(contract.Q["join_inner"][0](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_uses_take_ordered(spark):
    plan = _plan(contract.Q["topk"][0](spark, SF))
    assert "TakeOrderedAndProject" in plan
    # no global sort materialization
    assert "Exchange rangepartitioning" not in plan


def test_agg_basic_partial_then_final(spark):
    plan = _plan(contract.Q["agg_basic"][0](spark, SF))
    # two-phase hash aggregate: partial functions before the exchange
    assert "partial_sum" in plan and "HashAggregate" in plan


def test_range_join_keeps_equi_prefix(spark):
    """The ±window self-join must stay a hash/sort-merge join on the
    user_id equi key — BroadcastNestedLoopJoin means the equi prefix
    was lost and the join is all-pairs."""
    plan = _plan(contract.Q["join_range_window"][0](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

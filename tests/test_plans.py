"""Plan-shape assertions (SURVEY §5.2 #3): the physical plans must be
the ones we'd want at 100 TB — predicate pushdown into the parquet scan,
column pruning, broadcast joins for dims, TakeOrderedAndProject for
top-k. Correctness tests can't see these; .explain can.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from etl_spark_eks_spark import registry

registry.load_all()


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(registry.QUERIES["q_b4_filter_conj"](spark, sf_dir))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "EqualTo(l_returnflag,A)" in plan


def test_column_pruning_flagship(spark, sf_dir):
    plan = plan_of(registry.QUERIES["q_b17_pricing_summary"](spark, sf_dir))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema  # unused columns pruned
    assert "l_quantity" in read_schema


def test_broadcast_join_for_dims(spark, sf_dir):
    plan = plan_of(registry.QUERIES["q_b12_join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact side


def test_topk_no_global_sort(spark, sf_dir):
    plan = plan_of(registry.QUERIES["q_b33_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    semi = plan_of(registry.QUERIES["q_b10_join_semi"](spark, sf_dir))
    anti = plan_of(registry.QUERIES["q_b11_join_anti"](spark, sf_dir))
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    """HashAggregate must appear twice (partial + final) around the
    exchange — map-side combine is what keeps 100 TB aggs cheap."""
    plan = plan_of(registry.QUERIES["q_b17_pricing_summary"](spark, sf_dir), "simple")
    assert plan.count("HashAggregate") >= 2

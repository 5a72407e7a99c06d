"""Physical-plan assertions: the plans that must survive a 100× scale-up
(pushed filters, broadcast dims, top-k without global sort, no cartesian
products anywhere in the registry)."""

from __future__ import annotations

import pytest

from incremental_dagster_delta_spark.queries import QUERIES
from incremental_dagster_delta_spark.queries.relational import (
    q_pricing_summary,
    q_region_revenue,
    q_top_orders,
)
from incremental_dagster_delta_spark.queries.reference_ops import q_partition_prune, q_suffix_filter


def _plan(df) -> str:
    return str(df._jdf.queryExecution())


def test_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(q_pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:200]


def test_suffix_filter_pushed(spark, sf_dir):
    plan = _plan(q_suffix_filter(spark, sf_dir))
    assert "StringEndsWith" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(q_region_revenue(spark, sf_dir))
    # supplier/nation/region joins must be broadcast; the fact-fact joins
    # may shuffle (AQE decides at runtime)
    assert plan.count("BroadcastHashJoin") + plan.count("BroadcastExchange") >= 3


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = _plan(q_top_orders(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_partition_pruning(spark, sf_dir):
    plan = _plan(q_partition_prune(spark, sf_dir))
    after = plan.split("PartitionFilters")[1][:200] if "PartitionFilters" in plan else ""
    assert "event_day" in after, f"no partition filter on event_day: {after}"


_PURE_QUERIES = [
    n for n, s in QUERIES.items() if not s.fn.__module__.endswith("incremental_ops")
]  # incremental_ops qids return materialized (localCheckpoint) state — no plan to inspect


@pytest.mark.parametrize("name", _PURE_QUERIES)
def test_no_cartesian_product(spark, sf_dir, name):
    """No registered query may compile to a CartesianProduct — the
    instantly-disqualifying plan at 100 TB. (BroadcastNestedLoopJoin
    with a broadcast-small side is acceptable — that's the top-k query
    set and centroid assignment, bounded by |Q| and K.)"""
    df = QUERIES[name].fn(spark, sf_dir)
    assert "CartesianProduct" not in _plan(df), f"{name} compiles to a cartesian product"

"""Relational query surface: result sanity + PHYSICAL PLAN assertions.

The plan checks are the 100 TB contract: broadcast joins stay broadcast,
top-k stays TakeOrderedAndProject (no global sort), filters reach the
parquet scan. A regression here is a scale bug even when results match.
"""

from __future__ import annotations

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
    pricing_summary,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
    lineitem_rollup,
    orders_by_segment,
    ordered_but_eventless_customers,
    top_customers_per_nation,
    top_orders,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_orders_by_segment_broadcasts_dimension(spark, sf_dir):
    df = orders_by_segment(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_of(df)
    rows = {r.c_mktsegment: r for r in df.collect()}
    assert len(rows) == 5
    assert all(r.n_orders > 0 and r.revenue > 0 for r in rows.values())


def test_top_customers_per_nation_rank_bounds(spark, sf_dir):
    df = top_customers_per_nation(spark, sf_dir)
    assert "BroadcastHashJoin" in plan_of(df)  # nation side
    rows = df.collect()
    per_nation: dict[str, list[int]] = {}
    for r in rows:
        per_nation.setdefault(r.nation, []).append(r.rnk)
    for ranks in per_nation.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_top_orders_avoids_global_sort(spark, sf_dir):
    df = top_orders(spark, sf_dir)
    assert "TakeOrderedAndProject" in plan_of(df)
    prices = [r.o_totalprice for r in df.collect()]
    assert prices == sorted(prices, reverse=True)
    assert len(prices) == 10


def test_pricing_summary_pushes_filter_to_scan(spark, sf_dir):
    plan = plan_of(pricing_summary(spark, sf_dir))
    assert "PushedFilters" in plan
    # column pruning: p_name etc never read; scan schema stays narrow
    assert "l_comment" not in plan


def test_rollup_contains_all_grouping_levels(spark, sf_dir):
    rows = lineitem_rollup(spark, sf_dir).collect()
    levels = {(r.l_returnflag is None, r.l_linestatus is None) for r in rows}
    assert (True, True) in levels  # grand total
    assert (False, True) in levels  # per-flag subtotal
    assert (False, False) in levels  # leaf groups
    grand = [r.n for r in rows if r.l_returnflag is None and r.l_linestatus is None]
    leaf_sum = sum(r.n for r in rows if r.l_returnflag is not None and r.l_linestatus is not None)
    assert grand == [leaf_sum]


def test_setops_nonempty_and_disjoint(spark, sf_dir):
    got = {r.custkey for r in ordered_but_eventless_customers(spark, sf_dir).collect()}
    assert got  # non-trivial result
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load

    ev_users = {r.user_id for r in load(spark, sf_dir, "events").select("user_id").distinct().collect()}
    assert not (got & ev_users)

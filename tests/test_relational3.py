"""Round-7 relational additions: TPC-H Q13-shaped double aggregation
(outer-join count histogram) and Q22-shaped scalar-subquery + anti
join. Same contract as test_relational.py: result sanity + the
physical-plan properties that matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
    customer_order_distribution,
    idle_wealthy_customers,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_order_distribution_counts_every_customer_once(spark, sf_dir):
    rows = customer_order_distribution(spark, sf_dir).collect()
    n_customers = load(spark, sf_dir, "customer").count()
    # histogram partitions the customer set: buckets sum to |customer|
    assert sum(r.n_customers for r in rows) == n_customers
    assert all(r.n_orders >= 0 for r in rows)


def test_order_distribution_outer_join_keeps_zero_order_rows(spark, sf_dir):
    # remove one customer's orders; that customer must move to the
    # n_orders=0 bucket instead of vanishing (the inner-join bug)
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    victim = cust.select(F.min("c_custkey")).first()[0]
    per_cust = (
        cust.join(
            orders.filter(F.col("o_custkey") != victim),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("n_orders"))
    )
    zero = per_cust.filter(F.col("n_orders") == 0).collect()
    assert [r.c_custkey for r in zero] == [victim]


def test_idle_wealthy_predicate_and_plan(spark, sf_dir):
    df = idle_wealthy_customers(spark, sf_dir)
    plan = plan_of(df)
    # the 1-row scalar aggregate must ride a broadcast, and the
    # no-recent-order predicate must be a proper anti join
    assert "LeftAnti" in plan
    rows = df.collect()
    assert len(rows) > 0
    # every emitted nation bucket holds customers strictly above the
    # positive-balance mean: per-bucket average > global positive mean
    cust = load(spark, sf_dir, "customer")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum("c_acctbal").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()
    global_avg = pos.s / pos.n
    for r in rows:
        assert r.total_acctbal / r.n_customers > global_avg


def test_point_in_time_join_partitions_every_order_once(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
        orders_point_in_time_segment,
    )

    rows = orders_point_in_time_segment(spark, sf_dir).collect()
    n_orders = load(spark, sf_dir, "orders").count()
    # validity intervals tile [1995-01-01, inf) per key with no overlap,
    # so the temporal join is a partition of the fact table
    assert sum(r.n_orders for r in rows) == n_orders
    assert any(r.segment == "URGENT-TRACK" for r in rows)


def test_approx_quantiles_within_sketch_bound(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
        events_value_quantiles_approx,
    )

    rows = events_value_quantiles_approx(spark, sf_dir).collect()
    assert len(rows) == 6
    assert all(r.within_bound for r in rows)


def test_winsorized_sums_clip_and_conserve(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
        events_value_winsorized,
    )

    rows = events_value_winsorized(spark, sf_dir).collect()
    assert rows
    ev = load(spark, sf_dir, "events")
    assert sum(r.n for r in rows) == ev.count()
    for r in rows:
        # clipping pulls tails toward the center: the clipped sum can
        # move either way but clipped rows must exist (5% each tail)
        assert r.n_clipped > 0
        assert r.n_clipped <= int(r.n * 0.11) + 2
        assert r.sum_winsorized != r.sum_raw


def test_disjunctive_join_pushes_filters_and_stays_equi(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
        brand_discount_revenue,
    )

    df = brand_discount_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the derived single-side disjunction must reach the part scan:
    # every branch constrains p_brand, so a brand filter appears below
    # the join, not only in the join condition
    assert plan.count("Brand#1") >= 2  # scan-side filter + residual
    rows = df.collect()
    assert {r.p_brand for r in rows} == {"Brand#1", "Brand#2", "Brand#3"}


def test_sole_blame_excludes_shared_blame_orders(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational import (
        suppliers_sole_blame,
    )

    rows = suppliers_sole_blame(spark, sf_dir).collect()
    assert rows and all(r.n_blamed >= 1 for r in rows)
    plan = suppliers_sole_blame(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    # dual quantifier decorrelates to one semi + one anti join
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan

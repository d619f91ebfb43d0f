"""Semantic + physical-plan pins for the TPC-H shape pack
(plans/relational_tpch.py: Q7/Q8/Q9/Q10/Q14/Q15/Q16 adapted)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.relational_tpch import (
    market_share_by_year,
    nation_trade_volume,
    promo_revenue_share,
    returned_items_report,
    supplier_part_variety,
    top_supplier_revenue,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import load


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_trade_volume_has_both_directions_and_no_same_nation(spark, sf_dir):
    rows = nation_trade_volume(spark, sf_dir).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert all(s != c for s, c in pairs)
    assert pairs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    # ship-year restriction honored
    assert all(r.l_year in (1996, 1997) for r in rows)


def test_trade_volume_plan_broadcasts_dims(spark, sf_dir):
    plan = plan_of(nation_trade_volume(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    # the shipdate window reaches the lineitem scan
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert any("l_shipdate" in ln for ln in scan_lines)


def test_market_share_between_zero_and_one(spark, sf_dir):
    rows = market_share_by_year(spark, sf_dir).collect()
    assert rows, "ASIA/PROMO slice must be non-empty at test SF"
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_promo_share_matches_manual_ratio(spark, sf_dir):
    got = promo_revenue_share(spark, sf_dir).collect()[0].promo_revenue_pct
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    tot = j.agg(F.sum(rev).cast("double")).collect()[0][0]
    promo = (
        j.filter(F.col("p_type") == "PROMO").agg(F.sum(rev).cast("double")).collect()[0][0]
    )
    assert abs(got - 100.0 * promo / tot) < 1e-9


def test_top_supplier_returns_all_exact_ties(spark, sf_dir):
    df = top_supplier_revenue(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    # every returned supplier carries the identical (tied) max revenue
    assert len({r.total_revenue for r in rows}) == 1


def test_returned_items_is_take_ordered(spark, sf_dir):
    df = returned_items_report(spark, sf_dir)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_variety_excludes_complaint_suppliers(spark, sf_dir):
    plan = plan_of(supplier_part_variety(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # recompute one group's distinct count including complaints: the
    # anti join must never INCREASE a count
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    unfiltered = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("cnt"))
    )
    got = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in supplier_part_variety(spark, sf_dir).collect()
    }
    for r in unfiltered.collect():
        k = (r.p_brand, r.p_type, r.p_size)
        if k in got:
            assert got[k] <= r.cnt

"""Downstream analytics queries — the query surface the shipped log index
serves in the reference deployment (filter/aggregate/time-series), run
over the driver's star-schema tables (SURVEY.md §2.3 categories).

Every aggregate follows the registry determinism rules (DECIMAL-exact
sums, final DOUBLE casts) so DuckDB value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


_Q1_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) *
           (1 - CAST(l_discount AS DECIMAL(10,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2)) *
           (1 - CAST(l_discount AS DECIMAL(10,2))) *
           (1 + CAST(l_tax AS DECIMAL(10,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(10,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary", _Q1_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan-heavy groupBy/agg.

    Scale: partial (map-side) aggregation reduces each input partition
    to ≤6 grouped rows before the shuffle; filter and the 7-column
    projection push into the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    qty = _dec("l_quantity", 10)
    price = _dec("l_extendedprice", 10)
    disc_price = price * (F.lit(1) - _dec("l_discount", 10))
    charge = disc_price * (F.lit(1) + _dec("l_tax", 10))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_DAILY_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY day, event_type
"""


@query("events_daily", _DAILY_ORACLE)
def events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event rollup — the canonical log-analytics query the
    reference's ES index serves (counts by type over time)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").alias("day"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec("value")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )

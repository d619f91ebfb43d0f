"""Remaining classic TPC-H query shapes (Q7/Q8/Q9/Q10/Q14/Q15/Q16),
adapted to the test schema (no partsupp table; p_retailprice stands in
for supply cost, s_acctbal < 0 stands in for the Q16 complaints set).

Together with the shapes already in relational.py (Q1/Q3/Q5/Q12/Q13/
Q17/Q18/Q19/Q20/Q21/Q22) this closes out the TPC-H query-shape
catalogue the reference's shipped ES index would serve downstream
(reference scope: shipper.js ships the raw events; all analytics run
on the destination store — SURVEY.md §2.3).

Scale notes shared by every query here:
- nation/region are always broadcast; supplier (10k/SF rows) is
  broadcast as a dimension; the single unavoidable big shuffle is
  lineitem⋈orders on the order key;
- all money math follows the registry DECIMAL-exact rules (exact,
  order-independent partial aggregation), cast to DOUBLE only at the
  output boundary;
- ratios divide two already-identical doubles (exact decimal sums),
  so IEEE division yields bit-identical results in both engines;
- top-k queries carry a total order (tie-break on the key) so LIMIT
  is deterministic, and compile to TakeOrderedAndProject — no global
  sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, query


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


_REV = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2)))"


def _rev():
    return _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))


# ---------------------------------------------------------------- Q7

_TRADE_ORACLE = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate) AS l_year,
       count(*) AS n_items,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') OR
       (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, l_year
"""


@query("nation_trade_volume", _TRADE_ORACLE)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional trade volume between two nations by
    ship year, with the disjunctive (supp,cust) nation-pair predicate.

    Scale: both nation joins broadcast; supplier broadcasts as a
    dimension; the supplier-side nation filter prunes lineitem BEFORE
    the lineitem⋈orders shuffle (only ~2/25 of the fact survives), and
    the customer-side filter prunes the other input of that join. The
    disjunction is applied post-join on the two tiny nation name
    columns, never as a cross product.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    pair = nation.filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    supp = load(spark, sf_dir, "supplier").join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("sn_key"),
                                F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(pair.select(F.col("n_nationkey").alias("cn_key"),
                                F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_rev()).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------- Q8

_MKTSHARE_ORACLE = f"""
WITH all_rev AS (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {_REV} AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN part      ON l_partkey = p_partkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
       CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM all_rev
GROUP BY o_year
"""


@query("market_share_by_year", _MKTSHARE_ORACLE)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share (conditional-sum ratio)
    inside a region's PROMO-part order volume, by order year.

    Scale: part/supplier/customer-nation-region chains all broadcast;
    one lineitem⋈orders shuffle carries the plan. Both sums are exact
    decimals; the share divides two bit-identical doubles, so the ratio
    is engine-exact without any float-summation-order hazard.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cust_dim = load(spark, sf_dir, "customer").join(
        F.broadcast(
            nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .select(F.col("n_nationkey").alias("cn_key"))
        ),
        F.col("c_nationkey") == F.col("cn_key"),
    )
    supp_dim = load(spark, sf_dir, "supplier").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------- Q9

_PROFIT_ORACLE = f"""
SELECT sn.n_name AS nation,
       EXTRACT(year FROM o_orderdate) AS o_year,
       CAST(SUM({_REV}
                - CAST(p_retailprice AS DECIMAL(12,2))
                  * CAST(l_quantity AS DECIMAL(12,2))
                  * CAST(0.10 AS DECIMAL(4,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY sn.n_name, o_year
"""


@query("product_type_profit", _PROFIT_ORACLE)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price-derived
    holding cost — the schema has no partsupp/supplycost) per supplier
    nation per order year, over parts whose name matches a pattern.

    Scale: the p_name LIKE filter prunes lineitem via the broadcast
    part join before the one big lineitem⋈orders shuffle; profit is a
    single DECIMAL expression so partial aggregation stays exact.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp_dim = load(spark, sf_dir, "supplier").join(
        F.broadcast(load(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    )
    orders = load(spark, sf_dir, "orders")
    profit = _rev() - (
        _dec("p_retailprice") * _dec("l_quantity") * F.lit(0.10).cast("decimal(4,2)")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp_dim), li.l_suppkey == F.col("s_suppkey"))
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------- Q10

_RETURNED_ORACLE = f"""
SELECT c_custkey, c_name, n_name AS nation,
       CAST(SUM({_REV}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("returned_items_report", _RETURNED_ORACLE)
def returned_items_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in a six-month order window.

    Scale: both fact-side filters (returnflag, orderdate) push to the
    scans before the lineitem⋈orders shuffle; the groupBy output is at
    most |customer| rows, and the top-20 compiles to
    TakeOrderedAndProject (revenue DESC, custkey tie-break) — no global
    sort. nation broadcasts; customer joins AFTER the aggregation so
    only the final ≤|customer| rows touch the dimension.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust), per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", F.col("n_name").alias("nation"), "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------- Q14

_PROMO_ORACLE = f"""
SELECT CAST(100 AS DOUBLE) *
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV}
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
       CAST(SUM({_REV}) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


@query("promo_revenue_share", _PROMO_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: percentage of one month's revenue from PROMO
    parts — a global conditional-sum ratio.

    Scale: the shipdate filter pushes to the lineitem scan; part
    broadcasts; output is ONE row from two exact decimal sums (both
    partial-aggregated map-side), divided once in double.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    part = load(spark, sf_dir, "part")
    vol = _rev()
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100).cast("double")
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero))
                .cast("double")
                / F.sum(vol).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------- Q15

_TOPSUPP_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV}) AS tr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE tr = (SELECT max(tr) FROM rev)
"""


@query("top_supplier_revenue", _TOPSUPP_ORACLE)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum — the scalar-subquery-on-an-aggregate-view pattern,
    returning ALL ties.

    Scale: one groupBy(l_suppkey) shuffle builds the revenue view
    (≤|supplier| rows); the max is a 1-row broadcast joined back on
    exact DECIMAL equality (no float boundary), so ties are exact.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("tr"))
    mx = rev.agg(F.max("tr").alias("mx"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.tr == F.col("mx"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", F.col("tr").cast("double").alias("total_revenue"))
    )


# --------------------------------------------------------------- Q16

_VARIETY_ORACLE = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


@query("supplier_part_variety", _VARIETY_ORACLE)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    excluding a complaints set (s_acctbal < 0 stands in for the
    '%Customer%Complaints%' comment scan — the schema has no s_comment).

    Scale: the NOT IN compiles to a broadcast anti join (the complaints
    set is a filtered dimension); part broadcasts with brand/size
    pruning applied first; count(DISTINCT) runs as the standard two-
    phase Expand + partial-agg plan, keyed on the (brand,type,size)
    group — never a global distinct.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    complaints = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(complaints),
            li.l_suppkey == complaints.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------- Q6

_FORECAST_ORACLE = """
SELECT count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN CAST(0.05 AS DOUBLE) AND CAST(0.07 AS DOUBLE)
  AND l_quantity < 24
"""


@query("forecast_revenue_change", _FORECAST_ORACLE)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-aggregate — revenue change
    from eliminating a discount band in one ship year.

    Scale: the whole query is one codegen'd scan stage: all three
    predicates push to the parquet scan (row-group min/max prune
    shipdate), the projection reads 4 columns, and the single-row
    aggregate combines map-side. The benchmark's measure of raw scan
    throughput."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(_dec("l_extendedprice") * _dec("l_discount"))
            .cast("double")
            .alias("revenue_delta"),
        )
    )

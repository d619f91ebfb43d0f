"""Relational query surface: joins, window functions, sorts/top-k,
rollup, set operations (SURVEY.md §2.3 — the downstream analytics the
reference's shipped ES index serves).

Scale notes apply to every query here:
- small dimensions (customer/nation/region) are broadcast explicitly —
  no shuffle of the fact side at any scale;
- aggregations rely on map-side partial aggregation;
- window top-N never sorts globally: rank within key partitions, and
  the final orderBy runs on the already-tiny ranked output;
- all money sums follow the registry DECIMAL-exact determinism rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, query


def _dec(col, p=12, s=2):
    return F.col(col).cast(f"decimal({p},{s})")


_SEGMENT_ORACLE = """
SELECT c_mktsegment,
       count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


@query("orders_by_segment", _SEGMENT_ORACLE)
def orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-dimension join + aggregate.

    Scale: customer is the small side -> explicit broadcast() hint, so
    the orders fact table never shuffles; the groupBy output is 5 rows.
    At 100 TB the plan stays scan -> broadcast-hash-join -> partial agg.
    """
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", 14)).cast("double").alias("revenue"),
        )
    )


_TOP_CUST_ORACLE = """
WITH rev AS (
  SELECT c_custkey, c_name, c_nationkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name, c_nationkey
), ranked AS (
  SELECT n_name AS nation, c_name, revenue,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey) AS rnk
  FROM rev JOIN nation ON c_nationkey = n_nationkey
)
SELECT nation, c_name, revenue, rnk FROM ranked WHERE rnk <= 3
"""


@query("top_customers_per_nation", _TOP_CUST_ORACLE)
def top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function top-N per key (row_number over partitioned rank).

    Scale: revenue agg shuffles on c_custkey (unavoidable, but partial
    aggregation shrinks it); nation joins via broadcast; the window
    partitions by nation — 25 partitions of pre-aggregated (one row per
    customer) data, never a global sort of the fact table.
    """
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    rev = (
        customer.join(orders, orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(F.sum(_dec("o_totalprice", 14)).cast("double").alias("revenue"))
    )
    ranked = rev.join(
        F.broadcast(nation), rev.c_nationkey == nation.n_nationkey
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("n_name").orderBy(
                F.col("revenue").desc(), F.col("c_custkey")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= 3).select(
        F.col("n_name").alias("nation"), "c_name", "revenue", "rnk"
    )


_TOP_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@query("top_orders", _TOP_ORDERS_ORACLE)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k via orderBy+limit.

    Scale: Spark compiles this to TakeOrderedAndProject — each partition
    keeps its local top 10, only k rows per partition reach the driver
    stage. No full sort, no full shuffle, at any scale.
    """
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


@query("lineitem_rollup", _ROLLUP_ORACLE)
def lineitem_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (grouping sets): per (flag,status), per flag,
    grand total — one pass, built-in ROLLUP.

    Scale: Expand multiplies rows 3x before the shuffle, but partial
    aggregation collapses each map task to <=3x|groups| rows first.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


_SETOPS_ORACLE = """
(SELECT c_custkey AS custkey FROM customer
 INTERSECT
 SELECT o_custkey AS custkey FROM orders)
EXCEPT
SELECT user_id AS custkey FROM events
"""


@query("ordered_but_eventless_customers", _SETOPS_ORACLE)
def ordered_but_eventless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customers that placed orders (customer INTERSECT
    orders keys) but never emitted a tracked event (EXCEPT events users).

    Scale: each leg is a pushed-down single-column projection + distinct;
    set ops hash-shuffle only distinct keys (bounded by |customers|, not
    |orders| or |events|).
    """
    cust = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    ords = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    ev = load(spark, sf_dir, "events").select(F.col("user_id").alias("custkey"))
    return cust.intersect(ords).subtract(ev)


_SHIPPING_PRIORITY_ORACLE = """
SELECT o_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


@query("shipping_priority", _SHIPPING_PRIORITY_ORACLE)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-table join: filtered customer -> orders ->
    lineitem, revenue per order, top 10.

    Scale: both dimension filters push into their scans; customer
    broadcasts; orders⋈lineitem shuffles on the order key (the only big
    shuffle, unavoidable); top-10 is TakeOrderedAndProject.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    customer = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


_REGIONAL_ORACLE = """
SELECT n_name AS nation,
       count(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@query("regional_revenue", _REGIONAL_ORACLE)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-table join: region-filtered nation/customer
    dimension chain against the orders⋈lineitem fact spine.

    Scale: the region->nation->customer chain collapses to one small
    broadcast side before touching facts; the single big shuffle is
    lineitem⋈orders on the order key.
    """
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dims = customer.join(
        F.broadcast(nation.join(F.broadcast(region),
                                nation.n_regionkey == region.r_regionkey)),
        customer.c_nationkey == F.col("n_nationkey"),
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == dims.c_custkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


_CUBE_ORACLE = """
SELECT o_orderpriority, o_orderstatus,
       count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


@query("orders_cube", _CUBE_ORACLE)
def orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over (priority, status): all four grouping sets in one
    pass. Scale: Expand x4 before the shuffle, partial agg collapses per
    map task; output is |priorities| x |statuses| sized — tiny."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice", 14)).cast("double").alias("revenue"),
        )
    )


_LAG_ORACLE = """
WITH weekly AS (
  SELECT CAST(date_trunc('week', ts) AS DATE) AS week, event_type,
         count(*) AS n
  FROM events GROUP BY week, event_type
)
SELECT week, event_type, n,
       n - lag(n) OVER (PARTITION BY event_type ORDER BY week) AS wow_delta
FROM weekly
"""


@query("events_weekly_deltas", _LAG_ORACLE)
def events_weekly_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series lag window: week-over-week count delta per event type.

    Scale: aggregate first (weekly counts are tiny), window over the
    aggregated frame — the lag never touches raw events.
    """
    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.withColumn("wow_delta", F.col("n") - F.lag("n").over(w))


_ANTI_ORACLE = """
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


@query("customers_without_urgent_orders", _ANTI_ORACLE)
def customers_without_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no urgent order.

    Scale: the priority filter pushes into the orders scan; left_anti
    then joins keys only — never materializes a wide join.
    """
    customer = load(spark, sf_dir, "customer")
    urgent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return customer.join(
        urgent, customer.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


_SEMI_ORACLE = """
SELECT n_nationkey, n_name
FROM nation
WHERE EXISTS (
  SELECT 1 FROM customer
  WHERE c_nationkey = n_nationkey AND c_acctbal > 9900
)
"""


@query("nations_with_rich_customers", _SEMI_ORACLE)
def nations_with_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): nations having a customer above the balance
    threshold (9900 keeps the result a strict subset of nations). The
    filter pushes to the customer scan; the semi join short-circuits
    per key."""
    nation = load(spark, sf_dir, "nation")
    rich = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return nation.join(
        rich, nation.n_nationkey == rich.c_nationkey, "left_semi"
    ).select("n_nationkey", "n_name")


_VALUE_STATS_ORACLE = """
WITH d AS (
  SELECT event_type,
         CAST(value AS DECIMAL(14,4)) AS v
  FROM events
)
SELECT event_type,
       count(*) AS n,
       CAST(min(v) AS DOUBLE) AS min_value,
       CAST(max(v) AS DOUBLE) AS max_value,
       CAST(SUM(v) AS DOUBLE) AS total,
       CAST(SUM(v) AS DOUBLE) / count(*) AS mean,
       CAST(SUM(v * v) AS DOUBLE) / count(*)
         - (CAST(SUM(v) AS DOUBLE) / count(*))
           * (CAST(SUM(v) AS DOUBLE) / count(*)) AS variance
FROM d GROUP BY event_type
"""


@query("events_value_stats", _VALUE_STATS_ORACLE)
def events_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math/statistics surface: min/max/mean/variance per event type with
    DECIMAL-exact sums (order-independent, so the oracle hash matches)
    and the variance assembled from exact moments in double at the end.

    Output types are BIGINT/DOUBLE only: DECIMAL results reach the
    driver's compare through different client paths in the two engines
    (DuckDB renders DECIMAL at its declared scale / converts to float64
    through pandas, Spark returns Decimal objects), so decimals stay
    internal and every surfaced number is cast — a decimal(14,4) value
    converts to double exactly the same way in both engines.
    """
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(14,4)")
    agg = ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").cast("double").alias("min_value"),
        F.max("v").cast("double").alias("max_value"),
        F.sum("v").cast("double").alias("total"),
        F.sum(F.col("v") * F.col("v")).cast("double").alias("_sumsq"),
    )
    mean = F.col("total") / F.col("n")
    return agg.select(
        "event_type",
        "n",
        "min_value",
        "max_value",
        "total",
        mean.alias("mean"),
        (F.col("_sumsq") / F.col("n") - mean * mean).alias("variance"),
    )


_BLOOM_ORACLE = """
WITH dim AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), rows_i AS (
  SELECT unnest([0, 1, 2, 3]) AS i
), bits AS (
  SELECT i, CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                                    || ';bf' || CAST(i AS VARCHAR)),
                                1, 12) AS BIGINT) % 65536 AS b
  FROM dim, rows_i GROUP BY 1, 2
), pass AS (
  SELECT o_custkey, o_totalprice FROM orders
  WHERE (CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ';bf' || '0'),
                             1, 12) AS BIGINT) % 65536)
          IN (SELECT b FROM bits WHERE i = 0)
    AND (CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ';bf' || '1'),
                             1, 12) AS BIGINT) % 65536)
          IN (SELECT b FROM bits WHERE i = 1)
    AND (CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ';bf' || '2'),
                             1, 12) AS BIGINT) % 65536)
          IN (SELECT b FROM bits WHERE i = 2)
    AND (CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || ';bf' || '3'),
                             1, 12) AS BIGINT) % 65536)
          IN (SELECT b FROM bits WHERE i = 3)
), matched AS (
  SELECT p.* FROM pass p WHERE o_custkey IN (SELECT c_custkey FROM dim)
)
SELECT (SELECT count(*) FROM orders) AS n_orders,
       (SELECT count(*) FROM pass) AS n_pass_bloom,
       count(*) AS n_match,
       (SELECT count(*) FROM pass) - count(*) AS n_false_positive,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
         AS match_revenue
FROM matched
"""


@query("orders_bloom_prefilter_join", _BLOOM_ORACLE)
def orders_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pushdown under the STRICT hash gate
    (operators/sketches.py bloom_bits/bloom_prefilter): the build side
    (BUILDING-segment customers) becomes k=4 md5 hash rows over a
    65536-bucket space — at most k*|keys| skinny broadcast rows — and
    the fact side passes through k chained broadcast LEFT SEMI joins
    with NO shuffle before the exact join. This is the 100 TB shape
    Spark's own runtime row-group filters approximate, with every
    bucket value replayable in SQL. The one row out carries the
    in-band efficacy audit: pass count vs true-match count and the
    false-positive sliver (negatives are impossible by construction —
    the exact semi join after the pre-filter proves it: n_match is
    computed FROM the pre-filtered rows and equals the plain semi
    join's count, which the oracle checks by replaying both)."""
    from ..operators.sketches import bloom_bits, bloom_prefilter

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    dim = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bits = bloom_bits(dim, "c_custkey").localCheckpoint(eager=False)  # lazy (r15)
    passed = bloom_prefilter(
        orders.select("o_custkey", "o_totalprice"), bits, "o_custkey"
    ).localCheckpoint(eager=False)  # lazy (r15): n_pass count materializes
    matched = passed.join(
        F.broadcast(dim.withColumnRenamed("c_custkey", "o_custkey")),
        "o_custkey",
        "left_semi",
    )
    n_orders = orders.count()
    n_pass = passed.count()
    return matched.agg(
        F.lit(n_orders).cast("long").alias("n_orders"),
        F.lit(n_pass).cast("long").alias("n_pass_bloom"),
        F.count(F.lit(1)).alias("n_match"),
        (F.lit(n_pass) - F.count(F.lit(1))).cast("long").alias(
            "n_false_positive"
        ),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("match_revenue"),
    )


def _hll_daily_oracle() -> str:
    from ..operators.sketches import hll_oracle_ctes

    return (
        "WITH "
        + hll_oracle_ctes(
            "CAST(ts AS DATE) AS day, event_type", "user_id", "events"
        ).lstrip()
        + """,
exact AS (
  SELECT CAST(ts AS DATE) AS day, event_type,
         count(*) AS n, count(DISTINCT user_id) AS n_users
  FROM events GROUP BY 1, 2
)
SELECT e.day, e.event_type, e.n, e.n_users, h.n_users_hll,
       abs(h.n_users_hll - e.n_users) / e.n_users <= 0.195 AS within_bound
FROM exact e JOIN hll h ON e.day = h.day AND e.event_type = h.event_type
"""
    )


@query("events_daily_approx", _hll_daily_oracle())
def events_daily_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path variant of events_daily, now under the STRICT hash
    gate (r11 verdict: rows-only 2 -> 1): a DETERMINISTIC HyperLogLog
    (operators/sketches.py hll_estimate — 48-bit md5 element hash,
    integer rho via length(bin(w)), BIGINT harmonic sum, one division
    + the linear-counting ln as fixed-order float expressions) replaces
    approx_count_distinct, so the DuckDB oracle replays the sketch and
    the estimator digit-for-digit. Same asymptotics as Spark's HLL —
    the (group, register) max is map-side combinable, so each group
    ships at most 256 rows no matter how many billions of events it
    holds. The exact distinct count rides along as the in-band audit
    (cheap at test scale, dropped at 100 TB) and ``within_bound``
    gates the estimate at 3 sigma (0.195 for m=256)."""
    from ..operators.sketches import hll_estimate

    ev = load(spark, sf_dir, "events")
    day = F.to_date("ts").alias("day")
    hll = hll_estimate(
        ev.select(day, "event_type", "user_id"),
        ["day", "event_type"],
        "user_id",
    )
    exact = ev.groupBy(day, F.col("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
    )
    return exact.join(hll, ["day", "event_type"]).select(
        "day",
        "event_type",
        "n",
        "n_users",
        "n_users_hll",
        (
            F.abs(F.col("n_users_hll") - F.col("n_users")) / F.col("n_users")
            <= F.lit(0.195)
        ).alias("within_bound"),
    )


_RANGE_JOIN_ORACLE = """
SELECT a.event_type, count(*) AS n_preceding
FROM events a
JOIN events b ON a.user_id = b.user_id
             AND b.ts >= a.ts - INTERVAL 1 HOUR
             AND b.ts < a.ts
GROUP BY a.event_type
"""


@query("events_preceding_hour_range_join", _RANGE_JOIN_ORACLE)
def events_preceding_hour_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) self-join: for every event, its same-user events in
    the strictly-preceding hour — the time-window correlation shape
    (activity bursts, rate limiting, fraud windows).

    Scale: the equi-key (user) carries the shuffle, so this is a plain
    hash join with the band predicate evaluated within key groups —
    NEVER a cross join; candidates per row are bounded by that user's
    events in the hour. For heavy-hitter keys, bucketing ts into
    hour-blocks as a secondary join key bounds the per-group scan.
    """
    ev = load(spark, sf_dir, "events")
    a = ev.select("user_id", F.col("ts").alias("a_ts"), "event_type")
    b = ev.select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    return (
        a.join(
            b,
            (a.user_id == b.b_user)
            & (b.b_ts >= a.a_ts - F.expr("INTERVAL 1 HOUR"))
            & (b.b_ts < a.a_ts),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_preceding"))
    )


_ABOVE_AVG_ORACLE = """
WITH ca AS (
  SELECT o_custkey AS k,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) / count(*)
           AS cust_avg
  FROM orders GROUP BY o_custkey
)
SELECT o_orderkey, o_custkey, o_totalprice, cust_avg
FROM orders JOIN ca ON o_custkey = k
WHERE o_totalprice > cust_avg
"""


@query("orders_above_customer_avg", _ABOVE_AVG_ORACLE)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated): orders priced above
    their customer's average — the canonical `WHERE x > (SELECT avg ...
    WHERE inner.key = outer.key)` pattern, expressed the way every
    engine actually executes it: aggregate once, join back.

    Scale: one shuffle for the per-customer aggregate (partial agg
    collapses it), one shuffle to join back on the same key — AQE can
    reuse the exchange. The DECIMAL-exact sum keeps the average
    order-independent so the oracle hash matches.
    """
    o = load(spark, sf_dir, "orders")
    ca = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (F.sum(_dec("o_totalprice", 14)).cast("double") / F.count(F.lit(1))).alias(
            "cust_avg"
        )
    )
    return (
        o.join(ca, o.o_custkey == ca.k)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        # cust_avg ships unrounded: both engines compute the identical
        # DECIMAL-sum/count double, but ROUND-on-double boundary
        # behavior differs across engines.
        .select("o_orderkey", "o_custkey", "o_totalprice", "cust_avg")
    )


_FULL_OUTER_ORACLE = """
WITH oc AS (
  SELECT o_custkey AS k, count(*) AS n_orders FROM orders GROUP BY o_custkey
), ec AS (
  SELECT user_id AS k, count(*) AS n_events FROM events GROUP BY user_id
)
SELECT COALESCE(oc.k, ec.k) AS custkey,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(n_events, 0) AS n_events
FROM oc FULL OUTER JOIN ec ON oc.k = ec.k
"""


@query("customer_activity_full_outer", _FULL_OUTER_ORACLE)
def customer_activity_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: order activity vs event activity per customer,
    keeping customers present on either side only.

    Scale: both inputs pre-aggregate to one row per key before the
    join, so the full-outer shuffle moves |keys| rows, not raw facts.
    """
    oc = (
        load(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("ok"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ec = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("ek"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return oc.join(ec, oc.ok == ec.ek, "full_outer").select(
        F.coalesce("ok", "ek").alias("custkey"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
    )


_ARGMAX_ORACLE = """
SELECT user_id,
       count(*) AS n,
       arg_min(event_type, event_id) AS first_event_type,
       arg_max(event_type, event_id) AS last_event_type
FROM events GROUP BY user_id
"""


@query("events_first_last_per_user", _ARGMAX_ORACLE)
def events_first_last_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-extremum) aggregates: first and last event
    type per user, ordered by the unique event id (unique key -> fully
    deterministic, unlike ordering by a timestamp that can tie).

    Scale: single hash aggregate; min_by/max_by carry one (key, value)
    pair of state per group — same cost shape as min/max.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
    )


_PRIORITY_SHIP_ORACLE = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@query("priority_shipments", _PRIORITY_SHIP_ORACLE)
def priority_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped conditional aggregation: per return flag, how
    many shipped lines belong to high- vs low-priority orders — the
    CASE-WHEN-inside-SUM pattern (one pass, no per-branch subqueries).

    Determinism: pure integer counts — no FP anywhere.

    Scale: the shipdate range predicate pushes into the lineitem scan
    (prunes both rows and, on a date-partitioned layout, partitions)
    BEFORE the join, so the shuffle carries only the window's lines;
    both conditional sums partial-aggregate map-side into single longs
    per flag.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


_LATE_SHIP_ORACLE = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


@query("late_shipping_orders", _LATE_SHIP_ORACLE)
def late_shipping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape through the SQL surface: orders per priority with
    at least one line item shipped 60+ days after the order date — a
    correlated EXISTS whose predicate mixes the equi key with a
    non-equi date comparison across BOTH relations, the case the
    decorrelator must keep inside the join condition.

    Scale: Catalyst's RewritePredicateSubquery turns the EXISTS into a
    LEFT SEMI join on l_orderkey with the date comparison as a join
    residual — one shuffle pair on the key, existence short-circuits
    per probe row, no count-then-filter materialization.
    """
    from ..catalog import register_test_tables

    register_test_tables(spark, sf_dir)
    return spark.sql(_LATE_SHIP_ORACLE)


_TIER_ORACLE = """
WITH tiers(tier, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1e9)
)
SELECT t.tier, count(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
GROUP BY t.tier
"""


@query("events_value_tier_lookup", _TIER_ORACLE)
def events_value_tier_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-table enrichment: classify every event by a (lo, hi) tier
    table with NO equi key at all — the IP-range / SLA-band / price-
    tier lookup shape. The tier side is broadcast, so the plan is a
    BroadcastNestedLoopJoin over a 3-row build side: each stream row
    scans the tiny sorted range list in place, no shuffle of the big
    side, no cartesian materialization.

    Scale: correct whenever the range table is broadcast-small (the
    production case for tier/geo tables); a million-range table would
    instead bucket both sides by range prefix to recover an equi key.
    """
    ev = load(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 1e9)],
        "tier string, lo double, hi double",
    )
    return (
        ev.join(
            F.broadcast(tiers),
            (ev.value >= tiers.lo) & (ev.value < tiers.hi),
        )
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


_CUST_DIST_ORACLE = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT n_orders, count(*) AS n_customers
FROM per_cust
GROUP BY n_orders
"""


@query("customer_order_distribution", _CUST_DIST_ORACLE)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count histogram over customers — a
    LEFT OUTER join (zero-order customers MUST survive with count 0,
    which an inner join silently drops) feeding a double aggregation
    (count per customer, then count per count).

    Scale: the outer join and the first aggregation share the
    c_custkey/o_custkey key, so Catalyst runs them in one shuffle
    domain; the second aggregation's key space is tiny (distinct order
    counts, tens of values) and collapses map-side before a near-free
    final exchange. count(o_orderkey) — not count(*) — is the
    load-bearing detail: it counts non-null matches only, giving the
    unmatched outer rows their 0.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


_IDLE_WEALTHY_ORACLE = """
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DECIMAL(18,2)) AS s,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey, count(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer c, pos
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2001-01-01')
GROUP BY c_nationkey
"""


@query("idle_wealthy_customers", _IDLE_WEALTHY_ORACLE)
def idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers richer than the positive-balance
    average with no RECENT order (none since 2001-01-01 — the test
    corpus gives every customer some historical order, so a plain
    never-ordered predicate would be vacuously empty and the check
    would pin nothing), rolled up by nation — an uncorrelated scalar
    aggregate subquery gating an anti join.

    The average is compared by exact cross-multiplication
    (acctbal * n > sum, all DECIMAL) instead of dividing to a double:
    a float average is summation-order-dependent, so a boundary
    customer could flip membership between engines; the cross-multiply
    keeps the predicate exact and engine-independent.

    Scale: the 1-row aggregate broadcasts into the filter (a
    BroadcastNestedLoopJoin over a single build row — free), the
    filter prunes BEFORE the anti join so only rich customers shuffle,
    and the anti join's build side is orders pre-filtered by the date
    predicate (pushed to the scan) and pruned to o_custkey only.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    pos = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).cast("decimal(18,2)").alias("_s"),
        F.count(F.lit(1)).alias("_n"),
    )
    rich = cust.join(F.broadcast(pos)).filter(bal * F.col("_n") > F.col("_s"))
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(bal).cast("double").alias("total_acctbal"),
    )


# shared by customer_segment_scd2 and orders_point_in_time_segment —
# the dimension seed + update-batch derivation must stay identical
# between the SCD2 builder and its point-in-time consumer (and their
# oracles share the same CTE text below), or the two queries' version
# semantics silently diverge.
_SEGMENT_UPD_CTE = """upd AS (
  SELECT o_custkey AS c_custkey, min(o_orderdate) AS eff
  FROM orders WHERE o_orderpriority = '1-URGENT'
  GROUP BY o_custkey
)"""


def _segment_scd2_inputs(spark: SparkSession, sf_dir: str):
    """(dim0, updates) for the customer-segment SCD2 dimension: seed
    every customer's current segment at 1995-01-01, move customers to
    'URGENT-TRACK' effective at their FIRST urgent order."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    dim0 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.min("o_orderdate").alias("eff_ts"))
        .withColumn("segment", F.lit("URGENT-TRACK"))
    )
    return dim0, updates


_SCD2_ORACLE = f"""
WITH {_SEGMENT_UPD_CTE}, chg AS (
  SELECT c.c_custkey, c.c_mktsegment, u.eff
  FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
)
SELECT c_custkey, c_mktsegment AS segment,
       TIMESTAMP '1995-01-01' AS valid_from, eff AS valid_to
FROM chg
UNION ALL
SELECT c_custkey, 'URGENT-TRACK', eff, NULL FROM chg
"""


@query("customer_segment_scd2", _SCD2_ORACLE)
def customer_segment_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension maintenance (operators/scd.py):
    seed an SCD2 customer-segment dimension, derive an update batch
    (customers move to the 'URGENT-TRACK' segment effective at their
    FIRST urgent order), apply it, and emit every versioned key's full
    history — the closed original version plus the new open one. The
    oracle recomputes both versions set-wise; a close/open/idempotency
    bug in the operator shifts a date or drops a row and breaks the
    hash.

    Scale: scd2_apply is one full-outer equi join of the current slice
    against the update batch plus narrow unions; the update derivation
    is a filtered min-aggregate on o_custkey. No windows, no per-key
    sort.
    """
    from ..operators.scd import scd2_apply

    dim, updates = _segment_scd2_inputs(spark, sf_dir)
    applied = scd2_apply(
        dim, updates, key_cols=["c_custkey"], attr_cols=["segment"]
    )
    # versioned keys only: every update here changes the segment, so the
    # semi join keeps exactly closed+reopened pairs
    return applied.join(
        updates.select("c_custkey"), "c_custkey", "left_semi"
    ).select("c_custkey", "segment", "valid_from", "valid_to")


_PIT_JOIN_ORACLE = f"""
WITH {_SEGMENT_UPD_CTE}, dim AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         TIMESTAMP '1995-01-01' AS valid_from, u.eff AS valid_to
  FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
  UNION ALL
  SELECT c.c_custkey, 'URGENT-TRACK', u.eff, NULL
  FROM customer c JOIN upd u ON c.c_custkey = u.c_custkey
  UNION ALL
  SELECT c.c_custkey, c.c_mktsegment, TIMESTAMP '1995-01-01', NULL
  FROM customer c WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.c_custkey = c.c_custkey)
)
SELECT d.segment, count(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
FROM orders o JOIN dim d
  ON o.o_custkey = d.c_custkey
 AND o.o_orderdate >= d.valid_from
 AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
GROUP BY d.segment
"""


@query("orders_point_in_time_segment", _PIT_JOIN_ORACLE)
def orders_point_in_time_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join: attribute every order to the
    segment the customer was in WHEN THE ORDER WAS PLACED, by joining
    facts against the SCD2 dimension's validity intervals — the query
    shape SCD2 exists to serve, and the one an as-of snapshot gets
    wrong (a customer's later move to URGENT-TRACK must not re-label
    their historical orders).

    Scale: equi key (custkey) carries the join — one shuffle pair, the
    interval predicate rides as a cheap join residual; versions per key
    are few (2 here), so the residual scans a handful of rows per
    probe. Never a range-only join, never a cartesian.
    """
    from ..operators.scd import scd2_apply

    orders = load(spark, sf_dir, "orders")
    dim0, updates = _segment_scd2_inputs(spark, sf_dir)
    dim = scd2_apply(dim0, updates, key_cols=["c_custkey"], attr_cols=["segment"])
    joined = orders.join(
        dim,
        (orders.o_custkey == dim.c_custkey)
        & (orders.o_orderdate >= dim.valid_from)
        & (dim.valid_to.isNull() | (orders.o_orderdate < dim.valid_to)),
    )
    return joined.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .cast("double")
        .alias("revenue"),
    )


_DISJUNCTIVE_ORACLE = """
SELECT p.p_brand,
       count(*) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 5 AND 20
       AND l.l_quantity BETWEEN 10 AND 35)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 40
       AND l.l_quantity BETWEEN 20 AND 50)
GROUP BY p.p_brand
"""


@query("brand_discount_revenue", _DISJUNCTIVE_ORACLE)
def brand_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose predicate is an OR of AND-groups
    mixing columns from BOTH relations — the case that breaks naive
    pushdown. Catalyst extracts the common-prefix conjuncts it can
    (each OR branch constrains p_brand/p_size and l_quantity, so a
    derived disjunctive filter pushes to EACH scan) while the cross-
    relation residual stays on the join — exactly what you want: the
    scans shrink first, the equi key (l_partkey = p_partkey) still
    carries the join, no cartesian anywhere.

    Scale: part is broadcast; lineitem never shuffles; revenue follows
    the DECIMAL-exact discipline.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    sz = F.col("p_size")
    b = F.col("p_brand")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(5, 20) & q.between(10, 35))
        | ((b == "Brand#3") & sz.between(10, 40) & q.between(20, 50))
    )
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(12,2)")
    return (
        j.filter(cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue"),
        )
    )


_SOLE_LATE_ORACLE = """
WITH late AS (
  SELECT l.l_suppkey, l.l_orderkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, count(*) AS n_blamed
FROM supplier s JOIN late l1 ON s.s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
"""


@query("suppliers_sole_blame", _SOLE_LATE_ORACLE)
def suppliers_sole_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers SOLELY responsible for a late
    multi-supplier order — one correlated EXISTS (someone else supplied
    the order) and one correlated NOT EXISTS (nobody else was late) on
    the same key, the dual-quantifier pattern that needs BOTH a semi
    and an anti join against differently-filtered views of one table.

    The plan is the decorrelated form built EXPLICITLY with the
    DataFrame API (independent of the oracle text, so the cross-engine
    gate stays a real check): the EXISTS becomes a LEFT SEMI join of
    the late rows against lineitem on l_orderkey with the
    supplier-inequality as a non-equi residual, and the NOT EXISTS
    becomes a LEFT ANTI against the late set on the same key — both
    shuffles land on l_orderkey, which the `late` derivation already
    partitioned by, so AQE reuses the exchange; supplier is broadcast.
    No per-row subquery execution anywhere.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supplier = load(spark, sf_dir, "supplier")

    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_suppkey", "l_orderkey")
    )
    # EXISTS: someone ELSE supplied a line of this order
    others = li.select("l_orderkey", "l_suppkey").alias("l2")
    with_others = late.alias("l1").join(
        others,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    # NOT EXISTS: nobody ELSE was late on this order
    sole = with_others.alias("l1").join(
        late.alias("l3"),
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(
            F.broadcast(supplier),
            sole.l_suppkey == supplier.s_suppkey,
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_blamed"))
    )


@query("customer_segment_scd2_stream", _SCD2_ORACLE)
def customer_segment_scd2_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SCD2 maintenance (streaming/scd.py) replayed under the
    batch oracle, like log_rollup_incremental: the SAME update set as
    customer_segment_scd2 arrives as three micro-batches (split by
    c_custkey % 3), with batch 0's rows RE-DELIVERED inside batch 1 —
    the at-least-once duplication a Kinesis CDC feed actually produces.
    The maintainer folds each batch last-write-wins, applies via
    scd2_apply, and commits a batch_id-keyed dimension version; the
    final committed version must match the one-shot batch application
    digit-for-digit under the DuckDB oracle, proving re-delivery
    no-ops and version commits compose.

    Scale: each micro-batch costs one full-outer equi join against the
    current slice plus a dimension-sized rewrite — the right shape for
    dimension tables; facts belong in the append-only log path.
    """
    import shutil
    import tempfile

    from ..streaming.scd import StreamingScd2Maintainer

    dim0, updates = _segment_scd2_inputs(spark, sf_dir)
    # Per-invocation state dir: the dimension is rebuilt deterministically
    # each run, and a shared fixed path races when pytest and the oracle
    # sweep replay the same sf_dir concurrently (one rmtree's the other's
    # committed version mid-read).
    state = tempfile.mkdtemp(prefix="spark_graft_scd_stream_")
    shutil.rmtree(state, ignore_errors=True)  # maintainer recreates it
    try:
        m = StreamingScd2Maintainer(
            spark, state, ["c_custkey"], ["segment"], seed=dim0
        )
        part = F.pmod(F.col("c_custkey"), F.lit(3))
        m.apply_batch(updates.filter(part == 0), 0)
        m.apply_batch(updates.filter(part <= 1), 1)  # re-delivers batch 0
        m.apply_batch(updates.filter(part == 2), 2)
        out = m.current().join(
            updates.select("c_custkey"), "c_custkey", "left_semi"
        ).select("c_custkey", "segment", "valid_from", "valid_to")
        # Materialize (dimension-sized) before reclaiming the state dir:
        # the caller collects lazily, after the finally below has run.
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(state, ignore_errors=True)


_SMALL_LOT_ORACLE = """
WITH pavg AS (
  SELECT l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
         count(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pavg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND CAST(l.l_quantity AS DECIMAL(12,2)) * 5 * a.cnt < a.sq
"""


@query("small_lot_revenue", _SMALL_LOT_ORACLE)
def small_lot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from SMALL-LOT orders — lineitems whose
    quantity is below 20% of their part's average quantity, i.e. a
    correlated scalar aggregate (avg per l_partkey) consumed by the
    outer row's predicate. Decorrelated explicitly: ONE per-part
    aggregate joined back on the part key.

    The threshold comparison is the exact integer-cross-multiply form
    (qty * 5 * cnt < sum  <=>  qty < 0.2 * sum/cnt) in DECIMAL — no
    float division at the boundary, so Spark and the oracle agree
    digit-for-digit no matter the summation order.

    Scale: the brand filter pushes to the part scan and BROADCASTS the
    ~1/25 slice; the per-part aggregate map-side combines; both joins
    ride the same l_partkey — at 100 TB lineitem shuffles once on
    partkey and AQE reuses the exchange for the agg and the join.
    """
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    qdec = F.col("l_quantity").cast("decimal(12,2)")
    pavg = li.groupBy("l_partkey").agg(
        F.sum(qdec).alias("_sq"), F.count(F.lit(1)).alias("_cnt")
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pavg.withColumnRenamed("l_partkey", "_pk"),
              F.col("l_partkey") == F.col("_pk"))
        .filter(qdec * 5 * F.col("_cnt") < F.col("_sq"))
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double") / F.lit(7.0)
        ).alias("avg_yearly")
    )


_LARGE_VOLUME_ORACLE = """
WITH big AS (
  SELECT l_orderkey
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
"""


@query("large_volume_orders", _LARGE_VOLUME_ORACLE)
def large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    — an IN over a GROUP BY ... HAVING subquery on the SAME fact table
    the outer query re-aggregates. The classic plan trap is computing
    the group-by twice; here the HAVING set becomes ONE left-semi join
    and both aggregations shuffle on l_orderkey/o_orderkey, so AQE can
    reuse the exchange.

    Scale: the semi join keeps ~2% of orders before the wide 3-table
    join runs; customer broadcasts against the surviving slice.
    DECIMAL-exact quantity sums on both sides of the gate.
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    qdec = F.col("l_quantity").cast("decimal(12,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qdec).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    kept = orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    )
    return (
        kept.join(li, kept.o_orderkey == li.l_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == customer.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qdec).cast("double").alias("total_qty"))
    )


_DOMINANT_SUPPLIER_ORACLE = """
WITH sp AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS q
  FROM lineitem GROUP BY l_suppkey, l_partkey
), pt AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS tq
  FROM lineitem GROUP BY l_partkey
)
SELECT s.s_name, count(*) AS n_dominated
FROM sp JOIN pt ON sp.l_partkey = pt.l_partkey
JOIN supplier s ON s.s_suppkey = sp.l_suppkey
WHERE sp.q * 5 > pt.tq
GROUP BY s.s_name
"""


@query("dominant_part_suppliers", _DOMINANT_SUPPLIER_ORACLE)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (reformulated without partsupp, which the test
    schema lacks): suppliers shipping MORE THAN 20% of some part's
    total volume — a correlated aggregate inside HAVING, decorrelated
    into two grouped views of one fact table joined on the correlation
    key. Exact integer-cross-multiply threshold (q * 5 > tq, DECIMAL)
    — see small_lot_revenue.

    Scale: both aggregates map-side combine and shuffle on keys that
    share the l_partkey prefix; the (supp,part)-level frame is already
    |distinct pairs|, so the join after it is small; supplier
    broadcasts.
    """
    li = load(spark, sf_dir, "lineitem")
    supplier = load(spark, sf_dir, "supplier")
    qdec = F.col("l_quantity").cast("decimal(12,2)")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(F.sum(qdec).alias("q"))
    pt = li.groupBy("l_partkey").agg(F.sum(qdec).alias("tq")).withColumnRenamed(
        "l_partkey", "_pk"
    )
    dominated = sp.join(pt, sp.l_partkey == F.col("_pk")).filter(
        F.col("q") * 5 > F.col("tq")
    )
    return (
        dominated.join(
            F.broadcast(supplier), dominated.l_suppkey == supplier.s_suppkey
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated"))
    )


_INTEGRITY_ORACLE = """
SELECT 'orders.o_custkey -> customer' AS constraint_name,
       (SELECT count(*) FROM orders) AS n_rows,
       (SELECT count(*) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations
UNION ALL
SELECT 'lineitem.l_orderkey -> orders',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE l.l_orderkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey))
UNION ALL
SELECT 'lineitem.l_partkey -> part',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem l
        WHERE l.l_partkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM part p
                          WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem.l_quantity in [1, 50]',
       (SELECT count(*) FROM lineitem),
       (SELECT count(*) FROM lineitem
        WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
UNION ALL
SELECT 'orders.o_orderkey unique',
       (SELECT count(*) FROM orders),
       (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        FROM orders)
"""


@query("referential_integrity_audit", _INTEGRITY_ORACLE)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit: foreign-key orphans (anti joins), a range
    constraint, and a uniqueness check, one row per constraint — the
    validation pass a pipeline runs BEFORE publishing a snapshot, as a
    query instead of a side toolchain.

    Scale: each FK check is ONE left-anti join (broadcast when the
    parent is a dimension, shuffled hash otherwise — Catalyst's
    choice); range and uniqueness checks are single aggregates with
    map-side combine. Violation counts, not violating rows — the audit
    stays tiny; a debug run filters the same anti join for samples.
    """
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")
    customer = load(spark, sf_dir, "customer")
    part = load(spark, sf_dir, "part")

    def one(name, n_df, v_df):
        # (count, count) as two scalar aggregates joined into one row —
        # everything stays ONE lazy plan, no driver-side .count() loop
        n = n_df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        v = v_df.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
        return (
            n.crossJoin(v)
            .withColumn("constraint_name", F.lit(name))
            .select("constraint_name", "n_rows", "n_violations")
        )

    def fk(name, child, fk_col, parent, pk_col):
        orphans = child.filter(F.col(fk_col).isNotNull()).join(
            parent, child[fk_col] == parent[pk_col], "left_anti"
        )
        return one(name, child, orphans)

    checks = [
        fk("orders.o_custkey -> customer", orders, "o_custkey",
           customer, "c_custkey"),
        fk("lineitem.l_orderkey -> orders", lineitem, "l_orderkey",
           orders, "o_orderkey"),
        fk("lineitem.l_partkey -> part", lineitem, "l_partkey",
           part, "p_partkey"),
        one(
            "lineitem.l_quantity in [1, 50]",
            lineitem,
            lineitem.filter(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50)
            ),
        ),
        orders.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey"))
            .cast("long")
            .alias("n_violations"),
        )
        .withColumn("constraint_name", F.lit("orders.o_orderkey unique"))
        .select("constraint_name", "n_rows", "n_violations"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out

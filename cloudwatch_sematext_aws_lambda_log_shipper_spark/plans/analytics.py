"""Downstream analytics queries — the query surface the shipped log index
serves in the reference deployment (filter/aggregate/time-series), run
over the driver's star-schema tables (SURVEY.md §2.3 categories).

Every aggregate follows the registry determinism rules (DECIMAL-exact
sums, final DOUBLE casts) so DuckDB value hashes match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..artifacts import artifact_root
from ..operators.sketches import SAMPLED_QUANTILE_S as _SAMPLED_QUANTILE_S
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


_SESSION_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id,
       count(DISTINCT session_id) AS n_sessions,
       count(*) AS n_events
FROM sessions
GROUP BY user_id
"""


@query("user_sessions", _SESSION_ORACLE)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: gap > 30 min starts a new session (lag + running
    sum — the classic pattern).

    Scale: one shuffle on user_id for the window; everything after is
    narrow. Skewed power users are bounded by per-user event counts,
    not table size.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # `ts` arrives as TIMESTAMP_NTZ from parquet (isAdjustedToUTC=false);
    # ANSI mode forbids NTZ→BIGINT directly, so route through TIMESTAMP.
    # Gap-correct ONLY because get_spark pins spark.sql.session.timeZone
    # to UTC (fixed offset): under a DST-observing zone, a gap spanning a
    # transition would shift by ±3600s and could flip the session split.
    tsl = F.col("ts").cast("timestamp").cast("long")
    gap = tsl - F.lag(tsl).over(w)
    new_session = (gap.isNull() | (gap > 30 * 60)).cast("int")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = ev.withColumn("session_id", F.sum(new_session).over(run))
    return sessions.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


_PIVOT_ORACLE = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS click,
       count(*) FILTER (WHERE event_type = 'error') AS error,
       count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS signup,
       count(*) FILTER (WHERE event_type = 'view') AS view
FROM events GROUP BY user_id
"""


@query("events_pivot", _PIVOT_ORACLE)
def events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type, counts per user.

    The value list is EXPLICIT (no discovery pass), so the plan is a
    single groupBy with conditional aggregates — at scale an implicit
    pivot would add a distinct-values job first.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


_UNPIVOT_ORACLE = """
WITH p AS (
  SELECT user_id,
         count(*) FILTER (WHERE event_type = 'click') AS click,
         count(*) FILTER (WHERE event_type = 'purchase') AS purchase
  FROM events GROUP BY user_id
)
SELECT user_id, kind, n
FROM p UNPIVOT (n FOR kind IN (click, purchase))
"""


@query("events_unpivot", _UNPIVOT_ORACLE)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-user counts back to long form — the
    stack() pattern. Narrow op: 2x row multiplication, no extra shuffle
    beyond the pivot's aggregation."""
    ev = load(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("click"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("purchase"),
    )
    return wide.unpivot(
        ids=["user_id"], values=["click", "purchase"],
        variableColumnName="kind", valueColumnName="n",
    )


_QUANTILE_ORACLE = """
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.50) AS p50,
       quantile_cont(value, 0.75) AS p75
FROM events GROUP BY event_type
"""


@query("events_value_quantiles", _QUANTILE_ORACLE)
def events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quantiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`: both linear-interpolate order statistics,
    so values hash-match bit-for-bit).

    Scale note: exact percentile sorts each group's values — at 100 TB
    use `approx_percentile` (t-digest, mergeable, single pass); the
    exact form stays for oracle parity like countDistinct does.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25"),
        F.percentile("value", 0.50).alias("p50"),
        F.percentile("value", 0.75).alias("p75"),
    )



_SAMPLED_QUANTILE_ORACLE = f"""
WITH pri AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR) || 'qsamp'), event_id)
           AS rk
  FROM events
), samp AS (
  SELECT event_type, value FROM pri WHERE rk <= {_SAMPLED_QUANTILE_S}
), sq AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS p25_sampled,
         quantile_cont(value, 0.50) AS p50_sampled,
         quantile_cont(value, 0.75) AS p75_sampled
  FROM samp GROUP BY event_type
), audit AS (
  SELECT e.event_type, count(*) AS n,
         SUM(CASE WHEN e.value <= s.p25_sampled THEN 1 ELSE 0 END) AS le25,
         SUM(CASE WHEN e.value <= s.p50_sampled THEN 1 ELSE 0 END) AS le50,
         SUM(CASE WHEN e.value <= s.p75_sampled THEN 1 ELSE 0 END) AS le75
  FROM events e JOIN sq s USING (event_type) GROUP BY e.event_type
)
SELECT s.event_type, a.n, s.p25_sampled, s.p50_sampled, s.p75_sampled,
       abs(CAST(a.le25 AS DOUBLE) / a.n - 0.25) <= 0.12
       AND abs(CAST(a.le50 AS DOUBLE) / a.n - 0.50) <= 0.12
       AND abs(CAST(a.le75 AS DOUBLE) / a.n - 0.75) <= 0.12 AS within_bound
FROM sq s JOIN audit a USING (event_type)
"""


@query("events_value_quantiles_sampled", _SAMPLED_QUANTILE_ORACLE)
def events_value_quantiles_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles by DETERMINISTIC uniform sampling, under
    the STRICT hash gate: each group keeps its s=400 rows of smallest
    md5(event_id || salt) priority — bottom-k by a uniform hash IS a
    mergeable uniform sample (the KMV argument: per-partition partial
    bottom-k merge into the global bottom-k, so at 100 TB each group
    ships s rows, never its full value set) — and the interpolated
    sample quantiles estimate the population's. Spark `percentile` ==
    DuckDB `quantile_cont` on the identical sampled multiset, so every
    emitted double hash-matches. The in-band audit puts the estimate
    back through the EXACT CDF (integer counts): ``within_bound``
    gates |F(est) - q| <= 0.12 (rank error ~ sqrt(q(1-q)/s) = 0.025
    at the median; the bound is ~4.8 sigma). Groups smaller than s
    degenerate to the exact quantiles by construction.

    This is the hash-gated twin of events_value_quantiles_approx (GK
    sketch — genuinely order-dependent, no SQL replay exists; as of
    r13 a pytest-only library operator rather than a declared query);
    same problem, same error regime, replayable arithmetic."""
    ev = load(spark, sf_dir, "events")
    pri = F.md5(F.concat(F.col("event_id").cast("string"), F.lit("qsamp")))
    w = Window.partitionBy("event_type").orderBy(pri, "event_id")
    samp = (
        ev.select("event_type", "event_id", "value")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= _SAMPLED_QUANTILE_S)
    )
    sq = samp.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("p25_sampled"),
        F.percentile("value", 0.50).alias("p50_sampled"),
        F.percentile("value", 0.75).alias("p75_sampled"),
    )
    audit = (
        ev.select("event_type", "value")
        .join(F.broadcast(sq), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") <= F.col("p25_sampled"), 1).otherwise(0)
            ).alias("_le25"),
            F.sum(
                F.when(F.col("value") <= F.col("p50_sampled"), 1).otherwise(0)
            ).alias("_le50"),
            F.sum(
                F.when(F.col("value") <= F.col("p75_sampled"), 1).otherwise(0)
            ).alias("_le75"),
        )
    )
    ok = (
        (F.abs(F.col("_le25").cast("double") / F.col("n") - 0.25) <= 0.12)
        & (F.abs(F.col("_le50").cast("double") / F.col("n") - 0.50) <= 0.12)
        & (F.abs(F.col("_le75").cast("double") / F.col("n") - 0.75) <= 0.12)
    )
    return sq.join(audit, "event_type").select(
        "event_type", "n", "p25_sampled", "p50_sampled", "p75_sampled",
        ok.alias("within_bound"),
    )


_ASOF_ORACLE = """
SELECT e.event_id, e.user_id, e.ts,
       o.o_orderkey AS last_orderkey, o.o_orderdate AS last_orderdate
FROM events e
ASOF LEFT JOIN (
    SELECT o_custkey, o_orderdate, min(o_orderkey) AS o_orderkey
    FROM orders GROUP BY o_custkey, o_orderdate
) o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


@query("events_asof_last_order", _ASOF_ORACLE)
def events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): each event paired with the
    customer's most recent order at event time.

    Composition: equi-join on the customer key, filter to orders at or
    before the event, rank per event by (o_orderdate DESC, o_orderkey)
    and keep the first — ties on the same date resolve to the smallest
    order key, mirroring the oracle's DISTINCT ON + min().

    Scale: the only shuffle is the equi-join on the customer key; the
    per-event candidate set is bounded by that customer's order count.
    For sorted-bucketed tables this becomes a merge path; for extreme
    per-key multiplicities, bucketize the time axis first.
    """
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    joined = ev.join(
        orders,
        (ev.user_id == orders.o_custkey) & (ev.ts >= orders.o_orderdate),
        "left",
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey")
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("last_orderkey"),
            F.col("o_orderdate").alias("last_orderdate"),
        )
    )


_TIME_ROLLUP_ORACLE = """
WITH base AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS d,
         CAST(date_trunc('week', ts) AS DATE) AS w,
         CAST(date_trunc('month', ts) AS DATE) AS m,
         CAST(value AS DECIMAL(14,4)) AS v
  FROM events
)
SELECT CASE WHEN d IS NOT NULL THEN 'day'
            WHEN w IS NOT NULL THEN 'week'
            ELSE 'month' END AS granularity,
       COALESCE(d, w, m) AS bucket_start,
       count(*) AS n,
       CAST(SUM(v) AS DOUBLE) AS total_value
FROM base
GROUP BY GROUPING SETS ((d), (w), (m))
"""


@query("events_time_rollup", _TIME_ROLLUP_ORACLE)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-aggregate
    shape): day, week, and month buckets computed in ONE pass via
    GROUPING SETS over derived truncations.

    Scale: Expand emits 3 rows per input before partial aggregation
    collapses each map task to ~|buckets| rows — one scan and one small
    shuffle instead of three scans of the fact table.
    """
    ev = load(spark, sf_dir, "events")
    base = ev.select(
        F.date_trunc("day", "ts").cast("date").alias("d"),
        F.date_trunc("week", "ts").cast("date").alias("w"),
        F.date_trunc("month", "ts").cast("date").alias("m"),
        F.col("value").cast("decimal(14,4)").alias("v"),
    )
    agg = base.groupingSets([["d"], ["w"], ["m"]], "d", "w", "m").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("double").alias("total_value"),
    )
    granularity = (
        F.when(F.col("d").isNotNull(), F.lit("day"))
        .when(F.col("w").isNotNull(), F.lit("week"))
        .otherwise(F.lit("month"))
    )
    return agg.select(
        granularity.alias("granularity"),
        F.coalesce("d", "w", "m").alias("bucket_start"),
        "n",
        "total_value",
    )


_SESSION_WINDOW_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM gaps
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, sid
"""


@query("events_session_window", _SESSION_WINDOW_ORACLE)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window aggregation (30-minute inactivity gap) —
    the Spark-first sessionizer: one hash aggregate with session-merge,
    no analytic-window pass, and the SAME expression works under
    Structured Streaming with a watermark (streaming/pipeline.py).

    The oracle rebuilds identical sessions via the lag/running-sum
    island method; session_end follows Spark's [start, last+gap)
    convention.

    Scale: sessions merge inside the aggregate (partial merge per map
    task), so the shuffle carries per-session state, not raw events —
    strictly less data than the window-function formulation.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )


_ANOMALY_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS cnt
  FROM events GROUP BY event_type, day
), stats AS (
  SELECT event_type, count(*) AS n_days,
         CAST(SUM(cnt) AS BIGINT) AS s1,
         CAST(SUM(cnt * cnt) AS BIGINT) AS s2
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.cnt,
       CAST(ROUND(CAST(s.s1 AS DOUBLE) / s.n_days, 6) AS DOUBLE) AS mean_cnt,
       CAST(ROUND(sqrt(CAST(s.s2 AS DOUBLE) / s.n_days
                       - (CAST(s.s1 AS DOUBLE) / s.n_days)
                         * (CAST(s.s1 AS DOUBLE) / s.n_days)), 6) AS DOUBLE)
         AS std_cnt
FROM daily d JOIN stats s USING (event_type)
WHERE d.cnt > CAST(s.s1 AS DOUBLE) / s.n_days
              + 2 * sqrt(CAST(s.s2 AS DOUBLE) / s.n_days
                         - (CAST(s.s1 AS DOUBLE) / s.n_days)
                           * (CAST(s.s1 AS DOUBLE) / s.n_days))
"""


@query("events_daily_anomalies", _ANOMALY_ORACLE)
def events_daily_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly days per event type: days whose event count
    exceeds mean + 2 sigma for that type — the alerting query a log
    engine runs over its ingested table (error-spike detection).

    Determinism: counts are exact integers, so the population moments
    (s1, s2) are exact; mean and sigma derive from them through the
    SAME double expression shape in both engines — every IEEE op is
    then bit-identical, unlike stddev_samp whose streaming accumulation
    is summation-order-dependent.

    Scale: the daily rollup is one partial-combined shuffle; per-type
    moment stats are |types| rows, broadcast back onto the daily frame
    — no window function, no second wide shuffle.
    """
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    std = F.sqrt(F.col("s2").cast("double") / F.col("n_days") - mean * mean)
    return (
        daily.join(F.broadcast(stats), "event_type")
        .filter(F.col("cnt") > mean + F.lit(2) * std)
        .select(
            "event_type",
            "day",
            "cnt",
            F.round(mean, 6).alias("mean_cnt"),
            F.round(std, 6).alias("std_cnt"),
        )
    )


# --- funnel analysis ----------------------------------------------------

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t_view
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
), counts AS (
  SELECT 1 AS step, 'view' AS stage, count(*) AS users FROM s1
  UNION ALL
  SELECT 2, 'view>click', count(*) FROM s2
  UNION ALL
  SELECT 3, 'view>click>purchase', count(*) FROM s3
)
SELECT step, stage, CAST(users AS BIGINT) AS users,
       ROUND(users::DOUBLE / (SELECT users FROM counts WHERE step = 1), 6)
         AS conv_from_first
FROM counts
"""


@query("user_funnel", _FUNNEL_ORACLE)
def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click
    — the strictly-ordered conversion funnel (an unordered
    count-per-type overcounts users who purchased before viewing).

    Scale: one filtered min-aggregate per stage (map-side combined)
    cascaded through equi-joins on user_id; each stage's frame only
    shrinks, and AQE broadcasts the later (small) stages. No windows,
    no per-user event sorting."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("users"))
        .select(F.lit(1).alias("step"), F.lit("view").alias("stage"), "users")
        .unionByName(
            s2.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(2).alias("step"), F.lit("view>click").alias("stage"), "users"
            )
        )
        .unionByName(
            s3.agg(F.count(F.lit(1)).alias("users")).select(
                F.lit(3).alias("step"),
                F.lit("view>click>purchase").alias("stage"),
                "users",
            )
        )
    )
    base = s1.agg(F.count(F.lit(1)).alias("_n1"))
    return counts.crossJoin(F.broadcast(base)).select(
        "step",
        "stage",
        F.col("users").cast("long").alias("users"),
        F.round(F.col("users").cast("double") / F.col("_n1"), 6).alias(
            "conv_from_first"
        ),
    )


# --- cohort retention ---------------------------------------------------

_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
), cohort_size AS (
  SELECT cohort_week, count(*) AS cohort_users FROM firsts GROUP BY cohort_week
), joined AS (
  SELECT f.cohort_week,
         CAST(datediff('day', f.cohort_week, a.active_week) / 7 AS BIGINT)
           AS week_offset,
         count(DISTINCT a.user_id) AS active_users
  FROM firsts f JOIN activity a USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(j.cohort_week AS DATE) AS cohort_week, j.week_offset,
       CAST(j.active_users AS BIGINT) AS active_users,
       ROUND(j.active_users::DOUBLE / c.cohort_users, 6) AS retention
FROM joined j JOIN cohort_size c USING (cohort_week)
"""


@query("user_retention_cohorts", _COHORT_ORACLE)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the ISO week of their
    first event; for each later week, the share of the cohort still
    active — the classic retention triangle.

    Scale: two aggregations over events (first-event per user, distinct
    user-weeks) joined on user_id, then a small per-(cohort, offset)
    rollup; the cohort-size dimension broadcasts."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    cohort_size = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    joined = (
        firsts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    return joined.join(F.broadcast(cohort_size), "cohort_week").select(
        F.col("cohort_week").cast("date").alias("cohort_week"),
        "week_offset",
        F.col("active_users").cast("long").alias("active_users"),
        F.round(
            F.col("active_users").cast("double") / F.col("cohort_users"), 6
        ).alias("retention"),
    )


_ZORDER_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
WHERE user_id BETWEEN 30 AND 90 AND value BETWEEN 40.0 AND 160.0
GROUP BY event_type
"""

# The box is fixed so the oracle is scale-independent; selectivity ~10%
# on the test corpus (user_id spans 0..149, value 0..~490).
_ZORDER_BOX = {"user_id": (30.0, 90.0), "value": (40.0, 160.0)}


@query("events_zorder_scan", _ZORDER_ORACLE)
def events_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional BOX query over a Z-ORDERED copy of the events
    table (operators/layout.py): the layout clusters (user_id, value)
    jointly, the box decomposes driver-side into a z_bucket IN-list
    that PartitionFilters the file listing, and the exact residual
    predicate keeps results identical to the raw-table oracle.

    Scale: this is the 100 TB scan-path story — a conjunctive range
    predicate over two columns reads only the files whose z-range
    intersects the box (~box volume fraction of the table), where a
    single-column layout prunes on one dimension at best. Write cost
    is one bounds aggregate + one range shuffle, paid once.
    """
    from ..operators.layout import (
        read_zorder_meta,
        write_zordered,
        zorder_box_filter,
    )
    from .synthcache import materialize_dir

    path = materialize_dir(
        spark,
        sf_dir,
        "events_zorder",
        builder=lambda: load(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type", "value"
        ),
        writer=lambda df, p: write_zordered(
            df, p, ["user_id", "value"], bits_per_dim=8, n_buckets=64
        ),
    )
    meta = read_zorder_meta(path)
    t = spark.read.parquet(path)
    return (
        t.filter(zorder_box_filter(meta, _ZORDER_BOX))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


_ROLLING_ORACLE = """
WITH f AS (
  SELECT user_id, event_id, ts,
         count(*) OVER w AS n_prev_hour,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
           AS sum_prev_hour
  FROM events
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
  )
)
SELECT user_id, event_id,
       n_prev_hour,
       ROUND(sum_prev_hour, 2) AS sum_prev_hour,
       ROUND(sum_prev_hour / n_prev_hour, 6) AS avg_prev_hour
FROM f
"""


@query("events_rolling_features", _ROLLING_ORACLE)
def events_rolling_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling time-window features (interval RANGE frame): per event,
    the count / exact sum / mean of the SAME USER's values in the
    trailing hour (inclusive) — the sliding-aggregate shape feature
    pipelines and rate limiters run, as a window FRAME instead of the
    self-join in events_preceding_hour_range_join.

    Scale: one shuffle on user_id, then a single ordered pass per
    partition with a sliding frame (Spark evaluates RANGE frames
    incrementally, no per-row rescan). DECIMAL sums keep the frame
    aggregation order-independent so the DuckDB hash matches.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, 0)
    )
    ev = load(spark, sf_dir, "events")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(F.col("value").cast("decimal(12,2)")).over(w).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        n.alias("n_prev_hour"),
        F.round(s, 2).alias("sum_prev_hour"),
        F.round(s / n, 6).alias("avg_prev_hour"),
    )


_PROFILE_ORACLE = """
SELECT 'event_id' AS column_name, count(*) AS n_rows,
       count(*) - count(event_id) AS n_nulls,
       count(DISTINCT event_id) AS n_distinct
FROM events
UNION ALL
SELECT 'user_id', count(*), count(*) - count(user_id),
       count(DISTINCT user_id) FROM events
UNION ALL
SELECT 'event_type', count(*), count(*) - count(event_type),
       count(DISTINCT event_type) FROM events
UNION ALL
SELECT 'value', count(*), count(*) - count(value),
       count(DISTINCT value) FROM events
UNION ALL
SELECT 'ts', count(*), count(*) - count(ts),
       count(DISTINCT ts) FROM events
"""

_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "ts"]


@query("table_profile", _PROFILE_ORACLE)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style data profiling: per-column row/null/exact-distinct
    counts in ONE scan — the data-quality audit step every ingest
    pipeline fronts (null-rate regressions, key-cardinality drift).

    Scale: the multi-distinct aggregate runs as one pass with an
    Expand (k x row fan-out for k profiled columns, map-side partial
    aggregation); exact NDV is the oracle-checkable choice here —
    at 100 TB swap count_distinct for approx_count_distinct per column
    (the HLL trade the events_daily_approx query already exercises).
    Profile wide tables in column batches to bound the Expand factor.
    """
    ev = load(spark, sf_dir, "events")
    wide = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(F.col(c)).alias(f"_nn_{c}") for c in _PROFILE_COLS],
        *[F.count_distinct(F.col(c)).alias(f"_nd_{c}") for c in _PROFILE_COLS],
    )
    stack = ", ".join(
        f"'{c}', n_rows - _nn_{c}, _nd_{c}" for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) "
            "AS (column_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


_DECILES_ORACLE = """
WITH ranked AS (
  SELECT event_type, value,
         ntile(10) OVER (PARTITION BY event_type
                         ORDER BY value, event_id) AS decile,
         percent_rank() OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS pr
  FROM events
)
SELECT event_type, decile,
       count(*) AS n,
       CAST(MIN(value) AS DOUBLE) AS lo,
       CAST(MAX(value) AS DOUBLE) AS hi,
       CAST(ROUND(MAX(pr), 6) AS DOUBLE) AS max_pct_rank
FROM ranked
GROUP BY event_type, decile
"""


@query("events_value_deciles", _DECILES_ORACLE)
def events_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution bucketing via ranking windows: ntile(10) +
    percent_rank per event type, rolled up to decile boundary stats —
    the feature-binning / calibration-table shape. The (value,
    event_id) compound ordering makes tile assignment TOTAL, so both
    engines bucket identically even among equal values.

    Scale: partitioning the ranking window by event_type alone makes
    each per-type partition fact-sized/|types| (~5 types here) — a
    skew magnet. operators/ranking.with_global_ntile range-splits each
    type's rows across ALL partitions and reassembles exact ranks from
    bounded prefix offsets, so no task ever sorts more than one range
    slice; percent_rank falls out of the same pass as
    (rank-1)/(n-1). The decile rollup collapses map-side to 10 rows
    per type.
    """
    from ..operators.ranking import with_global_ntile

    ev = load(spark, sf_dir, "events")
    ranked = with_global_ntile(
        ev.select("event_type", "value", "event_id"),
        10,
        [F.asc("value"), F.asc("event_id")],
        "decile",
        partition_cols=["event_type"],
        rank_out="__r",
        n_out="__n",
    ).select(
        "event_type",
        "value",
        "decile",
        F.when(
            F.col("__n") > 1,
            (F.col("__r") - 1) / (F.col("__n") - 1),
        )
        .otherwise(F.lit(0.0))
        .alias("pr"),
    )
    return ranked.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").cast("double").alias("lo"),
        F.max("value").cast("double").alias("hi"),
        F.round(F.max("pr"), 6).cast("double").alias("max_pct_rank"),
    )


def events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (approx_percentile, the
    Greenwald-Khanna family) vs the exact percentiles, self-auditing:
    each row carries the approximate value, the exact value, and
    `within_bound` — whether the approximation's RANK error respects
    the sketch's accuracy parameter (1/accuracy relative rank error).
    Approx answers differ by engine/algorithm, so there is no DuckDB
    hash twin; the truth is carried IN the result instead, the same
    pattern as the ANN queries' recall_ok.

    PYTEST-ONLY operator as of r13 (the verdict's #5, option a): the
    GK merge is the single genuinely order-dependent op in the repo,
    so it was the one rows-only row in the oracle sweep. The DECLARED
    sampled-quantile capability is events_value_quantiles_sampled —
    same problem, same error regime, strict hash gate — and this GK
    path stays as the library operator for 100 TB single-pass use,
    pinned by tests/test_relational3.py
    test_approx_quantiles_within_sketch_bound (the within_bound rank
    audit below must hold on every row).

    Scale: this is the quantile path that works at 100 TB — the sketch
    is map-side mergeable with O(accuracy * log n) state per partition,
    while exact percentile_cont needs a full sort per group. The exact
    side here exists only to audit the sketch at test scale.

    The 6-row sketch output is localCheckpoint'd EAGERLY before the
    audit join: the GK merge is shuffle-arrival-order sensitive, so
    re-evaluating the agg subtree in two plan branches and rejoining on
    the float approx_value could silently drop rows on an unlucky run;
    materializing once makes both branches read the same values. The
    bound itself is the two-sided RANK guarantee: some rank of the
    returned value must lie in [(q - eps)n, (q + eps)n], i.e. its
    min-rank (count of strictly-smaller values) can't sit above the
    window and its max-rank (count of <=) can't sit below it — a
    <=-only check would flag correct answers whenever the returned
    value is heavily tied.
    """
    ev = load(spark, sf_dir, "events")
    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    accuracy = 1000
    out = (
        ev.agg(
            F.percentile_approx("value", qs, accuracy).alias("approx"),
            F.expr(
                f"percentile(value, array({','.join(map(str, qs))}))"
            ).alias("exact"),
        )
        .select(F.posexplode(F.arrays_zip("approx", "exact")).alias("i", "pair"))
        .select(
            F.element_at(
                F.array(*[F.lit(q) for q in qs]), F.col("i") + 1
            ).alias("q"),
            F.col("pair.approx").alias("approx_value"),
            F.col("pair.exact").cast("double").alias("exact_value"),
        )
        # EAGER on purpose (r15 lazy sweep deliberately skips this
        # one): the GK agg is shuffle-arrival-order sensitive and this
        # frame is read by two branches of ONE action — under a lazy
        # cut, two racing stages on a cluster could each compute-and-
        # cache divergent copies; materializing first removes the race.
        .localCheckpoint(eager=True)
    )
    eps = F.lit(1.0) / accuracy
    ranks = (
        ev.select("value")
        .crossJoin(F.broadcast(out.select("q", "approx_value")))
        .groupBy("q", "approx_value")
        .agg(
            F.sum(
                F.when(F.col("value") < F.col("approx_value"), 1).otherwise(0)
            ).alias("_lt"),
            F.sum(
                F.when(F.col("value") <= F.col("approx_value"), 1).otherwise(0)
            ).alias("_le"),
            F.count(F.lit(1)).alias("_n"),
        )
    )
    slack = F.lit(1.0) / F.col("_n")
    return (
        out.join(F.broadcast(ranks), ["q", "approx_value"])
        .withColumn(
            "within_bound",
            (F.col("_lt") / F.col("_n") <= F.col("q") + eps + slack)
            & (F.col("_le") / F.col("_n") >= F.col("q") - eps - slack),
        )
        .select(
            "q",
            "approx_value",
            "exact_value",
            F.round(F.col("_le") / F.col("_n"), 6).alias("approx_cdf"),
            "within_bound",
        )
    )


_WINSORIZE_ORACLE = """
WITH bounds AS (
  SELECT event_type,
         quantile_cont(value, 0.05) AS lo,
         quantile_cont(value, 0.95) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_raw,
       CAST(SUM(CAST(least(greatest(e.value, b.lo), b.hi)
                     AS DECIMAL(12,2))) AS DOUBLE) AS sum_winsorized,
       CAST(SUM(CASE WHEN e.value < b.lo OR e.value > b.hi
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
FROM events e JOIN bounds b USING (event_type)
GROUP BY e.event_type
"""


@query("events_value_winsorized", _WINSORIZE_ORACLE)
def events_value_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization — the outlier-clipping every feature /
    quality pipeline runs before aggregating heavy-tailed signals: exact
    p05/p95 per event_type, values clipped into the band, raw vs
    clipped sums side by side. The per-GROUP percentile joined back to
    the rows is the shape the global-quantile queries don't cover.

    Determinism: percentile() interpolates exactly like DuckDB's
    quantile_cont on the same doubles; the clip (least/greatest) is
    exact; both sums go through DECIMAL so no float summation order
    leaks. Clipped values are percentile outputs — rounding them would
    diverge, DECIMAL(12,2) cast truncation is identical in both
    engines only because the inputs are 2-decimal values or exact
    percent interpolations thereof.

    Scale: bounds is a per-group exact-percentile aggregate (sorted
    per group — the documented exact-quantile cost; swap in
    percentile_approx at 100 TB), broadcast back onto the fact rows;
    one shuffle for bounds, one map-side-combined final aggregate.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    outlier = (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi"))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_raw"),
            F.sum(clipped.cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_winsorized"),
            F.sum(F.when(outlier, 1).otherwise(0)).cast("long").alias("n_clipped"),
        )
    )


_EWMA_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
), rec AS (
  SELECT event_type, day, n, i, n * 1000000000 AS s9
  FROM seq WHERE i = 1
  UNION ALL
  SELECT q.event_type, q.day, q.n, q.i,
         (3 * q.n * 1000000000 + 7 * r.s9 + 5) // 10
  FROM seq q JOIN rec r ON q.event_type = r.event_type AND q.i = r.i + 1
)
SELECT event_type, day, n,
       CAST(s9 AS DOUBLE) / 1000000000.0 AS ewma
FROM rec
"""


@query("events_ewma_daily", _EWMA_ORACLE)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of daily event volume —
    the sequential RECURRENCE (s_t = a*x_t + (1-a)*s_{t-1}) that window
    frames cannot express: the oracle replays it as a recursive CTE,
    the engine as ONE ordered fold per series (array_sort +
    F.aggregate) emitting every timestep. The recurrence runs in
    SCALED INTEGERS (s9 = ewma * 10^9; half-up integer step) — no
    float op feeds the next step, so the sequence is bit-exact in any
    engine; only the final display division touches doubles. (A
    round(double, 9)-per-step formulation differed from DuckDB in the
    last decimal under strict full-repr comparison — engines' double
    rounding disagrees at ulp scale; integers cannot.)

    Scale: the fold's state is one series' daily points — the series is
    an AGGREGATE (one row per (type, day)), bounded by the calendar,
    not by event count; the heavy work (daily counts) is a map-side
    combined groupBy. A million-key series set folds in parallel, one
    row per series.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    xs = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("_xs")
    )

    def step(acc, x):
        prev = F.try_element_at(acc, F.lit(-1))["s9"]
        # half-up integer step: (3*n*1e9 + 7*s9 + 5) div 10, computed
        # as (num - num mod 10) / 10 so the double division is over an
        # exact multiple of 10 (exact below 2^53 — daily counts up to
        # ~1e5 stay 1000x inside that)
        num = x["n"] * F.lit(3000000000) + prev * F.lit(7) + F.lit(5)
        s9 = ((num - F.pmod(num, F.lit(10))) / F.lit(10)).cast("long")
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["n"].alias("n"),
                    F.when(
                        F.size(acc) == 0, x["n"] * F.lit(1000000000)
                    )
                    .otherwise(s9)
                    .alias("s9"),
                )
            ),
        )

    folded = F.aggregate(
        "_xs",
        F.array().cast("array<struct<day:date,n:bigint,s9:bigint>>"),
        step,
    )
    return (
        xs.select("event_type", F.explode(folded).alias("_r"))
        .select(
            "event_type",
            "_r.day",
            "_r.n",
            (F.col("_r.s9").cast("double") / F.lit(1000000000.0)).alias(
                "ewma"
            ),
        )
    )


_ROLLING_MEDIAN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       CAST(median(n) OVER (PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
         AS DOUBLE) AS med7
FROM daily
"""


@query("events_rolling_median", _ROLLING_MEDIAN_ORACLE)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling EXACT median of daily volume per event
    type — an order-statistic over an interval RANGE frame (robust
    baseline for spike detection; the mean-based anomaly queries are
    skew-sensitive, the median is not). Exact percentile over integer
    counts interpolates identically in both engines.

    Scale: the window partitions by event type over the DAILY aggregate
    (calendar-bounded rows per series), never over raw events; the
    daily counts themselves are one map-side combined groupBy.
    """
    from pyspark.sql import Window

    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, 0)
    )
    return daily.select(
        "event_type",
        "day",
        "n",
        F.percentile(F.col("n"), F.lit(0.5)).over(w).alias("med7"),
    )


def _kmv_oracle() -> str:
    k, m = 16, float(1 << 48)
    return f"""
WITH eh AS (
  SELECT DISTINCT event_type,
         try_cast('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
                  AS BIGINT) AS h
  FROM events
), rk AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
  FROM eh
), sk AS (
  SELECT event_type, list(h ORDER BY h) AS sketch
  FROM rk WHERE rk <= {k} GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS set_a, b.event_type AS set_b,
         a.sketch AS ska, b.sketch AS skb,
         list_slice(list_sort(list_distinct(flatten([a.sketch, b.sketch]))),
                    1, {k}) AS m
  FROM sk a JOIN sk b ON a.event_type < b.event_type
), est AS (
  SELECT set_a, set_b, ska, skb, m,
         CASE WHEN len(m) < {k} THEN CAST(len(m) AS DOUBLE)
              ELSE round({float(k - 1)} * {m} / m[least({k}, len(m))], 4)
         END AS est_union
  FROM pairs
), est2 AS (
  SELECT set_a, set_b, est_union,
         round(len([x FOR x IN m
                    IF list_contains(ska, x) AND list_contains(skb, x)])
               * est_union / len(m), 4) AS est_intersection
  FROM est
), inter AS (
  SELECT a.event_type AS set_a, b.event_type AS set_b,
         count(*) AS exact_intersection
  FROM eh a JOIN eh b ON a.h = b.h AND a.event_type < b.event_type
  GROUP BY 1, 2
), cnt AS (
  SELECT event_type, count(*) AS n FROM eh GROUP BY 1
)
SELECT e.set_a, e.set_b, e.est_union, e.est_intersection,
       CAST(ca.n + cb.n - coalesce(i.exact_intersection, 0) AS BIGINT)
         AS exact_union,
       CAST(coalesce(i.exact_intersection, 0) AS BIGINT)
         AS exact_intersection,
       abs(e.est_union - (ca.n + cb.n - coalesce(i.exact_intersection, 0)))
         / (ca.n + cb.n - coalesce(i.exact_intersection, 0))
         <= {3.0 / (k ** 0.5)} AS within_bound
FROM est2 e
LEFT JOIN inter i ON e.set_a = i.set_a AND e.set_b = i.set_b
JOIN cnt ca ON ca.event_type = e.set_a
JOIN cnt cb ON cb.event_type = e.set_b
"""


@query("audience_overlap_kmv", _kmv_oracle())
def audience_overlap_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct sketches with set-algebra estimators
    (operators/sketches.py): per event-type user sketches (k=16
    smallest md5-derived hashes), pairwise union/intersection ESTIMATES
    — the O(k) audience-overlap primitive — alongside the exact audit
    counts and a `within_bound` gate. Every estimator value is
    deterministic md5 arithmetic, so unlike most sketches this one is
    fully hash-checked against the oracle, estimation error and all.
    """
    from ..operators.sketches import kmv_hash, kmv_overlap, kmv_sketches

    ev = load(spark, sf_dir, "events")
    sketches = kmv_sketches(ev, "event_type", "user_id", k=16)
    exact = ev.select(
        "event_type", kmv_hash(F.col("user_id")).alias("_h")
    ).distinct()
    return kmv_overlap(sketches, exact, "event_type", k=16)


_SEASONAL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), dow AS (
  SELECT event_type, day, n, dayofweek(day) AS dw FROM daily
), seas AS (
  SELECT event_type, dw,
         (2 * SUM(n) * 1000000 + count(*)) // (2 * count(*)) AS dm6
  FROM dow GROUP BY event_type, dw
)
SELECT d.event_type, d.day, d.n,
       CAST(s.dm6 AS DOUBLE) / 1000000.0 AS dow_mean,
       CAST(d.n * 1000000 - s.dm6 AS DOUBLE) / 1000000.0 AS residual
FROM dow d JOIN seas s ON d.event_type = s.event_type AND d.dw = s.dw
"""


@query("events_seasonal_decomposition", _SEASONAL_ORACLE)
def events_seasonal_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-seasonal decomposition of daily volume: per (event type,
    day-of-week) mean as the seasonal component, residual = actual -
    seasonal — the deseasonalized series anomaly detectors should run
    on (a Monday spike is only a spike relative to Mondays). The means
    are half-up SCALED-INTEGER divisions (micro-units) — engines
    disagree on decimal/double division semantics at ulp scale under
    strict full-repr comparison; integer arithmetic cannot.

    Scale: the seasonal table is (types x 7) rows — broadcast; the
    daily aggregate is the only corpus-sized pass.
    """
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dw", F.dayofweek("day"))
    )
    # half-up scaled-integer mean (dm6 = mean * 10^6): engines disagree
    # on decimal-vs-double division semantics, integers cannot — the
    # same rule as the EWMA recurrence
    seas = daily.groupBy("event_type", "dw").agg(
        F.expr(
            "(2 * sum(n) * 1000000 + count(*)) div (2 * count(*))"
        ).alias("_dm6")
    )
    return daily.join(F.broadcast(seas), ["event_type", "dw"]).select(
        "event_type",
        "day",
        "n",
        (F.col("_dm6").cast("double") / F.lit(1000000.0)).alias("dow_mean"),
        (
            (F.col("n") * F.lit(1000000) - F.col("_dm6")).cast("double")
            / F.lit(1000000.0)
        ).alias("residual"),
    )


_ATTRIBUTION_ORACLE = """
WITH purchases AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
), touch AS (
  SELECT p.event_id,
         first(e.event_type ORDER BY e.ts, e.event_id) AS channel
  FROM purchases p
  JOIN events e
    ON e.user_id = p.user_id
   AND e.ts >= p.ts - INTERVAL 7 DAY
   AND e.ts < p.ts
  GROUP BY p.event_id
)
SELECT t.channel, count(*) AS n_purchases,
       CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM purchases p JOIN touch t ON p.event_id = t.event_id
GROUP BY t.channel
"""


@query("purchase_first_touch_attribution", _ATTRIBUTION_ORACLE)
def purchase_first_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """First-touch attribution: every purchase credits the user's
    EARLIEST event in the trailing 7 days — the equi-keyed band join
    (user id carries the shuffle, the time interval rides as residual)
    followed by ONE min_by per purchase, no per-user sort, no window
    over raw events. Deterministic tie-break (ts, event_id); revenue is
    the DECIMAL-exact discipline.

    Scale: same join shape as events_preceding_hour_range_join —
    shuffles on user_id only; the min_by aggregate is map-side
    combinable; the final rollup is |channels| rows.
    """
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    # fresh column names for the probe side: purchases derives from the
    # same scan, so raw ev columns would be ambiguous after the join
    probe = ev.select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
        F.col("event_id").alias("e_id"),
        F.col("event_type").alias("e_type"),
    )
    touch = (
        purchases.join(
            probe,
            (F.col("e_user") == F.col("p_user"))
            & (F.col("e_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
            & (F.col("e_ts") < F.col("p_ts")),
        )
        .groupBy("p_id", "p_value")
        .agg(
            F.min_by(
                F.col("e_type"), F.struct(F.col("e_ts"), F.col("e_id"))
            ).alias("channel")
        )
    )
    return touch.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.col("p_value").cast("decimal(12,2)"))
        .cast("double")
        .alias("revenue"),
    )


_TXLOG_ZORDER_ORACLE = """
SELECT count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE value >= 50 AND value <= 120 AND event_type = 'click'
"""


@query("events_txlog_zorder_scan", _TXLOG_ZORDER_ORACLE)
def events_txlog_zorder_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering INSIDE the ACID table format (txlog
    append_zordered): events land Morton-clustered on (value num,
    event_type hash) with the bucket id as per-file partition metadata
    in the commit log; a (value box AND event_type equality) query then
    prunes FILES driver-side from the log's ZorderMeta before any I/O,
    and the residual row filter restores exactness — the oracle is the
    plain filter over the raw table, so the hash gate proves the
    superset-prune-plus-residual contract end to end.

    Scale: the prune is pure integer math over the commit log (no file
    listing, no footer reads); the scan reads only the candidate
    buckets' files — multi-dimensional pruning that single-column range
    clustering cannot express."""
    import os as _os
    import shutil as _shutil

    from ..sources import txlog

    ev = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    base = _os.path.join(
        artifact_root("txlog"), _os.path.basename(_os.path.normpath(sf_dir))
    )
    table = _os.path.join(base, "events_zx")
    _shutil.rmtree(table, ignore_errors=True)
    txlog.append_zordered(
        ev,
        table,
        cluster_by=["value", "event_type"],
        kinds=["num", "hash"],
        n_buckets=64,
    )
    pruned = txlog.read_zordered(
        spark,
        table,
        box={"value": (50.0, 120.0)},
        eq={"event_type": "click"},
    )
    return (
        pruned.filter(
            (F.col("value") >= 50)
            & (F.col("value") <= 120)
            & (F.col("event_type") == "click")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


_TXLOG_ORACLE = """
SELECT 0 AS version, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events WHERE event_id % 3 = 0
UNION ALL
SELECT 1, count(*), CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
FROM events WHERE event_id % 3 IN (0, 1)
UNION ALL
SELECT 2, count(*), CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
FROM events WHERE event_id % 3 = 2
"""


@query("events_txlog_time_travel", _TXLOG_ORACLE)
def events_txlog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID table layer end-to-end: append (v0), append (v1), then
    OVERWRITE (v2) an events slice through the transaction-log table
    format (sources/txlog.py), then time-travel every version and
    aggregate each snapshot. The oracle recomputes the three snapshots
    straight from the source table — equality proves the commit log
    isolates versions exactly (v1 readers never see the overwrite; v2
    readers never double-count the appends).

    Scale: the log is driver-side metadata (3 tiny JSON commits); the
    data writes/reads are ordinary distributed parquet jobs; snapshot
    replay cost is bounded by checkpoints at table age."""
    import os as _os
    import shutil as _shutil

    from ..sources import txlog

    ev = load(spark, sf_dir, "events")
    base = _os.path.join(
        artifact_root("txlog"), _os.path.basename(_os.path.normpath(sf_dir))
    )
    table = _os.path.join(base, "events_tx")
    _shutil.rmtree(table, ignore_errors=True)
    txlog.append(ev.filter(F.col("event_id") % 3 == 0), table)
    txlog.append(ev.filter(F.col("event_id") % 3 == 1), table)
    txlog.overwrite(ev.filter(F.col("event_id") % 3 == 2), table)
    out = None
    for v in (0, 1, 2):
        snap = (
            txlog.read_table(spark, table, version=v)
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(12,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .select(F.lit(v).alias("version"), "n", "total_value")
        )
        out = snap if out is None else out.unionByName(snap)
    return out


_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n
  FROM events GROUP BY event_type, day
), tot AS (
  SELECT event_type, SUM(n) AS t, COUNT(*) AS d FROM daily GROUP BY event_type
), dev AS (
  SELECT daily.event_type, day, n,
         SUM(n * tot.d - tot.t) OVER (
           PARTITION BY daily.event_type ORDER BY day) AS s,
         tot.t, tot.d
  FROM daily JOIN tot USING (event_type)
)
SELECT event_type, day, n,
       CAST((s * 1000000) // (t * d) AS BIGINT) AS drift_ppm,
       CASE WHEN abs(s) * 20 > 3 * t * d THEN 1 ELSE 0 END AS flag
FROM dev
"""


@query("events_cusum_drift", _CUSUM_ORACLE)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM-style volume-drift detection per event type: the running
    sum of (daily count minus the type's mean daily count), kept as the
    EXACT integer numerator n*D - T (D days, T total events — no float
    mean ever enters the recurrence). drift = S/(T*D) measures
    "fraction of volume so far minus fraction of days so far" in
    [-1, 1]; |drift| > 0.15 flags a sustained shift (a change point in
    the arrival rate), reported in exact ppm.

    Scale: one map-side-combined daily aggregate, a tiny per-type
    totals join (broadcast), and a cumulative window over ~days rows
    per type — never over raw events."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = daily.groupBy("event_type").agg(
        F.sum("n").alias("t"), F.count(F.lit(1)).alias("d")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dev = daily.join(F.broadcast(tot), "event_type").withColumn(
        "s", F.sum(F.col("n") * F.col("d") - F.col("t")).over(w)
    )
    return dev.select(
        "event_type",
        "day",
        "n",
        F.expr("CAST((s * 1000000) div (t * d) AS BIGINT)").alias("drift_ppm"),
        F.when(F.abs("s") * 20 > 3 * F.col("t") * F.col("d"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("flag"),
    )


_MAD_ORACLE = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), dev AS (
  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS d
  FROM events e JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       ROUND(max(dev.med), 6) AS median_value,
       ROUND(max(mad.mad), 6) AS mad,
       count(*) AS n,
       CAST(SUM(CASE WHEN dev.d > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_anomalies
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


@query("events_mad_anomalies", _MAD_ORACLE)
def events_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counts via Median Absolute Deviation: values more
    than 3 robust sigmas (1.4826*MAD) from their type's median — the
    outlier detector that, unlike the mean+2sigma spike query, is not
    itself corrupted by the outliers it hunts.

    Scale: two exact-percentile passes over per-type groups with the
    tiny per-type medians broadcast back; at 100 TB swap the exact
    percentile for the mergeable sketch (events_value_quantiles_approx)
    without changing the shape."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.percentile("d", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("median_value"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("d") > F.lit(3) * F.lit(1.4826) * F.col("mad"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_anomalies"),
        )
    )


_COOCCUR_ORACLE = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
), n AS (
  SELECT count(DISTINCT l_orderkey) AS total FROM ob
), bc AS (
  SELECT p_brand, count(*) AS nb FROM ob GROUP BY p_brand
), pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
  FROM ob a JOIN ob b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
)
SELECT brand_a, brand_b, n_ab,
       ROUND(CAST(n_ab AS DOUBLE) * n.total / (ca.nb * cb.nb), 6) AS lift
FROM pairs
JOIN bc ca ON ca.p_brand = pairs.brand_a
JOIN bc cb ON cb.p_brand = pairs.brand_b
CROSS JOIN n
ORDER BY n_ab DESC, brand_a, brand_b
LIMIT 20
"""


@query("brand_cooccurrence_lift", _COOCCUR_ORACLE)
def brand_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis (the A-priori 2-itemset step): brand
    pairs bought in the same order, with lift = P(a,b)/(P(a)P(b)) from
    exact integer counts — association mining over the fact spine.

    Scale: the basket table (distinct order x brand) self-joins on the
    order key — the standard co-occurrence shuffle, bounded by
    brands-per-order squared per basket, never |orders|^2; brand
    marginals and the order total are broadcast scalars; top-20 is
    TakeOrderedAndProject on a total order."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    total = ob.agg(F.count_distinct("l_orderkey").alias("total"))
    bc = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("nb"))
    a = ob.select(F.col("l_orderkey"), F.col("p_brand").alias("brand_a"))
    b = ob.select(F.col("l_orderkey").alias("_ok"), F.col("p_brand").alias("brand_b"))
    pairs = (
        a.join(b, (a.l_orderkey == b._ok) & (F.col("brand_a") < F.col("brand_b")))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    ca = bc.select(F.col("p_brand").alias("brand_a"), F.col("nb").alias("na"))
    cb = bc.select(F.col("p_brand").alias("brand_b"), F.col("nb").alias("nbb"))
    return (
        pairs.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cb), "brand_b")
        .crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("total")
                / (F.col("na") * F.col("nbb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), "brand_a", "brand_b")
        .limit(20)
    )


_TRANSITION_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next
  FROM events
), t AS (
  SELECT event_type AS src, next AS dst, count(*) AS n
  FROM seq WHERE next IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT src, SUM(n) AS tn FROM t GROUP BY src
)
SELECT src, dst, n, ROUND(CAST(n AS DOUBLE) / tn, 6) AS p
FROM t JOIN tot USING (src)
"""


@query("events_transition_matrix", _TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) from exact pair counts —
    the path-analysis primitive behind funnels and next-action models.

    Scale: one shuffle on user_id for the lead() window; the |types|^2
    transition table is tiny; probabilities divide two exact integers
    once."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("next", F.lead("event_type").over(w))
    t = (
        seq.filter(F.col("next").isNotNull())
        .groupBy(F.col("event_type").alias("src"), F.col("next").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = t.groupBy("src").agg(F.sum("n").alias("tn"))
    return t.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n",
        F.round(F.col("n").cast("double") / F.col("tn"), 6).alias("p"),
    )


_HOLT_ORACLE = """
WITH RECURSIVE daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
), seq AS (
  SELECT event_type, day, n,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
  FROM daily
), rec AS (
  SELECT event_type, day, n, i,
         n * 1000000000 AS l9, CAST(0 AS BIGINT) AS b9
  FROM seq WHERE i = 1
  UNION ALL
  SELECT q.event_type, q.day, q.n, q.i,
         (x.lnum - ((x.lnum % 10) + 10) % 10) // 10 AS l9,
         (x.bnum0 - ((x.bnum0 % 10) + 10) % 10) // 10 AS b9
  FROM seq q
  JOIN rec r ON q.event_type = r.event_type AND q.i = r.i + 1
  CROSS JOIN LATERAL (
    SELECT 3 * q.n * 1000000000 + 7 * (r.l9 + r.b9) + 5 AS lnum,
           ((3 * q.n * 1000000000 + 7 * (r.l9 + r.b9) + 5
             - ((3 * q.n * 1000000000 + 7 * (r.l9 + r.b9) + 5) % 10 + 10) % 10)
            // 10 - r.l9) + 9 * r.b9 + 5 AS bnum0
  ) x
)
SELECT event_type, day, n,
       CAST(l9 AS DOUBLE) / 1000000000.0 AS level,
       CAST(b9 AS DOUBLE) / 1000000000.0 AS trend,
       CAST(l9 + b9 AS DOUBLE) / 1000000000.0 AS forecast_next
FROM rec
"""


@query("events_holt_forecast", _HOLT_ORACLE)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend,
    alpha=0.3, beta=0.1) of daily volume per event type, with the
    one-step-ahead forecast — the trend-aware extension of the EWMA
    recurrence. Both states run in SCALED INTEGERS (x10^9) with an
    explicit FLOOR-division step: trends go NEGATIVE, and Spark's `div`
    truncates toward zero while DuckDB's `//` floors — so the step is
    written as (num - nonneg_mod(num,10))/10 in both engines, which is
    floor for either sign and exact (the dividend is a multiple of 10).
    The oracle replays the two-state recurrence as a recursive CTE.

    Scale: identical to the EWMA fold — one ordered fold per series
    over the calendar-bounded daily aggregate."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    xs = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "n"))).alias("_xs")
    )

    def fdiv10(num):
        return ((num - F.pmod(num, F.lit(10))) / F.lit(10)).cast("long")

    def step(acc, x):
        prev = F.try_element_at(acc, F.lit(-1))
        lp, bp = prev["l9"], prev["b9"]
        lnum = x["n"] * F.lit(3_000_000_000) + (lp + bp) * F.lit(7) + F.lit(5)
        l9 = fdiv10(lnum)
        bnum = (l9 - lp) + bp * F.lit(9) + F.lit(5)
        b9 = fdiv10(bnum)
        seeded = F.size(acc) == 0
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["n"].alias("n"),
                    F.when(seeded, x["n"] * F.lit(1_000_000_000))
                    .otherwise(l9)
                    .alias("l9"),
                    F.when(seeded, F.lit(0).cast("long"))
                    .otherwise(b9)
                    .alias("b9"),
                )
            ),
        )

    folded = F.aggregate(
        "_xs",
        F.array().cast("array<struct<day:date,n:bigint,l9:bigint,b9:bigint>>"),
        step,
    )
    return (
        xs.select("event_type", F.explode(folded).alias("_r"))
        .select(
            "event_type",
            "_r.day",
            "_r.n",
            (F.col("_r.l9").cast("double") / F.lit(1e9)).alias("level"),
            (F.col("_r.b9").cast("double") / F.lit(1e9)).alias("trend"),
            ((F.col("_r.l9") + F.col("_r.b9")).cast("double") / F.lit(1e9)).alias(
                "forecast_next"
            ),
        )
    )


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
  FROM events WHERE event_type IN ('purchase', 'signup')
  GROUP BY 1, 2
), bounds AS (
  SELECT event_type, min(day) AS lo, max(day) AS hi FROM daily GROUP BY 1
), spine AS (
  SELECT event_type, CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), joined AS (
  SELECT s.event_type, s.day,
         coalesce(d.n, 0) AS n,
         d.total_value,
         CASE WHEN d.n IS NULL THEN 1 ELSE 0 END AS is_gap
  FROM spine s LEFT JOIN daily d USING (event_type, day)
)
SELECT event_type, day, n, is_gap,
       coalesce(total_value, 0.0) AS total_value,
       last_value(total_value IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM joined
"""


@query("events_daily_gapfill", _GAPFILL_ORACLE)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling + last-observation-carried-forward: a date
    spine (generated per type from its min/max day) left-joins the
    daily rollup, so silent days materialize as explicit zero rows
    (is_gap=1) and the LOCF window carries the last seen value across
    them — the resample/ffill primitive time-series consumers assume
    exists.

    Scale: the spine is generated from a per-type bounds aggregate
    (tiny), the join and window run over calendar-bounded rollup rows,
    never raw events."""
    daily = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    spine = bounds.select(
        "event_type",
        F.explode(F.sequence("lo", "hi")).alias("day"),
    )
    joined = spine.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n", F.lit(0)).alias("n"),
        "total_value",
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_gap"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "day",
        "n",
        "is_gap",
        F.coalesce("total_value", F.lit(0.0)).alias("total_value"),
        F.last("total_value", ignorenulls=True).over(w).alias("locf_value"),
    )


_TXMUTATE_ORACLE = """
WITH upd AS (
  SELECT event_id, ts, user_id, event_type,
         CAST(CAST(value AS DECIMAL(12,2)) + 1000 AS DOUBLE) AS value, props
  FROM events WHERE event_id % 97 = 0
), base AS (
  SELECT * FROM events
  WHERE event_type <> 'error' AND event_id % 97 <> 0
), final AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd
)
SELECT event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total_value
FROM final GROUP BY event_type
"""


@query("events_txlog_delete_upsert", _TXMUTATE_ORACLE)
def events_txlog_delete_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID mutations end-to-end under the hash gate: load events into
    a txlog table, DELETE every 'error' row (copy-on-write), then MERGE
    an update set (value + 1000 for event_id % 97 == 0 — keys deleted
    by the first step come back as INSERTS, surviving keys are
    REPLACED), and aggregate the final snapshot. The oracle recomputes
    the post-mutation state straight from the source table — equality
    proves delete and merge semantics exactly (no lost rows, no
    duplicated keys, updates visible).

    Scale: both mutations are file-granular copy-on-write commits; the
    merge's update side broadcasts."""
    import os as _os
    import shutil as _shutil

    from ..sources import txlog

    ev = load(spark, sf_dir, "events")
    base = _os.path.join(
        artifact_root("txlog"), _os.path.basename(_os.path.normpath(sf_dir))
    )
    table = _os.path.join(base, "events_mutate")
    _shutil.rmtree(table, ignore_errors=True)
    txlog.append(ev, table, stats_cols=["event_id"])
    txlog.delete_where(spark, table, "event_type = 'error'",
                       stats_cols=["event_id"])
    updates = ev.filter(F.col("event_id") % 97 == 0).withColumn(
        "value",
        (F.col("value").cast("decimal(12,2)") + F.lit(1000)).cast("double"),
    )
    txlog.merge_upsert(spark, table, updates, ["event_id"],
                       stats_cols=["event_id"])
    return (
        txlog.read_table(spark, table)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


_CUMUSERS_ORACLE = """
WITH first_seen AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
), daily_new AS (
  SELECT first_day AS day, count(*) AS new_users FROM first_seen GROUP BY first_day
)
SELECT day, new_users,
       CAST(SUM(new_users) OVER (
              ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily_new
"""


@query("events_cumulative_users", _CUMUSERS_ORACLE)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-growth curve: daily NEW users (first-ever activity) and the
    running total — the exact cumulative-distinct that a naive
    count(DISTINCT) over an expanding window cannot express without
    quadratic rescans: min-day per user linearizes it.

    Scale: one groupBy(user) for first-seen, a calendar-bounded daily
    aggregate, and a cumulative window over ~days rows (single
    partition by construction, but over 10^2 rows, not events)."""
    ev = load(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    daily_new = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily_new.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


_ROLLING_ACTIVE_ORACLE = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), spine AS (
  SELECT DISTINCT day FROM user_days
)
SELECT s.day, count(DISTINCT u.user_id) AS active_7d
FROM spine s JOIN user_days u
  ON u.day <= s.day AND u.day > s.day - INTERVAL 7 DAY
GROUP BY s.day
"""


@query("events_rolling_active_users", _ROLLING_ACTIVE_ORACLE)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve): EXACT
    distinct users over a sliding window — windows can't count
    distinct, so the plan is a date-spine range join against the
    deduped (user, day) activity table.

    Scale: the range join is spine(days) x user-days bounded by 7
    rows per user-day; at 100 TB swap the exact distinct for the KMV
    sketch union (audience_overlap_kmv machinery) without changing
    the shape."""
    ev = load(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    spine = user_days.select("day").distinct()
    u = user_days.select(F.col("user_id"), F.col("day").alias("uday"))
    return (
        spine.join(
            u,
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") > F.date_sub(F.col("day"), 7)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


_FUNNEL_LATENCY_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
), conv AS (
  SELECT user_id,
         (epoch_us(first_purchase) - epoch_us(first_view)) // 1000000
           AS latency_s
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
)
SELECT count(*) AS n_converters,
       ROUND(CAST(quantile_cont(latency_s, 0.5) AS DOUBLE), 6) AS p50_s,
       ROUND(CAST(quantile_cont(latency_s, 0.9) AS DOUBLE), 6) AS p90_s,
       CAST(min(latency_s) AS BIGINT) AS min_s,
       CAST(max(latency_s) AS BIGINT) AS max_s
FROM conv
"""


@query("user_funnel_latency", _FUNNEL_LATENCY_ORACLE)
def user_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from a user's FIRST view
    to their FIRST subsequent purchase, summarized with exact
    percentiles — the latency companion to the conversion-rate funnel
    (user_funnel counts who converts; this measures how fast).

    Scale: one conditional-min aggregate per user (map-side combined,
    no per-user sort), then a single exact-percentile pass over the
    converter latencies."""
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    conv = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        # exact microsecond delta, ONE floor-div at the end: per-side
        # second truncation disagrees with the delta's by +-1s
        F.expr(
            "(unix_micros(CAST(first_purchase AS TIMESTAMP))"
            " - unix_micros(CAST(first_view AS TIMESTAMP))) div 1000000"
        ).alias("latency_s")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converters"),
        F.round(F.percentile("latency_s", 0.5), 6).alias("p50_s"),
        F.round(F.percentile("latency_s", 0.9), 6).alias("p90_s"),
        F.min("latency_s").alias("min_s"),
        F.max("latency_s").alias("max_s"),
    )


_SHIP_LATENCY_ORACLE = """
WITH lat AS (
  SELECT o_orderpriority,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate
)
SELECT o_orderpriority, count(*) AS n,
       ROUND(CAST(quantile_cont(days, 0.5) AS DOUBLE), 6) AS p50_days,
       ROUND(CAST(quantile_cont(days, 0.95) AS DOUBLE), 6) AS p95_days,
       CAST(max(days) AS BIGINT) AS max_days
FROM lat GROUP BY o_orderpriority
"""


@query("shipping_latency_stats", _SHIP_LATENCY_ORACLE)
def shipping_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency distribution per priority class (exact
    percentiles of day deltas) — the SLA-audit query over the fact
    spine.

    Scale: the one lineitem⋈orders shuffle, then exact percentiles per
    priority group (5 groups); swap in the GK sketch for the 100 TB
    single-pass variant."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    lat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
            )
            .cast("long")
            .alias("days"),
        )
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.percentile("days", 0.5), 6).alias("p50_days"),
        F.round(F.percentile("days", 0.95), 6).alias("p95_days"),
        F.max("days").alias("max_days"),
    )


_RFM_ORACLE = """
WITH rfm AS (
  SELECT o_custkey AS c_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   DATE '2001-09-01') AS recency_days,
         count(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT c_custkey, recency_days, frequency, monetary,
         ntile(4) OVER (ORDER BY recency_days ASC, c_custkey) AS r_score,
         ntile(4) OVER (ORDER BY frequency DESC, c_custkey) AS f_score,
         ntile(4) OVER (ORDER BY monetary DESC, c_custkey) AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score,
       count(*) AS n_customers,
       CAST(SUM(CAST(monetary AS DECIMAL(16,2))) AS DOUBLE) AS segment_value
FROM scored GROUP BY r_score, f_score, m_score
"""


@query("customer_rfm_segments", _RFM_ORACLE)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quartile scores for Recency (days
    since last order, anchored at the corpus horizon), Frequency and
    Monetary value, aggregated into the 4x4x4 segment grid — the
    classic CRM marketing cube. ntile runs over the PRE-AGGREGATED
    one-row-per-customer frame with full tie-break order, so quartile
    membership is deterministic.

    Scale: one groupBy(custkey) shuffle builds the RFM frame; the
    three quartile scores then come from ONE pass of
    operators/ranking.with_global_ntile over the metrics MELTED to
    long form (3 rows per customer, partition_cols=["_metric"]):
    range-repartition -> bounded prefix-offset window -> per-slice
    row_number + offset, bit-identical to ntile(4) over each total
    (metric, c_custkey) order but with NO single-partition WindowExec
    anywhere in the plan, and one range exchange + one offsets
    collect instead of the three of the r15-build shape (opt r15,
    guide §1.2/§2.4: the melt folds three identical plan skeletons
    into one that carries 3x the rows — same asymptotics, one fixed
    cost). Ordering equivalence of the melt: recency sorts asc
    unchanged; frequency/monetary sorted desc in the old shape sort
    as NEGATED doubles asc here (long/int counts and the decimal-sum
    cast are exact in double, negation of finite doubles is exact and
    order-reversing, and Spark normalizes -0.0 == 0.0 in sort keys),
    with the identical c_custkey asc tiebreak."""
    from ..operators.ranking import with_global_ntile

    orders = load(spark, sf_dir, "orders")
    rfm = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.datediff(
            F.lit("2001-09-01").cast("date"), F.max("o_orderdate").cast("date")
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(_dec("o_totalprice", 14)).cast("double").alias("monetary"),
    )
    melted = rfm.select(
        "c_custkey",
        "monetary",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("_metric"),
                    F.col("recency_days").cast("double").alias("_v"),
                ),
                F.struct(
                    F.lit("f").alias("_metric"),
                    (-F.col("frequency")).cast("double").alias("_v"),
                ),
                F.struct(
                    F.lit("m").alias("_metric"),
                    (-F.col("monetary")).alias("_v"),
                ),
            )
        ).alias("_mv"),
    ).select(
        "c_custkey", "monetary", F.col("_mv._metric").alias("_metric"),
        F.col("_mv._v").alias("_v"),
    )
    scored_long = with_global_ntile(
        melted,
        4,
        [F.asc("_v"), F.asc("c_custkey")],
        "_score",
        partition_cols=["_metric"],
    )
    # un-melt with one conditional aggregation (no pivot, no join —
    # a single consumer of the ranked frame); monetary rides every
    # melted row of its customer, so max() recovers it exactly
    scored = scored_long.groupBy("c_custkey").agg(
        F.max(F.when(F.col("_metric") == "r", F.col("_score"))).alias(
            "r_score"
        ),
        F.max(F.when(F.col("_metric") == "f", F.col("_score"))).alias(
            "f_score"
        ),
        F.max(F.when(F.col("_metric") == "m", F.col("_score"))).alias(
            "m_score"
        ),
        F.max("monetary").alias("monetary"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("monetary").cast("decimal(16,2)"))
        .cast("double")
        .alias("segment_value"),
    )


_HISTOGRAM_ORACLE = """
WITH bounds AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
), binned AS (
  SELECT LEAST(19, CAST(floor((value - lo) * 20 / (hi - lo)) AS BIGINT)) AS bin,
         lo, hi
  FROM events CROSS JOIN bounds
)
SELECT bin, count(*) AS n,
       ROUND(CAST(min(lo) + bin * (min(hi) - min(lo)) / 20 AS DOUBLE), 6)
         AS bin_lo
FROM binned GROUP BY bin
"""


@query("events_value_histogram", _HISTOGRAM_ORACLE)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of event values with bin lower
    bounds — the profiling primitive behind distribution plots. Bin
    assignment divides identical doubles in one fixed expression, so
    edge rows bin identically in both engines; the top value clamps
    into the last bin.

    Scale: one tiny min/max aggregate broadcast back, then one
    map-side-combined groupBy over <= 20 keys."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.lit(19),
            F.floor((F.col("value") - F.col("lo")) * 20 / (F.col("hi") - F.col("lo")))
            .cast("long"),
        ).alias("bin"),
        "lo",
        "hi",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            (F.min("lo") + F.col("bin") * (F.min("hi") - F.min("lo")) / 20).cast(
                "double"
            ),
            6,
        ).alias("bin_lo"),
    )


_TREND_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
  FROM events GROUP BY 1, 2
), indexed AS (
  SELECT event_type, y,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
              AS BIGINT) AS x
  FROM daily
), moments AS (
  SELECT event_type,
         count(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM indexed GROUP BY event_type
)
SELECT event_type, n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope_per_day,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n, 6)
         AS intercept
FROM moments WHERE n >= 2
"""


@query("events_daily_trend", _TREND_ORACLE)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of daily volume by closed-form OLS: slope
    and intercept computed from EXACT integer moment sums
    (n, Σx, Σy, Σxy, Σx²) — regression without any iterative fitting,
    the one-pass pattern that scales to any number of series. The two
    divisions operate on already-identical doubles of exact integers.

    Scale: one daily rollup (map-side combined), a per-type row_number
    over calendar-bounded rows, then a 5-integer aggregate per
    series."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    indexed = daily.withColumn("x", (F.row_number().over(w) - 1).cast("long"))
    m = indexed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return m.filter(F.col("n") >= 2).select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope_per_day"),
        F.round(
            (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept"),
    )


_CHANGEPOINT_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS x FROM events GROUP BY 1
), pre AS (
  SELECT day,
         SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS s1,
         ROW_NUMBER() OVER (ORDER BY day) AS n1
  FROM daily
), tot AS (
  SELECT SUM(x) AS s, count(*) AS n FROM daily
), sc AS (
  SELECT day, n1, t.n - n1 AS n2, s1, t.s - s1 AS s2,
         CAST(s1 * s1 * (t.n - n1) + (t.s - s1) * (t.s - s1) * n1 AS DOUBLE)
           / (n1 * (t.n - n1)) AS v,
         t.s AS s, t.n AS n
  FROM pre, tot t WHERE n1 < t.n
)
SELECT day AS split_day,
       CAST(n1 AS BIGINT) AS n_pre, CAST(n2 AS BIGINT) AS n_post,
       ROUND(CAST(s1 AS DOUBLE) / n1, 6) AS mean_pre,
       ROUND(CAST(s2 AS DOUBLE) / n2, 6) AS mean_post,
       ROUND(v - CAST(s AS DOUBLE) * s / n, 6) AS sse_gain
FROM sc ORDER BY v DESC, day LIMIT 1
"""


@query("events_changepoint", _CHANGEPOINT_ORACLE)
def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares changepoint detection on the daily event-count
    series: the split day s minimizing total within-segment SSE —
    binary segmentation's single step (Scott & Knott; the primitive
    CUSUM/PELT families iterate), the "did the level shift, and when"
    question behind deploy/incident forensics on log volume.

    Exact-arithmetic discipline: minimizing SSE(s) is maximizing
    V(s) = S1^2*n2 + S2^2*n1 (over n1*n2), where S/n are integer
    prefix sums/counts of the daily series. Every operand stays an
    exact integer below 2^53 (S^2*n at any plausible daily-count
    scale), so the ONE double division per candidate split is
    IEEE-identical in both engines and the argmax (ties -> earliest
    day) replays exactly; means and the SSE gain are derived from the
    same integers and rounded at display.

    Scale: the corpus collapses to one row per calendar DAY in the
    first map-side-combined aggregate; the global prefix-sum window
    and the top-1 run over that calendar-bounded frame (the
    events_cumulative_users boundedness argument — whitelisted in the
    plan audit with the same reason), and the result is a single
    row via TakeOrderedAndProject, never a global sort of facts."""
    daily = (
        load(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    pre = daily.select(
        "day",
        F.sum("x").over(w).alias("s1"),
        F.row_number().over(Window.orderBy("day")).alias("n1"),
    )
    tot = daily.agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n")
    )
    sc = (
        pre.crossJoin(F.broadcast(tot))
        .filter(F.col("n1") < F.col("n"))
        .withColumn("n2", F.col("n") - F.col("n1"))
        .withColumn("s2", F.col("s") - F.col("s1"))
        .withColumn(
            "v",
            (
                F.col("s1") * F.col("s1") * F.col("n2")
                + F.col("s2") * F.col("s2") * F.col("n1")
            ).cast("double")
            / (F.col("n1") * F.col("n2")),
        )
    )
    return (
        sc.orderBy(F.col("v").desc(), F.col("day").asc())
        .limit(1)
        .select(
            F.col("day").alias("split_day"),
            F.col("n1").cast("long").alias("n_pre"),
            F.col("n2").cast("long").alias("n_post"),
            F.round(F.col("s1").cast("double") / F.col("n1"), 6).alias("mean_pre"),
            F.round(F.col("s2").cast("double") / F.col("n2"), 6).alias("mean_post"),
            F.round(
                F.col("v")
                - F.col("s").cast("double") * F.col("s") / F.col("n"),
                6,
            ).alias("sse_gain"),
        )
    )

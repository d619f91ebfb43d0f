"""TF-IDF / centroid / anomaly queries: result sanity + plan shape.

Same contract as test_relational.py: the plan assertions pin the scale
properties (broadcast scalar join, top-k without global sort, no window
function in the anomaly path), not just the values.
"""

from __future__ import annotations

import math

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
    events_daily_anomalies,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
    embedding_centroids,
    tfidf_top_terms,
)


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_tfidf_topk_plan_and_monotonicity(spark, sf_dir):
    df = tfidf_top_terms(spark, sf_dir)
    plan = plan_of(df)
    # corpus-size scalar joins via broadcast, final 25 is top-k not sort
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == 25
    scores = [r.tfidf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.df <= r.total_tf  # a doc counts >=1 occurrence
        assert r.tfidf >= 0.0


def test_embedding_centroids_shape_and_unit_scale(spark, sf_dir):
    rows = embedding_centroids(spark, sf_dir).collect()
    labels = {r.label for r in rows}
    dims = {r.dim for r in rows}
    assert dims == set(range(64))
    assert len(rows) == len(labels) * 64
    # same n for every dim of a label (vectors are rectangular)
    n_by_label = {}
    for r in rows:
        n_by_label.setdefault(r.label, set()).add(r.n)
        assert abs(r.centroid) <= 1.0 + 1e-9  # unit-ish embedding space
    assert all(len(ns) == 1 for ns in n_by_label.values())


def test_events_daily_anomalies_exceed_threshold(spark, sf_dir):
    df = events_daily_anomalies(spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan  # per-type stats broadcast back
    assert "Window" not in plan  # moments via groupBy, not window funcs
    rows = df.collect()
    for r in rows:
        assert r.cnt > r.mean_cnt + 2 * r.std_cnt - 1e-6
        assert not math.isnan(r.std_cnt)


def test_user_funnel_enforces_event_order(spark, tmp_path):
    """A user who purchased BEFORE viewing must not count as converted —
    the funnel is strictly ordered, not a per-type existence check."""
    import datetime as dt

    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
        user_funnel,
    )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: proper view -> click -> purchase
        Row(event_id=1, ts=t(1), user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=t(2), user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=3, ts=t(3), user_id=1, event_type="purchase", value=1.0, props="{}"),
        # user 2: purchase first, then view+click -> stops at view>click
        Row(event_id=4, ts=t(1), user_id=2, event_type="purchase", value=1.0, props="{}"),
        Row(event_id=5, ts=t(2), user_id=2, event_type="view", value=1.0, props="{}"),
        Row(event_id=6, ts=t(3), user_id=2, event_type="click", value=1.0, props="{}"),
        # user 3: view only
        Row(event_id=7, ts=t(1), user_id=3, event_type="view", value=1.0, props="{}"),
        # user 4: click with no view -> not even in the funnel
        Row(event_id=8, ts=t(1), user_id=4, event_type="click", value=1.0, props="{}"),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")
    got = {r.stage: r for r in user_funnel(spark, sf).collect()}
    assert got["view"].users == 3
    assert got["view>click"].users == 2          # users 1 and 2
    assert got["view>click>purchase"].users == 1  # only user 1
    assert got["view>click>purchase"].conv_from_first == round(1 / 3, 6)


def test_retention_cohorts_triangle(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
        user_retention_cohorts,
    )

    def ev(i, day, user):
        return Row(event_id=i, ts=dt.datetime(2024, 1, day, 12), user_id=user,
                   event_type="view", value=1.0, props="{}")

    # week of 2024-01-01 (Mon): users 1,2 start; week of 01-08: user 1
    # returns, user 3 starts; week of 01-15: user 2 returns
    rows = [ev(1, 1, 1), ev(2, 2, 2), ev(3, 8, 1), ev(4, 9, 3), ev(5, 15, 2)]
    sf = str(tmp_path)
    spark.createDataFrame(rows).write.parquet(f"{sf}/events.parquet")
    got = {(str(r.cohort_week), r.week_offset): r
           for r in user_retention_cohorts(spark, sf).collect()}
    assert got[("2024-01-01", 0)].active_users == 2
    assert got[("2024-01-01", 0)].retention == 1.0
    assert got[("2024-01-01", 1)].active_users == 1  # user 1 back in wk2
    assert got[("2024-01-01", 1)].retention == 0.5
    assert got[("2024-01-01", 2)].active_users == 1  # user 2 back in wk3
    assert got[("2024-01-08", 0)].active_users == 1  # user 3's own cohort
    assert len(got) == 4


def test_kmv_exact_collapse_and_bound(spark):
    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
        kmv_hash,
        kmv_overlap,
        kmv_sketches,
    )

    # sets SMALLER than k: the sketch holds the whole hashed set, so
    # estimators collapse to exact values
    rows = [("A", i) for i in range(10)] + [("B", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "s string, u long")
    sk = kmv_sketches(df, "s", "u", k=64)
    exact = df.select("s", kmv_hash(F.col("u")).alias("_h")).distinct()
    out = kmv_overlap(sk, exact, "s", k=64).collect()[0]
    assert out.est_union == out.exact_union == 15
    assert out.est_intersection == out.exact_intersection == 5
    assert out.within_bound is True

    # sets larger than k: real estimation, bound holds on random-ish
    # (md5-hashed) elements
    big = [("A", i) for i in range(500)] + [("B", i) for i in range(250, 750)]
    dfb = spark.createDataFrame(big, "s string, u long")
    skb = kmv_sketches(dfb, "s", "u", k=32)
    exb = dfb.select("s", kmv_hash(F.col("u")).alias("_h")).distinct()
    ob = kmv_overlap(skb, exb, "s", k=32).collect()[0]
    assert ob.exact_union == 750 and ob.exact_intersection == 250
    assert ob.within_bound is True
    assert ob.est_union != ob.exact_union  # genuinely estimating


def test_pagerank_hub_concentration_and_determinism(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
        MASS,
        pagerank,
    )

    # star graph: everyone points at the hub, hub points at node 1
    edges = [(i, 0) for i in range(1, 8)] + [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r.node: r.pr_scaled for r in pagerank(df, n_iter=10).collect()}
    # the hub and its sole target trade mass in a 2-cycle (their order
    # oscillates with iteration parity by design); both must dominate
    # every plain leaf, and the leaves — receiving only teleport — are
    # exactly equal
    leaves = [out[i] for i in range(2, 8)]
    assert min(out[0], out[1]) > max(leaves)
    assert len(set(leaves)) == 1
    # floor divisions only ever LEAK mass; total never exceeds MASS
    assert sum(out.values()) <= MASS
    # layout-independence: bit-identical state under repartitioning
    out2 = {r.node: r.pr_scaled
            for r in pagerank(df.repartition(7), n_iter=10).collect()}
    assert out == out2


def test_batch_reassemble_lines_semantics(spark):
    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multiline import (
        reassemble_lines,
    )

    rows = [
        # s1: head + 2 frames, head alone, orphan-free
        ("s1", 1, "Boom happened"),
        ("s1", 2, "  at A"),
        ("s1", 3, "  at B"),
        ("s1", 4, "Second event"),
        # s2: begins mid-trace (orphans), then a head
        ("s2", 1, "  at Z"),
        ("s2", 2, "Fresh head"),
    ]
    df = spark.createDataFrame(rows, "logStream string, line_no long, line string")
    out = {(r.logStream, r.event_no): r for r in reassemble_lines(
        df, is_start=~F.col("line").startswith("  ")
    ).collect()}
    e1 = out[("s1", 1)]
    assert e1.head == "Boom happened"
    assert e1.block == "Boom happened\n  at A\n  at B"
    assert e1.n_lines == 3 and e1.orphan is False
    e2 = out[("s1", 2)]
    assert e2.block == "Second event" and e2.n_lines == 1
    orphan = out[("s2", 0)]
    assert orphan.orphan is True and orphan.head is None
    assert orphan.block == "  at Z"
    assert out[("s2", 1)].head == "Fresh head"

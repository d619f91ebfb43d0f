"""Round-10 second-pass analytics: Holt recurrence (incl. negative
trend floor-division parity with a pure-Python replay), MAD
robustness, transition-matrix row-stochasticity, co-occurrence lift."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import analytics  # noqa: F401
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import QUERIES


def _events_dir(spark, rows):
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows).write.parquet(os.path.join(d, "events.parquet"))
    return d


def _ev(i, ts, user, etype, value=1.0):
    return Row(event_id=i, ts=ts, user_id=user, event_type=etype,
               value=float(value), props="{}")


def test_holt_matches_python_replay_with_negative_trend(spark):
    import datetime

    # strictly DECREASING volume -> negative trend state exercises the
    # floor-division sign path (Spark div truncates, our step floors)
    rows = []
    i = 0
    for day, n in enumerate([100, 80, 60, 40, 20, 10]):
        for k in range(n):
            rows.append(_ev(i, datetime.datetime(2025, 1, day + 1, 12, 0, 0), 1, "a"))
            i += 1
    d = _events_dir(spark, rows)
    out = {str(r.day): (r.level, r.trend, r.forecast_next)
           for r in QUERIES["events_holt_forecast"](spark, d).collect()}

    def fdiv10(x):
        return (x - ((x % 10) + 10) % 10) // 10

    S = 10**9
    counts = [100, 80, 60, 40, 20, 10]
    l9, b9 = counts[0] * S, 0
    expect = [(l9, b9)]
    for n in counts[1:]:
        lnum = 3 * n * S + 7 * (l9 + b9) + 5
        l9n = fdiv10(lnum)
        b9n = fdiv10((l9n - l9) + 9 * b9 + 5)
        l9, b9 = l9n, b9n
        expect.append((l9, b9))
    assert b9 < 0  # the scenario really does go negative
    for day, (el9, eb9) in enumerate(expect):
        lev, tr, fc = out[f"2025-01-{day + 1:02d}"]
        assert abs(lev - el9 / S) < 1e-12
        assert abs(tr - eb9 / S) < 1e-12
        assert abs(fc - (el9 + eb9) / S) < 1e-12


def test_mad_is_robust_where_mean_sigma_is_not(spark):
    import datetime

    ts = datetime.datetime(2025, 1, 1, 12, 0, 0)
    # 99 values at 10, one huge outlier: MAD flags exactly the outlier
    rows = [_ev(i, ts, 1, "a", 10.0 + (i % 3) * 0.1) for i in range(99)]
    rows.append(_ev(99, ts, 1, "a", 10000.0))
    d = _events_dir(spark, rows)
    r = QUERIES["events_mad_anomalies"](spark, d).collect()[0]
    assert r.n == 100 and r.n_anomalies == 1
    assert abs(r.median_value - 10.1) < 0.2


def test_transition_matrix_rows_sum_to_one(spark):
    import datetime

    rows = []
    for u in range(5):
        for j, et in enumerate(["view", "click", "purchase", "view", "click"]):
            rows.append(_ev(u * 10 + j, datetime.datetime(2025, 1, 1, 8, j), u, et))
    d = _events_dir(spark, rows)
    out = QUERIES["events_transition_matrix"](spark, d).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.src, 0.0)
        by_src[r.src] += r.p
    for src, total in by_src.items():
        assert abs(total - 1.0) < 1e-6
    # the deterministic sequence: every view is followed by click
    probs = {(r.src, r.dst): r.p for r in out}
    assert probs[("view", "click")] == 1.0


def test_char_entropy_orders_degenerate_below_natural(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import llmops  # noqa: F401

    rows = [
        Row(doc_id=1, source="a", lang="en", n_chars=40, text="a" * 40),
        Row(doc_id=2, source="a", lang="en", n_chars=40,
            text="the quick brown fox jumps over the dog."),
        Row(doc_id=3, source="a", lang="en", n_chars=8, text="abababab"),
    ]
    d = tempfile.mkdtemp()
    spark.createDataFrame(rows).write.parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r for r in QUERIES["doc_char_entropy"](spark, d).collect()}
    assert out[1].entropy_bits == 0.0          # single symbol
    assert abs(out[3].entropy_bits - 1.0) < 1e-6  # two equal symbols = 1 bit
    assert out[2].entropy_bits > 3.0           # natural text


def test_fuzzy_blocking_equals_bruteforce(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.text import (
        fuzzy_token_pairs,
    )

    vocab = ["batch", "bach", "btch", "batch", "match", "window", "windo",
             "windows", "scan", "scans", "xylophone"]
    rows = [Row(doc_id=i, text=w) for i, w in enumerate(vocab)]
    df = spark.createDataFrame(rows)
    got = {(r.tok_a, r.tok_b) for r in fuzzy_token_pairs(df, min_len=4).collect()}

    def lev(a, b):
        import itertools
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j - 1] + 1, dp[j] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    uniq = sorted({w for w in vocab if len(w) >= 4})
    want = {(a, b) for i, a in enumerate(uniq) for b in uniq[i + 1:]
            if lev(a, b) <= 1}
    assert got == want and ("bach", "batch") in got
    assert not any("xylophone" in p for p in got)


def test_gapfill_materializes_gaps_and_locf_carries(spark):
    import datetime

    # purchases on days 1, 2, 5 only -> days 3-4 are gaps
    rows = []
    i = 0
    for day, n in ((1, 3), (2, 2), (5, 4)):
        for k in range(n):
            rows.append(_ev(i, datetime.datetime(2025, 3, day, 10, 0), 1,
                            "purchase", value=day * 10.0))
            i += 1
    d = _events_dir(spark, rows)
    out = {str(r.day): r for r in
           QUERIES["events_daily_gapfill"](spark, d).collect()}
    assert len(out) == 5  # full spine 1..5
    assert out["2025-03-03"].is_gap == 1 and out["2025-03-03"].n == 0
    assert out["2025-03-04"].is_gap == 1
    # zero-filled measure on gap days, LOCF carries day 2's value
    assert out["2025-03-03"].total_value == 0.0
    assert out["2025-03-03"].locf_value == out["2025-03-02"].locf_value == 40.0
    assert out["2025-03-05"].locf_value == 200.0

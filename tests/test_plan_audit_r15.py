"""Repo-wide plan audit (r14 verdict ask #3): no GLOBAL window — empty
or constant-only partition spec — over an unbounded input anywhere in
the declared query surface.

A global Window moves every input row through one task: the
customer_rfm_segments class of bug (fixed in r15 via
operators/ranking). This audit makes reintroducing it structurally
impossible: every registered query's OPTIMIZED logical plan (post
constant folding, so a foldable partition key cannot silence the
check) is walked for Window nodes with no real partition key; such a
window passes only when its input is provably bounded —

- EVERY row path into the window flows through a LocalLimit /
  GlobalLimit / LocalRelation / OneRowRelation (a limit on one side of
  a join does NOT bless the other side — tests/_plan_utils.py
  input_bounded requires all children of a multi-child node bounded),
  or
- the query is in the explicit whitelist below, each entry with a
  written reason the frame is bounded by something other than corpus
  size.
"""

from __future__ import annotations

import pytest
from _plan_utils import (
    global_windows,
    global_windows_over_unbounded,
)

import __spark_entry__ as entrymod

# Explicit whitelist: query -> why the global window's input is bounded.
WHITELIST = {
    "events_cumulative_users": (
        "cumulative sum over the per-day NEW-user aggregate: one row per "
        "calendar day — grows with the time horizon, not the corpus"
    ),
    "events_changepoint": (
        "prefix sums for the SSE split scan run over the per-day count "
        "aggregate: one row per calendar day — grows with the time "
        "horizon, not the corpus (the events_cumulative_users argument)"
    ),
}


def test_no_global_window_over_unbounded_input(registry_frames):
    offenders: dict[str, list[str]] = {}
    for name, df in registry_frames.items():
        plan = df._jdf.queryExecution().optimizedPlan()
        bad = global_windows_over_unbounded(plan)
        if bad and name not in WHITELIST:
            offenders[name] = bad
    assert not offenders, (
        "global window over an unbounded input (either rewrite with "
        "operators/ranking.with_global_ntile / with_global_rank, or add "
        f"a reasoned WHITELIST entry): {offenders}"
    )


def test_whitelist_entries_still_exist():
    """A whitelist entry for a renamed/removed query is stale noise."""
    missing = set(WHITELIST) - set(entrymod.queries())
    assert not missing, f"stale whitelist entries: {missing}"


def test_limit_under_one_join_side_does_not_bless(spark):
    """The audit's boundedness rule must not have the join bypass: a
    global window over fact JOIN limited-dim still moves the whole
    fact side through one task and must be flagged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    fact = spark.range(1000).toDF("k")
    dim = spark.range(100).toDF("k").limit(5)
    joined = fact.join(dim, "k")
    bad = joined.withColumn(
        "r", F.row_number().over(Window.orderBy("k"))
    )
    plan = bad._jdf.queryExecution().optimizedPlan()
    assert global_windows_over_unbounded(plan), (
        "audit blessed a global window whose fact side is unbounded"
    )
    # while a window over the limited side alone IS bounded
    ok = dim.withColumn("r", F.row_number().over(Window.orderBy("k")))
    assert not global_windows_over_unbounded(
        ok._jdf.queryExecution().optimizedPlan()
    )


@pytest.mark.parametrize(
    "name", ["customer_rfm_segments", "events_value_deciles"]
)
def test_ranking_rewrites_have_zero_global_windows(spark, sf_dir, name):
    """The r14 verdict's weak (RFM) and its skew cousin (deciles) must
    not contain ANY global window, bounded or not."""
    df = entrymod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = global_windows(plan)
    assert not bad, f"{name} regained a global window: {bad}"

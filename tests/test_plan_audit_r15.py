"""Repo-wide plan audit (r14 verdict ask #3): no GLOBAL window — empty
or constant-only partition spec — over an unbounded input anywhere in
the declared query surface.

A global Window moves every input row through one task: the
customer_rfm_segments class of bug (fixed in r15 via
operators/ranking). This audit makes reintroducing it structurally
impossible: every registered query's OPTIMIZED logical plan (post
constant folding, so a foldable partition key cannot silence the
check) is walked for Window nodes with no real partition key; such a
window passes only when its input subtree is provably bounded —

- a LocalLimit/GlobalLimit below it (top-k-then-rank plans: the window
  only ever sees the capped rows), or
- a LocalRelation / OneRowRelation leaf-only input (driver-built
  literal frames), or
- the query is in the explicit whitelist below, each entry with a
  written reason the frame is bounded by something other than corpus
  size.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

# Explicit whitelist: query -> why the global window's input is bounded.
WHITELIST = {
    "events_cumulative_users": (
        "cumulative sum over the per-day NEW-user aggregate: one row per "
        "calendar day — grows with the time horizon, not the corpus"
    ),
}


def _walk(jnode):
    stack = [jnode]
    while stack:
        node = stack.pop()
        yield node
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))


def _is_global_window(node) -> bool:
    if node.nodeName() != "Window":
        return False
    spec = node.partitionSpec()
    return spec.size() == 0 or all(
        spec.apply(i).foldable() for i in range(spec.size())
    )


_BOUNDING = {"GlobalLimit", "LocalLimit", "LocalRelation", "OneRowRelation"}


def _input_bounded(window_node) -> bool:
    return any(n.nodeName() in _BOUNDING for n in _walk(window_node.child()))


def test_no_global_window_over_unbounded_input(spark, sf_dir):
    offenders: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan()
        bad = [
            w.simpleString(60)
            for w in _walk(plan)
            if _is_global_window(w) and not _input_bounded(w)
        ]
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


@pytest.mark.parametrize(
    "name", ["customer_rfm_segments", "events_value_deciles"]
)
def test_ranking_rewrites_have_zero_global_windows(spark, sf_dir, name):
    """The r14 verdict's weak (RFM) and its skew cousin (deciles) must
    not contain ANY global window, bounded or not."""
    df = entrymod.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan()
    bad = [w.simpleString(60) for w in _walk(plan) if _is_global_window(w)]
    assert not bad, f"{name} regained a global window: {bad}"

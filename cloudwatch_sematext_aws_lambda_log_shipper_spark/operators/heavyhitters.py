"""Distributed heavy hitters: Misra-Gries candidate generation + exact
recount.

The naive "top tokens" plan (top_tokens in plans/llmops.py) shuffles
one row per DISTINCT token. Fine for word vocabularies; fatal when the
item space is huge (URLs, n-grams, user ids at 100 TB) — the shuffle
and the final aggregate are both O(|vocab|). The classic fix is a
frequency sketch, and Misra-Gries is the right one for "which items
exceed f fraction of the stream": k counters per partition, mergeable
(Agarwal et al., "Mergeable Summaries", PODS 2012), with the guarantee
that any item whose GLOBAL count exceeds n/k survives in at least one
partition summary (pigeonhole: if it lost its counter everywhere, its
count would be <= sum of per-partition n_p/k = n/k).

Because the union of per-partition candidates is a SUPERSET of the true
heavy hitters, a second exact pass over the corpus — count only the
candidate set, everything else folds into one overflow bucket — makes
the final answer EXACT and partition-layout independent: emit items
whose exact count * k > n_total (integer cross-multiply, no float
threshold). Two corpus scans, both with bounded shuffle:

  scan 1: mapInPandas Misra-Gries  -> <= k candidates per partition
  scan 2: groupBy over (candidate | NULL-overflow) -> <= k*P + 1 keys,
          map-side combined before the exchange

The driver never holds more than the candidate set (<= k * partitions
rows, thousands at most), and no stage is O(|vocab|).
"""

from __future__ import annotations

import heapq
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mg_merge(counts: dict[str, int], batch: pd.Series, k: int) -> dict[str, int]:
    """Merge a batch's value_counts into a Misra-Gries summary of at
    most k counters: add, then subtract the (k+1)-largest count from
    every counter and drop the non-positive ones (the mergeable-summary
    formulation — equivalent to repeated decrement-all)."""
    vc = batch.value_counts()
    for item, c in vc.items():
        counts[item] = counts.get(item, 0) + int(c)
    if len(counts) > k:
        # (k+1)th largest value via a bounded heap: O(n log k), not a
        # full sort — the summary is trimmed once per Arrow batch
        cut = heapq.nlargest(k + 1, counts.values())[-1]
        counts = {i: c - cut for i, c in counts.items() if c - cut > 0}
    return counts


def mg_candidates(items: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``items[item_col]``;
    returns (item, mg_count) with <= k rows per input partition. The
    union over partitions is a superset of every item with global
    frequency > n_total / k."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for b in batches:
            counts = _mg_merge(counts, b[item_col].dropna(), k)
        yield pd.DataFrame(
            {"item": list(counts.keys()), "mg_count": list(counts.values())}
        )

    return items.select(F.col(item_col).cast("string").alias(item_col)).mapInPandas(
        summarize, schema="item string, mg_count long"
    )


def heavy_hitters(
    items: DataFrame, item_col: str, k: int, candidate_k: int | None = None
) -> DataFrame:
    """EXACT set of items with count * k > n_total, computed without an
    O(|vocab|) shuffle. ``candidate_k`` (default 2k) is the Misra-Gries
    counter budget — any value >= k preserves correctness (the superset
    guarantee needs only > n/k items to survive); a larger budget just
    shrinks phase-2's overflow bucket.

    Output: (item, n, n_total) ordered by n desc, item — exact counts,
    deterministic regardless of partitioning, batch order, or the
    sketch's internal state.
    """
    budget = candidate_k or 2 * k
    cands = mg_candidates(items, item_col, budget).select("item").distinct()
    # one aggregate produces candidate exact counts AND the stream
    # total: the broadcast left join tags candidate rows with their own
    # value and collapses every non-candidate into a single NULL
    # overflow key map-side (a giant IN-literal would bloat the plan and
    # skip codegen once the candidate set reaches thousands)
    # NULL items are excluded from BOTH phases: mg_candidates dropna()s
    # them, so counting them here would inflate n_total (the threshold
    # denominator) with rows that can never be emitted — the contract is
    # "count * k > n_total over non-NULL items"
    stream = items.select(
        F.col(item_col).cast("string").alias("_v")
    ).filter(F.col("_v").isNotNull())
    tagged = stream.join(
        F.broadcast(cands), stream["_v"] == cands["item"], "left"
    ).select("item")
    counted = tagged.groupBy("item").agg(F.count(F.lit(1)).alias("n"))
    total = counted.agg(F.sum("n").cast("long").alias("n_total"))
    return (
        counted.filter(F.col("item").isNotNull())
        .join(F.broadcast(total))
        .filter(F.col("n") * F.lit(k) > F.col("n_total"))
        .orderBy(F.col("n").desc(), F.col("item"))
    )

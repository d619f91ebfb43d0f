"""Streaming heavy hitters: Misra-Gries state over hash key-groups.

The batch operator (operators/heavyhitters.py) sketches per PARTITION;
a stream instead sketches per KEY-GROUP — items are hashed into a fixed
number of groups, and each group folds its share of every micro-batch
into one Misra-Gries summary held as query state. Because grouping is
BY VALUE (the same item always lands in the same group), the guarantee
is strictly stronger than the batch per-partition form: an item's group
sees the item's ENTIRE stream, so any item with global count >
n_total / k survives in its group's k-counter summary — no cross-group
merge needed, ever.

State per group: (items[], counts[], n_group) — bounded at k counters
regardless of stream length or item-space size. Output (update mode)
after each micro-batch: the group's current candidates with sketch
counts plus the group's exact running total; a cheap downstream exact
recount (the batch operator's phase 2) turns candidates into exact
answers whenever one is needed.

Scale: the shuffle keys on the group id (n_groups partitions — size it
to the cluster); state is O(n_groups * k) tuples TOTAL, checkpointed
with the query, restart-safe. The GROUP space is fixed by construction
(pmod into n_groups), so unlike the per-key sketches the state here
cannot grow with key cardinality — ``ttl_ms`` exists for the
complementary reason: a long-lived deployment whose item distribution
moves on (yesterday's hot groups idle) can reclaim those groups'
summaries instead of holding stale candidates forever.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("group_id", T.IntegerType()),
        T.StructField("item", T.StringType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("n_group", T.LongType()),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_group", T.LongType()),
    ]
)


def _mg_fold_factory(k: int, ttl_ms: int | None = None):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL eviction: drop the idle group's summary AND its
            # running total. Update mode already shipped the group's
            # last candidates, so removal loses no output — but the
            # Misra-Gries guarantee RESTARTS with the state: after a
            # >ttl idle gap, a group's rows mean "candidates over the
            # post-gap suffix", and the count > n_group / k survival
            # bound applies to that suffix, not the whole stream
            # (the same semantics choice as streaming_hll_distinct).
            state.remove()
            return
        if state.exists:
            items, counts, n_group = state.get
            summary = dict(zip(items, counts))
        else:
            summary, n_group = {}, 0
        for pdf in pdfs:
            vals = pdf["item"].dropna()
            n_group += len(vals)
            vc = vals.value_counts()
            for item, c in vc.items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > k:
                cut = sorted(summary.values(), reverse=True)[k]
                summary = {i: c - cut for i, c in summary.items() if c - cut > 0}
        state.update((list(summary.keys()), list(summary.values()), n_group))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        # a summary CAN thin to empty (a batch of all-unique items cuts
        # every 1-count entry); emit a NULL-item marker row so the
        # group's exact running total stays observable downstream
        if summary:
            yield pd.DataFrame(
                {
                    "group_id": key[0],
                    "item": list(summary.keys()),
                    "mg_count": list(summary.values()),
                    "n_group": n_group,
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "group_id": [key[0]],
                    "item": [None],
                    "mg_count": [0],
                    "n_group": [n_group],
                }
            )

    return fold


def streaming_heavy_hitter_candidates(
    items: DataFrame,
    item_col: str = "item",
    k: int = 32,
    n_groups: int = 32,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming Misra-Gries candidates, updated every micro-batch.
    Emits each touched group's full current summary (update output
    mode). Any item whose global stream count exceeds
    sum(n_group) / k is guaranteed present in its group's rows.

    ``ttl_ms`` (r14): a group idle for > ttl_ms of processing time is
    evicted (state.remove(); checkpoint-safe — the deadline persists
    in the checkpoint and fires on restart like the sketch trio's,
    pinned in tests/test_streaming_eviction_r14.py). A returned
    group's candidates then cover only the post-gap suffix — see
    _mg_fold_factory for the precise guarantee. Default None keeps
    the exact whole-stream Misra-Gries bound. Caveat: while any group
    holds a timeout deadline the engine keeps scheduling timeout-sweep
    micro-batches, so an availableNow run with a TTL will not
    self-terminate — stop() it."""
    keyed = items.select(
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_groups))
        .cast("int")
        .alias("group_id"),
        F.col(item_col).cast("string").alias("item"),
    ).groupBy("group_id")
    return keyed.applyInPandasWithState(
        _mg_fold_factory(k, ttl_ms),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

"""Streaming EWMA spike detection: the batch recurrence
(plans/analytics.py events_ewma_daily) lifted into query state.

Each key's exponentially-weighted average folds forward across
micro-batches via applyInPandasWithState — state is ONE (ewma, count)
pair per key, checkpointed with the query, restart-safe. Every
incoming row is emitted back with its post-update ewma and an
``is_spike`` flag (value > spike_factor x the PRE-update average, so a
spike is judged against history, never against itself).

Ordering semantics (the standard streaming tradeoff, documented not
hidden): rows are event-time ordered WITHIN a micro-batch (sorted
before folding); ACROSS batches the fold follows arrival order. When
batches arrive time-ordered — the normal case for an append-only log —
the result is identical to the batch fold over the whole ordered
stream (pinned by test). Out-of-order arrival beyond that needs a
watermark + sorted state store, which is a different operator.

Each step rounds to 9 decimals before feeding the next, so a batch
replay of the same splits in the same Python runtime reproduces the
stream exactly. (The batch query goes further — a scaled-integer
recurrence, bit-exact across ENGINES — because it faces a cross-engine
oracle; stream state only ever compares against its own replay.)

Scale: the shuffle keys on the EWMA key (series id); state is O(keys),
two scalars each. The fold is one pandas pass per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
        T.StructField("is_spike", T.BooleanType()),
    ]
)

_EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ewma", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ]
)


def _ewma_fold_factory(
    alpha: float, spike_factor: float, ttl_ms: int | None = None
):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL eviction: the key's (ewma, n) pair drops; if the key
            # speaks again the average RE-SEEDS from its first post-gap
            # value, and that first row can never flag is_spike (it is
            # judged against no history — the same rule as a brand-new
            # key). That is the honest semantics for a series that went
            # silent past the horizon: a stale average from before the
            # gap is not "history", it is noise.
            state.remove()
            return
        prev, n = state.get if state.exists else (None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "ts", kind="stable"
        )
        ewmas, spikes = [], []
        for v in rows["value"].astype(float):
            spikes.append(prev is not None and v > spike_factor * prev)
            prev = v if prev is None else round(
                alpha * v + (1.0 - alpha) * prev, 9
            )
            ewmas.append(prev)
            n += 1
        state.update((prev, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "key": key[0],
                "ts": rows["ts"],
                "value": rows["value"].astype(float),
                "ewma": ewmas,
                "is_spike": spikes,
            }
        )

    return fold


def streaming_ewma(
    points: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    spike_factor: float = 2.0,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Stateful streaming EWMA + spike flags, updated every micro-batch
    (update output mode). ``points`` must be a streaming frame of
    (key, ts, value).

    ``ttl_ms`` (r14): per-key state expiry — a key idle for > ttl_ms
    of processing time is evicted (state.remove(); checkpoint-safe,
    pinned in tests/test_streaming_eviction_r14.py). A returned key
    re-seeds its average from its first post-gap value and that row
    cannot flag is_spike (no history to judge against). Unbounded key
    cardinality on a real log stream makes the default keep-forever
    state a slow leak; set a TTL in long-running deployments. Caveat:
    with any registered deadline an availableNow run keeps scheduling
    timeout-sweep batches and will not self-terminate — stop() it."""
    keyed = points.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).cast("timestamp").alias("ts"),
        F.col(value_col).cast("double").alias("value"),
    ).groupBy("key")
    return keyed.applyInPandasWithState(
        _ewma_fold_factory(alpha, spike_factor, ttl_ms),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

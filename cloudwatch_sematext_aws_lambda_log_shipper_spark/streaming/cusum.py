"""Streaming CUSUM drift detection: the batch drift query
(plans/analytics.py events_cusum_drift) lifted into query state — the
change-point monitor that runs ON the stream instead of over the
finished table.

Each key accumulates S += value*10^6 - target_scaled (the exact
integer deviation from a caller-provided target rate; the batch query
derives the target from the full corpus mean, a stream cannot — it
monitors drift against an EXPECTED rate, the standard online-CUSUM
framing). An alert fires while |S| >= threshold_scaled. All state is
two integers per key (S and a row counter), checkpointed with the
query, restart-safe; no float ever feeds the next step, so a batch
replay of the same splits reproduces the stream exactly.

Ordering semantics match streaming/ewma.py: rows sort by event time
WITHIN a micro-batch; across batches the fold follows arrival order
(identical to the batch fold when batches arrive time-ordered — pinned
by test).

Scale: shuffle keys on the series id; state is O(keys) x two longs;
one pandas pass per key per batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCALE = 1_000_000

CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.LongType()),
        T.StructField("cusum_scaled", T.LongType()),
        T.StructField("drift", T.DoubleType()),
        T.StructField("alert", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_cusum(
    stream: DataFrame,
    target: float,
    threshold: float,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """value-per-tick stream -> per-row cumulative deviation from
    ``target`` with an ``alert`` flag while |drift| >= ``threshold``.
    ``target`` and ``threshold`` are scaled to exact integers once at
    plan time (10^-6 resolution).

    ``ttl_ms`` (r14): per-key state expiry — a key idle for > ttl_ms
    of processing time is evicted (state.remove(); checkpoint-safe,
    pinned in tests/test_streaming_eviction_r14.py). A returned key's
    accumulator RESTARTS at S=0: post-gap rows measure drift since the
    gap, not since stream start — the standard online-CUSUM reset
    (an alert that was live before the gap must re-accumulate to
    re-fire). Default None keeps whole-stream accumulation. Caveat:
    with any registered deadline an availableNow run keeps scheduling
    timeout-sweep batches and will not self-terminate — stop() it."""
    target_scaled = round(float(target) * SCALE)
    threshold_scaled = round(float(threshold) * SCALE)

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            s, n = state.get
        else:
            s, n = 0, 0
        out: list[dict[str, Any]] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for _, row in pdf.iterrows():
                v = int(row[value_col])
                s += v * SCALE - target_scaled
                n += 1
                out.append(
                    {
                        "key": key[0],
                        "ts": row[ts_col],
                        "value": v,
                        "cusum_scaled": s,
                        "drift": s / SCALE,
                        "alert": abs(s) >= threshold_scaled,
                    }
                )
        state.update((s, n))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(out, columns=[f.name for f in CUSUM_OUTPUT_SCHEMA])

    return (
        stream.selectExpr(
            f"{key_col} AS key", f"{ts_col} AS ts", f"CAST({value_col} AS LONG) AS value"
        )
        .groupBy("key")
        .applyInPandasWithState(
            fold,
            CUSUM_OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

"""Streaming Count-Min sketch: per-hash-row counter state.

The batch operator (operators/sketches.py cms_sketch) is a grouped
count; the streaming twin holds each hash row's w counters as query
state and folds every micro-batch in with the SAME md5 bucket rule, so
the running counter table after batch N equals the batch sketch over
batches 1..N exactly (counters are plain sums — order-insensitive by
construction; pinned in tests/test_streaming_cms.py). Elements fan out
to all d rows BEFORE the groupBy, so each state group sees its full
share of the stream.

State per group: w=512 longs (bounded regardless of stream length or
item-space size). Output (update mode) after each micro-batch: the
row's buckets TOUCHED in that batch with their running totals — a
downstream point estimate for item x is min over rows i of the latest
(i, bucket_i(x)) count, exactly the batch estimator. With a ttl_ms
freshness horizon, expiry emits an explicit c=0 row for EVERY bucket
of the expired hash row, so the latest-row contract survives the
reset (consumers see the new epoch, never stale pre-gap counts).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import CMS_D, CMS_W

CMS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("b", T.LongType()),
        T.StructField("c", T.LongType()),
        T.StructField("n_row", T.LongType()),
    ]
)

_CMS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("counters", T.ArrayType(T.LongType())),
        T.StructField("n_row", T.LongType()),
    ]
)


def _bucket(element: str, row: int) -> int:
    """The batch operator's bucket rule, digit-for-digit:
    48-bit md5 of element + ';cms' + row, mod w."""
    h = hashlib.md5(f"{element};cms{row}".encode("utf-8")).hexdigest()
    return int(h[:12], 16) % CMS_W


def _cms_fold_factory(ttl_ms: int | None):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        row = int(key[0])
        if ttl_ms is not None and state.hasTimedOut:
            # TTL expiry: unlike HLL/quantiles, CMS state is bounded by
            # CONSTRUCTION (d groups x w longs — the key is the hash
            # row, not a stream key), so this is not a memory valve.
            # It is a FRESHNESS horizon: after > ttl of stream silence
            # the counters reset, so point estimates mean "counts since
            # the last >ttl idle gap" rather than since stream start.
            # Unlike the per-key sketches, CMS output is PER-BUCKET
            # incremental ("latest row per (i, b) IS the sketch
            # value"), so a silent removal would leave stale pre-gap
            # rows in the sink: emit an explicit c=0 reset for every
            # bucket of this hash row so downstream latest-row
            # consumers see the new epoch (r13 review finding).
            state.remove()
            yield pd.DataFrame(
                {
                    "i": row,
                    "b": list(range(CMS_W)),
                    "c": [0] * CMS_W,
                    "n_row": 0,
                }
            )
            return
        if state.exists:
            counters, n_row = state.get
            counters = list(counters)
        else:
            counters, n_row = [0] * CMS_W, 0
        touched = set()
        for pdf in pdfs:
            vals = pdf["element"].dropna()
            n_row += len(vals)
            for el in vals:
                b = _bucket(str(el), row)
                counters[b] += 1
                touched.add(b)
        state.update((counters, n_row))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        bs = sorted(touched)
        yield pd.DataFrame(
            {
                "i": row,
                "b": bs,
                "c": [counters[b] for b in bs],
                "n_row": n_row,
            }
        )

    return fold


_cms_fold = _cms_fold_factory(None)


def streaming_cms_counters(
    elements: DataFrame,
    elem_col: str = "element",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Running CMS counter updates, one state group per hash row.
    Emits each touched (i, b) bucket's running total after every
    micro-batch; the latest row per (i, b) IS the batch cms_sketch
    value over the whole stream so far.

    ``ttl_ms`` (r13): freshness horizon — state resets after > ttl of
    processing-time silence on a hash row (see _cms_fold_factory for
    why this is a semantics knob, not a memory one: CMS state is
    bounded at d x w longs by construction). Batch equality holds only
    for ttl_ms=None. availableNow runs with a TTL never self-terminate
    (timeout-sweep batches keep scheduling) — see
    streaming_hll_distinct."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    fanned = elements.select(
        F.col(elem_col).cast("string").alias("element")
    ).select("element", rows)
    return fanned.groupBy("i").applyInPandasWithState(
        _cms_fold_factory(ttl_ms),
        outputStructType=CMS_OUTPUT_SCHEMA,
        stateStructType=_CMS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

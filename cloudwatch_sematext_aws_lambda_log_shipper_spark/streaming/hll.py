"""Streaming deterministic HyperLogLog: per-key register state.

The batch operator (operators/sketches.py hll_estimate) is a grouped
aggregation; the streaming twin holds each key's m=256 registers as
query state and folds every micro-batch's elements in with the SAME
md5-derived (index, rho) rule — register max is the canonical
mergeable-summary fold, so the streaming estimate after batch N equals
the batch operator run over batches 1..N exactly (pinned in
tests/test_streaming_hll.py). Output (update mode) after each
micro-batch: the key's current distinct estimate, rounded like the
batch estimator.

State per key: 256 small ints (bounded regardless of stream length or
element cardinality — the entire point of HLL in a stream). The
shuffle keys on the group column; checkpointed with the query,
restart-safe.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import (
    HLL_ALPHA_NUM,
    HLL_LINEAR_CUTOFF,
    HLL_M,
    _HLL_RHO_MAX,
)

HLL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("n_distinct_hll", T.DoubleType()),
    ]
)

_HLL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.ArrayType(T.IntegerType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _idx_rho(element: str) -> tuple[int, int]:
    """The batch operator's (register index, rho) rule, digit-for-digit:
    48-bit md5 prefix, idx = h % m, rho = rho_max - bitlength(h // m)
    (rho_max when the window is zero)."""
    h = int(hashlib.md5(element.encode("utf-8")).hexdigest()[:12], 16)
    w = h // HLL_M
    rho = _HLL_RHO_MAX if w == 0 else _HLL_RHO_MAX - w.bit_length()
    return h % HLL_M, rho


def hll_estimate_from_registers(regs: list[int]) -> float:
    """The batch estimator over a register array: BIGINT harmonic sum
    (absent registers contribute 2^rho_max), one division, the
    linear-counting ln correction, rounded to 4 dp — the identical
    arithmetic as operators/sketches.hll_estimate."""
    s = sum(1 << (_HLL_RHO_MAX - m) for m in regs if m > 0)
    n_regs = sum(1 for m in regs if m > 0)
    s += (HLL_M - n_regs) << _HLL_RHO_MAX
    v = HLL_M - n_regs
    raw = HLL_ALPHA_NUM / float(s)
    if raw <= HLL_LINEAR_CUTOFF and v > 0:
        est = float(HLL_M) * math.log(float(HLL_M) / float(v))
    else:
        est = raw
    # HALF-UP to 4 dp in DECIMAL semantics, exactly Spark's F.round /
    # DuckDB's ROUND (both round the decimal expansion via BigDecimal
    # HALF_UP): floor(est*10000 + 0.5) is NOT the same rule — the
    # binary product est*10000 can land on the other side of .5 for
    # boundary values (ADVICE r12). Decimal(repr(est)) reproduces the
    # shortest decimal expansion BigDecimal.valueOf(double) uses.
    return float(
        Decimal(repr(est)).quantize(Decimal("0.0001"), rounding=ROUND_HALF_UP)
    )


def _hll_fold_factory(ttl_ms: int | None):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # TTL eviction: drop the key's registers entirely. Nothing
            # is emitted — update mode already shipped the running
            # estimate after the last batch that touched this key, so
            # removal loses no output, only memory. If the key speaks
            # again the estimate RESTARTS from empty: post-eviction
            # rows mean "distinct since the key's last >ttl idle gap",
            # not since stream start (the semantics choice, documented
            # on streaming_hll_distinct).
            state.remove()
            return
        if state.exists:
            regs, n_seen = state.get
            regs = list(regs)
        else:
            regs, n_seen = [0] * HLL_M, 0
        for pdf in pdfs:
            vals = pdf["element"].dropna()
            n_seen += len(vals)
            for el in vals:
                idx, rho = _idx_rho(str(el))
                if rho > regs[idx]:
                    regs[idx] = rho
        state.update((regs, n_seen))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "n_seen": [n_seen],
                "n_distinct_hll": [hll_estimate_from_registers(regs)],
            }
        )

    return fold


_hll_fold = _hll_fold_factory(None)


def streaming_hll_distinct(
    elements: DataFrame,
    key_col: str = "key",
    elem_col: str = "element",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running distinct estimate, updated every micro-batch.
    The estimate after any prefix of the stream equals the batch
    hll_estimate over that prefix (register max is order-insensitive
    and duplicate-insensitive by construction).

    ``ttl_ms`` (r13): per-key state expiry. The register arrays are
    bounded (m=256 small ints) but the KEY SPACE of a real log stream
    is not — without expiry, total state grows with every key ever
    seen. With a TTL, a key idle for > ttl_ms of processing time is
    evicted (state.remove(); checkpoint-safe, pinned in
    tests/test_streaming_eviction.py) and its next activity restarts
    the estimate from empty — i.e. the emitted estimate means
    "distinct elements since the key's last >ttl idle gap". The exact
    prefix-equality contract vs the batch operator holds only for the
    default ttl_ms=None (never evict). Caveat: while any key holds a
    timeout deadline the engine keeps scheduling timeout-sweep
    micro-batches, so an availableNow run with a TTL will not
    self-terminate — stop() it, as the long-running deployments this
    knob exists for already do."""
    keyed = elements.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(elem_col).cast("string").alias("element"),
    ).groupBy("key")
    return keyed.applyInPandasWithState(
        _hll_fold_factory(ttl_ms),
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=_HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

"""Streaming sampled quantiles: per-key bottom-k priority sample.

The batch operator (plans/analytics.events_value_quantiles_sampled)
keeps each group's s rows of smallest md5 priority — a mergeable
uniform sample (bottom-k under a fixed hash is closed under union), so
the streaming twin holds exactly that bottom-k as query state: each
micro-batch's rows fold in by priority and only the s smallest
survive. The sample after any stream prefix therefore equals the batch
sample over that prefix ROW-FOR-ROW, and the interpolated quantiles
match Spark's `percentile` / DuckDB's `quantile_cont` on it (same
linear-interpolation rule, pinned in tests/test_streaming_quantiles.py).

State per key: at most s (priority, value) pairs — bounded regardless
of stream length. Output (update mode) after each micro-batch:
(key, n_seen, sample_n, p25, p50, p75).
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

from ..operators.sketches import SAMPLED_QUANTILE_S

# ONE shared definition with the batch operator (ADVICE r12): tuning
# the sample size can never desynchronize the two paths.
SAMPLE_SIZE = SAMPLED_QUANTILE_S

Q_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_seen", T.LongType()),
        T.StructField("sample_n", T.IntegerType()),
        T.StructField("p25", T.DoubleType()),
        T.StructField("p50", T.DoubleType()),
        T.StructField("p75", T.DoubleType()),
    ]
)

# State schema is UNCHANGED from r12 (pris/vals/n_seen) so existing
# checkpoints restore across the r13 upgrade: the element id needed
# for the batch-exact truncation tie-break is PACKED into each pris
# entry as md5hex(32 chars) + element_id — md5 hex is fixed-width, so
# lexicographic order of the packed string IS the batch ORDER BY
# (priority, element_id), and pre-r13 entries (bare 32-char hex)
# continue as (priority, "").
_Q_STATE_SCHEMA = T.StructType(
    [
        T.StructField("pris", T.ArrayType(T.StringType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def sample_priority(element_id: str) -> str:
    """The batch query's priority rule: md5(id || 'qsamp') hex —
    string-ordered, identical in any engine."""
    return hashlib.md5(f"{element_id}qsamp".encode("utf-8")).hexdigest()


def interpolated_quantile(sorted_vals: list[float], q: float) -> float:
    """Linear interpolation on order statistics — the rule shared by
    Spark `percentile` and DuckDB `quantile_cont`: rank = q*(n-1),
    result = v[floor] + frac * (v[ceil] - v[floor])."""
    n = len(sorted_vals)
    if n == 1:
        return sorted_vals[0]
    rank = q * (n - 1)
    lo = int(rank)
    frac = rank - lo
    hi = min(lo + 1, n - 1)
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


def _q_fold_factory(ttl_ms: int | None):
    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        return _q_fold_impl(key, pdfs, state, ttl_ms)

    return fold


def _q_fold_impl(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    if ttl_ms is not None and state.hasTimedOut:
        # TTL eviction: drop the key's sample. The last running
        # quantiles were already emitted (update mode); next activity
        # restarts the sample from empty — "quantiles since the key's
        # last >ttl idle gap" (see streaming_sampled_quantiles).
        state.remove()
        return
    if state.exists:
        pris, vals, n_seen = state.get
        sample = list(zip(pris, vals))
    else:
        sample, n_seen = [], 0
    # Truncation key is (priority, element_id) — the batch query's
    # exact ORDER BY (md5 priority, event_id) — NOT (priority, value):
    # at the k-boundary a priority tie (duplicate element_id replays,
    # md5 collisions) must keep the same rows the batch window keeps
    # (ADVICE r12). The element id rides packed behind the fixed-width
    # md5 hex (see _Q_STATE_SCHEMA), so sorting the packed string IS
    # that ORDER BY; Python's sort is stable, so fully-tied rows keep
    # stream order, matching row_number's arbitrary-but-consistent
    # order within duplicate (pri, id) keys.
    trunc_key = lambda t: t[0]  # noqa: E731
    for pdf in pdfs:
        ok = pdf.dropna(subset=["element_id", "value"])
        n_seen += len(ok)
        for eid, v in zip(ok["element_id"], ok["value"]):
            eid = str(eid)
            sample.append((sample_priority(eid) + eid, float(v)))
        if len(sample) > SAMPLE_SIZE:
            sample.sort(key=trunc_key)
            sample = sample[:SAMPLE_SIZE]
    sample.sort(key=trunc_key)
    state.update(
        (
            [p for p, _ in sample],
            [v for _, v in sample],
            n_seen,
        )
    )
    if ttl_ms is not None:
        state.setTimeoutDuration(ttl_ms)
    sv = sorted(v for _, v in sample)
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "n_seen": [n_seen],
            "sample_n": [len(sv)],
            "p25": [interpolated_quantile(sv, 0.25) if sv else None],
            "p50": [interpolated_quantile(sv, 0.50) if sv else None],
            "p75": [interpolated_quantile(sv, 0.75) if sv else None],
        }
    )


# module-level fold (no TTL) kept for direct unit-testing of the
# truncation rule (tests/test_advice_r13.py)
_q_fold = _q_fold_factory(None)


def streaming_sampled_quantiles(
    elements: DataFrame,
    key_col: str = "key",
    id_col: str = "element_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running quantile estimates from the bottom-k priority
    sample, updated every micro-batch. The sample (and therefore every
    emitted quantile) after any prefix equals the batch bottom-k
    operator over that prefix.

    ``ttl_ms`` (r13): per-key state expiry. The sample is bounded
    (s=400 rows) but the key space is not; with a TTL, a key idle
    > ttl_ms of processing time drops its sample (checkpoint-safe) and
    later activity restarts it — emitted quantiles then describe
    values since the key's last >ttl idle gap. Prefix equality vs the
    batch operator holds only for ttl_ms=None. availableNow runs with
    a TTL never self-terminate (timeout-sweep batches keep scheduling)
    — see streaming_hll_distinct."""
    keyed = elements.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("string").alias("element_id"),
        F.col(value_col).cast("double").alias("value"),
    ).groupBy("key")
    return keyed.applyInPandasWithState(
        _q_fold_factory(ttl_ms),
        outputStructType=Q_OUTPUT_SCHEMA,
        stateStructType=_Q_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )

"""Custom stateful streaming operator: running per-function totals via
applyInPandasWithState.

The built-in stateful ops (windowed aggs, dropDuplicatesWithinWatermark)
cover the reference's needs; this operator demonstrates the CUSTOM
state path for semantics Spark lacks natively — a monotonically running
error-rate per function across micro-batches (the live "function
health" view a log platform exposes).

State per function.name: (total_events, total_errors). Each micro-batch
folds its rows into the state and emits one updated row per touched
key. State is checkpointed with the query; a restart resumes exact
totals. Arrow-batched: the Python hop sees whole per-key batches, never
single rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("function_name", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_errors", T.LongType()),
        T.StructField("error_rate", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_events", T.LongType()),
        T.StructField("total_errors", T.LongType()),
    ]
)


def _fold(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    total, errors = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total += len(pdf)
        errors += int((pdf["severity"] == "error").sum())
    state.update((total, errors))
    yield pd.DataFrame(
        {
            "function_name": [key[0]],
            "total_events": [total],
            "total_errors": [errors],
            "error_rate": [errors / total if total else 0.0],
        }
    )


def running_function_totals(parsed: DataFrame) -> DataFrame:
    """Streaming: running (events, errors, rate) per function.name,
    updated each micro-batch. Requires update output mode.

    Scale: state is one tiny tuple per function — bounded by the number
    of distinct Lambdas, not by traffic. The shuffle partitions by
    function.name only.
    """
    keyed = parsed.select(
        F.col("`function.name`").alias("function_name"), F.col("severity")
    ).groupBy("function_name")
    return keyed.applyInPandasWithState(
        _fold,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Streaming multi-line reassembly: the batch lag-islands operator
(operators/multiline.py) as query state — continuation lines that
arrive in a LATER micro-batch than their head line still stitch onto
it, which no per-batch windowing can do.

State per stream: the OPEN trailing event (ordered lines of the last
head seen, which future continuations may still extend) plus the
running emitted-event counter. A logical event is emitted when the
NEXT head line arrives (proof that the previous event is complete) or
when the state times out (processing-time timeout — the "log stream
went quiet" flush every production tailer needs, else the last trace
of a crashed process never ships).

Rows are ordered by line number WITHIN each batch; across batches the
state carries order (the same arrival-order contract as
streaming/ewma.py, and CloudWatch's own guarantee is per-stream
ordering). Leading continuations with no head ever seen emit as
orphan events on the same completion rules.

Scale: state is one partial event per ACTIVE stream — bounded by the
open-trace length; a timeout flush shrinks it to the bare emitted
counter (kept so event_no stays a true running per-stream counter
across quiet periods). The shuffle keys on the stream id, CloudWatch's
natural partition unit.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ML_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.StringType()),
        T.StructField("event_no", T.LongType()),
        T.StructField("head", T.StringType()),
        T.StructField("block", T.StringType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("orphan", T.BooleanType()),
    ]
)

_ML_STATE_SCHEMA = T.StructType(
    [
        T.StructField("open_lines", T.ArrayType(T.StringType())),
        T.StructField("open_is_head", T.BooleanType()),
        T.StructField("n_emitted", T.LongType()),
    ]
)


def _reassemble_factory(start_prefix_not: str, timeout_ms: int):
    """``start_prefix_not``: lines starting with this prefix are
    continuations; everything else is a head line."""

    def fold(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        stream = key[0]
        if state.hasTimedOut:
            # quiet-stream flush: ship the open event, but KEEP the
            # emitted counter — state.remove() here would restart
            # event_no at 1 on the stream's next line, duplicating
            # (stream, event_no) pairs in the append output. Re-seed
            # with an empty open event instead (the fold below treats
            # empty open_lines as "nothing pending").
            open_lines, open_is_head, n_emitted = state.get
            if open_lines:
                n_emitted += 1
            # No new timeout: the re-seeded (counter-only) state is a few
            # bytes and sleeps until the stream's next line arrives.
            state.update(([], False, n_emitted))
            if open_lines:
                yield pd.DataFrame(
                    {
                        "stream": [stream],
                        "event_no": [n_emitted],
                        "head": [open_lines[0] if open_is_head else None],
                        "block": ["\n".join(open_lines)],
                        "n_lines": [len(open_lines)],
                        "orphan": [not open_is_head],
                    }
                )
            return

        open_lines, open_is_head, n_emitted = (
            state.get if state.exists else ([], False, 0)
        )
        open_lines = list(open_lines)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            "line_no", kind="stable"
        )
        out = []
        for line in rows["line"]:
            is_head = not str(line).startswith(start_prefix_not)
            if is_head:
                if open_lines:  # previous event is complete: emit it
                    n_emitted += 1
                    out.append(
                        (stream, n_emitted, open_lines[0] if open_is_head
                         else None, "\n".join(open_lines), len(open_lines),
                         not open_is_head)
                    )
                open_lines, open_is_head = [str(line)], True
            else:
                open_lines.append(str(line))
                if not open_lines[:-1]:
                    open_is_head = False  # stream began mid-trace
        state.update((open_lines, open_is_head, n_emitted))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            out,
            columns=["stream", "event_no", "head", "block", "n_lines",
                     "orphan"],
        )

    return fold


def streaming_reassemble(
    lines: DataFrame,
    continuation_prefix: str = "  ",
    stream_col: str = "logStream",
    order_col: str = "line_no",
    line_col: str = "line",
    timeout_ms: int = 30_000,
) -> DataFrame:
    """Stateful streaming reassembly (append output mode): emits each
    logical event once, when its successor head arrives or the stream
    times out. ``lines`` must be a streaming frame."""
    keyed = lines.select(
        F.col(stream_col).cast("string").alias("stream"),
        F.col(order_col).cast("long").alias("line_no"),
        F.col(line_col).cast("string").alias("line"),
    ).groupBy("stream")
    return keyed.applyInPandasWithState(
        _reassemble_factory(continuation_prefix, timeout_ms),
        outputStructType=ML_OUTPUT_SCHEMA,
        stateStructType=_ML_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

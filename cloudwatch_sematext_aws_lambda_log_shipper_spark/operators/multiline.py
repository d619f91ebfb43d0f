"""Multi-line log reassembly: stitch continuation lines (stack-trace
frames, wrapped payloads, indented dumps) back onto their logical
event — the classic gap between "one CloudWatch logEvent per line" and
what applications actually emit. The reference ships each line as its
own document (shipper.js:71-83 iterates logEvents 1:1); real pipelines
reassemble first so a Java stack trace is ONE searchable event.

Spark-first shape: a per-stream lag-islands window — a line that does
NOT match the start predicate belongs to the most recent starting line
above it. island id = running count of start lines; one groupBy emits
the logical event (head line + ordered continuation block). Leading
orphan continuations (a stream beginning mid-trace, e.g. after a log
rotation cut) land in island 0 with a null head and are emitted
flagged, never silently dropped.

Scale: the window partitions by the stream id — log streams are the
natural unit of ordering (CloudWatch guarantees order only within a
stream), each bounded in rows; no global sort anywhere. The groupBy
shuffles on (stream, island), map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def reassemble_lines(
    df: DataFrame,
    is_start: Column,
    stream_col: str = "logStream",
    order_col: str = "line_no",
    line_col: str = "line",
) -> DataFrame:
    """(stream, event_no, head, block, n_lines, orphan) — one row per
    logical event. ``block`` is the full reassembled text (head +
    continuations joined with newlines, original order); ``orphan``
    marks a leading continuation run with no head line."""
    w = Window.partitionBy(stream_col).orderBy(order_col)
    df = df.withColumn("_start", is_start).withColumn(
        "_evt", F.sum(F.col("_start").cast("int")).over(w)
    )
    return (
        df.groupBy(stream_col, "_evt")
        .agg(
            F.max(F.when(F.col("_start"), F.col(line_col))).alias("head"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(order_col).alias("o"),
                                     F.col(line_col).alias("l"))
                        )
                    ),
                    lambda x: x["l"],
                ),
                "\n",
            ).alias("block"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            F.col(stream_col),
            F.col("_evt").cast("long").alias("event_no"),
            "head",
            "block",
            F.col("n_lines").cast("long").alias("n_lines"),
            (F.col("_evt") == 0).alias("orphan"),
        )
    )

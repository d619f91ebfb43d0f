"""Streaming sink into the transaction-log table format: foreachBatch
appends with the txn=(app_id, batch_id) idempotence key, giving
exactly-once delivery into an ACID table — the fact-scale answer the
SCD2 maintainer's docstring defers to ("a fact-scale mutable table
wants a log-structured table format"): appends are atomic multi-file
commits, concurrent readers get snapshot isolation mid-stream, every
micro-batch is a time-travelable version, and compaction/vacuum run
against the same log without stopping the stream.

Exactly-once protocol: foreachBatch is at-least-once — a failed batch
retries with the SAME batch_id. txlog.append records (app_id,
batch_id) in the commit; a retry whose txn is already at-or-below the
committed watermark is a NO-OP, and a crash between staging and commit
leaves only invisible staged files (vacuum()'s grace sweep reclaims
them). So each micro-batch lands in the table exactly once however
many times it is delivered.

Scale: the commit is O(1) driver-side metadata on top of an ordinary
distributed parquet write; the log checkpoint (every CHECKPOINT_EVERY
commits) bounds snapshot replay as the stream ages; zone maps /
partition metadata flow through append() unchanged, so downstream
pruned reads work on streaming tables too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..sources import txlog


class StreamingTableSink:
    """Drive a streaming DataFrame into a txlog table exactly once.

    ``app_id`` namespaces the idempotence key: two different streams
    appending to one table must use distinct app_ids (their batch_id
    sequences are independent).
    """

    def __init__(
        self,
        table: str,
        app_id: str = "stream",
        partition_by: str | None = None,
        stats_cols: list[str] | None = None,
    ) -> None:
        self.table = table
        self.app_id = app_id
        self.partition_by = partition_by
        self.stats_cols = stats_cols

    def ship_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        txlog.append(
            batch_df,
            self.table,
            txn=(self.app_id, int(batch_id)),
            partition_by=self.partition_by,
            stats_cols=self.stats_cols,
        )

    def start(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        available_now: bool = True,
    ) -> StreamingQuery:
        w = (
            stream_df.writeStream.foreachBatch(self.ship_batch)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
        )
        if available_now:
            w = w.trigger(availableNow=True)
        return w.start()

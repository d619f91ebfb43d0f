"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of the big fact-fact join (lineitem⋈orders)
is shuffling both sides on the join key. Writing both tables bucketed
(and sorted) by that key moves the partitioning to WRITE time: every
subsequent join/aggregation on the key reads co-located buckets and
skips the Exchange entirely. This module wraps the write/read pattern;
`tests/test_bucketing.py` pins the no-Exchange plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table.

    Sorting within buckets additionally enables merge joins without a
    per-task sort."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

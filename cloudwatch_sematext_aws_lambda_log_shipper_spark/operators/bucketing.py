"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the dominant cost of the big fact-fact join (lineitem⋈orders)
is shuffling both sides on the join key. Writing both tables bucketed
(and sorted) by that key moves the partitioning to WRITE time: every
subsequent join/aggregation on the key reads co-located buckets and
skips the Exchange entirely. This module wraps the write/read pattern;
`tests/test_bucketing.py` pins the no-Exchange plan.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str | list[str],
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed parquet table.
    ``bucket_col`` may be a composite key (list) — e.g. the LSH band
    join buckets on (band, key).

    Sorting within buckets additionally enables merge joins without a
    per-task sort."""
    cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A managed-table location can outlive the metastore entry (fresh
    # Derby metastore, persistent warehouse dir); clear the orphan so
    # saveAsTable doesn't fail with LOCATION_ALREADY_EXISTS.
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{table_name.lower()}", ignore_errors=True)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)

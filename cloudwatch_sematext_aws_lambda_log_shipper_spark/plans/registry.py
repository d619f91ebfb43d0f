"""Query registry: every implemented operator gets a named (spark_fn,
oracle_sql) pair consumed by __spark_entry__.py.

spark_fn(spark, sf_dir) -> DataFrame; oracle is equivalent DuckDB SQL
over the same parquet tables (views pre-registered by the driver).
Column names/aliases must match between the two — the driver's compare
sorts columns by name before value-hashing.

Determinism rules used throughout (so value hashes match DuckDB):
- money-ish sums go through DECIMAL casts (exact, order-independent),
  then CAST(... AS DOUBLE) for a stable final type;
- double multiplication happens on DECIMAL operands, never on raw
  doubles, so no engine-specific FP summation order leaks in;
- timestamps stay in UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query builder; oracle=None -> rows-only driver check."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


# Test tables store TIMESTAMP(NANOS) which vanilla Spark scans reject;
# read them as longs and convert to microsecond timestamps (identical
# truncation to DuckDB's ns->us read of the same files).
_NANOS_TS_COLS = {
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
    "events": ["ts"],
}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    dtypes = dict(df.dtypes)
    from pyspark.sql import functions as F

    for c in _NANOS_TS_COLS.get(table, []):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df

"""Skew mitigation: salted joins for hot keys.

First lines of defense at scale, in order: AQE skew-join splitting
(enabled in session.py) handles skewed sort-merge joins automatically;
map-side partial aggregation already absorbs groupBy skew for algebraic
aggregates. Manual salting remains necessary when (a) the skewed side
must hash-join against a non-broadcastable dimension, or (b) a single
key's rows exceed what one AQE sub-split should own.

The pattern: the big (skewed) side gets a deterministic salt derived
from a per-row unique column; the small side is replicated across all
salt values; the join key becomes (key, salt). Row multiplicity is
unchanged — results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, unique_col: str | Column, num_salts: int) -> DataFrame:
    """Deterministic salt in [0, num_salts) from a row-unique column
    (deterministic => retries/speculative tasks agree)."""
    col = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return df.withColumn("_salt", F.pmod(F.xxhash64(col), F.lit(num_salts)))


def replicate_salts(df: DataFrame, num_salts: int) -> DataFrame:
    """Cross the small side with every salt value (num_salts x rows)."""
    salts = F.array(*[F.lit(i).cast("long") for i in range(num_salts)])
    return df.withColumn("_salt", F.explode(salts))


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    unique_col: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small (but non-broadcastable) side on
    `on`, spreading each hot key over num_salts shuffle partitions.

    Cost model: small side pays num_salts x replication through the
    shuffle; the hot key's rows divide across num_salts reducers instead
    of melting one.
    """
    left = with_salt(skewed, unique_col, num_salts)
    right = replicate_salts(small, num_salts)
    return left.join(right, [on, "_salt"], how).drop("_salt")

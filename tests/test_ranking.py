"""operators/ranking.py: distributed ntile/rank must be bit-identical
to the window functions they replace (the DuckDB oracles keep using
plain ntile/percent_rank), while keeping every window in the plan
partitioned."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ranking import (
    with_global_ntile,
    with_global_rank,
)


def _frame(spark, n, groups=1, seed=7):
    # deterministic values with heavy ties (v = hash % 17) so tie-break
    # by unique id is load-bearing
    rows = [
        (i, i % groups, (i * 2654435761 + seed) % 17) for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, g int, v long")


@pytest.mark.parametrize("n,k", [(1, 4), (3, 4), (4, 4), (97, 4), (100, 10)])
def test_global_ntile_matches_window_ntile(spark, n, k):
    df = _frame(spark, n).repartition(5)
    got = with_global_ntile(
        df, k, [F.asc("v"), F.asc("id")], "tile"
    ).orderBy("id")
    want = df.withColumn(
        "tile", F.ntile(k).over(Window.orderBy(F.asc("v"), F.asc("id")))
    ).orderBy("id")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_global_ntile_desc_order(spark):
    df = _frame(spark, 83).repartition(4)
    got = with_global_ntile(
        df, 4, [F.desc("v"), F.asc("id")], "tile"
    ).orderBy("id")
    want = df.withColumn(
        "tile", F.ntile(4).over(Window.orderBy(F.desc("v"), F.asc("id")))
    ).orderBy("id")
    assert got.collect() == want.collect()


def test_partitioned_ntile_and_percent_rank(spark):
    df = _frame(spark, 120, groups=3).repartition(6)
    got = with_global_ntile(
        df,
        10,
        [F.asc("v"), F.asc("id")],
        "tile",
        partition_cols=["g"],
        rank_out="r",
        n_out="n",
    ).select(
        "id",
        "tile",
        F.when(F.col("n") > 1, (F.col("r") - 1) / (F.col("n") - 1))
        .otherwise(F.lit(0.0))
        .alias("pr"),
    )
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.select(
        "id",
        F.ntile(10).over(w).alias("tile"),
        F.percent_rank().over(w).alias("pr"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_global_rank_matches_row_number(spark):
    df = _frame(spark, 57).repartition(3)
    got = with_global_rank(df, [F.asc("v"), F.asc("id")], out="r")
    want = df.withColumn(
        "r",
        F.row_number()
        .over(Window.orderBy(F.asc("v"), F.asc("id")))
        .cast("long"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_layout_independence(spark):
    base = _frame(spark, 64)
    a = with_global_ntile(
        base.repartition(1), 4, [F.asc("v"), F.asc("id")], "t"
    )
    b = with_global_ntile(
        base.repartition(13, "v"), 4, [F.asc("v"), F.asc("id")], "t"
    )
    assert sorted(a.collect()) == sorted(b.collect())


def test_reserved_names_and_bad_k_rejected(spark):
    df = _frame(spark, 4).withColumnRenamed("v", "__rk_pid")
    with pytest.raises(ValueError, match="reserved"):
        with_global_rank(df, [F.asc("id")], out="r")
    with pytest.raises(ValueError, match="k >= 1"):
        with_global_ntile(_frame(spark, 4), 0, [F.asc("id")], "t")


def test_no_global_window_in_plan(spark):
    """The whole point: the physical plan the helper produces must not
    contain any Window with an empty partition spec."""
    from _plan_utils import global_windows

    df = _frame(spark, 50).repartition(4)
    out = with_global_ntile(df, 4, [F.asc("v"), F.asc("id")], "t")
    plan = out._jdf.queryExecution().optimizedPlan()
    offenders = global_windows(plan)
    assert not offenders, f"global windows in helper plan: {offenders}"


def test_null_partition_group_ranks_as_own_group(spark):
    """NULL group values must form their own partition (window
    PARTITION BY semantics), not silently drop through the offsets
    join."""
    rows = [(1, "a", 5), (2, "a", 3), (3, None, 7), (4, None, 1)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    got = with_global_ntile(
        df, 2, [F.asc("v"), F.asc("id")], "t", partition_cols=["g"]
    ).orderBy("id")
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("t", F.ntile(2).over(w)).orderBy("id")
    assert got.collect() == want.collect()
    assert got.count() == 4  # nothing dropped

"""Deterministic HyperLogLog (operators/sketches.py hll_estimate).

The sf-dir oracle run (events_daily_approx) only exercises the
linear-counting branch (~60 distinct users per group at sf0.01); these
tests additionally pin the RAW-estimator branch (> 2.5*m distinct),
the branch boundary replay against DuckDB, NULL handling, and layout
invariance (the register max is order/partition independent).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
    HLL_M,
    hll_estimate,
    hll_oracle_ctes,
)


def _df(spark, n, groups=1, nulls=0):
    rows = [(f"g{i % groups}", f"user-{i}") for i in range(n)]
    rows += [("g0", None)] * nulls
    return spark.createDataFrame(rows, "grp string, uid string")


def _duck_estimate(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (grp VARCHAR, uid VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = (
        "WITH "
        + hll_oracle_ctes("grp", "uid", "t").lstrip()
        + "\nSELECT grp, n_users_hll FROM hll ORDER BY grp"
    )
    return {g: v for g, v in con.sql(sql).fetchall()}


def test_linear_counting_branch_matches_duckdb(spark):
    # 100 distinct < 2.5*m = 640 -> ln correction path
    df = _df(spark, 100)
    got = {
        r["grp"]: r["n_users_hll"]
        for r in hll_estimate(df, ["grp"], "uid").collect()
    }
    want = _duck_estimate([(f"g0", f"user-{i}") for i in range(100)])
    assert got == want
    assert abs(got["g0"] - 100) / 100 <= 0.195


def test_raw_estimator_branch_matches_duckdb(spark):
    # 3000 distinct >> 640 -> the harmonic raw estimator path
    df = _df(spark, 3000)
    got = {
        r["grp"]: r["n_users_hll"]
        for r in hll_estimate(df, ["grp"], "uid").collect()
    }
    want = _duck_estimate([("g0", f"user-{i}") for i in range(3000)])
    assert got == want
    assert abs(got["g0"] - 3000) / 3000 <= 0.195


def test_nulls_ignored_and_duplicates_collapse(spark):
    base = _df(spark, 50)
    with_nulls_and_dups = base.union(_df(spark, 50, nulls=7))
    a = hll_estimate(base, ["grp"], "uid").collect()
    b = hll_estimate(with_nulls_and_dups, ["grp"], "uid").collect()
    assert a == b  # same distinct set -> identical registers -> same value


def test_layout_invariance(spark):
    df = _df(spark, 500, groups=3)
    a = sorted(map(tuple, hll_estimate(df, ["grp"], "uid").collect()))
    b = sorted(
        map(
            tuple,
            hll_estimate(df.repartition(13, "uid"), ["grp"], "uid").collect(),
        )
    )
    assert a == b


def test_register_table_is_bounded(spark):
    # the entire 100 TB argument: a group with any cardinality ships
    # at most HLL_M register rows through the final shuffle
    df = _df(spark, 5000)
    h = hll_estimate(df, ["grp"], "uid")
    assert h.count() == 1
    # rebuild the register table the operator aggregates over
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
        kmv_hash,
    )

    regs = (
        df.select("grp", (kmv_hash(F.col("uid")) % HLL_M).alias("i"))
        .distinct()
        .count()
    )
    assert regs <= HLL_M

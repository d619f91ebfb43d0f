"""Round-15 optimization pin (third batch): connected_components'
cost-ruled driver-side union-find.

Bounded pair graphs (every near-dup corpus the engine has ever
measured: unions of small template blobs) now resolve through ONE
bounded collect + exact union-find instead of 2+ rounds of
join/aggregate/blocking-action — the same probe-list-class bounded
collect as the ranking offsets. These tests pin:

  1. both paths produce BIT-IDENTICAL (node, component-min) labels on
     a graph mixing chains, cliques and pairs (flipped around the
     CC_DRIVER_MAX_EDGES env override);
  2. the threshold actually routes: 0 forces the distributed loop
     (observable through the extra Spark jobs it schedules).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
    connected_components,
)


def _pairs(spark):
    # chain of 6 (diameter 5 — multiple propagation rounds), two
    # interlocking triangles, an isolated pair, and a star
    rows = [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
        (20, 21), (21, 22), (20, 22), (22, 23), (23, 24), (22, 24),
        (30, 31),
        (40, 41), (40, 42), (40, 43),
    ]
    return spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in rows])


EXPECTED = {
    10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10,
    20: 20, 21: 20, 22: 20, 23: 20, 24: 20,
    30: 30, 31: 30,
    40: 40, 41: 40, 42: 40, 43: 40,
}


def test_driver_and_distributed_paths_identical(spark, monkeypatch):
    pairs = _pairs(spark)

    monkeypatch.setenv("CC_DRIVER_MAX_EDGES", "0")  # force distributed
    dist = sorted(
        (r.node, r.comp) for r in connected_components(pairs).collect()
    )
    monkeypatch.delenv("CC_DRIVER_MAX_EDGES")
    drv = sorted(
        (r.node, r.comp) for r in connected_components(pairs).collect()
    )

    assert dist == drv == sorted(EXPECTED.items())


def test_threshold_routes_to_distributed_loop(spark, monkeypatch):
    """CC_DRIVER_MAX_EDGES=0 must take the label-propagation loop —
    visible as >= 2 convergence-aggregate jobs in a fresh job group."""
    sc = spark.sparkContext
    pairs = _pairs(spark)

    monkeypatch.setenv("CC_DRIVER_MAX_EDGES", "0")
    sc.setJobGroup("cc_dist", "distributed CC")
    connected_components(pairs).collect()
    dist_jobs = len(sc.statusTracker().getJobIdsForGroup("cc_dist"))
    sc.setJobGroup(None, None)

    monkeypatch.delenv("CC_DRIVER_MAX_EDGES")
    sc.setJobGroup("cc_drv", "driver CC")
    connected_components(pairs).collect()
    drv_jobs = len(sc.statusTracker().getJobIdsForGroup("cc_drv"))
    sc.setJobGroup(None, None)

    # distributed: per-round convergence aggregates + final collect;
    # driver: the bounded limit-probe (CollectLimit may take a few
    # incremental partial jobs) + the final collect only
    assert dist_jobs > drv_jobs, (dist_jobs, drv_jobs)
    assert drv_jobs <= 5, drv_jobs


def test_max_edges_zero_and_one_boundary(spark, monkeypatch):
    """A graph of exactly N oriented edges stays on the driver path at
    CC_DRIVER_MAX_EDGES=N and flips to distributed at N-1 — both
    correct."""
    pairs = spark.createDataFrame([Row(id_a=1, id_b=2)])
    # one pair -> two oriented edges
    monkeypatch.setenv("CC_DRIVER_MAX_EDGES", "2")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1}
    monkeypatch.setenv("CC_DRIVER_MAX_EDGES", "1")
    got = {r.node: r.comp for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1}

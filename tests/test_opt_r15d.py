"""Round-15 optimization pin (fourth batch): cost-ruled driver-side
resolution of the bounded iterative graph ops.

Every iterative graph operator (pagerank, label propagation, k-core,
BFS) is a few integer rounds over an edge list; each distributed round
costs a join + aggregate + scheduling hop of almost pure fixed cost at
bench scale. Bounded edge sets now resolve by an exact driver-side
replay through the same probe-list-class bounded collect as
connected_components (tests/test_opt_r15c.py); past the bound (or
under a reliable-checkpoint request) the distributed loops are
byte-for-byte unchanged. These tests pin:

  1. BIT-IDENTICAL outputs on a graph mixing chains, cliques, a star,
     an isolated pair, a duplicate reversed edge and a self-loop,
     flipped around the GRAPH_DRIVER_MAX_EDGES env override;
  2. the threshold actually routes (0 forces the distributed loop,
     observable through the extra Spark jobs it schedules);
  3. the metadata estimate routes with ZERO probe jobs when the bound
     clears (est_edges <= threshold -> collect is probe AND data).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
    bfs_hops,
    kcore_survivors,
    label_propagation,
    pagerank,
)

# chain of 6 (diameter 5), two interlocking triangles, an isolated
# pair, a star, one duplicate reversed edge (sym-dedup pin) and one
# self-loop (LPA double-self-vote pin)
_EDGES = [
    (10, 11), (11, 12), (12, 13), (13, 14), (14, 15),
    (20, 21), (21, 22), (20, 22), (22, 23), (23, 24), (22, 24),
    (30, 31),
    (40, 41), (40, 42), (40, 43),
    (11, 10), (15, 15),
]


@pytest.fixture()
def edges(spark):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in _EDGES])


@pytest.fixture()
def seeds(spark):
    # 99 is an isolated seed: must still be emitted with hop 0
    return spark.createDataFrame([Row(node=n) for n in (10, 20, 99)])


def _rows(df):
    return sorted(map(tuple, df.collect()))


_OPS = {
    "pagerank": lambda e, s: pagerank(e, n_iter=4),
    "label_propagation": lambda e, s: label_propagation(e, n_iter=3),
    "kcore": lambda e, s: kcore_survivors(e, k=2, n_rounds=4),
    "bfs_hops": lambda e, s: bfs_hops(e, s, max_hops=3),
}


@pytest.mark.parametrize("op", sorted(_OPS))
def test_driver_and_distributed_paths_identical(
    spark, edges, seeds, op, monkeypatch
):
    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "1000000")
    via_driver = _rows(_OPS[op](edges, seeds))
    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "0")
    via_cluster = _rows(_OPS[op](edges, seeds))
    assert via_driver == via_cluster
    assert via_driver  # non-degenerate fixture


def test_threshold_routes_by_job_count(spark, edges, seeds, monkeypatch):
    tracker = spark.sparkContext.statusTracker()

    # job ids are sequential; len(getJobIdsForGroup) deltas break in a
    # long-lived session because the tracker EVICTS old job ids
    # (spark.ui.retainedJobs) — count scheduled jobs by max-id delta
    def max_jid():
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "1000000")
    before = max_jid()
    pagerank(edges, n_iter=4).collect()
    driver_jobs = max_jid() - before

    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "0")
    before = max_jid()
    pagerank(edges, n_iter=4).collect()
    cluster_jobs = max_jid() - before

    # driver path: the bounded probe-collect + the final local-relation
    # collect; distributed path schedules per-iteration work on top
    assert driver_jobs < cluster_jobs


def test_metadata_estimate_skips_probe(spark, edges, seeds, monkeypatch):
    # est_edges over the bound -> distributed with NO probe job;
    # under the bound -> one collect that IS the probe and the data
    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "10")
    over = _rows(pagerank(edges, n_iter=2, est_edges=11))
    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "1000000")
    under = _rows(pagerank(edges, n_iter=2, est_edges=len(_EDGES)))
    assert over == under


def test_reliable_checkpoint_stays_distributed(
    spark, edges, seeds, tmp_path, monkeypatch
):
    # a reliable-checkpoint request opts out of the driver path: its
    # point is cluster-side fault tolerance of the iteration
    monkeypatch.setenv("GRAPH_DRIVER_MAX_EDGES", "1000000")
    ckpt = str(tmp_path / "ckpt")
    with_ckpt = _rows(pagerank(edges, n_iter=3, checkpoint_dir=ckpt))
    without = _rows(pagerank(edges, n_iter=3))
    assert with_ckpt == without

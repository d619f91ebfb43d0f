"""Deterministic synchronous label propagation: community structure,
min-label tie-break, symmetrization, layout invariance."""

from __future__ import annotations

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
    label_propagation,
)


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_two_cliques_collapse_to_min_ids(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)]
    out = {r.node: r.community for r in
           label_propagation(_edges(spark, pairs), n_iter=5).collect()}
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]
    # min-label ties pull each clique to its smallest member
    assert out[1] == 1 and out[10] == 10


def test_edges_treated_undirected(spark):
    # all edges point one way; propagation must still flow both ways
    out = {r.node: r.community for r in
           label_propagation(_edges(spark, [(5, 6), (6, 7)]), n_iter=5).collect()}
    assert out[5] == out[6] == out[7] == 5


def test_star_center_adopts_min_label(spark):
    out = {r.node: r.community for r in
           label_propagation(_edges(spark, [(9, 2), (9, 4), (9, 6)]),
                             n_iter=1).collect()}
    # one synchronous round with self-votes: center sees {9,2,4,6} all
    # count 1 -> min label 2; each leaf ties {leaf, 9} -> keeps its own
    # (smaller) label
    assert out[9] == 2
    assert out[2] == 2 and out[4] == 4 and out[6] == 6
    # more rounds collapse the whole star onto the min label
    out5 = {r.node: r.community for r in
            label_propagation(_edges(spark, [(9, 2), (9, 4), (9, 6)]),
                              n_iter=5).collect()}
    assert set(out5.values()) == {2}


def test_layout_invariant(spark):
    pairs = [(i, i + 1) for i in range(0, 40, 2)] + [(i, i + 2) for i in range(0, 38, 2)]
    e = _edges(spark, pairs)
    a = sorted((r.node, r.community)
               for r in label_propagation(e.repartition(1), n_iter=4).collect())
    b = sorted((r.node, r.community)
               for r in label_propagation(e.repartition(16, "src"), n_iter=4).collect())
    assert a == b

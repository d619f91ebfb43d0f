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


# --- MMR selection -------------------------------------------------------


def test_mmr_balances_relevance_and_diversity(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        mmr_select,
    )

    # query along +x; two equally-relevant directions, one of them
    # duplicated — MMR must prefer the unexplored direction over the
    # duplicates, while pure top-k relevance would take the twins first
    pts = {
        1: [1.0, 0.3, 0.0],
        2: [1.0, 0.3, 0.0],    # exact duplicate of 1
        3: [1.0, 0.301, 0.0],  # near-duplicate of 1
        4: [1.0, -0.3, 0.0],   # equally relevant, diverse
        5: [-1.0, 0.0, 0.0],   # irrelevant
    }
    df = spark.createDataFrame(
        [Row(vec_id=k, embedding=[float(x) for x in v]) for k, v in pts.items()]
    )
    sel = mmr_select(df, query_u=[1.0, 0.0, 0.0], k=3, lam=0.5)
    picked = [cid for _, cid, _ in sel]
    assert picked[0] == 1  # most relevant (min id among ties) seeds
    # second pick is the DIVERSE equally-relevant point, not a twin
    assert picked[1] == 4
    assert 5 not in picked


def test_mmr_layout_invariant_and_stops_at_n(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        mmr_select,
    )

    rows = [
        Row(vec_id=i, embedding=[float((i * 7 + j) % 5 - 2) for j in range(4)])
        for i in range(1, 20)
    ]
    df = spark.createDataFrame(rows)
    q = [1.0, 0.0, 0.0, 0.0]
    a = mmr_select(df.repartition(1), query_u=q, k=6)
    b = mmr_select(df.repartition(13, "vec_id"), query_u=q, k=6)
    assert a == b
    tiny = spark.createDataFrame(rows[:3])
    assert len(mmr_select(tiny, query_u=q, k=10)) == 3  # k > n stops


# --- triangle counting ----------------------------------------------------


def test_triangle_counts_on_known_graph(spark):
    import os, tempfile
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import llmops  # noqa: F401
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import QUERIES

    # 4 near-identical vectors (K4 at any sane threshold) + 2 isolated
    vecs = {
        1: [1.0, 0.0, 0.0], 2: [0.999, 0.01, 0.0],
        3: [0.998, 0.02, 0.0], 4: [0.997, 0.03, 0.0],
        50: [0.0, 1.0, 0.0], 60: [0.0, 0.0, 1.0],
    }
    rows = [Row(vec_id=k, embedding=[float(x) for x in v], label=0)
            for k, v in vecs.items()]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).selectExpr(
            "vec_id", "CAST(embedding AS ARRAY<FLOAT>) AS embedding", "label"
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r.vec_id: r.n_triangles
               for r in QUERIES["embedding_triangle_counts"](spark, d).collect()}
    # K4 has C(3,2)=3 triangles through each vertex, none elsewhere
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_peels_pendants_keeps_clique(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
        kcore_survivors,
    )

    # triangle {1,2,3} with a pendant chain 3-4-5
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    out = kcore_survivors(_edges(spark, pairs), k=2, n_rounds=6).collect()
    nodes = {r.node: r.degree for r in out}
    assert set(nodes) == {1, 2, 3}
    assert all(d == 2 for d in nodes.values())
    assert all(r.converged for r in out)
    # k=3 on a triangle-only graph peels everything
    out3 = kcore_survivors(_edges(spark, pairs), k=3, n_rounds=6).collect()
    assert out3 == []

"""Round-15 optimization pins: the Arrow numpy fold kernel that now
backs IVF probe scoring (ivf_exact.fold_dot_frame) and the k-NN-graph
candidate rescore must be BIT-IDENTICAL to the SQL expression forms it
replaced — the same exactness contract as _exact_fold_gram (one IEEE
multiply+add per element in left-fold order, no FMA, no reordering).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import (
    ivf_exact,
    similarity,
)


def _pairs_df(spark, n=50, dim=16, with_nulls=True, with_zero=False):
    rows = []
    for i in range(n):
        a = [math.sin(i * dim + d) * (d + 1) for d in range(dim)]
        b = [math.cos(i * dim + d) / (d + 1) for d in range(dim)]
        rows.append((i, a, b))
    if with_nulls:
        rows.append((n, None, [0.5] * dim))
        rows.append((n + 1, [0.25] * dim, None))
    if with_zero:
        rows.append((n + 2, [0.0] * dim, [1.0] * dim))  # 0-norm row
    return spark.createDataFrame(
        rows, "pid long, va array<double>, vb array<double>"
    )


@pytest.mark.parametrize("normalize", [False, True])
def test_fold_dot_frame_bit_equals_sql_form(spark, monkeypatch, normalize):
    monkeypatch.delenv("SPARK_GRAFT_FOLD_KERNEL", raising=False)
    df = _pairs_df(spark)
    got = {
        r["pid"]: r["cos"]
        for r in ivf_exact.fold_dot_frame(
            df, "va", "vb", ["pid"], normalize=normalize, dim=16
        ).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_FOLD_KERNEL", "sql")
    want = {
        r["pid"]: r["cos"]
        for r in ivf_exact.fold_dot_frame(
            df, "va", "vb", ["pid"], normalize=normalize, dim=16
        ).collect()
    }
    assert set(got) == set(want)
    for pid, w in want.items():
        g = got[pid]
        if w is None:
            assert g is None, pid
        else:
            # BIT identity, not approx
            assert g == w and math.copysign(1, g) == math.copysign(1, w), pid


def test_fold_dot_frame_zero_norm_yields_nan(spark, monkeypatch):
    # a zero-norm vector under normalize=True is a 0/0: the SQL form
    # (and the pre-r15 `cosine()` expression) THROWS under Spark 4's
    # ANSI division — no declared query ever feeds one — while the
    # numpy kernel yields IEEE NaN; pin the kernel's behavior so it
    # can't silently become 0.0 or a row drop
    monkeypatch.delenv("SPARK_GRAFT_FOLD_KERNEL", raising=False)
    df = _pairs_df(spark, n=2, with_nulls=False, with_zero=True)
    rows = {
        r["pid"]: r["cos"]
        for r in ivf_exact.fold_dot_frame(
            df, "va", "vb", ["pid"], normalize=True
        ).collect()
    }
    assert math.isnan(rows[4])


def test_fold_dot_frame_matches_interpreted_hof_cosine(spark, monkeypatch):
    # normalize=True against the exact `cosine()` HOF expression the
    # k-NN-graph rescore used before r15
    monkeypatch.delenv("SPARK_GRAFT_FOLD_KERNEL", raising=False)
    df = _pairs_df(spark, with_nulls=False)
    got = {
        r["pid"]: r["cos"]
        for r in ivf_exact.fold_dot_frame(
            df, "va", "vb", ["pid"], normalize=True
        ).collect()
    }
    want = {
        r["pid"]: r["cos"]
        for r in df.select(
            "pid",
            similarity.cosine(F.col("va"), F.col("vb")).alias("cos"),
        ).collect()
    }
    assert got == want


def test_knn_graph_rescore_unchanged_by_kernel(spark):
    # end to end: the k-NN graph edge set and cosines after the r15
    # rescore-kernel swap equal a brute-force exact ranking
    emb = spark.createDataFrame(
        [
            (i, [math.sin(i + d) for d in range(8)])
            for i in range(30)
        ],
        "vec_id long, embedding array<double>",
    )
    g = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.knn_graph(emb, k=3).collect()
    }
    # brute force with the same sequential-fold cosine + (cos DESC, id)
    rows = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in rows}

    def fold(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    for i, vi in vecs.items():
        scored = []
        for j, vj in vecs.items():
            if j == i:
                continue
            c = fold(vi, vj) / (
                math.sqrt(fold(vi, vi)) * math.sqrt(fold(vj, vj))
            )
            scored.append((-c, j))
        scored.sort()
        for rnk, (negc, j) in enumerate(scored[:3], start=1):
            nid, cos = g[(i, rnk)]
            assert nid == j
            assert cos == round(-negc, 6)


def test_graph_prepartition_flip_bit_equal(spark, monkeypatch):
    """The graph pre-partitioning cost rule (opt r15): forcing the
    crossover on vs off must change ONLY exchange placement, never a
    value — pagerank/bfs/label_propagation results are bit-equal on
    both sides of the flip."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import (
        graph as G,
    )

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(60) for _ in range(1)]
        + [(i % 23, (i * 11 + 5) % 23) for i in range(40)],
        "src long, dst long",
    ).filter("src != dst")
    srcs = spark.createDataFrame([(0,), (1,)], "node long")

    def run():
        pr = sorted(
            (r["node"], r["pr_scaled"])
            for r in G.pagerank(edges, n_iter=4, est_edges=100).collect()
        )
        bf = sorted(
            (r["node"], r["hop"])
            for r in G.bfs_hops(
                edges, srcs, max_hops=3, est_edges=100
            ).collect()
        )
        lp = sorted(
            (r["node"], r["community"])
            for r in G.label_propagation(
                edges, n_iter=3, est_edges=100
            ).collect()
        )
        return pr, bf, lp

    monkeypatch.setattr(G, "GRAPH_PREPARTITION_MIN_EDGES", 1)  # force ON
    on = run()
    monkeypatch.setattr(G, "GRAPH_PREPARTITION_MIN_EDGES", 10**9)  # OFF
    off = run()
    assert on == off

"""Round-12: exact-arith ANN beyond dim=64 (r11 verdict #3).

dim-768 (and a 1536 fit sanity) through fit_centroids_exact /
ann_topk_ivf_exact / ann_topk_ivfpq_exact, with the DuckDB oracle
replaying fit + search bit-for-bit at dim 768. Above
DOT_UNROLL_MAX_DIM the engine evaluates the HOF fold instead of the
unrolled expression (janino cannot compile a 768-term method); the
bit-equality of the two forms is pinned here."""

from __future__ import annotations

import math
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import ivf_exact as ix
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
    DOT_UNROLL_MAX_DIM,
    dot,
    dot_cols,
)


def _vecs(n, dim, off=0):
    return [
        (i, [math.sin(0.31 * (i + off) + 0.017 * d) for d in range(dim)])
        for i in range(n)
    ]


def _corpus(spark, n, dim):
    return spark.createDataFrame(
        _vecs(n, dim), "vec_id long, embedding array<double>"
    )


def test_hof_fold_bit_equals_unrolled(spark, monkeypatch):
    # the dim > DOT_UNROLL_MAX_DIM fallback (and the default
    # unroll-off policy, r12) returns the HOF fold; its values must be
    # BIT-identical to the unrolled form — pinned at the widest dim
    # the unrolled form still compiles, with the opt-in env forced ON
    # so the unrolled expression is genuinely built
    assert DOT_UNROLL_MAX_DIM >= 64
    df = (
        spark.createDataFrame(
            [
                (i, [math.sin(i + d) for d in range(64)],
                 [math.cos(i * 3 + d) for d in range(64)])
                for i in range(200)
            ],
            "i long, a array<double>, b array<double>",
        )
        .localCheckpoint(eager=True)
    )
    monkeypatch.setenv("SPARK_GRAFT_DOT_UNROLL", "1")
    unrolled = dot_cols(F.col("a"), F.col("b"), 64).alias("unrolled")
    monkeypatch.delenv("SPARK_GRAFT_DOT_UNROLL")
    default = dot_cols(F.col("a"), F.col("b"), 64).alias("default_fold")
    rows = df.select(
        unrolled, default, dot(F.col("a"), F.col("b")).alias("hof"),
    ).collect()
    assert all(r["unrolled"] == r["hof"] == r["default_fold"] for r in rows)


def test_dim768_fit_produces_unit_centroids(spark):
    corpus = _corpus(spark, 60, 768)
    centers = ix.fit_centroids_exact(corpus, n_clusters=4, iters=1, dim=768)
    assert len(centers) == 4 and all(len(c) == 768 for c in centers)
    for c in centers:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-6


def test_dim1536_fit_sanity(spark):
    corpus = _corpus(spark, 30, 1536)
    centers = ix.fit_centroids_exact(corpus, n_clusters=2, iters=1, dim=1536)
    assert len(centers) == 2 and all(len(c) == 1536 for c in centers)
    for c in centers:
        assert abs(math.sqrt(sum(x * x for x in c)) - 1.0) < 1e-6


def test_dim768_ivf_matches_duckdb_oracle(spark):
    # end-to-end parity: the engine's dim-768 fit + assignment + probes
    # + scoring vs the chained-CTE oracle over the same parquet
    import duckdb

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _ivf_prelude_ctes,
        _lloyd_ctes,
        _ivf_search_ctes,
    )

    dim, k, n_clusters, nprobe, iters = 768, 3, 6, 3, 2
    emb = _corpus(spark, 66, dim)  # vec_id < 10 = queries, >= 10 = corpus
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "emb.parquet")
        emb.coalesce(1).write.parquet(path)
        corpus = emb.filter(F.col("vec_id") >= 10)
        queries = emb.filter(F.col("vec_id") < 10)
        got = sorted(
            (r["query_id"], r["neighbor_id"], r["cosine"], r["rnk"])
            for r in ix.ann_topk_ivf_exact(
                corpus, queries, k=k, n_clusters=n_clusters,
                nprobe=nprobe, iters=iters, dim=dim,
            ).collect()
        )
        lines = _ivf_prelude_ctes()
        lines += _lloyd_ctes(n_clusters, iters, "ivf", dim)
        lines += _ivf_search_ctes(f"c{iters}", nprobe)
        lines.append(
            "ann AS (SELECT query_id, neighbor_id, cos,"
            " row_number() OVER (PARTITION BY query_id"
            " ORDER BY cos DESC, neighbor_id) AS rnk"
            " FROM (SELECT p.query_id, a.vec_id AS neighbor_id,"
            " list_dot_product(p.qu, a.u) AS cos"
            f" FROM probes p JOIN afin a ON p.j = a.j) QUALIFY rnk <= {k})"
        )
        sql = (
            "\n".join(lines)
            + "\nSELECT query_id, neighbor_id,"
            " CAST(ROUND(cos, 6) AS DOUBLE) AS cosine,"
            " CAST(rnk AS INT) AS rnk FROM ann"
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW embeddings AS SELECT * FROM '{path}/*.parquet'"
        )
        want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want and len(got) == 10 * k


def test_dim768_ivfpq_end_to_end(spark):
    corpus = _corpus(spark, 60, 768).filter(F.col("vec_id") >= 6)
    queries = _corpus(spark, 60, 768).filter(F.col("vec_id") < 6)
    out = ix.ann_topk_ivfpq_exact(
        corpus, queries, k=3, n_clusters=4, nprobe=2, m=4, n_codes=8,
        refine_factor=4, iters=1, pq_iters=1, dim=768,
    ).collect()
    assert len(out) == 18
    assert all(abs(r["cosine"]) <= 1.000001 for r in out)
    assert all(1 <= r["rnk"] <= 3 for r in out)


def _py_unit(vec):
    acc = 0.0
    for x in vec:
        acc += x * x
    n = max(acc ** 0.5, 1e-12)
    return [x / n for x in vec]


def _py_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def test_dim768_kcenter_matches_python_reference(spark):
    # k-center is dim-agnostic by construction (HOF fold); this pins
    # BIT-equality of the dim-768 selection against a pure-Python
    # replay of the same greedy (normalize -> 1 - fold-dot -> running
    # min -> (dist DESC, id) argmax, selected pinned to 0 by identity)
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        kcenter_sample,
    )

    rows = _vecs(40, 768)
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = kcenter_sample(corpus, m=5)

    units = {i: _py_unit(v) for i, v in rows}
    sel = [min(units)]
    want = [(1, sel[0], None)]
    md = {i: None for i in units}
    for step in range(2, 6):
        c = units[sel[-1]]
        for i in units:
            d = 1.0 - _py_dot(units[i], c)
            if i == sel[-1]:
                md[i] = 0.0
            elif md[i] is None:
                md[i] = d
            else:
                md[i] = min(md[i], d)
        far = max(md.items(), key=lambda kv: (kv[1], -kv[0]))
        want.append((step, far[0], far[1]))
        sel.append(far[0])
    assert got == want


def test_dim768_mmr_select_runs_and_is_deterministic(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        mmr_select,
    )

    rows = _vecs(40, 768)
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = _py_unit([math.cos(0.01 * d) for d in range(768)])
    a = mmr_select(corpus, q, k=4)
    b = mmr_select(corpus, q, k=4)
    assert a == b
    assert len(a) == 4 and len({i for _, i, _ in a}) == 4

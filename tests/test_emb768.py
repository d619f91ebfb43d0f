"""Round-13: dim-768 ANN in the DECLARED surface (verdict #1).

The derived dim-768 corpus (plans/llmops._emb768) must be bit-equal
between the Spark expression and the oracle's list_transform SQL, and
the declared query must run end-to-end with its recall audit.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
    _EMB768_DIM,
    _emb768,
    _ivf768_prelude_ctes,
    embedding_ann_ivf_768,
)


def test_emb768_derivation_bit_equals_oracle(spark, sf_dir):
    got = {
        r["vec_id"]: list(r["embedding"])
        for r in _emb768(spark, sf_dir)
        .filter(F.col("vec_id") < 25)
        .collect()
    }
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" '{sf_dir}/embeddings.parquet'"
    )
    # reuse the oracle's own prelude so the test pins the exact SQL the
    # driver will run (first two CTEs = the derivation)
    prelude = "\n".join(_ivf768_prelude_ctes()[:2]).rstrip(",")
    want = {
        vid: list(v)
        for vid, v in con.sql(
            prelude + "\nSELECT vec_id, e FROM emb WHERE vec_id < 25"
        ).fetchall()
    }
    assert set(got) == set(want) and len(got) >= 20
    for vid in got:
        assert len(got[vid]) == _EMB768_DIM
        assert got[vid] == want[vid], vid  # BIT equality, all 768


def test_emb768_is_full_rank_not_a_pure_tiling(spark, sf_dir):
    # the noise term must break the rank-64 degeneracy: tile 0 and
    # tile 1 of the same vector are NOT proportional
    row = (
        _emb768(spark, sf_dir).filter(F.col("vec_id") == 0).collect()[0]
    )
    v = list(row["embedding"])
    t0, t1 = v[:64], v[64:128]
    ratios = {round(b / a, 6) for a, b in zip(t0, t1) if abs(a) > 1e-9}
    assert len(ratios) > 10  # a pure tiling would give one ratio


def test_embedding_ann_ivf_768_end_to_end(spark, sf_dir):
    out = embedding_ann_ivf_768(spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 10
    assert {"query_id", "neighbor_id", "cosine", "rnk", "recall_at_k",
            "recall_ok"} <= set(out.columns)
    assert all(abs(r["cosine"]) <= 1.000001 for r in rows
               if r["cosine"] is not None)
    # the audit gate must hold (recall floor 0.45 at nprobe=3/8)
    assert all(r["recall_ok"] for r in rows)


def test_unit_numpy_kernel_bit_equals_sql_fold(spark):
    # _unit's dim>128 numpy path must produce the IDENTICAL doubles as
    # the SQL fold form (same left-fold norm, same max, same division)
    import math

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ivf_exact import (
        _unit,
    )

    df = spark.createDataFrame(
        [
            (i, [math.sin(0.31 * i + 0.017 * d) for d in range(768)])
            for i in range(40)
        ],
        "vec_id long, embedding array<double>",
    ).localCheckpoint(eager=True)
    a = {
        r["vec_id"]: list(r["_u"])
        for r in _unit(df, "vec_id", "embedding", "vec_id", 768,
                       kernel="sql").collect()
    }
    b = {
        r["vec_id"]: list(r["_u"])
        for r in _unit(df, "vec_id", "embedding", "vec_id", 768,
                       kernel="numpy").collect()
    }
    assert a == b and len(a) == 40


def test_embedding_ann_ivfpq_768_end_to_end(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        embedding_ann_ivfpq_768,
    )

    out = embedding_ann_ivfpq_768(spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 10
    assert {"query_id", "neighbor_id", "cosine", "rnk", "recall_at_k",
            "recall_ok"} <= set(out.columns)
    assert all(abs(r["cosine"]) <= 1.000001 for r in rows
               if r["cosine"] is not None)
    assert all(r["recall_ok"] for r in rows)


def test_embedding_ann_lsh_768_end_to_end(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        embedding_ann_lsh_768,
    )

    out = embedding_ann_lsh_768(spark, sf_dir)
    rows = out.collect()
    assert len(rows) >= 10
    assert {"query_id", "neighbor_id", "cosine", "rnk", "recall_at_k",
            "recall_ok"} <= set(out.columns)
    assert all(r["recall_ok"] for r in rows)


def test_lsh768_tolerates_null_embeddings_and_string_ids(spark):
    # NULL embeddings flow through the wide (numpy-kernel) LSH path as
    # NULL scores in bucket 0 — the same as the narrow SQL path — and
    # the kernels preserve a non-long id column's type end-to-end
    import math

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ivf_exact import (
        ann_topk_lsh_exact,
    )

    rows = [
        (f"doc{i}", [math.sin(0.31 * i + 0.017 * d) for d in range(768)])
        for i in range(30)
    ] + [("docnull", None)]
    corpus = spark.createDataFrame(
        rows, "doc_id string, embedding array<double>"
    ).filter("doc_id != 'doc0'")
    queries = spark.createDataFrame(
        rows[:1], "doc_id string, embedding array<double>"
    )
    out = ann_topk_lsh_exact(
        corpus=corpus, queries=queries, k=3, num_planes=4,
        id_col="doc_id", dim=768,
    ).collect()
    assert 1 <= len(out) <= 3
    assert all(isinstance(r["query_id"], str) for r in out)
    assert all(r["neighbor_id"] != "docnull" or r["cosine"] is None
               for r in out)

"""Round-12: md5-sampled exact-recall audits (r11 verdict #1).

The O(N^2 d) ground-truth passes behind embedding_knn_graph_ivf /
embedding_semdedup now run only for a deterministic md5-gated query
subset. These tests pin the sampling rule, prove the numpy exact-fold
kernels are bit-identical to the JVM/DuckDB arithmetic, and plant a
recall failure to watch the gate flip."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import ivf_exact as ix
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
    AUDIT_HEX_CHARS,
    AUDIT_SALT,
    audit_sample_pred,
    cosine_topk,
    dot_cols,
    with_recall_at_k,
)


def _corpus(spark, n=160, dim=8):
    rows = [
        (i, [math.sin(0.7 * i + 1.3 * d) for d in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_audit_sample_rule_pinned(spark):
    # the subset size is PINNED: 1/16 of ids (first md5 hex char '0'),
    # salt 'audit' — the DuckDB oracles replay this string-for-string
    assert AUDIT_HEX_CHARS == ("0",)
    assert AUDIT_SALT == "audit"
    df = spark.range(4096).select(F.col("id").alias("vec_id"))
    got = sorted(
        r["vec_id"]
        for r in df.filter(audit_sample_pred(F.col("vec_id"))).collect()
    )
    want = sorted(
        i
        for i in range(4096)
        if hashlib.md5(f"{i}audit".encode()).hexdigest()[0] in AUDIT_HEX_CHARS
    )
    assert got == want
    assert 150 < len(got) < 370  # ~4096/16 = 256


def test_exact_fold_gram_matches_dot_cols(spark):
    # the numpy per-dim fold must be BIT-identical to the unrolled JVM
    # left-fold (and therefore to DuckDB's list_dot_product)
    import numpy as np

    rng = np.random.RandomState(5)
    Q = rng.uniform(-1, 1, size=(7, 16))
    C = rng.uniform(-1, 1, size=(9, 16))
    got = ix._exact_fold_gram(Q, C)
    qdf = spark.createDataFrame(
        [(i, list(map(float, Q[i]))) for i in range(7)], "qi int, q array<double>"
    )
    cdf = spark.createDataFrame(
        [(j, list(map(float, C[j]))) for j in range(9)], "cj int, c array<double>"
    )
    rows = (
        qdf.crossJoin(cdf)
        .localCheckpoint(eager=True)
        .select("qi", "cj", dot_cols(F.col("q"), F.col("c"), 16).alias("d"))
        .collect()
    )
    for r in rows:
        jvm = r["d"]
        np_v = got[r["qi"], r["cj"]]
        assert jvm == np_v, (r["qi"], r["cj"], jvm, np_v)


def test_exact_fold_topk_matches_jvm_cosine_topk(spark):
    corpus = _corpus(spark, n=120, dim=8)
    audited = corpus.filter(audit_sample_pred(F.col("vec_id")))
    assert audited.count() > 0
    got = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in ix.exact_fold_topk(
            corpus, audited, k=3, exclude_self=True
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(
            corpus, audited, k=3, dim=8, exclude_self=True
        ).collect()
    )
    assert got == want and got


def test_cosine_pairs_exact_audit_matches_bruteforce(spark):
    import numpy as np

    corpus = _corpus(spark, n=120, dim=8)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in ix.cosine_pairs_exact_audit(
            corpus, threshold=0.9, dim=8
        ).collect()
    )
    rows = corpus.collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"]) for r in rows}
    sampled = {
        i
        for i in vecs
        if hashlib.md5(f"{i}audit".encode()).hexdigest()[0] == "0"
    }
    want = []
    for a in vecs:
        for b in sampled:
            if a < b:
                va, vb = vecs[a], vecs[b]
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if cos >= 0.9:
                    want.append((a, b))
    assert got == sorted(want) and got


def test_recall_gate_flips_on_planted_failure(spark):
    # exact side: the audited queries' true top-1; ann side A: matches
    # it (gate True); ann side B: deliberately wrong neighbors for every
    # audited query (gate False). Un-audited ann rows carry NULL recall.
    corpus = _corpus(spark, n=160, dim=8)
    audited = corpus.filter(audit_sample_pred(F.col("vec_id")))
    exact = ix.exact_fold_topk(corpus, audited, k=1, exclude_self=True)
    good = exact.select(
        "query_id", "neighbor_id", F.lit(1.0).alias("cosine"),
        F.lit(1).alias("rnk"),
    )
    ok = with_recall_at_k(
        good, exact, k=1, min_mean_recall=0.5, audit_sampled=True
    ).collect()
    assert ok and all(r["recall_ok"] for r in ok)
    bad = exact.select(
        "query_id",
        (-F.col("neighbor_id") - 1).alias("neighbor_id"),  # never matches
        F.lit(1.0).alias("cosine"),
        F.lit(1).alias("rnk"),
    )
    flipped = with_recall_at_k(
        bad, exact, k=1, min_mean_recall=0.5, audit_sampled=True
    ).collect()
    assert flipped and not any(r["recall_ok"] for r in flipped)
    assert all(r["recall_at_k"] == 0.0 for r in flipped)


def test_unaudited_rows_carry_null_recall(spark):
    corpus = _corpus(spark, n=160, dim=8)
    audited = corpus.filter(audit_sample_pred(F.col("vec_id")))
    exact = ix.exact_fold_topk(corpus, audited, k=2, exclude_self=True)
    ann = cosine_topk(corpus, corpus, k=2, dim=8, exclude_self=True)
    out = with_recall_at_k(
        ann, exact, k=2, min_mean_recall=0.5, audit_sampled=True
    ).collect()
    audited_ids = {r["vec_id"] for r in audited.collect()}
    for r in out:
        if r["query_id"] in audited_ids:
            assert r["recall_at_k"] is not None
        else:
            assert r["recall_at_k"] is None
    # every query produced rows (ann covers all); gate is True (ann
    # here IS brute-force exact)
    assert all(r["recall_ok"] for r in out)


def test_semdedup_gate_zero_denominator_reads_true(spark):
    # threshold high enough that the audited exact pair set is EMPTY:
    # the gate's zero-denominator convention is recall 1.0 / True
    # (nothing to find => nothing missed), matching the oracle's CASE
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ivf_exact import (
        cosine_pairs_exact_audit,
    )

    corpus = _corpus(spark, n=80, dim=8)
    assert cosine_pairs_exact_audit(corpus, threshold=0.999999, dim=8).count() == 0

"""r14 ADVICE + verdict #6 pins: the cost-rule derivation must not run
count() jobs it cannot act on, and every dot_cols decision must be
recordable for the bench artifact."""

from __future__ import annotations

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import similarity
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ivf_exact import (
    _derive_est_scored_rows,
    _footer_row_bound,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
    dot_cols,
    drain_dot_decisions,
)


class _CountProbe:
    """Stands in for a localCheckpointed frame; records whether the
    derivation fell through to an exact count."""

    def __init__(self, n):
        self.n = n
        self.counted = False

    def count(self):
        self.counted = True
        return self.n


def test_derive_skipped_entirely_when_strategy_forced(monkeypatch):
    """SPARK_GRAFT_DOT_UNROLL set -> the estimate cannot flip the
    strategy, so no count job may run."""
    cn, qn = _CountProbe(10**9), _CountProbe(10**6)
    for forced in ("1", "0"):
        monkeypatch.setenv("SPARK_GRAFT_DOT_UNROLL", forced)
        assert _derive_est_scored_rows(cn, qn, 8, 16) is None
    assert not cn.counted and not qn.counted


def test_footer_row_bound_parquet_vs_memory(spark, tmp_path):
    df = spark.range(123).toDF("x")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    scanned = spark.read.parquet(p)
    assert _footer_row_bound(scanned) == 123
    # filters/projections keep the (upper) bound readable
    assert _footer_row_bound(scanned.filter("x < 5").select("x")) == 123
    # in-memory frames have no input files -> None
    assert _footer_row_bound(spark.createDataFrame([(1,)], "x int")) is None


def test_derive_footer_bound_short_circuits_counts(spark, tmp_path):
    """When the parquet-footer UPPER bound already sits below the
    codegen crossover, exact counts cannot flip the rule — no count
    job runs and the bound is returned as the estimate."""
    corpus = spark.range(200).toDF("x")
    queries = spark.range(10).toDF("x")
    cp, qp = str(tmp_path / "c.parquet"), str(tmp_path / "q.parquet")
    corpus.write.parquet(cp)
    queries.write.parquet(qp)
    cn, qn = _CountProbe(200), _CountProbe(10)
    est = _derive_est_scored_rows(
        cn, qn, nprobe=8, n_clusters=16,
        raw_corpus=spark.read.parquet(cp),
        raw_queries=spark.read.parquet(qp),
        multiplier=4,
    )
    assert est == int(10 * 200 * 8 / 16) * 4
    assert not cn.counted and not qn.counted


def test_derive_falls_through_to_counts_above_crossover(
    spark, tmp_path, monkeypatch
):
    """An upper bound AT/above the crossover cannot prove the fold is
    right — the exact counts must run (and they decide)."""
    monkeypatch.setattr(similarity, "DOT_UNROLL_CROSSOVER_ROWS", 100)
    corpus = spark.range(50).toDF("x")
    cp = str(tmp_path / "c.parquet")
    corpus.write.parquet(cp)
    cn, qn = _CountProbe(50), _CountProbe(10)
    est = _derive_est_scored_rows(
        cn, qn, nprobe=8, n_clusters=16,
        raw_corpus=spark.read.parquet(cp),
        raw_queries=spark.read.parquet(cp),
    )
    assert est == int(10 * 50 * 8 / 16)
    assert cn.counted and qn.counted


def test_dot_decisions_recorded_and_drained(spark):
    import pyspark.sql.functions as F

    drain_dot_decisions()
    a = F.col("a")
    dot_cols(a, a, 4, est_rows=7)                    # below crossover
    dot_cols(a, a, 4, est_rows=10**9)                # above crossover
    dot_cols(a, a, 4)                                # no estimate
    got = drain_dot_decisions()
    assert [d["strategy"] for d in got] == ["hof-fold", "unrolled",
                                            "hof-fold"]
    assert [d["est_rows"] for d in got] == [7, 10**9, None]
    assert all(d["dim"] == 4 for d in got)
    # drained means drained
    assert drain_dot_decisions() == []


def test_dot_decisions_ring_is_bounded():
    import pyspark.sql.functions as F

    drain_dot_decisions()
    a = F.col("a")
    for _ in range(similarity._DOT_DECISIONS_MAX + 50):
        dot_cols(a, a, 2, est_rows=1)
    assert len(similarity.DOT_DECISIONS) == similarity._DOT_DECISIONS_MAX
    drain_dot_decisions()


def test_ivfpq_queries_run_the_recommended_point(spark, sf_dir):
    """r14 verdict #2: the un-suffixed dim-64 PQ queries must sit at
    the curve-recommended m16x64 point with the honest >=0.45-class
    floor, not the saturating m4x16 pin."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _IVFPQ_FLOOR,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import (
        QUERIES,
    )

    assert _IVFPQ_FLOOR > 0.45
    out = QUERIES["embedding_ann_ivfpq"](spark, sf_dir)
    rows = out.collect()
    assert rows and all(r["recall_ok"] for r in rows)


def test_footer_row_bound_rejects_row_multiplying_plans(spark, tmp_path):
    """r15 review: a join/explode can emit MORE rows than its scans
    hold — the footer 'upper bound' must refuse those plans instead of
    under-estimating the cost rule into the slow dot strategy."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.ivf_exact import (
        _footer_row_bound,
    )
    import pyspark.sql.functions as F

    df = spark.range(50).toDF("x")
    p = str(tmp_path / "t.parquet")
    df.write.parquet(p)
    scanned = spark.read.parquet(p)
    assert _footer_row_bound(scanned) == 50
    # self-join multiplies rows; inputFiles() dedupes the path
    joined = scanned.join(scanned.withColumnRenamed("x", "y"),
                          F.expr("x % 5 = y % 5"))
    assert _footer_row_bound(joined) is None
    # explode multiplies rows
    exploded = scanned.select(F.explode(F.array("x", "x")).alias("x"))
    assert _footer_row_bound(exploded) is None
    # union double-counts the same file
    assert _footer_row_bound(scanned.union(scanned)) is None


def test_dot_decisions_overflow_carries_dropped_sentinel():
    """r15 review: a truncated decision record must say so."""
    import pyspark.sql.functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import (
        similarity,
    )

    similarity.drain_dot_decisions()
    a = F.col("a")
    for _ in range(similarity._DOT_DECISIONS_MAX + 7):
        similarity.dot_cols(a, a, 2, est_rows=1)
    got = similarity.drain_dot_decisions()
    assert got[-1] == {"dropped": 7}
    assert len(got) == similarity._DOT_DECISIONS_MAX + 1
    # and the counter resets with the drain
    assert similarity.drain_dot_decisions() == []

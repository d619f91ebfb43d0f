"""linear_probe_gd: training actually learns, and the integer contract
holds (bit-identical weights under any partitioning)."""

from __future__ import annotations

from pyspark.sql import Row

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.linear import (
    SCALE,
    linear_probe_gd,
)


def _separable(spark, n=200):
    # y=1 iff x1 is large; x2 is noise-ish (deterministic pattern)
    rows = [
        Row(doc_id=i, y=1 if i % 2 == 0 else 0,
            x0=1, x1=15 if i % 2 == 0 else 3, x2=(i * 7) % 5)
        for i in range(n)
    ]
    return spark.createDataFrame(rows)


def test_probe_learns_separable_labels(spark):
    df = _separable(spark)
    w, scored = linear_probe_gd(df, ["x0", "x1", "x2"], n_iter=60,
                                lr_num=1, lr_den=400)
    rows = scored.collect()
    acc = sum(1 for r in rows if r.pred == r.y) / len(rows)
    assert acc >= 0.95
    # the discriminative feature carries positive weight
    assert w[1] > 0


def test_probe_loss_decreases_monotonically_early(spark):
    df = _separable(spark)

    def loss(n_iter):
        w, scored = linear_probe_gd(df, ["x0", "x1", "x2"], n_iter=n_iter,
                                    lr_num=1, lr_den=400)
        tot = 0
        for r in scored.collect():
            tot += (r.score_scaled / SCALE - r.y) ** 2
        return tot

    l0, l2, l8 = loss(0), loss(2), loss(8)
    assert l2 < l0 and l8 < l2


def test_probe_gram_path_matches_per_iteration_scan(spark):
    """The one-pass Gram-matrix training (opt r15) must be
    bit-identical to the retired aggregate-per-iteration form — the
    reference loop below IS that form, inlined."""
    from pyspark.sql import functions as F

    df = _separable(spark, n=120)
    cols = ["x0", "x1", "x2"]
    n_iter, lr_num, lr_den = 13, 3, 700

    n = df.count()
    d = len(cols)
    w_ref = [0] * d
    for _ in range(n_iter):
        resid = sum(
            (F.col(c).cast("long") * F.lit(int(w_ref[j])).cast("long"))
            for j, c in enumerate(cols)
        ) - F.col("y").cast("long") * F.lit(SCALE).cast("long")
        grads = df.select(
            *[
                (F.col(c).cast("long") * resid)
                .cast("decimal(38,0)")
                .alias(f"_g{j}")
                for j, c in enumerate(cols)
            ]
        ).agg(*[F.sum(f"_g{j}").alias(f"g{j}") for j in range(d)])
        row = grads.collect()[0]
        for j in range(d):
            g = int(row[f"g{j}"])
            step = (lr_num * abs(g)) // (lr_den * n)
            w_ref[j] -= step if g >= 0 else -step

    w, _ = linear_probe_gd(df, cols, n_iter=n_iter,
                           lr_num=lr_num, lr_den=lr_den)
    assert w == w_ref


def test_probe_weights_partition_invariant(spark):
    df = _separable(spark, n=150)
    w1, _ = linear_probe_gd(df.repartition(1), ["x0", "x1", "x2"], n_iter=10)
    w2, _ = linear_probe_gd(df.repartition(17, "doc_id"), ["x0", "x1", "x2"],
                            n_iter=10)
    assert w1 == w2  # exact integers: no float summation-order leak

"""Distributed linear-model training (full-batch gradient descent on
squared loss) in SCALED-INTEGER arithmetic — the trainable-quality-
classifier primitive (FastText-style linear filters, Brown et al.'s
quality probe) reduced to what actually distributes: each iteration is
ONE map-side-combinable aggregate computing the exact integer gradient,
the driver holds only the (d+1)-vector of scaled weights, and every
arithmetic step is replayable by a chained-CTE SQL oracle (the same
discipline as the pagerank / EWMA / BPE recurrences — no float ever
feeds the next iteration).

Arithmetic (weights scaled by S = 10^6, learning rate lr = a/b,
all BIGINT; D = decimal(38,0) only as overflow headroom on sums):
  residual   R_i   = sum_j x_ij * W_j  -  y_i * S          (exact)
  gradient   G_j   = sum_i x_ij * R_i                      (exact)
  update     W_j  -= sign(G_j) * ((a * |G_j|) div (b * N)) (trunc)
The |G| div on a NON-NEGATIVE operand makes Spark's `div` (truncate
toward zero) and DuckDB's `//` (floor) agree — signed integer division
rounds differently in the two engines, absolute-value division does
not.

Features must be SMALL NON-NEGATIVE INTEGERS (cap them ~0..20): the
model quality comes from feature design, the determinism from the
integer contract, and the magnitude bound keeps every sum inside 38
digits at any corpus size.

Scale: per iteration, one narrow projection + one aggregate (partial
combine shrinks each map task's output to d values); the collected row
is d integers. Training cost is n_iter scans — at 100 TB you'd persist
the narrow feature frame once (done here via localCheckpoint) and pay
n_iter aggregates over d+2 long columns, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def linear_probe_gd(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str = "y",
    n_iter: int = 8,
    lr_num: int = 1,
    lr_den: int = 2000,
) -> tuple[list[int], DataFrame]:
    """Train w (scaled by 10^6) on ``features`` and return
    ``(weights, scored)`` where ``scored`` adds to every input row:
    ``score_scaled`` = exact integer x·W under the FINAL weights, and
    ``pred`` = score_scaled >= SCALE/2 (the 0.5 threshold).

    ``features``: one row per example; ``feature_cols`` integer columns
    (include an all-ones bias column yourself); ``label_col`` 0/1.
    """
    feats = features.localCheckpoint(eager=False)  # the count right below materializes it (r15)
    n = feats.count()
    if n == 0:
        raise ValueError("linear_probe_gd: empty training frame")
    d = len(feature_cols)
    w = [0] * d
    for _ in range(n_iter):
        resid = sum(
            (F.col(c).cast("long") * F.lit(int(w[j])).cast("long"))
            for j, c in enumerate(feature_cols)
        ) - F.col(label_col).cast("long") * F.lit(SCALE).cast("long")
        grads = feats.select(
            *[
                (F.col(c).cast("long") * resid)
                .cast("decimal(38,0)")
                .alias(f"_g{j}")
                for j, c in enumerate(feature_cols)
            ]
        ).agg(*[F.sum(f"_g{j}").alias(f"g{j}") for j in range(d)])
        row = grads.collect()[0]
        for j in range(d):
            g = int(row[f"g{j}"])
            step = (lr_num * abs(g)) // (lr_den * n)
            w[j] -= step if g >= 0 else -step
    score = sum(
        (F.col(c).cast("long") * F.lit(int(w[j])).cast("long"))
        for j, c in enumerate(feature_cols)
    )
    scored = feats.withColumn("score_scaled", score.cast("long")).withColumn(
        "pred", (F.col("score_scaled") >= SCALE // 2).cast("int")
    )
    return w, scored

"""Deterministic corpus sampling/splitting for training-data pipelines.

Train/val/test assignment at 100 TB must be REPRODUCIBLE — across runs,
across engines, and under repartitioning. RNG-based sampling
(df.sample / sampleBy) is none of those: the draw depends on partition
layout and seed plumbing, and no external system can re-derive the
assignment. Hash-based splitting is all of them: bucket =
f(md5(id + salt)) is a pure narrow projection (zero shuffles, zero
state), any engine can recompute membership for any row, and changing
the salt re-rolls every assignment atomically.

The 16-bit bucket comes from the first 4 md5 hex digits via the same
ascii-arithmetic trick as the SimHash sketch (dedup._md5_hex_digit), so
a DuckDB oracle replicates assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hex_digit

BUCKETS = 1 << 16


def split_bucket(id_col: Column, salt: str = "") -> Column:
    """Deterministic bucket 0..65535 from the first 4 hex digits of
    md5(id || salt)."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(salt)))
    b = F.lit(0)
    for pos in range(1, 5):
        b = b * 16 + _md5_hex_digit(h, pos)
    return b


def with_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of ``weights``'
    keys with the given proportions (need not sum to 1; rows past the
    cumulative total get null — a holdout you can drop or audit).

    Assignment is by cumulative threshold over the 16-bit bucket, so
    proportions are exact to ~1/65536 in expectation and every row's
    split is a pure function of (id, salt).
    """
    bucket = split_bucket(F.col(id_col), salt)
    expr = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        # round(), not int(): int() truncates (int(0.8*65536) = 52428)
        # while SQL CAST rounds (52429) — the boundary bucket would get a
        # different split in Spark vs an oracle. round() also absorbs
        # float-sum artifacts (0.7+0.2+0.1 = 0.9999... must still cover
        # bucket 65535). Oracles must use the same rounded literals.
        cond = bucket < int(round(cum * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)


def with_weighted_sample(
    df: DataFrame,
    rate: Column,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic PER-ROW-RATE sampling: keep a row iff its 16-bit id
    bucket falls under ``rate`` (a Column in [0, 1] — typically a
    per-source mixture weight, the "temperature sampling" knob every
    corpus mixer needs). Adds ``sampled`` (boolean); filter on it or
    keep it for audit.

    Same engine-independence as with_split: membership is a pure
    function of (id, salt, rate), so any system — or a DuckDB oracle —
    can recompute exactly which rows a run kept. Rates compose with
    splits (different salts draw independent buckets).

    Scale: narrow projection, zero shuffles. Upsampling (rate > 1) is
    out of scope here — repeat-aware mixers materialize an epoch list
    instead.
    """
    bucket = split_bucket(F.col(id_col), salt)
    keep = bucket < F.round(rate * F.lit(BUCKETS)).cast("int")
    return df.withColumn("sampled", keep)


def es_priority_key(id_col: Column, weight: Column, salt: str = "") -> Column:
    """Efraimidis-Spirakis priority for weighted sampling WITHOUT
    replacement: key = u^(1/w) with u uniform per item; the k largest
    keys are a weighted sample. Computed in log space — ln(u)/w — which
    is order-equivalent and numerically tame. The 'random' u derives
    from the 16-bit md5 bucket ((bucket + 0.5) / 65536, never 0 or 1),
    so the draw is a pure function of (id, salt): reproducible across
    runs, engines, and partitionings, re-rollable by salt — the same
    determinism contract as with_split.

    Scale: a narrow projection; the k-largest selection compiles to
    TakeOrderedAndProject. One corpus pass, no shuffle, no RNG state.

    Weights must be POSITIVE: ln(u) < 0, so a negative weight would
    flip the key's sign and dominate every honest row, and w = 0 is
    engine-divergent (NULL vs -inf). Non-positive weights map to NULL,
    which a descending Spark sort places last — excluded, not favored.
    """
    u = (split_bucket(id_col, salt) + F.lit(0.5)) / F.lit(float(BUCKETS))
    return F.when(weight > 0, F.log(u) / weight)


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    fraction: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACT-allocation stratified sampling: every stratum contributes
    exactly ceil(fraction * n_stratum) rows (proportional allocation,
    never the binomial wobble of per-row Bernoulli draws), selected in
    md5-priority order so the draw is deterministic, engine-replicable,
    and re-rollable via ``salt``.

    Output: the sampled rows (all input columns).

    Scale: one window rank per stratum over a narrow (keys + digest)
    projection — the rank partitions by stratum, so no global sort;
    stratum counts ride the same window (count over the partition), so
    ONE shuffle total. Heavily skewed strata are the same rows a
    groupBy would move; for a pathological single-stratum corpus,
    pre-salt the stratum key.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*strata_cols)
    pri = F.md5(
        F.concat_ws("\x1f", *strata_cols, F.col(id_col).cast("string"),
                    F.lit(salt))
    )
    ranked = df.withColumn("_pri", pri).withColumn(
        "_rk",
        F.row_number().over(w.orderBy(F.col("_pri"), F.col(id_col))),
    ).withColumn("_n", F.count(F.lit(1)).over(w))
    quota = F.ceil(F.col("_n") * F.lit(fraction))
    return ranked.filter(F.col("_rk") <= quota).drop("_pri", "_rk", "_n")


def temperature_mixture_sample(
    df: DataFrame,
    source_col: str = "source",
    alpha: float = 0.5,
    target_frac: float = 0.2,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Temperature-based source rebalancing (the multilingual-pretraining
    mixture rule, mT5/XLM-R style): sample sources proportional to
    n_s^alpha instead of n_s, so alpha < 1 up-weights small sources and
    damps head domination. The total draw targets
    ``target_frac * |corpus|`` rows; each source's quota is
    ``min(n_s, ceil(N_target * share_s))`` with share_s = n_s^alpha
    normalized over sources, and rows are taken per source in
    md5-priority order — the same deterministic, engine-replicable,
    salt-re-rollable draw as stratified_sample_exact.

    Numeric determinism: n_s^alpha rounds to 6 decimals and normalizes
    as a DECIMAL sum (order-independent), so shares and quotas are
    bit-identical across engines and partitionings; the only doubles
    divide or multiply ALREADY-identical operands.

    Scale: source stats are a tiny aggregate broadcast back; selection
    is one window rank partitioned by source (the stratified-sampler
    shuffle shape). Quotas cap at n_s, so alpha -> 0 degenerates to
    uniform-over-sources, alpha = 1 to proportional.
    """
    from pyspark.sql import Window

    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n_source"))
    weighted = counts.withColumn(
        "_w", F.round(F.pow(F.col("_n_source"), F.lit(alpha)), 6).cast("decimal(20,6)")
    )
    total_w = weighted.agg(
        F.sum("_w").alias("_tw"), F.sum("_n_source").alias("_corpus_n")
    )
    quotas = (
        weighted.crossJoin(F.broadcast(total_w))
        .withColumn(
            "_share", F.col("_w").cast("double") / F.col("_tw").cast("double")
        )
        .withColumn(
            "_quota",
            F.least(
                F.col("_n_source"),
                F.ceil(
                    F.col("_corpus_n").cast("double") * F.lit(target_frac) * F.col("_share")
                ),
            ),
        )
        .select(source_col, "_n_source", "_quota")
    )
    w = Window.partitionBy(source_col)
    pri = F.md5(
        F.concat_ws("\x1f", F.col(source_col), F.col(id_col).cast("string"), F.lit(salt))
    )
    ranked = (
        df.join(F.broadcast(quotas), source_col)
        .withColumn("_pri", pri)
        .withColumn("_rk", F.row_number().over(w.orderBy(F.col("_pri"), F.col(id_col))))
    )
    return (
        ranked.filter(F.col("_rk") <= F.col("_quota"))
        .withColumnRenamed("_n_source", "n_source")
        .withColumnRenamed("_quota", "quota")
        .drop("_pri", "_rk")
    )

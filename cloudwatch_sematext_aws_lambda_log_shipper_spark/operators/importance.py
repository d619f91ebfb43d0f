"""DSIR-style data selection: hashed n-gram importance scoring.

Public method (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling"): model a TARGET distribution (the data you want
more of — a reference corpus, a domain, a language) and the RAW pool as
bag-of-hashed-n-gram multinomials, score every raw document by the
log-likelihood ratio log p_target(doc) - log p_raw(doc), and
resample/rank by that score. Hashing collapses the unbounded n-gram
space to a fixed bucket count, so the "model" is just two count vectors
of length n_buckets — trivially distributable.

The engine keeps every step exact and engine-replicable:

- feature bucket = first 3 md5 hex digits of the token (12 bits, 4096
  buckets) via the same ascii-arithmetic trick as the SimHash sketch,
  so a DuckDB oracle reproduces bucket ids digit-for-digit;
- per-bucket target/raw counts and their totals are integer aggregates;
- each token's log-ratio term is ONE ln over ONE division of exact
  integer products (Laplace +1 smoothing), computed identically by any
  IEEE engine, and the per-doc sum is rounded to 6 decimals before
  ranking so float summation order cannot leak into the result (the
  TF-IDF query uses the same discipline);
- `target_hits` (tokens whose bucket leans target by exact
  cross-multiplication t_b * R > r_b * T) is a fully-integer companion
  signal with zero float involvement.

Scale: one token scan -> 4096-key aggregate (map-side combined, then a
4096-row broadcast); the scoring pass is a broadcast join + one
per-doc aggregate — no shuffle wider than |docs|, no driver state
beyond the 4096-row stats table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _md5_hex_digit
from .text import words

N_BUCKETS = 4096


def feature_bucket(token: Column) -> Column:
    """Hashed feature id 0..4095 from the first 3 md5 hex digits."""
    h = F.md5(token)
    b = F.lit(0)
    for pos in (1, 2, 3):
        b = b * 16 + _md5_hex_digit(h, pos)
    return b


def importance_scores(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact_sum: bool = False,
) -> DataFrame:
    """Per-document DSIR importance: (id, n_tokens, target_hits,
    dsir_logratio). Higher logratio = token mix closer to the target
    distribution than to the raw pool. ``is_target`` marks the rows
    that DEFINE the target distribution; every row is scored.

    ``exact_sum=True`` rounds each per-token log term to 9 decimals and
    sums as DECIMAL(20,9) (cast back to double): order-independent and
    therefore bit-stable across engines/partitionings — use it when the
    per-doc score itself sits under a value-hash gate (the default
    round-after-double-sum is fine for top-k ranking but the tail
    digits depend on summation order).
    """
    toks = docs.select(
        F.col(id_col),
        is_target.alias("_is_t"),
        F.explode(words(F.col(text_col))).alias("token"),
    ).withColumn("bucket", feature_bucket(F.col("token")))

    stats = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("t_b"),
        F.count(F.lit(1)).alias("r_b"),
    )
    totals = stats.agg(
        F.sum("t_b").alias("_T"), F.sum("r_b").alias("_R")
    )
    bstats = stats.join(F.broadcast(totals))

    joined = toks.join(F.broadcast(bstats), "bucket")
    lean = F.col("t_b") * F.col("_R") > F.col("r_b") * F.col("_T")
    num = ((F.col("t_b") + 1) * (F.col("_R") + N_BUCKETS)).cast("double")
    den = ((F.col("r_b") + 1) * (F.col("_T") + N_BUCKETS)).cast("double")
    term = F.log(num / den)
    score = (
        F.sum(F.round(term, 9).cast("decimal(20,9)")).cast("double")
        if exact_sum
        else F.round(F.sum(term), 6)
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(lean, 1).otherwise(0)).cast("long").alias("target_hits"),
        score.alias("dsir_logratio"),
    )

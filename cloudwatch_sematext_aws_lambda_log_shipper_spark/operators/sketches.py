"""KMV (k-minimum-values) distinct sketches with set-algebra
estimators (Beyer et al., "On Synopses for Distinct-Value Estimation
Under Multiset Operations", SIGMOD 2007).

HLL (the engine's approx_count_distinct path) answers |A| only; KMV
sketches additionally compose: the k smallest hash values of a set
are a mergeable synopsis from which |A ∪ B| and |A ∩ B| estimate with
~1/sqrt(k) relative error — the "audience overlap" primitive (users
who did A and B) that exact distinct-intersections make prohibitively
expensive at scale.

This implementation is fully DETERMINISTIC and oracle-replicable: the
element hash is the first 12 hex digits of md5 (48-bit integer — the
same digit-arithmetic family as SimHash/DSIR, exactly computable in
DuckDB via '0x' cast / in Spark via conv), so the sketch content, the
k-th minimum, and every estimator value are hash-identical across
engines. A sketch smaller than k holds its whole (hashed) set and the
estimators collapse to exact values by construction.

Scale: sketch construction is one distinct + one per-set rank window —
O(distinct pairs) once, after which every set-algebra question costs
O(k) per set pair with no data access. The exact audit columns in
kmv_overlap (cheap at test scale) are what you DROP at 100 TB; the
estimators and the within_bound gate are the product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M48 = float(1 << 48)  # hash space size for the 12-hex-digit hash


def kmv_hash(col) -> F.Column:
    """48-bit md5-derived element hash, identical in any engine."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_sketches(
    df: DataFrame, set_col: str, elem_col: str, k: int = 16
) -> DataFrame:
    """One row per set: (set_col, n_hashed, sketch) where sketch is the
    sorted k smallest distinct element hashes."""
    from pyspark.sql import Window

    eh = df.select(
        F.col(set_col), kmv_hash(F.col(elem_col)).alias("_h")
    ).distinct()
    w = Window.partitionBy(set_col).orderBy("_h")
    topk = eh.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    return topk.groupBy(set_col).agg(
        F.sort_array(F.collect_list("_h")).alias("sketch")
    )


def kmv_overlap(
    sketches: DataFrame,
    exact_sets: DataFrame,
    set_col: str,
    k: int = 16,
) -> DataFrame:
    """Pairwise union/intersection estimates for every set pair (a < b)
    plus the exact audit columns.

    ``exact_sets``: (set_col, _h) distinct hashed elements (the same
    frame kmv_sketches consumed) — exact counts are the AUDIT; at
    scale you drop them and keep the O(k) estimators.

    Estimators (all arithmetic mirrored exactly in the oracle):
      merged   = k smallest of sketch_a ∪ sketch_b
      est_union = len(merged) if len < k else round((k-1)*M/kth, 4)
      est_intersection = round(n_both * est_union / len(merged), 4)
        where n_both = merged values present in BOTH sketches
    ``within_bound``: relative union error <= 3/sqrt(k).
    """
    a = sketches.select(
        F.col(set_col).alias("set_a"), F.col("sketch").alias("_ska")
    )
    b = sketches.select(
        F.col(set_col).alias("set_b"), F.col("sketch").alias("_skb")
    )
    pairs = a.join(b, F.col("set_a") < F.col("set_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("_ska"), F.col("_skb"))), 1, k
    )
    pairs = pairs.withColumn("_m", merged)
    mlen = F.size("_m")
    kth = F.element_at("_m", F.least(F.lit(k), mlen))
    est_union = F.when(mlen < k, mlen.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(M48) / kth, 4)
    )
    n_both = F.size(
        F.filter(
            F.col("_m"),
            lambda x: F.array_contains(F.col("_ska"), x)
            & F.array_contains(F.col("_skb"), x),
        )
    )
    pairs = pairs.withColumn("est_union", est_union).withColumn(
        "est_intersection",
        F.round(n_both * F.col("est_union") / mlen, 4),
    )

    # exact audit (test-scale only)
    ea = exact_sets.select(F.col(set_col).alias("set_a"), "_h")
    eb = exact_sets.select(F.col(set_col).alias("set_b"), "_h")
    inter = (
        ea.join(eb, ["_h"])
        .filter(F.col("set_a") < F.col("set_b"))
        .groupBy("set_a", "set_b")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    counts = exact_sets.groupBy(set_col).agg(F.count(F.lit(1)).alias("_n"))
    ca = counts.select(F.col(set_col).alias("set_a"), F.col("_n").alias("_na"))
    cb = counts.select(F.col(set_col).alias("set_b"), F.col("_n").alias("_nb"))
    out = (
        pairs.join(inter, ["set_a", "set_b"], "left")
        .join(ca, "set_a")
        .join(cb, "set_b")
        .withColumn(
            "exact_intersection", F.coalesce("exact_intersection", F.lit(0))
        )
        .withColumn(
            "exact_union",
            F.col("_na") + F.col("_nb") - F.col("exact_intersection"),
        )
    )
    bound = 3.0 / (k ** 0.5)
    return out.select(
        "set_a",
        "set_b",
        "est_union",
        "est_intersection",
        F.col("exact_union").cast("long").alias("exact_union"),
        F.col("exact_intersection").cast("long").alias("exact_intersection"),
        (
            F.abs(F.col("est_union") - F.col("exact_union"))
            / F.col("exact_union")
            <= F.lit(bound)
        ).alias("within_bound"),
    )

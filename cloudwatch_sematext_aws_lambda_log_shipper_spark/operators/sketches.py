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

# --- deterministic Bloom filter (Bloom 1970) -----------------------------
#
# k md5-derived hash rows over an m-bucket space, materialized as the
# SET of hit (row, bucket) pairs — at most k * |keys| skinny rows, so
# the "bitmap" broadcasts like any small dim table and the membership
# test is k chained BROADCAST LEFT SEMI joins on a computed bucket
# column: narrow, shuffle-free, and digit-replayable in SQL (each
# bucket is the 48-bit md5 of key || ';bf' || row, mod m). False
# positives are possible by design (that is the trade); negatives
# never are — the exact join after the pre-filter only shrinks.

BLOOM_K = 4
BLOOM_M = 65536


def bloom_bucket(col: F.Column, row: int) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(";bf"),
                               F.lit(str(row)))),
                1, 12,
            ),
            16, 10,
        ).cast("long")
        % BLOOM_M
    )


def bloom_bits(keys: DataFrame, key_col: str) -> DataFrame:
    """(i, b): the distinct hit buckets per hash row for the build-side
    key set — the Bloom 'bitmap' as skinny rows (<= k * |keys|)."""
    parts = [
        keys.select(F.lit(i).alias("i"),
                    bloom_bucket(F.col(key_col), i).alias("b"))
        for i in range(BLOOM_K)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.distinct()


def bloom_prefilter(
    fact: DataFrame, bits: DataFrame, key_col: str
) -> DataFrame:
    """Rows of ``fact`` whose key passes every hash row's membership
    test: k chained broadcast left-semi joins — no shuffle of the fact
    side, the 100 TB pre-filter shape (cuts the expensive downstream
    join's input to true-matches + the false-positive sliver)."""
    out = fact
    for i in range(BLOOM_K):
        probe = f"_bf{i}"
        out = (
            out.withColumn(probe, bloom_bucket(F.col(key_col), i))
            .join(
                F.broadcast(
                    bits.filter(F.col("i") == i).select(
                        F.col("b").alias(probe)
                    )
                ),
                probe,
                "left_semi",
            )
            .drop(probe)
        )
    return out


# --- deterministic HyperLogLog (Flajolet et al. 2007) -------------------
#
# The classic HLL with every source of engine-dependence removed so a
# DuckDB oracle replays the sketch AND the estimator bit-for-bit:
#   - element hash: the 48-bit md5 prefix (kmv_hash) — no xxhash seed,
#     no implementation-defined mixing;
#   - register index = h % m, remaining window w = h // m (40 bits for
#     p=8); rho = leading zeros in the window + 1 = 41 - bitlength(w),
#     with bitlength via length(bin(w)) — an INTEGER, never a log2
#     float (log2 of an exact power of two is one libm ulp away from
#     flipping a floor);
#   - the harmonic sum is kept in INTEGER form: sum over registers of
#     2^(41 - M_j) as BIGINT (absent registers contribute 2^41), so
#     the only float ops are one division, the alpha constant (a
#     pre-multiplied literal, identical digits in both engines), and
#     the small-range ln correction — each a single fixed-order
#     expression, rounded to 4 dp.
#
# Scale: the register table is a map-side-combinable (group, idx)
# max — the shuffle carries at most m rows per group no matter how
# many billions of elements each group holds, which is the entire
# point of HLL at 100 TB. Spark's own approx_count_distinct gives the
# same asymptotics with a denser encoding but implementation-defined
# values; this variant trades ~2x constant factor for replayability.

HLL_P = 8  # 2^8 = 256 registers; relative error ~1.04/sqrt(256) = 6.5%
HLL_M = 1 << HLL_P
_HLL_WINDOW = 48 - HLL_P  # bits left after the register index
_HLL_RHO_MAX = _HLL_WINDOW + 1
# alpha_256 * m^2 * 2^(rho_max): ONE pre-multiplied double literal so
# both engines divide the identical constant by the integer sum
HLL_ALPHA_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * float(HLL_M * HLL_M) * float(
    1 << _HLL_RHO_MAX
)
HLL_LINEAR_CUTOFF = 2.5 * HLL_M  # below this, linear counting is used


# --- deterministic Count-Min sketch (Cormode & Muthukrishnan 2005) ------
#
# d hash rows x w counters; every counter is an exact integer count of
# the items hashing into it, so the sketch AND the point estimates
# (min over rows) replay in any engine given the same hash family —
# here the 48-bit md5 of (item || ';cms' || row). The one-sided error
# guarantee (estimate >= true count, overcount <= eps*N w.h.p.) is a
# pure integer statement, checked in-band by the queries.
#
# Scale: the sketch aggregate is map-side combinable down to d*w rows
# per partition regardless of corpus size — the mergeable-summary
# shape; point lookups touch d rows of a d*w-row broadcast table.

CMS_D = 4
CMS_W = 512

# Shared bottom-k sample size for the deterministic sampled-quantile
# operator. ONE definition used by both the batch query
# (plans/analytics.events_value_quantiles_sampled) and its streaming
# twin (streaming/quantiles.py) so the row-for-row prefix-equality
# contract between them cannot silently break if the size is tuned
# (ADVICE r12). tests/test_advice_r13.py pins that both import it.
SAMPLED_QUANTILE_S = 400


def cms_bucket(col: F.Column, row: F.Column | int) -> F.Column:
    """Row-``row`` counter index for an item: 48-bit md5 of the
    salted item string, mod CMS_W — digit-replayable in SQL."""
    r = F.lit(row) if isinstance(row, int) else row
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(";cms"),
                               r.cast("string"))),
                1, 12,
            ),
            16, 10,
        ).cast("long")
        % CMS_W
    )


def cms_sketch(df: DataFrame, item_col: str) -> DataFrame:
    """(i, b, c): the d x w counter table over ``df[item_col]``.

    NULL items are dropped (matching hll_estimate's COUNT(DISTINCT)
    semantics) — previously a NULL hashed to a NULL bucket and grouped
    into an (i, NULL) row, which the streaming twin (streaming/cms.py,
    which dropna's) could never reproduce (ADVICE r12)."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    hashed = df.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).alias("_it")
    ).select(
        "_it", rows
    ).select("i", cms_bucket(F.col("_it"), F.col("i")).alias("b"))
    return hashed.groupBy("i", "b").agg(F.count(F.lit(1)).alias("c"))


def cms_point_estimates(
    sketch: DataFrame, candidates: DataFrame, item_col: str
) -> DataFrame:
    """min-over-rows point estimate for each candidate item:
    (item_col..., n_cms). ``candidates`` keeps its other columns."""
    rows = F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("i")
    probes = candidates.select(item_col, rows).select(
        item_col, "i", cms_bucket(F.col(item_col), F.col("i")).alias("b")
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "b"])
        .groupBy(item_col)
        .agg(F.min("c").alias("n_cms"))
    )
    return candidates.join(est, item_col)


def hll_estimate(
    df: DataFrame, group_cols: list[str], elem_col: str
) -> DataFrame:
    """Per-group deterministic-HLL distinct estimate:
    (group_cols..., n_users_hll). NULL elements are ignored (matching
    COUNT(DISTINCT ...) semantics)."""
    h = kmv_hash(F.col(elem_col))
    hashed = df.filter(F.col(elem_col).isNotNull()).select(
        *group_cols, h.alias("_h")
    )
    w = F.expr(f"_h div {HLL_M}")
    rho = F.when(w == 0, F.lit(_HLL_RHO_MAX)).otherwise(
        F.lit(_HLL_RHO_MAX) - F.length(F.bin(w))
    )
    regs = (
        hashed.select(
            *group_cols, (F.col("_h") % HLL_M).alias("_idx"), rho.alias("_rho")
        )
        .groupBy(*group_cols, "_idx")
        .agg(F.max("_rho").alias("_m_j"))
    )
    grp = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RHO_MAX} - _m_j)")
        ).alias("_s_present"),
        F.count(F.lit(1)).alias("_n_regs"),
    )
    s_total = F.col("_s_present") + (F.lit(HLL_M) - F.col("_n_regs")) * F.lit(
        1 << _HLL_RHO_MAX
    ).cast("long")
    v = F.lit(HLL_M) - F.col("_n_regs")  # registers never touched
    raw = F.lit(HLL_ALPHA_NUM) / s_total.cast("double")
    est = F.when(
        (raw <= F.lit(HLL_LINEAR_CUTOFF)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(raw)
    return grp.select(*group_cols, F.round(est, 4).alias("n_users_hll"))


def hll_oracle_ctes(
    group_sql: str, elem_sql: str, source: str = "events"
) -> str:
    """DuckDB CTE text replaying :func:`hll_estimate` digit-for-digit
    over ``source`` — ends with a ``hll`` CTE of
    (group_sql columns..., n_users_hll)."""
    m, rmax = HLL_M, _HLL_RHO_MAX
    return f"""
hll_hashed AS (
  SELECT {group_sql},
         CAST('0x' || substr(md5(CAST({elem_sql} AS VARCHAR)), 1, 12)
              AS BIGINT) AS h
  FROM {source} WHERE {elem_sql} IS NOT NULL
), hll_regs AS (
  SELECT * EXCLUDE (h), h % {m} AS idx,
         MAX(CASE WHEN h // {m} = 0 THEN {rmax}
                  ELSE {rmax} - length(bin(h // {m})) END) AS m_j
  FROM hll_hashed GROUP BY ALL
), hll_grp AS (
  SELECT * EXCLUDE (idx, m_j),
         SUM(CAST(1 AS BIGINT) << ({rmax} - m_j)) AS s_present,
         COUNT(*) AS n_regs
  FROM hll_regs GROUP BY ALL
), hll AS (
  SELECT * EXCLUDE (s_present, n_regs),
         ROUND(CASE WHEN {HLL_ALPHA_NUM!r} / CAST(s_present
                         + ({m} - n_regs) * CAST({1 << rmax} AS BIGINT)
                         AS DOUBLE) <= {HLL_LINEAR_CUTOFF!r}
                     AND {m} - n_regs > 0
               THEN {float(m)!r} * ln({float(m)!r}
                                      / CAST({m} - n_regs AS DOUBLE))
               ELSE {HLL_ALPHA_NUM!r} / CAST(s_present
                         + ({m} - n_regs) * CAST({1 << rmax} AS BIGINT)
                         AS DOUBLE)
               END, 4) AS n_users_hll
  FROM hll_grp
)"""


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

"""Type-2 slowly-changing-dimension maintenance (SCD2).

The warehouse-side sibling of the control plane's subscription upsert
(control.py classifies created/unchanged/replaced the same way the
reference's subscriber.js does for filters): a dimension row is never
updated in place — a change CLOSES the current version (valid_to :=
effective time) and INSERTS a new current one, so point-in-time joins
("what segment was this customer in when the order shipped?") stay
answerable forever.

Shape: ONE equi join of the current-version slice against the update
batch on the business key, whose rows each explode into their 1-2
output versions (close + reopen for changes) — a single physical join
branch, no window functions, no per-key sort, no driver state. At
100 TB the join shuffles only (current ∪ updates), and a dimension
bucketed on the key makes it exchange-free (operators/bucketing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    eff_col: str = "eff_ts",
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.

    ``dim``: key_cols + attr_cols + valid_from + valid_to (null = the
    current version). ``updates``: key_cols + attr_cols + eff_col, at
    most one row per key (enforce upstream; last-write-wins folding is
    the caller's policy decision).

    Semantics per update key:
    - new key            -> insert (valid_from = eff, open-ended)
    - all attrs unchanged -> no-op (idempotent re-delivery is safe)
    - any attr changed    -> close current at eff + insert new current
    History rows (valid_to set) are never touched.

    Dirty batches: ``eff_col`` is required non-null — NULL-eff rows are
    malformed (a new key would open an all-NULL interval; a change
    would close the current version at NULL) and are DROPPED before the
    join. An update whose eff precedes the current version's
    ``valid_from`` is OUT OF ORDER (applying it would invert the
    interval, valid_to < valid_from); it is treated as stale and
    ignored, preserving the tiling invariant under late re-delivery.
    """
    cur = dim.filter(F.col(to_col).isNull())
    hist = dim.filter(F.col(to_col).isNotNull())

    u = updates.filter(F.col(eff_col).isNotNull()).select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols],
        *[F.col(c).alias(f"_n_{c}") for c in attr_cols],
        F.col(eff_col).alias("_eff"),
    )
    cond = None
    for c in key_cols:
        e = cur[c] == u[f"_u_{c}"]
        cond = e if cond is None else cond & e
    j = cur.join(u, cond, "full_outer")

    def _differs() -> Column:
        d = F.lit(False)
        for c in attr_cols:
            # null-safe inequality: a change to/from NULL is a change
            d = d | ~cur[c].eqNullSafe(F.col(f"_n_{c}"))
        return d

    has_update = F.col("_eff").isNotNull()
    is_new_key = cur[key_cols[0]].isNull()
    # out-of-order guard: an eff before the current version's start can
    # only produce an inverted interval — treat as stale (no-op)
    changed = (
        has_update
        & ~is_new_key
        & (F.col("_eff") >= cur[from_col])
        & _differs()
    )

    # every joined row maps to 1-2 output rows; building them as a
    # per-row struct ARRAY + one explode keeps the full-outer join in
    # exactly one physical branch — filter+union per row class would
    # re-execute the join (and re-scan both inputs) once per class
    to_type = dim.schema[to_col].dataType

    def row_struct(keys, attrs, vfrom, vto) -> Column:
        return F.struct(
            *[k.alias(c) for k, c in zip(keys, key_cols)],
            *[a.alias(c) for a, c in zip(attrs, attr_cols)],
            vfrom.alias(from_col),
            vto.cast(to_type).alias(to_col),
        )

    cur_row = row_struct(
        [cur[c] for c in key_cols],
        [cur[c] for c in attr_cols],
        cur[from_col],
        cur[to_col],
    )
    closed_row = row_struct(
        [cur[c] for c in key_cols],
        [cur[c] for c in attr_cols],
        cur[from_col],
        F.col("_eff"),
    )
    opened_row = row_struct(
        [F.coalesce(cur[c], F.col(f"_u_{c}")) for c in key_cols],
        [F.col(f"_n_{c}") for c in attr_cols],
        F.col("_eff"),
        F.lit(None),
    )
    rows = (
        F.when(~has_update, F.array(cur_row))
        .when(is_new_key, F.array(opened_row))
        .when(~changed, F.array(cur_row))  # idempotent re-delivery
        .otherwise(F.array(closed_row, opened_row))
    )
    exploded = j.select(F.explode(rows).alias("_r")).select("_r.*")
    return hist.select(*key_cols, *attr_cols, from_col, to_col).unionByName(
        exploded
    )

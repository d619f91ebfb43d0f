"""Z-order (Morton) data layout: multi-dimensional clustering so that
BOX predicates over several columns prune files/partitions, not just
row groups — the missing piece between single-column range layout
(repartitionByRange) and the multi-dim filters analytics actually run.

How it scales to 100 TB:
- **Write side**: each dimension is width-bucketed into 2^bits_per_dim
  integer cells from its global min/max (ONE aggregate job for the
  bounds — no per-row driver work, no sort of the full data). Cell
  bits interleave into a Morton z-value; the top log2(n_buckets) bits
  become a `z_bucket` directory-partition column, and rows range-
  partition + sort by (z_bucket, z) so every output file covers a
  tight z-range — i.e. a small hyper-rectangle of the key space.
- **Read side**: a box query decomposes DRIVER-SIDE into the set of
  z_buckets whose hyper-rectangle intersects the box — pure integer
  math on the bucket grid, O(n_buckets) with zero data access — and
  lands in the plan as a `z_bucket IN (...)` PartitionFilter, so the
  file listing itself shrinks before any I/O. The exact residual
  predicate still applies (the bucket filter is a superset guarantee,
  never a substitute). Production systems split the z-range with
  BIGMIN instead of enumerating the grid; at the n_buckets <= 4096
  this operator targets, enumeration is microseconds and simpler.
- Uniform width-bucketing is skew-sensitive (a hot cell fattens its
  bucket's files); heavy skew wants quantile boundaries, which drop
  into the same interleave unchanged — documented, not implemented.

Columns must be numeric (int/float/date/timestamp castable to double).
Nulls bucket to cell 0 (they cluster, but range predicates never
match them — the residual filter handles correctness).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_FILE = "_zorder_meta.json"


@dataclass
class ZorderMeta:
    cols: list[str]
    bits_per_dim: int
    n_buckets: int
    mins: list[float]
    maxs: list[float]

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "ZorderMeta":
        return ZorderMeta(**json.loads(s))


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Width-bucket a value into [0, 2^bits) from global bounds.
    width_bucket returns 1..n+1 (codegen'd); clamp and 0-base. Nulls
    land in cell 0 (width_bucket propagates null -> coalesce)."""
    n = 1 << bits
    if hi <= lo:  # constant column: everything in cell 0
        return F.lit(0).cast("long")
    b = F.width_bucket(col.cast("double"), F.lit(lo), F.lit(hi), F.lit(n))
    return F.coalesce(
        F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def _interleave(cells: list[Column], bits: int) -> Column:
    """Morton-interleave k cell columns of `bits` bits each: output bit
    i*k + j takes bit i of dimension j (dim 0 in the LOW bit of each
    group, so the HIGH interleaved bits mix every dimension's high
    bits — that's what makes the top-bit prefix a hyper-rectangle)."""
    k = len(cells)
    if k * bits > 63:
        raise ValueError(f"{k} dims x {bits} bits exceeds 63 bits")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cells):
            z = z + F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
            )
    return z


def zorder_columns(
    df: DataFrame, meta: ZorderMeta
) -> DataFrame:
    """Append `z` (Morton value) and `z_bucket` (top bits of z) columns."""
    cells = [
        _cell(F.col(c), meta.mins[j], meta.maxs[j], meta.bits_per_dim)
        for j, c in enumerate(meta.cols)
    ]
    z = _interleave(cells, meta.bits_per_dim)
    shift = len(meta.cols) * meta.bits_per_dim - int(
        math.log2(meta.n_buckets)
    )
    return df.withColumn("z", z).withColumn(
        "z_bucket", F.shiftright("z", shift)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 8,
    n_buckets: int = 64,
) -> ZorderMeta:
    """Write `df` z-ordered by `cols`: directory-partitioned on
    z_bucket, range-partitioned + sorted on (z_bucket, z) within, with
    the bucketing bounds in a sidecar so readers can decompose box
    queries. One extra aggregate job (global min/max) + one shuffle
    (the range partition) — the same cost shape as any clustered write.
    """
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{j}")
          for j, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{j}")
          for j, c in enumerate(cols)],
    ).collect()[0]
    meta = ZorderMeta(
        cols=list(cols),
        bits_per_dim=bits_per_dim,
        n_buckets=n_buckets,
        mins=[bounds[f"lo_{j}"] for j in range(len(cols))],
        maxs=[bounds[f"hi_{j}"] for j in range(len(cols))],
    )
    out = zorder_columns(df, meta)
    (
        out.repartitionByRange(n_buckets, "z_bucket", "z")
        .sortWithinPartitions("z_bucket", "z")
        .drop("z")
        .write.mode("overwrite")
        .partitionBy("z_bucket")
        .parquet(path)
    )
    with open(os.path.join(path, META_FILE), "w") as f:
        f.write(meta.to_json())
    return meta


def read_zorder_meta(path: str) -> ZorderMeta:
    with open(os.path.join(path, META_FILE)) as f:
        return ZorderMeta.from_json(f.read())


def _bucket_dim_ranges(meta: ZorderMeta, bucket: int):
    """Per-dimension CELL range covered by a z_bucket: the bucket id is
    a prefix of the interleaved bits, so each dim gets back its subset
    of high bits; unseen low bits span a full sub-range."""
    k = len(meta.cols)
    total = k * meta.bits_per_dim
    p = int(math.log2(meta.n_buckets))  # prefix length in bits
    los = [0] * k
    his = [(1 << meta.bits_per_dim) - 1] * k
    known = [0] * k  # how many high bits of dim j the prefix pins
    for t in range(p):
        bitpos = total - 1 - t  # interleaved bit position, high first
        j = bitpos % k
        i = bitpos // k  # bit i of dim j
        bit = (bucket >> (p - 1 - t)) & 1
        # pin bit i of dim j
        lo_fixed = los[j] | (bit << i)
        los[j] = lo_fixed
        his[j] = (his[j] & ~(1 << i)) | (bit << i)
        known[j] += 1
    return list(zip(los, his))


def _value_to_cell(v: float, lo: float, hi: float, bits: int) -> int:
    n = 1 << bits
    if hi <= lo:
        return 0
    if v <= lo:
        return 0
    if v >= hi:
        return n - 1
    return min(int((v - lo) / (hi - lo) * n), n - 1)


def zbucket_candidates(
    meta: ZorderMeta, box: dict[str, tuple[float, float]]
) -> list[int]:
    """Buckets whose hyper-rectangle intersects `box` ({col: (lo, hi)},
    inclusive; omitted columns are unconstrained). Superset guarantee:
    every row satisfying the box predicate lives in a returned bucket.
    Pure driver-side integer math — no data access."""
    n_cells = 1 << meta.bits_per_dim
    cell_box = {}
    for c, (lo, hi) in box.items():
        j = meta.cols.index(c)
        # +-1 cell slack: this float math must never disagree with the
        # JVM width_bucket by a cell at a box edge (superset guarantee
        # beats a marginally tighter IN-list)
        cell_box[j] = (
            max(
                _value_to_cell(lo, meta.mins[j], meta.maxs[j], meta.bits_per_dim)
                - 1,
                0,
            ),
            min(
                _value_to_cell(hi, meta.mins[j], meta.maxs[j], meta.bits_per_dim)
                + 1,
                n_cells - 1,
            ),
        )
    out = []
    for b in range(meta.n_buckets):
        ranges = _bucket_dim_ranges(meta, b)
        ok = True
        for j, (qlo, qhi) in cell_box.items():
            blo, bhi = ranges[j]
            if bhi < qlo or blo > qhi:
                ok = False
                break
        if ok:
            out.append(b)
    return out


def zorder_box_filter(
    meta: ZorderMeta, box: dict[str, tuple[float, float]]
) -> Column:
    """The full predicate for a box query on a z-ordered table: the
    bucket IN-list (partition-prunes the file listing) AND the exact
    residual per-column ranges. Null-safe: nulls never satisfy a range."""
    cands = zbucket_candidates(meta, box)
    pred = F.col("z_bucket").isin(cands)
    for c, (lo, hi) in box.items():
        pred = pred & F.col(c).between(F.lit(lo), F.lit(hi))
    return pred

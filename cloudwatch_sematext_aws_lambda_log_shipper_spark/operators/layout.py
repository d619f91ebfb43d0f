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

Dimension kinds:
- "num": int/float/date/timestamp castable to double — width-bucketed
  from global min/max; supports RANGE (box) predicates.
- "hash": strings (or any high-cardinality key with equality-only
  predicates) — the cell is pmod(xxhash64(col), 2^bits), no bounds
  scan needed. An EQUALITY predicate on a hash dim prunes exactly like
  a point box on a numeric dim; ranges are meaningless by design.
  This is what lets the log table cluster on
  (`@timestamp` num, `function.name` hash).

Nulls bucket to cell 0 (they cluster, but range/equality predicates
never match them — the residual filter handles correctness).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field

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
    kinds: list[str] = field(default_factory=list)  # "num" | "hash"

    def __post_init__(self):
        if not self.kinds:  # pre-r8 sidecars: all dims numeric
            self.kinds = ["num"] * len(self.cols)

    def to_json(self) -> str:
        return json.dumps(self.__dict__)

    @staticmethod
    def from_json(s: str) -> "ZorderMeta":
        return ZorderMeta(**json.loads(s))



def _qcol(name: str) -> Column:
    """Column ref with backtick quoting, so dimension names containing
    dots (the log table's `function.name`, `@timestamp`) resolve as
    top-level columns, not struct field paths."""
    return F.col("`" + name + "`")

def _as_num(df: DataFrame, c: str) -> Column:
    """Numeric view of a dimension column. TIMESTAMP_NTZ has no direct
    double cast in Spark 4 — route it through TIMESTAMP (session tz is
    pinned to UTC in session.py, so wall time == instant and the epoch
    double agrees with driver-side datetime.timestamp() math)."""
    col = _qcol(c)
    if dict(df.dtypes).get(c) == "timestamp_ntz":
        col = col.cast("timestamp")
    return col.cast("double")


def _cell(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Width-bucket a (numeric) value into [0, 2^bits) from global
    bounds. width_bucket returns 1..n+1 (codegen'd); clamp and 0-base.
    Nulls land in cell 0 (width_bucket propagates null -> coalesce)."""
    n = 1 << bits
    if hi is None or lo is None or hi <= lo:  # constant/all-null column
        return F.lit(0).cast("long")
    b = F.width_bucket(col, F.lit(lo), F.lit(hi), F.lit(n))
    return F.coalesce(
        F.least(F.greatest(b - 1, F.lit(0)), F.lit(n - 1)), F.lit(0)
    ).cast("long")


def _hash_cell(col: Column, bits: int) -> Column:
    """Dictionary-free cell for string/equality dims: the low `bits`
    bits of xxhash64 (JVM-side, codegen'd). Nulls land in cell 0 so the
    layout stays total; equality residuals never match them anyway."""
    n = 1 << bits
    return F.when(col.isNull(), F.lit(0)).otherwise(
        F.pmod(F.xxhash64(col), F.lit(n))
    ).cast("long")


def hash_cell_value(spark, value, bits: int) -> int:
    """The cell a VALUE lands in on a hash dim — evaluated by the SAME
    JVM xxhash64 the write side used (one empty-plan job, microseconds;
    a Python reimplementation that drifted by one bit would silently
    break the superset guarantee)."""
    row = spark.range(1).select(
        _hash_cell(F.lit(value), bits).alias("c")
    ).collect()[0]
    return int(row["c"])


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
        _hash_cell(_qcol(c), meta.bits_per_dim)
        if meta.kinds[j] == "hash"
        else _cell(
            _as_num(df, c), meta.mins[j], meta.maxs[j], meta.bits_per_dim
        )
        for j, c in enumerate(meta.cols)
    ]
    z = _interleave(cells, meta.bits_per_dim)
    shift = len(meta.cols) * meta.bits_per_dim - int(
        math.log2(meta.n_buckets)
    )
    return df.withColumn("z", z).withColumn(
        "z_bucket", F.shiftright("z", shift)
    )


def fit_zorder_meta(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
    n_buckets: int = 64,
    kinds: list[str] | None = None,
) -> ZorderMeta:
    """Compute the clustering metadata (dim kinds + numeric bounds) for
    a frame: ONE aggregate job over the numeric dims, no data sort.
    Shared by the directory-layout writer below and the txlog table
    format's z-order-clustered commits."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    if kinds is None:
        dtypes = dict(df.dtypes)
        kinds = ["hash" if dtypes[c] == "string" else "num" for c in cols]
    num_js = [j for j, k in enumerate(kinds) if k == "num"]
    mins: list[float] = [0.0] * len(cols)
    maxs: list[float] = [float((1 << bits_per_dim) - 1)] * len(cols)
    if num_js:
        bounds = df.agg(
            *[F.min(_as_num(df, cols[j])).alias(f"lo_{j}") for j in num_js],
            *[F.max(_as_num(df, cols[j])).alias(f"hi_{j}") for j in num_js],
        ).collect()[0]
        for j in num_js:
            mins[j] = bounds[f"lo_{j}"]
            maxs[j] = bounds[f"hi_{j}"]
    return ZorderMeta(
        cols=list(cols),
        bits_per_dim=bits_per_dim,
        n_buckets=n_buckets,
        mins=mins,
        maxs=maxs,
        kinds=list(kinds),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits_per_dim: int = 8,
    n_buckets: int = 64,
    kinds: list[str] | None = None,
) -> ZorderMeta:
    """Write `df` z-ordered by `cols`: directory-partitioned on
    z_bucket, range-partitioned + sorted on (z_bucket, z) within, with
    the bucketing bounds in a sidecar so readers can decompose box
    queries. One extra aggregate job (global min/max, numeric dims
    only) + one shuffle (the range partition) — the same cost shape as
    any clustered write.

    ``kinds`` per dim: "num" (range-bucketed) or "hash" (xxhash64
    cell — for string keys with equality predicates). Defaults by
    dtype: StringType -> "hash", everything else -> "num".
    """
    meta = fit_zorder_meta(df, cols, bits_per_dim, n_buckets, kinds)
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
    if lo is None or hi is None or hi <= lo:
        return 0
    if v <= lo:
        return 0
    if v >= hi:
        return n - 1
    return min(int((v - lo) / (hi - lo) * n), n - 1)


def zbucket_candidates(
    meta: ZorderMeta,
    box: dict[str, tuple[float, float]],
    eq: dict[str, object] | None = None,
    spark=None,
) -> list[int]:
    """Buckets whose hyper-rectangle intersects `box` ({col: (lo, hi)},
    inclusive; omitted columns are unconstrained). Superset guarantee:
    every row satisfying the box predicate lives in a returned bucket.
    Pure driver-side integer math — no data access (except `eq` on hash
    dims, which costs one empty-plan JVM hash evaluation per value).

    ``eq``: {col: value} EQUALITY predicates on hash dims — each pins
    that dim to exactly the value's hash cell (no +-1 slack needed:
    the hash is computed by the same JVM expression the writer used,
    so it is exact by construction). Requires ``spark``."""
    n_cells = 1 << meta.bits_per_dim
    cell_box = {}
    for c, v in (eq or {}).items():
        j = meta.cols.index(c)
        if meta.kinds[j] != "hash":
            raise ValueError(f"eq predicate on non-hash dim {c!r}")
        cell = hash_cell_value(spark, v, meta.bits_per_dim)
        cell_box[j] = (cell, cell)
    for c, (lo, hi) in box.items():
        j = meta.cols.index(c)
        if meta.kinds[j] == "hash":
            raise ValueError(f"range predicate on hash dim {c!r}")
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
    meta: ZorderMeta,
    box: dict[str, tuple[float, float]],
    eq: dict[str, object] | None = None,
    spark=None,
    residual_box: dict[str, tuple] | None = None,
) -> Column:
    """The full predicate for a box query on a z-ordered table: the
    bucket IN-list (partition-prunes the file listing) AND the exact
    residual per-column predicates (ranges on numeric dims, equality on
    hash dims). Null-safe: nulls never satisfy either.

    ``residual_box`` optionally overrides the residual VALUES per box
    column (e.g. the box gives epoch-seconds doubles for the cell math
    while the residual compares real timestamp literals); the bucket
    candidates always come from ``box``."""
    cands = zbucket_candidates(meta, box, eq=eq, spark=spark)
    pred = F.col("z_bucket").isin(cands)
    res = dict(box)
    res.update(residual_box or {})
    for c, (lo, hi) in res.items():
        pred = pred & _qcol(c).between(F.lit(lo), F.lit(hi))
    for c, v in (eq or {}).items():
        pred = pred & (_qcol(c) == F.lit(v))
    return pred

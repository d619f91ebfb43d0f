"""Scale-safe global ranking: ntile / row_number without a
single-partition WindowExec.

Spark's ``ntile(k) OVER (ORDER BY ...)`` with no PARTITION BY moves
EVERY input row through one task (WindowExec with an empty partition
spec — the "No Partition Defined" warning): invisible at test scale,
fatal at 100 TB. The classic distributed fix is the TeraSort ranking
shape:

  1. ``repartitionByRange(P, order...)`` — the only global exchange;
     each output partition holds one contiguous slice of the total
     order,
  2. freeze the placement (``localCheckpoint``) so
     ``spark_partition_id()`` is stable across the two consumers below
     (without it, AQE may re-coalesce the exchange differently per
     job and the offsets would describe a different placement),
  3. per-(group, pid) row counts — a <= |groups| x P frame, bounded by
     the output grid times the partition count, never the corpus —
     prefix-summed driver-side (a probe-list-class collect) and
     broadcast-joined back,
  4. ``row_number`` within each (group, pid) slice + offset = exact
     global rank; ntile is then pure integer arithmetic on
     (rank, group size).

Semantics are IDENTICAL to ntile over a total order — ``order_cols``
MUST include a unique tiebreaker — so DuckDB oracles keep using plain
``ntile``/``percent_rank``. Ranks are placement-independent (the total
order pins them no matter where the range sampler drew its bounds), so
results are deterministic and hash-comparable.

Reference parity: the reference engine (shipper.js/subscriber.js) has
no ranking surface; this backs SURVEY §2.3's window-function category
with a plan that survives a 1000-executor scale-up.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Reserved intermediate names; the plan audit whitelists bounded
# prefix-offset windows by the __rk_pid grouping key.
_PID = "__rk_pid"
_CNT = "__rk_cnt"
_OFF = "__rk_off"
_N = "__rk_n"
_RANK = "__rk_rank"


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    out: str = "rank",
    partition_cols: Sequence[str] = (),
    n_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out`` = row_number() OVER (PARTITION BY partition_cols
    ORDER BY order_cols) computed with the distributed plan above, plus
    (optionally) ``n_out`` = the partition-group row count — enough to
    derive percent_rank as (rank-1)/(n-1) without a second pass.

    ``order_cols`` are Column SORT expressions (``F.col("x").desc()``)
    whose combined order is total within each group; ``partition_cols``
    are column names of small-dimension cardinality — the offsets
    frame is |groups| x P rows and is broadcast. NULL group values
    form their own group (the offset join is null-safe), matching
    window PARTITION BY semantics.
    """
    pcols = list(partition_cols)
    for reserved in (_PID, _CNT, _OFF, _N, _RANK):
        if reserved in df.columns:
            raise ValueError(f"column name {reserved!r} is reserved")
    for new_col in (out, n_out):
        if new_col is not None and new_col in df.columns:
            raise ValueError(
                f"output column {new_col!r} already exists in the input"
            )
    nparts = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )

    # 1-2: range-partition on (group, order) and freeze the placement.
    # The localCheckpoint blocks live until the returned frame's RDD is
    # driver-GC'd (ContextCleaner) — the same lifecycle as every
    # ivf_exact._unit(materialize=True) frame in the engine; batch
    # queries hold one input-sized snapshot per ranking pass, never an
    # accumulating per-trigger stream of them (streams needing explicit
    # unpersist cadence should rank per-micro-batch in foreachBatch).
    ranged = df.repartitionByRange(
        nparts, *[F.col(c) for c in pcols], *order_cols
    )
    # LAZY cut (r15, guide §1.2): the counts collect in step 3 is the
    # first action and materializes these blocks; the eager form paid
    # one extra dedicated job per ranking pass. The physical plan of
    # the checkpointed subtree is captured HERE either way (Dataset
    # .localCheckpoint snapshots queryExecution.toRdd at call time),
    # so the frozen-placement guarantee is unchanged: both consumers
    # (the counts aggregate and the offset join) read the same
    # materialized RDD blocks.
    frozen = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False
    )

    # 3: per-(group, pid) counts -> prefix offsets + group totals.
    # The counts frame is <= |groups| x P rows — bounded by the output
    # grid times the partition count, NEVER by the corpus — so this is
    # a probe-list-class collect (like IVF centroids / z-order bucket
    # sets), and doing the prefix sums driver-side keeps every window
    # in the final plan partitioned.
    counts = frozen.groupBy(*pcols, _PID).agg(F.count(F.lit(1)).alias(_CNT))
    rows = counts.collect()
    by_group: dict[tuple, list[tuple[int, int]]] = {}
    for r in rows:
        by_group.setdefault(tuple(r[c] for c in pcols), []).append(
            (r[_PID], r[_CNT])
        )
    off_rows = []
    for g, lst in by_group.items():
        lst.sort()
        n = sum(c for _, c in lst)
        acc = 0
        for pid, c in lst:
            off_rows.append((*g, pid, acc, n))
            acc += c
    offs_schema = T.StructType(
        [counts.schema[c] for c in pcols]
        + [
            T.StructField(_PID, T.IntegerType(), False),
            T.StructField(_OFF, T.LongType(), False),
            T.StructField(_N, T.LongType(), False),
        ]
    )
    offs = df.sparkSession.createDataFrame(off_rows, offs_schema)

    # 4: local rank within the (group, pid) slice + offset. The group
    # keys join NULL-SAFE so a NULL group ranks as its own partition
    # exactly like window PARTITION BY (a plain equi-join would
    # silently DROP those rows).
    offs_b = F.broadcast(offs)
    cond = [frozen[_PID] == offs_b[_PID]]
    for c in pcols:
        cond.append(frozen[c].eqNullSafe(offs_b[c]))
    joined = frozen.join(offs_b, cond).drop(offs_b[_PID])
    for c in pcols:
        joined = joined.drop(offs_b[c])
    wl = Window.partitionBy(*pcols, _PID).orderBy(*order_cols)
    ranked = joined.withColumn(
        out, (F.row_number().over(wl).cast("long") + F.col(_OFF)).alias(out)
    )
    keep = [c for c in df.columns] + [out]
    if n_out is not None:
        ranked = ranked.withColumn(n_out, F.col(_N))
        keep.append(n_out)
    return ranked.select(*keep)


def with_global_ntile(
    df: DataFrame,
    k: int,
    order_cols: Sequence[Column],
    out: str,
    partition_cols: Sequence[str] = (),
    rank_out: str | None = None,
    n_out: str | None = None,
) -> DataFrame:
    """Add ``out`` = ntile(k) OVER (PARTITION BY partition_cols ORDER BY
    order_cols) — bit-identical to the window function (the first
    ``n % k`` tiles get ``n div k + 1`` rows, the rest ``n div k``) but
    with the distributed-rank plan instead of a single-partition sort.

    ``rank_out``/``n_out`` optionally expose the global rank and group
    size (percent_rank = (rank-1)/(n-1) when n > 1 else 0.0).
    """
    kk = int(k)
    if kk < 1:
        raise ValueError(f"ntile requires k >= 1, got {k}")
    if out in df.columns:
        raise ValueError(
            f"output column {out!r} already exists in the input"
        )
    rcol = rank_out or _RANK
    ncol = n_out or _N
    ranked = with_global_rank(
        df,
        order_cols,
        out=rcol,
        partition_cols=partition_cols,
        n_out=ncol,
    )
    # ntile(k) over n rows: q = n div k rows per tile, the first
    # n % k tiles take one extra. With rank r (1-based):
    #   r <= (q+1)*(n%k)  ->  tile = ceil(r / (q+1))
    #   else              ->  tile = n%k + ceil((r - (q+1)*(n%k)) / q)
    # q = 0 (n < k) stays in the first branch for every row (tile = r).
    q = f"({ncol} div {kk})"
    rem = f"({ncol} % {kk})"
    cut = f"(({q} + 1) * {rem})"
    tile = F.expr(
        f"CASE WHEN {rcol} <= {cut} "
        f"THEN ({rcol} + {q}) div ({q} + 1) "
        f"ELSE {rem} + ({rcol} - {cut} + {q} - 1) div {q} END"
    ).cast("int")
    result = ranked.withColumn(out, tile)
    drop = [c for c in (rcol, ncol) if c in (_RANK, _N)]
    return result.drop(*drop) if drop else result

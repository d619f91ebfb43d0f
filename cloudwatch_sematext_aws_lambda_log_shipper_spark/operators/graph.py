"""Graph centrality over operator-built graphs (k-NN, near-dup):
PageRank in SCALED-INTEGER arithmetic, so the iteration is bit-exact
in any engine and a chained-CTE SQL oracle can replay it step for
step — the same determinism discipline as the k-center and EWMA
recurrences (floats only at display time).

Why centrality in a data pipeline: on the embedding k-NN graph,
PageRank mass concentrates on vectors central to dense regions —
a redundancy signal (downweight for diversity) or a canonicality
signal (prefer as cluster representative), complementing SemDeDup's
cluster view with a global one.

Arithmetic (damping d = 85/100, total mass M = 10^12, all BIGINT):
  s_0(v)   = M div N
  contrib  = (s(u) * 85) div (100 * outdeg(u))
  s_i+1(v) = (M * 15) div (100 * N)  +  sum over in-neighbors(contrib)
Floor divisions leak a few units of mass per step — deterministic,
identical in both engines, and irrelevant to ranking; what matters is
that NO float ever feeds the next iteration.

Scale: each iteration is one equi join (state x edges, shuffling on
the edge key) + one map-side-combinable aggregate; state is one long
per node. Lineage is cut with localCheckpoint every iteration —
without it the 10-iteration plan nests 10 joins deep and the optimizer
re-analyzes the whole tree each step (the connected-components
lesson). Driver holds nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASS = 1_000_000_000_000  # 10^12


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, pr_scaled, pr) for every node appearing in ``edges``
    (either side). ``pr_scaled`` is the exact BIGINT state after
    ``n_iter`` iterations; ``pr`` = pr_scaled / 10^12 for reading."""
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # Empty edge set (tiny or fully-filtered corpus): no nodes, no
        # ranks — return an empty frame with the contract schema rather
        # than dividing by zero below.
        return nodes.select(
            "node",
            F.lit(None).cast("long").alias("pr_scaled"),
            F.lit(None).cast("double").alias("pr"),
        )
    outdeg = e.groupBy("_src").agg(F.count(F.lit(1)).alias("_deg"))
    ew = e.join(outdeg, "_src").localCheckpoint(eager=True)

    teleport = (MASS * 15) // (100 * n)
    state = nodes.withColumn("s", F.lit(MASS // n).cast("long"))
    for _ in range(n_iter):
        contrib = (
            state.join(ew, state.node == ew._src)
            .select(
                F.col("_dst").alias("node"),
                F.expr("(s * 85) div (100 * _deg)").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        state = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport).cast("long")
                    + F.coalesce(F.col("_in"), F.lit(0).cast("long"))
                ).alias("s"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        "node",
        F.col("s").alias("pr_scaled"),
        (F.col("s").cast("double") / F.lit(float(MASS))).alias("pr"),
    )

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
per node. Lineage is cut with localCheckpoint every SECOND iteration
(state is single-referenced per step, so a 2-deep nest re-evaluates
nothing; without any cut the 10-iteration plan nests 10 joins deep and
the optimizer re-analyzes the whole tree each step — the
connected-components lesson). Driver holds nothing.
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .lineage import cut_lineage

MASS = 1_000_000_000_000  # 10^12

# Bounded-graph driver resolution (opt r15, guide §1.2 step 1 — the
# connected_components union-find precedent in operators/dedup.py):
# every iterative graph op here is a few integer rounds over an edge
# list, and each distributed round costs a join + aggregate + its
# scheduling hop (~0.3-0.8 s of pure fixed cost at bench scale). When
# the edge list provably fits on the driver (default 1M edges ≈ tens
# of MB — the probe-list-collect class), the exact iteration replays
# in Python ints in microseconds with BIT-IDENTICAL results (floor
# divisions, vote counts and min/argmax rules are engine-independent
# integer arithmetic). Past the bound the distributed loops below are
# UNCHANGED — the 100 TB shape. Both paths flip-pinned bit-equal in
# tests/test_opt_r15d.py.
_GRAPH_DRIVER_MAX_EDGES = 1_000_000


def _collect_bounded_edges(e: DataFrame, est_edges: int | None):
    """Return the FULL edge row list when the graph is bounded enough
    to resolve driver-side, else None (stay distributed).

    With a metadata estimate (e.g. k x the parquet footer row bound)
    the decision costs ZERO jobs: an estimate over the bound routes
    distributed with no probe, an estimate under it makes collect()
    both the probe and the data (est is an upper bound). Without an
    estimate a ``limit(N+1)`` probe decides — and because
    ``limit(N+1).collect()`` of a <=N-row frame returns every row,
    the probe IS the collect on the bounded side (the
    connected_components pattern)."""
    max_edges = int(
        os.environ.get("GRAPH_DRIVER_MAX_EDGES", _GRAPH_DRIVER_MAX_EDGES)
    )
    if est_edges is not None:
        if est_edges > max_edges:
            return None
        return e.collect()
    rows = e.limit(max_edges + 1).collect()
    if len(rows) > max_edges:
        return None
    return rows

# Crossover for pre-hash-partitioning the frames an iterative graph
# algorithm re-joins every round (opt r15, guide §2.4). Below it the
# per-iteration joins broadcast (edge frames this small cost more to
# pre-shuffle than they save — measured +0.6 s on embedding_pagerank
# at sf0.1); above it the edge side can no longer broadcast and every
# iteration would otherwise re-shuffle the biggest frame in the
# algorithm, so one up-front hash exchange replaces n_iter of them.
# Same env-overridable crossover discipline as the ANN dot cost rule.
GRAPH_PREPARTITION_MIN_EDGES = int(
    os.environ.get("GRAPH_PREPARTITION_MIN_EDGES", "5000000")
)


def _maybe_prepartition(
    df: DataFrame, key: str, est_edges: int | None
) -> DataFrame:
    """Hash-partition ``df`` on ``key`` (pinned partition count, so
    localCheckpoint preserves a partitioning the iteration joins can
    reuse) when the caller-supplied edge estimate clears the
    crossover; identity otherwise. Values are identical either way —
    only the exchange placement changes."""
    if est_edges is None or est_edges < GRAPH_PREPARTITION_MIN_EDGES:
        return df
    nparts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(nparts, key)


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    est_edges: int | None = None,
) -> DataFrame:
    """(node, pr_scaled, pr) for every node appearing in ``edges``
    (either side). ``pr_scaled`` is the exact BIGINT state after
    ``n_iter`` iterations; ``pr`` = pr_scaled / 10^12 for reading.

    ``checkpoint_dir`` upgrades the per-iteration lineage cut to a
    RELIABLE checkpoint (operators/lineage.py) — executor loss on a
    real cluster recomputes from checkpoint files instead of killing
    the whole iteration chain. Identical results either way.

    ``est_edges`` (e.g. k x the corpus footer row bound for a k-NN
    graph) feeds the pre-partitioning cost rule: past
    GRAPH_PREPARTITION_MIN_EDGES, ``ew`` and ``nodes`` are
    hash-partitioned on their join keys ONCE before the cut, so each
    of the n_iter state⋈ew / nodes⋈contrib joins reuses the
    materialized partitioning instead of re-shuffling the edge frame
    (guide §2.4); below it the joins broadcast and the pre-shuffle
    would be pure overhead. Identical values either way."""
    e = edges.select(
        F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst")
    )
    # Bounded graphs resolve driver-side (see _collect_bounded_edges;
    # skipped under a RELIABLE checkpoint request, whose point is
    # cluster-side fault tolerance). est_edges is an upper bound, so
    # the route costs zero extra jobs: one collect replaces n_iter
    # join/aggregate rounds. Bit-identical: every step below is floor
    # division and integer sums, replayed exactly in Python ints.
    if checkpoint_dir is None:
        rows = _collect_bounded_edges(e, est_edges)
        if rows is not None:
            return _pagerank_driver(
                edges.sparkSession, rows, e.schema["_src"].dataType, n_iter
            )
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    nodes = _maybe_prepartition(nodes, "node", est_edges)
    # lazy cut: the count() right below materializes it in the same
    # job (r15 — eager cuts each cost a dedicated job; values and the
    # lineage-truncation effect are identical, guide §1.2/§2.4)
    nodes = cut_lineage(nodes, checkpoint_dir, eager=False)
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
    ew = cut_lineage(
        _maybe_prepartition(e.join(outdeg, "_src"), "_src", est_edges),
        checkpoint_dir,
        eager=False,
    )

    teleport = (MASS * 15) // (100 * n)
    state = nodes.withColumn("s", F.lit(MASS // n).cast("long"))
    for i in range(n_iter):
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
        )
        # cut every SECOND iteration (and after the last): a 2-deep
        # join nest analyzes fine. Values are identical (the cut only
        # truncates lineage). LAZY cuts (r15): the plan-depth bound is
        # the same, but materialization folds into the single final
        # action instead of one scheduled job per cut — the persisted
        # blocks are still computed exactly once each.
        if i % 2 == 1 or i == n_iter - 1:
            state = cut_lineage(state, checkpoint_dir, eager=False)
    return state.select(
        "node",
        F.col("s").alias("pr_scaled"),
        (F.col("s").cast("double") / F.lit(float(MASS))).alias("pr"),
    )


def _pagerank_driver(spark, rows, node_type, n_iter: int) -> DataFrame:
    """Exact driver-side replay of the scaled-integer PageRank over a
    bounded collected edge list — bit-identical to the distributed
    loop: same floor divisions, same integer sums (order-free), same
    final double division (pr_scaled < 2^53, so int->double is exact
    in both engines). Edge multiplicity is preserved (a repeated edge
    contributes repeatedly, exactly as the join does)."""
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("pr_scaled", T.LongType(), True),
            T.StructField("pr", T.DoubleType(), True),
        ]
    )
    edge_list = [(r[0], r[1]) for r in rows]
    node_set = set()
    for a, b in edge_list:
        node_set.add(a)
        node_set.add(b)
    n = len(node_set)
    if n == 0:
        return spark.createDataFrame([], schema)
    outdeg = Counter(a for a, _ in edge_list)
    teleport = (MASS * 15) // (100 * n)
    state = dict.fromkeys(node_set, MASS // n)
    for _ in range(n_iter):
        inflow = Counter()
        for a, b in edge_list:
            inflow[b] += (state[a] * 85) // (100 * outdeg[a])
        state = {v: teleport + inflow.get(v, 0) for v in node_set}
    return spark.createDataFrame(
        [(v, s, s / float(MASS)) for v, s in state.items()], schema
    )


def label_propagation(
    edges: DataFrame,
    n_iter: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    est_edges: int | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), made deterministic: every node starts as its own
    label; each iteration every node adopts the label with the highest
    neighbor vote, ties broken toward the SMALLEST label; updates are
    synchronous (classic LPA updates asynchronously in random order —
    unreplayable). The argmax is one integer max_by key
    ``(count << 32) - label``, so the whole run is exact integer
    arithmetic any engine replays step for step.

    Input edges are treated as undirected (symmetrized here), and every
    node casts one vote for its OWN current label (a self-loop): pure
    synchronous LPA 2-cycles on bipartite-ish structures (a 3-node path
    oscillates forever); the self-vote damps the oscillation and the
    run converges in practice.
    Output: (node, community) after ``n_iter`` rounds.

    Scale: per iteration one state⋈edges equi-join + two map-side-
    combinable aggregates; state is one long per node; lineage cut per
    iteration (the pagerank lesson). Driver holds nothing.
    """
    fwd = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    # Bounded graphs resolve driver-side (see _collect_bounded_edges;
    # skipped under a RELIABLE checkpoint request). Without a metadata
    # estimate a limit(N+1) probe decides, so fwd is persisted first —
    # an over-the-bound probe's evaluation then feeds the distributed
    # path below instead of being recomputed (the connected_components
    # persist-then-probe pattern).
    if checkpoint_dir is None:
        if est_edges is None:
            fwd = fwd.persist()
        rows = _collect_bounded_edges(fwd, est_edges)
        if rows is not None:
            if est_edges is None:
                fwd.unpersist()
            return _label_propagation_driver(
                edges.sparkSession, rows, fwd.schema["_src"].dataType, n_iter
            )
    e = (
        fwd.unionByName(
            fwd.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
        )
        .distinct()
    )
    e = cut_lineage(e, checkpoint_dir, eager=False)
    # cost-ruled partitioning pin of the frames the iteration reuses
    # (opt r15, guide §2.4 — see pagerank/_maybe_prepartition): the
    # edge table by its join key _src, the node spine by node, so past
    # the crossover the per-iteration votes join finds both sides
    # hash-clustered and the only shuffles left are the two vote
    # aggregations.
    nodes = cut_lineage(
        _maybe_prepartition(
            e.select(F.col("_src").alias("node")).distinct(),
            "node",
            est_edges,
        ),
        checkpoint_dir,
        eager=False,
    )
    e = cut_lineage(
        _maybe_prepartition(
            e.unionByName(
                nodes.select(
                    F.col("node").alias("_src"), F.col("node").alias("_dst")
                )
            ),
            "_src",
            est_edges,
        ),
        checkpoint_dir,
        eager=False,
    )
    state = nodes.withColumn("lbl", F.col("node"))
    for i in range(n_iter):
        votes = (
            state.join(e, state.node == e._src)
            .groupBy(F.col("_dst").alias("vnode"), "lbl")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        upd = votes.groupBy("vnode").agg(
            F.max_by(
                "lbl", F.shiftleft(F.col("c"), 32) - F.col("lbl")
            ).alias("new_lbl")
        )
        state = (
            state.join(upd, state.node == upd.vnode, "left")
            .select(
                "node",
                F.coalesce(F.col("new_lbl"), F.col("lbl")).alias("lbl"),
            )
        )
        # NO cadence here (unlike pagerank): state is referenced TWICE
        # per iteration (the votes join AND the label carry), so an
        # uncut level would re-evaluate the previous iteration's work
        # once per reference — the cut per iteration is load-bearing.
        # LAZY (r15): the persisted blocks still compute exactly once
        # (both consumers read the same persisted RDD within the final
        # action's job); only the per-cut scheduled jobs disappear.
        state = cut_lineage(state, checkpoint_dir, eager=False)
    return state.select("node", F.col("lbl").alias("community"))


def _label_propagation_driver(spark, rows, node_type, n_iter: int) -> DataFrame:
    """Exact driver-side replay of the deterministic synchronous LPA
    over a bounded collected edge list — bit-identical to the
    distributed loop: votes are counted over the SAME multiset (the
    symmetrized deduped edge set plus one self-loop per node, appended
    un-deduped exactly as the unionByName does) and the argmax uses
    the identical integer key ``(count << 32) - label`` with a
    smallest-label tiebreak on key collisions."""
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("community", node_type, True),
        ]
    )
    sym = set()
    for r in rows:
        a, b = r[0], r[1]
        sym.add((a, b))
        sym.add((b, a))
    node_set = {a for a, _ in sym}
    if not node_set:
        return spark.createDataFrame([], schema)
    # self-loops appended WITHOUT dedup (matches the distributed
    # unionByName): a pre-existing (v, v) edge yields two self-votes
    votes_edges = list(sym) + [(v, v) for v in node_set]
    state = {v: v for v in node_set}
    for _ in range(n_iter):
        votes: dict = {}
        for a, b in votes_edges:
            votes.setdefault(b, Counter())[state[a]] += 1
        new_state = {}
        for v, cnt in votes.items():
            best_key, best_lbl = None, None
            for lbl, c in cnt.items():
                key = (c << 32) - lbl
                if (
                    best_key is None
                    or key > best_key
                    or (key == best_key and lbl < best_lbl)
                ):
                    best_key, best_lbl = key, lbl
            new_state[v] = best_lbl
        state = {v: new_state.get(v, lbl) for v, lbl in state.items()}
    return spark.createDataFrame(sorted(state.items()), schema)


def kcore_survivors(
    edges: DataFrame,
    k: int = 2,
    n_rounds: int = 6,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_dir: str | None = None,
    est_edges: int | None = None,
) -> DataFrame:
    """k-core peeling (Seidman 1983), ``n_rounds`` synchronous rounds:
    repeatedly drop nodes whose degree among SURVIVORS is < k — what
    remains approaches the maximal subgraph where every node keeps >= k
    neighbors (dense-community extraction; at small diameters a few
    rounds reach the fixed point, reported via ``converged``).
    Deterministic by construction: degree counting and thresholding are
    pure integer ops, so a chained-CTE oracle replays every round.

    Output: surviving (node, degree) after the final round, plus a
    constant ``converged`` flag (the last round removed nothing).

    Scale: per round one semi join (edges vs survivors, both sides) +
    one map-side-combined degree count; lineage cut per round."""
    fwd = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    # Bounded graphs resolve driver-side (see _collect_bounded_edges;
    # the label_propagation persist-then-probe shape)
    if checkpoint_dir is None:
        if est_edges is None:
            fwd = fwd.persist()
        rows = _collect_bounded_edges(fwd, est_edges)
        if rows is not None:
            if est_edges is None:
                fwd.unpersist()
            return _kcore_driver(
                edges.sparkSession, rows, fwd.schema["_src"].dataType,
                k, n_rounds,
            )
    e = (
        fwd.unionByName(
            fwd.select(F.col("_dst").alias("_src"), F.col("_src").alias("_dst"))
        )
        .distinct()
    )
    e = cut_lineage(e, checkpoint_dir, eager=False)
    survivors = e.select(F.col("_src").alias("node")).distinct()
    prev = survivors
    last = None
    for r in range(n_rounds):
        alive = e.join(
            survivors.withColumnRenamed("node", "_s"), e._src == F.col("_s"), "left_semi"
        ).join(
            survivors.withColumnRenamed("node", "_d"), e._dst == F.col("_d"), "left_semi"
        )
        deg = alive.groupBy(F.col("_src").alias("node")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        if r == n_rounds - 1:
            prev = survivors  # round n-1 survivors, for the converged flag
        survivors = cut_lineage(
            deg.filter(F.col("degree") >= k).select("node"), checkpoint_dir,
            eager=False,  # r15: materializes in the final counts' job
        )
        last = deg.filter(F.col("degree") >= k)
    if last is None:
        return survivors.select(
            "node", F.lit(0).alias("degree"), F.lit(True).alias("converged")
        )
    # one pair of counts at the end, not one per round
    converged = survivors.count() == prev.count()
    return last.withColumn("converged", F.lit(bool(converged)))


def _kcore_driver(spark, rows, node_type, k: int, n_rounds: int) -> DataFrame:
    """Exact driver-side replay of the synchronous k-core peeling over
    a bounded collected edge list — bit-identical to the distributed
    loop: degrees are counted over the symmetrized DEDUPED edge set
    among current survivors, thresholded at k, with the converged flag
    comparing the last two rounds' survivor counts."""
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("degree", T.LongType(), True),
            T.StructField("converged", T.BooleanType(), False),
        ]
    )
    sym = set()
    for r in rows:
        a, b = r[0], r[1]
        sym.add((a, b))
        sym.add((b, a))
    survivors = {a for a, _ in sym}
    prev = survivors
    last = None
    for r in range(n_rounds):
        deg = Counter(
            a for a, b in sym if a in survivors and b in survivors
        )
        if r == n_rounds - 1:
            prev = survivors
        survivors = {a for a, d in deg.items() if d >= k}
        last = {a: d for a, d in deg.items() if d >= k}
    if last is None:
        return spark.createDataFrame(
            [(v, 0, True) for v in sorted(survivors)], schema
        )
    converged = len(survivors) == len(prev)
    return spark.createDataFrame(
        [(v, d, converged) for v, d in sorted(last.items())], schema
    )


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    node_col: str = "node",
    checkpoint_dir: str | None = None,
    est_edges: int | None = None,
) -> DataFrame:
    """Multi-source BFS: minimum hop distance from any source node,
    bounded at ``max_hops`` — the reachability primitive behind
    "expand a seed set through the similarity graph" curation moves
    (seed-quality propagation, contamination blast-radius audits).

    Output: (node, hop) for every node whose min-distance from the
    seed set is <= max_hops; hop is INT, 0 for the seeds themselves.

    Determinism: pure set/integer computation — the first-visit hop
    IS the min hop (frontier h can only reach nodes at distance h+1
    that anti-join away all earlier-visited nodes), so no float and
    no tie-break ambiguity exists for an oracle to diverge on.

    Scale: delta iteration — each hop joins only the FRONTIER (newly
    reached nodes) against the edge table, shuffling on the edge key;
    visited state grows monotonically but is only touched by an
    anti join per hop. Lineage cut per hop (the pagerank cadence
    lesson); early-exits when a frontier is empty so a disconnected
    seed set costs hops-reached jobs, not max_hops. Driver holds
    nothing but the per-hop empty check."""
    e = edges.select(F.col(src_col).alias("_src"), F.col(dst_col).alias("_dst"))
    # Bounded graphs resolve driver-side (see _collect_bounded_edges;
    # the seed set is collected too — it is nodes-bounded by contract
    # and only read after the edge probe routes here)
    if checkpoint_dir is None:
        if est_edges is None:
            e = e.persist()
        rows = _collect_bounded_edges(e, est_edges)
        if rows is not None:
            if est_edges is None:
                e.unpersist()
            seeds = [
                r[0]
                for r in sources.select(F.col(node_col).alias("node"))
                .distinct()
                .collect()
            ]
            return _bfs_driver(
                edges.sparkSession, rows, seeds,
                sources.schema[node_col].dataType, max_hops,
            )
    # one cut up front: every hop joins the edge table, and an
    # expensively-built edge frame (e.g. the k-NN graph) must not
    # re-evaluate per hop (the pagerank `ew` lesson). LAZY (r15): hop
    # 1's isEmpty materializes both; blocks still compute once each.
    # Cost-ruled partitioning pin on the join key (opt r15, guide
    # §2.4 — _maybe_prepartition): past the crossover each hop's
    # frontier⋈edges join shuffles only the frontier side — the edge
    # table, the big side at scale, never moves again.
    e = cut_lineage(
        _maybe_prepartition(e, "_src", est_edges), checkpoint_dir,
        eager=False,
    )
    state = (
        sources.select(F.col(node_col).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("int"))
    )
    state = cut_lineage(state, checkpoint_dir, eager=False)
    frontier = state
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.node == e._src)
            .select(F.col("_dst").alias("node"))
            .distinct()
            .join(state.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("int"))
        )
        # lazy: the isEmpty right below materializes partition 0 and
        # Spark's post-job doCheckpoint fills the remaining partitions
        # of the SAME persisted blocks — one scheduler round instead
        # of a dedicated full job per hop
        nxt = cut_lineage(nxt, checkpoint_dir, eager=False)
        if nxt.isEmpty():
            break
        # both union inputs are already materialized — the accumulated
        # state stays a PLAIN union of checkpointed frontiers (flat,
        # shallow lineage); re-cutting it would rewrite O(|visited|)
        # rows every hop
        state = state.unionByName(nxt)
        frontier = nxt
    return state


def _bfs_driver(spark, rows, seeds, node_type, max_hops: int) -> DataFrame:
    """Exact driver-side replay of the frontier BFS over a bounded
    collected edge list — bit-identical to the distributed loop: the
    first-visit hop IS the min hop, seeds report 0 (isolated seeds
    included), expansion stops at max_hops or an empty frontier."""
    schema = T.StructType(
        [
            T.StructField("node", node_type, False),
            T.StructField("hop", T.IntegerType(), False),
        ]
    )
    adj: dict = {}
    for r in rows:
        adj.setdefault(r[0], set()).add(r[1])
    state = {s: 0 for s in seeds}
    frontier = set(state)
    for h in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            nxt.update(adj.get(u, ()))
        nxt -= state.keys()
        if not nxt:
            break
        for v in nxt:
            state[v] = h
        frontier = nxt
    return spark.createDataFrame(sorted(state.items()), schema)


def triangle_counts(
    edges: DataFrame, src_col: str = "s", dst_col: str = "d"
) -> DataFrame:
    """Per-node triangle counts for an UNDIRECTED graph given as
    ordered edges (src < dst, one row per edge): the standard
    ordered-edge two-join — each triangle materializes exactly once as
    a < b < c (never six rotations), then every corner votes.

    Scale: two equi-joins on edge endpoints; the candidate wedge set
    is sum-of-squared-degrees-bounded, the canonical distributed
    triangle enumeration (swap in degree-ordered orientation for
    skewed graphs)."""
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    x, y, z = e.alias("x"), e.alias("y"), e.alias("z")
    tri = (
        x.join(y, F.col("x.d") == F.col("y.s"))
        .join(z, (F.col("z.s") == F.col("x.s"))
              & (F.col("z.d") == F.col("y.d")))
        .select(
            F.col("x.s").alias("a"),
            F.col("x.d").alias("b"),
            F.col("y.d").alias("c"),
        )
    )
    membership = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return membership.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )


def clustering_coefficients(
    edges: DataFrame, src_col: str = "s", dst_col: str = "d"
) -> DataFrame:
    """Per-node LOCAL clustering coefficient over an undirected
    ordered-edge graph: cc(v) = 2 * T(v) / (deg(v) * (deg(v) - 1)) —
    what fraction of v's neighbor pairs are themselves connected, the
    classic local-density measure (Watts–Strogatz). Defined (and
    emitted) only for deg >= 2; triangle-free nodes report 0.

    Determinism: T and deg are exact integers; the single double
    division (2.0 * T first, then divide — one fixed association
    order) is IEEE-identical in any engine, rounded at display.

    Scale: the triangle join above plus one degree aggregate over the
    symmetrized edges and one broadcast-sized left join — nothing
    beyond the triangle enumeration itself."""
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    # two consumers (degree + triangles): cut once; lazy — the final
    # action materializes it, both consumers read the same blocks (r15)
    e = cut_lineage(e, eager=False)
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    deg = sym.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    tc = triangle_counts(e)
    n_tri = F.coalesce(F.col("n_triangles"), F.lit(0).cast("long"))
    return (
        deg.join(tc, "node", "left")
        .filter(F.col("degree") >= 2)
        .select(
            "node",
            "degree",
            n_tri.alias("n_triangles"),
            F.round(
                F.lit(2.0) * n_tri
                / (F.col("degree") * (F.col("degree") - F.lit(1))),
                6,
            ).alias("clustering"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src_col: str = "s", dst_col: str = "d"
) -> DataFrame:
    """Newman's degree assortativity coefficient for an undirected
    graph given as ordered edges (src < dst): the Pearson correlation
    of endpoint degrees over the DIRECTED edge list (each undirected
    edge contributes both orientations — the standard symmetrized
    form). r > 0 = hubs attach to hubs (assortative), r < 0 = hubs
    attach to leaves (disassortative; similarity graphs with
    hub-and-spoke near-dup clusters trend here).

    With the symmetric edge list the x- and y-moments are identical,
    so r reduces to an exact INTEGER ratio:
        r = (M * S_xy - S_x^2) / (M * S_xx - S_x^2)
    (M = directed edge count, S_x = sum deg, S_xy = sum deg_u*deg_v,
    S_xx = sum deg^2) — one double division at the end, NULL for
    degree-regular graphs (denominator 0, r undefined).

    Output: one row (m_edges, num, den, assortativity).

    Scale: one degree aggregate + two broadcast-sized joins to tag
    each edge with endpoint degrees + one global aggregate of four
    integer sums — no window, no collect; the output is a scalar."""
    e = edges.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
    sym = e.unionAll(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    # degree aggregate + edge tagging both read it; lazy cut (r15)
    sym = cut_lineage(sym, eager=False)
    deg = sym.groupBy(F.col("s").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    tagged = (
        sym.join(deg.select(F.col("node").alias("s"),
                            F.col("deg").alias("dx")), "s")
        .join(deg.select(F.col("node").alias("d"),
                         F.col("deg").alias("dy")), "d")
    )
    sums = tagged.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        (F.col("m") / 2).cast("long").alias("m_edges"),
        num.cast("long").alias("num"),
        den.cast("long").alias("den"),
        F.when(den != F.lit(0),
               F.round(num.cast("double") / den, 6)).alias("assortativity"),
    )

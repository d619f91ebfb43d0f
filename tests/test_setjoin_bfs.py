"""Round-15b additions: exact prefix-filtered Jaccard join
(operators/setjoin.py) and multi-source BFS (operators/graph.py).

The setjoin tests pin the prefix/positional-filter EXACTNESS claim
against a python brute force — including pairs exactly AT the
threshold boundary, where an off-by-one in the integer prefix/alpha
arithmetic would first show."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import bfs_hops
from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.setjoin import (
    _keyed_groups,
    _ordered_positions,
    _token_sets,
    containment_neighbor_stats_from_store,
    jaccard_neighbor_stats,
    jaccard_neighbor_stats_from_store,
    jaccard_prefix_join,
    subset_containment_stats_from_store,
)


def _brute_pairs(texts: dict[int, str], num: int, den: int):
    sets = {i: set(t.strip().lower().split()) for i, t in texts.items()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if i * den >= u * num:
            out[(a, b)] = round(i / u, 6)
    return out


BOUNDARY_TEXTS = {
    # identical pair (collapse path)
    1: "a b c d e f g h i j",
    2: "a b c d e f g h i j",
    # exactly 0.9: 9 shared / 10 union vs doc 3's 9-token set
    3: "a b c d e f g h i",
    # 18/22 = 0.818... vs doc 1 (below 0.9, above 0.8)
    4: "a b c d e f g h i j k l m n o p q r s t",
    # disjoint
    5: "x y z w v u t2 s2 r2 q2",
    # one-token doc equal to another one-token doc
    6: "solo",
    7: "solo",
    # near-boundary big sets: 19 shared / 21 union = 0.904...
    8: " ".join(f"t{i}" for i in range(20)),
    9: " ".join(f"t{i}" for i in range(19)) + " extra",
}


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def test_prefix_join_matches_bruteforce_at_boundaries(spark):
    docs = _mkdocs(spark, BOUNDARY_TEXTS)
    for num, den in ((9, 10), (4, 5), (1, 2)):
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in jaccard_prefix_join(
                docs, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert got == _brute_pairs(BOUNDARY_TEXTS, num, den), (num, den)


def test_prefix_join_exact_threshold_pair_included(spark):
    # doc 1 vs doc 3: i=9, u=10 -> jaccard exactly 0.9; must be IN at 9/10
    docs = _mkdocs(spark, {1: BOUNDARY_TEXTS[1], 3: BOUNDARY_TEXTS[3]})
    rows = jaccard_prefix_join(docs, threshold_num=9, threshold_den=10).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 3, 0.9)]


def test_neighbor_stats_matches_pairwise_aggregation(spark):
    docs = _mkdocs(spark, BOUNDARY_TEXTS)
    pairs = _brute_pairs(BOUNDARY_TEXTS, 9, 10)
    want = {}
    for (a, b), j in pairs.items():
        for d, o in ((a, b), (b, a)):
            n, best = want.get(d, (0, 0.0))
            want[d] = (n + 1, max(best, j))
    got = {
        r.doc_id: (r.n_dup_neighbors, r.best_jaccard)
        for r in jaccard_neighbor_stats(
            docs, threshold_num=9, threshold_den=10
        ).collect()
    }
    assert got == want
    # the identical docs (1,2) and (6,7) must count each other at 1.0
    assert got[1][1] == 1.0 and got[6] == (1, 1.0) and got[7] == (1, 1.0)


def test_neighbor_stats_store_matches_in_session(spark, sf_dir):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import _docs
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.sigstore import (
        wordset_tables,
    )

    docs = _docs(spark, sf_dir)
    insess = {
        (r.doc_id, r.n_dup_neighbors, r.best_jaccard)
        for r in jaccard_neighbor_stats(
            docs, threshold_num=9, threshold_den=10
        ).collect()
    }
    store, positions = wordset_tables(spark, sf_dir)
    stored = {
        (r.doc_id, r.n_dup_neighbors, r.best_jaccard)
        for r in jaccard_neighbor_stats_from_store(
            store, positions, 9, 10
        ).collect()
    }
    assert insess == stored and len(insess) > 0


def _mkstore(spark, texts):
    """Build (store, positions) frames in-session from synthetic docs —
    the same shapes sigstore.wordset_tables persists. In-memory frames
    have no parquet footers, so the subset join's index-side cost rule
    resolves to the salted-shuffle path here (the broadcast path is
    covered by test_subset_index_strategy_flip over the persisted
    artifacts)."""
    from pyspark.sql import functions as F

    docs = _mkdocs(spark, texts)
    sets = _token_sets(docs, "text", "doc_id").localCheckpoint(eager=True)
    keyed, groups = _keyed_groups(sets)
    store = (
        sets.join(keyed, "doc_id").join(groups, "set_key")
        .select("doc_id", "set_key", "w", "L", "rep", "c")
        .localCheckpoint(eager=True)
    )
    reps = store.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "w", "L"
    )
    positions = _ordered_positions(reps).localCheckpoint(eager=True)
    return store, positions


def test_subset_containment_matches_bruteforce(spark):
    sets = {i: set(t.strip().lower().split()) for i, t in BOUNDARY_TEXTS.items()}
    want = {}
    for a in sets:
        sup = [len(sets[b]) for b in sets if b != a and sets[a] <= sets[b]]
        if sup:
            want[a] = (len(sup), min(sup))
    store, positions = _mkstore(spark, BOUNDARY_TEXTS)
    got = {
        r.doc_id: (r.n_supersets, r.min_superset_size)
        for r in subset_containment_stats_from_store(
            store, positions
        ).collect()
    }
    assert got == want
    # doc 1: its identical twin (size 10) AND the 20-token strict
    # container doc 4; the twin is the tightest
    assert got[1] == (2, 10) and got[6] == (1, 1)
    # doc 3 (9 tokens, subset of docs 1/2/4) counts three supersets,
    # tightest is the 10-token twin set
    assert got[3] == (3, 10)


def test_containment_fractional_matches_bruteforce(spark):
    sets = {i: set(t.strip().lower().split()) for i, t in BOUNDARY_TEXTS.items()}
    num, den = 9, 10
    want = {}
    for a in sets:
        hits = [
            len(sets[a] & sets[b]) / len(sets[a])
            for b in sets
            if b != a and len(sets[a] & sets[b]) * den >= len(sets[a]) * num
        ]
        if hits:
            want[a] = (len(hits), round(max(hits), 6))
    store, positions = _mkstore(spark, BOUNDARY_TEXTS)
    got = {
        r.doc_id: (r.n_containers, r.best_containment)
        for r in containment_neighbor_stats_from_store(
            store, positions, num, den
        ).collect()
    }
    assert got == want


def test_subset_index_strategy_flip(spark, sf_dir, monkeypatch):
    # both index-side strategies (footer-bounded broadcast vs salted
    # co-repartitioned shuffle) must return BIT-EQUAL results over the
    # persisted artifacts, and the decision ring must record the flip
    import cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.setjoin as sj
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        drain_dot_decisions,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.sigstore import (
        wordset_tables,
    )

    store, positions = wordset_tables(spark, sf_dir)
    drain_dot_decisions()
    bc = set(
        map(tuple, subset_containment_stats_from_store(store, positions).collect())
    )
    strategies = {d["strategy"] for d in drain_dot_decisions()}
    assert "subset_index_broadcast" in strategies
    monkeypatch.setattr(sj, "INDEX_BROADCAST_MAX_ROWS", 0)
    salted = set(
        map(tuple, subset_containment_stats_from_store(store, positions).collect())
    )
    strategies = {d["strategy"] for d in drain_dot_decisions()}
    assert "subset_index_salted_shuffle" in strategies
    assert bc == salted and len(bc) > 0


def test_set_identity_key_is_injective_over_token_content(spark):
    # a token CONTAINING the would-be separator byte vs two tokens:
    # separator-joined raw tokens would collide; per-token digests
    # must not (review finding on the v1 key)
    docs = spark.createDataFrame(
        [(1, "x\x1fy"), (2, "x y"), (3, None)],
        "doc_id long, text string",
    )
    stats = jaccard_neighbor_stats(
        docs, threshold_num=1, threshold_den=2
    ).collect()
    # jac({x1fy},{x,y}) = 0 -> no pairs at tau=0.5; NULL text drops out
    assert stats == []
    pairs = jaccard_prefix_join(
        docs, threshold_num=1, threshold_den=100
    ).collect()
    # even at tau=0.01 the sets share nothing
    assert pairs == []


# --- BFS ----------------------------------------------------------------


def _edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src long, dst long")


def test_bfs_chain_and_bound(spark):
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, src, max_hops=3).collect()}
    # node 5 is at distance 4 — beyond the bound, absent
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_min_hop_over_diamond(spark):
    # two routes to 4: 1->2->4 (2 hops) and 1->3a->3b->4 (3 hops)
    e = _edges(spark, [(1, 2), (2, 4), (1, 30), (30, 31), (31, 4), (4, 9)])
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, src, max_hops=4).collect()}
    assert got[4] == 2 and got[9] == 3 and got[30] == 1 and got[31] == 2


def test_bfs_multi_source_and_early_exit(spark):
    e = _edges(spark, [(1, 2), (10, 11)])
    src = spark.createDataFrame([(1,), (10,), (10,)], "node long")
    # duplicate source rows dedup; both components expand; frontier
    # empties after hop 1 so the loop exits before max_hops
    got = {r.node: r.hop for r in bfs_hops(e, src, max_hops=4).collect()}
    assert got == {1: 0, 10: 0, 2: 1, 11: 1}


def test_bfs_source_already_closer(spark):
    # a source that is also reachable from another source keeps hop 0
    e = _edges(spark, [(1, 2), (2, 3)])
    src = spark.createDataFrame([(1,), (2,)], "node long")
    got = {r.node: r.hop for r in bfs_hops(e, src, max_hops=4).collect()}
    assert got == {1: 0, 2: 0, 3: 1}


def test_clustering_coefficients_small_graph(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
        clustering_coefficients,
        triangle_counts,
    )

    # triangle 1-2-3 plus pendant edge 3-4 (ordered s < d)
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "s long, d long"
    )
    tri = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert tri == {1: 1, 2: 1, 3: 1}
    cc = {
        r.node: (r.degree, r.n_triangles, r.clustering)
        for r in clustering_coefficients(e).collect()
    }
    # node 4 (degree 1) is excluded; node 3 has 3 neighbors, 1 of the
    # 3 neighbor pairs connected
    assert cc == {
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (3, 1, round(1 / 3, 6)),
    }


def test_clustering_coefficient_triangle_free(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
        clustering_coefficients,
    )

    # path 1-2-3: node 2 has degree 2, zero triangles -> cc 0
    e = spark.createDataFrame([(1, 2), (2, 3)], "s long, d long")
    cc = {r.node: r.clustering for r in clustering_coefficients(e).collect()}
    assert cc == {2: 0.0}


def test_degree_assortativity_star_and_cycle(spark):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.graph import (
        degree_assortativity,
    )

    # star K_{1,3}: center deg 3, leaves deg 1 -> r = -1 exactly
    star = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], "s long, d long")
    r = degree_assortativity(star).collect()[0]
    assert (r.m_edges, r.assortativity) == (3, -1.0)
    # 4-cycle: degree-regular -> denominator 0 -> NULL
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "s long, d long"
    )
    r = degree_assortativity(cyc).collect()[0]
    assert r.den == 0 and r.assortativity is None


def test_changepoint_finds_planted_step(spark, monkeypatch, tmp_path):
    # a synthetic daily series with a clean level shift: 20 days at
    # ~10/day then 20 days at ~30/day -> the split must land on the
    # boundary and the means must match the construction
    import datetime

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.analytics import (
        events_changepoint,
    )

    rows = []
    eid = 0
    for d in range(40):
        day = datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d)
        for k in range(10 if d < 20 else 30):
            rows.append((eid, day + datetime.timedelta(seconds=k)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = events_changepoint(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r.split_day) == "2024-01-20"  # last low day closes segment 1
    assert (r.n_pre, r.n_post) == (20, 20)
    assert (r.mean_pre, r.mean_post) == (10.0, 30.0)
    assert r.sse_gain > 0

"""Exact set-similarity join via prefix filtering (PPJoin-style).

The LSH family (operators/dedup.py) finds near-dup pairs
APPROXIMATELY — banding can miss pairs near the threshold. This
operator is the exact-at-scale counterpart: an equi-joinable
candidate generator whose candidate set PROVABLY contains every pair
with Jaccard >= tau, verified exactly afterwards — the prefix-filter
principle of SSJoin/All-Pairs/PPJoin (Chaudhuri et al. ICDE'06,
Bayardo et al. WWW'07, Xiao et al. WWW'08), re-expressed as three
DataFrame joins.

Why it is exact (prefix lemma): order every document's distinct
tokens by one global total order (ascending document frequency,
token as tie-break — the rare-first order is ALSO the skew defense,
see below) and keep only the first  p = L - ceil(tau * L) + 1
tokens (the "prefix"). If jac(A,B) >= tau then the overlap
I = |A n B| satisfies I >= tau * union >= tau * max(|A|,|B|), so
I >= ceil(tau * |A|); were the FIRST common token t outside A's
prefix, every common token (all >= t in the order) would sit among
A's last ceil(tau*|A|) - 1 < I tokens — contradiction. So the first
common token lies in BOTH prefixes and the prefix equi join finds
every qualifying pair.

Positional filter (PPJoin Lemma 2, same first-common-token
argument): all I common tokens lie at or after t, so
I <= 1 + min(|A| - pos_A(t), |B| - pos_B(t)); requiring that bound
to reach alpha = ceil(num * (|A|+|B|) / (num+den)) (the integer
overlap equivalent of jac >= num/den) prunes candidates whose
matching prefix tokens sit too late to possibly overlap enough —
on template corpora (many sets sharing their rare tokens) this is
the difference between millions and tens of thousands of
candidates. The threshold is carried as an integer ratio num/den so
every filter is exact integer arithmetic — ceil(tau * L) =
(num * L + den - 1) div den — and a SQL oracle replays the SAME
pair set from brute force.

Scale shape (vs the quadratic join a naive exact pass needs):
- the only corpus-wide shuffles are a token-frequency aggregate, a
  per-document window (partitioned by doc/set id — bounded by
  document length, never global), and the prefix self-join keyed on
  token;
- rare-first prefixes make the join buckets SMALL by construction:
  a token shared by f sets contributes at most C(f,2) candidate
  pairs, and prefixes preferentially hold the lowest-f tokens — the
  frequency order is the published skew mitigation, not a heuristic;
- verification is ONE ROW per candidate pair: both sides' sorted
  token arrays join in (set-id keyed, array payload) and
  `array_intersect` counts the overlap JVM-side — no token
  explosion, no per-pair shuffle fan-out;
- nothing all-pairs is ever materialized and the driver holds
  nothing.

Template corpora add one more quadratic trap — the PAIR OUTPUT
itself: a near-dup cluster of n documents is n*(n-1)/2 pairs, so
listing pairs is quadratic in cluster size no matter how cleverly
they are found (this corpus has word-set clusters of hundreds of
docs; at 100 TB they'd be millions). ``jaccard_neighbor_stats`` is
the output-bounded deliverable: collapse IDENTICAL token sets first
(their pairwise Jaccard is 1 by definition — no join needed), run
the exact prefix join over UNIQUE sets only, then expand back to one
row per document by pure group-count arithmetic. Output is
|documents| rows, candidate volume is |unique sets|-driven, and the
answer is still bit-derived from the exact pair predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import words

# Inverted-index bounds under which the subset join broadcasts the
# index instead of salting a shuffle. BOTH must hold (from parquet
# footers, no job): a row bound alone can't gate a broadcast of
# variable-width token strings (a corpus of minified-blob "tokens"
# makes per-row bytes unbounded), and a byte bound alone could admit
# degenerate many-tiny-row relations whose hash-table overhead
# dominates. Above either (a 100 TB corpus's index), the salted
# co-repartitioned join is the only sound shape.
INDEX_BROADCAST_MAX_ROWS = 4_000_000
INDEX_BROADCAST_MAX_BYTES = 256 << 20  # uncompressed, from footers

# Salt count for the shuffle fallback: a small CONSTANT (hot tokens
# split this many ways; the index pays this many replicas through one
# shuffle). Deliberately NOT cluster parallelism — replication cost
# must not scale with cluster size (r15b review).
SUBSET_SALTS = 16


def _ceil_frac(col: str, num: int, den: int):
    """ceil(num * col / den) in exact integer arithmetic."""
    return F.expr(f"({num} * {col} + {den} - 1) div {den}")


def _exact_overlap(cand: DataFrame, sets: DataFrame) -> DataFrame:
    """Append the exact overlap count ``i`` = |A n B| to a candidate
    frame carrying (id_a, id_b, ...): join both sides' sorted token
    arrays in and count ONE array_intersect per pair — the single
    exactness-critical verification join shared by the Jaccard and
    containment paths."""
    wa = sets.select(F.col("doc_id").alias("id_a"), F.col("w").alias("wa"))
    wb = sets.select(F.col("doc_id").alias("id_b"), F.col("w").alias("wb"))
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .withColumn("i", F.size(F.array_intersect("wa", "wb")).cast("long"))
        .drop("wa", "wb")
    )


def _token_sets(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w, L): each document's DISTINCT whitespace tokens
    (lowercased) as a sorted array — the set the Jaccard is defined
    over, in the compact one-row-per-doc representation verification
    joins on. NULL-text documents have no set and can never satisfy a
    Jaccard threshold (the brute-force oracles agree: NULL propagates
    through the intersection and fails the filter), so they are
    dropped here rather than flowing NULL arrays downstream."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("doc_id"),
            F.array_sort(
                F.array_distinct(words(F.col(text_col)))
            ).alias("w"),
        )
        .withColumn("L", F.size("w"))
    )


def set_identity_key(w):
    """Injective (modulo md5 collisions — the exact-dedup standard)
    identity hash of a token array: md5 over the CONCATENATION OF
    PER-TOKEN MD5s, not over separator-joined raw tokens. Tokens are
    whitespace-split, so they may legally contain any non-whitespace
    byte including a would-be separator; fixed-width per-token digests
    make the encoding prefix-free without trusting token content."""
    return F.md5(F.concat_ws("", F.transform(w, lambda t: F.md5(t))))


def _keyed_groups(sets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(keyed, groups) for the identical-set collapse: keyed = one row
    per doc (doc_id, set_key); groups = one row per UNIQUE set
    (set_key, rep, c) with rep = min doc_id. The single definition of
    the set identity — plans/sigstore.py persists exactly this."""
    keyed = sets.select("doc_id", set_identity_key("w").alias("set_key"))
    groups = keyed.groupBy("set_key").agg(
        F.min("doc_id").alias("rep"), F.count(F.lit(1)).alias("c")
    )
    return keyed, groups


def _ordered_positions(sets: DataFrame) -> DataFrame:
    """(doc_id, token, pos, L): every token of every set with its rank
    under the global rare-first total order (ascending document
    frequency, token tie-break). Threshold-INDEPENDENT — the prefix
    for any tau is a filter on pos, so this table is the cacheable
    half of the join (plans/sigstore.py persists it per corpus
    fingerprint)."""
    toks = sets.select("doc_id", "L", F.explode("w").alias("token"))
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    pos = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("df").asc(),
                                             F.col("token").asc())
    )
    return (
        toks.join(freq, "token")
        .withColumn("pos", pos)
        .select("doc_id", "token", "pos", "L")
    )


def _verified_pairs_from_positions(
    positions: DataFrame,
    sets: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """Exact-Jaccard pairs (id_a < id_b) given the ordered-position
    table and the compact set frame: prefix+positional-filtered
    candidates, then exact verification via one array_intersect per
    candidate. Returns (id_a, id_b, la, lb, i) with sizes/intersection
    as exact ints so callers choose their own output arithmetic."""
    # prefix length p = L - ceil(tau*L) + 1, in exact integers
    pref = positions.filter(
        F.col("pos") <= F.col("L") - _ceil_frac("L", threshold_num,
                                                threshold_den) + 1
    )
    # The self-join below fans out ~100x (every pair of sets sharing a
    # prefix token); AQE sizes the plan from the INPUT (tiny) and would
    # run the explosion in one or two tasks. Spread the probe side over
    # the cluster first — the fan-out then happens in parallel where
    # the rows are produced.
    pref = pref.repartition(
        pref.sparkSession.sparkContext.defaultParallelism, "token"
    )
    a = pref.select(
        F.col("doc_id").alias("id_a"), "token",
        F.col("L").alias("la"), F.col("pos").alias("pa"),
    )
    b = pref.select(
        F.col("doc_id").alias("id_b"), "token",
        F.col("L").alias("lb"), F.col("pos").alias("pb"),
    )
    # integer overlap threshold alpha = ceil(num*(la+lb)/(num+den))
    nd = threshold_num + threshold_den
    alpha = F.expr(f"({threshold_num} * (la + lb) + {nd} - 1) div {nd}")
    cand = (
        a.join(b, "token")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            # pairwise length filter: jac >= tau implies
            # min(L) * den >= max(L) * num
            & (
                F.greatest("la", "lb") * threshold_num
                <= F.least("la", "lb") * threshold_den
            )
            # positional filter: overlap can't exceed
            # 1 + min(remaining suffix lengths) at this token
            & (
                F.lit(1)
                + F.least(F.col("la") - F.col("pa"),
                          F.col("lb") - F.col("pb"))
                >= alpha
            )
        )
        .select("id_a", "id_b", "la", "lb")
        .distinct()
    )
    union = F.col("la") + F.col("lb") - F.col("i")
    return _exact_overlap(cand, sets).filter(
        F.col("i") * threshold_den >= union * threshold_num
    )


def _verified_pairs(
    sets: DataFrame, threshold_num: int, threshold_den: int
) -> DataFrame:
    """One-shot form: derive the ordered positions in-session, then
    run the prefix join."""
    return _verified_pairs_from_positions(
        _ordered_positions(sets), sets, threshold_num, threshold_den
    )


def jaccard_prefix_join(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """All pairs of documents with word-set Jaccard >= num/den —
    EXACTLY (no LSH miss probability), without an all-pairs join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded
    to 6 places from the exact integer intersection/union counts.
    Pair output is quadratic in near-dup cluster size — prefer
    ``jaccard_neighbor_stats`` for corpus-wide reports."""
    # three consumers of the tokenization (prefix build + both
    # verification sides): materialize it once
    sets = _token_sets(docs, text_col, id_col).localCheckpoint(eager=False)  # lazy (r15)
    out = _verified_pairs(sets, threshold_num, threshold_den)
    union = F.col("la") + F.col("lb") - F.col("i")
    return out.select(
        "id_a",
        "id_b",
        F.round(F.col("i").cast("double") / union, 6).alias("jaccard"),
    )


def jaccard_neighbor_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_num: int = 9,
    threshold_den: int = 10,
) -> DataFrame:
    """Per-document exact near-dup degree: for every document with at
    least one OTHER document at word-set Jaccard >= num/den, emit
    (doc_id, n_dup_neighbors, best_jaccard).

    Identical-set collapse first: documents with the same distinct
    token set join nothing — group them by a set-identity hash, run
    the exact prefix join over one representative per UNIQUE set, and
    recover per-document answers arithmetically:
      n(d in group g) = (c_g - 1) + sum over groups h with
                        jac(g,h) >= tau of c_h
      best(d in g)    = 1.0 if c_g >= 2 else max jac(g,h)
    Bounded everywhere: group stats are |unique sets| rows, the
    expansion is one members join, and the output is filtered to
    documents that actually have a neighbor."""
    # the corpus tokenization feeds the identity hash AND (via the
    # unique-set semi join) every stage of the prefix join: one
    # materialization, not four recomputes of the regex split
    # lazy cuts (r15): the final action materializes each level once;
    # the multi-consumer dedup these cuts exist for comes from the
    # checkpoint boundary, not from materialization timing
    sets = _token_sets(docs, text_col, id_col).localCheckpoint(eager=False)
    keyed, groups = _keyed_groups(sets)
    groups = groups.localCheckpoint(eager=False)  # three consumers (semi join, c_other, expansion)
    rep_sets = sets.join(
        groups.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    ).localCheckpoint(eager=False)  # prefix build + both verification sides
    return _neighbor_stats_core(
        keyed, groups, rep_sets, _ordered_positions(rep_sets),
        threshold_num, threshold_den,
    )


def jaccard_neighbor_stats_from_store(
    store: DataFrame,
    positions: DataFrame,
    threshold_num: int = 9,
    threshold_den: int = 10,
) -> DataFrame:
    """``jaccard_neighbor_stats`` over the PERSISTED wordset artifacts
    (plans/sigstore.py wordset_tables): ``store`` is one row per doc
    (doc_id, set_key, w, L, rep, c); ``positions`` is the
    threshold-independent ordered-position table for representative
    docs. Per run only the prefix filter, the candidate join and the
    verification execute — the tokenize/hash/rank scans are paid once
    per corpus fingerprint."""
    keyed = store.select("doc_id", "set_key")
    reps = store.filter(F.col("doc_id") == F.col("rep"))
    groups = reps.select("set_key", "rep", "c")
    rep_sets = reps.select("doc_id", "w", "L")
    return _neighbor_stats_core(
        keyed, groups, rep_sets, positions, threshold_num, threshold_den
    )


def _neighbor_stats_core(
    keyed: DataFrame,
    groups: DataFrame,
    rep_sets: DataFrame,
    positions: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    pairs = _verified_pairs_from_positions(
        positions, rep_sets, threshold_num, threshold_den
    ).localCheckpoint(eager=False)  # the sym union consumes it twice (lazy r15) —
    # without the cut the candidate join + verification would execute
    # once per branch
    jac = (F.col("i").cast("double")
           / (F.col("la") + F.col("lb") - F.col("i"))).alias("j")
    sym = (
        pairs.select(F.col("id_a").alias("rep"),
                     F.col("id_b").alias("other"), jac)
        .unionByName(
            pairs.select(F.col("id_b").alias("rep"),
                         F.col("id_a").alias("other"), jac)
        )
        .join(groups.select(F.col("rep").alias("other"),
                            F.col("c").alias("c_other")), "other")
        .groupBy("rep")
        .agg(F.sum("c_other").alias("n_cross"), F.max("j").alias("best_j"))
    )
    per_group = (
        groups.join(sym, "rep", "left")
        .select(
            "set_key",
            (F.col("c") - 1
             + F.coalesce(F.col("n_cross"), F.lit(0))).alias("n_neighbors"),
            F.when(F.col("c") >= 2, F.lit(1.0))
            .otherwise(F.col("best_j")).alias("best_j"),
        )
        .filter(F.col("n_neighbors") >= 1)
    )
    return (
        keyed.join(per_group, "set_key")
        .select(
            "doc_id",
            F.col("n_neighbors").cast("long").alias("n_dup_neighbors"),
            F.round(F.col("best_j"), 6).alias("best_jaccard"),
        )
    )


def _contained_pairs(
    positions: DataFrame,
    sets: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """DIRECTED exact-containment pairs over unique sets: (id_a, id_b,
    la, i) for every ordered pair with |A n B| >= tau * |A| and
    id_a != id_b — the asymmetric cousin of the Jaccard join (a short
    document quoted inside a long one has LOW Jaccard but HIGH
    containment, which is why dedup pipelines run both).

    Exactness: containment >= tau means I >= ceil(tau * |A|), so the
    same prefix lemma applies to the CONTAINED side — its first common
    token with any container lies within its first
    |A| - ceil(tau * |A|) + 1 tokens. The container side carries no
    length constraint (only |B| >= ceil(tau * |A|)), so the probe is
    A-prefix vs the FULL token index (the SSJoin prefix-probe/inverted-
    index scheme), not prefix-vs-prefix.

    Skew note: the probe is bounded by sum over A-prefix tokens t of
    prefix_count(t) * df(t). Rare-first ordering keeps prefixes on
    low-df tokens for all but the shortest sets; a corpus of many
    tiny all-stopword sets would concentrate probes on hot tokens and
    want the banded-cap treatment (operators/dedup.py _cap_buckets) —
    not the shape of document corpora, so not paid for here.

    Returns (id_a, id_b, la, lb, i) with sizes/overlap as exact ints
    (callers aggregate lb for tightest-container stats)."""
    pref = positions.filter(
        F.col("pos") <= F.col("L") - _ceil_frac("L", threshold_num,
                                                threshold_den) + 1
    )
    a = pref.select(
        F.col("doc_id").alias("id_a"), "token", F.col("L").alias("la")
    )
    # full inverted index on the container side (positions carries
    # every token; pos is simply unused here)
    b = positions.select(
        F.col("doc_id").alias("id_b"), "token", F.col("L").alias("lb")
    )
    keep = (
        (F.col("id_a") != F.col("id_b"))
        # the container must be able to hold the required overlap
        & (F.col("lb") >= _ceil_frac("la", threshold_num, threshold_den))
    )
    par = positions.sparkSession.sparkContext.defaultParallelism
    if threshold_num != threshold_den:
        # fractional tau: a pair can match on several prefix tokens —
        # dedup (the hash shuffle also evens out probe-token skew for
        # the verification stage). Token-keyed spread first so the
        # multi-token fan-out happens in parallel (the AQE input-size
        # trap, as in the Jaccard join).
        cand = (
            a.repartition(par, "token")
            .join(b, "token").filter(keep)
            .select("id_a", "id_b", "la", "lb").distinct()
        )
    else:
        # tau = 1 (strict subset): the prefix is EXACTLY ONE token
        # (p = L - ceil(L) + 1 = 1), so every candidate pair is
        # emitted once and the dedup shuffle vanishes. But template
        # corpora CONCENTRATE probes — thousands of small common-word
        # sets share one "rarest" token, so any token-keyed layout
        # produces (and then verifies) that token's whole candidate
        # block in ONE task, and AQE's byte-based coalescing won't
        # save a COMPUTE-bound stage (the bytes look tiny).
        #
        # Index-side strategy is COST-BASED and self-feeding (the
        # dot_cols discipline — no caller hint, decision recorded):
        # - small index (parquet-footer ROW and BYTE bounds under the
        #   broadcast ceilings — rows alone can't gate a broadcast of
        #   variable-width token strings): round-robin the probe rows
        #   with an explicit count (exempt from AQE coalescing) and
        #   BROADCAST the inverted index — a broadcast join needs no
        #   co-partitioning, so the hot token's probes fan out
        #   wherever they landed and candidate generation +
        #   verification run cluster-wide in ONE stage, no shuffle;
        # - corpus-sized index (or no local footer bounds): salt the
        #   probe side over a SMALL CONSTANT salt count and
        #   co-repartition BOTH sides on (token, _salt) with explicit
        #   partition counts — the index pays SUBSET_SALTS x one
        #   shuffle (never parallelism x: replication must not scale
        #   with cluster size), hot tokens divide SUBSET_SALTS ways,
        #   and the verification stage inherits the spread.
        from .ivf_exact import _footer_byte_bound, _footer_row_bound
        from .similarity import _log_dot_strategy
        from .skew import replicate_salts, with_salt

        n_index = _footer_row_bound(positions)
        b_index = _footer_byte_bound(positions)
        if (
            n_index is not None
            and b_index is not None
            and n_index <= INDEX_BROADCAST_MAX_ROWS
            and b_index <= INDEX_BROADCAST_MAX_BYTES
        ):
            _log_dot_strategy(
                "subset_index_broadcast", 0,
                f"footer bounds under broadcast ceilings ({b_index}B)",
                n_index,
            )
            cand = (
                a.repartition(par)
                .join(F.broadcast(b), "token")
                .filter(keep)
                .select("id_a", "id_b", "la", "lb")
            )
        else:
            _log_dot_strategy(
                "subset_index_salted_shuffle", 0,
                "index above broadcast ceilings or unbounded", n_index,
            )
            left = with_salt(a, "id_a", SUBSET_SALTS).repartition(
                par, "token", "_salt"
            )
            right = replicate_salts(b, SUBSET_SALTS).repartition(
                par, "token", "_salt"
            )
            cand = (
                left.join(right, ["token", "_salt"])
                .filter(keep)
                .select("id_a", "id_b", "la", "lb")
            )
    return _exact_overlap(cand, sets).filter(
        F.col("i") * threshold_den >= F.col("la") * threshold_num
    )


def containment_neighbor_stats_from_store(
    store: DataFrame,
    positions: DataFrame,
    threshold_num: int = 9,
    threshold_den: int = 10,
) -> DataFrame:
    """Per-document exact containment degree over the persisted wordset
    artifacts: (doc_id, n_containers, best_containment) for every
    document at least tau-contained in some OTHER document.

    Identical-set collapse as in the Jaccard stats, but the pair set
    is DIRECTED (contained -> container), so the expansion is
    one-sided: for a doc in group g,
      n_containers = (c_g - 1) + sum over groups h != g with
                     cont(g, h) >= tau of c_h
      best         = 1.0 if c_g >= 2 else max cont(g, h)
    (identical sets contain each other totally, so same-group
    neighbors always qualify at any tau <= 1)."""
    keyed = store.select("doc_id", "set_key")
    reps = store.filter(F.col("doc_id") == F.col("rep"))
    groups = reps.select("set_key", "rep", "c")
    rep_sets = reps.select("doc_id", "w", "L")
    # single consumer (the one aggregate below) — no lineage cut needed
    pairs = _contained_pairs(positions, rep_sets, threshold_num,
                             threshold_den)
    cont = (F.col("i").cast("double") / F.col("la")).alias("cont")
    per_rep = (
        pairs.select(F.col("id_a").alias("rep"),
                     F.col("id_b").alias("other"), cont)
        .join(groups.select(F.col("rep").alias("other"),
                            F.col("c").alias("c_other")), "other")
        .groupBy("rep")
        .agg(F.sum("c_other").alias("n_cross"), F.max("cont").alias("best_c"))
    )
    per_group = (
        groups.join(per_rep, "rep", "left")
        .select(
            "set_key",
            (F.col("c") - 1
             + F.coalesce(F.col("n_cross"), F.lit(0))).alias("n_containers"),
            F.when(F.col("c") >= 2, F.lit(1.0))
            .otherwise(F.col("best_c")).alias("best_c"),
        )
        .filter(F.col("n_containers") >= 1)
    )
    return (
        keyed.join(per_group, "set_key")
        .select(
            "doc_id",
            F.col("n_containers").cast("long").alias("n_containers"),
            F.round(F.col("best_c"), 6).alias("best_containment"),
        )
    )


def subset_containment_stats_from_store(
    store: DataFrame, positions: DataFrame
) -> DataFrame:
    """STRICT subset containment (tau = 1) per document over the
    persisted wordset artifacts: (doc_id, n_supersets,
    min_superset_size) for every document whose word set is contained
    in at least one OTHER document's — the published "fully contained
    document" dedup rule, the case Jaccard structurally misses (a
    short doc quoted inside a long one has Jaccard ~ |A|/|B| but
    containment exactly 1).

    At tau = 1 the prefix-probe degenerates to ONE token per set (the
    globally rarest), each candidate pair is generated exactly once
    (no dedup shuffle), and verification is `array_intersect == |A|`.
    Identical-set groups contain each other totally: a doc in a group
    of c identical sets has (c - 1) same-size supersets plus every
    member of any strictly-containing group; min_superset_size is its
    own set size when an identical twin exists, else the smallest
    strict container."""
    keyed = store.select("doc_id", "set_key")
    reps = store.filter(F.col("doc_id") == F.col("rep"))
    groups = reps.select("set_key", "rep", "c", "L")
    rep_sets = reps.select("doc_id", "w", "L")
    pairs = _contained_pairs(positions, rep_sets, 1, 1)
    per_rep = (
        pairs.select(F.col("id_a").alias("rep"),
                     F.col("id_b").alias("other"), "lb")
        .join(groups.select(F.col("rep").alias("other"),
                            F.col("c").alias("c_other")), "other")
        .groupBy("rep")
        .agg(F.sum("c_other").alias("n_cross"),
             F.min("lb").alias("min_cross_size"))
    )
    per_group = (
        groups.join(per_rep, "rep", "left")
        .select(
            "set_key",
            (F.col("c") - 1
             + F.coalesce(F.col("n_cross"), F.lit(0))).alias("n_supersets"),
            # least() skips NULLs, so a twin-only group (no strict
            # container) correctly reports its own size
            F.when(F.col("c") >= 2, F.least("L", "min_cross_size"))
            .otherwise(F.col("min_cross_size")).alias("min_sz"),
        )
        .filter(F.col("n_supersets") >= 1)
    )
    return (
        keyed.join(per_group, "set_key")
        .select(
            "doc_id",
            F.col("n_supersets").cast("long").alias("n_supersets"),
            F.col("min_sz").cast("long").alias("min_superset_size"),
        )
    )

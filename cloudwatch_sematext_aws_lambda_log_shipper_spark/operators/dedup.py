"""Deduplication operators: exact, normalized, MinHash-LSH, SimHash.

Every variant is built bucketed-first: candidate generation goes through
a band/chunk equi-join (shuffle on bucket keys, cluster-friendly), NEVER
an all-pairs cross join — at 100 TB the cross join is the difference
between a job and a joke. Verification (exact Jaccard / Hamming) runs
only on bucket-collision candidates.

MinHash/LSH background is standard (Broder '97; MMDS ch.3). MinHash
permutations use xxhash64 (JVM-side, seeded); SimHash bit votes come
from md5 hex digits so the DuckDB oracle can replicate the sketch
bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .text import char_shingles, normalize_text, word_grams, word_shingles, words

# A bucket with n members emits n(n-1)/2 candidate pairs, so ONE
# pathological bucket (thousands of identical/near-identical docs) makes
# one reducer quadratic while every other task idles. Candidate
# generation therefore thins oversized buckets: buckets over
# `max_bucket_size` keep a deterministic ~cap-sized member subset
# (id-hash modulo the oversize factor — survival is a deterministic
# function of (doc id, bucket size): same-size buckets keep the same
# doc subset, differently-sized buckets need not; no RNG state);
# each dropped doc still has its other
# bands/chunks, and truly identical docs are the exact-dedup pass's job
# (corpus_prep runs it first). Per-bucket pair work is thus bounded at
# ~cap^2/2 regardless of corpus skew, and results are bit-identical
# whenever no bucket exceeds the cap.
#
# Mechanism: one aggregate finds the (normally EMPTY) hot-bucket set,
# which broadcasts into a filter — no sort, no extra exchange, ~zero
# cost on healthy corpora. (A rank-window cap was measured ~30% slower
# on the SimHash query: WindowExec sorts every partition even for a
# bare count.) The broadcast is bounded by one row per hot bucket —
# tiny unless the corpus is mostly duplicates, which exact-dedup-first
# prevents.
DEFAULT_MAX_BUCKET_SIZE = 1000

# connected_components: edge count at or below which the exact
# union-find runs driver-side (ONE bounded collect) instead of the
# distributed label-propagation loop. ~16 bytes/edge -> the default
# bounds the collect at tens of MB; CC_DRIVER_MAX_EDGES overrides
# (0 forces the distributed path).
_CC_DRIVER_MAX_EDGES = 1_000_000


def _cap_buckets(
    df: DataFrame, bucket_cols: list[str], id_col: str, cap: int | None
) -> DataFrame:
    if cap is None:
        return df
    hot = (
        df.groupBy(*bucket_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
    )
    thin = F.ceil(F.col("_n") / F.lit(cap)).cast("long")
    keep = F.col("_n").isNull() | (F.pmod(F.xxhash64(F.col(id_col)), thin) == 0)
    return df.join(F.broadcast(hot), bucket_cols, "left").filter(keep).drop("_n")

# --- exact / normalized -------------------------------------------------


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with
    the canonical (min) id and copy count.

    Scale: shuffles md5(text) + id only — never the text itself; partial
    aggregation collapses per-partition duplicates before the exchange.
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def normalized_dedup_groups(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Exact dedup over the normalized canonical form (case/punct/ws
    insensitive)."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- MinHash + banded LSH ----------------------------------------------


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  unit: str = "word") -> DataFrame:
    """Attach the Jaccard unit: word n-grams (default) or character
    n-grams (unit='char' — catches typo-level edits, see char_shingles)."""
    fn = word_shingles if unit == "word" else char_shingles
    return df.withColumn("shingles", fn(F.col(text_col), n))


def minhash_signatures(shingled: DataFrame, id_col: str = "doc_id",
                       k: int = 64) -> DataFrame:
    """k-permutation MinHash signature as k wide columns (mh_0..mh_{k-1}).

    Computed explode-then-aggregate: one pass over (doc, shingle) pairs
    with k seeded xxhash64 min-aggregates — the whole computation stays
    inside WholeStageCodegen hash aggregation. (The nested higher-order
    form, array_min over transform per seed, is ~20x slower: Catalyst
    evaluates lambda expressions interpreted, never codegen'd.) Map-side
    partial min collapses each partition to one row per doc before the
    shuffle.

    Docs with zero shingles drop out (they cannot near-dup match).
    """
    # Hash each shingle STRING once, then derive the k permutations from
    # the int64: hashing a ~25-byte string k times costs ~k*len byte
    # mixes per row, while re-hashing the 8-byte digest is ~10x cheaper
    # per permutation — and xxhash64(int, seed) is still a uniform
    # family, so banding recall is unchanged (verification is exact
    # Jaccard on the shingle arrays either way).
    exploded = shingled.select(
        F.col(id_col), F.explode("shingles").alias("_s")
    ).select(F.col(id_col), F.xxhash64("_s").alias("_h"))
    return exploded.groupBy(id_col).agg(
        *[F.min(F.xxhash64("_h", F.lit(i))).alias(f"mh_{i}") for i in range(k)]
    )


def band_keys(num_bands: int, rows_per_band: int):
    """One 64-bit key per band, hashing that band's signature slice."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"mh_{b * rows_per_band + t}")
                        for t in range(rows_per_band)
                    ]
                ).alias("key"),
            )
            for b in range(num_bands)
        ]
    )


def minhash_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """LSH band-bucket join: docs sharing ANY band key become a candidate
    pair. With b=16, r=4 the s-curve midpoint is (1/16)^(1/4) ~ 0.5, so
    recall at Jaccard >= 0.8 is ~1 - (1 - 0.8^4)^16 ~ 0.9998.

    Scale: explode emits b rows per doc; the self-join shuffles on
    (band, key) — bucket-local work only. Oversized buckets are capped
    (see DEFAULT_MAX_BUCKET_SIZE) so skew can't make one reducer
    quadratic. Candidates are distinct'd before any verification.
    """
    return banded_candidate_pairs(
        signatures.select(
            F.col(id_col),
            F.explode(band_keys(num_bands, rows_per_band)).alias("bk"),
        ).select(id_col, "bk.band", "bk.key"),
        id_col,
        max_bucket_size,
    )


def banded_candidate_pairs(
    banded: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """The join half of LSH candidate generation, over an already-banded
    (id, band, key) frame — callers holding a materialized bands table
    (e.g. the streaming guard's checkpointed batch bands) skip
    re-deriving it from signatures."""
    banded = _cap_buckets(banded, ["band", "key"], id_col, max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame,
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only: join the (distinct) shingle
    arrays back and keep pairs >= threshold.

    Scale: |candidates| << |pairs|; the two joins shuffle on doc id.
    """
    sh = shingled.select(F.col(id_col), "shingles")
    out = (
        candidates.join(
            sh.withColumnRenamed("shingles", "sh_a"),
            candidates.id_a == sh[id_col],
        )
        .drop(id_col)
        .join(
            sh.withColumnRenamed("shingles", "sh_b").withColumnRenamed(
                id_col, "_idb"
            ),
            F.col("id_b") == F.col("_idb"),
        )
        .drop("_idb")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter.cast("double") / union.cast("double")
    return (
        out.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    num_bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    shingle_unit: str = "word",
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs with exact-Jaccard verification.

    The shingle frame feeds three plan branches (signatures + both sides
    of the verify join); persisting it trades memory for two interpreted
    shingling recomputes. MEMORY_AND_DISK: spills instead of OOMing when
    the corpus outgrows executor memory.

    The verified pairs (tiny — |pairs| << corpus) are materialized
    eagerly via localCheckpoint so both intermediates can be UNPERSISTED
    before returning: repeated calls in a long-lived session must not
    accumulate storage blocks. The checkpoint blocks themselves are
    bounded by the small output and reclaimed by the ContextCleaner once
    the returned frame is dropped.
    """
    from pyspark import StorageLevel

    shingled = with_shingles(df, text_col, shingle_n, shingle_unit).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # Signatures are also persisted: the band self-join scans them from
    # BOTH sides, and without a materialized cache the two subtrees race
    # to compute the full signature aggregation twice.
    sigs = minhash_signatures(
        shingled, id_col, k=num_bands * rows_per_band
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cands = minhash_candidate_pairs(
        sigs, id_col, num_bands, rows_per_band, max_bucket_size
    )
    result = verify_jaccard(cands, shingled, id_col, threshold).localCheckpoint(
        eager=True
    )
    sigs.unpersist()
    shingled.unpersist()
    return result


def near_dup_pairs_from_store(
    shingled: DataFrame,
    banded: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """near_dup_pairs over PERSISTED artifacts (plans/sigstore.py): the
    shingling/signing scans are gone, and with ``banded`` bucketed on
    (band, key) and ``shingled`` on ``id_col`` the band self-join and
    the verify joins read co-located buckets — no persist/unpersist
    bookkeeping, no Exchange on the stored sides. Same results as
    near_dup_pairs by construction (identical signature math upstream).
    """
    cands = banded_candidate_pairs(banded, id_col, max_bucket_size)
    # The candidate set is bytes-small (two ids per row) but each row
    # drags CPU-heavy array intersections through the verify join — AQE's
    # size-based coalesce folds the few-MB exchange to ONE task and
    # serializes that work (measured 12s -> 2.5s on char-5-grams at
    # sf0.1). Spread it explicitly, same rationale as plans._docs.
    par = shingled.sparkSession.sparkContext.defaultParallelism
    return verify_jaccard(cands.repartition(par), shingled, id_col, threshold)


def near_dup_clusters_from_store(
    shingled: DataFrame,
    banded: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """near_dup_clusters over the persisted artifacts; ``shingled``
    carries EVERY doc (zero-shingle docs included) so singleton cluster
    assignment is complete."""
    pairs = near_dup_pairs_from_store(
        shingled, banded, id_col, threshold, max_bucket_size
    )
    comp = connected_components(pairs)
    all_ids = shingled.select(F.col(id_col).alias("node"))
    clustered = all_ids.join(comp, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("comp", F.col("node")).alias("cluster_id"),
    )
    return clustered.withColumn("keep", (F.col(id_col) == F.col("cluster_id")))


# --- SimHash ------------------------------------------------------------


def _md5_hex_digit(col: Column, pos: int) -> Column:
    """Value 0-15 of the 1-indexed hex char ``pos`` of an md5 hex string,
    via ascii arithmetic — expressible identically in DuckDB
    (ascii/substr/CASE), which is what makes the SimHash sketch
    oracle-replicable."""
    a = F.ascii(F.substring(col, pos, 1))
    return F.when(a >= 97, a - 87).otherwise(a - 48)


def simhash_signatures(shingled: DataFrame, id_col: str = "doc_id",
                       bits: int = 64) -> DataFrame:
    """64-bit SimHash per doc: bit i is the sign of the summed (+1/-1)
    votes from each shingle hash's bit i (Charikar '02 — near-dups land
    at small Hamming distance).

    The per-shingle hash is the TOP 64 bits of md5 (bit i = bit i%4 of
    hex digit 16 - i//4) rather than xxhash64: md5's hex digits are
    reproducible in DuckDB with ascii/substr arithmetic, so the whole
    sketch — not just its output shape — sits under the oracle.

    Computed in ONE narrow Arrow pass (mapInPandas): each input row
    already carries the doc's whole shingle array, so the votes are a
    per-row numpy popcount — no explode, no shuffle, no aggregate.
    (The previous explode + 16-digit-extract + 64-conditional-sum
    aggregation shape was value-identical but ~4x slower: the vote
    matrix is the same md5 bits either way, and equality old-vs-new is
    pinned in tests.) Bit mapping: sketch bit i votes on bit i%4 of
    1-indexed hex digit 16 - i//4 — which is exactly bit i (LSB order)
    of the big-endian top-64-bits integer of the md5, the form the
    DuckDB oracle replicates with ascii/substr arithmetic.
    """
    import hashlib

    if not 0 < bits <= 64:
        raise ValueError(f"bits must be in (0, 64], got {bits}")
    id_type = dict(shingled.dtypes)[id_col]
    n_bits = bits
    # unpackbits column -> bit index of the big-endian uint64: byte j
    # (j=0 most significant) bit k (LSB-first) sits at (7-j)*8 + k
    _perm = [(7 - j) * 8 + k for j in range(8) for k in range(8)]

    def _sigs(batches):
        import numpy as np
        import pandas as pd

        inv = np.argsort(np.asarray(_perm))  # column holding H-bit i
        for pdf in batches:
            ids, sims = [], []
            for did, sh in zip(pdf[id_col], pdf["shingles"]):
                n = len(sh)
                if n == 0:
                    continue  # explode semantics: shingle-less docs drop
                raw = b"".join(
                    hashlib.md5(s.encode("utf-8")).digest()[:8] for s in sh
                )
                bitmat = np.unpackbits(
                    np.frombuffer(raw, dtype=np.uint8).reshape(n, 8),
                    axis=1,
                    bitorder="little",
                )
                c = bitmat.sum(axis=0, dtype=np.int64)[inv]  # set-count per H-bit
                set_bits = np.nonzero(2 * c > n)[0]  # vote > 0
                u = 0
                for i in set_bits:
                    if i < n_bits:
                        u |= 1 << int(i)
                ids.append(did)
                sims.append(u - (1 << 64) if u >= 1 << 63 else u)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="object"),
                                "simhash": pd.Series(sims, dtype="int64")})

    return shingled.select(id_col, "shingles").mapInPandas(
        _sigs, f"{id_col} {id_type}, simhash long"
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    shingle_n: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """SimHash near-dup: candidates via 4x16-bit chunk blocking
    (pigeonhole: Hamming <= 3 over 64 bits => at least one of 4 chunks
    identical), verified with bit_count(XOR) <= max_hamming.

    Scale: chunk blocking is the same bucket-join shape as MinHash LSH —
    4 rows per doc, shuffle on (chunk_idx, chunk_value), no cross join;
    oversized buckets are capped (see DEFAULT_MAX_BUCKET_SIZE).

    Signatures are persisted for the same reason as in near_dup_pairs:
    the chunk self-join scans them from both sides, and without a
    materialized cache each side recomputes the 64-aggregate signature
    pass from raw text. The (small) verified output is localCheckpoint'd
    eagerly so the signature cache can be unpersisted before returning —
    no storage-block accumulation across calls.
    """
    from pyspark import StorageLevel

    sh = simhash_signatures(with_shingles(df, text_col, shingle_n), id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk"),
                F.shiftright("simhash", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("val"),
            )
            for c in range(4)
        ]
    )
    blocked = _cap_buckets(
        sh.select(id_col, "simhash", F.explode(chunks).alias("ck")).select(
            id_col, "simhash", "ck.chunk", "ck.val"
        ),
        ["chunk", "val"],
        id_col,
        max_bucket_size,
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    result = (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .localCheckpoint(eager=True)
    )
    sh.unpersist()
    return result


def cross_group_near_dup_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Contamination check: near-duplicate pairs that CROSS a grouping
    boundary — the train/test-leakage audit every training-data pipeline
    needs (a benchmark document near-duplicated inside a training source
    silently inflates eval scores). Returns one row per (group_a,
    group_b) pair (canonically ordered, intra-group pairs excluded) with
    the pair count and the worst (max) Jaccard observed.

    Scale: pair generation is the bucketed MinHash-LSH path (no cross
    join, hot buckets capped); the group join touches only the tiny
    verified-pair set, and the output is bounded by #groups^2.
    """
    pairs = near_dup_pairs(df, text_col, id_col, threshold,
                           max_bucket_size=max_bucket_size)
    # Null group labels (e.g. with_split's holdout rows when weights sum
    # to < 1) must still appear in the audit — a != comparison is
    # null-rejecting and would silently hide holdout-vs-train leaks, so
    # nulls are coalesced to an explicit 'holdout' label first.
    membership = df.select(
        F.col(id_col), F.coalesce(F.col(group_col), F.lit("holdout")).alias(group_col)
    )
    joined = (
        pairs.join(
            membership.select(
                F.col(id_col).alias("id_a"), F.col(group_col).alias("_ga")
            ),
            "id_a",
        )
        .join(
            membership.select(
                F.col(id_col).alias("id_b"), F.col(group_col).alias("_gb")
            ),
            "id_b",
        )
        .filter(F.col("_ga") != F.col("_gb"))
    )
    return (
        joined.select(
            F.least("_ga", "_gb").alias("group_a"),
            F.greatest("_ga", "_gb").alias("group_b"),
            "jaccard",
        )
        .groupBy("group_a", "group_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


# --- connected components (dedup clusters) -------------------------------


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components over an undirected pair graph -> (node,
    component) where component = min node id reachable — the step that
    turns near-dup PAIRS into dedup GROUPS (keep one doc per component).

    Two plans behind one contract (opt r15, guide §1.2 "the
    distributed algorithm first" + the engine's cost-rule discipline):

    - BOUNDED edge sets (the overwhelmingly common near-dup shape —
      pair graphs are unions of small template blobs) run an exact
      driver-side union-find: the oriented edge list is collected
      once through a ``limit(N + 1)`` probe (N =
      ``CC_DRIVER_MAX_EDGES``, default 1M, env-overridable) and the
      min-id representative per component is computed in Python. This
      replaces 2+ rounds of join + aggregate + blocking driver action
      (measured ~1.7 s of almost pure scheduling at sf0.1: 256 edges,
      2 rounds, every round a 0.8 s fixed-cost hop) with ONE bounded
      collect — the same probe-list-class pattern as the ranking
      offsets and the subset-containment broadcast rule.

    - Past the bound (the 100 TB shape), distributed min-label
      propagation, unchanged: each round every node adopts the
      smallest label among itself and its neighbors; converges in
      O(diameter) rounds; max_iters bounds pathological chains. Each
      round is one join + one aggregate, both shuffling on node id —
      the same key every round, so a cluster co-partitions them; no
      driver-side graph, no quadratic step. (GraphFrames does the
      same with large-star/small-star; this stays dependency-free.)
      The size probe costs one CollectLimit pass that short-circuits
      after N+1 rows, and the edges frame is persisted either way.

    Both paths yield bit-identical (node, component-min) labels —
    flip-pinned around a forced threshold in tests.
    """
    # Both edge orientations from ONE scan of the pairs subtree: a
    # union of two selects over `pairs` would evaluate the (expensive,
    # un-persisted) pair-generation plan once per branch.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(id_a).alias("a"), F.col(id_b).alias("b")),
                    F.struct(F.col(id_b).alias("a"), F.col(id_a).alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .distinct()
        .persist()
    )

    max_edges = int(
        os.environ.get("CC_DRIVER_MAX_EDGES", _CC_DRIVER_MAX_EDGES)
    )
    probe = edges.limit(max_edges + 1).collect()
    if len(probe) <= max_edges:
        # Driver-side exact union-find, min id as representative.
        # Deterministic regardless of edge order: the root of a tree is
        # always its minimum member (roots merge min-ward), and the
        # final pass resolves every node fully.
        spark = pairs.sparkSession
        edges.unpersist()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for row in probe:
            a, b = row["a"], row["b"]
            if a not in parent:
                parent[a] = a
            if b not in parent:
                parent[b] = b
            ra, rb = find(a), find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        node_type = edges.schema["a"].dataType
        schema = T.StructType(
            [
                T.StructField("node", node_type, False),
                T.StructField("comp", node_type, False),
            ]
        )
        return spark.createDataFrame(
            [(n, find(n)) for n in parent], schema
        )

    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    # Convergence sentinel: every node's label is monotonically
    # non-increasing (min over self + neighbors, self always included),
    # so sum(comp) strictly decreases until the fixed point — detecting
    # convergence is ONE exact aggregate over the frame the round
    # already materializes, not a second old-vs-new join. DECIMAL(38,0)
    # keeps the sum exact for arbitrarily large graphs/ids.
    prev_sum = None
    for i in range(max_iters):
        # neighbor labels: for each edge (a,b), b's current label offers
        # itself to a; combine with own label, keep the min
        nbr = (
            edges.join(labels, edges.b == labels.node)
            .select(F.col("a").alias("node"), "comp")
        )
        new_labels = (
            labels.select("node", "comp")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # Every round references its predecessor twice (union + nbr
        # join) and persist does NOT truncate the LOGICAL plan, so the
        # plan doubles per round; a lineage cut every 6th round bounds
        # it (identical values — opt r15, guide §7.3).
        if i % 6 == 5:
            new_labels = new_labels.localCheckpoint(eager=False)
        else:
            new_labels = new_labels.persist()
        label_sum = new_labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
        ).first()["s"]
        labels.unpersist()
        labels = new_labels
        if label_sum == prev_sum:
            break
        prev_sum = label_sum
    edges.unpersist()
    # labels is already materialized (the convergence aggregate ran), so
    # the checkpoint is cheap; unpersisting it afterwards leaves no
    # storage blocks behind from the propagation rounds.
    out = labels.select(F.col("node"), F.col("comp")).localCheckpoint(eager=True)
    labels.unpersist()
    return out


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-dup doc clusters: MinHash-LSH pairs -> connected components
    -> (doc_id, cluster_id, keep) with keep=true on the minimum doc per
    cluster. Docs with no near-dup are their own singleton cluster
    (keep=true) and never enter the propagation loop."""
    pairs = near_dup_pairs(df, text_col, id_col, threshold,
                           max_bucket_size=max_bucket_size)
    comp = connected_components(pairs)
    all_ids = df.select(F.col(id_col).alias("node"))
    clustered = all_ids.join(comp, "node", "left").select(
        F.col("node").alias(id_col),
        F.coalesce("comp", F.col("node")).alias("cluster_id"),
    )
    return clustered.withColumn(
        "keep", (F.col(id_col) == F.col("cluster_id"))
    )


def duplicated_ngram_stats(
    df: DataFrame,
    n: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Per-document duplicated-span statistics at word n-gram
    granularity — the scalable approximation of exact substring dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better"): a position is *duplicated* when its n-gram occurs at
    least ``min_count`` times across the WHOLE corpus (counting
    multiplicity, so within-document repeats count too).

    Output: (id, *extra_cols, n_grams, n_dup_grams, dup_ratio) with
    dup_ratio null for documents shorter than n words. Filter on
    dup_ratio to drop boilerplate-heavy documents, or feed n_dup_grams
    into a span-removal pass.

    Scale: explode -> one md5 per gram position (~|words| rows per doc,
    narrow) -> count per gram hash (map-side partial combine shrinks
    the shuffle to |distinct grams|) -> LEFT join positions against
    the >=min_count gram set (equi-join on the hash — no broadcast
    assumption: boilerplate-heavy corpora have huge dup sets) -> ONE
    per-doc aggregate yielding both the position total and the
    duplicated count. Grams shuffle as md5 strings so the DuckDB
    oracle reproduces counts bit-for-bit even under (cosmically
    unlikely) digest collisions — a production run would swap in
    xxhash64 for an 8-byte shuffle key, same plan shape.

    The exploded position frame feeds two plan branches (the hot-gram
    aggregate and the join probe), so the gram construction evaluates
    twice — DELIBERATELY not persisted: the recompute is one narrow
    scan+split pass, while materializing the exploded positions means
    writing an intermediate LARGER than the source (persist + eager
    checkpoint measured slower end-to-end at bench scale — the extra
    job launches cost more than the recompute saves). The
    shingle-persist convention in near_dup_pairs covers a frame read
    by three branches including a self-join; two narrow reads don't
    clear that bar.
    """
    base = df.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    pos = df.select(
        F.col(id_col), F.explode(word_grams(F.col(text_col), n)).alias("_g")
    ).select(F.col(id_col), F.md5(F.col("_g")).alias("_gh"))
    hot = (
        pos.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_gh", F.lit(True).alias("_hot"))
    )
    per_doc = (
        pos.join(hot, "_gh", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("_n_grams"),
            F.count("_hot").alias("_n_dup"),  # count() skips nulls
        )
    )
    out = (
        base.join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.coalesce("_n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("_n_dup", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.when(
                F.coalesce("_n_grams", F.lit(0)) > 0,
                F.round(
                    F.coalesce("_n_dup", F.lit(0)).cast("double")
                    / F.col("_n_grams"),
                    6,
                ),
            ).alias("dup_ratio"),
        )
    )
    return out


def benchmark_overlap_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM recipe): flag corpus
    documents sharing any word n-gram with an evaluation benchmark, so
    eval answers don't leak into the training set. Output: (id,
    *extra_cols, n_overlap_grams, contaminated) — one row per corpus
    doc, counting DISTINCT shared grams (a doc repeating one leaked
    gram is one overlap, not many).

    Scale: the benchmark side is small by definition (eval sets are
    thousands of docs, the corpus is billions) — its distinct gram-hash
    set builds once and BROADCASTS, so the corpus pays one narrow
    scan + shingle pass and a broadcast semi-join — unlike the
    symmetric duplicated_ngram_stats shape, nothing corpus-sized is
    shuffled: the only exchange is the per-doc aggregate over the
    (typically tiny) positions that survive the semi-join.
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("_g")
        )
        .select(F.md5("_g").alias("_gh"))
        .distinct()
    )
    base = corpus.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    pos = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_g")
    ).select(F.col(id_col), F.md5("_g").alias("_gh"))
    overlap = (
        pos.join(F.broadcast(bench_grams), "_gh", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return base.join(overlap, id_col, "left").select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.coalesce("_n", F.lit(0)).cast("long").alias("n_overlap_grams"),
        (F.coalesce("_n", F.lit(0)) > 0).alias("contaminated"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Exact-substring dedup's OUTPUT side (Lee et al. 2022): rewrite
    each document with every corpus-duplicated n-gram span cut out. A
    word is removed when ANY of the n-grams covering it occurs
    >= ``min_count`` times corpus-wide; what survives is the document's
    unique content (near-copies collapse to their distinguishing
    words). Text is rewritten from the normalized (lowercased,
    whitespace-split) token stream — span dedup operates on tokens,
    not bytes.

    Output: (id, *extra_cols, n_words, n_removed, clean_text).

    Scale: the same explode -> hash -> count(map-side combine) ->
    semi-join shape as duplicated_ngram_stats, plus a bounded
    per-position sequence explode (x n) for coverage and one per-doc
    collect_set of covered indexes (bounded by document length). The
    final rewrite is a narrow two-arg filter lambda over the word
    array.
    """
    base = df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], F.col(text_col)
    )
    # two narrow reads of the position frame beat materializing it —
    # see the recompute note on duplicated_ngram_stats
    pos = df.select(
        F.col(id_col),
        F.posexplode(word_grams(F.col(text_col), n)).alias("_p", "_g"),
    ).select(F.col(id_col), F.col("_p"), F.md5(F.col("_g")).alias("_gh"))
    hot = (
        pos.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_gh")
    )
    covered = (
        pos.join(hot, "_gh", "left_semi")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_p"), F.col("_p") + F.lit(n - 1))
            ).alias("_w_idx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_w_idx").alias("_cov"))
    )
    w = words(F.col(text_col))
    cov = F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
    kept = F.filter(w, lambda x, i: ~F.array_contains(cov, i.cast("int")))
    out = (
        base.join(covered, id_col, "left")
        .select(
            F.col(id_col),
            *[F.col(c) for c in extra_cols],
            F.size(w).cast("long").alias("n_words"),
            F.coalesce(F.size("_cov"), F.lit(0)).cast("long").alias("n_removed"),
            F.concat_ws(" ", kept).alias("clean_text"),
        )
    )
    return out


def hamming_near_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hi_col: str = "dh_hi",
    lo_col: str = "dh_lo",
    max_hamming: int = 3,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """Near-dup pairs over a 64-bit hash held as two non-negative
    32-bit halves (e.g. the perceptual dHash): pigeonhole the 64 bits
    into four 16-bit chunks — any pair within Hamming distance 3 must
    agree on at least one chunk — bucket-join on (chunk, value), then
    verify exact bit_count(xor) <= max_hamming. The same blocking shape
    as the SimHash text path, generic over the hash columns.

    Scale: 4 rows per item into a (chunk, value) equi-join; hot buckets
    capped by the shared mechanism. max_hamming > 3 needs more chunks
    than 4 for full recall (pigeonhole: chunks = max_hamming + 1)."""
    # LAZY cut (opt r15, guide §4.1/§5): this tiny (id, hash) frame
    # feeds FOUR subplans (both self-join sides of the candidate join
    # plus the two verify sides); without the cut an opaque upstream —
    # both production callers synthesize + perceptually hash image
    # bytes in an Arrow kernel — is re-evaluated per branch.
    h = hashes.filter(
        F.col(hi_col).isNotNull() & F.col(lo_col).isNotNull()
    ).select(
        F.col(id_col).alias("_id"), F.col(hi_col).alias("_hi"),
        F.col(lo_col).alias("_lo"),
    ).localCheckpoint(eager=False)
    chunks = h.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("chunk"),
                        (
                            F.shiftright(F.col("_hi" if j < 2 else "_lo"),
                                         16 * (j % 2))
                            .bitwiseAND(F.lit(0xFFFF))
                        ).alias("val"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("ck"),
    ).select("_id", "ck.chunk", "ck.val")
    chunks = _cap_buckets(chunks, ["chunk", "val"], "_id", max_bucket_size)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    ha = h.select(F.col("_id").alias("id_a"), F.col("_hi").alias("_hi_a"),
                  F.col("_lo").alias("_lo_a"))
    hb = h.select(F.col("_id").alias("id_b"), F.col("_hi").alias("_hi_b"),
                  F.col("_lo").alias("_lo_b"))
    scored = (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("_hi_a").bitwiseXOR(F.col("_hi_b")))
                + F.bit_count(F.col("_lo_a").bitwiseXOR(F.col("_lo_b")))
            ).cast("int"),
        )
    )
    return scored.filter(F.col("hamming") <= max_hamming).select(
        "id_a", "id_b", "hamming"
    )


def hamming_near_dup_pairs_chunked(
    hashes: DataFrame,
    id_col: str = "media_id",
    value_col: str = "ph",
    n_bits: int = 63,
    max_hamming: int = 8,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
) -> DataFrame:
    """hamming_near_dup_pairs generalized to ANY radius with guaranteed
    recall: the hash is ONE non-negative BIGINT of ``n_bits`` (<= 63),
    pigeonholed into ``max_hamming + 1`` chunks — a pair within the
    radius must agree on at least one chunk — bucket-joined on
    (chunk, value), then verified with one exact bit_count(xor).

    Scale: (max_hamming + 1) rows per item into an equi-join, hot
    buckets capped by the shared mechanism; radius buys block rows
    linearly, never pair work quadratically."""
    n_chunks = max_hamming + 1
    width = -(-n_bits // n_chunks)
    mask = (1 << width) - 1
    # LAZY cut: same four-consumer shape as hamming_near_dup_pairs
    # above — the (id, value) proxy is cut so the caller's (typically
    # Arrow-synthesized) upstream runs once, not once per branch.
    h = hashes.filter(F.col(value_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(value_col).alias("_v")
    ).localCheckpoint(eager=False)
    chunks = h.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("chunk"),
                        F.shiftright(F.col("_v"), width * j)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for j in range(n_chunks)
                ]
            )
        ).alias("ck"),
    ).select("_id", "ck.chunk", "ck.val")
    chunks = _cap_buckets(chunks, ["chunk", "val"], "_id", max_bucket_size)
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    ha = h.select(F.col("_id").alias("id_a"), F.col("_v").alias("_v_a"))
    hb = h.select(F.col("_id").alias("id_b"), F.col("_v").alias("_v_b"))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("_v_a").bitwiseXOR(F.col("_v_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def duplicated_char_spans(
    df: DataFrame,
    min_len: int = 30,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
) -> DataFrame:
    """EXACT character-level duplicated spans — the real Lee et al.
    ("Deduplicating Training Data Makes Language Models Better")
    exact-substring answer, which the word-n-gram operator
    (duplicated_ngram_stats) only approximates: a word-boundary shift
    or a repeat shorter than n words is invisible to word grams but
    found here.

    Definition: character position p (1-based) is *duplicated* when the
    length-``min_len`` substring starting at p occurs >= ``min_count``
    times across the corpus (multiplicity — within-document repeats
    count). The union of ALL duplicated substrings of length >= L
    equals the union of [p, p+L) over duplicated positions (any longer
    duplicated substring is tiled by its own duplicated L-grams), so
    merging overlapping/touching intervals per document yields each
    document's MAXIMAL duplicated spans — exactly what a corpus-wide
    suffix array produces, computed with joins instead of one giant
    sorted structure.

    Output: (id, span_start, span_end, span_len), 1-based, end
    exclusive.

    Scale (the published algorithm's cost class — a suffix array is
    also O(total chars)):
    - the position explode is ~|chars| narrow rows; the gram count
      shuffles once with map-side partial aggregation, bounded by
      |distinct grams|;
    - positions re-join the >= min_count gram set with an equi join —
      no broadcast assumption (boilerplate corpora have huge dup sets);
    - by default grams shuffle as the RAW L-char strings so the DuckDB
      oracle is replicated exactly, collision-free by construction;
      ``hash_grams=True`` is the 100 TB path — shuffle xxhash64(gram)
      (8 bytes instead of L, an L/8x smaller exchange) and accept the
      2^-64 collision odds; the plan shape is identical and a pytest
      pins result equality between the modes;
    - interval merging is a per-document window (lag + running sum
      islands) — partitioned by doc id, never global, state bounded by
      one document's positions.
    """
    L = int(min_len)
    from pyspark.sql import Window

    eligible = df.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) >= L)
    )
    grams = eligible.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(1), F.length(text_col) - F.lit(L - 1))
        ).alias("pos"),
        F.col(text_col).alias("_t"),
    ).select(
        id_col,
        "pos",
        (
            F.xxhash64(F.expr(f"substring(_t, pos, {L})"))
            if hash_grams
            else F.expr(f"substring(_t, pos, {L})")
        ).alias("_g"),
    )
    hot = (
        grams.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_g")
    )
    covered = grams.join(hot, "_g", "left_semi").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    # new island when the gap to the previous covered position exceeds
    # L ([p,p+L) and [q,q+L) merge iff q <= p + L); first row's null
    # lag compares null -> otherwise(0) -> island 0
    island = F.sum(
        F.when(F.col("pos") > F.lag("pos").over(w) + L, 1).otherwise(0)
    ).over(w)
    return (
        covered.withColumn("_isl", island)
        .groupBy(id_col, "_isl")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + L).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
        )
    )


def remove_duplicated_char_spans(
    df: DataFrame,
    min_len: int = 30,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Character-exact span REMOVAL — the output side of
    duplicated_char_spans, byte-identical to what a suffix-array pass
    would cut (Lee et al. 2022): every maximal duplicated span is
    excised and the surviving segments re-concatenate in order,
    preserving the original bytes of everything kept (the word-level
    remove_duplicated_spans rewrites from the normalized token stream;
    this one never re-tokenizes).

    Output: (id, n_chars, n_removed, clean_text). Documents with no
    duplicated span pass through verbatim.

    Scale: spans per document are FEW (maximal, disjoint, separated by
    >= 1 char by construction), so the segment window + the
    collect_list rebuild are bounded by span count, not text length —
    no per-character state anywhere beyond the detection pass itself.
    """
    from pyspark.sql import Window

    spans = duplicated_char_spans(df, min_len, min_count, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("span_start")
    segs = spans.select(
        F.col(id_col),
        F.coalesce(F.lag("span_end").over(w), F.lit(1)).alias("_s"),
        F.col("span_start").cast("long").alias("_e"),
    )
    tails = spans.groupBy(id_col).agg(
        F.max("span_end").cast("long").alias("_s"),
        F.sum("span_len").cast("long").alias("_removed"),
    )
    seg_union = segs.select(id_col, F.col("_s").cast("long"), "_e").unionByName(
        tails.select(
            id_col, "_s", F.lit(None).cast("long").alias("_e")
        )
    )
    base = df.select(F.col(id_col), F.col(text_col))
    seg_text = F.expr(
        f"substring({text_col}, CAST(_s AS INT), "
        f"CAST(coalesce(_e, length({text_col}) + 1) - _s AS INT))"
    )
    rebuilt = (
        base.join(seg_union, id_col)
        .select(
            F.col(id_col), F.struct(F.col("_s"), seg_text.alias("_t")).alias("_seg")
        )
        .groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("_seg")), lambda x: x["_t"]
                ),
                "",
            ).alias("_ct")
        )
    )
    return (
        base.join(rebuilt, id_col, "left")
        .join(tails.select(id_col, "_removed"), id_col, "left")
        .select(
            F.col(id_col),
            F.length(text_col).cast("long").alias("n_chars"),
            F.coalesce("_removed", F.lit(0)).cast("long").alias("n_removed"),
            F.coalesce("_ct", F.col(text_col)).alias("clean_text"),
        )
    )

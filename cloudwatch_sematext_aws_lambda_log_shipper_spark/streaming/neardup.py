"""Streaming near-duplicate guard: per-micro-batch MinHash-LSH vs a
PERSISTED signature store — the shape a production contamination guard
actually runs (new documents arriving on a stream are checked against
everything already ingested, not only against their own batch).

Composition of existing pieces, no new shuffle machinery:
- batch side: with_shingles -> minhash_signatures -> band_keys (the
  exact kernel behind operators/dedup.near_dup_pairs)
- store side: two parquet tables under ``store_dir`` —
    ``bands/``    (doc id, band, key)  the LSH join side
    ``shingled/`` (doc id, shingles)   for exact-Jaccard verification
  both partitioned by ``ingest_batch`` and written with dynamic
  partition OVERWRITE, so a retried micro-batch replaces its own
  slice (the same exactly-once idempotence as the log-table sink).

Per batch: candidates = (new vs store) ∪ (new vs new), both bucketed
equi-joins on (band, key); verification joins shingle arrays for ONLY
the candidate ids (store side pruned with a semi-join before the
array join). Alerts are materialized BEFORE the store update, so a doc
never "matches itself" through the store.

Scale: the store-side bands table grows with the corpus, but the join
shuffles on (band, key) — bucket-local work, the same cost shape as
batch LSH; hot buckets are capped with the shared _cap_buckets
mechanism. The shingled store is touched only through a semi-join on
the (tiny) candidate id set, so verification reads O(|candidates|)
rows regardless of corpus size. At 100 TB, bucket the bands table on
(band, key) to make the per-batch join exchange-free on the store
side.

Small-file control (r9): every micro-batch appends one
``ingest_batch=N`` leaf per store table, so thousands of batches turn
the per-batch store scan into a file-listing bottleneck.
``StreamingNearDup.compact`` folds all COMMITTED batch leafs (plus any
previous folded leaf) into one fresh negative-id leaf — real batch ids
are non-negative, so a folded leaf can never collide with a retried
batch's dynamic overwrite, and only batches at or before the stream's
last committed id fold (checkpoint-aware, same refusal contract as
control.compact_table). The swap is crash-recoverable: the folded
payload is fully written (with _SUCCESS) before any source leaf moves
aside, the commit point is a single directory rename to a
never-before-used leaf name, and ``_heal_folds`` rolls an interrupted
fold back (or completes its cleanup) on the next call.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    DEFAULT_MAX_BUCKET_SIZE,
    _cap_buckets,
    band_keys,
    banded_candidate_pairs,
    minhash_signatures,
    verify_jaccard,
    with_shingles,
)


class StreamingNearDup:
    """Micro-batch contamination guard over a persisted signature store.

    Use ``process_batch`` from a ``foreachBatch`` hook (or call it
    directly in tests/backfills). Returns the batch's verified alert
    pairs (new_id, old_id, jaccard) — old_id may be from ANY prior
    batch or from the same batch (intra-batch near-dups alert too).
    """

    def __init__(
        self,
        store_dir: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.8,
        shingle_n: int = 3,
        num_bands: int = 16,
        rows_per_band: int = 4,
        max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
    ):
        self.bands_path = os.path.join(store_dir, "bands")
        self.shingled_path = os.path.join(store_dir, "shingled")
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold
        self.shingle_n = shingle_n
        self.num_bands = num_bands
        self.rows_per_band = rows_per_band
        self.max_bucket_size = max_bucket_size

    def _read_store(self, spark: SparkSession, path: str) -> DataFrame | None:
        if not os.path.isdir(path):
            return None  # first batch: empty store
        return spark.read.parquet(path).drop("ingest_batch")

    def _banded(self, signatures: DataFrame) -> DataFrame:
        return signatures.select(
            F.col(self.id_col),
            F.explode(band_keys(self.num_bands, self.rows_per_band)).alias("bk"),
        ).select(self.id_col, "bk.band", "bk.key")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        """One micro-batch: alert on near-dups vs the store AND within
        the batch, then fold the batch into the store (idempotent under
        retry via ingest_batch dynamic overwrite). Returns the alerts
        frame, already materialized (localCheckpoint) — computed against
        the PRE-update store."""
        spark = batch_df.sparkSession
        id_col = self.id_col
        # LAZY cuts (opt r15, guide §1.2): both frames are multi-consumer
        # (shingled: signatures + verify corpus + store write; new_bands:
        # intra pairs + cross join + store write), so the checkpoint
        # boundary is load-bearing — but the ALERTS eager checkpoint
        # below is the first action and materializes both within its own
        # job, so an eager cut here only adds one dedicated scheduler
        # round per frame per micro-batch. The pre-update-store ordering
        # is unchanged: alerts still materialize before the store writes.
        shingled = with_shingles(
            batch_df.select(id_col, self.text_col),
            self.text_col, self.shingle_n,
        ).select(id_col, "shingles").localCheckpoint(eager=False)
        # k must track the banding config (band_keys reads columns
        # mh_0..mh_{b*r-1}); the bare default k=64 only coincides with it
        # for the default b=16, r=4.
        sigs = minhash_signatures(
            shingled, id_col, k=self.num_bands * self.rows_per_band
        )
        new_bands = self._banded(sigs).localCheckpoint(eager=False)

        # intra-batch pairs, from the ALREADY-MATERIALIZED bands — the
        # signature aggregation runs exactly once per batch
        intra = banded_candidate_pairs(
            new_bands, id_col, self.max_bucket_size
        ).select(F.col("id_a").alias("new_id"), F.col("id_b").alias("old_id"))

        # cross-batch pairs: new bands vs stored bands on (band, key).
        # Cap the STORE side too — a pathological hot bucket accumulated
        # over many batches must not make one reducer quadratic.
        store_bands = self._read_store(spark, self.bands_path)
        store_sh = self._read_store(spark, self.shingled_path)
        if store_bands is not None:
            capped = _cap_buckets(
                store_bands, ["band", "key"], id_col, self.max_bucket_size
            )
            cross = (
                new_bands.alias("n")
                .join(
                    capped.alias("o"),
                    (F.col("n.band") == F.col("o.band"))
                    & (F.col("n.key") == F.col("o.key"))
                    # same id = the same doc re-delivered (at-least-once
                    # source), not contamination — exact-dedup's job
                    & (F.col(f"n.{id_col}") != F.col(f"o.{id_col}")),
                )
                .select(
                    F.col(f"n.{id_col}").alias("new_id"),
                    F.col(f"o.{id_col}").alias("old_id"),
                )
                .distinct()
            )
            # A RETRIED batch sees its own docs in the store, so an
            # intra pair (a, b) can also surface mirrored through the
            # cross join as (b, a): collapse to ONE row per unordered
            # pair, keeping the orientation with the smaller new_id
            # (deterministic — an alert consumer must not double-fire
            # on retry).
            candidates = (
                intra.unionByName(cross)
                .groupBy(
                    F.least("new_id", "old_id").alias("_lo"),
                    F.greatest("new_id", "old_id").alias("_hi"),
                )
                .agg(
                    F.min_by(
                        F.struct("new_id", "old_id"), F.col("new_id")
                    ).alias("_p")
                )
                .select("_p.new_id", "_p.old_id")
            )
            # verification corpus: batch shingles + ONLY the store rows
            # that appear as candidates (semi-join prune — O(|cands|));
            # ids present in BOTH batch and store (retry) must appear
            # once, or the verify join fans out duplicate alert rows.
            old_ids = candidates.select(F.col("old_id").alias(id_col))
            verify_corpus = shingled.unionByName(
                store_sh.join(F.broadcast(old_ids), id_col, "left_semi")
                .join(shingled.select(id_col), id_col, "left_anti")
            )
        else:
            candidates = intra
            verify_corpus = shingled

        alerts = verify_jaccard(
            candidates.select(
                F.col("new_id").alias("id_a"), F.col("old_id").alias("id_b")
            ),
            verify_corpus,
            id_col,
            self.threshold,
        ).select(
            F.col("id_a").alias("new_id"),
            F.col("id_b").alias("old_id"),
            "jaccard",
        ).localCheckpoint(eager=True)  # materialize BEFORE the store update

        for df, path in ((new_bands, self.bands_path),
                         (shingled, self.shingled_path)):
            (
                df.withColumn("ingest_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("ingest_batch")
                .parquet(path)
            )
        return alerts

    def compact(
        self,
        spark: SparkSession,
        up_to_batch: int | None = None,
        checkpoint_dir: str | None = None,
        target_files: int = 1,
    ) -> dict[str, int]:
        """Fold per-micro-batch store leafs into one compact leaf per
        table. ``checkpoint_dir`` (the writing stream's checkpoint)
        bounds folding at the last COMMITTED batch — an in-flight
        batch's leaf is never folded, so its retry's dynamic overwrite
        cannot land beside a folded copy of itself. Without either
        bound the caller asserts quiescence (maintenance window), the
        same contract as control.compact_table(before=None).

        Returns {table_path: files_before} for tables actually folded.
        Alerts are unchanged by construction: the fold rewrites the
        same rows into fewer files (pinned in test_r9.py)."""
        if checkpoint_dir is not None:
            from ..control import _last_committed_batch

            up_to_batch = _last_committed_batch(checkpoint_dir)
        out: dict[str, int] = {}
        for path in (self.bands_path, self.shingled_path):
            n = _fold_store(spark, path, up_to_batch, target_files)
            if n:
                out[path] = n
        return out


def _heal_folds(table_path: str) -> None:
    """Recover an interrupted fold: the tmp/old sidecar names encode
    the target leaf id, so 'did the commit rename happen' is decidable
    — leaf present: finish cleanup; leaf absent: roll the source leafs
    back and drop the unreferenced tmp payload."""
    for entry in os.listdir(table_path):
        if not (entry.startswith(".fold_tmp_") or entry.startswith(".fold_old_")):
            continue
        f = entry.split("_")[-1]
        leaf = os.path.join(table_path, f"ingest_batch={f}")
        tmp = os.path.join(table_path, f".fold_tmp_{f}")
        old = os.path.join(table_path, f".fold_old_{f}")
        if os.path.isdir(leaf):
            shutil.rmtree(old, ignore_errors=True)
        elif os.path.isdir(old):
            for d in os.listdir(old):
                os.rename(os.path.join(old, d), os.path.join(table_path, d))
            os.rmdir(old)
        shutil.rmtree(tmp, ignore_errors=True)


def _fold_store(
    spark: SparkSession,
    table_path: str,
    up_to_batch: int | None,
    target_files: int,
    partition_by: list[str] | None = None,
) -> int:
    """Fold one store table's committed ``ingest_batch=`` leafs (plus
    any earlier folded leaf) into a single fresh negative-id leaf.
    ``partition_by`` preserves sub-partition directories inside the
    folded leaf (e.g. the IVF-PQ code table's ``cluster=`` dirs, whose
    partition pruning must survive the fold). Returns the pre-fold
    file count (0 = nothing to fold)."""
    if not os.path.isdir(table_path):
        return 0
    _heal_folds(table_path)
    ids: dict[str, int] = {}
    for d in os.listdir(table_path):
        if d.startswith("ingest_batch="):
            tail = d.split("=", 1)[1]
            if tail.lstrip("-").isdigit():
                ids[d] = int(tail)
    fold = [
        d
        for d, i in ids.items()
        if i < 0 or up_to_batch is None or i <= up_to_batch
    ]
    n_files = sum(
        1
        for d in fold
        for _r, _dirs, files in os.walk(os.path.join(table_path, d))
        for fn in files
        if fn.startswith("part-")
    )
    if len(fold) <= 1 and n_files <= target_files:
        return 0
    f = min([0] + [i for i in ids.values() if i < 0]) - 1
    tmp = os.path.join(table_path, f".fold_tmp_{f}")
    old = os.path.join(table_path, f".fold_old_{f}")
    reader = spark.read
    if partition_by:
        # leafs carry sub-partition dirs: multiple roots with nested
        # partitions need the table base path for a consistent
        # discovery (else CONFLICTING_DIRECTORY_STRUCTURES)
        reader = reader.option("basePath", table_path)
    folded = reader.parquet(*[os.path.join(table_path, d) for d in fold])
    if partition_by:
        folded = folded.drop("ingest_batch")
    folded = folded.coalesce(target_files)
    writer = folded.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(os.path.join(tmp, f"ingest_batch={f}"))
    os.makedirs(old, exist_ok=True)
    for d in fold:
        os.rename(os.path.join(table_path, d), os.path.join(old, d))
    # commit point: a single rename to a never-before-used leaf name
    os.rename(
        os.path.join(tmp, f"ingest_batch={f}"),
        os.path.join(table_path, f"ingest_batch={f}"),
    )
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return n_files

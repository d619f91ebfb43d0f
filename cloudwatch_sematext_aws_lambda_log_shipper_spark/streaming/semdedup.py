"""Streaming semantic dedup: per-micro-batch SemDeDup (Abbas et al.
2023) against a PERSISTED cluster-assigned vector store — the
embedding-space sibling of streaming/neardup.py: new vectors arriving
on a stream are checked for near-duplicate MEANING against everything
already ingested, not only their own batch.

Index discipline: the coarse centroids are FIT ONCE (first batch, or
passed in) and persisted beside the store — cluster membership must
not drift per batch or the candidate sets stop being comparable.
Every vector is multi-assigned to its ``n_assign`` nearest centroids
(the SemDeDup boundary-recall fix); a pair is compared when the two
share ANY assigned cluster.

Per batch:
- intra-batch pairs: operators/similarity.semdedup_pairs over the
  batch with the PINNED centers (same per-cluster blocked GEMM);
- cross-batch pairs: cogrouped applyInPandas on cluster id — one
  (new x stored) GEMM per cluster slice, never a pair-row join;
- alerts materialize BEFORE the store update (a vector never matches
  itself through the store); re-delivered batches collapse to one
  alert per unordered pair, exactly like the MinHash guard.

Store layout mirrors neardup.py: ``vectors/`` partitioned by
``ingest_batch`` with dynamic-overwrite idempotence, and the same
``_fold_store`` compaction (committed leafs fold into a fresh
negative-id leaf, checkpoint-aware).

Scale: the shuffle moves each new vector n_assign times keyed on
cluster id; a stored cluster slice must fit one executor (the
SemDeDup operating regime — n_clusters ~ sqrt(N)); store growth is
handled by compact().
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _fit_centroids,
    _probe_factory,
    as_double,
    semdedup_pairs,
)
from .neardup import _fold_store


class StreamingSemDedup:
    """Micro-batch semantic-dup guard over a persisted vector store.

    ``process_batch`` returns (new_id, old_id, cosine) alert pairs —
    old_id from any prior batch or the same batch.
    """

    def __init__(
        self,
        store_dir: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        threshold: float = 0.97,
        n_clusters: int = 16,
        n_assign: int = 2,
        seed: int = 42,
        fit_sample_limit: int = 25_000,
        centers=None,
    ):
        self.vectors_path = os.path.join(store_dir, "vectors")
        self.centroids_path = os.path.join(store_dir, "centroids")
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = float(threshold)
        self.n_clusters = n_clusters
        self.n_assign = n_assign
        self.seed = seed
        self.fit_sample_limit = fit_sample_limit
        self._centers = centers

    def _ensure_centers(self, c: DataFrame, spark: SparkSession):
        """Pin the centroid set: passed in > persisted > fit on the
        first batch (then persisted, so a restart keeps the SAME
        geometry)."""
        import numpy as np

        if self._centers is None and os.path.isdir(self.centroids_path):
            rows = (
                spark.read.parquet(self.centroids_path)
                .orderBy("cluster")
                .collect()
            )
            self._centers = np.array(
                [r["centroid"] for r in rows], dtype=np.float64
            )
        if self._centers is None:
            self._centers = _fit_centroids(
                c, self.n_clusters, self.seed, self.fit_sample_limit
            )
        if not os.path.isdir(self.centroids_path):
            spark.createDataFrame(
                [
                    (i, [float(x) for x in row])
                    for i, row in enumerate(self._centers)
                ],
                "cluster int, centroid array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(self.centroids_path)
        return self._centers

    def _assigned(self, c: DataFrame, centers) -> DataFrame:
        m = min(max(int(self.n_assign), 1), len(centers))
        return c.select(
            F.col("neighbor_id").alias("_id"),
            F.col("c_vec").alias("_v"),
            F.explode(_probe_factory(centers, m)(F.col("c_vec"))).alias(
                "cluster"
            ),
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        spark = batch_df.sparkSession
        c = batch_df.select(
            F.col(self.id_col).alias("neighbor_id"),
            as_double(F.col(self.vec_col)).alias("c_vec"),
        )
        centers = self._ensure_centers(c, spark)

        intra = semdedup_pairs(
            batch_df,
            threshold=self.threshold,
            id_col=self.id_col,
            vec_col=self.vec_col,
            centers=centers,
            n_assign=self.n_assign,
        ).select(
            F.col("id_a").alias("new_id"),
            F.col("id_b").alias("old_id"),
            "cosine",
        )

        # LAZY cut (opt r15): two consumers (cross-batch scoring inside
        # the alerts eager checkpoint, then the store write) — the
        # alerts materialization below is the first action and fills
        # these blocks in its own job; eager here only added a
        # dedicated job per micro-batch. Pre-update ordering unchanged.
        new_assigned = self._assigned(c, centers).localCheckpoint(eager=False)
        if os.path.isdir(self.vectors_path):
            store = (
                spark.read.parquet(self.vectors_path)
                .select(
                    F.col(self.id_col).alias("_id"),
                    F.col("c_vec").alias("_v"),
                    "cluster",
                )
            )
            thr = self.threshold

            def score_cross(key, new_pdf, old_pdf):
                import numpy as np
                import pandas as pd

                empty = pd.DataFrame(
                    {
                        "new_id": pd.Series(dtype="int64"),
                        "old_id": pd.Series(dtype="int64"),
                        "_cos": pd.Series(dtype="float64"),
                    }
                )
                if len(new_pdf) == 0 or len(old_pdf) == 0:
                    return empty
                vn = np.stack(new_pdf["_v"].to_numpy()).astype(np.float64)
                vo = np.stack(old_pdf["_v"].to_numpy()).astype(np.float64)
                nn = np.linalg.norm(vn, axis=1)
                no = np.linalg.norm(vo, axis=1)
                ids_n = new_pdf["_id"].to_numpy()
                ids_o = old_pdf["_id"].to_numpy()
                out = [empty]
                B = 2048
                for i0 in range(0, len(vn), B):
                    for j0 in range(0, len(vo), B):
                        with np.errstate(divide="ignore", invalid="ignore"):
                            M = (vn[i0 : i0 + B] @ vo[j0 : j0 + B].T) / np.outer(
                                nn[i0 : i0 + B], no[j0 : j0 + B]
                            )
                        ii, jj = np.nonzero(M >= thr)
                        if len(ii):
                            a = ids_n[ii + i0]
                            b = ids_o[jj + j0]
                            keep = a != b  # re-delivered doc, not a dup
                            out.append(
                                pd.DataFrame(
                                    {
                                        "new_id": a[keep],
                                        "old_id": b[keep],
                                        "_cos": M[ii, jj][keep],
                                    }
                                )
                            )
                return pd.concat(out, ignore_index=True)

            cross = (
                new_assigned.groupBy("cluster")
                .cogroup(store.groupBy("cluster"))
                .applyInPandas(
                    score_cross, "new_id long, old_id long, _cos double"
                )
                .select(
                    "new_id", "old_id", F.round("_cos", 6).alias("cosine")
                )
            )
            alerts = (
                intra.unionByName(cross)
                .groupBy(
                    F.least("new_id", "old_id").alias("_lo"),
                    F.greatest("new_id", "old_id").alias("_hi"),
                )
                .agg(
                    F.min_by(
                        F.struct("new_id", "old_id", "cosine"),
                        F.col("new_id"),
                    ).alias("_p")
                )
                .select("_p.new_id", "_p.old_id", "_p.cosine")
            )
        else:
            alerts = intra
        alerts = alerts.localCheckpoint(eager=True)  # pre-update snapshot

        (
            new_assigned.withColumnRenamed("_id", self.id_col)
            .withColumnRenamed("_v", "c_vec")
            .withColumn("ingest_batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(self.vectors_path)
        )
        return alerts

    def compact(
        self,
        spark: SparkSession,
        up_to_batch: int | None = None,
        checkpoint_dir: str | None = None,
        target_files: int = 1,
    ) -> dict[str, int]:
        """Fold committed vector-store leafs (same machinery and
        contract as StreamingNearDup.compact)."""
        if checkpoint_dir is not None:
            from ..control import _last_committed_batch

            up_to_batch = _last_committed_batch(checkpoint_dir)
        n = _fold_store(spark, self.vectors_path, up_to_batch, target_files)
        return {self.vectors_path: n} if n else {}

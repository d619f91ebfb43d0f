"""Persisted near-dup signature artifacts (the r8 verdict's top lever).

Every batch near-dup query used to re-shingle and re-MinHash the corpus
per run — pure recomputed preprocessing. This module computes the
(shingles, signatures) table ONCE per (corpus fingerprint, shingle
config) via the synthcache materialization (atomic rename, fingerprint
invalidation, GC of superseded builds), then registers two BUCKETED
session tables over it so the hot joins run Exchange-free:

- ``ndsh_*`` (doc_id, shingles), bucketed+sorted by doc_id — the exact
  Jaccard verify joins read co-located buckets;
- ``ndbk_*`` (doc_id, band, key), bucketed+sorted by (band, key) — the
  LSH band self-join needs no shuffle on EITHER side (both sides are
  the same bucketed table), which at 100 TB is the near-dup family's
  dominant exchange.

The artifact stores the full MinHash signature columns too, so other
band geometries can re-band without re-signing. Signature math is the
SAME with_shingles/minhash_signatures/band_keys code the one-shot path
uses — results are bit-identical, so the brute-force oracles are
untouched.

Bucketed tables live in the session catalog (in-memory, no metastore
process lock) backed by the persistent warehouse dir; re-registering
from the parquet artifact in a fresh session costs one small bucketed
write, not the shingling/signing scan. Superseded warehouse dirs are
dropped by write_bucketed's overwrite; stale-fingerprint artifact dirs
by the synthcache GC.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bucketing import write_bucketed
from ..operators.dedup import band_keys, minhash_signatures, with_shingles
from .registry import load
from .synthcache import materialize_dir

# (sparkContext id, table name) -> registered this session
_REGISTERED: set[tuple[str, str]] = set()


def _builder(spark: SparkSession, sf_dir: str, unit: str, n: int, k: int):
    def build() -> DataFrame:
        par = spark.sparkContext.defaultParallelism
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        docs = docs.repartition(par, "doc_id")  # single-file test corpus
        sh = with_shingles(docs, "text", n, unit).select("doc_id", "shingles")
        sigs = minhash_signatures(sh, "doc_id", k)
        # left join keeps zero-shingle docs (null signature columns):
        # they can never near-dup match but cluster queries need every
        # doc_id present for singleton assignment.
        return sh.join(sigs, "doc_id", "left")

    return build


def signature_tables(
    spark: SparkSession,
    sf_dir: str,
    unit: str = "word",
    n: int = 3,
    num_bands: int = 16,
    rows_per_band: int = 4,
    num_buckets: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """Return (shingled, banded) as bucketed session tables:
    shingled = (doc_id, shingles) bucketed by doc_id;
    banded = (doc_id, band, key) bucketed by (band, key)."""
    k = num_bands * rows_per_band
    name = f"ndsig-{unit}{n}-k{k}"
    path = materialize_dir(
        spark,
        sf_dir,
        name,
        _builder(spark, sf_dir, unit, n, k),
        source="documents.parquet",
    )
    # the artifact dir basename carries sf + fingerprint + config — the
    # sanitized form keys the session tables, so a regenerated corpus
    # registers fresh tables instead of serving stale buckets
    base = re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(path))
    sh_tbl, bk_tbl = f"ndsh_{base}", f"ndbk_{base}_{num_bands}x{rows_per_band}"
    ctx = spark.sparkContext.applicationId
    # key on BOTH tables + bucket count: sh_tbl alone would let a second
    # call with a different band geometry at the same k (16x4 then 8x8)
    # or different num_buckets skip the build and fail on spark.table(bk_tbl)
    reg_key = (ctx, sh_tbl, bk_tbl, num_buckets)
    if (
        reg_key not in _REGISTERED
        or not spark.catalog.tableExists(sh_tbl)
        or not spark.catalog.tableExists(bk_tbl)
    ):
        art = spark.read.parquet(path)
        write_bucketed(
            art.select("doc_id", "shingles"), sh_tbl, "doc_id", num_buckets
        )
        banded = (
            art.filter(F.col("mh_0").isNotNull())
            .select(
                "doc_id",
                F.explode(band_keys(num_bands, rows_per_band)).alias("bk"),
            )
            .select("doc_id", "bk.band", "bk.key")
        )
        write_bucketed(banded, bk_tbl, ["band", "key"], num_buckets)
        _REGISTERED.add(reg_key)
    return spark.table(sh_tbl), spark.table(bk_tbl)


def wordset_tables(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Persisted artifacts for the exact prefix-filtered Jaccard join
    (operators/setjoin.py): return (store, positions) as lazy parquet
    scans, built at most once per corpus fingerprint.

    - ``store``: one row per document — (doc_id, set_key, w, L, rep,
      c): the distinct word set (sorted array), its identity hash, and
      the identical-set group's representative/size. Serves the
      identity collapse AND (filtered to doc_id == rep) the unique-set
      frame the join verifies against.
    - ``positions``: (doc_id, token, pos, L) for REPRESENTATIVE docs
      only — every token ranked under the global rare-first order.
      Threshold-independent: the prefix for any tau is a `pos <=`
      filter, so one artifact serves every threshold.

    Both are written distributively (no driver materialization); the
    second builder reads the first artifact instead of re-tokenizing."""
    from ..operators.setjoin import (
        _keyed_groups,
        _ordered_positions,
        _token_sets,
    )

    par = spark.sparkContext.defaultParallelism

    def build_store() -> DataFrame:
        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        docs = docs.repartition(par, "doc_id")  # single-file test corpus
        sets = _token_sets(docs, "text", "doc_id")
        # the ONE set-identity definition (operators/setjoin.py) — the
        # persisted store must never drift from the in-session path
        keyed, groups = _keyed_groups(sets)
        return (
            sets.join(keyed, "doc_id")
            .join(groups, "set_key")
            .select("doc_id", "set_key", "w", "L", "rep", "c")
        )

    # v2: the set key moved from separator-joined raw tokens to
    # concatenated per-token digests (injective); supersedes sweeps
    # the old-key artifacts
    store_path = materialize_dir(
        spark, sf_dir, "wsets2", build_store,
        source="documents.parquet", supersedes=("wsets",),
    )

    def build_positions() -> DataFrame:
        reps = (
            spark.read.parquet(store_path)
            .filter(F.col("doc_id") == F.col("rep"))
            .select("doc_id", "w", "L")
        )
        return _ordered_positions(reps)

    pos_path = materialize_dir(
        spark, sf_dir, "wpos2", build_positions,
        source="documents.parquet", supersedes=("wpos",),
    )
    return spark.read.parquet(store_path), spark.read.parquet(pos_path)

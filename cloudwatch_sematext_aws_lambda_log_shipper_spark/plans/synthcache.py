"""Build-once materialization for synthesized test corpora.

The log-pipeline queries synthesize their input corpus (CloudWatch-ish
log lines / Kinesis records) from the `events` table with deterministic
SQL expressions. Re-synthesizing per query is a harness artifact — real
pipelines read STORED records (S3/Kinesis), they never regenerate them —
and it is actively hostile to Catalyst: filter pushdown and projection
collapse re-inline the giant synthesis CASE expression into every
derived-column reference (measured: 122 copies in `log_top_errors`'s
physical plan, a 103 KB plan string that blows janino's 64 KB method
limit and drops the whole parse stage out of whole-stage codegen).

So: synthesize ONCE per (sf corpus, synth name), persist as parquet,
and let every query scan the stored corpus. Filters on parsed columns
then push down to a parquet scan exactly as they would in production.

Cache layout mirrors the persisted IVF index (plans/llmops.py):
  /tmp/spark_graft_synth/<sf>-<source fingerprint>-<name>/
- keyed on a metadata-only fingerprint of the source table, so a
  regenerated corpus under the same sf dir rebuilds instead of serving
  stale rows;
- built into a pid-suffixed temp dir and renamed into place, so
  concurrent sessions race to an atomic rename, not a torn corpus;
- superseded fingerprints and hour-stale crashed builds are GC'd.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..artifacts import artifact_root, sweep_stale_entries

CACHE_ROOT = artifact_root("synth")


def source_fingerprint(path: str) -> str:
    """Cheap corpus fingerprint for cache invalidation: md5 over the
    relative names, sizes, and mtimes of the source parquet file(s) —
    metadata-only, no data scan, O(#files). A regenerated table under
    the same path changes the fingerprint even when the byte size is
    coincidentally equal (mtime moves)."""
    import hashlib

    h = hashlib.md5()
    if os.path.isdir(path):
        for root, _dirs, files in sorted(os.walk(path)):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                rel = os.path.relpath(os.path.join(root, f), path)
                h.update(f"{rel}:{st.st_size}:{st.st_mtime_ns};".encode())
    elif os.path.exists(path):
        st = os.stat(path)
        h.update(f"{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def _gc(cache_root: str, keep: str, sf_name: str, name: str) -> None:
    """Drop superseded fingerprints of the SAME (sf, name) corpus and
    hour-stale `.build.` dirs abandoned by crashed builds (the shared
    artifacts.sweep_stale_entries policy). A live concurrent build is
    young, so the GC can never pull a racing session's in-progress
    build out from under it."""
    sweep_stale_entries(
        cache_root,
        {os.path.basename(keep)},
        lambda e: e.startswith(f"{sf_name}-") and e.endswith(f"-{name}"),
        build_markers=(".build.",),
    )


def materialize_dir(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[], DataFrame],
    source: str = "events.parquet",
    writer: Callable[[DataFrame, str], None] | None = None,
    supersedes: tuple[str, ...] = (),
) -> str:
    """Build `builder()`'s output into a STORED parquet corpus at most
    once per (source fingerprint, name); return the corpus directory.
    `writer(df, path)` customizes the write (e.g. partitionBy + sidecar
    metadata) — it must leave a `_SUCCESS` marker at `path`.
    ``supersedes`` names RETIRED cache keys this corpus replaces —
    swept on every call, warm or cold (review r14: a rename that
    landed before supersedes existed leaves the old dir beside an
    already-built new key, so a miss-only sweep would never fire).
    Safe on hits because no current code constructs retired-name
    paths — there are no live readers to race."""
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    fp = source_fingerprint(os.path.join(sf_dir, source))
    path = os.path.join(CACHE_ROOT, f"{sf_name}-{fp}-{name}")
    if supersedes:
        sweep_stale_entries(
            CACHE_ROOT,
            {os.path.basename(path)},
            lambda e: e.startswith(f"{sf_name}-")
            and any(e.endswith(f"-{n}") for n in supersedes),
            build_markers=(".build.",),
        )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        _gc(CACHE_ROOT, path, sf_name, name)
        tmp = f"{path}.build.{os.getpid()}"
        if writer is None:
            builder().write.mode("overwrite").parquet(tmp)
        else:
            writer(builder(), tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # Only a lost build race (the target now exists) makes
            # discarding the fresh build correct; any other rename
            # failure (permissions, EXDEV) must surface.
            if not os.path.exists(os.path.join(path, "_SUCCESS")):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return path


def materialize(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    builder: Callable[[], DataFrame],
    source: str = "events.parquet",
) -> DataFrame:
    """Return `builder()`'s output as a STORED parquet corpus, building
    it at most once per (source fingerprint, name). The returned frame
    is a plain parquet scan: downstream filters/projections push down
    to the scan instead of inlining the synthesis expressions."""
    return spark.read.parquet(
        materialize_dir(spark, sf_dir, name, builder, source)
    )

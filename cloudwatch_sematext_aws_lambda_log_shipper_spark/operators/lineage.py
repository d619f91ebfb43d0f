"""Lineage truncation policy for iterative operators.

Every iterative loop in the engine (PageRank, LPA, k-core, BPE, the
exact-arith Lloyd fits) cuts its lineage each step — without it the
n-iteration plan nests n joins deep and Catalyst re-analyzes the whole
tree every step. The DEFAULT cut is ``localCheckpoint``: executor
block-manager storage, no configuration, fast — but NOT fault-
tolerant: on a real cluster, losing an executor mid-iteration kills
every downstream step because the truncated lineage cannot be
recomputed.

``cut_lineage(df, checkpoint_dir=...)`` upgrades the cut to a RELIABLE
``checkpoint()`` into a (HDFS/object-store) directory: executor loss
recomputes from the checkpoint files instead of aborting the chain —
the right trade on a 100x-scale cluster where an hours-long iterative
job will see node churn. Results are identical either way (pinned in
tests): checkpointing only changes where the materialized partitions
live, never their content.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# The checkpoint dir most recently passed to cut_lineage. Spark stores
# setCheckpointDir's value as a scheme-qualified URI plus a per-set UUID
# subdir (e.g. '/tmp/ckpt' -> 'file:/tmp/ckpt/<uuid>'), so a plain-path
# startswith() test against getCheckpointDir() never matches and every
# call would re-set the dir — spraying one UUID sibling per iteration,
# exactly the sprawl the guard exists to prevent. Caching the last
# requested path module-side decides "already set" without parsing the
# qualified form.
_LAST_CHECKPOINT_DIR: str | None = None


def cut_lineage(
    df: DataFrame, checkpoint_dir: str | None = None, eager: bool = True
) -> DataFrame:
    """Truncate ``df``'s lineage: reliable ``checkpoint()`` into
    ``checkpoint_dir`` when given (sets the context's checkpoint dir on
    first use), else ``localCheckpoint``.

    ``eager=False`` defers materialization into the caller's next
    action (one fewer scheduled job per cut) and is honored only for
    the LOCAL path: a lazy RELIABLE checkpoint would compute the
    subtree TWICE (the first action runs the plan, then Spark's
    post-job ``doCheckpoint`` re-runs it end-to-end to write the
    checkpoint files — the documented persist-before-checkpoint
    caveat), so the reliable path stays eager regardless, trading one
    scheduled job for single execution. Values are identical in every
    mode; only materialization timing differs."""
    global _LAST_CHECKPOINT_DIR
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=eager)
    sc = df.sparkSession.sparkContext
    current = sc._jsc.sc().getCheckpointDir()
    if not current.isDefined() or _LAST_CHECKPOINT_DIR != checkpoint_dir:
        sc.setCheckpointDir(checkpoint_dir)
        _LAST_CHECKPOINT_DIR = checkpoint_dir
    return df.checkpoint(eager=True)

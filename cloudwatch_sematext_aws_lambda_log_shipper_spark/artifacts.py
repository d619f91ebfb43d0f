"""Artifact-root convention for every on-disk cache/store the engine
writes (synth corpora, signature store, txlog demo tables, fit cache,
persisted indexes).

All roots hang off ONE base directory so a deployment can point the
whole engine at scratch/object-store-backed storage with a single env
var — ``SPARK_GRAFT_ARTIFACT_DIR`` (default ``/tmp``). Each artifact
family keeps its own ``spark_graft_<name>`` subdirectory, preserving
the historical /tmp layout when the var is unset.
"""

from __future__ import annotations

import os

_ENV = "SPARK_GRAFT_ARTIFACT_DIR"


def artifact_root(name: str) -> str:
    """Directory for artifact family ``name`` (e.g. ``ivf_fit``):
    ``$SPARK_GRAFT_ARTIFACT_DIR/spark_graft_<name>``. Created lazily by
    callers; this only builds the path so it stays side-effect-free at
    import time."""
    base = os.environ.get(_ENV, "/tmp")
    return os.path.join(base, f"spark_graft_{name}")

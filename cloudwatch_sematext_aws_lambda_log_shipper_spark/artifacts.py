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


STALE_BUILD_S = 3600.0
_STALE_ENV = "SPARK_GRAFT_STALE_BUILD_S"


def _stale_horizon_s() -> float:
    """Abandoned-build horizon; env-overridable for deployments whose
    index builds legitimately run longer than the default hour."""
    try:
        return float(os.environ.get(_STALE_ENV, STALE_BUILD_S))
    except ValueError:
        return STALE_BUILD_S


def _newest_mtime(path: str) -> float:
    """Newest mtime anywhere under ``path`` (the entry itself for a
    file). Spark writes part files under _temporary subdirs, so the TOP
    dir's mtime can stop moving minutes into a long legitimate build —
    judging staleness on it alone could rmtree a >1h corpus-sized build
    out from under a live session (r14 ADVICE). The newest file inside
    keeps moving as long as the build does."""
    newest = os.stat(path).st_mtime
    if os.path.isdir(path):
        for dirpath, dirs, files in os.walk(path):
            # directories too: a long compute phase creates the
            # _temporary/attempt skeleton long before the first part
            # file flushes — directory mtimes are the only heartbeat
            # during that window (r15 review)
            for name in list(files) + list(dirs):
                try:
                    m = os.stat(os.path.join(dirpath, name)).st_mtime
                except OSError:
                    continue
                if m > newest:
                    newest = m
    return newest


def sweep_stale_entries(
    root: str,
    live: set[str],
    superseded,
    build_markers: tuple[str, ...] = (".build.", ".tmp."),
) -> None:
    """Shared artifact-root GC policy (one implementation for every
    cache family — synthcache corpora, the ivf_fit sidecars): remove

    - entries carrying a build marker that are older than
      ``STALE_BUILD_S`` (abandoned by a crashed build; a live
      concurrent build is young, so this can never pull a racing
      session's in-progress build out from under it), and
    - entries for which ``superseded(entry)`` is true, EXCEPT the
      exact names in ``live``.

    Callers decide WHEN to sweep (on a cache miss — never on a hit, so
    a reader mid-scan of a superseded dir in another session only
    races an actual rebuild, the same window a rebuild always had).
    Files and directories are both handled; removal errors are
    swallowed (a half-removed stale entry is re-swept next miss)."""
    import shutil
    import time

    if not os.path.isdir(root):
        return
    for entry in os.listdir(root):
        full = os.path.join(root, entry)
        if any(m in entry for m in build_markers):
            try:
                if time.time() - _newest_mtime(full) > _stale_horizon_s():
                    shutil.rmtree(full, ignore_errors=True)
                    if os.path.exists(full):
                        os.remove(full)
            except OSError:
                pass
            continue
        if entry in live:
            continue
        if superseded(entry):
            if os.path.isdir(full):
                shutil.rmtree(full, ignore_errors=True)
            else:
                try:
                    os.remove(full)
                except OSError:
                    pass

"""Transactional parquet tables: a minimal ACID metadata layer in the
style of the public Delta Lake / Iceberg designs (Armbrust et al.,
VLDB 2020) — an ordered JSON commit log beside immutable parquet data
files, giving atomic multi-file commits, snapshot-isolated reads, time
travel, idempotent writer retries, and safe compaction/vacuum. Nothing
engine-private: the log is plain JSON, the data plain parquet, and any
reader that replays the log sees the same snapshot.

Layout:
    table/
      _txlog/00000000.json      one file per commit (version = name)
      _txlog/00000008.checkpoint.json   full snapshot every N commits
      data/<uuid>-<i>.parquet   immutable data files

Commit protocol (the Delta paper's, reduced to a filesystem with
atomic create-exclusive — local/HDFS; on S3 you'd put a lightweight
lock service or a DynamoDB-style conditional put in front):
  1. stage data files under data/ (invisible until committed),
  2. serialize {adds, removes, txn} to a temp file,
  3. os.O_EXCL-create _txlog/{next_version}.json — EXACTLY ONE writer
     wins a version; losers re-read the log and retry (append) or
     abort (overwrite conflict).
Readers list _txlog, replay add/remove actions up to the requested
version (starting from the newest checkpoint at or below it), and read
only the surviving files — a crashed writer's staged-but-uncommitted
files are invisible, and vacuum() removes them after a grace horizon.

Scale: the log is O(commits) tiny JSON files and replay is pure driver-
side metadata (file names), bounded by checkpoints every
CHECKPOINT_EVERY commits; data reads/writes are ordinary distributed
parquet jobs over the snapshot's file list. Idempotent retries: a
commit may carry a (app_id, txn_version) pair; re-delivering the same
pair is a no-op — the streaming foreachBatch exactly-once pattern at
the table layer.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_txlog"
CHECKPOINT_EVERY = 8


class CommitConflict(Exception):
    """Another writer committed the version this transaction targeted."""


def _log_path(table: str) -> str:
    return os.path.join(table, LOG_DIR)


def _version_file(table: str, v: int) -> str:
    return os.path.join(_log_path(table), f"{v:08d}.json")


def _list_versions(table: str) -> list[int]:
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    out = []
    for name in os.listdir(log):
        if name.endswith(".json") and not name.endswith(".checkpoint.json"):
            out.append(int(name[:-5]))
    out.sort()
    # Tolerate a TRAILING partially-written commit (a writer that died
    # mid-publish before the link-based protocol, or a torn copy): drop
    # unparseable tip versions so the table stays readable. A corrupt
    # commit in the MIDDLE of the log is real damage and stays loud.
    while out:
        try:
            _read_commit(table, out[-1])
        except (json.JSONDecodeError, ValueError, OSError):
            out.pop()
        else:
            break
    return out


def latest_version(table: str) -> int | None:
    vs = _list_versions(table)
    return vs[-1] if vs else None


def _read_commit(table: str, v: int) -> dict:
    with open(_version_file(table, v)) as f:
        return json.load(f)


def _checkpoint_path(table: str, v: int) -> str:
    return os.path.join(_log_path(table), f"{v:08d}.checkpoint.json")


def _newest_checkpoint_at_or_below(table: str, v: int) -> int | None:
    log = _log_path(table)
    if not os.path.isdir(log):
        return None
    best = None
    for name in os.listdir(log):
        if name.endswith(".checkpoint.json"):
            cv = int(name.split(".")[0])
            if cv <= v and (best is None or cv > best):
                best = cv
    return best


def snapshot(table: str, version: int | None = None) -> dict:
    """Replay the log to ``version`` (default: latest). Returns
    {"version", "files": [relpaths], "meta": {relpath: {partition,
    stats}}, "txns": {app_id: last_txn_version}}. Starts from the
    newest checkpoint <= version so replay cost is bounded at
    CHECKPOINT_EVERY commits regardless of table age."""
    vs = _list_versions(table)
    if not vs:
        raise FileNotFoundError(f"not a txlog table (no {LOG_DIR}): {table}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} does not exist (have {vs[0]}..{vs[-1]})")
    meta: dict[str, dict] = {}
    txns: dict[str, int] = {}
    start = 0
    ckpt = _newest_checkpoint_at_or_below(table, v)
    if ckpt is not None:
        with open(_checkpoint_path(table, ckpt)) as f:
            state = json.load(f)
        meta = dict(state["meta"])
        txns = dict(state.get("txns", {}))
        start = ckpt + 1
    for cv in vs:
        if cv < start or cv > v:
            continue
        commit = _read_commit(table, cv)
        for p in commit.get("remove", []):
            meta.pop(p, None)
        for a in commit.get("add", []):
            meta[a["path"]] = {
                "partition": a.get("partition"),
                "stats": a.get("stats"),
                "rows": a.get("rows"),
            }
        t = commit.get("txn")
        if t:
            txns[t["app_id"]] = t["version"]
    return {"version": v, "files": sorted(meta), "meta": meta, "txns": txns}


def _try_commit(table: str, v: int, payload: dict) -> bool:
    """Atomically create version v. True if this writer won the race.

    Publication is an os.link(tmp, version_file): the link fails with
    FileExistsError exactly like O_EXCL (one winner per version), but
    the visible file is the ALREADY-COMPLETE temp payload — a reader
    can never observe an empty/partial commit, and a writer dying
    anywhere leaves either no version file or a complete one (never a
    wedged unparseable committed version)."""
    os.makedirs(_log_path(table), exist_ok=True)
    tmp = _version_file(table, v) + f".tmp.{uuid.uuid4().hex}"
    payload = dict(payload, ts=time.time())
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _version_file(table, v))
    except FileExistsError:
        os.unlink(tmp)
        return False
    os.unlink(tmp)
    if v > 0 and v % CHECKPOINT_EVERY == 0:
        state = snapshot(table, v)
        cp = _checkpoint_path(table, v) + ".tmp"
        with open(cp, "w") as f:
            json.dump({"meta": state["meta"], "txns": state["txns"]}, f)
        os.replace(cp, _checkpoint_path(table, v))
    return True


def _file_stats(path: str, stats_cols: list[str] | None) -> dict | None:
    """Per-file zone map from the parquet FOOTER (no data scan): exact
    min/max per requested column, merged across row groups. None values
    in a row group disable that column's bound (conservative)."""
    if not stats_cols:
        return None
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for col in stats_cols:
        if col not in names:
            continue
        lo = hi = None
        nulls: int | None = 0
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(names[col]).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
            # null count per row group (None = unknown, poisons the sum)
            nc = st.null_count if st.has_null_count else None
            nulls = None if (nulls is None or nc is None) else nulls + nc
        if ok and lo is not None:
            # [min, max, null_count|None] — the third element lets
            # metadata-only aggregates PROVE all-rows-match (nulls
            # match no predicate, so the proof needs null_count == 0)
            out[col] = [
                lo.isoformat() if hasattr(lo, "isoformat") else lo,
                hi.isoformat() if hasattr(hi, "isoformat") else hi,
                nulls,
            ]
    return out or None


def _stage(
    df: DataFrame,
    table: str,
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
    cluster_by: str | None = None,
    cluster_files: int = 4,
) -> list[dict]:
    """Write df as parquet into a staging dir, move the part files under
    data/ with unique names, return per-file action dicts:
    {"path": rel, "partition": {col: value} | None, "stats": zonemap}.

    With ``partition_by``, one directory per value (hive layout in the
    stage) becomes per-file partition metadata in the LOG — readers
    prune on it without listing directories (the Delta/Iceberg move:
    partitioning is metadata, not filesystem layout)."""
    stage = os.path.join(table, f"_stage-{uuid.uuid4().hex}")
    if cluster_by:
        # range-partition + sort on the cluster key: files get DISJOINT
        # zone maps, so a point/range filter prunes to ~1/cluster_files
        # of the data instead of matching every file's overlapping
        # min/max — liquid-clustering-lite, metadata-only at read time
        df = df.repartitionByRange(cluster_files, cluster_by).sortWithinPartitions(
            cluster_by
        )
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(stage)
    data_dir = os.path.join(table, "data")
    os.makedirs(data_dir, exist_ok=True)
    actions: list[dict] = []
    prefix = uuid.uuid4().hex
    i = 0
    units: list[tuple[str, dict | None]] = []
    if partition_by:
        for d in sorted(os.listdir(stage)):
            if "=" not in d:
                continue
            key, _, raw = d.partition("=")
            from urllib.parse import unquote

            pval = {key: unquote(raw)}
            for name in sorted(os.listdir(os.path.join(stage, d))):
                if name.endswith(".parquet"):
                    units.append((os.path.join(d, name), pval))
    else:
        units = [
            (name, None)
            for name in sorted(os.listdir(stage))
            if name.endswith(".parquet")
        ]
    for src_rel, pval in units:
        rel = os.path.join("data", f"{prefix}-{i}.parquet")
        full = os.path.join(table, rel)
        os.replace(os.path.join(stage, src_rel), full)
        import pyarrow.parquet as pq

        actions.append(
            {
                "path": rel,
                "partition": pval,
                "stats": _file_stats(full, stats_cols),
                "rows": pq.ParquetFile(full).metadata.num_rows,
            }
        )
        i += 1
    shutil.rmtree(stage, ignore_errors=True)
    return actions


def _txn_already_applied(table: str, txn: tuple[str, int] | None) -> bool:
    if txn is None or latest_version(table) is None:
        return False
    app_id, t_version = txn
    return snapshot(table).get("txns", {}).get(app_id, -1) >= t_version


def _unstage(table: str, adds: list[dict]) -> None:
    for a in adds:
        try:
            os.unlink(os.path.join(table, a["path"]))
        except FileNotFoundError:
            pass


def append(
    df: DataFrame,
    table: str,
    txn: tuple[str, int] | None = None,
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
    cluster_by: str | None = None,
    cluster_files: int = 4,
    max_retries: int = 20,
) -> int:
    """Atomically append df. Returns the committed version. With
    ``txn=(app_id, version)``, re-delivery of an already-applied txn is
    a no-op (exactly-once under writer retries). Concurrent appends
    never conflict logically — losers retry at the next version.
    ``partition_by`` records per-file partition values, ``stats_cols``
    per-file footer min/max zone maps — both land in the LOG, so
    read_table prunes on them driver-side without touching data."""
    if _txn_already_applied(table, txn):
        return latest_version(table)
    adds = _stage(
        df,
        table,
        partition_by=partition_by,
        stats_cols=stats_cols,
        cluster_by=cluster_by,
        cluster_files=cluster_files,
    )
    return _commit_append(table, adds, txn, max_retries)


def _commit_append(
    table: str,
    adds: list[dict],
    txn: tuple[str, int] | None,
    max_retries: int,
    extra: dict | None = None,
) -> int:
    """The append commit-race loop, shared with append_zordered;
    ``extra`` merges additional keys (e.g. the zorder metadata) into
    the commit payload."""
    payload: dict = {"op": "append", "add": adds, "remove": []}
    if txn:
        payload["txn"] = {"app_id": txn[0], "version": txn[1]}
    if extra:
        payload.update(extra)
    for _ in range(max_retries):
        cur = latest_version(table)
        v = 0 if cur is None else cur + 1
        if _try_commit(table, v, payload):
            return v
        # lost the race: if our txn landed via another writer, stop
        if _txn_already_applied(table, txn):
            _unstage(table, adds)
            return latest_version(table)
    raise CommitConflict(f"append to {table} lost {max_retries} races")


def append_zordered(
    df: DataFrame,
    table: str,
    cluster_by: list[str],
    bits_per_dim: int = 8,
    n_buckets: int = 64,
    kinds: list[str] | None = None,
    stats_cols: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    max_retries: int = 20,
) -> int:
    """Z-ORDER-CLUSTERED ACID append: rows Morton-bucket on
    ``cluster_by`` (multi-dimensional — operators/layout.py: numeric
    dims width-bucketed from this batch's bounds, string dims hashed),
    range-partition + sort on (z_bucket, z), and land as one file set
    per z_bucket with the bucket id recorded as per-file PARTITION
    metadata in the LOG and the clustering metadata in the commit.
    :func:`read_zordered` then prunes FILES for multi-dimensional box/
    equality predicates from the log alone — the liquid-clustering move
    inside the table format, instead of beside it in directory layout.

    Each commit carries its own ZorderMeta (bounds are per-batch), so
    appends with drifting ranges stay individually prunable; a box
    query evaluates every commit's meta against its own files."""
    from ..operators.layout import fit_zorder_meta, zorder_columns

    if _txn_already_applied(table, txn):
        return latest_version(table)
    meta = fit_zorder_meta(df, cluster_by, bits_per_dim, n_buckets, kinds)
    shaped = (
        zorder_columns(df, meta)
        .repartitionByRange(n_buckets, "z_bucket", "z")
        .sortWithinPartitions("z_bucket", "z")
        .drop("z")
    )
    adds = _stage(
        shaped, table, partition_by="z_bucket", stats_cols=stats_cols
    )
    return _commit_append(
        table, adds, txn, max_retries, extra={"zorder": meta.to_json()}
    )


def read_zordered(
    spark: SparkSession,
    table: str,
    box: dict[str, tuple[float, float]] | None = None,
    eq: dict[str, object] | None = None,
    version: int | None = None,
) -> DataFrame:
    """Multi-dimensionally pruned read of a z-order-clustered txlog
    table: for each commit that recorded zorder metadata, the box/
    equality predicates decompose driver-side into that commit's
    candidate z_buckets (pure integer math on the bucket grid), and
    only files whose z_bucket partition value survives enter the scan.
    Files from non-z-ordered commits are conservatively kept. Superset
    guarantee — apply the residual row filter on the returned frame
    (the z_bucket helper column is dropped)."""
    from ..operators.layout import ZorderMeta, zbucket_candidates

    snap = snapshot(table, version)
    vs = [v for v in _list_versions(table) if v <= snap["version"]]
    # per-file candidate-bucket sets, from each commit's own meta
    keep: list[str] = []
    file_version: dict[str, int] = {}
    commit_meta: dict[int, ZorderMeta | None] = {}
    for v in vs:
        c = _read_commit(table, v)
        zj = c.get("zorder")
        commit_meta[v] = ZorderMeta.from_json(zj) if zj else None
        for a in c.get("add", []):
            file_version[a["path"]] = v
    cand_cache: dict[int, set[str]] = {}
    for f in snap["files"]:
        v = file_version.get(f)
        meta = commit_meta.get(v)
        part = (snap["meta"][f].get("partition") or {})
        if meta is None or "z_bucket" not in part:
            keep.append(f)  # not z-ordered: conservatively kept
            continue
        if v not in cand_cache:
            cand_cache[v] = {
                str(b)
                for b in zbucket_candidates(meta, box or {}, eq, spark)
            }
        if part["z_bucket"] in cand_cache[v]:
            keep.append(f)
    if not keep:
        # An empty keep list is a legitimate outcome (a selective box
        # whose candidate z_buckets hold zero files): return an empty
        # frame with the table schema instead of raising.
        any_file = snap["files"][0] if snap["files"] else None
        if any_file is None:
            raise ValueError(f"{table}@v{snap['version']}: empty table")
        return (
            spark.read.parquet(os.path.join(table, any_file)).limit(0)
        )
    # z_bucket is the ONLY partition column a z-ordered commit writes,
    # and it is a helper the reader never sees — all surviving files
    # share the data schema, so one multi-path scan suffices.
    return spark.read.parquet(*[os.path.join(table, f) for f in sorted(keep)])


def overwrite(
    df: DataFrame,
    table: str,
    expected_version: int | None = None,
    partition_by: str | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Atomically replace the table's contents. ``expected_version``
    pins the snapshot this overwrite was computed from — if someone
    commits in between, raise CommitConflict instead of clobbering
    (optimistic concurrency; the read-modify-write caller retries)."""
    cur = latest_version(table)
    if expected_version is not None and cur != expected_version:
        raise CommitConflict(
            f"overwrite computed at v{expected_version} but table is at v{cur}"
        )
    removes = snapshot(table)["files"] if cur is not None else []
    adds = _stage(df, table, partition_by=partition_by, stats_cols=stats_cols)
    v = (cur + 1) if cur is not None else 0
    if not _try_commit(table, v, {"op": "overwrite", "add": adds, "remove": removes}):
        _unstage(table, adds)
        raise CommitConflict(f"overwrite of {table} lost the race at v{v}")
    return v


def _coerce_partition_pair(pv: str, val: object) -> tuple:
    """Partition values live in the log as STRINGS; comparing them
    lexicographically against a numeric filter value is wrong for range
    ops ('10' < '9' would prune partition day=10 for day >= 9). Coerce
    BOTH sides to numbers when both parse; fall back to string compare
    (dates/timestamps in ISO form order correctly as strings)."""
    try:
        return float(pv), float(val)
    except (TypeError, ValueError):
        return str(pv), str(val)


def _might_match(meta: dict, filters: list[tuple[str, str, object]]) -> bool:
    """Conservative file-level predicate: False ONLY when the file's
    log metadata PROVES no row can match (superset guarantee — Spark
    re-applies the row filter, so pruning never changes results)."""
    for col, op, val in filters:
        part = (meta.get("partition") or {})
        if col in part:
            pv, sval = _coerce_partition_pair(part[col], val)
            if op == "=" and pv != sval:
                return False
            if op == "<=" and pv > sval:
                return False
            if op == ">=" and pv < sval:
                return False
            continue
        st = (meta.get("stats") or {}).get(col)
        if st is None:
            continue
        lo, hi = st[0], st[1]
        if op == "=" and not (lo <= val <= hi):
            return False
        if op == "<=" and lo > val:
            return False
        if op == ">=" and hi < val:
            return False
    return True


def _all_match(meta: dict, filters: list[tuple[str, str, object]]) -> bool:
    """True ONLY when the file's log metadata PROVES every row matches
    every filter — the dual of _might_match, needed by metadata-only
    aggregates: a zone map that merely INTERSECTS the predicate range
    cannot justify counting the whole file. Range proofs additionally
    require a recorded zero null count (nulls match no predicate);
    older commits without null counts conservatively fail the proof."""
    for col, op, val in filters:
        part = (meta.get("partition") or {})
        if col in part:
            pv, sval = _coerce_partition_pair(part[col], val)
            if op == "=" and pv != sval:
                return False
            if op == "<=" and not (pv <= sval):
                return False
            if op == ">=" and not (pv >= sval):
                return False
            continue
        st = (meta.get("stats") or {}).get(col)
        if st is None or len(st) < 3 or st[2] != 0:
            return False  # no zone map / unknown or nonzero null count
        lo, hi = st[0], st[1]
        if op == "=" and not (lo == val and hi == val):
            return False
        if op == "<=" and not (hi <= val):
            return False
        if op == ">=" and not (lo >= val):
            return False
    return True


def pruned_files(
    table: str,
    filters: list[tuple[str, str, object]],
    version: int | None = None,
) -> tuple[list[str], int]:
    """(surviving relpaths, total files in snapshot) after driver-side
    partition + zone-map pruning — metadata only, no data touched."""
    snap = snapshot(table, version)
    keep = [f for f in snap["files"] if _might_match(snap["meta"][f], filters)]
    return keep, len(snap["files"])


def read_table(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Snapshot-isolated read (optionally time-traveled): the file list
    is fixed at plan time from the log, so concurrent commits (or a
    compaction) never change or double-count what this plan reads.

    ``filters`` = [(col, op, value), ...] with op in {=, <=, >=}:
    driver-side pruning against the log's per-file partition values and
    parquet-footer zone maps — files that provably contain no matching
    row never enter the scan. Pruning is a superset guarantee; apply
    the real row filter on the returned frame as usual."""
    snap = snapshot(table, version)
    keep = snap["files"]
    if filters:
        keep = [f for f in keep if _might_match(snap["meta"][f], filters)]
    if not keep:
        raise ValueError(
            f"{table}@v{snap['version']}: no files"
            + (f" survive {filters}" if filters else "")
        )
    # Hive-style staging drops partition columns from the data files;
    # re-attach them from the LOG metadata (as strings — the metadata
    # type), one literal per partition-value group of files.
    from pyspark.sql import functions as F

    groups: dict[tuple, list[str]] = {}
    for f in keep:
        part = dict(snap["meta"][f].get("partition") or {})
        # z_bucket is the z-order clustering HELPER (append_zordered) —
        # log metadata for pruning, never a reader-visible column
        part.pop("z_bucket", None)
        groups.setdefault(tuple(sorted(part.items())), []).append(f)
    reader = spark.read
    if merge_schema:
        # schema evolution: later appends may carry extra columns;
        # merged reads surface them with nulls for older files
        reader = reader.option("mergeSchema", "true")
    out = None
    for part_items, files in sorted(groups.items()):
        df = reader.parquet(*[os.path.join(table, f) for f in files])
        for col, val in part_items:
            df = df.withColumn(col, F.lit(val))
        out = df if out is None else out.unionByName(
            df, allowMissingColumns=merge_schema
        )
    return out


def compact(
    spark: SparkSession,
    table: str,
    target_files: int = 1,
    stats_cols: list[str] | None = None,
) -> int:
    """Rewrite the current snapshot into ``target_files`` files and
    commit remove(old)+add(new) atomically. Readers of any version,
    before or after, see identical rows — only the layout changes.
    Retries on a lost race (the rewrite is recomputed from the new
    snapshot). Partition metadata does not survive compaction (the
    rewrite coalesces across partitions); pass ``stats_cols`` to keep
    zone maps on the compacted files."""
    for _ in range(5):
        cur = latest_version(table)
        snap = snapshot(table, cur)
        df = spark.read.parquet(*[os.path.join(table, f) for f in snap["files"]])
        adds = _stage(df.coalesce(target_files), table, stats_cols=stats_cols)
        if _try_commit(
            table, cur + 1, {"op": "compact", "add": adds, "remove": snap["files"]}
        ):
            return cur + 1
        _unstage(table, adds)
    raise CommitConflict(f"compact of {table} lost 5 races")


DEFAULT_VACUUM_GRACE = 24 * 3600.0  # the Delta-style retention default


def vacuum(
    table: str,
    retain_versions: int = 2,
    grace_seconds: float = DEFAULT_VACUUM_GRACE,
) -> list[str]:
    """Delete data files unreachable from the ``retain_versions`` most
    recent snapshots (older time travel breaks — the Delta trade-off)
    and staged files older than ``grace_seconds`` (crashed writers).
    Returns deleted table-relative paths.

    ``grace_seconds`` defaults to a conservative 24 h: a concurrent
    writer moves its staged files under data/ BEFORE its commit wins
    the version race, so an eager vacuum (grace 0) can delete an
    in-flight writer's files and corrupt the winning commit. Pass 0
    ONLY when no writer can be active (tests, offline maintenance)."""
    vs = _list_versions(table)
    keep: set[str] = set()
    for v in vs[-retain_versions:]:
        keep.update(snapshot(table, v)["files"])
    deleted = []
    data_dir = os.path.join(table, "data")
    now = time.time()
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            rel = os.path.join("data", name)
            full = os.path.join(table, rel)
            if rel not in keep and now - os.path.getmtime(full) >= grace_seconds:
                os.unlink(full)
                deleted.append(rel)
    for name in list(os.listdir(table)):
        if name.startswith("_stage-"):
            full = os.path.join(table, name)
            if now - os.path.getmtime(full) >= grace_seconds:
                shutil.rmtree(full, ignore_errors=True)
                deleted.append(name)
    return deleted


def version_at(table: str, ts: float) -> int:
    """Timestamp time travel: the latest version committed at or before
    ``ts`` (commit wall-clock recorded in each log entry). Raises if the
    table didn't exist yet."""
    best = None
    for v in _list_versions(table):
        if _read_commit(table, v).get("ts", float("inf")) <= ts:
            best = v
    if best is None:
        raise ValueError(f"{table} has no commit at or before ts={ts}")
    return best


def history(table: str) -> list[dict]:
    """One dict per commit: version, op, commit ts, files added/removed."""
    out = []
    for v in _list_versions(table):
        c = _read_commit(table, v)
        out.append(
            {
                "version": v,
                "op": c.get("op"),
                "ts": c.get("ts"),
                "n_added": len(c.get("add", [])),
                "n_removed": len(c.get("remove", [])),
            }
        )
    return out


def delete_where(
    spark: SparkSession,
    table: str,
    predicate_sql: str,
    filters: list[tuple[str, str, object]] | None = None,
    stats_cols: list[str] | None = None,
) -> int:
    """Row-level DELETE as copy-on-write at FILE granularity (the
    Delta/Iceberg CoW pattern — also the GDPR right-to-be-forgotten
    primitive): only files that might contain matching rows (pruned by
    ``filters`` against the log's partition/zone-map metadata) are
    rewritten without the matching rows; untouched files carry over by
    reference in one atomic commit. Readers of prior versions still see
    the deleted rows (run vacuum to physically reclaim them).

    Returns the committed version."""
    from pyspark.sql import functions as F  # noqa: F401

    snap = snapshot(table)
    if filters:
        cand = [f for f in snap["files"] if _might_match(snap["meta"][f], filters)]
    else:
        cand = list(snap["files"])
    if not cand:
        return snap["version"]
    df = spark.read.parquet(*[os.path.join(table, f) for f in cand])
    kept = df.filter(f"NOT ({predicate_sql})")
    adds = _stage(kept, table, stats_cols=stats_cols) if kept.take(1) else []
    v = snap["version"] + 1
    if not _try_commit(
        table, v, {"op": "delete", "add": adds, "remove": cand}
    ):
        _unstage(table, adds)
        raise CommitConflict(f"delete on {table} lost the race at v{v}")
    return v


def merge_upsert(
    spark: SparkSession,
    table: str,
    updates: DataFrame,
    key_cols: list[str],
    stats_cols: list[str] | None = None,
) -> int:
    """MERGE (upsert) by key, copy-on-write: rows of ``updates`` whose
    key exists in the table REPLACE the old rows; new keys INSERT. Only
    files that might contain a matching key are rewritten — when the
    table keeps zone maps on the (single, orderable) key column, the
    candidate set prunes to the updates' key range; everything else
    carries over by reference in one atomic commit.

    Scale: the rewrite is candidates ⋈(left anti) updates — updates are
    usually small (broadcast); untouched data is never read."""
    from pyspark.sql import functions as F

    snap = snapshot(table)
    cand = list(snap["files"])
    if len(key_cols) == 1:
        k = key_cols[0]
        bounds = updates.agg(F.min(k).alias("lo"), F.max(k).alias("hi")).collect()[0]
        if bounds["lo"] is not None:
            flt = [(k, ">=", bounds["lo"]), (k, "<=", bounds["hi"])]
            cand = [f for f in cand if _might_match(snap["meta"][f], flt)]
    untouched_adds: list[dict] = []
    if cand:
        old = spark.read.parquet(*[os.path.join(table, f) for f in cand])
        kept = old.join(
            F.broadcast(updates.select(*key_cols).distinct()), key_cols, "left_anti"
        )
        merged = kept.unionByName(updates.select(*old.columns))
    else:
        snapshot_df_cols = updates.columns
        merged = updates.select(*snapshot_df_cols)
    adds = _stage(merged, table, stats_cols=stats_cols)
    v = snap["version"] + 1
    if not _try_commit(
        table, v, {"op": "merge", "add": adds + untouched_adds, "remove": cand}
    ):
        _unstage(table, adds)
        raise CommitConflict(f"merge on {table} lost the race at v{v}")
    return v


def count_rows(
    table: str,
    version: int | None = None,
    filters: list[tuple[str, str, object]] | None = None,
) -> int | None:
    """Metadata-only COUNT(*): per-file row counts were captured from
    the parquet footers at commit time, so counting the table (or a
    partition-pruned subset) reads ZERO data files — the aggregate-
    pushdown-to-metadata trick table formats exist for.

    With ``filters``, a file's whole row count may be included ONLY
    when the metadata PROVES all its rows match (partition equality, or
    zone-map range fully contained in the predicate with zero nulls);
    a file that is pruned (_might_match False) contributes zero; a file
    that merely INTERSECTS the predicate makes the exact count unknown
    — returns None (same contract as a missing row count) rather than
    an overcount. Callers needing the exact answer then fall back to a
    real scan."""
    snap = snapshot(table, version)
    total = 0
    for f in snap["files"]:
        m = snap["meta"][f]
        if filters:
            if not _might_match(m, filters):
                continue  # proven zero matching rows
            if not _all_match(m, filters):
                return None  # partial overlap: exact count needs a scan
        r = m.get("rows")
        if r is None:
            return None
        total += r
    return total


def table_changes(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Change data feed between two versions (the Delta CDF idea):
    row-level inserts/deletes reconstructed by diffing the two
    snapshots' FILE sets — only files added or removed in the interval
    are read; rows common to both sides (rewritten-but-unchanged, e.g.
    by compaction) cancel via exceptAll and emit nothing. An UPDATE
    appears as its delete + insert pair (this format has no row ids).
    Output: the table schema + `_change_type` ('insert' | 'delete').

    Scale: reads only the delta file sets; a pure append interval reads
    only the appended files (the old snapshot's files are all still
    present and skip the diff entirely)."""
    from pyspark.sql import functions as F

    a = snapshot(table, from_version)
    b = snapshot(table, to_version)
    old_files = set(a["files"])
    new_files = set(b["files"])
    removed = sorted(old_files - new_files)
    added = sorted(new_files - old_files)

    def _read(files):
        if not files:
            return None
        return spark.read.parquet(*[os.path.join(table, f) for f in files])

    old_df, new_df = _read(removed), _read(added)
    if old_df is None and new_df is None:
        # metadata-only interval (or no change): empty feed with schema
        base = read_table(spark, table, version=to_version)
        return base.limit(0).withColumn("_change_type", F.lit("insert"))
    if old_df is None:
        ins = new_df
        dels = new_df.limit(0)
    elif new_df is None:
        ins = old_df.limit(0)
        dels = old_df
    else:
        ins = new_df.exceptAll(old_df)
        dels = old_df.exceptAll(new_df)
    return ins.withColumn("_change_type", F.lit("insert")).unionByName(
        dels.withColumn("_change_type", F.lit("delete"))
    )

"""Transaction-log table format: atomicity, snapshot isolation, time
travel, optimistic concurrency, idempotent retries, compaction,
checkpoint-bounded replay, vacuum."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources import txlog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _ids(spark, table, version=None):
    return sorted(
        r.k for r in txlog.read_table(spark, table, version=version).collect()
    )


@pytest.fixture()
def table():
    with tempfile.TemporaryDirectory() as d:
        yield os.path.join(d, "t")


def test_append_read_and_time_travel(spark, table):
    assert txlog.append(_df(spark, 0, 10), table) == 0
    assert txlog.append(_df(spark, 10, 15), table) == 1
    assert _ids(spark, table) == list(range(15))
    assert _ids(spark, table, version=0) == list(range(10))
    hist = txlog.history(table)
    assert [h["op"] for h in hist] == ["append", "append"]


def test_overwrite_isolates_versions(spark, table):
    txlog.append(_df(spark, 0, 10), table)
    v = txlog.overwrite(_df(spark, 100, 103), table)
    assert v == 1
    assert _ids(spark, table) == [100, 101, 102]
    # v0 still reads the pre-overwrite rows (no double count, no loss)
    assert _ids(spark, table, version=0) == list(range(10))


def test_overwrite_conflict_detected(spark, table):
    txlog.append(_df(spark, 0, 5), table)
    txlog.append(_df(spark, 5, 8), table)  # someone else commits v1
    with pytest.raises(txlog.CommitConflict):
        txlog.overwrite(_df(spark, 100, 101), table, expected_version=0)
    # table unchanged by the failed overwrite
    assert _ids(spark, table) == list(range(8))


def test_append_race_retries_to_next_version(spark, table):
    txlog.append(_df(spark, 0, 5), table)
    # simulate a concurrent writer grabbing v1 before our commit lands
    os.makedirs(os.path.join(table, txlog.LOG_DIR), exist_ok=True)
    with open(os.path.join(table, txlog.LOG_DIR, "00000001.json"), "w") as f:
        json.dump({"op": "append", "add": [], "remove": []}, f)
    v = txlog.append(_df(spark, 5, 9), table)
    assert v == 2
    assert _ids(spark, table) == list(range(9))


def test_idempotent_txn_append(spark, table):
    txlog.append(_df(spark, 0, 5), table, txn=("job-a", 1))
    v = txlog.append(_df(spark, 0, 5), table, txn=("job-a", 1))  # retry
    assert v == 0  # no new version
    assert _ids(spark, table) == list(range(5))
    # a NEW txn version from the same app does append
    txlog.append(_df(spark, 5, 7), table, txn=("job-a", 2))
    assert _ids(spark, table) == list(range(7))


def test_compact_preserves_rows_and_bounds_files(spark, table):
    for i in range(4):
        txlog.append(_df(spark, i * 10, i * 10 + 10).repartition(3), table)
    before = txlog.snapshot(table)
    assert len(before["files"]) >= 8
    v = txlog.compact(spark, table)
    after = txlog.snapshot(table)
    assert len(after["files"]) == 1
    assert _ids(spark, table) == list(range(40))
    # pre-compaction version still readable and identical
    assert _ids(spark, table, version=v - 1) == list(range(40))


def test_checkpoint_bounds_replay(spark, table):
    for i in range(10):  # crosses CHECKPOINT_EVERY=8
        txlog.append(_df(spark, i, i + 1), table)
    cps = [n for n in os.listdir(os.path.join(table, txlog.LOG_DIR))
           if n.endswith(".checkpoint.json")]
    assert cps == ["00000008.checkpoint.json"]
    # snapshot built from the checkpoint equals the full-replay truth
    assert _ids(spark, table) == list(range(10))
    assert _ids(spark, table, version=8) == list(range(9))
    # versions below the checkpoint replay from scratch
    assert _ids(spark, table, version=3) == list(range(4))


def test_vacuum_removes_unreachable_keeps_retained(spark, table):
    txlog.append(_df(spark, 0, 10), table)
    txlog.overwrite(_df(spark, 100, 105), table)
    txlog.append(_df(spark, 105, 107), table)
    # orphan from a crashed writer
    stage = os.path.join(table, "_stage-deadbeef")
    os.makedirs(stage)
    # grace 0 is only safe because no writer is active here; the
    # default is a conservative 24 h (in-flight writers stage under
    # data/ before their commit wins the race)
    deleted = txlog.vacuum(table, retain_versions=2, grace_seconds=0.0)
    assert "_stage-deadbeef" in deleted
    # v0's files (dropped by the overwrite) are gone
    assert any(d.startswith("data/") for d in deleted)
    with pytest.raises(Exception):
        txlog.read_table(spark, table, version=0).collect()
    # retained versions read fine
    assert _ids(spark, table, version=1) == list(range(100, 105))
    assert _ids(spark, table) == list(range(100, 107))


def test_staged_but_uncommitted_is_invisible(spark, table):
    txlog.append(_df(spark, 0, 5), table)
    # a crashed writer staged files but never committed
    txlog._stage(_df(spark, 50, 60), table)
    # staged files live under data/ but are NOT in any snapshot
    assert _ids(spark, table) == list(range(5))


def test_partition_pruning_from_log_metadata(spark, table):
    df = spark.range(0, 100).selectExpr("id AS k", "CAST(id % 4 AS STRING) AS part")
    txlog.append(df.repartition(4, "part"), table, partition_by="part")
    keep, total = txlog.pruned_files(table, [("part", "=", "2")])
    assert total >= 4 and len(keep) < total
    got = sorted(
        r.k
        for r in txlog.read_table(spark, table, filters=[("part", "=", "2")])
        .filter("part = '2'")
        .collect()
    )
    assert got == [k for k in range(100) if k % 4 == 2]


def test_zone_map_pruning_skips_disjoint_files(spark, table):
    # three appends with disjoint k ranges -> three zone-mapped files
    for lo in (0, 1000, 2000):
        txlog.append(
            _df(spark, lo, lo + 100).coalesce(1), table, stats_cols=["k"]
        )
    keep, total = txlog.pruned_files(table, [("k", ">=", 1000), ("k", "<=", 1099)])
    assert total == 3 and len(keep) == 1
    got = sorted(
        r.k
        for r in txlog.read_table(
            spark, table, filters=[("k", ">=", 1000), ("k", "<=", 1099)]
        ).collect()
    )
    assert got == list(range(1000, 1100))
    # equality point lookup prunes to the one file too
    keep2, _ = txlog.pruned_files(table, [("k", "=", 2050)])
    assert len(keep2) == 1


def test_pruning_is_superset_never_wrong(spark, table):
    # overlapping ranges: pruning may keep extra files but must never
    # drop a matching row
    txlog.append(_df(spark, 0, 60).coalesce(1), table, stats_cols=["k"])
    txlog.append(_df(spark, 40, 120).coalesce(1), table, stats_cols=["k"])
    keep, total = txlog.pruned_files(table, [("k", "=", 50)])
    assert len(keep) == 2  # both files can contain 50
    got = txlog.read_table(spark, table, filters=[("k", "=", 50)]).filter(
        "k = 50"
    ).count()
    assert got == 2


def test_stats_survive_checkpoint_replay(spark, table):
    for i in range(10):  # crosses the checkpoint boundary
        txlog.append(
            _df(spark, i * 100, i * 100 + 100).coalesce(1), table, stats_cols=["k"]
        )
    keep, total = txlog.pruned_files(table, [("k", ">=", 950)])
    assert total == 10 and len(keep) == 1


def test_cluster_by_gives_disjoint_zone_maps(spark, table):
    import random
    rows = list(range(400))
    random.Random(7).shuffle(rows)
    df = spark.createDataFrame([(k,) for k in rows], "k long")
    txlog.append(df, table, stats_cols=["k"], cluster_by="k", cluster_files=4)
    snap = txlog.snapshot(table)
    bounds = sorted(tuple(m["stats"]["k"][:2]) for m in snap["meta"].values())
    assert len(bounds) == 4
    # range-clustered files: zone maps are pairwise DISJOINT
    for (lo1, hi1), (lo2, hi2) in zip(bounds, bounds[1:]):
        assert hi1 < lo2
    keep, total = txlog.pruned_files(table, [("k", "=", 123)])
    assert total == 4 and len(keep) == 1
    got = sorted(r.k for r in txlog.read_table(spark, table).collect())
    assert got == list(range(400))


def test_timestamp_time_travel(spark, table):
    import time
    txlog.append(_df(spark, 0, 5), table)
    time.sleep(0.05)
    t_mid = time.time()
    time.sleep(0.05)
    txlog.overwrite(_df(spark, 100, 102), table)
    v = txlog.version_at(table, t_mid)
    assert v == 0
    assert _ids(spark, table, version=v) == list(range(5))
    assert txlog.version_at(table, time.time()) == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        txlog.version_at(table, t_mid - 100)


def test_delete_where_targets_files_and_isolates_versions(spark, table):
    for lo in (0, 1000, 2000):
        txlog.append(_df(spark, lo, lo + 100).coalesce(1), table, stats_cols=["k"])
    before = set(txlog.snapshot(table)["files"])
    v = txlog.delete_where(
        spark, table, "k % 2 = 0",
        filters=[("k", ">=", 1000), ("k", "<=", 1099)], stats_cols=["k"],
    )
    after = txlog.snapshot(table)
    # only the one candidate file was rewritten; the other two carry over
    assert len(before & set(after["files"])) == 2
    got = _ids(spark, table)
    assert got == list(range(0, 100)) + [k for k in range(1000, 1100) if k % 2] \
        + list(range(2000, 2100))
    # pre-delete version still shows everything (CoW, not in-place)
    assert len(_ids(spark, table, version=v - 1)) == 300


def test_merge_upsert_replaces_and_inserts(spark, table):
    txlog.append(_df(spark, 0, 100).coalesce(1), table, stats_cols=["k"])
    txlog.append(_df(spark, 1000, 1100).coalesce(1), table, stats_cols=["k"])
    updates = spark.createDataFrame(
        [(5,), (7,), (2000,)], "k long"  # 2 replacements + 1 new key
    )
    before = set(txlog.snapshot(table)["files"])
    txlog.merge_upsert(spark, table, updates, ["k"])
    got = _ids(spark, table)
    assert got == sorted(set(range(0, 100)) | set(range(1000, 1100)) | {2000})
    # no duplicate keys after the merge
    assert len(got) == len(set(got))


def test_merge_prunes_by_key_zone_maps(spark, table):
    for lo in (0, 1000, 2000):
        txlog.append(_df(spark, lo, lo + 100).coalesce(1), table, stats_cols=["k"])
    before = set(txlog.snapshot(table)["files"])
    updates = spark.createDataFrame([(1005,), (1010,)], "k long")
    txlog.merge_upsert(spark, table, updates, ["k"], stats_cols=["k"])
    after = set(txlog.snapshot(table)["files"])
    # the two files whose [lo,hi] is disjoint from [1005,1010] survive
    assert len(before & after) == 2
    assert len(_ids(spark, table)) == 300


def test_metadata_only_count(spark, table):
    for lo in (0, 1000):
        txlog.append(_df(spark, lo, lo + 50).coalesce(1), table, stats_cols=["k"])
    assert txlog.count_rows(table) == 100
    assert txlog.count_rows(table, filters=[("k", ">=", 1000)]) == 50
    txlog.delete_where(spark, table, "k < 10", stats_cols=["k"])
    assert txlog.count_rows(table) == 90


def test_schema_evolution_read(spark, table):
    txlog.append(_df(spark, 0, 5).coalesce(1), table)
    txlog.append(
        spark.createDataFrame([(10, "x")], "k long, tag string").coalesce(1), table
    )
    got = txlog.read_table(spark, table, merge_schema=True).collect()
    by_k = {r.k: r for r in got}
    assert len(by_k) == 6
    assert by_k[10].tag == "x" and by_k[0].tag is None


def test_change_data_feed(spark, table):
    txlog.append(_df(spark, 0, 10).coalesce(1), table, stats_cols=["k"])   # v0
    txlog.append(_df(spark, 10, 12).coalesce(1), table, stats_cols=["k"])  # v1
    txlog.delete_where(spark, table, "k = 3", stats_cols=["k"])            # v2
    changes = txlog.table_changes(spark, table, from_version=0).collect()
    ins = sorted(r.k for r in changes if r._change_type == "insert")
    dels = sorted(r.k for r in changes if r._change_type == "delete")
    # v0->v2: inserts 10,11; delete 3. The v2 rewrite's surviving rows
    # cancel out via exceptAll.
    assert ins == [10, 11]
    assert dels == [3]
    # compaction-only interval emits nothing
    v = txlog.compact(spark, table)
    nothing = txlog.table_changes(spark, table, from_version=v - 1).collect()
    assert nothing == []

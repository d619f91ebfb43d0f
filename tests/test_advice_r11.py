"""Round-11 ADVICE regression tests: txlog numeric partition range
pruning, count_rows partial-overlap honesty, torn-commit tolerance +
link-based atomic publish, vacuum grace default, and the pHash DCT
int64 overflow on large non-multiple-of-8 images."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from cloudwatch_sematext_aws_lambda_log_shipper_spark.sources import txlog


def _df(spark, lo, hi):
    return spark.range(lo, hi).withColumnRenamed("id", "k")


def _ids(spark, table, **kw):
    return sorted(r.k for r in txlog.read_table(spark, table, **kw).collect())


@pytest.fixture()
def table():
    with tempfile.TemporaryDirectory() as d:
        yield os.path.join(d, "t")


def test_numeric_partition_range_pruning_not_lexicographic(spark, table):
    # partitions day=2, day=9, day=10 — lexicographically '10' < '9',
    # so a string compare would wrongly prune day=10 for day >= 9
    df = spark.createDataFrame(
        [(1, 2), (2, 9), (3, 10)], "k long, day int"
    ).repartition(3, "day")
    txlog.append(df, table, partition_by="day")
    keep, total = txlog.pruned_files(table, [("day", ">=", 9)])
    assert total == 3
    parts = {
        txlog.snapshot(table)["meta"][f]["partition"]["day"] for f in keep
    }
    assert parts == {"9", "10"}  # day=10 survives, day=2 pruned
    got = sorted(
        r.k
        for r in txlog.read_table(spark, table, filters=[("day", ">=", 9)])
        .filter("day >= 9")
        .collect()
    )
    assert got == [2, 3]
    # string partition values still compare as strings (no crash)
    keep2, _ = txlog.pruned_files(table, [("day", "=", "10")])
    assert len(keep2) == 1


def test_count_rows_partial_zone_overlap_returns_unknown(spark, table):
    # one file [0,49], one [40,89]: filter k >= 45 intersects both but
    # is proven-full for neither -> exact count unknown, never an
    # overcount that sums whole files
    txlog.append(_df(spark, 0, 50).coalesce(1), table, stats_cols=["k"])
    txlog.append(_df(spark, 40, 90).coalesce(1), table, stats_cols=["k"])
    assert txlog.count_rows(table) == 100
    assert txlog.count_rows(table, filters=[("k", ">=", 45)]) is None
    # fully-contained range: provable, counts the one whole file
    assert txlog.count_rows(table, filters=[("k", ">=", 50)]) is None
    assert txlog.count_rows(table, filters=[("k", "<=", -1)]) == 0
    assert txlog.count_rows(table, filters=[("k", ">=", 90)]) == 0
    # file 2 fully inside k >= 40, file 1 partially -> unknown;
    # k >= 0 contains both -> exact
    assert txlog.count_rows(table, filters=[("k", ">=", 0)]) == 100


def test_count_rows_requires_zero_null_proof(spark, table):
    df = spark.createDataFrame(
        [(1,), (2,), (None,)], "k long"
    ).coalesce(1)
    txlog.append(df, table, stats_cols=["k"])
    # zone map [1,2] with 1 null: k >= 1 matches only 2 of 3 rows, so
    # the metadata-only answer must be unknown, not 3
    assert txlog.count_rows(table, filters=[("k", ">=", 1)]) is None
    assert txlog.count_rows(table) == 3


def test_torn_trailing_commit_is_tolerated(spark, table):
    txlog.append(_df(spark, 0, 5), table)
    txlog.append(_df(spark, 5, 8), table)
    # simulate a pre-link-era torn write: an empty committed version
    torn = txlog._version_file(table, 2)
    with open(torn, "w") as f:
        f.write("{\"op\": \"app")  # truncated JSON
    assert txlog.latest_version(table) == 1
    assert _ids(spark, table) == list(range(8))
    # a new commit targeting v2 must NOT silently reuse the torn slot
    # as a win — os.link fails on the existing path, so the writer
    # retries at the next free version once the torn file is cleared
    with pytest.raises(txlog.CommitConflict):
        txlog.overwrite(_df(spark, 100, 101), table, expected_version=1)
    os.unlink(torn)
    txlog.append(_df(spark, 8, 10), table)
    assert _ids(spark, table) == list(range(10))


def test_commit_file_is_complete_at_publish(spark, table):
    txlog.append(_df(spark, 0, 5), table)
    # every visible commit parses — the link publish makes a partial
    # visible file impossible by construction
    for v in txlog._list_versions(table):
        with open(txlog._version_file(table, v)) as f:
            json.load(f)


def test_vacuum_default_grace_protects_fresh_files(spark, table):
    txlog.append(_df(spark, 0, 10), table)
    txlog.overwrite(_df(spark, 100, 103), table)
    txlog.append(_df(spark, 103, 105), table)
    # default grace (24 h): freshly-unreferenced files survive — an
    # in-flight writer's staged-then-moved files are never eligible
    assert txlog.vacuum(table, retain_versions=2) == []
    assert _ids(spark, table) == list(range(100, 105))
    # explicit grace 0 (offline maintenance) reclaims them
    deleted = txlog.vacuum(table, retain_versions=2, grace_seconds=0.0)
    assert any(d.startswith("data/") for d in deleted)


def _phash_exact_bigint(g3, w, h):
    """Pure-Python big-int replay of the pHash pipeline (no numpy
    dtype anywhere) — the ground truth the int64 path must match."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.multimodal import DCT8_Q14

    import math

    rb = [(i * h) // 8 for i in range(9)]
    cb = [(i * w) // 8 for i in range(9)]
    rows = [rb[i + 1] - rb[i] for i in range(8)]
    cols = [cb[i + 1] - cb[i] for i in range(8)]
    hl = math.lcm(*rows)
    wl = math.lcm(*cols)
    pooled = [
        [
            int(g3[rb[u]:rb[u + 1], cb[v]:cb[v + 1]].sum())
            * (hl // rows[u])
            * (wl // cols[v])
            for v in range(8)
        ]
        for u in range(8)
    ]
    d = [
        [
            sum(
                DCT8_Q14[u][j] * pooled[j][k] * DCT8_Q14[v][k]
                for j in range(8)
                for k in range(8)
            )
            for v in range(8)
        ]
        for u in range(8)
    ]
    ac = [d[i][j] for i in range(8) for j in range(8)][1:]
    thr = sorted(ac)[31]
    bits = [1 if a > thr else 0 for a in ac]
    hi = sum(b << i for i, b in enumerate(bits[:32]))
    lo = sum(b << i for i, b in enumerate(bits[32:]))
    return hi, lo


def test_phash_no_int64_overflow_on_large_nondivisible_dims():
    """The ADVICE repro: dims not divisible by 8 above ~250 px made the
    single-LCM pooling wrap int64 and corrupt the hash bits. The
    per-axis-LCM + bigint-fallback path must equal exact arithmetic."""
    import numpy as np

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import multimodal as mm

    rng = np.random.RandomState(7)
    for (w, h) in [(997, 613), (251, 203), (64, 64), (100, 37)]:
        g3 = rng.randint(0, 766, size=(h, w)).astype(np.int64)
        got = mm._phash_grid(g3, w, h)
        want = _phash_exact_bigint(g3, w, h)
        assert got == want, (w, h)


def test_phash_formula_change_preserves_small_dim_hashes():
    """Scale invariance: on dims where the old global-LCM formula was
    exact, the new per-axis normalization yields identical bits (the
    SQL oracle's replay therefore still matches)."""
    import math

    import numpy as np

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import multimodal as mm

    rng = np.random.RandomState(11)
    for (w, h) in [(8, 8), (16, 16), (40, 24), (33, 17)]:
        g3 = rng.randint(0, 766, size=(h, w)).astype(np.int64)
        # old formula, in exact big ints so it cannot overflow
        rb = [(i * h) // 8 for i in range(9)]
        cb = [(i * w) // 8 for i in range(9)]
        counts = sorted(
            {
                (rb[u + 1] - rb[u]) * (cb[v + 1] - cb[v])
                for u in range(8)
                for v in range(8)
            }
        )
        lcm = math.lcm(*counts)
        pooled = [
            [
                int(g3[rb[u]:rb[u + 1], cb[v]:cb[v + 1]].sum())
                * (lcm // ((rb[u + 1] - rb[u]) * (cb[v + 1] - cb[v])))
                for v in range(8)
            ]
            for u in range(8)
        ]
        d = [
            [
                sum(
                    mm.DCT8_Q14[u][j] * pooled[j][k] * mm.DCT8_Q14[v][k]
                    for j in range(8)
                    for k in range(8)
                )
                for v in range(8)
            ]
            for u in range(8)
        ]
        ac = [d[i][j] for i in range(8) for j in range(8)][1:]
        thr = sorted(ac)[31]
        bits = [1 if a > thr else 0 for a in ac]
        want = (
            sum(b << i for i, b in enumerate(bits[:32])),
            sum(b << i for i, b in enumerate(bits[32:])),
        )
        assert mm._phash_grid(g3, w, h) == want, (w, h)

"""scd2_apply semantics: close/open, new keys, no-ops, idempotency."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.scd import scd2_apply

TS = datetime.datetime
SCHEMA_DIM = "k long, attr string, valid_from timestamp, valid_to timestamp"
SCHEMA_UPD = "k long, attr string, eff_ts timestamp"


def _dim(spark):
    rows = [
        (1, "a", TS(2020, 1, 1), None),          # will change
        (2, "b", TS(2020, 1, 1), None),          # update arrives, same value
        (3, "c", TS(2020, 1, 1), None),          # no update
        (1, "old", TS(2019, 1, 1), TS(2020, 1, 1)),  # history, untouchable
    ]
    return spark.createDataFrame(rows, SCHEMA_DIM)


def _upd(spark):
    rows = [
        (1, "a2", TS(2021, 6, 1)),
        (2, "b", TS(2021, 6, 1)),
        (9, "fresh", TS(2021, 6, 1)),
    ]
    return spark.createDataFrame(rows, SCHEMA_UPD)


def _apply(spark):
    return scd2_apply(_dim(spark), _upd(spark), ["k"], ["attr"])


def test_change_closes_and_reopens(spark):
    out = {(r.k, r.attr, r.valid_from, r.valid_to) for r in _apply(spark).collect()}
    assert (1, "a", TS(2020, 1, 1), TS(2021, 6, 1)) in out      # closed
    assert (1, "a2", TS(2021, 6, 1), None) in out               # reopened
    assert (1, "old", TS(2019, 1, 1), TS(2020, 1, 1)) in out    # history intact


def test_same_value_update_is_noop_and_new_key_inserts(spark):
    out = {(r.k, r.attr, r.valid_from, r.valid_to) for r in _apply(spark).collect()}
    assert (2, "b", TS(2020, 1, 1), None) in out                # unchanged
    assert not any(k == 2 and vt is not None for k, _, _, vt in out)
    assert (9, "fresh", TS(2021, 6, 1), None) in out            # new key
    assert (3, "c", TS(2020, 1, 1), None) in out                # untouched


def test_reapplying_same_batch_is_idempotent(spark):
    once = _apply(spark)
    twice = scd2_apply(once, _upd(spark), ["k"], ["attr"])
    a = sorted((r.k, r.attr, str(r.valid_from), str(r.valid_to)) for r in once.collect())
    b = sorted((r.k, r.attr, str(r.valid_from), str(r.valid_to)) for r in twice.collect())
    assert a == b


def test_exactly_one_current_version_per_key(spark):
    cur = _apply(spark).filter(F.col("valid_to").isNull())
    counts = cur.groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in counts)


def test_null_eff_rows_are_dropped(spark):
    # a NULL-eff update row is malformed (would open an all-NULL row
    # for a new key / close the current version at NULL) — dropped
    dirty = spark.createDataFrame(
        [(1, "a2", None), (42, "ghost", None)], SCHEMA_UPD
    )
    out = {(r.k, r.attr, r.valid_from, r.valid_to)
           for r in scd2_apply(_dim(spark), dirty, ["k"], ["attr"]).collect()}
    base = {(r.k, r.attr, r.valid_from, r.valid_to)
            for r in _dim(spark).collect()}
    assert out == base  # the whole batch was a no-op
    assert not any(k == 42 for k, _, _, _ in out)


def test_out_of_order_eff_is_stale_noop(spark):
    # eff BEFORE the current version's valid_from would invert the
    # interval (valid_to < valid_from) — treated as stale, ignored
    stale = spark.createDataFrame(
        [(1, "a2", TS(2019, 6, 1))], SCHEMA_UPD  # cur valid_from=2020-1-1
    )
    out = {(r.k, r.attr, r.valid_from, r.valid_to)
           for r in scd2_apply(_dim(spark), stale, ["k"], ["attr"]).collect()}
    base = {(r.k, r.attr, r.valid_from, r.valid_to)
            for r in _dim(spark).collect()}
    assert out == base
    # tiling invariant holds: no inverted interval anywhere
    assert not any(
        vt is not None and vt < vf for _, _, vf, vt in out
    )

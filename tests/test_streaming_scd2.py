"""Streaming SCD2 maintenance (streaming/scd.py): micro-batch apply ==
one-shot batch apply, exactly-once under foreachBatch retries and
replays, last-write-wins folding, restart-resume via checkpoint."""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.scd import scd2_apply
from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.scd import (
    StreamingScd2Maintainer,
    fold_last_write_wins,
)

TS = datetime.datetime
SCHEMA_DIM = "k long, attr string, valid_from timestamp, valid_to timestamp"
SCHEMA_UPD = "k long, attr string, eff_ts timestamp"


def _seed(spark):
    rows = [
        (1, "a", TS(2020, 1, 1), None),
        (2, "b", TS(2020, 1, 1), None),
        (3, "c", TS(2020, 1, 1), None),
    ]
    return spark.createDataFrame(rows, SCHEMA_DIM)


def _snap(df):
    return sorted(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to)) for r in df.collect()
    )


def test_fold_last_write_wins(spark):
    upd = spark.createDataFrame(
        [
            (1, "mid", TS(2021, 1, 2)),
            (1, "last", TS(2021, 1, 3)),
            (1, "first", TS(2021, 1, 1)),
            (2, "only", TS(2021, 5, 5)),
            (3, "dropped", None),  # null eff never wins — it is malformed
        ],
        SCHEMA_UPD,
    )
    got = {(r.k, r.attr, r.eff_ts)
           for r in fold_last_write_wins(upd, ["k"], ["attr"]).collect()}
    assert got == {(1, "last", TS(2021, 1, 3)), (2, "only", TS(2021, 5, 5))}


def test_two_micro_batches_equal_one_batch_apply(spark, tmp_path):
    b1 = spark.createDataFrame(
        [(1, "a2", TS(2021, 6, 1)), (9, "fresh", TS(2021, 6, 1))], SCHEMA_UPD
    )
    # batch 2 RE-DELIVERS batch 1's rows (at-least-once source) + one new
    b2 = spark.createDataFrame(
        [
            (1, "a2", TS(2021, 6, 1)),           # re-delivery: must no-op
            (9, "fresh", TS(2021, 6, 1)),        # re-delivery: must no-op
            (2, "b2", TS(2021, 7, 1)),
        ],
        SCHEMA_UPD,
    )
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=_seed(spark)
    )
    m.apply_batch(b1, 0)
    m.apply_batch(b2, 1)

    one_shot = scd2_apply(
        scd2_apply(_seed(spark), b1, ["k"], ["attr"]),
        b2.filter("k = 2"),
        ["k"],
        ["attr"],
    )
    assert _snap(m.current()) == _snap(one_shot)


def test_retry_same_batch_id_is_idempotent(spark, tmp_path):
    b1 = spark.createDataFrame([(1, "a2", TS(2021, 6, 1))], SCHEMA_UPD)
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=_seed(spark)
    )
    m.apply_batch(b1, 0)
    snap = _snap(m.current())
    m.apply_batch(b1, 0)  # replay of a COMMITTED id: must skip entirely
    assert _snap(m.current()) == snap
    # and a crash-before-commit retry (pointer still at the previous id)
    # recomputes from the old base instead of double-applying
    ptr = json.load(open(tmp_path / "dim" / "_COMMITTED"))
    assert ptr["batch_id"] == 0


def test_streaming_end_to_end_with_restart(spark, tmp_path):
    # two files, maxFilesPerTrigger=1 -> two real micro-batches; then a
    # RESTART from the same checkpoint with a third file applies only
    # the new batch (source offsets + committed pointer both resume)
    inp = tmp_path / "in"
    inp.mkdir()

    def write_file(name, rows):
        with open(inp / name, "w") as f:
            for k, attr, eff in rows:
                f.write(json.dumps({"k": k, "attr": attr, "eff_ts": eff}) + "\n")

    write_file("b1.json", [(1, "a2", "2021-06-01T00:00:00")])
    write_file("b2.json", [(1, "a2", "2021-06-01T00:00:00"),  # re-delivery
                           (2, "b2", "2021-07-01T00:00:00")])

    def stream():
        return (
            spark.readStream.schema("k long, attr string, eff_ts string")
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
            .withColumn("eff_ts", F.to_timestamp("eff_ts"))
        )

    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=_seed(spark)
    )
    q = m.attach(stream(), str(tmp_path / "ckpt"))
    q.awaitTermination()

    expected = scd2_apply(
        scd2_apply(
            _seed(spark),
            spark.createDataFrame([(1, "a2", TS(2021, 6, 1))], SCHEMA_UPD),
            ["k"], ["attr"],
        ),
        spark.createDataFrame([(2, "b2", TS(2021, 7, 1))], SCHEMA_UPD),
        ["k"], ["attr"],
    )
    assert _snap(m.current()) == _snap(expected)

    write_file("b3.json", [(3, "c3", "2021-08-01T00:00:00")])
    m2 = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"]  # resumes, no seed
    )
    q2 = m2.attach(stream(), str(tmp_path / "ckpt"))
    q2.awaitTermination()
    cur = {(r.k, r.attr) for r in
           m2.current().filter(F.col("valid_to").isNull()).collect()}
    assert cur == {(1, "a2"), (2, "b2"), (3, "c3")}


def test_version_pruning_keeps_live_pointer(spark, tmp_path):
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"],
        seed=_seed(spark), keep_versions=2,
    )
    for i in range(4):
        b = spark.createDataFrame([(1, f"v{i}", TS(2021, 1, i + 1))], SCHEMA_UPD)
        m.apply_batch(b, i)
    # live version readable; old ones pruned down to keep_versions
    assert m.current().filter("valid_to IS NULL AND k = 1").collect()[0].attr == "v3"
    vdirs = [d for d in (tmp_path / "dim").iterdir()
             if d.is_dir() and d.name.startswith("v")]
    assert len(vdirs) <= 2

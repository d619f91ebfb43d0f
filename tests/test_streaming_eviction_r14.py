"""Round-14: TTL/eviction for the REMAINING unbounded-state streaming
ops (the r13 verdict's #4). The sketch trio got ProcessingTimeTimeout
expiry in r13; this round extends the same GroupState pattern — and
its checkpoint-restart guarantees — to:

- streaming_heavy_hitter_candidates (idle GROUP summaries reclaimed;
  a returned group's Misra-Gries bound covers the post-gap suffix)
- streaming_ewma (a returned key re-seeds; first post-gap row can
  never flag is_spike)
- streaming_cusum (a returned key restarts S=0 — drift since the gap)
- StreamingScd2Maintainer (no GroupState: the per-key state IS the
  dimension; the unbounded part is CLOSED history, pruned by an
  event-time retention horizon anchored to each batch's max eff)

Harness identical to tests/test_streaming_eviction.py: TTL queries
never self-terminate under availableNow (timeout-sweep batches), so
poll the sink and stop() explicitly.
"""

from __future__ import annotations

import datetime
import json
import time

TS = datetime.datetime


def _write(path, name, rows, cols):
    with open(path / name, "w") as f:
        for vals in rows:
            f.write(json.dumps(dict(zip(cols, vals))) + "\n")


def _run_until(spark, build, inp, ck, out_dir, schema, predicate,
               output_mode="update", timeout_s=90.0):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        build(stream)
        .writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    try:
        t0 = time.time()
        while True:
            try:
                rows = spark.read.parquet(out_dir).collect()
            except Exception:
                rows = []
            if predicate(rows):
                break
            if time.time() - t0 > timeout_s:
                raise AssertionError(
                    f"sink never satisfied predicate; rows={rows}"
                )
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.read.parquet(out_dir).collect()


def test_heavy_hitters_ttl_evicts_idle_group_across_restart(
    spark, tmp_path
):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.heavyhitters import (
        streaming_heavy_hitter_candidates,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "item string"
    cols = ("item",)

    # n_groups=1: every item lands in group 0, so run 2's 'other'
    # batch would REFRESH the group instead of letting it idle —
    # use n_groups=2 and two items that hash to different groups
    def build(stream):
        return streaming_heavy_hitter_candidates(
            stream, k=4, n_groups=2, ttl_ms=500
        )

    # find two items in different groups (same pmod/xxhash64 the op uses)
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(f"w{i}",) for i in range(20)], "item string"
    ).select(
        "item",
        F.pmod(F.xxhash64(F.col("item")), F.lit(2)).cast("int").alias("g"),
    ).collect()
    by_group = {}
    for r in probe:
        by_group.setdefault(r["g"], r["item"])
    a, b = by_group[0], by_group[1]

    # run 1: item `a` counted 30x in its group
    _write(inp, "b1.json", [(a,) for _ in range(30)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["item"] == a and r["mg_count"] == 30
                              for r in rs))
    time.sleep(1.5)  # sail past the TTL while the query is DOWN
    # run 2: only the OTHER group gets data; the sweep in the same
    # batch fires hasTimedOut for a's expired group -> state.remove()
    _write(inp, "b2.json", [(b,) for _ in range(5)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["item"] == b for r in rs))
    # run 3: `a` returns — counts RESTART from the post-gap suffix
    _write(inp, "b3.json", [(a,) for _ in range(10)], cols)
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["item"] == a and r["mg_count"] in (10, 40)
                       for r in rs))

    counts = sorted(r["mg_count"] for r in rows if r["item"] == a)
    assert counts == [10, 30], counts  # 10, NOT 40: eviction survived
    post = [r for r in rows if r["item"] == a and r["mg_count"] == 10]
    assert post[0]["n_group"] == 10  # the running total restarted too


def test_ewma_ttl_reseeds_and_first_postgap_row_never_spikes(
    spark, tmp_path
):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.ewma import (
        streaming_ewma,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "key string, ts timestamp, value double"
    cols = ("key", "ts", "value")

    def build(stream):
        return streaming_ewma(stream, ttl_ms=500)

    def t(i):
        return f"2026-01-01T00:00:{i:02d}"

    # run 1: key 'k' settles at a LOW average (1.0)
    _write(inp, "b1.json", [("k", t(i), 1.0) for i in range(5)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: sum(r["key"] == "k" for r in rs) == 5)
    time.sleep(1.5)
    # run 2: other key only -> 'k' evicted in the sweep
    _write(inp, "b2.json", [("other", t(10), 1.0)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "other" for r in rs))
    # run 3: 'k' returns with a value 100x its pre-gap average. With
    # stale state this MUST flag is_spike; after eviction it re-seeds
    # and cannot (judged against no history)
    _write(inp, "b3.json", [("k", t(20), 100.0)], cols)
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["key"] == "k" and r["value"] == 100.0
                       for r in rs))
    back = [r for r in rows if r["key"] == "k" and r["value"] == 100.0]
    assert len(back) == 1
    assert back[0]["is_spike"] is False  # re-seeded, not judged vs 1.0
    assert back[0]["ewma"] == 100.0  # seed value, not a blended one


def test_cusum_ttl_restarts_accumulator(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cusum import (
        streaming_cusum,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "key string, ts timestamp, value long"
    cols = ("key", "ts", "value")

    def build(stream):
        return streaming_cusum(
            stream, target=1.0, threshold=5.0, ttl_ms=500
        )

    def t(i):
        return f"2026-01-01T00:00:{i:02d}"

    # run 1: 10 rows of value 2 vs target 1 -> S climbs to +9, alert on
    _write(inp, "b1.json", [("k", t(i), 2) for i in range(10)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "k" and r["drift"] == 9.0
                              for r in rs), output_mode="append")
    time.sleep(1.5)
    _write(inp, "b2.json", [("other", t(20), 1)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "other" for r in rs),
               output_mode="append")
    # run 3: 'k' returns — S restarts at 0, so one row of value 2
    # lands at drift +1 (stale state would put it at +10, alert on)
    _write(inp, "b3.json", [("k", t(30), 2)], cols)
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["key"] == "k" and str(r["ts"]).endswith("30")
                       for r in rs), output_mode="append")
    back = [r for r in rows if r["key"] == "k" and str(r["ts"]).endswith("30")]
    assert len(back) == 1
    assert back[0]["drift"] == 1.0 and back[0]["alert"] is False


def test_scd2_history_retention_prunes_old_closed_rows(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.scd import (
        StreamingScd2Maintainer,
    )

    SCHEMA_DIM = (
        "k long, attr string, valid_from timestamp, valid_to timestamp"
    )
    SCHEMA_UPD = "k long, attr string, eff_ts timestamp"
    seed = spark.createDataFrame(
        [(1, "a", TS(2020, 1, 1), None), (2, "b", TS(2020, 1, 1), None)],
        SCHEMA_DIM,
    )
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=seed,
        history_retention_s=30 * 86400.0,  # keep 30 days of history
    )
    # batch 0 closes k=1 at 2021-01-01 (history row born)
    m.apply_batch(
        spark.createDataFrame([(1, "a2", TS(2021, 1, 1))], SCHEMA_UPD), 0
    )
    dim = m.current().collect()
    assert sum(r["valid_to"] is not None for r in dim) == 1
    # batch 1 is a YEAR later: the 2021-01-01 closed row falls out of
    # the 30-day event-time horizon; current rows survive untouched
    m.apply_batch(
        spark.createDataFrame([(2, "b2", TS(2022, 1, 10))], SCHEMA_UPD), 1
    )
    dim = m.current().collect()
    closed = [r for r in dim if r["valid_to"] is not None]
    assert len(closed) == 1  # only the fresh k=2 closure remains
    assert closed[0]["k"] == 2
    open_keys = sorted(r["k"] for r in dim if r["valid_to"] is None)
    assert open_keys == [1, 2]  # current rows are never pruned
    # retry of the same batch_id is a no-op (exactly-once preserved)
    m.apply_batch(
        spark.createDataFrame([(2, "b2", TS(2022, 1, 10))], SCHEMA_UPD), 1
    )
    assert len(m.current().collect()) == len(dim)


def test_scd2_default_keeps_all_history(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.scd import (
        StreamingScd2Maintainer,
    )

    SCHEMA_DIM = (
        "k long, attr string, valid_from timestamp, valid_to timestamp"
    )
    SCHEMA_UPD = "k long, attr string, eff_ts timestamp"
    seed = spark.createDataFrame(
        [(1, "a", TS(2020, 1, 1), None)], SCHEMA_DIM
    )
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=seed
    )
    m.apply_batch(
        spark.createDataFrame([(1, "a2", TS(2021, 1, 1))], SCHEMA_UPD), 0
    )
    m.apply_batch(
        spark.createDataFrame([(1, "a3", TS(2025, 1, 1))], SCHEMA_UPD), 1
    )
    dim = m.current().collect()
    assert sum(r["valid_to"] is not None for r in dim) == 2  # all kept


def test_scd2_subday_retention_on_date_axis_never_overprunes(
    spark, tmp_path
):
    # semantics pin (review r14): on a DATE eff axis with sub-day
    # retention, same-day closed history must survive the batch that
    # created it — the horizon promotes the max date to midnight
    # before subtracting so the sub-day part is carried explicitly
    # (behavior-preserving on pure-date columns, where values only sit
    # at midnights; load-bearing if valid_to is ever a timestamp).
    import datetime as dt

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.scd import (
        StreamingScd2Maintainer,
    )

    SCHEMA_DIM = "k long, attr string, valid_from date, valid_to date"
    SCHEMA_UPD = "k long, attr string, eff_ts date"
    seed = spark.createDataFrame(
        [(1, "a", dt.date(2026, 8, 1), None),
         (2, "b", dt.date(2026, 8, 1), None)],
        SCHEMA_DIM,
    )
    m = StreamingScd2Maintainer(
        spark, str(tmp_path / "dim"), ["k"], ["attr"], seed=seed,
        history_retention_s=3600.0,  # one hour, on a DATE eff axis
    )
    # both keys close TODAY: the closures are inside the 1-hour window
    # (same day), so neither may be pruned by the very batch that
    # created them
    m.apply_batch(
        spark.createDataFrame(
            [(1, "a2", dt.date(2026, 8, 16)),
             (2, "b2", dt.date(2026, 8, 16))],
            SCHEMA_UPD,
        ),
        0,
    )
    dim = m.current().collect()
    closed = [r for r in dim if r["valid_to"] is not None]
    assert len(closed) == 2, dim  # same-day history survives

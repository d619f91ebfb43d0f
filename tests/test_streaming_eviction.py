"""Round-13: TTL state expiry for the streaming sketch trio.

The per-key summaries are bounded, but a real log stream's KEY SPACE is
not — ttl_ms evicts keys idle past the horizon (GroupState
ProcessingTimeTimeout, the streaming/multiline.py machinery), and the
eviction must survive checkpointed restarts: a key that returns after
eviction restarts its estimate from empty, with no double-counting and
no resurrection of the dropped state.

Harness note: a query with registered processing-time timeouts never
self-terminates under Trigger.AvailableNow (the engine keeps scheduling
timeout-sweep batches), so these tests poll the sink for the expected
row and stop() the query explicitly. Eviction itself is deterministic
for the HLL/quantile tests: a micro-batch that carries data for OTHER
keys fires hasTimedOut for every expired idle key in that same batch.
"""

from __future__ import annotations

import json
import time


def _write(path, name, rows, cols=("key", "element")):
    with open(path / name, "w") as f:
        for vals in rows:
            f.write(json.dumps(dict(zip(cols, vals))) + "\n")


def _run_until(spark, build, inp, ck, out_dir, schema, predicate,
               settle_s=0.0, timeout_s=90.0):
    """Start the checkpointed query, poll the parquet sink until
    ``predicate(rows)`` holds (or fail), optionally idle for
    ``settle_s`` (timeout-sweep batches keep running), then stop."""
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
        .outputMode("update")
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
        if settle_s:
            time.sleep(settle_s)
    finally:
        q.stop()
        q.awaitTermination(30)
    return spark.read.parquet(out_dir).collect()


def test_hll_ttl_evicts_idle_key_across_restart(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.hll import (
        streaming_hll_distinct,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "key string, element string"

    def build(stream):
        return streaming_hll_distinct(stream, ttl_ms=500)

    # run 1: key 'old' sees 30 distinct elements; stop right after the
    # output lands — the 500 ms deadline persists in the CHECKPOINT
    _write(inp, "b1.json", [("old", f"x{i}") for i in range(30)])
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "old" and r["n_seen"] == 30
                              for r in rs))
    time.sleep(1.5)  # sail past the TTL while the query is DOWN
    # run 2 (restart): only 'new' carries data; the same batch fires
    # hasTimedOut for the expired idle 'old' -> state.remove()
    _write(inp, "b2.json", [("new", f"y{i}") for i in range(5)])
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "new" for r in rs))
    # run 3 (restart): 'old' returns — the estimate RESTARTS from empty
    _write(inp, "b3.json", [("old", f"x{i}") for i in range(10)])
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["key"] == "old" and r["n_seen"] in (10, 40)
                       for r in rs))

    old = sorted(r["n_seen"] for r in rows if r["key"] == "old")
    assert old == [10, 30], old  # 10, NOT 40: eviction survived restart
    last = [r for r in rows if r["key"] == "old" and r["n_seen"] == 10]
    assert last[0]["n_distinct_hll"] < 15  # estimates ~10, not ~40


def test_quantiles_ttl_evicts_and_restarts_sample(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.quantiles import (
        streaming_sampled_quantiles,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    cols = ("key", "element_id", "value")
    schema = "key string, element_id string, value double"

    def build(stream):
        return streaming_sampled_quantiles(stream, ttl_ms=500)

    _write(inp, "b1.json",
           [("k", f"e{i}", float(i)) for i in range(100)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "k" and r["n_seen"] == 100
                              for r in rs))
    time.sleep(1.5)
    _write(inp, "b2.json", [("other", "o1", 1.0)], cols)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["key"] == "other" for r in rs))
    _write(inp, "b3.json",
           [("k", f"f{i}", 1000.0 + i) for i in range(10)], cols)
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["key"] == "k" and r["n_seen"] in (10, 110)
                       for r in rs))

    k = {r["n_seen"]: r for r in rows if r["key"] == "k"}
    assert set(k) == {100, 10}, sorted(k)  # restart, not 110
    assert k[10]["sample_n"] == 10
    assert k[10]["p50"] >= 1000.0  # old sample is gone


def test_cms_ttl_resets_freshness_horizon(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cms import (
        streaming_cms_counters,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "element string"

    def build(stream):
        return streaming_cms_counters(stream, ttl_ms=500)

    _write(inp, "b1.json", [("a",) for _ in range(20)], ("element",))
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["n_row"] == 20 for r in rs))
    time.sleep(1.5)
    # CMS keys are the d hash rows themselves, so every key gets data
    # in every non-empty batch — the expiry can only fire from an
    # EMPTY timeout-sweep batch. Restart with no new data and idle:
    # the engine schedules sweep batches, the expired rows reset AND
    # emit explicit c=0 rows for every bucket (the latest-row-per-(i,b)
    # sink contract must see the new epoch, not stale pre-gap counts)
    _run_until(spark, build, inp, ck, out, schema,
               lambda rs: any(r["n_row"] == 0 for r in rs), settle_s=2.0)
    _write(inp, "b2.json", [("a",) for _ in range(3)], ("element",))
    rows = _run_until(
        spark, build, inp, ck, out, schema,
        lambda rs: any(r["n_row"] in (3, 23) for r in rs))

    per_row_counts = sorted({r["n_row"] for r in rows})
    assert per_row_counts == [0, 3, 20], per_row_counts  # reset epoch
    assert max(r["c"] for r in rows if r["n_row"] == 3) == 3
    # the reset tombstones cover the full bucket space per hash row
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.sketches import (
        CMS_W,
    )

    zero = [r for r in rows if r["n_row"] == 0]
    assert len({(r["i"], r["b"]) for r in zero}) >= CMS_W
    assert all(r["c"] == 0 for r in zero)

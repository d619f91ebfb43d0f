"""Round-15 (r14 verdict #5): TTL eviction under LOAD at the x10 batch
size (stream_scale.json's x10 point = 200k records/batch), across a
checkpoint restart.

The r13/r14 eviction tests pin per-op semantics on tiny batches; this
suite drives the sketch trio (HLL, sampled quantiles, CMS) and the
heavy hitters at 200k-row micro-batches with timeout-sweep batches
racing the trigger, and asserts BOTH halves of the contract the
docstrings state:

- state size stays bounded: the query-progress ``numRowsTotal`` of the
  stateful operator drops to the live-group count once the idle
  group's deadline fires mid-load (no unbounded key accumulation), and
  stays there after restart;
- post-eviction semantics hold under load: the returning key restarts
  from empty (HLL estimates only post-gap elements, quantiles describe
  post-gap values, Misra-Gries counts cover the post-gap suffix, CMS
  totals reset) — with the eviction and the return separated by a
  checkpoint restart, so the persisted deadline (not driver memory)
  is what fired.
"""

from __future__ import annotations

import json
import time

import pyspark.sql.functions as F

X10_ROWS = 200_000  # stream_scale.json "10" batch size
TTL_MS = 1500


def _write(path, name, rows, cols):
    with open(path / name, "w") as f:
        f.write(
            "\n".join(json.dumps(dict(zip(cols, vals))) for vals in rows)
        )
        f.write("\n")


def _state_rows(q) -> int | None:
    p = q.lastProgress
    if not p:
        return None
    ops = p.get("stateOperators") or []
    if not ops:
        return None
    return ops[0].get("numRowsTotal", ops[0].get("numTotalStateRows"))


def _start(spark, build, inp, ck, out_dir, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    return (
        build(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ck)
        .trigger(processingTime="1 second")
        .start()
    )


def _poll(spark, out_dir, predicate, q=None, timeout_s=120.0):
    t0 = time.time()
    while True:
        try:
            rows = spark.read.parquet(out_dir).collect()
        except Exception:
            rows = []
        if predicate(rows):
            return rows
        if time.time() - t0 > timeout_s:
            extra = f" state_rows={_state_rows(q)}" if q is not None else ""
            raise AssertionError(
                f"sink never satisfied predicate ({len(rows)} rows){extra}"
            )
        time.sleep(0.5)


def _poll_state_rows(q, bound, timeout_s=60.0):
    """Wait for the timeout sweep to bring state down to ``bound``."""
    t0 = time.time()
    while True:
        n = _state_rows(q)
        if n is not None and n <= bound:
            return n
        if time.time() - t0 > timeout_s:
            raise AssertionError(
                f"state rows never dropped to {bound}; last={n}"
            )
        time.sleep(0.5)


def test_hll_x10_load_eviction_and_restart(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.hll import (
        streaming_hll_distinct,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "key string, element string"
    cols = ("key", "element")

    def build(stream):
        return streaming_hll_distinct(stream, ttl_ms=TTL_MS)

    # batch A (x10 size): 1000 distinct on the soon-idle key, the rest
    # spread over 10 hot keys
    a = [("cold", f"c{i}") for i in range(1000)] + [
        (f"h{i % 10}", f"e{i}") for i in range(X10_ROWS - 1000)
    ]
    _write(inp, "a.json", a, cols)
    q = _start(spark, build, inp, ck, out, schema)
    try:
        _poll(
            spark, out,
            lambda rs: any(
                r["key"] == "cold" and r["n_seen"] == 1000 for r in rs
            ),
            q,
        )
        # batch B (x10 size): hot keys only — cold idles past the TTL
        # while full-size batches keep arriving; the sweep racing the
        # trigger must evict it mid-load
        b = [(f"h{i % 10}", f"f{i}") for i in range(X10_ROWS)]
        _write(inp, "b.json", b, cols)
        assert _poll_state_rows(q, bound=10) <= 10  # hot keys only
    finally:
        q.stop()
        q.awaitTermination(30)

    # restart from the checkpoint: cold returns with 50 NEW elements
    # under the same load — the estimate must cover only the post-gap
    # suffix (50), not resurrect the evicted 1000
    c = [("cold", f"z{i}") for i in range(50)] + [
        (f"h{i % 10}", f"g{i}") for i in range(X10_ROWS - 50)
    ]
    _write(inp, "c.json", c, cols)
    q2 = _start(spark, build, inp, ck, out, schema)
    try:
        rows = _poll(
            spark, out,
            lambda rs: any(
                r["key"] == "cold" and r["n_seen"] == 50 for r in rs
            ),
            q2,
        )
        last = [r for r in rows if r["key"] == "cold" and r["n_seen"] == 50]
        assert last[0]["n_distinct_hll"] < 300  # ~50, not ~1050
        n = _state_rows(q2)
        assert n is None or n <= 11  # hot + returned cold
    finally:
        q2.stop()
        q2.awaitTermination(30)


def test_quantiles_x10_load_eviction_and_restart(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.quantiles import (
        streaming_sampled_quantiles,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "key string, element_id string, value double"
    cols = ("key", "element_id", "value")

    def build(stream):
        return streaming_sampled_quantiles(stream, ttl_ms=TTL_MS)

    a = [("cold", f"c{i}", float(i)) for i in range(1000)] + [
        (f"h{i % 10}", f"e{i}", float(i)) for i in range(X10_ROWS - 1000)
    ]
    _write(inp, "a.json", a, cols)
    q = _start(spark, build, inp, ck, out, schema)
    try:
        _poll(
            spark, out,
            lambda rs: any(
                r["key"] == "cold" and r["n_seen"] == 1000 for r in rs
            ),
            q,
        )
        b = [(f"h{i % 10}", f"f{i}", float(i)) for i in range(X10_ROWS)]
        _write(inp, "b.json", b, cols)
        assert _poll_state_rows(q, bound=10) <= 10
    finally:
        q.stop()
        q.awaitTermination(30)

    # post-restart: cold's values land 4 orders of magnitude above the
    # evicted sample — a median near them proves the sample restarted
    c = [("cold", f"z{i}", 10_000.0 + i) for i in range(50)] + [
        (f"h{i % 10}", f"g{i}", float(i)) for i in range(X10_ROWS - 50)
    ]
    _write(inp, "c.json", c, cols)
    q2 = _start(spark, build, inp, ck, out, schema)
    try:
        rows = _poll(
            spark, out,
            lambda rs: any(
                r["key"] == "cold" and r["n_seen"] == 50 for r in rs
            ),
            q2,
        )
        last = [r for r in rows if r["key"] == "cold" and r["n_seen"] == 50]
        assert last[0]["p50"] >= 10_000.0  # post-gap values only
    finally:
        q2.stop()
        q2.awaitTermination(30)


def test_heavy_hitters_x10_load_eviction_and_restart(spark, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.heavyhitters import (
        streaming_heavy_hitter_candidates,
    )

    n_groups = 32
    # pick items whose value-hash groups are KNOWN: the cold item must
    # share a group with no hot item, so its group genuinely idles
    cands = [f"w{i}" for i in range(60)]
    gmap = {
        r["item"]: r["g"]
        for r in spark.createDataFrame(
            [(c,) for c in cands], "item string"
        )
        .select(
            "item",
            F.pmod(F.xxhash64(F.col("item").cast("string")),
                   F.lit(n_groups)).cast("int").alias("g"),
        )
        .collect()
    }
    cold = cands[0]
    hot = [c for c in cands[1:] if gmap[c] != gmap[cold]][:10]
    hot_groups = {gmap[c] for c in hot}

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "item string"
    cols = ("item",)

    def build(stream):
        return streaming_heavy_hitter_candidates(
            stream, k=8, n_groups=n_groups, ttl_ms=TTL_MS
        )

    a = [(cold,)] * 1000 + [
        (hot[i % len(hot)],) for i in range(X10_ROWS - 1000)
    ]
    _write(inp, "a.json", a, cols)
    q = _start(spark, build, inp, ck, out, schema)
    try:
        _poll(
            spark, out,
            lambda rs: any(
                r["item"] == cold and r["mg_count"] >= 1000 for r in rs
            ),
            q,
        )
        b = [(hot[i % len(hot)],) for i in range(X10_ROWS)]
        _write(inp, "b.json", b, cols)
        # cold's group evicts mid-load -> only the hot groups remain
        assert _poll_state_rows(q, bound=len(hot_groups)) <= len(hot_groups)
    finally:
        q.stop()
        q.awaitTermination(30)

    # restart: cold returns x10 — its Misra-Gries count must cover the
    # post-gap suffix (10), not the evicted 1000
    c = [(cold,)] * 10 + [(hot[i % len(hot)],) for i in range(X10_ROWS - 10)]
    _write(inp, "c.json", c, cols)
    q2 = _start(spark, build, inp, ck, out, schema)
    try:
        rows = _poll(
            spark, out,
            lambda rs: any(
                r["item"] == cold and r["mg_count"] <= 10 for r in rs
            ),
            q2,
        )
        counts = sorted(
            r["mg_count"] for r in rows if r["item"] == cold
        )
        assert counts[-1] <= 1000  # never 1010: no resurrection
        assert 10 in counts  # the post-gap suffix count
    finally:
        q2.stop()
        q2.awaitTermination(30)


def test_cms_x10_silence_reset_across_restart(spark, tmp_path):
    """CMS state is bounded (d x w) by construction, so its TTL is a
    freshness knob that can only fire across TOTAL silence (every
    element touches all d hash rows). Drive an x10 batch, let the
    sweep expire the rows during a silent window, restart, and assert
    the totals reset."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.cms import (
        CMS_D,
        streaming_cms_counters,
    )

    inp = tmp_path / "in"
    inp.mkdir()
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    schema = "element string"
    cols = ("element",)

    def build(stream):
        return streaming_cms_counters(stream, ttl_ms=TTL_MS)

    a = [("e",)] * 1000 + [(f"x{i % 50}",) for i in range(X10_ROWS - 1000)]
    _write(inp, "a.json", a, cols)
    q = _start(spark, build, inp, ck, out, schema)
    try:
        _poll(
            spark, out,
            lambda rs: any(r["c"] >= 1000 for r in rs),
            q,
        )
        n = _state_rows(q)
        assert n is not None and n <= CMS_D  # bounded by construction
        time.sleep((TTL_MS / 1000.0) + 2.0)  # silence: sweeps expire rows
    finally:
        q.stop()
        q.awaitTermination(30)

    _write(inp, "c.json", [("e",)] * 10, cols)
    q2 = _start(spark, build, inp, ck, out, schema)
    try:
        rows = _poll(
            spark, out,
            lambda rs: any(0 < r["c"] <= 10 for r in rs),
            q2,
        )
        # post-reset totals for e's buckets are exactly 10 (batch C
        # holds only e); resurrection would have emitted >= 1010
        assert any(r["c"] == 10 for r in rows)
    finally:
        q2.stop()
        q2.awaitTermination(30)

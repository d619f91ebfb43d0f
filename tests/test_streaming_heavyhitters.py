"""Streaming Misra-Gries: state carries across micro-batches, the
guarantee holds on the full stream, and grouping is value-stable."""

from __future__ import annotations

import json

from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming.heavyhitters import (
    streaming_heavy_hitter_candidates,
)


def _write_items(path, name, items):
    with open(path / name, "w") as f:
        for it in items:
            f.write(json.dumps({"item": it}) + "\n")


def test_streaming_mg_accumulates_and_keeps_heavy_items(spark, tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    # batch 1: 'hot' is heavy; batch 2: 'hot' keeps flowing among noise
    _write_items(inp, "b1.json", ["hot"] * 50 + [f"cold_{i}" for i in range(40)])
    _write_items(inp, "b2.json", ["hot"] * 50 + [f"cold_{i}" for i in range(40, 80)])

    stream = (
        spark.readStream.schema("item string")
        .option("maxFilesPerTrigger", 1)
        .json(str(inp))
    )
    out = streaming_heavy_hitter_candidates(stream, k=8, n_groups=4)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_updates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh_updates").collect()
    hot = [r for r in rows if r.item == "hot"]
    # 'hot' must be a candidate after every micro-batch it appears in
    assert len(hot) >= 2
    # the LAST update reflects the whole stream: sketch count can only
    # undercount, never overcount, and by at most n_group/k
    last = max(hot, key=lambda r: r.n_group)
    assert last.mg_count <= 100
    assert last.mg_count >= 100 - last.n_group // 8
    # group totals accumulate: 180 items across all groups
    latest_per_group = {}
    for r in rows:
        g = latest_per_group.get(r.group_id)
        if g is None or r.n_group > g:
            latest_per_group[r.group_id] = r.n_group
    assert sum(latest_per_group.values()) == 180


def test_streaming_mg_state_survives_restart(spark, tmp_path):
    inp = tmp_path / "in2"
    inp.mkdir()
    ck = str(tmp_path / "ck2")

    out_dir = str(tmp_path / "hh_out")

    def run_once():
        stream = (
            spark.readStream.schema("item string")
            .option("maxFilesPerTrigger", 1)
            .json(str(inp))
        )
        out = streaming_heavy_hitter_candidates(stream, k=8, n_groups=2)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        # memory sink can't recover a checkpoint; foreachBatch can
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _write_items(inp, "b1.json", ["hot"] * 30)
    run_once()  # first query consumes batch 1, checkpoints MG state

    _write_items(inp, "b2.json", ["hot"] * 20)
    run_once()  # restarted query must resume, not restart, the sketch

    rows = (
        spark.read.parquet(out_dir).filter("item = 'hot'").collect()
    )
    assert max(r.mg_count for r in rows) == 50  # 30 from before + 20 after

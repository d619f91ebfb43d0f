"""Streaming shipper throughput vs input scale (r14).

The bench's streaming number runs one 20 k-record corpus (sf0.1). This
harness measures how records/sec moves when the INPUT grows 10x — the
fan-out + single-materialization ship path (streaming/pipeline.py
_ship_batch) should amortize its fixed per-batch cost (plan compile,
checkpoint commit, sink overwrite) over more rows, so throughput should
RISE with batch size, not fall. A falling curve would mean a per-row
cost that compounds at scale (the thing to catch before 1000 shards).

Reuses scripts/scale_stress.py's scaled corpora (build them first:
  python scripts/scale_stress.py build /root/testdata/sf0.1 1 10
). Protocol per scale: synthesize + store the Kinesis corpus once,
then 3 shipper runs with fresh checkpoint/output dirs, best taken
(first run absorbs stream-query JIT). Writes stream_scale.json:
  {"1": {records, sec, records_per_sec}, "10": {...}, "ratio": r}

Run on a quiet host.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_ROOT = "/tmp/spark_graft_scale"


def measure(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.logsim import (
        synth_kinesis_records,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.streaming import (
        StreamingShipper,
    )

    work = tempfile.mkdtemp(prefix="stream_scale_")
    try:
        inp = os.path.join(work, "in")
        synth_kinesis_records(spark, sf_dir).select(
            F.array(
                F.struct(
                    F.struct(F.col("data")).alias("kinesis"),
                    F.col("awsRegion"),
                )
            ).alias("Records")
        ).write.json(inp)
        n = spark.read.text(inp).count()
        elapsed = []
        for attempt in range(3):
            shipper = StreamingShipper(
                spark,
                inp,
                os.path.join(work, f"out{attempt}"),
                os.path.join(work, f"ck{attempt}"),
            )
            t0 = time.time()
            q = shipper.start(available_now=True)
            q.awaitTermination()
            elapsed.append(time.time() - t0)
        best = min(elapsed)
        return {
            "records": n,
            "sec": round(best, 2),
            "records_per_sec": round(n / best, 1),
            "runs": [round(t, 2) for t in elapsed],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import (
        get_spark,
    )

    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scales = [int(s) for s in sys.argv[2:]] or [1, 10]
    spark = get_spark("stream_scale")
    out: dict = {}
    for s in scales:
        d = (
            base
            if s == 1
            else os.path.join(
                OUT_ROOT,
                f"{os.path.basename(os.path.normpath(base))}-x{s}",
            )
        )
        if not os.path.isdir(d):
            raise SystemExit(
                f"missing scaled dir {d} — run scale_stress.py build first"
            )
        out[str(s)] = measure(spark, d)
        print(f"x{s}: {out[str(s)]}", flush=True)
    if len(scales) >= 2:
        lo, hi = str(scales[0]), str(scales[-1])
        out["throughput_ratio"] = round(
            out[hi]["records_per_sec"] / out[lo]["records_per_sec"], 3
        )
    out["_host_load"] = list(os.getloadavg())
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "stream_scale.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"written {path}")


if __name__ == "__main__":
    main()

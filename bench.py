"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
and prints ONE JSON line with per-query wall seconds.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Methodology: every query first executes once at the SMALLEST scale
(sf0.001) to pay one-time plan costs — codegen compilation and JIT are
keyed on plan shape, not data volume — then TWO timed runs execute at
the target scale and the MIN is reported. The min-of-2 exists because
the recording host is shared: a co-tenant burst during a single timed
run would otherwise fabricate a 5-10x outlier for that query (observed
in earlier rounds); the minimum of two spaced runs is robust to one
burst while still reporting honest steady-state time.
`spark.catalog.clearCache()` runs between all runs so no operator-level
persist() carries over.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = entrymod.queries()

    # session warmup outside any timed region
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        try:
            fn(spark, warm_dir).count()  # compile/JIT the plan shape
            spark.catalog.clearCache()
            best = None
            for _ in range(2):  # min-of-2: robust to one co-tenant burst
                t0 = time.time()
                fn(spark, sf_dir).count()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
                spark.catalog.clearCache()
            timings[name] = round(best, 2)
        except Exception as exc:  # a broken query must not hide the rest
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 2)
    # The driver tail-captures stdout (~2 KB): stop Spark first so no JVM
    # shutdown noise can follow, then emit ONE compact line as the final
    # stdout output. No rows dict, 2-dp timings -> ~1.4 KB for 49 queries.
    spark.stop()
    sys.stderr.flush()
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            },
            separators=(",", ":"),
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
and prints ONE JSON line with per-query wall seconds.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Methodology: each query executes twice — the first run pays one-time
plan costs (codegen compilation, JIT, shuffle-file warmup) and is
reported under "cold"; the reported headline `queries` timings are the
second (steady-state) run, which is what a long-running engine
delivers. `spark.catalog.clearCache()` runs between the two so no
operator-level persist() carries over; only JVM JIT and OS page cache
remain warm, as they would on any real cluster.
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

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in qs.items():
        try:
            t0 = time.time()
            fn(spark, sf_dir).count()
            cold[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
            t0 = time.time()
            rows[name] = fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
            spark.catalog.clearCache()
        except Exception as exc:  # a broken query must not hide the rest
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold": cold,
                "rows": rows,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

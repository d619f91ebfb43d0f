"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
and prints ONE JSON line with per-query wall seconds.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)

Each query executes to completion via a noop-format write (full plan
runs distributed, no driver-side collect cost skewing the number).
JVM/session startup is excluded; a warmup query triggers codegen paths
before timing starts.
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


def execute(df) -> int:
    """Run the full plan on the cluster; return row count (cheap agg)."""
    return df.count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)/?$", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warmup: JVM + parquet footer reads outside the timed region.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            rows[name] = execute(fn(spark, sf_dir))
            timings[name] = round(time.time() - t0, 3)
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
                "rows": rows,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()

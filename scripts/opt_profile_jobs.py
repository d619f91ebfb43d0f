"""Per-query job/plan profile for the r15 optimization round.

For each declared query (or a named subset), after the bench.py-style
plan-warm and store-warm passes, measures in one timed run:
  - build_s:   Python DataFrame-construction time (fn call, no action)
  - exec_s:    action time (.count())
  - n_jobs:    Spark jobs launched by the action (job-group scoped)
  - exchanges: Exchange nodes in the formatted plan
  - plan_len:  size of the formatted plan (proxy for analysis cost)

Output: JSON lines to stdout, sorted by exec_s descending at the end.
Usage: python scripts/opt_profile_jobs.py [query ...]
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-profile-jobs")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = sys.argv[1:] or list(qs)

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    for q in names:
        qs[q](spark, warm_dir).count()
        spark.catalog.clearCache()
    for q in names:
        qs[q](spark, sf_dir).count()
        spark.catalog.clearCache()

    rows = []
    for q in names:
        t0 = time.time()
        df = qs[q](spark, sf_dir)
        build_s = time.time() - t0

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        exchanges = plan.count("Exchange")
        spark.catalog.clearCache()

        # fresh build for the timed action (explain may have forced
        # partial analysis; keep the measured path identical to bench)
        df = qs[q](spark, sf_dir)
        group = f"prof_{q}"
        sc.setJobGroup(group, q)
        t0 = time.time()
        df.count()
        exec_s = time.time() - t0
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup(None, None)
        spark.catalog.clearCache()

        row = {
            "q": q,
            "build_s": round(build_s, 3),
            "exec_s": round(exec_s, 3),
            "n_jobs": n_jobs,
            "exchanges": exchanges,
            "plan_len": len(plan),
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    rows.sort(key=lambda r: -(r["build_s"] + r["exec_s"]))
    spark.stop()
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()

"""Dump .explain("formatted") for named queries WITHOUT timing runs.

Builds each query's DataFrame at $SPARK_GRAFT_SF_DIR (default sf0.1)
and writes the formatted physical plan to plans/r15/<query>_<TAG>.txt
under --out-repo (default: this repo). Construction may fire bounded
jobs (fit caches, trainer loops) — that is the query's real
construction cost and does not affect the dumped plan.

Usage: python scripts/opt_dump_plans.py --tag after [--out-repo DIR] q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out-repo", default=None)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    repo = args.out_repo or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "plans", "r15")
    os.makedirs(outdir, exist_ok=True)

    spark = get_spark("opt-dump-plans")
    qs = entrymod.queries()
    for q in args.queries:
        if q not in qs:
            sys.exit(f"unknown query: {q}")
    for q in args.queries:
        df = qs[q](spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{q}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

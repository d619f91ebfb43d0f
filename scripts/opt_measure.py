"""Round-15 optimization measurement harness.

Times a named subset of the declared queries at $SPARK_GRAFT_SF_DIR
with the SAME methodology as bench.py (plan-warm at sf0.001, one
untimed store-warm pass at the target sf, then N interleaved timed
passes, min reported), and optionally dumps `.explain("formatted")`
for each query to plans/<round>/<query>_<tag>.txt (round from $OPT_PLANS_ROUND, default r16).

Usage:
  python scripts/opt_measure.py [--passes N] [--explain TAG] q1 q2 ...
  python scripts/opt_measure.py --explain before corpus_curate_e2e

Explain capture happens OUTSIDE the timed region (before timing) so
the plan dump cannot contaminate the numbers.
"""

from __future__ import annotations

import argparse
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/<round>/<q>_<TAG>.txt")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    spark = get_spark("opt-measure")
    qs = entrymod.queries()
    for q in args.queries:
        if q not in qs:
            sys.exit(f"unknown query: {q}")

    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = args.sf_dir

    # plan warm + store warm (untimed), same as bench.py
    for q in args.queries:
        qs[q](spark, warm_dir).count()
        spark.catalog.clearCache()
    for q in args.queries:
        qs[q](spark, args.sf_dir).count()
        spark.catalog.clearCache()

    if args.explain:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        outdir = os.path.join(here, "plans", os.environ.get("OPT_PLANS_ROUND", "r16"))
        os.makedirs(outdir, exist_ok=True)
        for q in args.queries:
            df = qs[q](spark, args.sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(outdir, f"{q}_{args.explain}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"explain -> {path}", file=sys.stderr)
            spark.catalog.clearCache()

    runs: dict[str, list[float]] = {q: [] for q in args.queries}
    for _p in range(args.passes):
        for q in args.queries:
            spark.sparkContext.setJobDescription(f"opt_measure:{q}")
            t0 = time.time()
            qs[q](spark, args.sf_dir).count()
            runs[q].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()

    out = {
        q: {
            "min": round(min(ts), 3),
            "all": [round(t, 2) for t in ts],
            "noise": round(max(ts) / min(ts), 2),
        }
        for q, ts in runs.items()
    }
    out["_load"] = [round(x, 1) for x in os.getloadavg()]
    spark.stop()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

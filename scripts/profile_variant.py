"""A/B profile: did the MAP<STRING,VARIANT> attributes promotion (r6,
parse.py) add real parse-kernel cost vs the r5 string-map kernel?

Times the log_* family at sf0.1 under both kernels in ONE session with
interleaved passes (A,B,A,B,...), reporting min-of-N per (query, mode)
plus the per-pass raw times and a noise ratio, so a co-tenant burst
can't masquerade as a kernel regression (VERDICT r6 "What's wrong" #1).

Usage: python scripts/profile_variant.py [N_PASSES]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import parse
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import logsim
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark

QUERIES = [
    "log_parse_severity",
    "log_parse_dispatch",  # control: same kernel, was flat in r6
    "log_table_roundtrip",
    "log_observe_counters",
]


def main() -> None:
    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-variant")
    fns = {q: getattr(logsim, q) for q in QUERIES}

    # warm both plan shapes (codegen/JIT) outside the timed region
    warm = "/root/testdata/sf0.001"
    for mode in ("variant", "string"):
        parse._ATTR_MODE = mode
        for fn in fns.values():
            fn(spark, warm).count()
            spark.catalog.clearCache()

    runs: dict[str, dict[str, list[float]]] = {
        q: {"variant": [], "string": []} for q in QUERIES
    }
    for _p in range(n_passes):
        for mode in ("variant", "string"):
            parse._ATTR_MODE = mode
            for q, fn in fns.items():
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs[q][mode].append(time.time() - t0)
                spark.catalog.clearCache()
    parse._ATTR_MODE = "variant"  # restore production kernel

    out = {}
    for q in QUERIES:
        v, s = runs[q]["variant"], runs[q]["string"]
        out[q] = {
            "variant_min": round(min(v), 3),
            "string_min": round(min(s), 3),
            "ratio": round(min(v) / min(s), 3),
            "noise_variant": round(max(v) / min(v), 2),
            "noise_string": round(max(s) / min(s), 2),
            "variant_all": [round(t, 2) for t in v],
            "string_all": [round(t, 2) for t in s],
        }
    spark.stop()
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

"""Skewed-corpus scale stress (r10 verdict ask #6).

The r10 x1->x10 stress used a UNIFORM copy transform (every doc's
near-dup neighborhood stays O(1)); real crawl corpora are Zipf-heavy —
boilerplate/mirror pages form one giant near-dup cluster. This harness
builds corpora where ONE hot near-dup cluster holds ~10% of all docs
(every member a tiny perturbation of the same hot text, so all its
MinHash bands collide into the same LSH buckets) and measures whether
the skew controls actually hold:

- ``near_dup_pairs`` with the production ``_cap_buckets`` hot-bucket
  cap: timing exponent x1->x10 (target <= 0.8 — sub-linear), plus the
  CAPPED vs UNCAPPED timing at x10 (the cap's measured effect — the
  uncapped run must do the ~(0.1 N)^2 hot-cluster candidate work).
- ``corpus_curate_e2e`` (registry query, persisted-store near-dup
  canonical stage inside): timing exponent under the same skew.

Build: copy 0 = the base corpus. For copy i >= 1, docs with
doc_id % 10 != 0 get the uniform every-2nd-word suffix transform (the
scale_stress.py discipline — disjoint shingles, linear pair growth);
docs with doc_id % 10 == 0 are REPLACED by the hot document's text
plus a per-doc one-word tail ("hv<doc_id>") — near-identical long
texts, Jaccard >> 0.8 against each other. At x10 the hot cluster is
~10% of the corpus. Copy 0 keeps the base corpus intact so x1 vs x10
compares the same base workload plus skew.

Usage:
  python scripts/scale_stress_skew.py all [base_sf_dir] [scales...]

Output: /tmp/spark_graft_scale/scale_stress_skew.json (copy into the
repo as the committed artifact).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

OUT_ROOT = "/tmp/spark_graft_scale"


def build_skewed(base: str, n: int) -> str:
    import duckdb

    out = os.path.join(
        OUT_ROOT, f"{os.path.basename(os.path.normpath(base))}-skew-x{n}"
    )
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # the hot text: the longest base doc (long text -> one-word tails
    # keep Jaccard near 1, far above the 0.8 near-dup threshold)
    hot = con.sql(
        f"SELECT text FROM read_parquet('{base}/documents.parquet') "
        "ORDER BY length(text) DESC, doc_id LIMIT 1"
    ).fetchone()[0]
    hot_sql = hot.replace("'", "''")

    def _suffix(i: int) -> str:
        return (
            "regexp_replace(text, '(" + r"\S+\s+\S" + "+)', '"
            + r"\1" + f"{i}', 'g')"
        )

    parts = [
        f"""SELECT doc_id, text, lang, source,
               CAST(length(text) AS BIGINT) AS n_chars
           FROM read_parquet('{base}/documents.parquet')"""
    ]
    for i in range(1, n):
        parts.append(
            f"""SELECT doc_id + {i * 10_000_000} AS doc_id,
                   CASE WHEN doc_id % 10 = 0
                        THEN '{hot_sql}' || ' hv' || CAST(doc_id + {i * 10_000_000} AS VARCHAR)
                        ELSE {_suffix(i)} END AS text,
                   lang, source,
                   CAST(length(CASE WHEN doc_id % 10 = 0
                        THEN '{hot_sql}' || ' hv' || CAST(doc_id + {i * 10_000_000} AS VARCHAR)
                        ELSE {_suffix(i)} END) AS BIGINT) AS n_chars
               FROM read_parquet('{base}/documents.parquet')"""
        )
    con.sql(
        "COPY (" + " UNION ALL ".join(parts)
        + f") TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )
    # embeddings/events: same transforms as scale_stress.py (needed by
    # corpus_curate_e2e's inputs? the curate pipeline reads documents
    # only, but load() may resolve siblings — copy the base files)
    for t in ("embeddings", "events"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{base}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    with open(marker, "w"):
        pass
    return out


def run(dirs: dict[int, str]) -> dict:
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.dedup import (
        near_dup_pairs,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import (
        QUERIES as REG,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import (  # noqa: F401
        llmops,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark

    spark = get_spark("scale_stress_skew")
    results: dict = {
        "near_dup_pairs_capped": {},
        "corpus_curate_e2e": {},
        "corpus_curate_e2e_capped": {},
    }

    def _docs(d):
        n = spark.sparkContext.defaultParallelism
        return (
            spark.read.parquet(os.path.join(d, "documents.parquet"))
            .repartition(n, "doc_id")
        )

    def _time(fn, warm=1, runs=2):
        for _ in range(warm):
            fn()
        ts = []
        for _ in range(runs):
            t0 = time.time()
            rows = fn()
            ts.append(time.time() - t0)
        return round(min(ts), 2), rows, [round(t, 2) for t in ts]

    for scale, d in sorted(dirs.items()):
        m, rows, ts = _time(lambda: near_dup_pairs(_docs(d)).count())
        results["near_dup_pairs_capped"][scale] = {
            "min_s": m, "rows": rows, "runs": ts,
        }
        print(f"x{scale} near_dup_pairs capped   min={m:7.2f}s rows={rows}",
              flush=True)
        fn = REG["corpus_curate_e2e"]
        m, rows, ts = _time(lambda: fn(spark, d).count())
        results["corpus_curate_e2e"][scale] = {
            "min_s": m, "rows": rows, "runs": ts,
        }
        print(f"x{scale} corpus_curate_e2e      min={m:7.2f}s rows={rows}",
              flush=True)
        # production hot-bucket cap inside the curate pipeline's
        # near-dup stage (the control the skew stress exists to prove)
        os.environ["CURATE_NEARDUP_CAP"] = "1000"
        try:
            m, rows, ts = _time(lambda: fn(spark, d).count())
        finally:
            os.environ.pop("CURATE_NEARDUP_CAP", None)
        results["corpus_curate_e2e_capped"][scale] = {
            "min_s": m, "rows": rows, "runs": ts,
        }
        print(f"x{scale} corpus_curate_e2e cap  min={m:7.2f}s rows={rows}",
              flush=True)

    # the cap's measured effect at the top scale: capped vs UNCAPPED
    top = max(dirs)
    d = dirs[top]
    m_unc, rows_unc, ts = _time(
        lambda: near_dup_pairs(_docs(d), max_bucket_size=None).count(),
        warm=0, runs=1,
    )
    results["near_dup_pairs_uncapped_top"] = {
        "scale": top, "min_s": m_unc, "rows": rows_unc,
    }
    capped_top = results["near_dup_pairs_capped"][top]["min_s"]
    results["cap_speedup_at_top"] = round(m_unc / max(capped_top, 1e-9), 2)
    print(f"x{top} near_dup_pairs UNCAPPED min={m_unc:7.2f}s "
          f"rows={rows_unc} (capped was {capped_top}s)", flush=True)

    scales = sorted(dirs)
    if len(scales) >= 2:
        s1, s2 = scales[0], scales[-1]
        for q in (
            "near_dup_pairs_capped",
            "corpus_curate_e2e",
            "corpus_curate_e2e_capped",
        ):
            t1 = results[q][s1]["min_s"]
            t2 = results[q][s2]["min_s"]
            results[q]["exponent"] = round(
                math.log(max(t2, 1e-9) / max(t1, 1e-9))
                / math.log(s2 / s1), 3,
            )
    results["_host_load"] = list(os.getloadavg())
    results["_hot_fraction"] = "doc_id % 10 == 0 in copies 1..n-1"
    return results


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    base = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    scales = [int(s) for s in sys.argv[3:]] or [1, 10]
    dirs = {}
    for s in scales:
        if cmd in ("build", "all"):
            dirs[s] = build_skewed(base, s)
            print(f"built skew x{s}: {dirs[s]}", flush=True)
        else:
            dirs[s] = os.path.join(
                OUT_ROOT,
                f"{os.path.basename(os.path.normpath(base))}-skew-x{s}",
            )
    if cmd in ("run", "all"):
        res = run(dirs)
        out = os.path.join(OUT_ROOT, "scale_stress_skew.json")
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"written {out}")


if __name__ == "__main__":
    main()

"""ANN operating curve (r11 verdict stretch #8): recall@k vs latency
as a function of nprobe over the PERSISTED exact-arith IVF and IVF-PQ
indexes — the curve a user needs to pick nprobe for their recall
target.

Setup: corpus = embeddings with vec_id >= 500 at the given SF dir,
queries = the 500 held-out vectors (vec_id < 500; at smaller SFs,
whatever is available). Ground truth = brute-force exact top-k
(numpy exact-fold kernel — bit-identical arithmetic to the engine's
scoring). Each nprobe gets a best-of-2 latency on the SAME persisted
index, so the measured cost is pure search (probe + partition-pruned
scan + ADC/score + rank), never fit or encode.

Usage:  python scripts/ann_operating_curve.py [sf_dir] [k]
Output: /tmp/spark_graft_scale/ann_operating_curve.json (copy into the
repo as the committed artifact) + a human-readable table on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "/tmp/spark_graft_scale/ann_operating_curve.json"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import ivf_exact as ix
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark

    spark = get_spark("ann_curve")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_total = emb.count()
    n_queries = min(500, n_total // 4)
    corpus = emb.filter(F.col("vec_id") >= n_queries).localCheckpoint(
        eager=True
    )
    queries = emb.filter(F.col("vec_id") < n_queries).localCheckpoint(
        eager=True
    )

    # ground truth once: brute-force exact top-k (numpy exact fold)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in ix.exact_fold_topk(corpus, queries, k=k).collect()
    }
    by_query: dict[int, set[int]] = {}
    for q, nbr in exact:
        by_query.setdefault(q, set()).add(nbr)

    work = tempfile.mkdtemp(prefix="ann_curve_")
    ivf_path = os.path.join(work, "ivf")
    pq_path = os.path.join(work, "ivfpq")
    t0 = time.time()
    ix.build_ivf_index_exact(corpus, ivf_path, n_clusters=16)
    build_ivf_s = round(time.time() - t0, 2)
    t0 = time.time()
    ix.build_ivfpq_index_exact(corpus, pq_path, n_clusters=16)
    build_pq_s = round(time.time() - t0, 2)

    def measure(search_fn) -> dict:
        # best-of-2: first run pays plan/codegen, second is steady state
        times = []
        for _ in range(2):
            t0 = time.time()
            rows = search_fn().collect()
            times.append(time.time() - t0)
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(got.get(q, set()) & nbrs) / len(nbrs)
            for q, nbrs in by_query.items()
        ]
        return {
            "sec": round(min(times), 2),
            "recall_at_k": round(sum(recalls) / len(recalls), 4),
            "n_queries": len(by_query),
        }

    curve: dict = {
        "sf_dir": sf_dir,
        "k": k,
        "corpus_rows": n_total - n_queries,
        "build_ivf_s": build_ivf_s,
        "build_ivfpq_s": build_pq_s,
        "ivf": {},
        "ivfpq": {},
        "load": [round(x, 1) for x in os.getloadavg()],
    }
    for nprobe in (2, 4, 6, 8):
        curve["ivf"][str(nprobe)] = measure(
            lambda np_=nprobe: ix.query_ivf_index_exact(
                spark, ivf_path, queries, k=k, nprobe=np_
            )
        )
        curve["ivfpq"][str(nprobe)] = measure(
            lambda np_=nprobe: ix.query_ivfpq_index_exact(
                spark, pq_path, queries, k=k, nprobe=np_
            )
        )
        print(
            f"nprobe={nprobe}: ivf {curve['ivf'][str(nprobe)]}"
            f" | ivfpq {curve['ivfpq'][str(nprobe)]}"
        )

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(curve, f, indent=1)
        f.write("\n")
    print("written", OUT)


if __name__ == "__main__":
    main()

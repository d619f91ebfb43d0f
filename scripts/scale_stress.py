"""Scale-stress harness (r9 verdict ask #4): measure how the top-5
bench queries actually scale when the corpus grows 10x, instead of
arguing from plan shapes.

Builds scaled copies of the sf tables with DuckDB:
- documents: copy i appends the copy index to EVERY word (disjoint
  shingle sets across copies, so near-dup pair counts stay ~linear in
  the scale factor — 10 verbatim clones would near-dup-match each
  other and blow the PAIR count up ~100x, measuring output explosion
  instead of engine scaling);
- embeddings: copy i scales each component by (1 + i/10000) — breaks
  exact-tie pathologies while keeping the geometry;
- events: id/user offsets per copy, distributions untouched.

Usage:
  python scripts/scale_stress.py build  [base_sf_dir] [scales...]
  python scripts/scale_stress.py run    [base_sf_dir] [scales...]
  python scripts/scale_stress.py all    [base_sf_dir] [scales...]

Timing protocol: per (query, scale) one WARMUP run (builds synthcache
corpora, signature stores, persisted indexes — the amortized artifacts
a steady-state deployment already has), then two timed runs, min
taken. The scaling exponent is log(T_s/T_1)/log(s). Results land in
/tmp/spark_graft_scale/scale_stress.json for PROFILE_r09.md.

Run on a quiet host (no concurrent pytest/bench — 32 cores contend).
"""

from __future__ import annotations

import json
import os
import sys
import time

OUT_ROOT = "/tmp/spark_graft_scale"
QUERIES = [
    "near_dup_stream_guard",
    "log_top_errors",
    "embedding_ann_ivfpq",
    "embedding_pagerank",
    "doc_dup_span_exact",
    # r10 additions: the flagship composed pipeline and the hybrid
    # retrieval query (two rankers + fusion — the worst-case "many
    # stages over one corpus" shape)
    "corpus_curate_e2e",
    "doc_hybrid_search_rrf",
    # r10 second pass: CDC explodes ~one row per character before the
    # 1/64 boundary filter (the heaviest narrow pass in the engine),
    # and the GD probe is n_iter full-corpus aggregates
    "doc_cdc_dedup_stats",
    "corpus_quality_linear_probe",
    # r13 x100 set (verdict #4): the capped store-backed near-dup
    # pairs and a persisted-index probe — run these at x100 via
    # SCALE_STRESS_ONLY=corpus_curate_e2e,near_dup_pairs,embedding_ann_ivf_index
    # with SCALE_STRESS_OUT=scale_stress_x100.json
    "near_dup_pairs",
    "embedding_ann_ivf_index",
    # r14 (verdict #6): curate with the survivor pool capped at 4096
    # (the x1 output size) so the exponent isolates stage-1..4 plan
    # cost from output-volume growth — the uncapped x100 exponent is
    # dominated by survivors growing 86x through DSIR/BPE/packing
    "corpus_curate_e2e_capped",
    # r15: the distributed-ntile rewrites (the r14 verdict's weak +
    # its skew cousin) — measured instead of argued-from-plan-shape
    "customer_rfm_segments",
    "events_value_deciles",
    # r15b: the exact set-similarity joins (prefix-filtered Jaccard,
    # subset containment) and the k-NN BFS — the copy builder keeps
    # word sets copy-disjoint (half the words carry the copy suffix),
    # so group/pair growth stays ~linear and the exponent measures the
    # join, not output explosion
    "near_dup_jaccard_prefix",
    "doc_subset_containment",
    "embedding_bfs_hops",
]

# pseudo-queries: harness-only variants not in the declared registry
# (the @query decorator registers functions unwrapped, so extra kwargs
# pass straight through)
PSEUDO = {
    "corpus_curate_e2e_capped": lambda REG: (
        lambda spark, d: REG["corpus_curate_e2e"](
            spark, d, survivor_cap=4096
        )
    ),
}


def build_scaled(base: str, n: int) -> str:
    import duckdb

    out = os.path.join(OUT_ROOT, f"{os.path.basename(os.path.normpath(base))}-x{n}")
    marker = os.path.join(out, ".complete")
    if os.path.exists(marker):
        _ensure_orders(base, out, n)  # r15 addition to older builds
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def _text_expr(i: int) -> str:
        # Suffix every SECOND word with the copy index (not every word,
        # which the r9 builder did): any 3-word shingle window and any
        # 30-char span still contains >= 1 suffixed word, so shingle /
        # char-gram / MinHash identities stay copy-disjoint (near-dup
        # and dup-span outputs grow ~linearly, not ~quadratically) —
        # but HALF the language-marker stopwords survive verbatim, so
        # lang_id still resolves and the curate pipeline's stage-1 gate
        # passes copies at the same rate as originals. With every-word
        # suffixing, all copies scored 'und' and the x10 curate run
        # silently measured constant post-gate work (caught r10: s1
        # survivors were 4388 at BOTH x1 and x10).
        if i == 0:
            return "text"
        return (
            "regexp_replace(text, '(" + r"\S+\s+\S" + "+)', '"
            + r"\1" + f"{i}', 'g')"
        )

    docs = " UNION ALL ".join(
        f"""SELECT doc_id + {i * 10_000_000} AS doc_id,
               {_text_expr(i)} AS text,
               lang, source,
               CAST(length({_text_expr(i)}) AS BIGINT) AS n_chars
           FROM read_parquet('{base}/documents.parquet')"""
        for i in range(n)
    )
    con.sql(f"COPY ({docs}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    emb = " UNION ALL ".join(
        f"""SELECT vec_id + {i * 10_000_000} AS vec_id,
               CAST([x * (1 + {i} * 0.0001) for x in embedding] AS FLOAT[]) AS embedding,
               label
           FROM read_parquet('{base}/embeddings.parquet')"""
        for i in range(n)
    )
    con.sql(f"COPY ({emb}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    ev = " UNION ALL ".join(
        f"""SELECT event_id + {i * 100_000_000} AS event_id, ts,
               user_id + {i * 1_000_000} AS user_id,
               event_type, value, props
           FROM read_parquet('{base}/events.parquet')"""
        for i in range(n)
    )
    con.sql(f"COPY ({ev}) TO '{out}/events.parquet' (FORMAT PARQUET)")

    # Other relational tables aren't scaled; leave them absent so a
    # mistaken dependency fails loudly instead of measuring 1x data.
    # orders IS scaled (r15: the distributed-ntile RFM query reads it).
    _ensure_orders(base, out, n)
    with open(marker, "w"):
        pass
    return out


def _ensure_orders(base: str, out: str, n: int) -> None:
    """Scaled orders copy (r15): per-copy key offsets multiply the
    customer dimension n-fold — exactly what the distributed-ntile
    rewrite of customer_rfm_segments must absorb. Separate marker so
    dirs built by earlier rounds gain the table without a rebuild."""
    import duckdb

    omark = os.path.join(out, ".orders")
    if os.path.exists(omark):
        return
    con = duckdb.connect()
    orders = " UNION ALL ".join(
        f"""SELECT * REPLACE (o_orderkey + {i * 100_000_000} AS o_orderkey,
                              o_custkey + {i * 10_000_000} AS o_custkey)
           FROM read_parquet('{base}/orders.parquet')"""
        for i in range(n)
    )
    con.sql(f"COPY ({orders}) TO '{out}/orders.parquet' (FORMAT PARQUET)")
    with open(omark, "w"):
        pass


def run_queries(dirs: dict[int, str]) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.registry import QUERIES as REG
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark
    # plans/__init__.py is intentionally empty — import the concrete plan
    # modules (the way __spark_entry__.py does) so @query decorators run
    # and the registry is populated; a bare `import ...plans` registers
    # nothing and REG[q] would raise KeyError.
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import (  # noqa: F401
        analytics,
        llmops,
        logsim,
        relational,
        relational_tpch,
    )
    queries = QUERIES
    only = os.environ.get("SCALE_STRESS_ONLY", "")
    if only:
        queries = [q for q in QUERIES if q in only.split(",")]
    missing = [q for q in queries if q not in REG and q not in PSEUDO]
    if missing:
        raise SystemExit(f"registry missing queries: {missing}")

    spark = get_spark("scale_stress")
    results: dict[str, dict] = {q: {} for q in queries}
    for scale, d in sorted(dirs.items()):
        for q in queries:
            fn = PSEUDO[q](REG) if q in PSEUDO else REG[q]
            t_warm = time.time()
            fn(spark, d).count()  # warmup: builds caches/stores/indexes
            warm = time.time() - t_warm
            times = []
            for _ in range(2):
                t0 = time.time()
                n_rows = fn(spark, d).count()
                times.append(time.time() - t0)
            results[q][scale] = {
                "warmup_s": round(warm, 2),
                "min_s": round(min(times), 2),
                "runs": [round(t, 2) for t in times],
                "rows": n_rows,
            }
            print(f"x{scale} {q:28s} warm={warm:6.1f}s "
                  f"min={min(times):6.2f}s rows={n_rows}", flush=True)
    import math

    scales = sorted(dirs)
    if len(scales) >= 2:
        s1, s2 = scales[0], scales[-1]
        for q in queries:
            t1 = results[q][s1]["min_s"]
            t2 = results[q][s2]["min_s"]
            results[q]["exponent"] = round(
                math.log(max(t2, 1e-9) / max(t1, 1e-9)) / math.log(s2 / s1), 3
            )
    results["_host_load"] = list(os.getloadavg())
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
            dirs[s] = build_scaled(base, s)
            print(f"built x{s}: {dirs[s]}", flush=True)
        else:
            dirs[s] = os.path.join(
                OUT_ROOT, f"{os.path.basename(os.path.normpath(base))}-x{s}"
            )
    if cmd in ("run", "all"):
        res = run_queries(dirs)
        out = os.path.join(
            OUT_ROOT,
            os.environ.get("SCALE_STRESS_OUT", "scale_stress.json"),
        )
        # merge into any existing record so a SCALE_STRESS_ONLY partial
        # run refreshes its queries without clobbering the rest
        merged = {}
        if os.path.exists(out):
            with open(out) as f:
                merged = json.load(f)
        merged.update(res)
        with open(out, "w") as f:
            json.dump(merged, f, indent=1)
        print(json.dumps({
            q: v.get("exponent") for q, v in res.items() if isinstance(v, dict)
        }))
        print(f"written {out}")


if __name__ == "__main__":
    main()

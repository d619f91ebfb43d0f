"""Round-14 asks: the self-feeding dot cost rule and the de-collected
index caches.

- The r13 verdict's #2: no declared query passed ``est_rows``, so the
  cost rule's unrolled branch was dead code in the shipped surface.
  The estimate now derives INSIDE the operators
  (ivf_exact._derive_est_scored_rows: |queries| * |corpus| * nprobe /
  n_clusters from checkpointed counts or parquet footers), so the
  strategy flips at deployment scale with no caller hint. These tests
  pin that the derived estimate actually REACHES dot_cols — the
  strategy log's reason string distinguishes a derived-but-small
  estimate ("est_rows below crossover") from a missing one ("no row
  estimate"), so a regression that stops deriving is caught even when
  both land on the fold.
- The r13 verdict's #1: the O(corpus) driver-side collects are gone —
  embedding_ann_ivf_768 runs the persisted cluster-partitioned index
  and the PQ fit cache stores its corpus-sized code table as parquet,
  never a driver list. Guarded here by a source-level scan of the fit
  cache (no .collect() on a corpus-sized frame in its body).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators import (
    ivf_exact,
    similarity,
)


def _mk_vectors(spark, n, dim, start=0):
    return spark.createDataFrame(
        [
            (start + i, [math.sin(start + i + d) for d in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )


def _reasons_for(strategy):
    return {
        why for s, _dim, why in similarity._logged_strategies if s == strategy
    }


def test_derive_est_scored_rows_arithmetic(spark):
    cn = _mk_vectors(spark, 40, 4).localCheckpoint(eager=True)
    qn = _mk_vectors(spark, 5, 4, start=100).localCheckpoint(eager=True)
    assert ivf_exact._derive_est_scored_rows(cn, qn, 3, 8) == int(
        5 * 40 * 3 / 8
    )
    # persisted-index form: corpus_rows from footers, no corpus pass
    assert ivf_exact._derive_est_scored_rows(
        None, qn, 2, 4, corpus_rows=1000
    ) == int(5 * 1000 * 2 / 4)
    # unusable inputs degrade to None (the fold default), never raise
    assert ivf_exact._derive_est_scored_rows(None, qn, 2, 4) is None


def test_parquet_num_rows_reads_footers_only(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    _mk_vectors(spark, 123, 4).write.parquet(p)
    assert ivf_exact._parquet_num_rows(p) == 123
    assert ivf_exact._parquet_num_rows(str(tmp_path / "missing")) is None


def test_one_shot_ivf_derives_estimate_and_flips_strategy(
    spark, monkeypatch
):
    # dim 8 keeps the unrolled form legal; the corpus is tiny, so the
    # flip is driven by monkeypatching the crossover around the DERIVED
    # estimate (40 * 5 * 2 / 4 = 100 scored rows)
    monkeypatch.delenv("SPARK_GRAFT_DOT_UNROLL", raising=False)
    corpus = _mk_vectors(spark, 40, 8)
    queries = _mk_vectors(spark, 5, 8, start=100)

    def run():
        return ivf_exact.ann_topk_ivf_exact(
            corpus=corpus, queries=queries, k=3, n_clusters=4, nprobe=2,
            iters=1, dim=8,
        ).collect()

    monkeypatch.setattr(similarity, "DOT_UNROLL_CROSSOVER_ROWS", 10)
    similarity._logged_strategies.clear()
    lo = run()
    assert "est_rows >= crossover" in _reasons_for("unrolled")

    monkeypatch.setattr(similarity, "DOT_UNROLL_CROSSOVER_ROWS", 10**9)
    similarity._logged_strategies.clear()
    hi = run()
    # the estimate was DERIVED and reached the scoring stage (the
    # "below crossover" reason only fires with a non-None estimate;
    # other stages — probe ranking, the fit — pass none by design,
    # so "no row estimate" may ALSO appear and is fine)
    assert "est_rows below crossover" in _reasons_for("hof-fold")

    # and the strategy never moves a value
    assert sorted(map(tuple, lo)) == sorted(map(tuple, hi))


def test_persisted_ivf_index_derives_estimate_from_footers(
    spark, tmp_path, monkeypatch
):
    # r15: the probe-scoring stage runs the Arrow numpy fold kernel
    # (fold_dot_frame) — the derived footer estimate now feeds the
    # DECISION RECORD for that kernel rather than a dot_cols branch,
    # and SPARK_GRAFT_FOLD_KERNEL=sql flips the scoring back to the
    # SQL-expression form for the bit-equality pin.
    monkeypatch.delenv("SPARK_GRAFT_DOT_UNROLL", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_FOLD_KERNEL", raising=False)
    corpus = _mk_vectors(spark, 40, 8)
    queries = _mk_vectors(spark, 5, 8, start=100)
    path = str(tmp_path / "ivf")
    ivf_exact.build_ivf_index_exact(
        corpus, path, n_clusters=4, iters=1, dim=8
    )

    similarity.drain_dot_decisions()
    similarity._logged_strategies.clear()
    lo = ivf_exact.query_ivf_index_exact(
        spark, path, queries, k=3, nprobe=2, dim=8
    ).collect()
    # the footer-derived estimate (5 queries * 40 corpus rows * 2/4
    # probes = 50) reached the scoring kernel's decision record
    recs = [
        d for d in similarity.drain_dot_decisions()
        if d["strategy"] == "numpy-fold"
    ]
    assert recs and recs[0]["est_rows"] == int(5 * 40 * 2 / 4)

    monkeypatch.setenv("SPARK_GRAFT_FOLD_KERNEL", "sql")
    similarity._logged_strategies.clear()
    hi = ivf_exact.query_ivf_index_exact(
        spark, path, queries, k=3, nprobe=2, dim=8
    ).collect()
    assert "SPARK_GRAFT_FOLD_KERNEL=sql" in _reasons_for("sql-fold-scoring")
    assert sorted(map(tuple, lo)) == sorted(map(tuple, hi))
    monkeypatch.delenv("SPARK_GRAFT_FOLD_KERNEL", raising=False)

    # the one-shot path and the persisted index agree exactly
    similarity._logged_strategies.clear()
    one_shot = ivf_exact.ann_topk_ivf_exact(
        corpus=corpus, queries=queries, k=3, n_clusters=4, nprobe=2,
        iters=1, dim=8,
    ).collect()
    assert sorted(map(tuple, one_shot)) == sorted(map(tuple, hi))


def test_fit_cache_never_collects_corpus_sized_frames():
    # the r13 verdict's #1: _ivf768_fit_cached collected the full
    # corpus assignment to the driver. It is deleted; the surviving
    # fit cache may collect only driver-sized fits (centroids,
    # codebooks) — its code table round-trips through parquet
    import inspect

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import llmops

    assert not hasattr(llmops, "_ivf768_fit_cached")
    src = inspect.getsource(llmops._ivf_fit_cached)
    assert ".collect()" not in src
    assert "write" in src and "parquet" in src


def test_pq_fit_cache_codes_roundtrip_parquet(spark, tmp_path, monkeypatch):
    # the parquet-cached code table must be byte-for-byte the encode
    # output (same rows, same schema) and served as a SCAN
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _ivf_fit_cached,
    )

    # artifact_root reads the env at call time — no reload needed
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    centers, books, codes = _ivf_fit_cached(
        spark, sf_dir, corpus, want_books=True, want_codes=True
    )
    direct = ivf_exact.encode_codes_arrays(  # r16: array code layout
        ivf_exact._unit(corpus, "vec_id", "embedding", "neighbor_id",
                        materialize=True),
        centers,
        books,
        m=16,  # r15: the cache defaults follow the shipped m16x64 point
    )
    assert sorted(codes.columns) == sorted(direct.columns)

    def _rows(df):
        return sorted(
            (r["neighbor_id"], tuple(r["_ts"]), r["_cl"])
            for r in df.collect()
        )

    got = _rows(codes.select(*direct.columns))
    want = _rows(direct)
    assert got == want
    # second call serves the cached parquet (no re-encode): same rows
    _, _, codes2 = _ivf_fit_cached(
        spark, sf_dir, corpus, want_books=True, want_codes=True
    )
    assert _rows(codes2.select(*direct.columns)) == want


def test_tightened_recall_floors_catch_midband_regression(spark):
    # verdict #7: floors at measured-minus-margin. A planted regression
    # with mean recall 0.5 (between the old blanket 0.45 and the new
    # per-query IVF floor 0.5503) must now flip recall_ok — under the
    # r13 floor it sailed through
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.operators.similarity import (
        with_recall_at_k,
    )
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _IVF_FLOOR,
        _IVFPQ_FLOOR,
        _KNN_GRAPH_FLOOR,
        _LSH_FLOOR,
    )

    k = 2
    exact = spark.createDataFrame(
        [(q, n) for q in range(10) for n in (100 + q, 200 + q)],
        "query_id long, neighbor_id long",
    )
    # planted ANN: hits exactly one of the two exact neighbors per
    # query -> mean recall 0.5
    ann = spark.createDataFrame(
        [(q, 100 + q, 0.9, 1) for q in range(10)],
        "query_id long, neighbor_id long, cosine double, rnk int",
    )
    degraded = with_recall_at_k(ann, exact, k=k,
                                min_mean_recall=_IVF_FLOOR).collect()
    assert all(r["recall_ok"] is False for r in degraded)
    # the old blanket floor would NOT have flipped
    old = with_recall_at_k(ann, exact, k=k,
                           min_mean_recall=0.45).collect()
    assert all(r["recall_ok"] is True for r in old)
    # floors are ordered by what each family actually delivers (r15:
    # the dim-64 PQ queries moved from the saturating m4x16 point
    # (~0.26 recall, floor 0.2003) to the curve-recommended m16x64
    # (measured 0.74/0.80), so IVF-PQ's floor now TOPS the ordering —
    # ADC + exact refine at the right code budget beats plain IVF)
    assert _LSH_FLOOR < _IVF_FLOOR < _KNN_GRAPH_FLOOR < _IVFPQ_FLOOR


def test_materialize_dir_sweeps_superseded_names(spark, tmp_path, monkeypatch):
    # review r14: renaming a cache key (hyperparams folded into the
    # name) must not orphan the old-name dirs forever
    import os

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import (
        synthcache,
    )

    monkeypatch.setattr(synthcache, "CACHE_ROOT", str(tmp_path))
    sf_dir = "/root/testdata/sf0.001"
    fp = synthcache.source_fingerprint(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    old = tmp_path / f"sf0.001-{fp}-ivfpqx768"
    old.mkdir()
    (old / "_SUCCESS").touch()
    unrelated = tmp_path / f"sf0.001-{fp}-emb768"
    unrelated.mkdir()
    (unrelated / "_SUCCESS").touch()

    def writer(df, p):
        os.makedirs(p, exist_ok=True)
        open(os.path.join(p, "_SUCCESS"), "w").close()

    path = synthcache.materialize_dir(
        spark, sf_dir, "ivfpqx768-c8m16n64i2p1",
        builder=lambda: None, source="embeddings.parquet",
        writer=writer, supersedes=("ivfpqx768",),
    )
    assert not old.exists()          # retired name swept
    assert unrelated.exists()        # other families untouched
    assert os.path.exists(os.path.join(path, "_SUCCESS"))

    # WARM-hit sweep (review r14): machines where the renamed key was
    # built BEFORE supersedes existed never see a cache miss — the
    # retired-name sweep must fire on hits too (safe: no current code
    # constructs retired-name paths, so there is no reader to race)
    old.mkdir()
    (old / "_SUCCESS").touch()
    path2 = synthcache.materialize_dir(
        spark, sf_dir, "ivfpqx768-c8m16n64i2p1",
        builder=lambda: None, source="embeddings.parquet",
        writer=writer, supersedes=("ivfpqx768",),
    )
    assert path2 == path
    assert not old.exists()


def test_ivf_fit_cache_gc_sweeps_stale_fingerprints(
    spark, tmp_path, monkeypatch
):
    # review r14: the codes parquet sidecar made the ivf_fit root hold
    # corpus-sized artifacts — superseded fingerprints, retired
    # -codes.json files and hour-stale .build dirs must be swept
    import os
    import time

    from pyspark.sql import functions as F

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _ivf_fit_cached,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    root = tmp_path / "spark_graft_ivf_fit"
    root.mkdir()
    stale_fp = "0" * 16
    stale_json = root / f"sf0.001-{stale_fp}-c10plus-c16i3-pq4x16i2.json"
    stale_json.write_text("{}")
    stale_codes = (
        root / f"sf0.001-{stale_fp}-c10plus-c16i3-pq4x16i2-codes.parquet"
    )
    stale_codes.mkdir()
    retired = root / f"sf0.001-{stale_fp}-c10plus-c16i3-pq4x16i2-codes.json"
    retired.write_text("{}")
    crashed = root / "whatever.build.1234"
    crashed.mkdir()
    os.utime(crashed, (time.time() - 7200, time.time() - 7200))
    other_family = root / f"sf0.001-{stale_fp}-emb768-c8i2d768.json"
    other_family.write_text("{}")

    sf_dir = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    corpus = emb.filter(F.col("vec_id") >= 10)
    centers, books, codes = _ivf_fit_cached(
        spark, sf_dir, corpus, want_books=True, want_codes=True
    )
    assert codes.count() > 0
    assert not stale_json.exists()
    assert not stale_codes.exists()
    assert not retired.exists()
    assert not crashed.exists()
    assert other_family.exists()  # different params/family untouched
    # the live key's files survived the sweep (r16: the live codes
    # sidecar is the array-layout -codesv2.parquet)
    live = [e for e in os.listdir(root) if e.endswith(".json")
            or e.endswith("-codesv2.parquet")]
    assert len(live) == 3  # live json + live codes dir + other_family

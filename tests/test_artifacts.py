"""Round-12: engine-wide artifact root (r11 verdict #7) — every cache
(fit cache, synth corpora, sigstore, txlog/sink demo tables) hangs off
SPARK_GRAFT_ARTIFACT_DIR instead of hardcoded /tmp paths."""

from __future__ import annotations

import os

from cloudwatch_sematext_aws_lambda_log_shipper_spark.artifacts import artifact_root


def test_artifact_root_default_and_override(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ARTIFACT_DIR", raising=False)
    assert artifact_root("ivf_fit") == "/tmp/spark_graft_ivf_fit"
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", "/data/scratch")
    assert artifact_root("ivf_fit") == "/data/scratch/spark_graft_ivf_fit"
    assert artifact_root("synth") == "/data/scratch/spark_graft_synth"


def test_fit_cache_respects_artifact_dir(spark, sf_dir, monkeypatch, tmp_path):
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.llmops import (
        _emb,
        _ivf_fit_cached,
    )

    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_DIR", str(tmp_path))
    emb = _emb(spark, sf_dir)
    corpus = emb.filter("vec_id >= 10")
    centers, _ = _ivf_fit_cached(
        spark, sf_dir, corpus, want_books=False, n_clusters=4
    )
    root = os.path.join(str(tmp_path), "spark_graft_ivf_fit")
    files = os.listdir(root)
    assert files and all(f.endswith(".json") for f in files)
    assert len(centers) == 4
    # second call hits the relocated cache (same result, no refit)
    centers2, _ = _ivf_fit_cached(
        spark, sf_dir, corpus, want_books=False, n_clusters=4
    )
    assert centers2 == centers

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


def test_sweep_judges_staleness_on_newest_inner_file(tmp_path, monkeypatch):
    """r14 ADVICE: Spark writes part files under _temporary subdirs, so
    a long legitimate build's TOP-dir mtime stops moving early — the
    sweep must stat the newest file inside before declaring a build
    abandoned, and the horizon must be env-overridable."""
    import time

    from cloudwatch_sematext_aws_lambda_log_shipper_spark.artifacts import (
        sweep_stale_entries,
    )

    root = tmp_path / "fam"
    old = time.time() - 7200  # 2h ago: past the 1h default horizon

    # live long build: top dir old, but a part file written recently
    live_build = root / "abc.build.1"
    (live_build / "_temporary").mkdir(parents=True)
    fresh = live_build / "_temporary" / "part-0"
    fresh.write_text("x")
    os.utime(live_build, (old, old))
    os.utime(live_build / "_temporary", (old, old))

    # genuinely abandoned build: everything old
    dead_build = root / "def.build.2"
    (dead_build / "_temporary").mkdir(parents=True)
    stale = dead_build / "_temporary" / "part-0"
    stale.write_text("y")
    for p in (stale, dead_build / "_temporary", dead_build):
        os.utime(p, (old, old))

    sweep_stale_entries(str(root), live=set(), superseded=lambda e: False)
    assert live_build.exists(), "live build swept out from under a session"
    assert not dead_build.exists(), "abandoned build survived"

    # env override: a 3h horizon keeps even the all-old build
    dead2 = root / "ghi.build.3"
    dead2.mkdir()
    os.utime(dead2, (old, old))
    monkeypatch.setenv("SPARK_GRAFT_STALE_BUILD_S", "10800")
    sweep_stale_entries(str(root), live=set(), superseded=lambda e: False)
    assert dead2.exists()

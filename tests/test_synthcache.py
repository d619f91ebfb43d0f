"""Build-once synthesized-corpus cache (plans/synthcache.py):
build-on-miss, hit-without-rebuild, fingerprint invalidation, GC of
superseded entries, and the no-expression-inlining property the cache
exists for (log_top_errors' plan carried 122 copies of the synthesis
CASE pre-cache — past janino's 64 KB codegen method limit)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import synthcache
from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans.synthcache import (
    materialize,
    source_fingerprint,
)


def _mk_source(tmp_path, name="events.parquet", stamp=1_700_000_000):
    src = tmp_path / name
    src.write_bytes(b"not really parquet, fingerprint only")
    os.utime(src, ns=(stamp * 10**9, stamp * 10**9))
    return src


def test_build_once_then_hit(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(synthcache, "CACHE_ROOT", str(tmp_path / "cache"))
    _mk_source(tmp_path)
    calls = []

    def builder():
        calls.append(1)
        return spark.range(10).select(F.col("id").alias("v"))

    out1 = materialize(spark, str(tmp_path), "t", builder)
    out2 = materialize(spark, str(tmp_path), "t", builder)
    assert len(calls) == 1, "second call must hit the cache, not rebuild"
    assert sorted(r.v for r in out1.collect()) == list(range(10))
    assert sorted(r.v for r in out2.collect()) == list(range(10))


def test_fingerprint_invalidation_and_gc(spark, tmp_path, monkeypatch):
    cache_root = tmp_path / "cache"
    monkeypatch.setattr(synthcache, "CACHE_ROOT", str(cache_root))
    _mk_source(tmp_path, stamp=1_700_000_000)
    calls = []

    def builder():
        calls.append(1)
        return spark.range(3).select(F.col("id").alias("v"))

    materialize(spark, str(tmp_path), "t", builder)
    assert len(calls) == 1
    # regenerate the source (mtime moves) -> new fingerprint -> rebuild,
    # and the superseded cache entry for the SAME (sf, name) is GC'd
    _mk_source(tmp_path, stamp=1_700_000_999)
    materialize(spark, str(tmp_path), "t", builder)
    assert len(calls) == 2
    entries = [e for e in os.listdir(cache_root) if e.endswith("-t")]
    assert len(entries) == 1, f"superseded entry not GC'd: {entries}"


def test_gc_spares_other_names(spark, tmp_path, monkeypatch):
    cache_root = tmp_path / "cache"
    monkeypatch.setattr(synthcache, "CACHE_ROOT", str(cache_root))
    _mk_source(tmp_path)

    def builder():
        return spark.range(2).select(F.col("id").alias("v"))

    materialize(spark, str(tmp_path), "a", builder)
    materialize(spark, str(tmp_path), "b", builder)
    names = sorted(e.rsplit("-", 1)[1] for e in os.listdir(cache_root))
    assert names == ["a", "b"]


def test_fingerprint_is_metadata_only(tmp_path):
    src = _mk_source(tmp_path)
    fp1 = source_fingerprint(str(src))
    # same size + mtime, different bytes -> same fingerprint (by design:
    # metadata-only, no data scan)
    src.write_bytes(b"other bytes, same length, fingerprnt")
    os.utime(src, ns=(1_700_000_000 * 10**9, 1_700_000_000 * 10**9))
    assert source_fingerprint(str(src)) == fp1
    assert source_fingerprint(str(tmp_path / "missing")) != fp1


def test_synth_plans_do_not_inline_synthesis(spark, sf_dir):
    """The property the cache exists for: every log query's physical
    plan references the STORED corpus, never the synthesis CASE."""
    from cloudwatch_sematext_aws_lambda_log_shipper_spark.plans import logsim

    for q in (logsim.log_top_errors, logsim.log_parse_severity):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "plain text for" not in plan, "synthesis expression inlined"
        assert len(plan) < 64_000, f"plan bloat: {len(plan)} chars"

"""Per-job wall-time breakdown for ONE query via the Spark event log.

Runs the named query bench-style (plan-warm sf0.001, store-warm at the
target sf, one timed run) in a session with spark.eventLog enabled,
then parses the event log into a per-job table: job id, description,
wall seconds, n tasks, shuffle read/write bytes, input bytes.

Jobs fired during DataFrame CONSTRUCTION (collects inside the query
function) appear before the final count job — the table covers them
all, which is the point: fixed job overhead is invisible in explain().

Usage: python scripts/opt_joblog.py <query> [more queries...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from cloudwatch_sematext_aws_lambda_log_shipper_spark.config import (
    DEFAULT_CONFIG, EngineConfig,
)
from cloudwatch_sematext_aws_lambda_log_shipper_spark.session import get_spark


def _eventlog_lines(path: str):
    """Yield event-log lines. Spark 4 rolling logs are a DIRECTORY
    (eventlog_v2_<app>/events_N_...); single-file logs still work."""
    def _open(p):
        # rolling logs may be codec-compressed (suffix or zstd magic)
        with open(p, "rb") as fb:
            head = fb.read(4)
        if p.endswith(".zstd") or head[:4] == b"\x28\xb5\x2f\xfd":
            import io
            import subprocess

            out = subprocess.run(
                ["zstd", "-dc", p], capture_output=True, check=True
            ).stdout
            return io.TextIOWrapper(io.BytesIO(out))
        return open(p)

    if os.path.isdir(path):
        parts = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
        for p in parts:
            with _open(p) as f:
                yield from f
    else:
        with _open(path) as f:
            yield from f


def parse_eventlog(path: str) -> list[dict]:
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    if True:
        for line in _eventlog_lines(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "job": jid,
                    "desc": (
                        (ev.get("Properties") or {}).get(
                            "spark.job.description", ""
                        )
                        or (ev.get("Properties") or {}).get(
                            "callSite.short", ""
                        )
                    )[:90],
                    "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "n_tasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }
                stage_metrics[si["Stage ID"]] = {
                    "shuf_r": acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)
                    or 0,
                    "shuf_w": acc.get("internal.metrics.shuffle.write.bytesWritten", 0)
                    or 0,
                    "input": acc.get("internal.metrics.input.bytesRead", 0) or 0,
                }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        if "t1" not in j:
            continue
        sm = [stage_metrics.get(s, {}) for s in j["stages"]]
        out.append(
            {
                "job": jid,
                "sec": round((j["t1"] - j["t0"]) / 1000.0, 3),
                "tasks": j["n_tasks"],
                "shuf_w_mb": round(
                    sum(int(x.get("shuf_w") or 0) for x in sm) / 1e6, 2
                ),
                "input_mb": round(
                    sum(int(x.get("input") or 0) for x in sm) / 1e6, 2
                ),
                "desc": j["desc"],
            }
        )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    logdir = tempfile.mkdtemp(prefix="opt_evlog_")
    cfg = EngineConfig(
        extra_spark_conf={
            **DEFAULT_CONFIG.extra_spark_conf,
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": logdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        }
    )
    spark = get_spark("opt-joblog", config=cfg)
    qs = entrymod.queries()
    try:
        warm_dir = "/root/testdata/sf0.001"
        if not os.path.isdir(warm_dir):
            warm_dir = sf_dir
        for q in names:
            qs[q](spark, warm_dir).count()
            spark.catalog.clearCache()
        for q in names:
            qs[q](spark, sf_dir).count()
            spark.catalog.clearCache()

        marks = {}
        for q in names:
            sc = spark.sparkContext
            sc.setJobDescription(f"==MARK=={q}")
            sc.parallelize([0], 1).count()  # marker job
            sc.setJobDescription(None)
            t0 = time.time()
            qs[q](spark, sf_dir).count()
            marks[q] = round(time.time() - t0, 3)
            spark.catalog.clearCache()

        app_id = spark.sparkContext.applicationId
        spark.stop()
        evfile = os.path.join(logdir, app_id)
        if not os.path.exists(evfile):
            cands = [os.path.join(logdir, f) for f in os.listdir(logdir)]
            evfile = max(cands, key=os.path.getmtime)
        rows = parse_eventlog(evfile)
        # split on marker jobs
        cur = None
        for r in rows:
            if r["desc"].startswith("==MARK=="):
                cur = r["desc"][len("==MARK=="):]
                print(f"\n=== {cur}  (wall {marks.get(cur)}s) ===")
                continue
            if cur is not None:
                print(
                    f"  job {r['job']:>4}  {r['sec']:7.3f}s  tasks={r['tasks']:>4}"
                    f"  shufW={r['shuf_w_mb']:>8.2f}MB  in={r['input_mb']:>8.2f}MB"
                    f"  {r['desc']}"
                )
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()

"""Round-end artifact pipeline — run as the FINAL act of a round.

The r11 and r12 verdicts both flagged the same process defect: the
wait-for-quiet bench and the full oracle sweep ran, but their outputs
(`BENCH_r{N}.json`, `CORRECTNESS_r{N}.json`, `BENCH_FULL.json`,
`ORACLE_SWEEP_r{N}.json`) sat untracked in the worktree at judge time.
This script makes the whole tail atomic:

  1. strict full-surface oracle sweep (check_oracle.py, ORACLE_STRICT=1)
     -> ORACLE_SWEEP_r{N}.json
  2. wait-for-quiet bench (bench.py) -> BENCH_FULL.json, and the
     stdout summary line -> BENCH_r{N}.json
  3. git add + commit of exactly those artifacts.

Usage: python scripts/round_end.py <round_number>
Env:   SPARK_GRAFT_SF_DIR (bench scale, default /root/testdata/sf0.1)
       SPARK_GRAFT_SWEEP_SF (sweep scale, default /root/testdata/sf0.01)

The driver also writes its own BENCH_r{N}.json / CORRECTNESS_r{N}.json
after the round; this script's bench record uses the same bench.py
contract, so whichever lands later is the same format. The commit is
ONLY of round artifacts — it refuses to run with unstaged source
changes so it can never sweep half-finished work into the record.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args: list[str], **kw) -> subprocess.CompletedProcess:
    print("round_end: $ " + " ".join(args), file=sys.stderr)
    return subprocess.run(args, cwd=HERE, **kw)


def main() -> None:
    if len(sys.argv) < 2 or not sys.argv[1].isdigit():
        sys.exit("usage: python scripts/round_end.py <round_number>")
    rnd = int(sys.argv[1])

    dirty = sh(
        ["git", "diff", "--name-only", "HEAD", "--",
         "*.py", "cloudwatch_sematext_aws_lambda_log_shipper_spark",
         "tests", "scripts"],
        capture_output=True, text=True,
    ).stdout.strip()
    # `git diff HEAD` misses brand-new files (ADVICE r13): untracked
    # source would let recorded artifacts reflect code in no commit
    untracked = sh(
        ["git", "ls-files", "--others", "--exclude-standard", "--",
         "*.py", "cloudwatch_sematext_aws_lambda_log_shipper_spark",
         "tests", "scripts"],
        capture_output=True, text=True,
    ).stdout.strip()
    dirty = "\n".join(x for x in (dirty, untracked) if x)
    if dirty:
        sys.exit(
            "round_end: refusing to run with uncommitted source changes:\n"
            + dirty
        )

    sweep_sf = os.environ.get(
        "SPARK_GRAFT_SWEEP_SF", "/root/testdata/sf0.01"
    )
    sweep_out = os.path.join(HERE, f"ORACLE_SWEEP_r{rnd}.json")
    env = dict(os.environ, ORACLE_STRICT="1", ORACLE_SWEEP_OUT=sweep_out)
    r = sh(
        [sys.executable, os.path.join(HERE, "scripts", "check_oracle.py"),
         sweep_sf],
        env=env,
    )
    if r.returncode != 0:
        sys.exit(f"round_end: oracle sweep FAILED (rc={r.returncode}) — "
                 "fix before recording the round")

    # The bench starts right after the 25-minute sweep process exits,
    # when the 1-min load average is still decaying from ~10 — the
    # default 4.0 quiet gate passes too early and contaminates the
    # official record (r14: 197.4 s recorded at gate-passing load 3.1
    # vs 187.5 s re-recorded under a 1.2 gate; streaming 3.7k vs 7.3k
    # rec/s). Round-end benches always follow the sweep, so they get a
    # strict gate unless the caller overrides.
    bench_env = dict(os.environ)
    bench_env.setdefault("SPARK_GRAFT_BENCH_LOAD_MAX", "1.2")
    bench = sh(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True, text=True, env=bench_env,
    )
    sys.stderr.write(bench.stderr[-4000:])
    if bench.returncode != 0:
        sys.exit(f"round_end: bench FAILED (rc={bench.returncode}) — "
                 "fix before recording the round")
    line = bench.stdout.strip().splitlines()[-1] if bench.stdout.strip() else ""
    try:
        record = json.loads(line)
    except (json.JSONDecodeError, ValueError):
        sys.exit(f"round_end: bench produced no parseable record: {line!r}")
    # a query that crashed anywhere (warmup/store-warm/timed) lands as
    # -1.0 in the full record — refuse to enshrine a partial bench as
    # the round's official number (r13 review finding)
    try:
        with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
            full = json.load(f)
        broken = sorted(
            q for q, t in full.get("queries", {}).items() if t < 0
        )
    except (OSError, json.JSONDecodeError) as exc:
        sys.exit(f"round_end: cannot read BENCH_FULL.json: {exc}")
    if broken:
        sys.exit(f"round_end: bench had FAILED queries {broken} — "
                 "fix before recording the round")
    bench_out = os.path.join(HERE, f"BENCH_r{rnd}.json")
    with open(bench_out, "w") as f:
        json.dump(record, f, separators=(",", ":"))
        f.write("\n")

    artifacts = [
        os.path.basename(p)
        for p in (sweep_out, bench_out, os.path.join(HERE, "BENCH_FULL.json"))
        if os.path.exists(p)
    ]
    corr = f"CORRECTNESS_r{rnd}.json"
    if os.path.exists(os.path.join(HERE, corr)):
        artifacts.append(corr)
    sh(["git", "add", "--"] + artifacts)
    msg = (
        f"Round-end artifacts r{rnd}: quiet bench "
        f"{record.get('value')}s/{record.get('n_queries')} queries "
        f"(cache {record.get('cache_state', '?')}), full oracle sweep"
    )
    c = sh(["git", "commit", "-m", msg, "--"] + artifacts)
    if c.returncode != 0:
        sys.exit("round_end: git commit failed")
    print(json.dumps({"round": rnd, "artifacts": artifacts,
                      "bench_total": record.get("value")}))


if __name__ == "__main__":
    main()

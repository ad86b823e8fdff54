"""Root-cause probe for the sf1 CC clique-stress bimodality (round-7
verdict item 3: 13-56 s across sessions on identical code+data —
the signature of an AQE plan flip, a skewed straggler, or GC).

Runs ``dedup_groups_cc`` once per FRESH subprocess session (the
bimodality was observed across sessions, so boot state is part of the
hypothesis space), with the Spark event log enabled and a job
description per CC round. After the runs, parses each event log and
prints a per-session digest:

- wall time, per-job wall times keyed by job description;
- per-stage executorRunTime / jvmGcTime totals and max-task skew
  (max task runtime / median task runtime per stage);
- AQE shape evidence: number of stages and tasks per job (a coalesce
  flip changes task counts; a skew-join split changes stage shape).

Usage:  python tools/probe_cc_bimodal.py [n_sessions] [query]
Writes one JSON line per session to /tmp/cc_probe/sessions.jsonl and
keeps the raw event logs in /tmp/cc_probe/eventlogs/.
"""

from __future__ import annotations

import glob
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_DIR = "/tmp/cc_probe"
EVENTLOG_DIR = os.path.join(PROBE_DIR, "eventlogs")
SESSIONS = os.path.join(PROBE_DIR, "sessions.jsonl")

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from auto_trade_data_pipeline_spark.corpus import load_all
from auto_trade_data_pipeline_spark.session import get_spark

conf = {{
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": {eventlog_dir!r},
}}
# Hypothesis-testing hook: e.g. -XX:ReservedCodeCacheSize=512m (the
# code-cache-exhaustion arm). Applied at JVM launch via the gateway.
opts = os.environ.get("SPARK_GRAFT_PROBE_JAVA_OPTS")
if opts:
    conf["spark.driver.extraJavaOptions"] = opts
spark = get_spark("cc_probe", extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")
reg = load_all()
t0 = time.perf_counter()
df = reg[{query!r}].fn(spark, {sf_dir!r})
df.write.mode("overwrite").format("noop").save()
dt = time.perf_counter() - t0
print(json.dumps({{"app_id": spark.sparkContext.applicationId, "sec": round(dt, 2)}}))
spark.stop()
"""


def run_sessions(n: int, query: str, sf_dir: str) -> list[dict]:
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    out = []
    for i in range(n):
        child = _CHILD.format(
            repo=REPO, eventlog_dir=EVENTLOG_DIR, query=query, sf_dir=sf_dir
        )
        r = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True, cwd=REPO
        )
        rec = None
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                rec = json.loads(line)
        # Keep the child's stderr — the JVM prints 'CodeCache is full.
        # Compiler has been disabled.' there, which is direct evidence
        # for the code-cache-exhaustion hypothesis.
        with open(os.path.join(PROBE_DIR, f"stderr_{i}.log"), "w") as f:
            f.write(r.stderr)
        if rec is None:
            print(f"session {i}: FAILED\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        rec["session"] = i
        rec["codecache_full"] = "CodeCache is full" in r.stderr
        print(
            f"session {i}: {rec['sec']} s  (app {rec['app_id']})"
            + ("  [CodeCache is full]" if rec["codecache_full"] else ""),
            file=sys.stderr,
        )
        out.append(rec)
        with open(SESSIONS, "a") as f:
            f.write(json.dumps(rec) + "\n")
    return out


def digest_eventlog(app_id: str) -> dict:
    """Stage/job digest from one session's event log."""
    # Exact-name match only: a substring match can digest the wrong
    # session when one app id is a prefix of another. Prefer the
    # completed log over a stale .inprogress duplicate of the same app.
    exact = {app_id, f"eventlog_v2_{app_id}"}
    candidates = [
        p
        for p in glob.glob(os.path.join(EVENTLOG_DIR, "*"))
        if os.path.basename(p) in exact
        or os.path.basename(p) in {n + ".inprogress" for n in exact}
    ]
    candidates.sort(key=lambda p: p.endswith(".inprogress"))  # completed first
    path = candidates[0] if candidates else None
    if path is None:
        return {"error": f"no event log for {app_id}"}
    # Spark 4 rolling event logs are a DIRECTORY of events_* files.
    files = (
        sorted(glob.glob(os.path.join(path, "events_*")))
        if os.path.isdir(path)
        else [path]
    )
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    task_times: dict[int, list[float]] = {}
    gc: dict[int, float] = {}
    run: dict[int, float] = {}
    def _events():
        for f in files:
            if f.endswith(".zstd"):
                # Spark 4 compresses rolling event-log segments.
                p = subprocess.Popen(
                    ["zstd", "-dc", f], stdout=subprocess.PIPE, text=True
                )
                yield from p.stdout
                p.wait()
            else:
                with open(f) as fh:
                    yield from fh

    for line in _events():
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            jobs[ev["Job ID"]] = {
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:80],
                "t0": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
            }
        elif e == "SparkListenerJobEnd":
            j = jobs.get(ev["Job ID"])
            if j:
                j["sec"] = round((ev["Completion Time"] - j.pop("t0")) / 1000, 2)
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            m = ev.get("Task Metrics") or {}
            task_times.setdefault(sid, []).append(m.get("Executor Run Time", 0))
            gc[sid] = gc.get(sid, 0) + m.get("JVM GC Time", 0)
            run[sid] = run.get(sid, 0) + m.get("Executor Run Time", 0)
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {"tasks": si["Number of Tasks"]}
    for sid, ts in task_times.items():
        med = statistics.median(ts) if ts else 0
        stages.setdefault(sid, {})["skew"] = (
            round(max(ts) / med, 1) if med > 0 else None
        )
        stages[sid]["run_s"] = round(run.get(sid, 0) / 1000, 2)
        stages[sid]["gc_s"] = round(gc.get(sid, 0) / 1000, 2)
    top = sorted(stages.items(), key=lambda kv: -kv[1].get("run_s", 0))[:8]
    slow_jobs = sorted(
        (j for j in jobs.values() if "sec" in j), key=lambda j: -j["sec"]
    )[:8]
    return {
        "n_jobs": len(jobs),
        "n_stages": len(stages),
        "total_gc_s": round(sum(gc.values()) / 1000, 2),
        "total_run_s": round(sum(run.values()) / 1000, 2),
        "slowest_jobs": slow_jobs,
        "hottest_stages": [
            {"stage": sid, **info} for sid, info in top
        ],
    }


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--digest"]
    n = int(argv[0]) if argv else 6
    query = argv[1] if len(argv) > 1 else "dedup_groups_cc"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".stress/sf1"))
    if "--digest" in sys.argv:
        # Re-analyze previously captured sessions without re-running.
        recs = [json.loads(ln) for ln in open(SESSIONS)]
    else:
        recs = run_sessions(n, query, sf_dir)
    if not recs:
        return 1
    recs.sort(key=lambda r: r["sec"])
    print(json.dumps([{ "session": r["session"], "sec": r["sec"]} for r in recs]))
    fast, slow = recs[0], recs[-1]
    for label, rec in (("FAST", fast), ("SLOW", slow)):
        print(f"\n=== {label}: session {rec['session']} {rec['sec']} s ===")
        print(json.dumps(digest_eventlog(rec["app_id"]), indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Attribute wall time per stage from an (uncompressed) Spark event log.

    python tools/analyze_eventlog.py <eventlog-file> <cores> [t_cut_ms]

Prints per-job and per-stage wall / task-time / cpu-time / GC /
shuffle-fetch-wait / python attribution, plus inter-stage driver gaps,
restricted to events at or after ``t_cut_ms`` (epoch millis; use it to
skip warmup jobs).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict

ACC = {
    "internal.metrics.executorRunTime": "run_ms",
    "internal.metrics.executorCpuTime": "cpu_ns",
    "internal.metrics.jvmGCTime": "gc_ms",
    "internal.metrics.shuffle.read.fetchWaitTime": "fetch_ms",
    "internal.metrics.shuffle.write.writeTime": "shwrite_ns",
    "internal.metrics.executorDeserializeTime": "deser_ms",
    "internal.metrics.resultSerializationTime": "rser_ms",
}


def main() -> None:
    evf, cores = sys.argv[1], int(sys.argv[2])
    t_cut = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    stages: dict[int, dict] = defaultdict(lambda: defaultdict(float))
    jobs: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    with open(evf) as f:
        for line in f:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerJobStart":
                jid = e["Job ID"]
                jobs[jid] = {"t0": e["Submission Time"], "stages": []}
                for si in e.get("Stage Infos", []):
                    stage_job[si["Stage ID"]] = jid
                    jobs[jid]["stages"].append(si["Stage ID"])
            elif ev == "SparkListenerJobEnd":
                if e["Job ID"] in jobs:
                    jobs[e["Job ID"]]["t1"] = e["Completion Time"]
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                s = stages[si["Stage ID"]]
                s["wall"] = (si["Completion Time"] - si["Submission Time"]) / 1e3
                s["sub"] = si["Submission Time"]
                s["tasks"] = si.get("Number of Tasks", 0)
                rdds = si.get("RDD Info", [])
                scopes = []
                for r in rdds:
                    sc = r.get("Scope")
                    if sc:
                        try:
                            scopes.append(json.loads(sc).get("name", ""))
                        except json.JSONDecodeError:
                            pass
                s["ops"] = ",".join(dict.fromkeys(scopes))[:80]
            elif ev == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                s = stages[sid]
                for a in (e.get("Task Info") or {}).get("Accumulables", []):
                    k = ACC.get(a.get("Name"))
                    if k:
                        s[k] += a.get("Update", 0)

    print(f"{'job':>4} {'wall':>8}  stages")
    for jid in sorted(jobs):
        j = jobs[jid]
        if j.get("t0", 0) < t_cut or "t1" not in j:
            continue
        print(f"{jid:>4} {(j['t1'] - j['t0']) / 1e3:8.2f}  {j['stages']}")

    rows = []
    for sid, s in stages.items():
        if "wall" not in s or s["sub"] < t_cut:
            continue
        idle = s["wall"] * cores - s["run_ms"] / 1e3
        rows.append((idle, sid, s))
    rows.sort(reverse=True)
    tot_wall = sum(s["wall"] for _, _, s in rows)
    tot_run = sum(s["run_ms"] for _, _, s in rows) / 1e3
    tot_cpu = sum(s["cpu_ns"] for _, _, s in rows) / 1e9
    tot_gc = sum(s["gc_ms"] for _, _, s in rows) / 1e3
    print(f"\nstages={len(rows)} wall={tot_wall:.1f}s run={tot_run:.1f}s "
          f"cpu={tot_cpu:.1f}s gc={tot_gc:.1f}s "
          f"(run-cpu gap {tot_run - tot_cpu:.1f}s = waiting in task)")
    print(f"{'sid':>4}{'job':>4} {'wall':>8} {'tasks':>6} {'util':>5} "
          f"{'run_s':>8} {'cpu_s':>8} {'gc':>5} {'fetch':>6}  ops")
    for idle, sid, s in rows[:30]:
        util = (s["run_ms"] / 1e3) / (s["wall"] * cores) if s["wall"] else 0
        print(f"{sid:>4}{stage_job.get(sid, -1):>4} {s['wall']:8.2f} "
              f"{int(s['tasks']):>6} {util:5.0%} {s['run_ms'] / 1e3:8.1f} "
              f"{s['cpu_ns'] / 1e9:8.1f} {s['gc_ms'] / 1e3:5.1f} "
              f"{s['fetch_ms'] / 1e3:6.1f}  {s.get('ops', '')}")

    iv = sorted((s["sub"] / 1e3, s["sub"] / 1e3 + s["wall"])
                for _, _, s in rows)
    if iv:
        merged = [list(iv[0])]
        for a, b in iv[1:]:
            if a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        cov = sum(b - a for a, b in merged)
        span = merged[-1][1] - merged[0][0]
        print(f"\nstage-covered {cov:.1f}s of {span:.1f}s span -> "
              f"{span - cov:.1f}s no-stage (driver) after t_cut")


if __name__ == "__main__":
    main()

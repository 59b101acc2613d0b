"""Profile the 8-core scaling config: where does the extra wall go?

Runs the identical scaling_job at N cores (taskset-pinned like
tools/run_scaling.py), while sampling aggregate CPU busy time of the
pinned cores from /proc/stat every 0.5 s, and with the Spark event log
enabled.  Afterwards prints:

  * a utilization timeline (busy-cores vs wall-clock, bucketed),
  * per-stage wall/task-time attribution parsed from the event log,
    sorted by "stage wall x idle cores" — the stages that pay the
    Amdahl bill at 4N cores.

Usage:
    python tools/profile_scaling.py [cores] [clips_parquet]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def read_busy(cores: list[int]) -> float:
    """Total busy jiffies summed over the given cores."""
    busy = 0.0
    with open("/proc/stat") as f:
        for line in f:
            if not line.startswith("cpu"):
                continue
            name = line.split()[0]
            if name == "cpu" or int(name[3:]) not in cores:
                continue
            vals = [float(x) for x in line.split()[1:]]
            # busy = total - idle - iowait
            busy += sum(vals) - vals[3] - vals[4]
    return busy


def main() -> None:
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    clips = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scaling_640000/clips.parquet"
    pinned = list(range(cores))
    workdir = "/tmp/profile_scaling"
    os.makedirs(workdir, exist_ok=True)
    evdir = os.path.join(workdir, "eventlog")
    import shutil
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    zip_path = os.path.join(workdir, "dataquality_spark.zip")
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from run_scaling import build_zip

    build_zip(zip_path)
    out_json = os.path.join(workdir, "result.json")

    samples: list[tuple[float, float]] = []
    stop = threading.Event()
    hz = os.sysconf("SC_CLK_TCK")

    def sampler() -> None:
        prev = read_busy(pinned)
        prev_t = time.time()
        while not stop.wait(0.5):
            cur = read_busy(pinned)
            cur_t = time.time()
            samples.append((cur_t, (cur - prev) / hz / (cur_t - prev_t)))
            prev, prev_t = cur, cur_t

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t_start = time.time()
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        SPARK_SUBMIT, "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", "spark.eventLog.compress=false",
        "--conf", "spark.eventLog.rolling.enabled=false",
        "--conf", f"spark.eventLog.dir=file://{evdir}",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        clips, str(cores), out_json,
    ]
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    subprocess.run(cmd, check=True, cwd=workdir, env=env)
    stop.set()
    th.join(timeout=2)

    with open(out_json) as f:
        print("RESULT:", f.read())

    # Utilization timeline bucketed to 5 s
    print(f"\n=== busy-cores timeline (pinned {cores} cores, 5 s buckets) ===")
    if samples:
        t0 = samples[0][0]
        buckets: dict[int, list[float]] = {}
        for ts, busy in samples:
            buckets.setdefault(int((ts - t0) // 5), []).append(busy)
        for b in sorted(buckets):
            vals = buckets[b]
            avg = sum(vals) / len(vals)
            bar = "#" * int(round(avg * 4))
            print(f"  t={b * 5:4d}s  busy={avg:5.2f}/{cores}  {bar}")

    # Stage attribution from the event log
    ev_files = []
    for root, _, files in os.walk(evdir):
        for f in files:
            if not f.startswith(".") and "appstatus" not in f:
                ev_files.append(os.path.join(root, f))
    stages: dict[int, dict] = {}
    for evf in ev_files:
        with open(evf) as f:
            for line in f:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if e.get("Event") == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub is None or comp is None:
                        continue
                    stages[sid] = {
                        "name": si.get("Stage Name", "?")[:70],
                        "wall": (comp - sub) / 1000.0,
                        "tasks": si.get("Number of Tasks", 0),
                        "sub": sub / 1000.0,
                    }
                elif e.get("Event") == "SparkListenerTaskEnd":
                    sid = e.get("Stage ID")
                    tm = e.get("Task Metrics") or {}
                    run = tm.get("Executor Run Time", 0) / 1000.0
                    if sid in stages:
                        stages[sid].setdefault("task_time", 0.0)
                        stages[sid]["task_time"] += run

    print(f"\n=== stages by idle-core cost (wall*{cores} - task_time) ===")
    rows = []
    for sid, s in stages.items():
        tt = s.get("task_time", 0.0)
        idle = s["wall"] * cores - tt
        rows.append((idle, sid, s, tt))
    rows.sort(reverse=True)
    total_wall = sum(s["wall"] for _, _, s, _ in rows)
    total_idle = sum(r[0] for r in rows)
    print(f"  total stage wall {total_wall:.1f}s  idle-core-sec {total_idle:.1f}")
    for idle, sid, s, tt in rows[:25]:
        util = tt / (s["wall"] * cores) if s["wall"] else 0
        print(f"  stage {sid:4d} wall={s['wall']:7.2f}s tasks={s['tasks']:4d} "
              f"util={util:4.0%} idle_cs={idle:7.1f}  {s['name']}")

    # Inter-stage gaps: wall time where NO stage is running (driver-side)
    iv = sorted((s["sub"], s["sub"] + s["wall"]) for s in stages.values())
    if iv:
        merged = [list(iv[0])]
        for a, b in iv[1:]:
            if a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        covered = sum(b - a for a, b in merged)
        span = merged[-1][1] - merged[0][0]
        print(f"\n  stage-covered {covered:.1f}s of {span:.1f}s span "
              f"-> {span - covered:.1f}s with no stage running (driver/planning)")


if __name__ == "__main__":
    main()

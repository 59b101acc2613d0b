"""Post-hoc window accounting for run_scaling_sim.py experiments.

The harness's original containment rule (big run started AND finished
while all four small lanes' processes were alive) turned out to be
geometrically brittle: with 80 s stagger and ~4 min big cycles the
full-density window fits about two big runs, and in the first 1.28M
experiment those two missed strict containment by 5 s and 16 s of their
200+ s spans — so the printed efficiency silently fell back to the
all-runs median, which mixes in light-window runs.

This analyzer recomputes per-repeat efficiency from the recorded walls
plus result-file mtimes, which pin every TASK window exactly
(task_start = json_mtime - wall_sec; spawn/warmup are excluded from
walls on both sides by scaling_job.py):

  * full-density window = [max_i lane_task_start_i, min_i lane_end_i]
    (all four small lanes executing their timed section)
  * a big run counts iff >= MIN_OVERLAP of its own task span lies
    inside that window
  * efficiency = (n / median counted big wall) / sum_i(n / lane_wall_i)

Usage:
    python tools/analyze_sim_windows.py /tmp/scaling_<n> <n_clips> [repeats]
"""

from __future__ import annotations

import json
import os
import sys

MIN_OVERLAP = 0.8


def task_window(path: str) -> tuple[float, float, float]:
    rec = json.load(open(path))
    end = os.path.getmtime(path)
    return end - rec["wall_sec"], end, rec["wall_sec"]


def main() -> None:
    workdir = sys.argv[1]
    n_clips = int(sys.argv[2])
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    effs = []
    for r in range(repeats):
        lane_paths = [os.path.join(workdir, f"sim_small_{r}_{i}.json")
                      for i in range(4)]
        if not all(os.path.exists(p) for p in lane_paths):
            print(json.dumps({"repeat": r,
                              "skipped": "missing lane result (harness "
                                         "skipped this repeat)"}))
            continue
        lanes = [task_window(p) for p in lane_paths]
        w0 = max(s for s, _, _ in lanes)
        w1 = min(e for _, e, _ in lanes)
        bigs = []
        bi = 0
        while os.path.exists(p := os.path.join(workdir,
                                               f"sim_big_{r}_{bi}.json")):
            s, e, w = task_window(p)
            ov = max(0.0, min(e, w1) - max(s, w0)) / w
            bigs.append({"wall": w, "overlap": round(ov, 3)})
            bi += 1
        counted = sorted(b["wall"] for b in bigs if b["overlap"] >= MIN_OVERLAP)
        if not counted:
            print(json.dumps({"repeat": r, "skipped": "no in-window big run",
                              "bigs": bigs}))
            continue
        med = counted[len(counted) // 2] if len(counted) % 2 else (
            (counted[len(counted) // 2 - 1] + counted[len(counted) // 2]) / 2)
        agg_small = sum(n_clips / w for _, _, w in lanes)
        thr_big = n_clips / med
        eff = thr_big / agg_small
        effs.append(eff)
        print(json.dumps({
            "repeat": r, "window_sec": round(w1 - w0, 1),
            "small_walls": [w for _, _, w in lanes],
            "agg_small_clips_per_sec": round(agg_small, 1),
            "bigs": bigs, "counted_big_walls": counted,
            "big_clips_per_sec": round(thr_big, 1),
            "efficiency": round(eff, 3),
        }))
    if effs:
        effs.sort()
        med = effs[len(effs) // 2] if len(effs) % 2 else (
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2)
        print(json.dumps({"efficiencies": [round(e, 3) for e in effs],
                          "median_efficiency": round(med, 3),
                          "min_overlap": MIN_OVERLAP}))


if __name__ == "__main__":
    main()

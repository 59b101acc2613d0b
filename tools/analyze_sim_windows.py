"""Post-hoc window accounting for run_scaling_sim.py experiments.

The harness's live containment rule (big run started AND finished while
all four small lanes' PROCESSES were alive) is geometrically brittle:
with 80 s stagger and ~4 min big cycles the full-density window fits
about two big runs, and boundary runs can miss strict containment by
seconds of their 200+ s spans. This analyzer recomputes per-repeat
efficiency from each result's own recorded task span
(t_task_start/t_task_end, written by scaling_job.py around exactly the
timed section — spawn/warmup excluded on both sides):

  * full-density window = [max_i lane_task_start_i, min_i lane_end_i]
    (all four small lanes executing their timed section)
  * a big run counts iff >= min_overlap of its own task span lies
    inside that window
  * efficiency = (n / median counted big wall) / sum_i(n / lane_wall_i)

Efficiency is reported at min_overlap 1.0 (strict task-span
containment), 0.9, and 0.8 so the threshold's effect is visible rather
than chosen: a boundary big run leaks at most (1 - min_overlap) of its
span into a lighter-load edge, and the small side symmetrically keeps
its window-edge advantage, so lower thresholds are not one-sided.

Every ingested file must carry the harness invocation's run_id (results
live in the per-invocation run_<id> directory and are cross-checked
against its name), so stale artifacts, copies, or touched files from
other invocations are rejected rather than silently counted.

Usage:
    python tools/analyze_sim_windows.py /tmp/scaling_<n>/run_<id> <n_clips> [repeats]
"""

from __future__ import annotations

import json
import os
import re
import sys

THRESHOLDS = (1.0, 0.9, 0.8)


def load_result(path: str, run_id: str) -> tuple[float, float, float]:
    rec = json.load(open(path))
    if rec.get("run_id") != run_id:
        raise SystemExit(
            f"{path}: run_id {rec.get('run_id')!r} does not match the run "
            f"directory's {run_id!r} — stale or foreign artifact")
    s, e = rec["t_task_start"], rec["t_task_end"]
    if not e > s:
        raise SystemExit(
            f"{path}: non-positive task span ({s} .. {e}) — malformed "
            f"artifact, refusing to count it")
    return s, e, rec["wall_sec"]


def median(xs: list[float]) -> float:
    xs = sorted(xs)
    n = len(xs)
    return xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2


def main() -> None:
    rundir = sys.argv[1].rstrip("/")
    n_clips = int(sys.argv[2])
    base = os.path.basename(rundir)
    if not base.startswith("run_"):
        raise SystemExit("pass the per-invocation run_<id> directory")
    run_id = base[len("run_"):]
    # Discover repeat indices from the artifacts themselves (lane 0 of
    # each repeat) so invocations that used run_scaling_sim.py's r_off
    # offset — whose files are named sim_small_{r_off+k}_* — are
    # analyzed instead of reported as all-missing.
    repeat_ids = sorted(
        int(m.group(1))
        for f in os.listdir(rundir)
        if (m := re.fullmatch(r"sim_small_(\d+)_0\.json", f))
    )
    if len(sys.argv) > 3:  # optional cap, kept for CLI compatibility
        repeat_ids = repeat_ids[: int(sys.argv[3])]
    if not repeat_ids:
        raise SystemExit(f"{rundir}: no sim_small_<r>_0.json results found")
    effs: dict[float, list[float]] = {t: [] for t in THRESHOLDS}
    for r in repeat_ids:
        lane_paths = [os.path.join(rundir, f"sim_small_{r}_{i}.json")
                      for i in range(4)]
        if not all(os.path.exists(p) for p in lane_paths):
            print(json.dumps({"repeat": r,
                              "skipped": "missing lane result (harness "
                                         "skipped this repeat)"}))
            continue
        lanes = [load_result(p, run_id) for p in lane_paths]
        w0 = max(s for s, _, _ in lanes)
        w1 = min(e for _, e, _ in lanes)
        bigs = []
        bi = 0
        while os.path.exists(p := os.path.join(rundir,
                                               f"sim_big_{r}_{bi}.json")):
            s, e, w = load_result(p, run_id)
            ov = max(0.0, min(e, w1) - max(s, w0)) / (e - s)
            bigs.append({"wall": w, "overlap": round(ov, 3)})
            bi += 1
        agg_small = sum(n_clips / w for _, _, w in lanes)
        rec = {
            "repeat": r, "window_sec": round(w1 - w0, 1),
            "small_walls": [w for _, _, w in lanes],
            "agg_small_clips_per_sec": round(agg_small, 1),
            "bigs": bigs,
        }
        for t in THRESHOLDS:
            counted = [b["wall"] for b in bigs if b["overlap"] >= t]
            if not counted:
                rec[f"eff_at_{t}"] = None
                continue
            eff = (n_clips / median(counted)) / agg_small
            rec[f"eff_at_{t}"] = round(eff, 3)
            effs[t].append(eff)
        print(json.dumps(rec))
    summary = {}
    for t in THRESHOLDS:
        if effs[t]:
            summary[f"min_overlap_{t}"] = {
                "efficiencies": [round(e, 3) for e in sorted(effs[t])],
                "median_efficiency": round(median(effs[t]), 3),
                "repeats_counted": len(effs[t]),
            }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

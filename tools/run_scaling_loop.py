"""Looped-window density-matched strong scaling (N vs 4N cores).

tools/run_scaling_sim.py ran both cluster sizes simultaneously but its
own data exposed a phase-correlation artifact: the four N-core copies
start in lockstep, so their bandwidth-heavy enrich stage coincides with
the FIRST 4N-core run of every window (measured: first big run 259-293 s
vs 154-186 s mid-window, identical code and input).  The small side
averages over the whole window; the big side samples it unevenly.

This harness washes that out: over one fixed wall-clock window, BOTH
sides loop their job back-to-back —

  * small side: four lanes, each looping the N-core job over the full
    input on its own core set (4N busy cores total);
  * big side: one lane looping the 4N-core job on the other core bank.

Only runs that FINISH inside the window count.  With a smaller input
(default 160k clips: small run ~3 min, big ~1 min) each small lane
completes ~3 runs and the big lane ~8 per window, so every run's timed
section sees the same time-averaged host pressure.  Per-side throughput
is time-weighted over counted runs (sum n / sum wall per lane), banks
swap between repeats to cancel core-set asymmetry, and

  efficiency = thr_big / sum(thr_small_lanes)

Strong scaling holds: both sizes process the identical input per run.

Usage:
    python tools/run_scaling_loop.py [n_clips] [n_small] [window_sec] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_scaling import build_zip  # noqa: E402
from run_scaling_matched import submit  # noqa: E402


def lane_loop(workdir: str, zip_path: str, clips_path: str, cores: str,
              ncores: int, tag: str, t_end: float, out: list) -> None:
    i = 0
    while time.time() < t_end:
        oj = os.path.join(workdir, f"loop_{tag}_{i}.json")
        p = submit(workdir, zip_path, clips_path, cores, ncores, oj)
        p.wait()
        t_fin = time.time()
        if p.returncode == 0 and os.path.exists(oj):
            rec = json.load(open(oj))
            rec["counted"] = t_fin <= t_end
            out.append(rec)
        i += 1


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 720
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    n_big = n_small * 4
    workdir = f"/tmp/scaling_loop_{n_clips}"
    os.makedirs(workdir, exist_ok=True)
    zip_path = os.path.join(workdir, "dataquality_spark.zip")
    build_zip(zip_path)

    clips_path = os.path.join(workdir, "clips.parquet")
    if not os.path.exists(os.path.join(clips_path, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from dataquality_spark.datagen.clips import write_clips_parquet
        from dataquality_spark.session import get_spark

        spark = get_spark(app_name="scaling_datagen")
        write_clips_parquet(spark, clips_path, n_clips)
        spark.stop()

    bank_a = list(range(0, 4 * n_small))
    bank_b = list(range(4 * n_small, 8 * n_small))

    results = []
    for r in range(repeats):
        small_bank, big_bank = (bank_a, bank_b) if r % 2 == 0 else (
            bank_b, bank_a)
        small_sets = [
            ",".join(str(c) for c in small_bank[i * n_small:(i + 1) * n_small])
            for i in range(4)
        ]
        big_cores = ",".join(str(c) for c in big_bank)

        t_end = time.time() + window
        small_runs: list[list] = [[] for _ in range(4)]
        big_runs: list = []
        threads = [
            threading.Thread(
                target=lane_loop,
                args=(workdir, zip_path, clips_path, cs, n_small,
                      f"small_{r}_{i}", t_end, small_runs[i]))
            for i, cs in enumerate(small_sets)
        ] + [
            threading.Thread(
                target=lane_loop,
                args=(workdir, zip_path, clips_path, big_cores, n_big,
                      f"big_{r}", t_end, big_runs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        def thr(runs: list) -> float:
            counted = [x for x in runs if x["counted"]]
            if not counted:  # fall back to all finished runs in this lane
                counted = runs
            return len(counted) * n_clips / sum(x["wall_sec"] for x in counted)

        agg_small = sum(thr(lane) for lane in small_runs)
        thr_big = thr(big_runs)
        rec = {
            "repeat": r,
            "small_bank": "A" if small_bank is bank_a else "B",
            "small_counted_walls": [
                [x["wall_sec"] for x in lane if x["counted"]]
                for lane in small_runs],
            "big_counted_walls": [
                x["wall_sec"] for x in big_runs if x["counted"]],
            "agg_small_clips_per_sec": round(agg_small, 1),
            "big_clips_per_sec": round(thr_big, 1),
            "efficiency": round(thr_big / agg_small, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    effs = sorted(r["efficiency"] for r in results)
    median = effs[len(effs) // 2] if len(effs) % 2 else (
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2)
    summary = {
        "protocol": "looped-window-density-matched", "n_clips": n_clips,
        "n_small": n_small, "n_big": n_big, "window_sec": window,
        "repeats": repeats, "efficiencies": effs,
        "median_efficiency": round(median, 3), "runs": results,
    }
    out = os.path.join(workdir, "loop_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("protocol", "efficiencies", "median_efficiency")}))
    print("summary ->", out)


if __name__ == "__main__":
    main()

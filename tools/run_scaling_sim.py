"""Simultaneous density-matched strong-scaling experiment (N vs 4N cores).

tools/run_scaling_matched.py equalized busy-core DENSITY between the two
cluster sizes (four N-core copies vs one 4N-core job, both 4N busy
cores) but still ran the two sides in SEQUENCE — and its own results
show minutes-long host-noise windows large enough to produce a
superlinear 1.51 "efficiency" in one repeat (small fleet hit a noisy
window, the big job a quiet one).  Sequencing leaves temporal drift in
the ratio.

This harness removes the time dimension too: both sides run AT THE SAME
TIME on disjoint core sets of the 32-vCPU host —

  * small side: four independent N-core copies of the identical job on
    cores {0..N-1},{N..2N-1},... (4N busy cores), each over the full
    input.  Aggregate throughput = sum(n / T_i).
  * big side: one 4N-core job on cores 4N..8N-1, re-launched
    back-to-back in a loop until the small fleet finishes, so the big
    side is busy for the whole window.  Throughput = n / median(T_big)
    over the runs fully contained in the small-fleet window.

  efficiency = (n / median T_big) / aggregate_small_throughput

Every hypervisor/turbo/bandwidth fluctuation now lands on both sides of
the ratio in the same instant; what remains is the engine's own scaling
loss (shuffle, stage barriers, driver serialization) — the quantity the
north rule's N-vs-4N criterion is after.  Core-set asymmetry (NUMA /
hyperthread-sibling layout) is cancelled by SWAPPING sides between
repeats.

A second artifact its first experiment exposed: the four small copies
start in lockstep, so their bandwidth-heavy enrich stage lines up with
the first big run of every window (measured 259-293 s for that run vs
154-186 s mid-window).  The optional stagger delays small lane i by
i*stagger_sec so the small fleet presents a time-uniform phase mixture
— like a steady-state production cluster — and big-run containment is
then judged against the all-four-lanes-running window (conservative:
the window edges where fewer lanes run benefit only the small side).

Usage:
    python tools/run_scaling_sim.py [n_clips] [n_small] [repeats] [stagger_sec]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_scaling import build_zip  # noqa: E402
from run_scaling_matched import submit  # noqa: E402


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 640000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stagger = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    # Repeat-index offset: lets a follow-up invocation continue the
    # bank-swap parity (odd offset starts on bank B) and keeps result
    # filenames from colliding with the prior invocation's.
    r_off = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    n_big = n_small * 4
    workdir = f"/tmp/scaling_{n_clips}"
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

    # Two disjoint 4N-core banks; sides swap banks between repeats so
    # any core-set asymmetry cancels in the median.
    bank_a = list(range(0, 4 * n_small))
    bank_b = list(range(4 * n_small, 8 * n_small))

    results = []
    for r in range(r_off, r_off + repeats):
        small_bank, big_bank = (bank_a, bank_b) if r % 2 == 0 else (
            bank_b, bank_a)
        small_sets = [
            ",".join(str(c) for c in small_bank[i * n_small:(i + 1) * n_small])
            for i in range(4)
        ]
        big_cores = ",".join(str(c) for c in big_bank)

        # Launch the small fleet (4N busy cores on one bank), lane i
        # delayed by i*stagger so the fleet's pipeline phases decorrelate.
        import threading

        small_outs = [os.path.join(workdir, f"sim_small_{r}_{i}.json")
                      for i in range(4)]
        small_procs: list = [None, None, None, None]

        def launch_small(i: int, cs: str) -> None:
            time.sleep(i * stagger)
            small_procs[i] = submit(workdir, zip_path, clips_path, cs,
                                    n_small, small_outs[i])

        launchers = [threading.Thread(target=launch_small, args=(i, cs))
                     for i, cs in enumerate(small_sets)]
        for th in launchers:
            th.start()

        def all_small_running() -> bool:
            return all(p is not None and p.poll() is None for p in small_procs)

        def any_small_pending() -> bool:
            return any(p is None or p.poll() is None for p in small_procs)

        # ...and loop big jobs on the other bank for the whole window.
        big_recs = []
        bi = 0
        while any_small_pending():
            oj = os.path.join(workdir, f"sim_big_{r}_{bi}.json")
            t0 = time.time()
            started_in_window = all_small_running()
            p = submit(workdir, zip_path, clips_path, big_cores, n_big, oj)
            p.wait()
            finished_in_window = all_small_running()
            if p.returncode == 0 and os.path.exists(oj):
                rec = json.load(open(oj))
                rec["contained"] = started_in_window and finished_in_window
                rec["t_start"] = round(t0, 1)
                big_recs.append(rec)
            bi += 1
        for th in launchers:
            th.join()
        if any(p.wait() != 0 for p in small_procs):
            # A dead lane frees its cores mid-window, which biases every
            # surviving measurement; the repeat is unusable, not the
            # experiment (seen once: transient ENOSPC from orphaned
            # shuffle scratch of previously killed runs).
            print(json.dumps({"repeat": r, "skipped": "small-lane failure"}),
                  flush=True)
            continue
        small = [json.load(open(o)) for o in small_outs]

        contained = [b for b in big_recs if b["contained"]]
        usable = contained if contained else big_recs
        walls = sorted(b["wall_sec"] for b in usable)
        med_big = walls[len(walls) // 2] if len(walls) % 2 else (
            (walls[len(walls) // 2 - 1] + walls[len(walls) // 2]) / 2)
        agg_small = sum(n_clips / s["wall_sec"] for s in small)
        thr_big = n_clips / med_big
        rec = {
            "repeat": r,
            "small_bank": "A" if small_bank is bank_a else "B",
            "small_walls_sec": [s["wall_sec"] for s in small],
            "agg_small_clips_per_sec": round(agg_small, 1),
            "big_walls_sec": [b["wall_sec"] for b in big_recs],
            "big_contained": [b["contained"] for b in big_recs],
            "median_big_wall_sec": med_big,
            "big_clips_per_sec": round(thr_big, 1),
            "efficiency": round(thr_big / agg_small, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    effs = sorted(r["efficiency"] for r in results)
    median = effs[len(effs) // 2] if len(effs) % 2 else (
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2)
    summary = {
        "protocol": "simultaneous-density-matched", "n_clips": n_clips,
        "n_small": n_small, "n_big": n_big, "repeats": repeats,
        "stagger_sec": stagger,
        "efficiencies": effs, "median_efficiency": round(median, 3),
        "runs": results,
    }
    out = os.path.join(workdir, "sim_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("protocol", "efficiencies", "median_efficiency")}))
    print("summary ->", out)


if __name__ == "__main__":
    main()

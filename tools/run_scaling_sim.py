"""Simultaneous density-matched strong-scaling experiment (N vs 4N cores).

This is the FINAL protocol of an evolution documented in BENCH.md §"How
the scaling protocol evolved" (sequential best-of, paired-alternation,
density-matched sequential — all retired; their results are retained in
BENCH.md prose and scaling_r03.jsonl). The earlier harnesses equalized
busy-core DENSITY between the two cluster sizes but still ran the two
sides in SEQUENCE, and minutes-long host-noise windows on this
virtualized 32-vCPU box produced ratio artifacts as large as a
superlinear 1.51 "efficiency" in one repeat.

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

Result files carry the harness invocation's run_id and in-JSON task
start/end timestamps, and land in a fresh per-invocation subdirectory —
tools/analyze_sim_windows.py keys on both, so stale artifacts from a
prior or crashed invocation can never enter the accounting.

Usage:
    python tools/run_scaling_sim.py [n_clips] [n_small] [repeats] [stagger_sec]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def build_zip(path: str) -> None:
    """Package the library for spark-submit --py-files (the deployment
    mode the north rule names)."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "dataquality_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))


def submit(rundir: str, zip_path: str, clips_path: str, cores: str,
           ncores: int, out_json: str, run_id: str) -> subprocess.Popen:
    cmd = [
        "taskset", "-c", cores,
        SPARK_SUBMIT, "--master", f"local[{ncores}]",
        # Same per-job heap on both sides: memory is not the scaled
        # resource (per-core memory is then 4x HIGHER on the small side —
        # a bias AGAINST the efficiency number, not for it).
        "--driver-memory", "16g",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        clips_path, str(ncores), out_json,
    ]
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    env["SCALING_RUN_ID"] = run_id
    # Each copy needs its own tmp/derby scratch so 4 concurrent local
    # sessions do not collide on metastore_db / spark tmp dirs.
    scratch = os.path.join(rundir, f"scratch_{cores.replace(',', '_')}")
    os.makedirs(scratch, exist_ok=True)
    env["SPARK_LOCAL_DIRS"] = scratch
    log = open(out_json + ".log", "w")
    return subprocess.Popen(cmd, cwd=scratch, env=env,
                            stdout=log, stderr=subprocess.STDOUT)


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 640000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    stagger = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    # Repeat-index offset: lets a follow-up invocation continue the
    # bank-swap parity (odd offset starts on bank B).
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

    # Fresh per-invocation result directory: the analyzer reads exactly
    # this tree, so leftovers from prior/crashed invocations (the input
    # parquet and zip above are the only shared, immutable artifacts)
    # cannot be ingested.
    run_id = f"{int(time.time())}_{os.getpid()}"
    rundir = os.path.join(workdir, f"run_{run_id}")
    os.makedirs(rundir)

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

        small_outs = [os.path.join(rundir, f"sim_small_{r}_{i}.json")
                      for i in range(4)]
        small_procs: list = [None, None, None, None]

        def launch_small(i: int, cs: str) -> None:
            time.sleep(i * stagger)
            small_procs[i] = submit(rundir, zip_path, clips_path, cs,
                                    n_small, small_outs[i], run_id)

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
            oj = os.path.join(rundir, f"sim_big_{r}_{bi}.json")
            started_in_window = all_small_running()
            p = submit(rundir, zip_path, clips_path, big_cores, n_big, oj,
                       run_id)
            p.wait()
            finished_in_window = all_small_running()
            if p.returncode == 0 and os.path.exists(oj):
                rec = json.load(open(oj))
                rec["contained"] = started_in_window and finished_in_window
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
        if not contained:
            # Never widen to out-of-window runs on one side of the ratio
            # — that mixes host-noise windows the protocol exists to
            # exclude. The analyzer's task-span accounting may still
            # rescue the repeat from the recorded timestamps.
            print(json.dumps({"repeat": r,
                              "no_contained_big_run": True,
                              "big_walls_sec": [b["wall_sec"]
                                                for b in big_recs]}),
                  flush=True)
            continue
        walls = sorted(b["wall_sec"] for b in contained)
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
    summary = {
        "protocol": "simultaneous-density-matched", "run_id": run_id,
        "n_clips": n_clips, "n_small": n_small, "n_big": n_big,
        "repeats": repeats, "stagger_sec": stagger,
        "efficiencies": effs, "runs": results,
    }
    if effs:
        median = effs[len(effs) // 2] if len(effs) % 2 else (
            (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2)
        summary["median_efficiency"] = round(median, 3)
    out = os.path.join(rundir, "sim_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary.get(k) for k in
                      ("protocol", "run_id", "efficiencies",
                       "median_efficiency")}))
    print("summary ->", out)


if __name__ == "__main__":
    main()

"""Density-matched strong-scaling experiment (N vs 4N cores).

Motivation (measured, see BENCH.md): this virtualized host's per-core
capacity drops ~25-40% as total busy vCPUs rise (turbo / shared memory
bandwidth / hypervisor scheduling) — verified by running the SAME
single-threaded pure-Python/numpy component benchmark solo vs 8-way
concurrent: every heterogeneous component (FFT decode, regex scrub,
dict-based n-gram scoring, MinHash) inflates by the same factor, which
points at the shared silicon, not at any algorithm. A real N-executor
vs 4N-executor cluster comparison does NOT carry that confounder: both
clusters run their nodes at the same per-node busy density.

The isolated protocol (tools/run_scaling.py: quiet host, one config at
a time) therefore charges the host's density penalty entirely to the
4N configuration. This harness instead equalizes density:

  * small side: FOUR independent N-core copies of the identical job run
    SIMULTANEOUSLY on disjoint core sets ({0,1},{2,3},{4,5},{6,7} for
    N=2), each over the full input — 4N busy cores, like four separate
    N-core clusters packed on the same silicon.  Aggregate throughput
    = sum(n / T_i).
  * big side: ONE 4N-core job over the same input on cores 0..4N-1 —
    the same 4N busy cores.

  efficiency = (n / T_big) / aggregate_small_throughput

Both sides now see identical host conditions; what remains in the ratio
is the engine's own scaling: shuffle/coordination overhead, stage
barriers, driver serialization — exactly what the north rule's
two-cluster-size criterion is after.  Repeats are interleaved
(small-fleet, big, small-fleet, big, ...) like tools/run_scaling.py.

Usage:
    python tools/run_scaling_matched.py [n_clips] [n_small] [repeats]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from run_scaling import SPARK_SUBMIT, build_zip  # noqa: E402


def submit(workdir: str, zip_path: str, clips_path: str, cores: str,
           ncores: int, out_json: str) -> subprocess.Popen:
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
    # Each copy needs its own tmp/derby scratch so 4 concurrent local
    # sessions do not collide on metastore_db / spark tmp dirs.
    scratch = os.path.join(workdir, f"scratch_{cores.replace(',', '_')}")
    os.makedirs(scratch, exist_ok=True)
    env["SPARK_LOCAL_DIRS"] = scratch
    log = open(out_json + ".log", "w")
    return subprocess.Popen(cmd, cwd=scratch, env=env,
                            stdout=log, stderr=subprocess.STDOUT)


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 640000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
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

    core_sets = [
        ",".join(str(c) for c in range(i * n_small, (i + 1) * n_small))
        for i in range(4)
    ]
    big_cores = f"0-{n_big - 1}"

    results = []
    for r in range(repeats):
        # small fleet: 4 simultaneous N-core jobs (4N busy cores)
        outs = []
        procs = []
        for i, cs in enumerate(core_sets):
            oj = os.path.join(workdir, f"matched_small_{r}_{i}.json")
            outs.append(oj)
            procs.append(submit(workdir, zip_path, clips_path, cs,
                                n_small, oj))
        for p in procs:
            if p.wait() != 0:
                raise SystemExit("small-fleet job failed; see logs")
        small = [json.load(open(o)) for o in outs]

        # big: one 4N-core job (the same 4N busy cores)
        oj = os.path.join(workdir, f"matched_big_{r}.json")
        p = submit(workdir, zip_path, clips_path, big_cores, n_big, oj)
        if p.wait() != 0:
            raise SystemExit("big job failed; see log")
        big = json.load(open(oj))

        agg_small = sum(n_clips / s["wall_sec"] for s in small)
        thr_big = n_clips / big["wall_sec"]
        eff = thr_big / agg_small
        rec = {
            "repeat": r,
            "small_walls_sec": [s["wall_sec"] for s in small],
            "agg_small_clips_per_sec": round(agg_small, 1),
            "big_wall_sec": big["wall_sec"],
            "big_clips_per_sec": round(thr_big, 1),
            "efficiency": round(eff, 3),
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    effs = sorted(r["efficiency"] for r in results)
    median = effs[len(effs) // 2] if len(effs) % 2 else (
        (effs[len(effs) // 2 - 1] + effs[len(effs) // 2]) / 2
    )
    summary = {
        "protocol": "density-matched", "n_clips": n_clips,
        "n_small": n_small, "n_big": n_big, "repeats": repeats,
        "efficiencies": effs, "median_efficiency": round(median, 3),
        "runs": results,
    }
    out = os.path.join(workdir, "matched_summary.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: summary[k] for k in
                      ("protocol", "efficiencies", "median_efficiency")}))
    print("summary ->", out)


if __name__ == "__main__":
    main()

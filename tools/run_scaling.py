"""Scaling-efficiency evidence: packages the engine as a zip, materializes
one clips parquet input, then spark-submits the identical full pipeline at
N and 4N cores and appends the measured table to BENCH.md.

    python tools/run_scaling.py [n_clips] [n_small] [repeats]

Methodology (empirically derived on this host — see BENCH.md narrative):

* **Cores are pinned with taskset** (`taskset -c 0-(n-1)` around
  spark-submit): the whole process tree — JVM, PySpark daemon, every
  Python worker — is confined to exactly N cores, which is the honest
  single-host stand-in for an N-executor cluster. Bare ``local[N]``
  under-states N-core capacity (the JVM's extra threads spill onto other
  cores) and this virtualized 32-vCPU host stops scaling past ~8-16 busy
  vCPUs (sys-time inflation from lock-holder preemption), so unpinned
  8-vs-32 measures the hypervisor, not the engine.
* **Repeats, best-of, INTERLEAVED**: wall times on this VM vary 2-3x run
  to run with identical code and input (host neighbors); each
  configuration runs ``repeats`` times and the best wall time is
  reported (standard noisy-host protocol).  Round 3 change: the repeats
  are interleaved round-robin across configurations (small, big, small,
  big, ...) instead of config-at-a-time blocks, so slow host drift
  (neighbor load ramping over minutes) hits every configuration equally
  instead of whichever block it coincided with — the round-2 data showed
  configs moving INDEPENDENTLY under block sampling, which is exactly
  what interleaving differences out.
* **Math-library threads are pinned to 1** per Python worker: N workers
  already saturate the N cores; nested BLAS/OpenMP pools oversubscribe.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def build_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "dataquality_spark")
        for root, _, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, REPO))


def run_once(workdir: str, zip_path: str, clips_path: str, cores: int,
             tag: str, r: int) -> dict:
    out_json = os.path.join(workdir, f"result_{tag}_{cores}_{r}.json")
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        SPARK_SUBMIT, "--master", f"local[{cores}]",
        "--driver-memory", "16g",
        "--py-files", zip_path,
        os.path.join(REPO, "tools", "scaling_job.py"),
        clips_path, str(cores), out_json,
    ]
    print("+", " ".join(cmd), flush=True)
    env = dict(os.environ)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        env[var] = "1"
    subprocess.run(cmd, check=True, cwd=workdir, env=env)
    with open(out_json) as f:
        res = json.load(f)
    print(json.dumps(res), flush=True)
    return res


def best_of(runs: list[dict], repeats: int) -> dict:
    best = min(runs, key=lambda r: r["wall_sec"])
    best = dict(best)
    best["repeats"] = repeats
    best["all_wall_sec"] = [r["wall_sec"] for r in runs]
    return best


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 160000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
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

    # Weak-scaling input: n/4 clips for the N-core config, so data grows
    # with cores exactly as a production cluster scales (same per-executor
    # load; the 100TB question is "add 4x executors for 4x data, is the
    # wall time flat").
    quarter_path = os.path.join(workdir, "clips_quarter.parquet")
    if not os.path.exists(os.path.join(quarter_path, "_SUCCESS")):
        sys.path.insert(0, REPO)
        from dataquality_spark.datagen.clips import write_clips_parquet
        from dataquality_spark.session import get_spark

        spark = get_spark(app_name="scaling_datagen_q")
        write_clips_parquet(spark, quarter_path, n_clips // 4)
        spark.stop()

    # Symmetric sampling: EVERY configuration runs the same number of
    # repeats, so best-of cannot bias the efficiency ratio toward either
    # side; and the repeats are INTERLEAVED round-robin across the three
    # configurations so slow host drift (neighbor load ramping over
    # minutes) lands on every configuration equally rather than on
    # whichever config-block it coincided with.
    runs: dict[str, list[dict]] = {"weak_small": [], "small": [], "big": []}
    for r in range(repeats):
        runs["weak_small"].append(
            run_once(workdir, zip_path, quarter_path, n_small, "weak", r))
        runs["small"].append(
            run_once(workdir, zip_path, clips_path, n_small, "strong", r))
        runs["big"].append(
            run_once(workdir, zip_path, clips_path, n_big, "strong", r))
    r_weak_small = best_of(runs["weak_small"], repeats)
    r_small = best_of(runs["small"], repeats)
    r_big = best_of(runs["big"], repeats)

    strong = r_small["wall_sec"] / r_big["wall_sec"] / 4.0
    weak = (r_big["clips_per_sec"] / r_weak_small["clips_per_sec"]) / 4.0
    summary = {
        "n_clips": n_clips,
        f"weak_cores_{n_small}": r_weak_small,
        f"cores_{n_small}": r_small, f"cores_{n_big}": r_big,
        "strong_scaling_efficiency": round(strong, 3),
        "weak_scaling_throughput_efficiency": round(weak, 3),
    }
    print(json.dumps(summary, indent=2))

    bench_md = os.path.join(REPO, "BENCH.md")
    lines = [
        "\n## Scaling evidence (N vs 4N cores)\n\n",
        "- job: full pipeline (enrich -> dedup -> policy -> results/pairs/"
        "metrics sinks) over pre-materialized generated clips parquet "
        "(generation + planner warmup excluded from timing), launched "
        "`spark-submit --py-files dataquality_spark.zip`, process tree "
        f"pinned to exactly N cores with taskset, best of {repeats} runs "
        "per configuration, repeats INTERLEAVED round-robin across "
        "configurations (symmetric sampling — identical repeat count at "
        "N and 4N, slow host drift differenced out; tools/run_scaling.py "
        "documents the pinning/repeat protocol and why unpinned "
        "local[32] on this virtualized host measures the hypervisor, "
        "not the engine)\n",
        "- **N vs 4N cores, identical input** (the two-cluster-size "
        f"criterion; same {n_clips}-clip corpus at both sizes):\n",
        f"  - {n_small} cores: {r_small['wall_sec']} s "
        f"({r_small['clips_per_sec']} clips/s; raw repeats "
        f"{r_small['all_wall_sec']} s)\n",
        f"  - {n_big} cores: {r_big['wall_sec']} s "
        f"({r_big['clips_per_sec']} clips/s; raw repeats "
        f"{r_big['all_wall_sec']} s)\n",
        f"  - throughput scaling efficiency: **{strong:.3f}** "
        "(target >= 0.8)\n",
        "- **weak scaling** (4x executors for 4x data, reported for "
        "completeness):\n",
        f"  - {n_small} cores, {n_clips // 4} clips: "
        f"{r_weak_small['wall_sec']} s ({r_weak_small['clips_per_sec']} "
        "clips/s)\n",
        f"  - {n_big} cores, {n_clips} clips: {r_big['wall_sec']} s "
        f"({r_big['clips_per_sec']} clips/s)\n",
        f"  - throughput ratio / 4 = {weak:.3f} — understates the engine "
        "on this corpus: the planted duplicate clusters grow with n, so "
        "the 4x corpus carries superlinearly more near-dup pair work per "
        "clip\n",
    ]
    with open(bench_md, "a") as f:
        f.writelines(lines)
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()

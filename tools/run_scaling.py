"""Runs the scaling-efficiency evidence: packages the engine as a zip,
materializes one clips parquet input, then spark-submits the identical
job at local[8] and local[32]; appends the measured table to BENCH.md.

    python tools/run_scaling.py [n_clips]
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


def main() -> None:
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
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

    results = {}
    for cores in (8, 32):
        out_json = os.path.join(workdir, f"result_{cores}.json")
        cmd = [
            SPARK_SUBMIT, "--master", f"local[{cores}]",
            "--driver-memory", "24g",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "scaling_job.py"),
            clips_path, str(cores), out_json,
        ]
        print("+", " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=workdir)
        with open(out_json) as f:
            results[cores] = json.load(f)

    r8, r32 = results[8], results[32]
    speedup = r8["wall_sec"] / r32["wall_sec"]
    efficiency = speedup / 4.0
    summary = {
        "n_clips": n_clips,
        "local8": r8, "local32": r32,
        "speedup_8_to_32": round(speedup, 2),
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary, indent=2))

    bench_md = os.path.join(REPO, "BENCH.md")
    lines = [
        "\n## Scaling evidence (N vs 4N parallelism, identical input)\n",
        f"- input: {n_clips} generated clips (parquet, pre-materialized)\n",
        f"- launch: `spark-submit --py-files dataquality_spark.zip` (tools/scaling_job.py)\n",
        f"- local[8]:  {r8['wall_sec']} s  ({r8['clips_per_sec']} clips/s)\n",
        f"- local[32]: {r32['wall_sec']} s  ({r32['clips_per_sec']} clips/s)\n",
        f"- speedup 8→32 cores: {speedup:.2f}x  → scaling efficiency {efficiency:.3f}"
        f" (target ≥ 0.8)\n",
    ]
    with open(bench_md, "a") as f:
        f.writelines(lines)
    print(f"appended to {bench_md}")


if __name__ == "__main__":
    main()

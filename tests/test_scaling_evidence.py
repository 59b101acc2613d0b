"""Contract tests for the scaling-evidence pipeline (no Spark needed):
tools/analyze_sim_windows.py must compute window efficiencies from the
in-JSON task spans written by tools/scaling_job.py, reject artifacts
whose run_id does not match the invocation directory, and report the
1.0/0.9/0.8 overlap thresholds side by side."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ANALYZER = os.path.join(REPO, "tools", "analyze_sim_windows.py")
N = 100_000
RUN_ID = "1700000000_42"


def _write(rundir, name, t0, t1, run_id=RUN_ID):
    with open(os.path.join(rundir, name), "w") as f:
        json.dump({"t_task_start": t0, "t_task_end": t1,
                   "wall_sec": round(t1 - t0, 2), "run_id": run_id}, f)


def _mkrun(tmp_path):
    rundir = tmp_path / f"run_{RUN_ID}"
    rundir.mkdir()
    return str(rundir)


def _analyze(rundir, repeats=1):
    out = subprocess.run(
        [sys.executable, ANALYZER, rundir, str(N), str(repeats)],
        capture_output=True, text=True)
    return out


def test_efficiency_from_task_spans_at_all_thresholds(tmp_path):
    rundir = _mkrun(tmp_path)
    # Four small lanes, walls 400 s, full-density window = [100, 500].
    for i in range(4):
        _write(rundir, f"sim_small_0_{i}.json", 100.0, 500.0)
    # Big runs: fully contained (wall 90), 85%-contained (wall 110),
    # fully outside (wall 50).
    _write(rundir, "sim_big_0_0.json", 150.0, 240.0)
    _write(rundir, "sim_big_0_1.json", 470.0, 580.0)   # overlap 30/110
    _write(rundir, "sim_big_0_2.json", 600.0, 650.0)
    out = _analyze(rundir)
    assert out.returncode == 0, out.stderr
    lines = [json.loads(ln) for ln in out.stdout.strip().splitlines()]
    rec, summary = lines[0], lines[-1]
    agg_small = 4 * N / 400.0
    # strict containment counts only the 90 s run
    assert rec["eff_at_1.0"] == round((N / 90.0) / agg_small, 3)
    # 0.8/0.9 also count only it (run 1 overlaps 27%)
    assert rec["eff_at_0.8"] == rec["eff_at_1.0"]
    assert summary["min_overlap_1.0"]["median_efficiency"] == rec["eff_at_1.0"]
    assert set(summary) == {"min_overlap_1.0", "min_overlap_0.9",
                            "min_overlap_0.8"}


def test_boundary_run_counts_only_below_its_overlap(tmp_path):
    rundir = _mkrun(tmp_path)
    for i in range(4):
        _write(rundir, f"sim_small_0_{i}.json", 0.0, 1000.0)
    # One big run 85% inside the window: counted at 0.8, not at 0.9/1.0.
    _write(rundir, "sim_big_0_0.json", 830.0, 1030.0)  # overlap 170/200
    out = _analyze(rundir)
    rec = json.loads(out.stdout.strip().splitlines()[0])
    assert rec["eff_at_1.0"] is None and rec["eff_at_0.9"] is None
    assert rec["eff_at_0.8"] == round((N / 200.0) / (4 * N / 1000.0), 3)


def test_stale_artifact_with_foreign_run_id_is_rejected(tmp_path):
    rundir = _mkrun(tmp_path)
    for i in range(4):
        _write(rundir, f"sim_small_0_{i}.json", 100.0, 500.0)
    _write(rundir, "sim_big_0_0.json", 150.0, 240.0, run_id="other_run")
    out = _analyze(rundir)
    assert out.returncode != 0
    assert "stale or foreign artifact" in out.stderr + out.stdout


def test_scaling_job_writes_the_fields_the_analyzer_reads(tmp_path):
    # Source-level contract check (running scaling_job needs spark-submit):
    # every field the analyzer loads must be written by the job.
    job_src = open(os.path.join(REPO, "tools", "scaling_job.py")).read()
    for field in ("t_task_start", "t_task_end", "wall_sec", "run_id"):
        assert f'"{field}"' in job_src
    assert "SCALING_RUN_ID" in job_src

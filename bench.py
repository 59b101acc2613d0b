"""Benchmark harness (driver contract): runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>, "clips_per_sec": ...}

The clips quality-filter pipeline (the engine's flagship) is measured as
throughput over a pre-materialized parquet clips table (generation cost
is excluded — it is input, not engine). Catalog queries tagged "bench"
cover the relational/dedup/ANN/text operator families.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CLIPS = int(os.environ.get("BENCH_N_CLIPS", "0")) or (
    20000 if "0.1" in SF_DIR else (5000 if "0.01" in SF_DIR else 2000)
)
# File count = the scan's hard parallelism ceiling (one ~row-group per
# file at this size), so generate 4 task-waves per core and name the cache
# by layout so a re-run with different CPUS regenerates.
N_FILES = 4 * CPUS
CLIPS_CACHE = os.environ.get(
    "BENCH_CLIPS_DIR", f"/tmp/bench_clips_{N_CLIPS}_{N_FILES}"
)


def _host_load() -> dict:
    """Snapshot host contention so a confounded run is self-evident in the
    artifact (the r4 bench was invalidated by a background job pinning
    cores — uniform 1.3-5.9x inflation with nothing in the JSON to show
    why).  Records /proc/loadavg plus the number of OTHER running
    (R-state) processes at bench start."""
    try:
        with open("/proc/loadavg") as f:
            la = f.read().split()
        load = [float(x) for x in la[:3]]
    except (OSError, ValueError):
        load = None
    running = 0
    try:
        me = os.getpid()
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/stat") as f:
                    if f.read().rsplit(")", 1)[1].split()[0] == "R":
                        running += 1
            except OSError:
                continue
    except OSError:
        running = None
    return {"loadavg": load, "other_running_procs": running}


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for fn in files:
            if not fn.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, fn))
    return total


def _force(df) -> int:
    """Fully execute a DataFrame without driver-side collection cost."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from dataquality_spark.datagen.clips import DEFAULT_RUN_TS, write_clips_parquet
    from dataquality_spark.pipeline import run_pipeline
    from dataquality_spark.queries import CATALOG
    from dataquality_spark.session import get_spark

    load_at_start = _host_load()

    # Materialize the clips input in a SUBPROCESS so datagen cost (and its
    # JVM heap/GC state — spark.stop() reuses the same py4j JVM) cannot
    # bleed into the timed measurements.
    if not os.path.exists(os.path.join(CLIPS_CACHE, "_SUCCESS")):
        shutil.rmtree(CLIPS_CACHE, ignore_errors=True)
        import subprocess
        code = (
            "import sys; sys.path.insert(0, %r); "
            "from dataquality_spark.session import get_spark; "
            "from dataquality_spark.datagen.clips import write_clips_parquet; "
            "s = get_spark(app_name='bench-datagen', master='local[%d]', "
            "shuffle_partitions=%d); "
            "write_clips_parquet(s, %r, %d, n_files=%d); s.stop()"
            % (os.path.dirname(os.path.abspath(__file__)), CPUS, CPUS,
               CLIPS_CACHE, N_CLIPS, N_FILES)
        )
        subprocess.run([sys.executable, "-c", code], check=True)

    # Scan splits sized to THIS input and core count: at sf0.1 the clips
    # table is ~540 MB, and the 128m default packs it into ~6 splits — an
    # enrich stage capped at 6 of 32 cores. One file per split (files are
    # single row groups at this size) restores full-width scans; openCost
    # is dropped so the sizing math is the file bytes themselves.
    split = max(2 << 20, min(128 << 20, _dir_bytes(CLIPS_CACHE) // N_FILES))
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS,
                      extra_conf={
                          "spark.sql.files.maxPartitionBytes": str(split),
                          "spark.sql.files.openCostInBytes": str(1 << 20),
                          # The scoring CASE trees make uncapped plan-string
                          # renders cost driver-seconds per AQE stage
                          # materialization (event-log measured); benchmark
                          # sessions never read explain output, so cap it.
                          "spark.sql.maxPlanStringLength": "8192",
                      })

    timings: dict[str, float] = {}

    # --- warmup: spin up executor threads, Python workers, codegen -------
    from dataquality_spark.caching import release_all

    # Generated 512-row slice, NOT clips.limit(512): a GlobalLimit over
    # the scan launches every split and shuffles rows from each.
    from dataquality_spark.datagen.clips import clips_df

    warm = run_pipeline(
        clips_df(spark, 512), DEFAULT_RUN_TS,
        include_evidence=False,
    )
    _force(warm.results)
    release_all()

    # --- flagship: clips quality-filter pipeline -------------------------
    # best-of-REPEATS: this virtualized host shows 2-3x wall variance from
    # hypervisor neighbors (see BENCH.md); best-of converges on the
    # machine's capability like the scaling harness does.  EVERY raw
    # repeat timing is recorded so best-vs-spread is auditable, not just
    # the headline.  Default 6, not 3: measured repeat walls at sf0.1 keep
    # declining past 3 (e.g. 11.7/9.8/9.2/9.0/8.8/8.2 — JVM tier-up plus
    # hypervisor-noise sampling), so best-of-3 systematically undersamples
    # the steady-state capability a long-running production job would see;
    # min over N is monotone in N, so extra repeats only cost bench wall.
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "6")))
    clips = spark.read.parquet(CLIPS_CACHE)
    repeat_secs: list[float] = []
    import threading

    # Sink threads must not swallow failures — a dropped exception would
    # record a silently-short wall as a valid repeat.
    _sink_errs: list[BaseException] = []

    def _sink(df):
        try:
            _force(df)
        except BaseException as e:  # noqa: BLE001 — re-raised after join
            _sink_errs.append(e)

    for _ in range(repeats):
        t0 = time.time()
        res = run_pipeline(clips, DEFAULT_RUN_TS, include_evidence=False)
        # duplicate_pairs first (materializes the dedup funnel caches),
        # then the two independent sinks CONCURRENTLY: each query's
        # serial driver phases (AQE replan rounds between tiny stages —
        # the dominant fixed cost at this corpus size) overlap the
        # other's task execution. Same pattern as tools/scaling_job.py.
        _force(res.duplicate_pairs)
        ths = [threading.Thread(target=_sink, args=(d,))
               for d in (res.results, res.run_metrics)]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        if _sink_errs:
            raise _sink_errs[0]
        repeat_secs.append(round(time.time() - t0, 3))
        release_all()
    clip_sec = min(repeat_secs)
    timings["clips_pipeline"] = round(clip_sec, 3)
    clips_per_sec = round(N_CLIPS / clip_sec, 1)

    # --- audio-payload dedup: fingerprint + LSH + native hamming verify --
    # Decode -> FFT fingerprint -> banded join -> bit_count verify over the
    # SAME pre-materialized clips table as the flagship (throughput of the
    # audio-content dedup path; the corpus has no planted audio dups, so
    # this measures the full-funnel cost, not the pair count).
    from dataquality_spark.caching import cached
    from dataquality_spark.operators.audiodedup import (
        audio_fingerprints,
        fingerprint_pairs,
    )

    # Split sizing per stage shape: the flagship's fused enrich wants 4
    # task-waves per core (balancing), but the audio-dedup family's DSP is
    # one vectorized Arrow pass over the scan — per-task setup dominates at
    # 4 waves, and ONE wave of fat splits measures ~40% faster on the
    # offset matcher (A/B: 128/64/32-split ladder, both directions).
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(max(2 << 20, _dir_bytes(CLIPS_CACHE) // CPUS)))
    audio_clips = spark.read.parquet(CLIPS_CACHE)

    t0 = time.time()
    fp = cached(audio_fingerprints(audio_clips))
    _force(fingerprint_pairs(fp))
    timings["audio_fingerprint_dedup"] = round(time.time() - t0, 3)
    release_all()

    # --- offset-invariant audio dedup (time-shifted copy recovery) ------
    # Inverted-index offset voting + aligned-hamming verify over the same
    # table: the full-funnel cost of the matcher that catches
    # silence-leader shifted copies chunk hashing cannot.
    from dataquality_spark.operators.audiodedup import (
        offset_align_pairs,
        offset_fingerprints,
    )

    t0 = time.time()
    # offset_align_pairs persists its fingerprint input internally
    _force(offset_align_pairs(offset_fingerprints(audio_clips)))
    timings["audio_offset_align_dedup"] = round(time.time() - t0, 3)
    release_all()
    # restore the flagship/catalog split sizing
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    # --- catalog headline queries ---------------------------------------
    for name, q in CATALOG.items():
        if "bench" not in q.tags or name.startswith("clips_"):
            continue
        t0 = time.time()
        _force(q.run(spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)
    release_all()

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "quality_filter_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "clips_per_sec": clips_per_sec,
        "n_clips": N_CLIPS,
        "cpus": CPUS,
        "pipeline_repeats": repeats,
        "pipeline_repeat_secs": repeat_secs,
        "host_load_at_start": load_at_start,
        "host_load_at_end": _host_load(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

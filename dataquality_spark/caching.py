"""Persist/unpersist lifecycle for intermediate DataFrames.

Operators persist slim intermediates that feed multiple consumers (dedup
groups/feats/pairs, the shingle inverted index) — without a paired
``unpersist`` a long session running many queries accumulates cached
blocks until the executor store churns under eviction pressure.  Every
``persist`` in this engine goes through :func:`cached`, which registers
the frame; callers release a whole query's caches with
:func:`release_all` once its outputs are materialized.

Wire-up points:

* ``queries.QueryDef.run`` releases the previous query's caches before
  building the next one (the driver's run-collect-run-collect loop means
  the previous result has always been materialized by then).
* ``bench.py`` / ``tools/scaling_job.py`` release after each timed sink.
* pytest releases via an autouse fixture (``tests/conftest.py``).

Releasing early is safe — an unpersisted lazy frame recomputes instead of
failing — so this is a memory-lifecycle tool, never a correctness hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_LIVE: list[DataFrame] = []


def cached(df: DataFrame, level: StorageLevel | None = None) -> DataFrame:
    """persist() with registration; MEMORY_AND_DISK so big intermediates
    spill instead of evicting each other at scale."""
    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered frame; returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n

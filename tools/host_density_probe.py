"""Host busy-density probe: is per-core capacity constant as more vCPUs
go busy?  (It is on a real cluster node; it is NOT on this virtualized
host — the evidence behind the density-matched scaling protocol in
tools/run_scaling_sim.py and BENCH.md.)

Times each enrich-stage component (WAV decode + stats, langid, char-LM
perplexity, regex scrub, MinHash/bands/BoW, plus the two pure-Python
per-row loops) over deterministically generated clip batches in ONE
single-threaded process.  Run it solo, then K-way concurrent on disjoint
pinned cores, and compare per-process totals:

    taskset -c 0 python tools/host_density_probe.py 16384 solo
    for i in 0 1 2 3 4 5 6 7; do
        taskset -c $i python tools/host_density_probe.py 16384 par$i &
    done; wait

If every heterogeneous component inflates by the same factor at 8-way
(measured on this host: ~1.2-1.4x, drifting minute-to-minute), the cost
is shared silicon / hypervisor (turbo, memory bandwidth, steal), not any
algorithmic contention — there is no cross-process shared state here at
all.  OMP/BLAS threads should be pinned to 1 by the caller.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np  # noqa: F401  (imported for parity with the enrich path)

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    tag = sys.argv[2] if len(sys.argv) > 2 else "solo"
    from dataquality_spark.datagen.clips import clips_pdf
    from dataquality_spark.functions.audio import audio_stats_batch
    from dataquality_spark.functions.langid import get_model as get_langid
    from dataquality_spark.functions.minhash import signature_frame
    from dataquality_spark.functions.perplexity import get_model as get_charlm
    from dataquality_spark.functions.pii import scrub_batch
    from dataquality_spark.functions.texthash import text_hash64
    from dataquality_spark.operators.enrich import _alpha_space_ratio

    pdfs = [clips_pdf(2048, start=i * 2048) for i in range(n // 2048)]
    langid = get_langid()
    charlm = get_charlm()
    t: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        for pdf in pdfs:
            fn(pdf)
        t[name] = round(time.perf_counter() - t0, 3)

    clock("audio", lambda p: audio_stats_batch(p["bytes"].tolist(),
                                               p["codec"].tolist()))
    clock("langid", lambda p: langid.predict_batch(p["transcript"].tolist()))
    clock("ppl", lambda p: charlm.perplexity_batch(p["transcript"].tolist()))
    clock("scrub", lambda p: scrub_batch(p["transcript"].tolist()))
    clock("minhash", lambda p: signature_frame(p["transcript"].tolist()))
    clock("alpha", lambda p: [_alpha_space_ratio(x or "")
                              for x in p["transcript"].tolist()])
    clock("thash", lambda p: [text_hash64(x or "")
                              for x in p["transcript"].tolist()])
    total = round(sum(t.values()), 3)
    print(json.dumps({"tag": tag, "n": len(pdfs) * 2048,
                      "total": total, **t}))


if __name__ == "__main__":
    main()

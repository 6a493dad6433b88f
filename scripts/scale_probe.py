#!/usr/bin/env python
"""One scaling-probe run: steady-state extraction throughput at a given
parallelism. Invoked by bench.py under `taskset` so the JVM, Python
workers, and OS all share exactly N cores — the honest single-box proxy
for an N-executor cluster.

    taskset -c 0-7 python scripts/scale_probe.py 8 <transcripts.parquet>

Prints one JSON line with the best rep plus EVERY rep's wall time,
steal fraction, and pinned-core busy fraction, so a noise-hit window is
self-diagnosing from the recorded JSON alone (round-4 lesson: the
authoritative record showed 0.737 efficiency with no way to tell
co-tenant noise from a plan regression without local re-runs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdftext_spark.operators.extract import plain_text  # noqa: E402
from pdftext_spark.sources.session import build_session  # noqa: E402


def _cpu_ticks():
    """(busy, steal, total) jiffies summed over this process's pinned cores.

    Hypervisor steal is time the VM wanted these cores but the host gave
    them to another tenant — exactly the noise a dedicated cluster node
    would not have — so the probe reports a steal-corrected figure next to
    the raw one. Busy (user+nice+system) over the same window gives the
    utilization of the pinned set: busy_frac ≈ 1.0 at high steal means the
    job kept every granted cycle working and ONLY the stolen ones are
    missing; busy_frac well under 1.0 with low steal would instead point
    at a real parallelism gap in the job.
    """
    pinned = {f"cpu{i}" for i in os.sched_getaffinity(0)}
    busy = steal = total = 0
    with open("/proc/stat") as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] in pinned:
                vals = [int(v) for v in parts[1:]]
                steal += vals[7] if len(vals) > 7 else 0
                busy += sum(vals[:3])
                total += sum(vals[:8])
    return busy, steal, total


def main():
    cores = int(sys.argv[1])
    path = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    # size scan splits to ~2.5x cores so the read parallelizes fully and
    # the salt shuffle is skipped (inputs are already byte-balanced)
    nbytes = sum(os.path.getsize(os.path.join(path, f))
                 for f in os.listdir(path)) if os.path.isdir(path) \
        else os.path.getsize(path)
    mpb = max(1 << 20, int(nbytes / (2.5 * cores)))
    spark = build_session(app=f"scale-probe-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores * 2,
                          max_partition_bytes=str(mpb))
    # warm-up: one full pass (python worker spin-up, JIT, page cache),
    # then best-of-N timed passes (the sandbox host has transient CPU
    # steal; the quietest window is the honest hardware-bound figure)
    plain_text(spark.read.parquet(path)).count()
    rep_log = []
    best = None
    n = 0
    for _ in range(reps):
        b0, s0, t0j = _cpu_ticks()
        t0 = time.time()
        n = plain_text(spark.read.parquet(path)).count()
        dt = time.time() - t0
        b1, s1, t1j = _cpu_ticks()
        denom = max(1, t1j - t0j)
        rep = {"sec": round(dt, 3),
               "steal_frac": round((s1 - s0) / denom, 4),
               "busy_frac": round((b1 - b0) / denom, 4)}
        rep_log.append(rep)
        if best is None or dt < best["sec"]:
            best = rep
    spark.stop()
    corrected = best["sec"] * (1.0 - best["steal_frac"])
    print(json.dumps({"cores": cores, "tps": round(n / best["sec"], 1),
                      "sec": best["sec"], "n": n,
                      "steal_frac": best["steal_frac"],
                      "busy_frac": best["busy_frac"],
                      "reps": rep_log,
                      "tps_steal_corrected": round(n / corrected, 1)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling-probe worker: steady-state extraction throughput at a given
parallelism, pinned under `taskset` so the JVM, Python workers, and OS
all share exactly N cores — the honest single-box proxy for an
N-executor cluster.

Two modes:

  one-shot:  taskset -c 0-7 python scripts/scale_probe.py 8 <parquet> [reps]
             prints one JSON line with best-of-reps + per-rep detail.

  server:    taskset -c 0-7 python scripts/scale_probe.py --serve 8 <parquet>
             builds the session + DataFrame once, warms up, prints
             READY, then runs ONE timed pass per "rep" line on stdin,
             printing one JSON line per rep; "quit" exits. bench.py
             keeps a lo-core and a hi-core server alive on DISJOINT
             core sets and alternates single reps between them, so the
             two sides of every efficiency ratio sample windows seconds
             apart — the round-4 record (efficiency 0.737 vs local 0.97
             on the same binary) was taken with the sides ~a minute
             apart, wide enough for this host's co-tenant swings to land
             on one side only.

The timed rep is `df.count()` on a DataFrame built once: at 10^12 turns
the per-job driver work (parquet listing, plan compile, the salt probe)
amortizes to zero, so it does not belong in a throughput figure; the
rep still runs the full scan + kernel every time (nothing is cached).

Each rep reports hypervisor steal and busy fractions over the pinned
cores: steal is time the host gave these cores to another tenant —
noise a dedicated cluster node would not have — so a steal-corrected
figure rides next to the raw one, and busy-vs-steal makes a bad window
self-diagnosing from the recorded JSON alone.
"""

import json
import os
import sys
import time


def _cpu_ticks():
    """(busy, steal, total) jiffies summed over this process's pinned
    cores."""
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


def _build(cores, path):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from pdftext_spark.operators.extract import plain_text
    from pdftext_spark.sources.session import build_session
    # size scan splits to ~2.5x cores: equal tasks-per-core at every
    # parallelism level (so per-task overhead cancels in the ratio, as
    # it does on a real cluster where both sizes run many waves of
    # identical splits). Finer splits were measured SLOWER at 16 cores
    # (111 one-row-group tasks: 14.8k tps vs 23.7k at 2.5x) — the
    # python-worker per-task round-trip dominates below ~5 MB/task.
    nbytes = (sum(os.path.getsize(os.path.join(path, f))
                  for f in os.listdir(path)) if os.path.isdir(path)
              else os.path.getsize(path))
    mpb = max(1 << 20, int(nbytes / (2.5 * cores)))
    spark = build_session(app=f"scale-probe-{cores}",
                          master=f"local[{cores}]",
                          shuffle_partitions=cores * 2,
                          max_partition_bytes=str(mpb))
    df = plain_text(spark.read.parquet(path))
    n = df.count()  # warm-up: worker spin-up, JIT, page cache
    return spark, df, n


def _one_rep(df):
    b0, s0, t0j = _cpu_ticks()
    t0 = time.time()
    df.count()
    dt = time.time() - t0
    b1, s1, t1j = _cpu_ticks()
    denom = max(1, t1j - t0j)
    return {"sec": round(dt, 4),
            "steal_frac": round((s1 - s0) / denom, 4),
            "busy_frac": round((b1 - b0) / denom, 4)}


def serve(cores, path):
    spark, df, n = _build(cores, path)
    print(json.dumps({"ready": True, "cores": cores, "n": n}), flush=True)
    for line in sys.stdin:
        cmd = line.strip()
        if cmd == "rep":
            rep = _one_rep(df)
            rep["tps"] = round(n / rep["sec"], 1)
            corrected = rep["sec"] * (1.0 - rep["steal_frac"])
            rep["tps_steal_corrected"] = round(n / corrected, 1)
            print(json.dumps(rep), flush=True)
        elif cmd == "quit":
            break
    spark.stop()


def oneshot(cores, path, reps):
    spark, df, n = _build(cores, path)
    rep_log = [_one_rep(df) for _ in range(reps)]
    spark.stop()
    best = min(rep_log, key=lambda r: r["sec"])
    corrected = best["sec"] * (1.0 - best["steal_frac"])
    print(json.dumps({"cores": cores, "tps": round(n / best["sec"], 1),
                      "sec": best["sec"], "n": n,
                      "steal_frac": best["steal_frac"],
                      "busy_frac": best["busy_frac"],
                      "reps": rep_log,
                      "tps_steal_corrected": round(n / corrected, 1)}))


if __name__ == "__main__":
    if sys.argv[1] == "--serve":
        serve(int(sys.argv[2]), sys.argv[3])
    else:
        oneshot(int(sys.argv[1]), sys.argv[2],
                int(sys.argv[3]) if len(sys.argv) > 3 else 3)

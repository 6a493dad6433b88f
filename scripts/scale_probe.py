#!/usr/bin/env python
"""One scaling-probe run: steady-state extraction throughput at a given
parallelism. Invoked by bench.py under `taskset` so the JVM, Python
workers, and OS all share exactly N cores — the honest single-box proxy
for an N-executor cluster.

    taskset -c 0-7 python scripts/scale_probe.py 8 <transcripts.parquet>

Prints one JSON line {"cores": N, "tps": ..., "sec": ..., "n": ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdftext_spark.operators.extract import plain_text  # noqa: E402
from pdftext_spark.sources.session import build_session  # noqa: E402


def main():
    cores = int(sys.argv[1])
    path = sys.argv[2]
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
    # then best-of-3 timed passes (the sandbox host has transient CPU
    # steal; the quietest window is the honest hardware-bound figure)
    plain_text(spark.read.parquet(path)).count()
    best = None
    n = 0
    for _ in range(3):
        t0 = time.time()
        n = plain_text(spark.read.parquet(path)).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    spark.stop()
    print(json.dumps({"cores": cores, "tps": round(n / best, 1),
                      "sec": round(best, 3), "n": n}))


if __name__ == "__main__":
    main()

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
    spark = build_session(app=f"scale-probe-{cores}", master=f"local[{cores}]",
                          shuffle_partitions=cores * 2)
    # warm-up: one full pass (python worker spin-up, JIT, page cache)
    plain_text(spark.read.parquet(path)).count()
    t0 = time.time()
    n = plain_text(spark.read.parquet(path)).count()
    dt = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "tps": round(n / dt, 1),
                      "sec": round(dt, 3), "n": n}))


if __name__ == "__main__":
    main()

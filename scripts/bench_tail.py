#!/usr/bin/env python
"""One-shot latency sweep of the UNGATED registry tail (round-5 VERDICT
item 7): the driver bench times 8 headline queries; the other ~60
replica-verified operators carried correctness proof but no cost-sanity
number — which is how round 4's `_let`-class simhash blowup (44 s for a
row-wise query) survived until someone happened to time it. This sweep
runs every ungated query once through the noop sink at the given tier
and prints one JSON line per query plus a sorted markdown table for
BENCH.md.

    python scripts/bench_tail.py [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdftext_spark.queries import UNGATED_QUERIES, unpersist_registered  # noqa: E402
from pdftext_spark.sources.session import build_session  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = build_session(app="bench-tail", master=f"local[{cores}]",
                          shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name, (fn, _sql) in sorted(UNGATED_QUERIES.items()):
        unpersist_registered()
        spark.catalog.clearCache()
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            results[name] = dt
            print(json.dumps({"query": name, "sec": dt}), flush=True)
        except Exception as e:
            results[name] = None
            print(json.dumps({"query": name, "err": str(e)[:200]}),
                  flush=True)
    spark.stop()
    timed = {k: v for k, v in results.items() if v is not None}
    errored = sorted(k for k in results if results[k] is None)
    print("\n| query | sec |\n|---|---|")
    for name in errored:
        print(f"| {name} | ERROR |")
    for name, dt in sorted(timed.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {dt} |")
    print(json.dumps({"metric": "ungated tail latency", "sf": sf_dir,
                      "cores": cores, "queries": results,
                      "errors": errored,
                      "total_sec": round(sum(timed.values()), 1)}))


if __name__ == "__main__":
    main()

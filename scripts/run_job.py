#!/usr/bin/env python
"""Production job entry point — ship via:

    zip -r pdftext_spark.zip pdftext_spark
    spark-submit --py-files pdftext_spark.zip scripts/run_job.py \
        --input <transcripts table/path> --output <output dir> \
        [--buckets 4096] [--max-buckets N] [--sort] [--hyphens] [--keep-chars]

Reads the transcript table, runs checkpoint-resumable incremental
extraction (pdftext_spark/streaming/incremental.py), writes the extracted
table partitioned by conversation bucket plus a per-partition
lineage/metrics table. Rerunning after a failure resumes from the
manifest. On a cluster, drop the local[] master and let spark-submit
--master / --num-executors size the job; `--buckets` should be ~4x the
executor count at 100 TB so a lost executor forfeits little work.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession

from pdftext_spark.config import ExtractConfig
from pdftext_spark.metrics import write_metrics
from pdftext_spark.streaming.incremental import read_output, run_incremental


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--max-buckets", type=int, default=None)
    ap.add_argument("--sort", action="store_true")
    ap.add_argument("--hyphens", action="store_true")
    ap.add_argument("--keep-chars", action="store_true")
    ap.add_argument("--disable-links", action="store_true")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("pdftext_spark-job").getOrCreate()
    cfg = ExtractConfig(sort=args.sort, hyphens=args.hyphens,
                        keep_chars=args.keep_chars,
                        disable_links=args.disable_links,
                        resume_buckets=args.buckets)
    manifest = run_incremental(spark, args.input, args.output, cfg,
                               max_buckets_per_run=args.max_buckets)
    done = len(manifest["completed_buckets"])
    out = read_output(spark, args.output)
    write_metrics(out, args.output + "/metrics", run_id=f"run-{manifest['runs']}")
    print(f"completed {done}/{args.buckets} buckets; "
          f"{out.count()} turns extracted")
    spark.stop()


if __name__ == "__main__":
    main()

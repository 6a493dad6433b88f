#!/usr/bin/env python
"""Pipeline-query entry point — run any registry operator as a job:

    zip -r pdftext_spark.zip pdftext_spark
    spark-submit --py-files pdftext_spark.zip scripts/run_query.py \
        <query> --sf <table dir> --output <parquet dir> \
        [--partitions N] [--list]

`<query>` is any key of the 70-operator registry (pdftext_spark/
queries.py: dedup, sampling, mixing, ANN, text quality, events
analytics, extraction surfaces...). `--sf` points at the directory
holding the input tables (documents/embeddings/events/... parquet;
same layout the correctness gate uses). Output is written as parquet;
with no --output the row count and schema print to stdout (a dry
run / smoke check). `--list` prints the registry and exits.

On a cluster, drop the local[] master and let spark-submit size the
job — every registry operator declares its own shuffle/broadcast
strategy and scales per its docstring.
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="registry operator name")
    ap.add_argument("--sf", default="/root/testdata/sf0.01",
                    help="input table directory")
    ap.add_argument("--output", default=None,
                    help="parquet output dir (omit for a dry run)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="spark.sql.shuffle.partitions override")
    ap.add_argument("--list", action="store_true",
                    help="print the registry and exit")
    args = ap.parse_args()

    from pdftext_spark import queries as Q

    if args.list or not args.query:
        for name, (fn, _sql) in Q.QUERIES.items():
            doc = (fn.__doc__ or "").strip().splitlines()
            print(f"{name:24s} {doc[0] if doc else ''}")
        return 0
    if args.query not in Q.QUERIES:
        print(f"unknown query {args.query!r}; --list shows the registry",
              file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    # bare getOrCreate (same as run_job.py): under spark-submit the
    # submitted --master/--conf win; build_session() would hardcode
    # local[N] + sandbox scan tuning and silently demote a cluster
    # submission to driver-local execution
    builder = SparkSession.builder.appName("pdftext_spark-query")
    if args.partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 str(args.partitions))
    spark = builder.getOrCreate()
    df = Q.QUERIES[args.query][0](spark, args.sf)
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
        print(f"{args.query}: {n} rows -> {args.output}")
    else:
        print(f"{args.query}: {df.count()} rows; schema "
              f"{df.schema.simpleString()}")
    Q.unpersist_registered()
    return 0


if __name__ == "__main__":
    sys.exit(main())

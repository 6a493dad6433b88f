"""Checkpoint-resumable incremental extraction (north_rule; SURVEY.md §2.10,
§4.2 #4).

pdftext is batch-only; the north_rule's "checkpoint-resumable incremental
writes" maps to batch increments over bucketed partitions, not Structured
Streaming: conversations hash into `resume_buckets` buckets, a completed
bucket is recorded in a manifest, and a restarted job skips completed
buckets. Writes are idempotent via dynamic partition overwrite — rerunning
a bucket replaces exactly that bucket's files (the parquet stand-in for an
Iceberg `overwritePartitions`).

Bucketing on conv_id keeps every conversation whole within one bucket, so
the X1 per-conversation ref resolution stays correct bucket-locally while
turn-level salting *inside* the bucket still defeats long-conversation
skew (two different partitioning keys in one job — SURVEY.md §7.3 #13).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdftext_spark.config import ExtractConfig
from pdftext_spark.operators.extract import extract


def _manifest_path(output_dir: str) -> str:
    return os.path.join(output_dir, "_manifest.json")


def read_manifest(output_dir: str) -> dict:
    p = _manifest_path(output_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"completed_buckets": [], "runs": 0}


def _write_manifest(output_dir: str, manifest: dict) -> None:
    os.makedirs(output_dir, exist_ok=True)
    tmp = _manifest_path(output_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, _manifest_path(output_dir))


def run_incremental(spark: SparkSession, input_path: str, output_dir: str,
                    cfg: ExtractConfig = ExtractConfig(),
                    max_buckets_per_run: int | None = None) -> dict:
    """Process not-yet-completed buckets; returns the updated manifest.

    `max_buckets_per_run` caps work per invocation (and simulates a killed
    job in tests: run with a cap, then call again to finish).
    """
    # dynamic partition overwrite is what makes the bucket writes
    # idempotent — but it is session-global state, so restore the
    # caller's setting on exit (a later plain overwrite in the same
    # session must keep full-table-replace semantics)
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        return _run_incremental(spark, input_path, output_dir, cfg,
                                max_buckets_per_run)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def _run_incremental(spark: SparkSession, input_path: str, output_dir: str,
                     cfg: ExtractConfig,
                     max_buckets_per_run: int | None) -> dict:
    buckets = cfg.resume_buckets
    manifest = read_manifest(output_dir)
    done = set(manifest["completed_buckets"])
    todo = [b for b in range(buckets) if b not in done]
    if max_buckets_per_run is not None:
        todo = todo[:max_buckets_per_run]
    if not todo:
        return manifest

    from pdftext_spark.sources.session import load_transcripts
    df = load_transcripts(spark, input_path).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int"))
    part = df.where(F.col("bucket").isin(todo))

    # Phase 1: kernel pass, link urls left as placeholders — written straight
    # to storage so nothing needs to stay pinned in executor memory.
    staged = extract(part.drop("bucket"), cfg, resolve_links=False).withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int"))
    staging = os.path.join(output_dir, "staging")
    staged.write.mode("overwrite").partitionBy("bucket").parquet(staging)

    # Phase 2: X1 ref resolution over the READ-BACK staged buckets (the
    # 100 TB shape: two passes over the table, zero .persist()). Bucketing
    # is by conv_id, so each conversation is complete within this run's
    # buckets and resolution is correct per increment.
    staged_back = spark.read.parquet(staging).where(F.col("bucket").isin(todo))
    if cfg.disable_links:
        resolved = staged_back
    else:
        from pdftext_spark.operators.refs import resolve_refs
        resolved = resolve_refs(staged_back.drop("bucket"), persist=False) \
            .withColumn("bucket",
                        F.pmod(F.xxhash64("conv_id"), F.lit(buckets)).cast("int"))
    (resolved.write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(output_dir, "data")))

    manifest["completed_buckets"] = sorted(done | set(todo))
    manifest["runs"] += 1
    _write_manifest(output_dir, manifest)
    if len(manifest["completed_buckets"]) == buckets:
        # all buckets resolved into data/: the phase-1 staging copy is
        # dead weight (a full second copy of the corpus at scale).
        # Mid-job it must survive — a killed run resumes by re-reading
        # its own staged buckets — so delete only at completion.
        import shutil
        shutil.rmtree(staging, ignore_errors=True)
    return manifest


def read_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(output_dir, "data"))

"""SparkSession builder with the engine's tuned defaults.

Sandbox runs local[N]; on a real cluster the same confs apply (AQE,
Arrow). Iceberg: this container has no Iceberg runtime jar, so tables
round-trip through partitioned parquet; `load_transcripts`/`write_output`
are the single seam where `format("iceberg")` would be swapped in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def build_session(app: str = "pdftext_spark", master: str | None = None,
                  shuffle_partitions: int | None = None,
                  max_partition_bytes: str | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or max(cpus * 2, 8)
    # sandbox inputs are tens of MB, so the 128 MB default collapses the
    # scan into one task; on a real cluster with TB inputs leave the default
    mpb = max_partition_bytes or os.environ.get(
        "PDFTEXT_SPARK_MAX_PARTITION_BYTES", "4m")
    return (
        SparkSession.builder
        .appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.files.maxPartitionBytes", mpb)
        .config("spark.sql.files.openCostInBytes", "262144")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the Python worker round-trip; the
        # kernel is batch-vectorized so larger is strictly better until
        # memory pressure
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PDFTEXT_SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Iceberg-seam: read the transcript table (parquet in the sandbox)."""
    return spark.read.parquet(path)


def write_output(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Iceberg-seam: write an output table."""
    df.write.mode(mode).parquet(path)

"""Per-partition lineage/metrics (SURVEY.md §4.2 #3).

The analog of the reference benchmark's per-doc times/alignments dict
(benchmark/benchmark.py:72-99), kept as a tiny table per job run so a
10^12-turn job has an auditable record of what each partition processed:
turn counts in/out, char/span/block totals, empty-text and error turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_metrics(extracted: DataFrame) -> DataFrame:
    """Aggregate kernel output by physical partition."""
    return (extracted
            .withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(F.count("*").alias("n_turns"),
                 F.countDistinct("conv_id").alias("n_convs"),
                 F.sum("n_chars").alias("n_chars"),
                 F.sum("n_spans").alias("n_spans"),
                 F.sum("n_blocks").alias("n_blocks"),
                 F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0))
                 .alias("n_error_turns"),
                 F.sum(F.when(F.length("text") == 0, 1).otherwise(0))
                 .alias("n_empty_turns"),
                 F.sum(F.when(F.col("is_html"), 1).otherwise(0))
                 .alias("n_html_turns")))


def corpus_metrics(extracted: DataFrame) -> DataFrame:
    """Whole-run roll-up (single row) — the A7/A8 analog."""
    return (extracted.agg(
        F.count("*").alias("n_turns"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_spans").alias("n_spans"),
        F.sum("n_blocks").alias("n_blocks"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("n_error_turns"),
    ))


def write_metrics(extracted: DataFrame, path: str, run_id: str) -> None:
    df = partition_metrics(extracted).withColumn("run_id", F.lit(run_id))
    df.coalesce(1).write.mode("append").parquet(path)

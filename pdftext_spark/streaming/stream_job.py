"""Structured Streaming wrapper around the extraction kernel.

The reference is batch-only (SURVEY.md §2.10) and the production design is
batch increments over snapshots (incremental.py). This wrapper covers the
continuous-ingest deployment: new transcript files landing in a directory
are picked up by a file-source stream, extracted with the same kernel, and
written exactly-once. ``trigger=availableNow`` drains the backlog and
stops — the streaming analog of one incremental run.

Exactly-once mechanics: ``foreachBatch`` alone is only at-least-once — if
the driver dies between a batch's write and its checkpoint commit, the
epoch re-runs on restart and a blind append would duplicate every row.
The sink is therefore made idempotent by keying the output on the epoch:
each micro-batch OVERWRITES ``output_dir/epoch=<epoch_id>``, so a
re-delivered epoch replaces its own previous (possibly partial) output
instead of appending next to it. Readers use ``read_stream_output``
(epoch is a partition column they never see).

Note: cross-turn ref resolution (X1) needs conversation-complete input, so
the streaming path runs with links disabled (placeholders kept); a
downstream batch pass resolves them once conversations are closed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pdftext_spark.config import ExtractConfig
from pdftext_spark.operators.extract import extract
from pdftext_spark.operators.schema import TRANSCRIPT


def run_stream(spark: SparkSession, input_dir: str, output_dir: str,
               checkpoint_dir: str, cfg: ExtractConfig = ExtractConfig()) -> None:
    stream = spark.readStream.schema(TRANSCRIPT).parquet(input_dir)

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        out = extract(batch_df, cfg, resolve_links=False)
        # epoch-keyed overwrite = idempotent redelivery (see module doc)
        out.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"epoch={int(epoch_id)}"))

    q = (stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def read_stream_output(spark: SparkSession, output_dir: str) -> DataFrame:
    """The extracted rows across all epochs; the epoch partition column
    is an idempotency key, not data, so it is dropped."""
    return spark.read.option("basePath", output_dir) \
        .parquet(output_dir).drop("epoch")

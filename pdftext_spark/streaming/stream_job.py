"""Structured Streaming wrapper around the extraction kernel.

The reference is batch-only (SURVEY.md §2.10) and the production design is
batch increments over snapshots (incremental.py). This wrapper covers the
continuous-ingest deployment: new transcript files landing in a directory
are picked up by a file-source stream, extracted with the same kernel, and
appended exactly-once via the streaming checkpoint. ``trigger=availableNow``
drains the backlog and stops — the streaming analog of one incremental run.

Note: cross-turn ref resolution (X1) needs conversation-complete input, so
the streaming path runs with links disabled (placeholders kept); a
downstream batch pass resolves them once conversations are closed.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from pdftext_spark.config import ExtractConfig
from pdftext_spark.operators.extract import extract
from pdftext_spark.operators.schema import TRANSCRIPT


def run_stream(spark: SparkSession, input_dir: str, output_dir: str,
               checkpoint_dir: str, cfg: ExtractConfig = ExtractConfig()) -> None:
    stream = spark.readStream.schema(TRANSCRIPT).parquet(input_dir)

    def process(batch_df, epoch_id: int) -> None:
        out = extract(batch_df, cfg, resolve_links=False)
        out.write.mode("append").parquet(output_dir)

    q = (stream.writeStream
         .foreachBatch(process)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

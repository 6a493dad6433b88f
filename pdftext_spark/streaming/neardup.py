"""Streaming NEAR-dup dedup at ingest — the online twin of
queries.q_dedup_minhash_lsh (as streaming/dedup.py is to q_dedup_exact).

Semantics: bucket-first-seen. Every document's MinHash signature is cut
into LSH bands; a document is admitted iff NONE of its band buckets has
been produced by any earlier document (earlier micro-batch, or a
smaller doc_id within the same micro-batch). The rule is uniform across
batch boundaries because the state table records the buckets of EVERY
processed document, admitted or not — state is the full LSH index,
O(docs x bands), exactly what a production near-dup index stores.

Why foreachBatch and not a stateful operator: the admit decision is a
conjunction across a document's buckets ("no bucket seen anywhere"),
but per-bucket state lives under different shuffle keys — deciding one
document needs ALL its buckets' verdicts, which would take a second
stateful aggregation after applyInPandasWithState, a chain Structured
Streaming does not support for arbitrary stateful ops. foreachBatch is
the idiomatic production shape: the engine still provides checkpointed
source offsets and batch-replay, and the batch body is plain DataFrame
code joining against a persistent state table.

Exactly-once: both sinks (admitted docs, new state buckets) write to
epoch=<id> partition directories with overwrite — a replayed epoch
replaces its own output instead of duplicating it — and the state read
for epoch N filters to epoch < N, so a replay never sees its own
partial writes.

Scale notes (100 TB): state and output are parquet here, Iceberg tables
in production (same dynamic-overwrite idempotency); the state join is a
plain equi-join on (band_idx, band_hash) sized by batch-bands x index —
with a date- or hash-bucketed state layout Spark prunes the index scan
to the buckets the batch actually touches. The within-batch self-join
is micro-batch-sized. Signatures are row-wise (zero shuffle), reusing
the SAME expression trees the gated batch query ships.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdftext_spark.queries import minhash_bands, minhash_signature

_STATE_SCHEMA = "band_idx int, band_hash string, doc_id long"


def _epoch_dir(root: str, epoch_id: int) -> str:
    return os.path.join(root, f"epoch={int(epoch_id)}")


def _read_state(spark, state_dir: str, before_epoch: int) -> DataFrame:
    """Band buckets from all COMMITTED epochs strictly before this one."""
    if os.path.isdir(state_dir) and any(
            e.startswith("epoch=") for e in os.listdir(state_dir)):
        s = spark.read.schema(_STATE_SCHEMA).option("basePath", state_dir) \
            .parquet(state_dir)
        return s.where(F.col("epoch") < before_epoch) \
            .select("band_idx", "band_hash")
    return spark.createDataFrame([], _STATE_SCHEMA) \
        .select("band_idx", "band_hash")


def neardup_batch(batch_df: DataFrame, epoch_id: int,
                  state_dir: str, admitted_dir: str) -> None:
    """foreachBatch body: admit first-seen-by-bucket docs, index all."""
    spark = batch_df.sparkSession
    bands = minhash_bands(minhash_signature(
        batch_df.select("doc_id", "text"))).persist()
    try:
        seen_before = _read_state(spark, state_dir, int(epoch_id))
        dup_state = (bands.join(seen_before, ["band_idx", "band_hash"],
                                "left_semi")
                     .select("doc_id").distinct())
        a, b = bands.alias("a"), bands.alias("b")
        dup_batch = (a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                            & (F.col("a.band_hash") == F.col("b.band_hash"))
                            & (F.col("a.doc_id") > F.col("b.doc_id")))
                     .select(F.col("a.doc_id").alias("doc_id")).distinct())
        dup = dup_state.union(dup_batch).distinct()
        admitted = batch_df.join(dup, "doc_id", "left_anti")
        (admitted.write.mode("overwrite")
         .parquet(_epoch_dir(admitted_dir, epoch_id)))
        # index EVERY processed doc's buckets (uniform rule, see module doc)
        (bands.write.mode("overwrite")
         .parquet(_epoch_dir(state_dir, epoch_id)))
    finally:
        bands.unpersist()


def neardup_stream(docs: DataFrame, state_dir: str, admitted_dir: str,
                   checkpoint: str, trigger_available_now: bool = True):
    """Wire a (doc_id, text) readStream into the near-dup ingest.
    Returns the started StreamingQuery."""
    writer = (docs.writeStream
              .foreachBatch(lambda df, eid: neardup_batch(
                  df, eid, state_dir, admitted_dir))
              .option("checkpointLocation", checkpoint))
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming first-seen dedup (applyInPandasWithState) verified against
batch truth: exactly one emission per distinct content, keeper = first
arrival, duplicates dropped across micro-batch boundaries."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def dup_stream_dir(spark, tmp_path):
    """Two file batches over the documents corpus with synthesized exact
    duplicates: batch 1 = docs 0..N/2; batch 2 = the rest PLUS copies of
    ten batch-1 texts under new doc_ids (cross-batch dups) and one
    batch-2 text duplicated within the batch (intra-batch dup)."""
    src = (spark.read.parquet(os.path.join(SF, "documents.parquet"))
           .select("doc_id", "text"))
    n = src.count()
    mid = n // 2
    d = str(tmp_path / "docs_in")
    b1 = src.where(F.col("doc_id") < mid)
    b1.coalesce(1).write.parquet(d)
    dup_cross = (b1.orderBy("doc_id").limit(10)
                 .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    dup_intra = (src.where(F.col("doc_id") >= mid).orderBy("doc_id").limit(1)
                 .select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text"))
    b2 = src.where(F.col("doc_id") >= mid).union(dup_cross).union(dup_intra)
    b2.coalesce(1).write.mode("append").parquet(d)
    return d, n


def test_dedup_stream_first_seen_semantics(spark, dup_stream_dir, tmp_path):
    from pdftext_spark.streaming.dedup import dedup_stream

    d, n = dup_stream_dir
    schema = spark.read.parquet(d).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    q = (dedup_stream(stream).writeStream
         .format("memory").queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ckpt_d"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {r["text_hash"]: (r["doc_id"], r["n_chars"])
           for r in spark.sql("SELECT * FROM dedup_out").collect()}

    # batch truth over the SAME input files: distinct texts, keeper =
    # min doc_id (ingest order here IS doc_id order, so first-arrival
    # and global-min agree — the documented agreement condition)
    batch = (spark.read.parquet(d)
             .groupBy(F.md5("text").alias("h"))
             .agg(F.min("doc_id").alias("keeper"),
                  F.count("*").alias("copies"),
                  F.min(F.length("text")).cast("long").alias("n_chars"))
             .collect())
    exp = {r["h"]: (r["keeper"], r["n_chars"]) for r in batch}

    assert got == exp
    # the synthesized duplicates were really dropped: emissions = distinct
    # texts = n originals (every synthetic copy collides with an original)
    assert len(got) == n
    copies = {r["h"]: r["copies"] for r in batch}
    assert sum(copies.values()) == n + 11
    # none of the synthetic doc_ids won a keeper slot
    assert all(keeper < 1_000_000 for keeper, _ in got.values())

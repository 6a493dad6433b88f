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


def test_dedup_stream_state_survives_restart(spark, tmp_path):
    """The seen-set lives in the checkpointed state store: a NEW query
    (fresh process in production) resuming from the same checkpoint must
    still drop duplicates of texts admitted before the restart, and admit
    only genuinely new content."""
    from pyspark.sql import functions as F  # noqa: F401

    from pdftext_spark.streaming.dedup import dedup_stream

    d = str(tmp_path / "docs_in")
    out = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"
    (spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")], schema)
     .coalesce(1).write.parquet(d))

    def run():
        # parquet sink: the memory sink refuses checkpoint recovery by
        # design (not fault-tolerant); a file sink is what an ingest
        # pipeline writes anyway
        stream = (spark.readStream.schema(spark.read.parquet(d).schema)
                  .option("maxFilesPerTrigger", 1).parquet(d))
        q = (dedup_stream(stream).writeStream
             .format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r["doc_id"], r["n_chars"])
                for r in spark.read.parquet(out).collect()}

    first = run()
    assert first == {(1, 10), (2, 11)}  # doc 3 dropped intra-run

    # "restart": new files arrive, a NEW query object resumes from the
    # same checkpoint — the parquet sink accumulates across restarts
    (spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon"), (12, "gamma delta"),
         (13, "epsilon")], schema)
     .coalesce(1).write.mode("append").parquet(d))
    second = run()
    # only the genuinely new text is admitted after the restart;
    # pre-restart content is remembered and dropped without rescanning
    assert second == first | {(11, 7)}

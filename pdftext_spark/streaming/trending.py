"""Streaming TRENDING terms — watermarked sliding-window frequency
counts with per-window top-k, the "what is spiking right now" primitive
every ingest dashboard runs.

Shape: `trending_stream` is a pure Structured Streaming windowed
aggregation — event-time sliding windows (10 min length, 5 min slide)
with a 10 min watermark, APPEND output mode, so a (window, term, count)
row is emitted exactly once, when the watermark finalizes its window.
State is bounded by (open windows x live terms); late events inside the
watermark still count, later ones are dropped by contract. The top-k
rank is `top_k`, a plain batch transform applied to finalized windows
(in production inside foreachBatch, exactly the streaming/neardup.py
pattern) because Structured Streaming cannot rank inside an unfinished
window — and ranking unfinalized counts would emit retractions.

Scale notes (100 TB/day): the windowed count partial-aggregates
map-side before the (window, term) shuffle, the same pre-aggregated-
rows-only property as the batch sketch queries; hot terms partial-sum
instead of routing raw events; per-window top-k runs on finalized
count rows (vocabulary-sized per window, not event-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

WINDOW = "10 minutes"
SLIDE = "5 minutes"
WATERMARK = "10 minutes"
TOP_K = 3


def trending_stream(events: DataFrame) -> DataFrame:
    """(ts, event_type, ...) stream -> append-mode finalized
    (win_start, win_end, term, n) sliding-window counts."""
    # parquet timestamps arrive NTZ; watermarks require TIMESTAMP — the
    # session runs UTC so the cast is a type retag, not a clock shift
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", WATERMARK)
            .groupBy(F.window("ts", WINDOW, SLIDE).alias("w"),
                     F.col("event_type").alias("term"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"),
                    F.col("w.end").alias("win_end"), "term",
                    F.col("n").cast("long").alias("n")))


def top_k(finalized: DataFrame, k: int = TOP_K) -> DataFrame:
    """Per-window top-k by (count desc, term asc) over finalized count
    rows — deterministic full tiebreak, rank gaps impossible
    (row_number, not rank)."""
    w = Window.partitionBy("win_start", "win_end") \
        .orderBy(F.desc("n"), F.asc("term"))
    return (finalized
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("win_start", "win_end", "term", "n",
                    F.col("rk").cast("long").alias("rk")))

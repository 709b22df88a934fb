"""Structured Streaming over the events table.

The reference has no event-time streaming (its loop is a 1 s polling tick —
SURVEY §2.10), so these are engine-introduced capabilities: a windowed
metrics feed with watermarked late-data handling, the streaming analog of
the crawl engine's metrics rollup (A4/A5).  The parquet source stands in
for kafka in this sandbox; the query graph is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def windowed_event_counts(events: DataFrame, window: str = "1 hour", watermark: str = "30 minutes") -> DataFrame:
    """Tumbling-window counts + value sums with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def run_stream_once(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """Drive the streaming query to completion over the parquet-backed
    source (memory sink; `processAllAvailable` makes it synchronous)."""
    # the streaming parquet source wants a directory; events.parquet is a
    # single file → point at the dir with a glob filter
    src = (
        spark.readStream.schema(EVENTS_DDL)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    agg = windowed_event_counts(src, window=window)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("event_counts_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM event_counts_stream")


def batch_equivalent(spark: SparkSession, sf_dir: str, window: str = "1 hour") -> DataFrame:
    """The same aggregation in batch — the streaming result must match."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_sum")
    )

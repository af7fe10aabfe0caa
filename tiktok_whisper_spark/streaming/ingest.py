"""Structured Streaming ingestion of transcript/event streams.

The reference is batch-only (its "streams" are job queues, SURVEY §2.9), so
the engine adds the streaming ingestion path a transcript pipeline needs at
scale: files/Kafka → watermarked windowed aggregates → sink. The same
DataFrame expressions as the batch operators; only the source/sink differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_event_stream", "windowed_event_counts", "run_to_memory_sink"]

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a parquet directory (Kafka on a cluster —
    swap ``format``; the transformations below are source-agnostic)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "5 minutes", slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event type — the
    streaming twin of ``agg_queue_stats`` (A8). Late rows beyond the
    watermark are dropped deterministically."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "cnt",
            "total_value",
        )
    )


def run_to_memory_sink(agg: DataFrame, name: str) -> DataFrame:
    """Drive a bounded file-backed stream to completion synchronously and
    return the materialized result (smoke/test harness; a real deployment
    uses a durable sink + trigger)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return agg.sparkSession.sql(f"SELECT * FROM {name}")

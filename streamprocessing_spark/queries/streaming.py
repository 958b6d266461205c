"""Streaming queries — the reference's raison d'être on Structured
Streaming, still oracle-checked: each stream is replayed to completion
(AvailableNow) and its end-of-stream result must equal the batch SQL.

Streaming-only semantics (update-mode emission per input, checkpoint
recovery across restarts — the RainStormWithFail analogue) are asserted in
tests/test_streaming.py, where a batch oracle can't express them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from streamprocessing_spark.registry import register
from streamprocessing_spark.streaming.replay import run_to_memory_sink, stream_events


@register(
    "streaming_count_update",
    oracle="""
    SELECT event_type AS key, count(*) AS cnt FROM events GROUP BY event_type
    """,
    tags=("streaming", "reference", "aggregate"),
)
def streaming_count_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 as a true stream (rainstorm/server.go:344-355): keyed running
    count with managed state, replayed to end-of-stream. The state store
    plays the role of the reference's in-memory map + WAL replay; the
    batch oracle checks the final counts (SURVEY.md §4.3.1)."""
    counts = (
        stream_events(spark, sf_dir)
        .select(F.col("event_type").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return run_to_memory_sink(counts, "complete")


@register(
    "streaming_append_sink",
    oracle="""
    SELECT event_id AS key, CAST(value AS VARCHAR) AS value
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("streaming", "reference", "sink"),
)
def streaming_append_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10/D2 (rainstorm/server.go:306-310, batchLogger.go): stateless
    filter+project streamed to an append sink. The reference's 500 ms
    batch flush is the micro-batch trigger; here AvailableNow drains the
    bounded replay."""
    out = (
        stream_events(spark, sf_dir)
        .where(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("key"), F.col("value").cast("string").alias("value"))
    )
    return run_to_memory_sink(out, "append")


@register(
    "streaming_dedup_by_id",
    oracle="""
    SELECT event_id, event_type FROM events
    """,
    tags=("streaming", "reference", "dedup"),
)
def streaming_dedup_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9 exactly-once dedup as streaming state (rainstorm/server.go:292-298):
    dropDuplicates over the stream holds seen-ids in the state store — the
    reference's unbounded processedRecordIDs map (SURVEY.md §4.3.4), which
    production jobs bound with withWatermark before dropDuplicates."""
    deduped = (
        stream_events(spark, sf_dir)
        .select("event_id", "event_type")
        .dropDuplicates(["event_id"])
    )
    return run_to_memory_sink(deduped, "append")


@register(
    "streaming_windowed_count",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS VARCHAR) || ' UTC' AS window_start,
           event_type,
           count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
    tags=("streaming", "window", "event-time"),
)
def streaming_windowed_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window + watermark — the operator family the
    reference lacks entirely (SURVEY.md §2.1: no event-time, no
    watermarks). Complete output mode so end-of-stream equals the batch
    rollup including still-open windows."""
    ev = stream_events(spark, sf_dir).withWatermark("ts", "1 hour")
    counts = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss"), F.lit(" UTC")
            ).alias("window_start"),
            "event_type",
            "cnt",
        )
    )
    return run_to_memory_sink(counts, "complete")

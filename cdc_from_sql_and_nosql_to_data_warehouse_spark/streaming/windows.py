"""Streaming analytics surface (SURVEY.md §2.2 B31-B38): event-time
windows, watermarks, stream-static joins.

Plain DataFrame→DataFrame functions over a streaming source; batch
frames work too (Spark windows are mode-agnostic), which is how the
unit tests pin the semantics before the streaming tests replay them
through a memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.exact import dec


def tumbling_counts(
    events: DataFrame, ts: str = "ts", width: str = "5 minutes", watermark: str | None = None
) -> DataFrame:
    """B31 tumbling window aggregation — the reference's 5-minute tick
    cadence (cdk_infrastructure/__init__.py:693) as an event-time window."""
    df = events.withWatermark(ts, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts, width).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, ts: str = "ts", width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """B32 sliding window aggregation."""
    return (
        events.groupBy(F.window(ts, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
    )


def session_counts(events: DataFrame, ts: str = "ts", gap: str = "5 minutes") -> DataFrame:
    """B33 session windows per user (gap-based)."""
    return (
        events.groupBy(F.session_window(ts, gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n",
        )
    )


def enrich_stream(stream_df: DataFrame, dim_df: DataFrame, key: str) -> DataFrame:
    """B37 stream-static join: change events enriched against a
    dimension table (broadcast — never shuffle a stream against a dim)."""
    return stream_df.join(F.broadcast(dim_df), key, "left")

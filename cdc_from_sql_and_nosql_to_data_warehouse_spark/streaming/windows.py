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

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.exact import dsum


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
            dsum("value").alias("sum_value"),
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
    events: DataFrame,
    ts: str = "ts",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """B32 sliding window aggregation.  Pass ``watermark`` on streams:
    without one, append mode is rejected outright and complete mode
    accumulates window state forever (unbounded state growth — the
    watermark is what lets Spark retire closed windows)."""
    df = events.withWatermark(ts, watermark) if watermark else events
    return (
        df.groupBy(F.window(ts, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), "n")
    )


def session_counts(
    events: DataFrame,
    ts: str = "ts",
    gap: str = "5 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """B33 session windows per user (gap-based).  Same watermark
    contract as ``sliding_counts`` — session windows REQUIRE one on
    streams (a session only closes when the watermark passes its
    gap)."""
    df = events.withWatermark(ts, watermark) if watermark else events
    return (
        df.groupBy(F.session_window(ts, gap).alias("w"), F.col("user_id"))
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


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_key: str | None = None,
    right_ts: str | None = None,
    watermark: str = "10 minutes",
    within: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """B37′ stream-stream interval join (impression↔click attribution
    shape): rows pair when keys match and the right event lands within
    ``within`` AFTER the left event.

    The right side's key/ts columns are named by ``right_key`` /
    ``right_ts`` (defaulting to the left side's names) and are renamed
    INTERNALLY to the output's ``r_{key}`` / ``rts`` — callers never
    pre-rename.  A right stream already carrying the ``r_``-prefixed
    names is accepted as-is; a right stream with neither name raises
    immediately instead of failing with an unresolved-column error at
    join resolution.

    Both sides carry watermarks and the join condition bounds
    rts ∈ [left_ts, left_ts + within] — that pair is what lets the
    state store EVICT: without the time bound Spark would buffer both
    streams forever; with it, each side's state is capped at
    watermark + within of data per key regardless of stream length.
    ``how='leftOuter'`` emits unmatched left rows (with nulls) once the
    watermark passes their eviction point — exactly the "impression
    with no click" attribution output."""

    def _as(df: DataFrame, src: str, dst: str, explicit: bool) -> DataFrame:
        # an EXPLICITLY named source column always wins: when the
        # caller passes right_key/right_ts, a stale pre-existing
        # r_{key}/rts column must not silently hijack the join
        # (review-caught); the rename drops the stale one.  Only when
        # the caller names nothing do we accept an already-renamed
        # frame as-is.
        if explicit:
            if src not in df.columns:
                raise ValueError(
                    f"right stream lacks the named column {src!r}; columns: {df.columns}"
                )
            if dst in df.columns and src != dst:
                df = df.drop(dst)
            return df.withColumnRenamed(src, dst) if src != dst else df
        if dst in df.columns:
            return df
        if src not in df.columns:
            raise ValueError(
                f"right stream has neither {src!r} nor {dst!r}; columns: {df.columns}"
            )
        return df.withColumnRenamed(src, dst)

    r = _as(right, right_key or key, f"r_{key}", explicit=right_key is not None)
    r = _as(r, right_ts or left_ts, "rts", explicit=right_ts is not None)
    lw = left.withWatermark(left_ts, watermark)
    rw = r.withWatermark("rts", watermark)
    cond = (
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col("rts") >= F.col(left_ts))
        & (F.col("rts") <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, how)

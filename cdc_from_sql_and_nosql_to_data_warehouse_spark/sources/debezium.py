"""Debezium change-event envelope decoding.

The reference tails its SQL source's binlog with AWS DMS
(cdk_infrastructure/__init__.py:257-282, migration_type
"full-load-and-cdc" with ROW/full-image binlog at :107-110).  The
open equivalent of that capture path is Debezium publishing to Kafka,
which is this engine's production CDC source: Kafka `value` bytes carry
a JSON envelope

    {"before": {...}|null, "after": {...}|null,
     "op": "c"|"r"|"u"|"d", "ts_ms": <epoch millis>, "source": {...}}

This module maps that envelope onto the engine's internal change-event
model (streaming/cdc.py CHANGE_EVENT_SCHEMA semantics):

    op c (create), r (snapshot read)  → INSERT
    op u (update)                     → MODIFY
    op d (delete)                     → REMOVE  (image = before)

Everything is column expressions (`from_json` + struct navigation) —
JVM-side, codegen'd, no Python in the hot path — so decode throughput
is scan throughput.  The same `decode_debezium` body serves batch
frames and streaming micro-batches unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_envelope_schema(payload: T.StructType) -> T.StructType:
    """Envelope struct for a given table payload schema.  `source` is
    kept as a loose map — connector metadata drifts across Debezium
    versions, and we only ever read well-known keys from it."""
    return T.StructType(
        [
            T.StructField("before", payload, True),
            T.StructField("after", payload, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("source", T.MapType(T.StringType(), T.StringType()), True),
        ]
    )


def decode_debezium(
    df: DataFrame,
    payload: T.StructType,
    value_col: str = "value",
    seq_col: str | None = None,
    keep_raw: bool = False,
) -> DataFrame:
    """Decode a column of Debezium JSON envelopes into normalized change
    events: eventName ∈ {INSERT, MODIFY, REMOVE}, image (after-image,
    or before-image for deletes), seq.  Unknown `op` codes pass through
    as eventName=null so split_change_events can route them to the
    error channel instead of killing the job.

    ``seq_col``: the per-key order carrier.  When the frame comes from
    Kafka, pass its ``offset`` — the partition offset is a TRUE per-key
    total order (a key maps to one partition), while the default
    ``ts_ms`` has millisecond granularity and lets two same-millisecond
    updates to one key tie, where the merge's deterministic tiebreak
    can pick the stale image (review-caught).  File-fed frames without
    an offset fall back to ts_ms.

    ``keep_raw``: retain the raw envelope string as ``_raw`` so
    error-channel records stay quarantinable/replayable (an unknown-op
    row with a nulled image is otherwise contentless — the A10
    raw-line policy of read_json_with_error_channel applied here)."""
    env = F.from_json(F.col(value_col).cast("string"), debezium_envelope_schema(payload))
    seq = (
        F.coalesce(F.col(seq_col).cast("long"), F.col("_env.ts_ms"))
        if seq_col
        else F.col("_env.ts_ms")
    )
    extra = (
        [F.col(value_col).cast("string").alias("_raw")] if keep_raw else []
    )
    return df.withColumn("_env", env).select(
        *[c for c in df.columns if c != value_col],
        F.when(F.col("_env.op").isin("c", "r"), "INSERT")
        .when(F.col("_env.op") == "u", "MODIFY")
        .when(F.col("_env.op") == "d", "REMOVE")
        .alias("eventName"),
        F.coalesce(F.col("_env.after"), F.col("_env.before")).alias("image"),
        seq.alias("seq"),
        *extra,
    )


def decode_kafka_frames(
    raw: DataFrame, payload: T.StructType, keep_raw: bool = False
) -> DataFrame:
    """Kafka wire frames (``key``/``value``, binary or string) →
    decoded change events.  Shared by the broker-backed stream below
    and the file-fed test harness (tests/test_cdc.py) — everything
    after `.load()` is broker-independent, so the whole decode path is
    exercised without a Kafka container.

    Debezium DELETE TOMBSTONES (value=null, emitted after each op=d
    for log compaction) are filtered here: they carry no data and are
    routine, not corrupt — without the filter every delete would also
    write an all-null row to the error channel (review-caught).  The
    partition ``offset`` (when present) becomes seq — see
    decode_debezium."""
    cols = [F.col("key").cast("string").alias("key"), "value"]
    seq_col = None
    if "offset" in raw.columns:
        cols.append("offset")
        seq_col = "offset"
    return decode_debezium(
        raw.filter(F.col("value").isNotNull()).select(*cols),
        payload,
        seq_col=seq_col,
        keep_raw=keep_raw,
    )


def to_change_events(decoded: DataFrame, key: str = "id") -> DataFrame:
    """Bridge decoded Debezium events onto the engine's change-event
    envelope (streaming/cdc.py: eventName/seq/newImage/removedId), so
    the Kafka path feeds the same apply_changes / start_merge_stream
    machinery as the file-drop protocol.

    REMOVEs carry the key from the before-image (`image` holds
    `before` for op=d), falling back to the KAFKA KEY when the
    connector ships no usable before-image (Postgres REPLICA IDENTITY
    NOTHING and friends) — without the fallback such deletes decode
    keyless and are excluded from the merge, leaving the row live
    forever (review-caught).  Debezium key JSON is tried with and
    without the schema wrapper; a bare-string key passes through.
    Extra diagnostic columns (``_raw``, ``key``) are preserved so the
    error channel stays replayable."""
    remove_key = F.col(f"image.{key}").cast("string")
    if "key" in decoded.columns:
        remove_key = F.coalesce(
            remove_key,
            F.get_json_object("key", f"$.payload.{key}"),
            F.get_json_object("key", f"$.{key}"),
            F.col("key"),
        )
    passthrough = [c for c in ("_raw",) if c in decoded.columns]
    return decoded.select(
        "eventName",
        "seq",
        F.when(F.col("eventName") != "REMOVE", F.col("image")).alias("newImage"),
        F.when(F.col("eventName") == "REMOVE", remove_key).alias("removedId"),
        *passthrough,
    )


def kafka_debezium_stream(
    spark: SparkSession,
    payload: T.StructType,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Production source: readStream from a Debezium Kafka topic and
    decode.  `maxOffsetsPerTrigger` is the micro-batch bound — the
    analog of the reference's ≤100-records/≤5-s event-source mapping
    (cdk_infrastructure/__init__.py:441-442).  Only the `.load()` line
    needs a broker; the decode applied to it (`decode_kafka_frames`)
    is integration-tested on file-fed Kafka-shaped frames and
    oracle-checked in q_debezium_roundtrip."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return decode_kafka_frames(reader.load(), payload)

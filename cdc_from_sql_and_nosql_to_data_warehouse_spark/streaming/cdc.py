"""CDC core — change-event model and apply semantics (SURVEY.md §2.1
A8-A17, §3.2), shared between batch and streaming.

The reference's NoSQL pipeline: DynamoDB stream records
{eventName ∈ {INSERT, MODIFY, REMOVE}, newImage} are filtered
(REMOVE dropped, unknown → error,
reference: source/write_dynamodb_stream_to_s3_lambda/handler.py:27-38),
staged as NDJSON files with timestamped names (:40-58), and blindly
COPY-appended into the warehouse (load_s3_files…/handler.py:54-71) —
so duplicates accumulate and deletes never propagate (README.md:30).

This module implements BOTH semantics:
- ``append`` mode reproduces the reference (duplicates accumulate,
  REMOVE dropped);
- ``merge`` mode is the corrected apply: per-key latest-wins by
  sequence, REMOVE deletes.

All transformations are plain DataFrame→DataFrame functions, applied
identically to batch frames and to streaming micro-batches via
``foreachBatch`` — the Structured Streaming model (repo:PAPERS.md,
SIGMOD'18).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import TRADES_SCHEMA

ALLOWED_EVENTS = ("INSERT", "MODIFY")

# Change-event envelope (FIXTURES.md §1.3): seq is the monotonic
# per-key order carrier — in the reference it's the staged file's
# timestamped name (write_dynamodb_stream_to_s3_lambda/handler.py:47).
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("eventName", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("newImage", TRADES_SCHEMA, True),
        T.StructField("removedId", T.StringType(), True),
    ]
)


def split_change_events(
    events: DataFrame, allowed: tuple[str, ...] = ALLOWED_EVENTS, keep_remove: bool = False
) -> tuple[DataFrame, DataFrame]:
    """A10: keep INSERT/MODIFY (and REMOVE when merging), route unknown
    event names to an error channel instead of the reference's raise —
    a per-row raise would kill the whole job on one bad record at scale."""
    known = allowed + (("REMOVE",) if keep_remove else ())
    valid = events.filter(F.col("eventName").isin(*known))
    invalid = events.filter(
        ~F.col("eventName").isin(*(allowed + ("REMOVE",)))
    )
    return valid, invalid


def latest_wins(df: DataFrame, key: str, seq: str = "seq") -> DataFrame:
    """A8 upsert semantics as a batch op: one row per key, max-seq image.
    Single shuffle on the key; at 100 TB pre-bucketing the table by the
    key makes this shuffle-free."""
    w = Window.partitionBy(key).orderBy(F.col(seq).desc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# Target base rows merge at a sentinel BELOW any valid event seq, so a
# real change at seq=0 (or any seq) deterministically beats the base row
# instead of tying with it.
_BASE_SEQ = -(2**63)


def apply_changes(
    target: DataFrame | None,
    changes: DataFrame,
    key: str = "id",
    seq: str = "seq",
    mode: str = "merge",
    removed_key: str = "removedId",
) -> DataFrame:
    """Apply a batch of change events to a (possibly empty) target.

    ``append``: reference semantics — INSERT/MODIFY images appended
    blindly, REMOVE dropped, duplicates accumulate (A14).
    ``merge``: corrected semantics — per-key latest event wins; a
    REMOVE as the latest event deletes the key (B36).

    ``key`` names the merge column both inside ``newImage`` and on the
    target; ``removed_key`` is the top-level column carrying the key of
    a REMOVE event (whose newImage is null).
    """
    if mode not in ("append", "merge"):
        raise ValueError(f"unknown apply mode: {mode}")

    if mode == "append":
        valid, _ = split_change_events(changes, keep_remove=False)
        images = valid.select(F.col("newImage.*"))
        return target.unionByName(images) if target is not None else images

    valid, _ = split_change_events(changes, keep_remove=True)
    flat = valid.select(
        F.coalesce(F.col(f"newImage.{key}"), F.col(removed_key)).alias("__key"),
        F.col(seq).alias("__seq"),
        (F.col("eventName") == "REMOVE").alias("__is_remove"),
        F.col("newImage").alias("__img"),
    )
    if target is not None:
        base = target.select(
            F.col(key).alias("__key"),
            F.lit(_BASE_SEQ).cast("long").alias("__seq"),
            F.lit(False).alias("__is_remove"),
            F.struct(*[F.col(c) for c in target.columns]).alias("__img"),
        )
        flat = base.unionByName(flat)
    latest = latest_wins(flat, "__key", "__seq")
    return latest.filter(~F.col("__is_remove")).select(F.col("__img.*"))


def snapshot_union_cdc(
    snapshot: DataFrame, changes: DataFrame, key: str = "id", seq: str = "seq"
) -> DataFrame:
    """A17 full-load-and-cdc: initial snapshot overridden by any later
    change images (DMS migration_type='full-load-and-cdc',
    reference: cdk_infrastructure/__init__.py:260)."""
    return apply_changes(snapshot, changes, key=key, seq=seq, mode="merge")


# ------------------------------------------------------------ streaming


def read_change_stream(
    spark: SparkSession, drop_dir: str, max_files_per_trigger: int = 100
) -> DataFrame:
    """A9: micro-batch change-stream source — a file-drop folder stands
    in for the DynamoDB stream / S3 staging protocol (one NDJSON file
    per tick, reference handler.py:44-58).  maxFilesPerTrigger mirrors
    the reference's batch_size=100 event-source mapping
    (cdk_infrastructure/__init__.py:441)."""
    return (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(drop_dir)
    )


def start_append_stream(
    changes: DataFrame, out_dir: str, checkpoint_dir: str, available_now: bool = True
):
    """A12/A14 append mode as a streaming sink: filtered change images
    appended to parquet; the checkpoint replaces the reference's
    move-to-processed file state machine (A15) — offsets make replay
    idempotent without renaming files."""
    valid, _ = split_change_events(changes)
    images = valid.select(F.col("newImage.*"))
    writer = (
        images.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _key_bucket(col: F.Column, n_buckets: int) -> F.Column:
    """Stable key→bucket mapping (xxhash64 is deterministic across
    sessions/partitionings, unlike monotonically_increasing_id)."""
    return F.pmod(F.xxhash64(col.cast("string")), F.lit(n_buckets)).cast("int")


def recover_merge_table(table_dir: str) -> None:
    """Repair a merge target after a crash mid-bucket-swap.

    The swap in ``start_merge_stream`` per touched bucket is
    ``rename(dst, dst__old); rename(tmp/src, dst); rmtree(dst__old)``,
    so on-disk state alone tells which step a crash interrupted:

    - ``__bucket=N__old`` present and ``__bucket=N`` missing → crashed
      between the two renames: restore by renaming old back.  The
      checkpoint then replays the batch against the intact table.
    - both present → crashed before ``rmtree``: the swap completed, the
      old dir is garbage (and would otherwise be discovered as a bogus
      ``N__old`` partition value): delete it.
    - leftover ``<table>__merging_*`` temp dirs are always garbage
      (either the swap consumed their bucket dirs or replay will
      rewrite them): delete them.

    Idempotent; crash during recovery re-runs the same rules.  Called
    by the merge sink before every batch and by ``read_merge_table``.
    """
    import os
    import shutil

    parent, name = os.path.split(os.path.abspath(table_dir))
    if os.path.isdir(parent):
        for entry in os.listdir(parent):
            if entry.startswith(f"{name}__merging_"):
                shutil.rmtree(os.path.join(parent, entry), ignore_errors=True)
    if not os.path.isdir(table_dir):
        return
    for entry in os.listdir(table_dir):
        if not (entry.startswith("__bucket=") and entry.endswith("__old")):
            continue
        old = os.path.join(table_dir, entry)
        dst = os.path.join(table_dir, entry[: -len("__old")])
        if os.path.isdir(dst):
            shutil.rmtree(old)
        else:
            os.rename(old, dst)


def read_merge_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read a merge-mode target without its internal bucket column."""
    recover_merge_table(table_dir)
    return spark.read.parquet(table_dir).drop("__bucket")


def start_merge_stream(
    changes: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    key: str = "id",
    available_now: bool = True,
    n_buckets: int = 16,
):
    """B36 apply-changes via foreachBatch, INCREMENTAL: the target is
    parquet hash-partitioned on ``__bucket = xxhash64(key) % n_buckets``
    and each micro-batch merges + rewrites ONLY the bucket partitions
    containing the batch's keys.  Per-batch I/O is O(touched buckets),
    not O(table) — a full-table read-modify-write per micro-batch is
    the classic 100 TB killer (on a lakehouse this same body is a
    Delta/Iceberg MERGE, which prunes files the same way).

    Crash/reader safety: the merged buckets are fully written to a temp
    directory FIRST, then swapped in with per-bucket directory renames —
    the merged plan's lineage (which reads table_dir) is never
    recomputed over a half-overwritten table.  A crash anywhere in the
    swap is repaired by ``recover_merge_table`` (run before every batch
    and by readers): a bucket stranded in ``__old`` with no replacement
    is renamed back, a completed-but-uncleaned swap has its ``__old``
    deleted, temp dirs are purged — then the checkpoint replays the
    batch against the intact table (latest-wins merge is idempotent).
    """
    import os
    import shutil

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        recover_merge_table(table_dir)
        batch = batch.persist()
        try:
            batch_key = F.coalesce(F.col(f"newImage.{key}"), F.col("removedId"))
            touched = sorted(
                r["b"]
                for r in batch.select(_key_bucket(batch_key, n_buckets).alias("b"))
                .distinct()
                .collect()
            )
            if not touched:
                return
            has_table = os.path.isdir(table_dir) and any(
                e.startswith("__bucket=") for e in os.listdir(table_dir)
            )
            if has_table:
                # partition pruning: only the touched bucket dirs are read
                current = (
                    spark.read.parquet(table_dir)
                    .filter(F.col("__bucket").isin(touched))
                    .drop("__bucket")
                )
            else:
                current = None
            merged = apply_changes(current, batch, key=key, mode="merge")
            merged = merged.withColumn("__bucket", _key_bucket(F.col(key), n_buckets))
            tmp = f"{table_dir}__merging_{batch_id}"
            merged.write.mode("overwrite").partitionBy("__bucket").parquet(tmp)
            # swap in the rewritten buckets; untouched buckets keep their files
            os.makedirs(table_dir, exist_ok=True)
            for b in touched:
                src = os.path.join(tmp, f"__bucket={b}")
                dst = os.path.join(table_dir, f"__bucket={b}")
                old = f"{dst}__old"
                if os.path.isdir(dst):
                    os.rename(dst, old)
                if os.path.isdir(src):
                    os.rename(src, dst)
                if os.path.isdir(old):
                    shutil.rmtree(old)
            shutil.rmtree(tmp, ignore_errors=True)
        finally:
            batch.unpersist()

    writer = changes.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_dedup(changes: DataFrame, key_cols: list[str], watermark_col: str, delay: str):
    """B35: watermark-scoped streaming dedup — state is bounded by the
    watermark horizon (dedup-forever state is unbounded at 100 TB;
    SURVEY.md §7.4.5)."""
    return changes.withWatermark(watermark_col, delay).dropDuplicates(key_cols)


def is_stream_active(spark: SparkSession, name: str) -> bool:
    """A19 idempotent stream-job control: start only when not already
    running (reference checks DMS task status before StartReplicationTask,
    source/start_dms_replication_task_lambda/handler.py:60-79)."""
    return any(q.name == name for q in spark.streams.active)


def count_parity(source: DataFrame, target: DataFrame) -> DataFrame:
    """A20 COUNT(*) parity metric — implemented as intended (the
    reference executes but never fetches the target count; we return
    both plus lag)."""
    s = source.agg(F.count(F.lit(1)).alias("source_rows"))
    t = target.agg(F.count(F.lit(1)).alias("target_rows"))
    return s.crossJoin(t).select(
        "source_rows", "target_rows", (F.col("source_rows") - F.col("target_rows")).alias("row_lag")
    )


def retention_filter(df: DataFrame, ts_col: str, max_age: str) -> DataFrame:
    """A16 retention/TTL: keep rows younger than the horizon (the S3
    lifecycle expiry analog, cdk_infrastructure/__init__.py:380-388).
    With ingest-date partitioning this prunes whole partitions."""
    return df.filter(F.col(ts_col) >= F.current_timestamp() - F.expr(f"INTERVAL {max_age}"))

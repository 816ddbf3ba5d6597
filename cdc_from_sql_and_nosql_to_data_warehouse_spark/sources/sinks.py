"""Warehouse-side sinks (SURVEY.md §1.4, §4.3).

The reference lands data in Redshift tables and timestamped S3 objects
(write_dynamodb_stream_to_s3_lambda/handler.py:47); the engine's
equivalents are parquet tables laid out for 100 TB reads:

- **ingest-date partitioning** — the timestamped-file-name protocol as
  real partition columns, so retention (A16) and time filters prune
  whole directories;
- **bucketing by the CDC key** — the latest-wins/MERGE shuffle happens
  once at write; keyed joins and upserts read co-located buckets with
  no Exchange (verified by tests/test_sinks.py plan assertions);
- **NDJSON staging writer** — the reference's staging format, one file
  per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_by_date(
    df: DataFrame, path: str, ts_col: str, mode: str = "append"
) -> None:
    """Bronze layout: parquet partitioned by ingest date.  A filter on
    ingest_date prunes partitions at planning time (no file listing of
    cold days)."""
    (
        df.withColumn("ingest_date", F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy("ingest_date")
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame, table: str, key: str, buckets: int = 8, sort_by: str | None = None
) -> None:
    """Silver layout: bucketed managed table.  Joins/aggregations on the
    bucket key skip the shuffle entirely — the physical plan for a
    bucketed-bucketed equi-join has no Exchange on either side."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.format("parquet").saveAsTable(table)


def write_ndjson_staging(df: DataFrame, path: str, mode: str = "append") -> None:
    """A12 staging format: newline-delimited JSON files.  Spark's
    part-file naming + the streaming checkpoint subsume the reference's
    uuid-in-filename and move-to-processed protocol."""
    df.write.mode(mode).json(path)


def read_pruned(spark: SparkSession, path: str, date_from: str, date_to: str) -> DataFrame:
    """Read a date-partitioned bronze table with partition pruning."""
    return spark.read.parquet(path).filter(
        (F.col("ingest_date") >= date_from) & (F.col("ingest_date") <= date_to)
    )


def refresh_rollup_incremental(
    spark: SparkSession,
    bronze_path: str,
    rollup_path: str,
    agg_fn,
    changed_dates: list[str],
) -> None:
    """Incremental materialized-rollup maintenance: recompute ONLY the
    ingest_date partitions a micro-batch touched and overwrite just
    those partitions of the rollup (dynamic partition overwrite).

    This is the warehouse-side continuous aggregate the reference's
    5-minute tick implies (the Redshift tables exist to be dashboarded,
    reference README.md:3,44): after each apply, the rollup refresh
    cost is O(changed partitions), not O(table).  At 100 TB a day's
    partition is ~0.1% of the table — the difference between a
    sub-minute refresh and a full recompute.

    ``agg_fn``: DataFrame → DataFrame per-partition aggregation; its
    output must retain the ``ingest_date`` column (it is the partition
    key of the rollup too).
    """
    changed = spark.read.parquet(bronze_path).filter(
        F.col("ingest_date").isin(*changed_dates)
    )
    out = agg_fn(changed)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out.write.mode("overwrite").partitionBy("ingest_date").parquet(rollup_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def compact_partition(
    spark: SparkSession, path: str, target_file_mb: int = 128
) -> int:
    """Small-file compaction: streaming micro-batches leave one file
    per trigger per partition; reads then pay a task per tiny file.
    Rewrite a partition directory into ceil(bytes / target) files.
    Returns the file count written.  (On a lakehouse this is OPTIMIZE /
    rewrite_data_files; here it is coalesce-by-size on plain parquet —
    same contract, checkpointed streams never re-read the compacted
    input.)"""
    import math
    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = f"{path}__compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


_COLUMNAR_FORMATS = {"parquet", "orc"}
_TEXT_FORMATS = {"csv", "json"}


def write_format(df: DataFrame, path: str, fmt: str, mode: str = "overwrite") -> None:
    """Format-parametric sink (B1 breadth): parquet and ORC as the
    columnar interchange formats (both Spark-native, predicate/column
    pushdown on read), CSV-with-header and NDJSON as the reference's
    text formats (A1/A12).  One code path so pipelines can switch a
    stage's landing format by config, not code."""
    if fmt not in _COLUMNAR_FORMATS | _TEXT_FORMATS:
        raise ValueError(f"unsupported sink format: {fmt}")
    w = df.write.mode(mode)
    if fmt == "csv":
        # header + explicit null marker so the roundtrip is lossless
        # for the stringly CSV dialect (A3); timestamps in ISO form
        w = w.option("header", True).option("nullValue", "\\N")
    w.format(fmt).save(path)


def read_format(spark: SparkSession, path: str, fmt: str, schema=None) -> DataFrame:
    """Format-parametric source matching write_format.  Columnar
    formats carry their own schema; text formats take the writer's
    schema explicitly (schema-on-read, never inference drift)."""
    if fmt not in _COLUMNAR_FORMATS | _TEXT_FORMATS:
        raise ValueError(f"unsupported source format: {fmt}")
    r = spark.read
    if fmt == "csv":
        r = r.option("header", True).option("nullValue", "\\N")
    if schema is not None:
        r = r.schema(schema)
    return r.format(fmt).load(path)

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

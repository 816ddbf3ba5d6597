"""JDBC source/sink surface (SURVEY.md §2.1 A6/A17, §7.3).

The reference's SQL side is RDS MySQL written with batched
parameterized INSERTs (source/load_data_to_rds_lambda/handler.py:29-40)
and read by DMS for replication.  The engine's equivalent is Spark's
JDBC source/sink; the test environment ships no database or JDBC
driver jar, so these builders are exercised for plan/option shape only
(tests/test_jdbc_surface.py) and documented here:

- **reads are partitioned**: always pass partitionColumn/lowerBound/
  upperBound/numPartitions so the scan is N parallel range queries,
  not one cursor (the 100 TB requirement);
- **writes are batched**: batchsize mirrors the reference's
  executemany; isolation level NONE matches its autocommit-off +
  single commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **options: str,
) -> DataFrameReader:
    """Configured (not yet loaded) JDBC reader.  Call ``.load()`` with a
    reachable database + driver jar."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JVM as the literal 'None' and
            # die at load time with a NumberFormatException far from
            # the misconfiguration — fail here instead
            raise ValueError(
                "partition_column requires lower_bound AND upper_bound "
                "(Spark needs the numeric range to plan the parallel "
                "range queries)"
            )
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        r = r.option(k, v)
    return r


def jdbc_append(df: DataFrame, url: str, table: str, batch_size: int = 1_000) -> None:
    """Batched append — the reference's executemany INSERT (A6)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .option("isolationLevel", "NONE")
        .mode("append")
        .save()
    )

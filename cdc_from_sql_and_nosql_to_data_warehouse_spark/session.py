"""SparkSession construction tuned for the engine.

The reference has no engine of its own — MySQL/Redshift optimize its SQL
(SURVEY.md §4.1).  Here Catalyst is the optimizer, so the session turns on
everything that matters at 100 TB: AQE (runtime join re-planning, skew
splitting, shuffle coalescing) and Arrow (vectorized pandas-UDF exchange).

Defaults are sized for the local[32] test harness; on a real cluster the
same settings scale because they are ratios/flags, not absolute sizes
(shuffle.partitions is overridden by AQE coalescing at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One partition per core locally; AQE coalesces small shuffles back down
# and splits skewed ones, so this is a ceiling, not a schedule.
_DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "cdc_warehouse_spark") -> SparkSession:
    """Build (or fetch) the engine SparkSession."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", _DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to an externally built session.

    The driver calls ``entry(spark)`` / ``queries()`` with its own session;
    these are the confs our operators rely on that can still be set after
    session start (timezone pins timestamp semantics against the DuckDB
    oracle).  ANSI mode is deliberately NOT touched: the reference's
    permissive casts are reproduced locally via try_cast in
    functions/normalize.py, so the operators are correct under either
    ansi setting and the driver's session keeps its own default.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark

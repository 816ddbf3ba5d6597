"""User-facing SQL entry point.

The reference's end state is "analysts run SQL against the warehouse"
(reference README.md:3; its own code already speaks SQL — COUNT(*),
DDL, INSERT, COPY).  This module is that surface on the engine: point
it at a data directory once and run any Spark-SQL query against the
registered tables — the switch-over path for a reference user.

Everything else in the engine (operators/, streaming/) remains
programmatic; this is deliberately a thin veneer over ``spark.sql`` so
queries get the full Catalyst treatment with zero translation layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import TABLES, load_table


def register_tables(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every testdata table as a temp view (idempotent;
    re-registering repoints the views at a new data directory)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ad-hoc SQL query against the tables in ``sf_dir``.
    Views are (re)registered first, so consecutive calls against
    different directories never see stale tables."""
    register_tables(spark, sf_dir)
    return spark.sql(query)

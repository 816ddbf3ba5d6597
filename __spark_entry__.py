"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All operators live in ``cdc_from_sql_and_nosql_to_data_warehouse_spark``
(SURVEY.md §2 inventory); this module only adapts the registry to the
driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.session import tune


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    tune(spark, "/root/testdata/sf0.001")
    return ops.REGISTRY["q_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _wrap(fn: ops.QueryFn) -> ops.QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # sf_dir lets tune() size the shuffle width from input volume
        # (a no-op at driver scale; the scale fix at sf1/sf10 blowups)
        tune(spark, sf_dir)
        return fn(spark, sf_dir)

    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(spec.fn) for name, spec in ops.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every SQL-expressible query."""
    return ops.oracle_sql()

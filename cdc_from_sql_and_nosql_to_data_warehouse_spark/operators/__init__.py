"""Operator registry.

Every query-shaped operator from SURVEY.md §2 registers itself here with
an optional DuckDB oracle SQL string.  ``__spark_entry__.py`` exposes the
registry to the driver; ``tests/test_oracle_diff.py`` replays the exact
driver comparison (row count + schema + order-insensitive values) locally.

Registration happens at import time of the operator modules, which this
package imports eagerly at the bottom.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate operator registration: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


# Import operator modules for their registration side effects.
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import (  # noqa: E402,F401
    cdc_batch,
    dedup,
    multimodal,
    relational,
    similarity,
    textops,
    timeseries,
    udfs,
)

"""Empty-input sweep: every registered operator must execute cleanly
against EMPTY tables.  At 100 TB empty inputs are routine (a pruned
partition, a day with no events, a filter that eliminates a source) —
an operator that throws on zero rows is a pipeline outage, not an edge
case.  No result assertions beyond "returns rows without raising":
semantics on data are the oracle suite's job."""

from __future__ import annotations

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import TABLES, load_table


@pytest.fixture(scope="session")
def empty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        load_table(spark, "/root/testdata/sf0.001", t).limit(0).write.parquet(
            f"{d}/{t}.parquet"
        )
    return d


@pytest.mark.parametrize("name", sorted(ops.REGISTRY))
def test_runs_on_empty_tables(spark, empty_dir, name):
    df = ops.REGISTRY[name].fn(spark, empty_dir)
    rows = df.collect()
    assert rows is not None
    assert df.columns  # schema survives even with zero rows
    # schema must not depend on data contents (dtypes is analysis-only,
    # no job) — the driver smoke-checks entry() for exactly this
    with_data = ops.REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
    assert df.dtypes == with_data.dtypes

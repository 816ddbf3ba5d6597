"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)
    # every oracle-checked query is the majority
    assert len(osql) >= 0.7 * len(qs)


def test_run_sql_adhoc(spark):
    # the switch-over surface: any warehouse SQL runs as-is
    from cdc_from_sql_and_nosql_to_data_warehouse_spark import api

    df = api.run_sql(
        spark,
        "/root/testdata/sf0.001",
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o.o_orderkey)
        GROUP BY o_orderpriority
        """,
    )
    rows = df.collect()
    assert len(rows) == 5 and all(r["n"] > 0 for r in rows)


def test_run_sql_repoints_views_across_dirs(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark import api

    n1 = api.run_sql(spark, "/root/testdata/sf0.001", "SELECT COUNT(*) AS n FROM events").first()["n"]
    n2 = api.run_sql(spark, "/root/testdata/sf0.01", "SELECT COUNT(*) AS n FROM events").first()["n"]
    assert (n1, n2) == (1000, 10000)


def test_bogus_sf_dir_raises_cleanly(spark):
    # a wrong data directory must fail with the standard Spark
    # PATH_NOT_FOUND analysis error, not a confusing downstream crash
    import pytest
    from pyspark.errors import AnalysisException

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

    with pytest.raises(AnalysisException, match="PATH_NOT_FOUND"):
        REGISTRY["q_pricing_summary"].fn(spark, "/root/testdata/sf_nope").collect()

"""Physical-layout tests: the 100 TB storage story — date partitioning
prunes, bucketing removes the join shuffle."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import sinks
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR


def test_date_partitioned_write_prunes(spark, tmp_path):
    path = str(tmp_path / "bronze_events")
    ev = load_table(spark, SF_DIR, "events")
    sinks.write_partitioned_by_date(ev, path, "ts", mode="overwrite")

    pruned = sinks.read_pruned(spark, path, "2024-01-02", "2024-01-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filters must appear as PartitionFilters, not data filters
    assert "PartitionFilters" in plan and "ingest_date" in plan
    total = spark.read.parquet(path).count()
    assert 0 < pruned.count() < total


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    sinks.write_bucketed_table(o, "orders_b", "o_orderkey", buckets=4)
    sinks.write_bucketed_table(li, "lineitem_b", "l_orderkey", buckets=4)

    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable broadcast so the join would shuffle if bucketing didn't work
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed-bucketed join must not shuffle"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_ndjson_staging_roundtrip(spark, tmp_path):
    path = str(tmp_path / "staging")
    docs = load_table(spark, SF_DIR, "documents").limit(20)
    sinks.write_ndjson_staging(docs.select("doc_id", "lang"), path, mode="overwrite")
    back = spark.read.json(path)
    assert back.count() == 20
    assert set(back.columns) == {"doc_id", "lang"}

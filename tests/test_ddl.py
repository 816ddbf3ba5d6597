"""DDL smoke (SURVEY.md §2.1 A4/A5): CREATE TABLE from a derived
schema — the reference's CREATE TABLE IF NOT EXISTS from the CSV header
(configure_rds_lambda/handler.py:41-49) and the typed/SUPER warehouse
table (configure_redshift…/handler.py:20-32)."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import normalize as N
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import readers

FIX = "/root/repo/tests/fixtures"


def test_create_table_from_header(spark):
    # A4: schema derived from the normalized CSV header, all strings
    df = readers.read_csv_normalized(spark, f"{FIX}/txns.csv")
    spark.sql("DROP TABLE IF EXISTS rds_cdc_table")
    df.write.saveAsTable("rds_cdc_table")
    got = spark.table("rds_cdc_table")
    assert got.columns == df.columns
    assert all(t == "string" for _, t in got.dtypes)
    # IF NOT EXISTS semantics: append another tick, no PK → rows grow
    df.write.mode("append").saveAsTable("rds_cdc_table")
    assert spark.table("rds_cdc_table").count() == 48
    spark.sql("DROP TABLE rds_cdc_table")


def test_create_typed_table_with_nested(spark):
    # A5: typed table with nested (SUPER-analog) struct columns
    docs = readers.read_documents_json(spark, f"{FIX}/trades.ndjson")
    spark.sql("DROP TABLE IF EXISTS trades_warehouse")
    docs.write.saveAsTable("trades_warehouse")
    got = spark.table("trades_warehouse")
    dt = dict(got.dtypes)
    assert dt["price"] == "double" and dt["shares"] == "bigint"
    assert dt["details"].startswith("struct<")  # nested stays typed
    assert got.count() == 8
    spark.sql("DROP TABLE trades_warehouse")

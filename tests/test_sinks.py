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


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    # maintain a daily rollup by refreshing only the changed partition;
    # the result must equal a from-scratch recompute
    from pyspark.sql import functions as F

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import sinks

    bronze = f"{tmp_path}/bronze"
    rollup = f"{tmp_path}/rollup"

    def day_rollup(df):
        return df.groupBy("ingest_date", "k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(12,2)")).cast("double").alias("total"),
        )

    day1 = [("2024-01-01 10:00:00", i % 3, float(i)) for i in range(30)]
    day2 = [("2024-01-02 10:00:00", i % 3, float(i * 2)) for i in range(30)]
    df = spark.createDataFrame(day1 + day2, "ts string, k int, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sinks.write_partitioned_by_date(df, bronze, "ts")
    sinks.refresh_rollup_incremental(
        spark, bronze, rollup, day_rollup, ["2024-01-01", "2024-01-02"]
    )

    # a late batch lands in day 2 only
    late = spark.createDataFrame(
        [("2024-01-02 23:00:00", 1, 1000.0)], "ts string, k int, v double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sinks.write_partitioned_by_date(late, bronze, "ts")
    sinks.refresh_rollup_incremental(spark, bronze, rollup, day_rollup, ["2024-01-02"])

    got = {
        (str(r["ingest_date"]), r["k"]): (r["n"], r["total"])
        for r in spark.read.parquet(rollup).collect()
    }
    full = {
        (str(r["ingest_date"]), r["k"]): (r["n"], r["total"])
        for r in day_rollup(spark.read.parquet(bronze)).collect()
    }
    assert got == full
    assert got[("2024-01-02", 1)][0] == 11  # 10 original + 1 late


def test_compact_partition_reduces_files(spark, tmp_path):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import sinks

    path = f"{tmp_path}/frag"
    df = spark.range(1000).withColumnRenamed("id", "v")
    # simulate many micro-batch files
    for _ in range(5):
        df.coalesce(4).write.mode("append").parquet(path)
    import glob

    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 20
    n = sinks.compact_partition(spark, path, target_file_mb=128)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert n == 1 and after == 1
    assert spark.read.parquet(path).count() == 5000


def test_write_zordered_clusters_both_columns(spark, tmp_path):
    # z-order layout: each output file must cover a narrow slice of
    # BOTH interleaved columns, so min-max stats prune scans on either
    from pyspark.sql import functions as F

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import write_zordered
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_custkey",
        F.datediff(
            "o_orderdate", F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("day"),
    )
    path = f"{tmp_path}/zorders"
    write_zordered(o, "o_custkey", "day", path, partitions=8)
    per_file = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("ck_extent"),
            (F.max("day") - F.min("day")).alias("day_extent"),
        )
        .collect()
    )
    glob = o.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("ck"),
        (F.max("day") - F.min("day")).alias("day"),
    ).collect()[0]
    assert len(per_file) >= 4
    avg_ck = sum(r["ck_extent"] for r in per_file) / len(per_file)
    avg_day = sum(r["day_extent"] for r in per_file) / len(per_file)
    # a single-column sort would leave the OTHER column's extent at
    # ~100% of global per file; z-order keeps both well below
    assert avg_ck < glob["ck"] * 0.8, (avg_ck, glob["ck"])
    assert avg_day < glob["day"] * 0.8, (avg_day, glob["day"])


def test_format_roundtrip_orc_csv_json(spark, tmp_path):
    """B1 format breadth: ORC / CSV / NDJSON roundtrips preserve values
    and (given the writer's schema) types."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.sinks import (
        read_format,
        write_format,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table
    from conftest import SF_DIR

    src = load_table(spark, SF_DIR, "orders").limit(200)
    expected = {tuple(r) for r in src.collect()}
    for fmt in ("orc", "csv", "json"):
        path = str(tmp_path / fmt)
        write_format(src, path, fmt)
        back = read_format(spark, path, fmt, schema=src.schema)
        assert back.schema == src.schema, fmt
        assert {tuple(r) for r in back.collect()} == expected, fmt
    import pytest

    with pytest.raises(ValueError):
        write_format(src, str(tmp_path / "x"), "avro")

"""Golden-fixture ingest tests (SURVEY.md §5.2.2): replay replicas of
the reference's own data shapes through ingest/normalize and assert the
documented end states."""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import normalize as N
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import attrvalue, readers

FIX = "/root/repo/tests/fixtures"


def test_csv_header_normalization(spark):
    # A2: 'Account No' → account_no, ' WITHDRAWAL AMT ' → withdrawal_amt
    df = readers.read_csv_normalized(spark, f"{FIX}/txns.csv")
    assert df.columns == [
        "account_no",
        "date",
        "transaction_details",
        "chip_used",
        "value_date",
        "withdrawal_amt",
        "deposit_amt",
        "balance_amt",
    ]
    assert df.count() == 24  # 24 data rows per tick, reference README.md:11


def test_typed_parse_money_date_bool(spark):
    # A3 inverse: money "  1,063,965.88 " → decimal; d-MMM-yy → date;
    # TRUE/FALSE → boolean; blank → NULL
    df = readers.read_csv_normalized(spark, f"{FIX}/txns.csv")
    typed = N.typed_parse(
        df,
        {
            "date": "date",
            "value_date": "date",
            "chip_used": "bool",
            "withdrawal_amt": "money",
            "deposit_amt": "money",
            "balance_amt": "money",
        },
    )
    rows = typed.collect()
    r0 = rows[0]
    assert r0["date"] == datetime.date(2017, 6, 29)  # '29-Jun-17', yy→2017
    assert isinstance(r0["chip_used"], bool)
    assert r0["balance_amt"] == Decimal("969745.25")
    # exactly one of withdrawal/deposit per row (FIXTURES.md §1.1)
    for r in rows:
        assert (r["withdrawal_amt"] is None) != (r["deposit_amt"] is None)


def test_running_balance_property(spark):
    # B15 property check: balance == prev_balance + deposit - withdrawal
    # per account in file order (the banking running balance).
    df = readers.read_csv_normalized(spark, f"{FIX}/txns.csv")
    typed = N.typed_parse(
        df, {"withdrawal_amt": "money", "deposit_amt": "money", "balance_amt": "money"}
    )
    for acct_rows in (
        typed.filter(F.col("account_no") == a).collect()
        for a in [r[0] for r in typed.select("account_no").distinct().collect()]
    ):
        prev = None
        for r in acct_rows:
            delta = (r["deposit_amt"] or Decimal(0)) - (r["withdrawal_amt"] or Decimal(0))
            if prev is not None:
                assert r["balance_amt"] == prev + delta
            prev = r["balance_amt"]


def test_stringly_roundtrip(spark):
    # A3 forward: every column castable to string (the all-varchar table)
    df = readers.read_csv_normalized(spark, f"{FIX}/txns.csv")
    s = N.stringly(df)
    assert all(t == "string" for _, t in s.dtypes)
    assert s.count() == 24


def test_trades_json_schema_drift(spark):
    # A7: 8 docs, explicit schema, missing `ticket` → null (1 of 8)
    df = readers.read_documents_json(spark, f"{FIX}/trades.ndjson")
    assert df.count() == 8
    assert df.filter(F.col("ticket").isNull()).count() == 1
    r = df.filter(F.col("ticket").isNotNull()).first()
    assert isinstance(r["price"], float)
    assert isinstance(r["details"]["asks"][0], float)
    assert r["event_time"] is not None  # ISO-8601 time.date parsed


def test_attrvalue_expression_decode(spark):
    # A11: wire-format AttributeValue JSON → typed struct via pure
    # column expressions (no Python in the row path)
    raw = spark.read.text(f"{FIX}/trades_attrvalue.ndjson")
    decoded = attrvalue.decode_trades_df(raw, "value")
    rows = decoded.orderBy("id").collect()
    assert len(rows) == 8
    assert {len(r["id"]) for r in rows} == {24}
    assert all(isinstance(r["price"], float) for r in rows)
    assert sum(1 for r in rows if r["ticket"] is None) == 1
    assert all(len(r["details"]["asks"]) == 3 for r in rows)


def test_attrvalue_python_decoder_matches_expression(spark):
    # generic fallback decoder agrees with the expression decode
    import json

    with open(f"{FIX}/trades_attrvalue.ndjson") as f:
        py = [attrvalue.deserialize_attrvalue(json.loads(line)) for line in f]
    raw = spark.read.text(f"{FIX}/trades_attrvalue.ndjson")
    dec = {r["id"]: r for r in attrvalue.decode_trades_df(raw, "value").collect()}
    for doc in py:
        r = dec[doc["id"]]
        assert r["price"] == doc["price"]
        assert r["details"]["lag"] == int(doc["details"]["lag"])


def test_table_selector_like_patterns():
    # A18: DMS table-mapping include rule semantics
    tables = ["prod.rds_cdc_table", "prod.other", "stage.rds_cdc_table", "events"]
    assert readers.select_tables(tables, "%", "rds_cdc_table") == [
        "prod.rds_cdc_table",
        "stage.rds_cdc_table",
    ]
    assert readers.select_tables(tables, "prod", "%") == ["prod.rds_cdc_table", "prod.other"]
    assert readers.select_tables(tables, "%", "%") == tables


def test_assign_dense_ids_matches_global_row_number(spark):
    # scalable range-partitioned numbering == the single-task global
    # row_number, on a shuffled input
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import assign_dense_ids
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").repartition(13)
    got = assign_dense_ids(ev, ["ts", "event_id"], partitions=7)
    expect = ev.withColumn(
        "row_id", F.row_number().over(Window.orderBy("ts", "event_id")) - 1
    )
    g = {r["event_id"]: r["row_id"] for r in got.collect()}
    e = {r["event_id"]: r["row_id"] for r in expect.collect()}
    assert g == e
    assert sorted(g.values()) == list(range(len(g)))


def test_schema_drift_merge_and_by_name_append(spark, tmp_path):
    # §1.3: NoSQL documents drift; bronze absorbs drift via mergeSchema
    # (old rows → null for new columns), and A14 by-name alignment drops
    # unknown incoming fields instead of corrupting positions
    from pyspark.sql import functions as F

    p = f"{tmp_path}/bronze"
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(p)
    spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", True).parquet(p)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5

    # by-name append into the v1 target schema: extra incoming column is
    # dropped, order differences don't matter
    incoming = spark.createDataFrame(
        [(99.9, 3, "c", "extra")], "score double, id long, name string, junk string"
    )
    target_cols = ["id", "name"]
    aligned = incoming.select(*target_cols)
    out = spark.createDataFrame([(1, "a")], "id long, name string").unionByName(aligned)
    assert out.count() == 2 and set(out.columns) == {"id", "name"}


def test_running_total_matches_global_window_cumsum(spark):
    # scalable range-partitioned prefix sum == the single-task global
    # cumulative window, on a shuffled input
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import running_total
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", F.length("text").alias("v"))
        .repartition(13)
    )
    got = running_total(docs, ["doc_id"], "v", "cum", partitions=7)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expect = docs.withColumn("cum", F.sum("v").over(w))
    g = {r["doc_id"]: r["cum"] for r in got.collect()}
    e = {r["doc_id"]: r["cum"] for r in expect.collect()}
    assert g == e


def test_json_error_channel_splits_good_and_bad(spark, tmp_path):
    # A10: malformed records land in the bad channel with their raw
    # text; good records parse typed — one declarative pass, no UDF
    import os

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import (
        read_json_with_error_channel,
    )

    p = str(tmp_path / "feed")
    os.makedirs(p)
    with open(f"{p}/a.json", "w") as f:
        f.write('{"id": 1, "price": 10.5}\n')
        f.write("THIS IS NOT JSON\n")
        f.write('{"id": 2, "price": "NaN-ish"}\n')  # type mismatch -> corrupt
        f.write('{"id": 3, "price": 7.25}\n')

    good, bad = read_json_with_error_channel(spark, p, "id long, price double")
    got = sorted((r["id"], r["price"]) for r in good.collect())
    assert got == [(1, 10.5), (3, 7.25)]
    raws = {r["raw"] for r in bad.collect()}
    assert len(raws) == 2
    assert any("NOT JSON" in r for r in raws)


def test_grouped_running_total_matches_per_group_window(spark):
    """running_total(group_cols=[...]) == sum(v) over (partition by g
    order by ...) — including groups that straddle range-partition
    boundaries and NULL group values."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import running_total
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select(
            "doc_id",
            # NULL group for one slice to pin null-key handling
            F.when(F.col("doc_id") % 17 == 0, F.lit(None)).otherwise(F.col("source")).alias("g"),
            F.length("text").alias("v"),
        )
        .repartition(13)
    )
    got = running_total(docs, ["doc_id"], "v", "cum", partitions=7, group_cols=["g"])
    w = (
        Window.partitionBy("g")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    expect = docs.withColumn("cum", F.sum("v").over(w))
    g = {r["doc_id"]: r["cum"] for r in got.collect()}
    e = {r["doc_id"]: r["cum"] for r in expect.collect()}
    assert g == e

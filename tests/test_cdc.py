"""CDC-semantics unit tests (SURVEY.md §5.2.2-3): the reference's
documented duplicate-accumulation semantics in append mode, the
corrected merge mode, REMOVE policy both ways, the unknown-event error
channel, and count parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import readers
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc

FIX = "/root/repo/tests/fixtures"


def _events(spark):
    return spark.read.schema(cdc.CHANGE_EVENT_SCHEMA).json(f"{FIX}/change_events.ndjson")


def test_event_filter_and_error_channel(spark):
    ev = _events(spark)
    bad = ev.unionByName(
        spark.createDataFrame(
            [("UPSERT", 99)], "eventName string, seq long"
        ).withColumn("newImage", F.lit(None).cast(readers.TRADES_SCHEMA))
        .withColumn("removedId", F.lit(None).cast("string"))
    )
    valid, invalid = cdc.split_change_events(bad)
    # 8 INSERT + 3 MODIFY valid; REMOVE excluded in append mode
    assert valid.count() == 11
    # unknown event routed to the error channel, not silently dropped
    assert invalid.count() == 1
    assert invalid.first()["eventName"] == "UPSERT"


def test_append_mode_accumulates_duplicates(spark):
    # Reference end-to-end semantics (SURVEY.md §2.1 end note): each tick
    # re-appends all images; warehouse grows by images/tick; REMOVE never
    # propagates (README.md:30).
    ev = _events(spark)
    tick1 = cdc.apply_changes(None, ev, mode="append")
    assert tick1.count() == 11  # 8 INSERT + 3 MODIFY, REMOVE dropped
    tick2 = cdc.apply_changes(tick1, ev, mode="append")
    assert tick2.count() == 22  # duplicates accumulate
    # the removed id is still present — deletes don't propagate in append
    removed_id = ev.filter("eventName = 'REMOVE'").first()["removedId"]
    assert tick2.filter(F.col("id") == removed_id).count() > 0


def test_merge_mode_latest_wins_and_remove(spark):
    ev = _events(spark)
    merged = cdc.apply_changes(None, ev, mode="merge")
    # 8 distinct ids, one REMOVEd as the latest event → 7 rows
    assert merged.count() == 7
    removed_id = ev.filter("eventName = 'REMOVE'").first()["removedId"]
    assert merged.filter(F.col("id") == removed_id).count() == 0
    # MODIFY images (higher seq) override the INSERT images
    mods = {
        r["newImage"]["id"]: r["newImage"]["price"]
        for r in ev.filter("eventName = 'MODIFY'").collect()
    }
    got = {r["id"]: r["price"] for r in merged.collect()}
    for k, price in mods.items():
        if k in got:
            assert got[k] == price
    # re-applying the same batch is idempotent (upsert semantics, A8)
    merged2 = cdc.apply_changes(merged, ev, mode="merge")
    assert merged2.count() == 7


def test_snapshot_union_cdc(spark):
    # A17: snapshot rows overridden by later change images
    docs = readers.read_documents_json(spark, f"{FIX}/trades.ndjson").drop("event_time")
    ev = _events(spark)
    applied = cdc.snapshot_union_cdc(docs, ev, key="id")
    assert applied.count() == 7  # REMOVE deletes one key
    mods = {
        r["newImage"]["id"]: r["newImage"]["price"]
        for r in ev.filter("eventName = 'MODIFY'").collect()
    }
    got = {r["id"]: r["price"] for r in applied.collect()}
    for k, price in mods.items():
        if k in got:
            assert got[k] == price


def test_count_parity(spark):
    docs = readers.read_documents_json(spark, f"{FIX}/trades.ndjson")
    parity = cdc.count_parity(docs, docs.limit(5)).first()
    assert parity["source_rows"] == 8
    assert parity["target_rows"] == 5
    assert parity["row_lag"] == 3


def test_debezium_decode(spark):
    # sources/debezium.py: op mapping, delete before-image, unknown op
    # → eventName null (error-channel routable, not a crash)
    from pyspark.sql.types import _parse_datatype_string

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import debezium

    payload = _parse_datatype_string("struct<id:string,price:double>")
    rows = [
        ('{"after":{"id":"a","price":1.5},"op":"c","ts_ms":1}',),
        ('{"before":{"id":"a","price":1.5},"after":{"id":"a","price":2.5},"op":"u","ts_ms":2}',),
        ('{"before":{"id":"a","price":2.5},"op":"d","ts_ms":3}',),
        ('{"after":{"id":"b","price":9.0},"op":"r","ts_ms":4}',),
        ('{"after":{"id":"c","price":0.1},"op":"x","ts_ms":5}',),  # unknown
    ]
    df = spark.createDataFrame(rows, "value string")
    out = {r["seq"]: r for r in debezium.decode_debezium(df, payload).collect()}
    assert out[1]["eventName"] == "INSERT" and out[1]["image"]["price"] == 1.5
    assert out[2]["eventName"] == "MODIFY" and out[2]["image"]["price"] == 2.5
    # delete: image falls back to the before-image
    assert out[3]["eventName"] == "REMOVE" and out[3]["image"]["id"] == "a"
    assert out[4]["eventName"] == "INSERT"  # snapshot read
    assert out[5]["eventName"] is None  # unknown op routes to error channel


def test_dedup_clusters_connected_components(spark):
    # chain 1-2-3, pair 10-11, singleton-free graph; transitive closure
    # must label the whole chain with its min id
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (7, 8), (8, 9), (9, 20)], "a long, b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 7: 7, 8: 7, 9: 7, 20: 7}


def test_null_event_name_routes_to_error_channel(spark):
    """A NULL eventName (unknown Debezium op decoded to null; PERMISSIVE
    corrupt NDJSON rows) must land in the invalid channel — a plain
    ~isin filter drops NULL from BOTH channels (review-caught)."""
    ev = _events(spark)
    bad = ev.unionByName(
        spark.createDataFrame([(None, 101)], "eventName string, seq long")
        .withColumn("newImage", F.lit(None).cast(readers.TRADES_SCHEMA))
        .withColumn("removedId", F.lit(None).cast("string"))
    )
    valid, invalid = cdc.split_change_events(bad)
    assert valid.count() == 11
    assert invalid.count() == 1
    assert invalid.first()["eventName"] is None
    # exhaustive partition in merge mode too
    valid_m, invalid_m = cdc.split_change_events(bad, keep_remove=True)
    assert valid_m.count() + invalid_m.count() == bad.count()


def test_keyless_valid_event_excluded_from_merge(spark):
    """A known eventName with NO key carrier (null image and null
    removedId) must not materialize an all-null warehouse row."""
    ev = _events(spark)
    bad = ev.unionByName(
        spark.createDataFrame([("INSERT", 102)], "eventName string, seq long")
        .withColumn("newImage", F.lit(None).cast(readers.TRADES_SCHEMA))
        .withColumn("removedId", F.lit(None).cast("string"))
    )
    merged = cdc.apply_changes(None, bad, mode="merge")
    assert merged.filter(F.col("id").isNull()).count() == 0


def test_equal_seq_ties_resolve_remove_wins(spark):
    """Two same-seq events for one key (Debezium ts_ms collisions) must
    resolve deterministically: REMOVE beats an image at the same seq
    (delete-wins), independent of partitioning."""
    rows = [
        ("INSERT", 5, {"id": "k1", "price": 1.0, "shares": 1}, None),
        ("REMOVE", 5, None, "k1"),
        ("INSERT", 3, {"id": "k2", "price": 2.0, "shares": 1}, None),
    ]
    schema = cdc.CHANGE_EVENT_SCHEMA
    ev = spark.createDataFrame(rows, schema)
    for parts in (1, 7):
        merged = cdc.apply_changes(None, ev.repartition(parts), mode="merge")
        keys = sorted(r["id"] for r in merged.collect())
        assert keys == ["k2"], f"partitions={parts}: REMOVE lost the seq tie"

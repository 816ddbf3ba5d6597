"""Custom Python DataSource: deterministic CDC change-feed generator
(sources/pydatasource.py) — schema, partition parallelism, determinism,
and compatibility with the latest-wins CDC apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import pydatasource
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming.cdc import latest_wins


def _feed(spark, **opts):
    pydatasource.register(spark)
    r = spark.read.format("cdc_changefeed")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_changefeed_schema_counts_and_partitions(spark):
    df = _feed(spark, shards=3, per_shard=50, keys=10)
    assert df.columns == ["seq", "shard", "op", "id", "price"]
    assert df.count() == 150
    assert df.rdd.getNumPartitions() == 3
    # ops all from the CDC vocabulary; REMOVE carries no image
    ops = {r["op"] for r in df.select("op").distinct().collect()}
    assert ops <= {"INSERT", "MODIFY", "REMOVE"}
    assert df.filter("op = 'REMOVE' AND price IS NOT NULL").count() == 0


def test_changefeed_is_deterministic_per_seed(spark):
    a = sorted(map(tuple, _feed(spark, shards=2, per_shard=20).collect()))
    b = sorted(map(tuple, _feed(spark, shards=2, per_shard=20).collect()))
    c = sorted(map(tuple, _feed(spark, shards=2, per_shard=20, seed=7).collect()))
    assert a == b
    assert a != c


def test_changefeed_feeds_latest_wins_apply(spark):
    df = _feed(spark, shards=2, per_shard=200, keys=20)
    # the standard CDC apply consumes the feed unchanged: keep each
    # key's highest-seq row, drop keys whose final event is REMOVE
    final = latest_wins(df, key="id", seq="seq").filter(F.col("op") != "REMOVE")
    rows = {r["id"]: r for r in final.collect()}
    assert 0 < len(rows) <= 20
    # spot-check against a driver-side replay of the same feed
    replay = {}
    for r in sorted(df.collect(), key=lambda r: r["seq"]):
        replay[r["id"]] = r
    expect = {k: r for k, r in replay.items() if r["op"] != "REMOVE"}
    assert set(rows) == set(expect)
    for k in rows:
        assert rows[k]["seq"] == expect[k]["seq"]


def test_changefeed_stream_reader_incremental(spark, tmp_path):
    # readStream over the same source: bounded feed (2 shards x 120
    # events, 50/shard per micro-batch) drains in 3 micro-batches with
    # offsets checkpointed; the memory sink accumulates exactly the
    # batch-read rows, equal to the batch feed of the same seed
    pydatasource.register(spark)
    import uuid as _uuid

    name = f"feed_{_uuid.uuid4().hex[:8]}"
    # NOT availableNow: a Simple stream reader prefetches one batch per
    # trigger, and availableNow stops at the offsets captured on start —
    # i.e. after a single micro-batch.  Run continuous micro-batches and
    # stop once the bounded feed drains.
    q = (
        spark.readStream.format("cdc_changefeed")
        .option("shards", 2)
        .option("per_shard", 120)
        .option("batch_size", 50)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline and spark.table(name).count() < 240:
        _time.sleep(0.5)
    q.stop()
    streamed = sorted(map(tuple, spark.table(name).collect()))
    batch = sorted(map(tuple, _feed(spark, shards=2, per_shard=120).collect()))
    assert streamed == batch
    assert len(streamed) == 240

"""applyInPandasWithState custom stateful operator + salted skew join."""

from __future__ import annotations

import json
import os
import uuid

import pytest

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import skew
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table
from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import stateful

from conftest import SF_DIR


def _drop(drop_dir: str, rows: list[dict]) -> None:
    with open(f"{drop_dir}/{uuid.uuid4().hex}.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_keyed_cdc_state_across_batches(spark, tmp_path):
    drop = str(tmp_path / "drop")
    os.makedirs(drop)
    _drop(drop, [{"id": "a", "seq": 1, "price": 10.0}, {"id": "b", "seq": 2, "price": 5.0}])

    stream = spark.readStream.schema("id string, seq long, price double").json(drop)
    name = f"state_{uuid.uuid4().hex[:8]}"
    q = (
        stateful.keyed_cdc_state(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r for r in spark.table(name).collect()}
    assert got["a"]["last_seq"] == 1 and got["a"]["n_events"] == 1

    # batch 2: out-of-order event for a (seq 0 ignored for state), new for b
    _drop(drop, [{"id": "a", "seq": 0, "price": 99.0}, {"id": "b", "seq": 3, "price": 7.0}])
    q = (
        stateful.keyed_cdc_state(stream)
        .writeStream.format("memory")
        .queryName(name + "2")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # fresh checkpoint-less restart reprocesses everything: final state
    got = {r["id"]: r for r in spark.table(name + "2").collect()}
    assert got["a"]["last_seq"] == 1  # seq 0 did not regress the state
    assert got["a"]["last_price"] == 10.0
    assert got["a"]["n_events"] == 2
    assert got["b"]["last_seq"] == 3 and got["b"]["last_price"] == 7.0


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    salted = skew.salted_join(li, o, "l_orderkey", "o_orderkey", salt_n=4).agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    ).first()
    assert plain["n"] == salted["n"]
    assert plain["q"] == salted["q"]


def test_salted_left_join_keeps_unmatched(spark):
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_name")
    big = load_table(spark, SF_DIR, "orders").filter(F.col("o_totalprice") > 400000)
    plain = c.join(big, c["c_custkey"] == big["o_custkey"], "left").count()
    salted = skew.salted_join(c, big, "c_custkey", "o_custkey", salt_n=4, how="left").count()
    assert plain == salted


def test_key_histogram(spark):
    h = skew.key_histogram(load_table(spark, SF_DIR, "lineitem"), "l_returnflag", top=3)
    rows = h.collect()
    assert len(rows) == 3
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-9


def test_salted_join_null_keys_match_plain(spark):
    # null keys — THE classic skew culprit — must behave identically to
    # the plain join: dropped by inner, preserved-with-nulls by left
    big = spark.createDataFrame(
        [(None, "a"), (1, "b"), (1, "c"), (2, "d"), (None, "e")],
        "k int, v string",
    )
    small = spark.createDataFrame([(1, "x"), (3, "y")], "k2 int, w string")
    for how in ("inner", "left"):
        plain = sorted(
            (r["v"], r["w"]) for r in big.join(small, big["k"] == small["k2"], how).collect()
        )
        salted = sorted(
            (r["v"], r["w"])
            for r in skew.salted_join(big, small, "k", "k2", salt_n=4, how=how).collect()
        )
        assert plain == salted, how


def test_transform_with_state_matches_group_state(spark, tmp_path):
    # the Spark 4 transformWithState form of the same per-key CDC
    # operator: identical latest-wins semantics across batches.
    # transformWithState's python worker protocol rides on protobuf,
    # which this container does not ship — skip (not fail) where the
    # dependency is absent; the operator itself is plain public API.
    pytest.importorskip("google.protobuf")
    drop = str(tmp_path / "drop_tws")
    os.makedirs(drop)
    _drop(drop, [{"id": "a", "seq": 1, "price": 10.0}, {"id": "b", "seq": 2, "price": 5.0}])
    _drop(drop, [{"id": "a", "seq": 0, "price": 99.0}, {"id": "b", "seq": 3, "price": 7.0}])

    stream = spark.readStream.schema("id string, seq long, price double").json(drop)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        stateful.keyed_cdc_transform_with_state(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["id"]: r for r in spark.table(name).collect()}
    assert got["a"]["last_seq"] == 1  # seq 0 never regresses latest-wins state
    assert got["a"]["last_price"] == 10.0
    assert got["a"]["n_events"] == 2
    assert got["b"]["last_seq"] == 3 and got["b"]["last_price"] == 7.0


def test_salted_join_actually_spreads_hot_key(spark):
    """The point of salting: a hot key's rows must land on MULTIPLE
    salts (the original key-derived salt was a constant per key —
    every hot row still hit one task)."""
    from pyspark.sql import functions as F

    hot = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("payload")
    )
    salted = hot.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(4))
    )
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts == 4, f"hot key spread over {n_salts}/4 salts"


def test_salted_join_tolerates_map_columns(spark):
    """Advisory r3: a map-typed payload column must not crash the salt
    hash (xxhash64 rejects MapType); results still match the plain
    join."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.skew import salted_join

    big = spark.createDataFrame(
        [(i % 3, {"k": str(i)}) for i in range(30)], "k int, payload map<string,string>"
    )
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, v string")
    out = salted_join(big, small, "k", "k").collect()
    plain = big.join(small, "k").collect()
    assert len(out) == len(plain) == 30
    assert sorted(r["v"] for r in out) == sorted(r["v"] for r in plain)


def test_salted_join_spreads_fully_duplicate_hot_rows(spark):
    """All-duplicate hot-key rows (no non-key variation) fall back to a
    positional salt: more than one distinct salt must appear."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.skew import salted_join
    from pyspark.sql import functions as F

    big = spark.createDataFrame([(7,)] * 64, "k int").repartition(8)
    small = spark.createDataFrame([(7, "x")], "k int, v string")
    out = salted_join(big, small, "k", "k")
    assert out.count() == 64
    # peek at the salt distribution before it is dropped
    from pyspark.sql.types import MapType  # noqa: F401

    salted = big.withColumn(
        "__salt",
        F.pmod(
            F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(8),
        ),
    )
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts > 1, "duplicate hot rows still collapse onto one salt"

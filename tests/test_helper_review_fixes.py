"""Regression pins for the round-4 review of functions/* and readers.

Each test encodes a bug the file-group review caught live:
ANSI-mode cast aborts in the typed parsers, the running_total group-key
string-roundtrip corruption, salted_join's silently-wrong right/full
joins and single-salt duplicate hot rows, davg's COUNT(*) denominator,
the \\x0B tokenizer divergence between Java \\s and RE2 \\s, and
hyperplane_signature's 64-plane long overflow.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions import (
    exact,
    normalize,
    skew,
    text,
    vectors,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import running_total
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
    SQL_TOKS_EXPR,
)


def test_parsers_null_not_crash_under_ansi(spark):
    # Spark 4 defaults ansi on: a malformed cell must yield NULL, not
    # abort the job (the reference's permissive-varchar contract).
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame(
        [("N/A", "garbage", "MAYBE", "x", "y"), ("  1,000.50 ", "29-Jun-17", "true", "12", "3.5")],
        "m string, d string, b string, i string, f string",
    )
    rows = df.select(
        normalize.parse_money("m").alias("m"),
        normalize.parse_date_dmmm("d").alias("d"),
        normalize.parse_bool("b").alias("b"),
    ).collect()
    assert rows[0]["m"] is None and rows[0]["d"] is None and rows[0]["b"] is None
    assert float(rows[1]["m"]) == 1000.50
    assert rows[1]["d"].isoformat() == "2017-06-29"
    assert rows[1]["b"] is True
    typed = normalize.typed_parse(df, {"i": "int", "f": "double"}).collect()
    assert typed[0]["i"] is None and typed[0]["f"] is None
    assert typed[1]["i"] == 12 and typed[1]["f"] == 3.5


def test_running_total_boolean_and_timestamp_groups(spark):
    # group keys that do NOT round-trip through str(py) == cast(string)
    # (boolean: 'True' vs 'true'); the offset lookup must still hit.
    import datetime as dt

    rows = [
        (i, bool(i % 2), dt.datetime(2024, 1, 1 + (i % 3)), 1) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "k int, g boolean, ts timestamp, v int")
    got = running_total(
        df, ["k"], "v", "cum", partitions=5, group_cols=["g"]
    ).collect()
    assert all(r["cum"] is not None for r in got)
    by_group = {}
    for r in sorted(got, key=lambda r: r["k"]):
        by_group.setdefault(r["g"], []).append(r["cum"])
    for g, cums in by_group.items():
        assert cums == list(range(1, len(cums) + 1)), g
    # timestamp group key (fractional-second formatting divergence)
    got_ts = running_total(
        df, ["k"], "v", "cum", partitions=5, group_cols=["ts"]
    ).collect()
    assert all(r["cum"] is not None for r in got_ts)


def test_running_total_null_group_key(spark):
    df = spark.createDataFrame(
        [(1, None, 10), (2, None, 20), (3, "a", 5)], "k int, g string, v int"
    )
    got = {r["k"]: r["cum"] for r in running_total(df, ["k"], "v", "cum", group_cols=["g"]).collect()}
    assert got == {1: 10, 2: 30, 3: 5}


def test_salted_join_rejects_right_full(spark):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    sm = spark.createDataFrame([(1, "x")], "k2 int, w string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner.*left"):
            skew.salted_join(df, sm, "k", "k2", how=how)


def test_salted_join_spreads_duplicate_hot_rows(spark):
    # 64 IDENTICAL rows of one hot key (constant payload) must not
    # collapse onto a single salt/task.
    big = spark.createDataFrame([(7, "same")] * 64, "k int, payload string")
    small = spark.createDataFrame([(7, "x")], "k2 int, w string")
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.skew import salted_join

    salted_big = big.repartition(8).withColumn(
        "__probe_salt",
        F.pmod(
            F.xxhash64("payload", F.spark_partition_id(), F.monotonically_increasing_id()),
            F.lit(8),
        ),
    )
    n_salts = salted_big.select("__probe_salt").distinct().count()
    assert n_salts > 1
    # and the join itself still matches the plain join
    plain = big.join(small, big["k"] == small["k2"]).count()
    assert salted_join(big, small, "k", "k2", salt_n=8).count() == plain


def test_key_histogram_single_scan_and_empty(spark):
    df = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "k string")
    rows = skew.key_histogram(df, "k").collect()
    assert {r["k"]: r["n"] for r in rows} == {"a": 6, "b": 2}
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-12
    empty = spark.createDataFrame([], "k string")
    assert skew.key_histogram(empty, "k").collect() == []


def test_davg_ignores_nulls(spark):
    df = spark.createDataFrame([(10.0,), (None,)], "v double")
    got = df.agg(exact.davg("v").alias("a")).first()["a"]
    assert got == 10.0
    duck = duckdb.sql(
        f"SELECT {exact.sql_davg('v')} AS a FROM (VALUES (10.0), (NULL)) t(v)"
    ).fetchone()[0]
    assert duck == 10.0


def test_tokens_vertical_tab_matches_duckdb(spark):
    # Java \s includes \x0B, RE2's does not — the oracle fragment now
    # spells the class explicitly so both engines agree.
    s = "a\x0bb  c\td\ne"
    spark_toks = (
        spark.createDataFrame([(s,)], "text string")
        .select(text.tokens("text").alias("t"))
        .first()["t"]
    )
    duck_toks = duckdb.sql(
        f"SELECT {SQL_TOKS_EXPR} FROM (VALUES ('{s}')) AS documents(text)"
    ).fetchone()[0]
    assert spark_toks == duck_toks == ["a", "b", "c", "d", "e"]


def test_hyperplane_signature_validates_plane_count():
    with pytest.raises(ValueError):
        vectors.hyperplane_signature(F.col("e"), [])
    with pytest.raises(ValueError):
        vectors.hyperplane_signature(F.col("e"), [[1.0]] * 64)


def test_signature_kernel_matches_reference(spark):
    """The Arrow matmul kernel (similarity._signature_rows) and the
    expression-form reference (vectors.hyperplane_signature) must
    produce identical (vec_id, table, sig) rows on the testdata, and
    the kernel must sign NULL and ragged vectors to bucket 0 instead
    of dying in np.stack."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        _signature_rows,
        _table_planes,
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", "embedding"
    )
    got = {
        (r["vec_id"], r["table"]): r["sig"] for r in _signature_rows(emb).collect()
    }
    want = {}
    for t, planes in enumerate(_table_planes()):
        for r in emb.select(
            "vec_id", vectors.hyperplane_signature(F.col("embedding"), planes).alias("s")
        ).collect():
            want[(r["vec_id"], t)] = r["s"]
    assert got == want

    dirty = spark.createDataFrame(
        [(1, None), (2, []), (3, [1.0] * 63)],
        "vec_id long, embedding array<float>",
    )
    rows = _signature_rows(dirty).collect()
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.similarity import (
        _L_TABLES,
    )

    assert len(rows) == 3 * _L_TABLES and all(r["sig"] == 0 for r in rows)

"""Round-9 batch-2 operators: property + plan pins for q_fim_transform,
q_bradley_terry, q_woe_encode, q_count_min_sketch, q_t_closeness and
q_max_concurrent (oracle parity itself is covered by
tests/test_oracle_diff.py's registry sweep)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_fim_roundtrip_reassembles_source(spark):
    # P + M + S (in source order) must equal the original text, and
    # all three parts are non-empty by construction
    out = REGISTRY["q_fim_transform"].fn(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = out.join(docs, "doc_id").select(
        "doc_id",
        "text",
        "cut_a",
        "cut_b",
        F.length("text").alias("n"),
        "fim_text",
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        pre, rest = r.fim_text.split("<fim_suffix>", 1)
        suf, mid = rest.split("<fim_middle>", 1)
        pre = pre.removeprefix("<fim_prefix>")
        assert pre and mid and suf, r.doc_id
        assert pre + mid + suf == r.text, r.doc_id
        assert 1 <= r.cut_a < r.cut_b <= r.n - 1, r.doc_id


def test_fim_is_exchange_free(spark):
    # pure projection: zero shuffles at any scale
    df = REGISTRY["q_fim_transform"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df).split("== Physical Plan ==")[-1]
    assert "Exchange" not in text, text


def test_count_min_never_underestimates(spark):
    out = REGISTRY["q_count_min_sketch"].fn(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.cms_est >= r.true_cnt, r
        assert r.overestimate == r.cms_est - r.true_cnt


def test_bradley_terry_invariants(spark):
    rows = REGISTRY["q_bradley_terry"].fn(spark, SF_DIR).collect()
    assert len(rows) >= 2
    # sum-normalized each iteration: Σπ ≈ m (within per-item rounding)
    total = sum(r.bt_score for r in rows)
    assert math.isclose(total, len(rows), rel_tol=1e-5), total
    for r in rows:
        assert r.bt_score > 0
        assert 0 <= r.n_wins <= r.n_games
    # games are symmetric pairings: Σ wins == Σ games / 2
    assert sum(r.n_wins for r in rows) * 2 == sum(r.n_games for r in rows)


def test_woe_totals_cover_orders(spark):
    rows = REGISTRY["q_woe_encode"].fn(spark, SF_DIR).collect()
    n = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority").isNotNull())
        .count()
    )
    assert sum(r.n_good + r.n_bad for r in rows) == n
    for r in rows:
        assert math.isfinite(r.woe)


def test_t_closeness_emd_bounds(spark):
    rows = REGISTRY["q_t_closeness"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.emd <= 1.0, r
        assert r.meets_t == (r.emd <= 0.2), r


def test_max_concurrent_matches_bruteforce(spark):
    # brute force at sf0.001: count open intervals per day directly
    out = REGISTRY["q_max_concurrent"].fn(
        spark, SF_DIR.replace("sf0.01", "sf0.001")
    ).collect()[0]
    o = spark.read.parquet(
        f"{SF_DIR.replace('sf0.01', 'sf0.001')}/orders.parquet"
    )
    iv = o.select(
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 28 + 1).cast("int"),
        ).alias("e"),
    ).collect()
    days = sorted({r.s for r in iv})
    best_n, best_d = -1, None
    for d in days:
        n = sum(1 for r in iv if r.s <= d < r.e)
        if n > best_n:
            best_n, best_d = n, d
    assert out.max_concurrent == best_n
    assert out.at_day == best_d


def test_round9_batch2_plan_shapes(spark):
    # no cartesian / data-scaled nested-loop anywhere in the batch
    for name in (
        "q_woe_encode",
        "q_count_min_sketch",
        "q_t_closeness",
        "q_max_concurrent",
        "q_bradley_terry",
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)

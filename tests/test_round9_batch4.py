"""Round-9 batch-4 operators: property + plan pins for
q_distribution_match, q_quantile_sample_sketch, q_ips_policy_eval and
q_bootstrap_ci."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
    md5_unit,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_distribution_match_moves_toward_target(spark):
    rows = REGISTRY["q_distribution_match"].fn(spark, SF_DIR).collect()
    assert rows
    assert any(r.accept_prob == 1.0 for r in rows)  # the max-ratio bin
    for r in rows:
        assert 0.0 <= r.accept_prob <= 1.0
        assert 0 <= r.n_accepted <= r.n_orig
    # L1 distance to the reference distribution must shrink
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        (F.col("n_chars") / 100).cast("bigint").alias("bin"),
        (F.substring("source", 4, 10).cast("int") < 10).alias("is_crawl"),
    )
    ref = {
        r.bin: r.c
        for r in docs.filter(~F.col("is_crawl"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    n_ref = sum(ref.values())
    orig = {r.bin: r.n_orig for r in rows}
    acc = {r.bin: r.n_accepted for r in rows}
    bins = set(ref) | set(orig)

    def l1(counts):
        n = sum(counts.values()) or 1
        return sum(
            abs(counts.get(b, 0) / n - ref.get(b, 0) / n_ref) for b in bins
        )

    assert l1(acc) <= l1(orig) + 1e-9, (l1(acc), l1(orig))


def test_quantile_sketch_partition_independent(spark):
    # hash-order top-K is the same sample under ANY partitioning —
    # the structural mergeability claim
    out = REGISTRY["q_quantile_sample_sketch"].fn(spark, SF_DIR).collect()[0]
    assert out.k == 2048
    assert out.err_p50 == round(abs(out.est_p50 - out.exact_p50), 4)
    # a 2048-point uniform sample pins the median within a few percent
    assert out.err_p50 / out.exact_p50 < 0.05, out
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").repartition(7)
    h = md5_unit(
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        )
    )
    sample = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .select(F.col("l_extendedprice").alias("v"), h.alias("h"),
                "l_orderkey", "l_linenumber")
        .orderBy("h", "l_orderkey", "l_linenumber")
        .limit(2048)
    )
    est = sample.agg(
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("p50")
    ).collect()[0]
    assert est.p50 == out.est_p50


def test_ips_policy_eval_invariants(spark):
    out = REGISTRY["q_ips_policy_eval"].fn(spark, SF_DIR).collect()[0]
    n_events = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type").isNotNull())
        .count()
    )
    assert out.n == n_events
    assert out.ips >= 0 and out.snips >= 0
    assert 0 < out.ess <= out.n
    # SNIPS is IPS rescaled by n/Σw — both estimate the same value and
    # land in [0, 1] for a binary reward
    assert 0 <= out.ips <= 1 and 0 <= out.snips <= 1


def test_bootstrap_ci_brackets_mean(spark):
    out = REGISTRY["q_bootstrap_ci"].fn(spark, SF_DIR).collect()[0]
    assert out.b == 200
    assert out.ci_lo <= out.mean_rev <= out.ci_hi, out
    assert out.ci_lo < out.ci_hi


def test_round9_batch4_plan_shapes(spark):
    for name in (
        "q_distribution_match",
        "q_quantile_sample_sketch",
        "q_ips_policy_eval",
        "q_bootstrap_ci",
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
    # the sketch sample must be a TakeOrdered (per-partition top-K +
    # K-bounded merge), never a global sort
    qs = plans.formatted_plan(
        REGISTRY["q_quantile_sample_sketch"].fn(spark, SF_DIR)
    )
    assert "TakeOrderedAndProject" in qs, qs

"""Round-9 batch-3 operators: property + plan pins for
q_link_prediction, q_shapley_attribution, q_survival_km,
q_dp_noisy_count and q_seq_patterns (oracle parity is covered by the
registry sweep in tests/test_oracle_diff.py)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_link_prediction_invariants(spark):
    rows = REGISTRY["q_link_prediction"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r.s1 < r.s2
        assert r.common_parts >= 1
        assert r.adamic_adar > 0
        assert 0 < r.jaccard <= 1
    # output arrives in the total (aa desc, s1, s2) order
    keys = [(-r.adamic_adar, r.s1, r.s2) for r in rows]
    assert keys == sorted(keys)


def test_shapley_efficiency_axiom(spark):
    # Σ shapley over channels == v(grand coalition) − v(∅), the
    # defining efficiency property of the exact enumeration
    rows = REGISTRY["q_shapley_attribution"].fn(spark, SF_DIR).collect()
    assert len(rows) == 4
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    per = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    n_total, n_conv = per.agg(
        F.count(F.lit(1)), F.sum("conv")
    ).first()
    v_full = round(n_conv / n_total, 6)
    # v(∅): users with NO touches at all (only purchases)
    touched = ev.filter(F.col("event_type") != "purchase").select(
        "user_id"
    ).distinct()
    untouched = per.join(touched, "user_id", "left_anti")
    n0, c0 = untouched.agg(F.count(F.lit(1)), F.sum("conv")).first()
    v_empty = round((c0 or 0) / n0, 6) if n0 else 0.0
    total = sum(r.shapley for r in rows)
    assert math.isclose(total, v_full - v_empty, abs_tol=1e-4), (
        total,
        v_full,
        v_empty,
    )


def test_survival_km_curve_shape(spark):
    rows = sorted(
        REGISTRY["q_survival_km"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.t_days,
    )
    assert rows
    n_total = sum(r.d_events + r.n_censored for r in rows)
    assert rows[0].n_risk == n_total
    prev_s, prev_risk = 1.0 + 1e-9, n_total + 1
    for r in rows:
        assert 0.0 <= r.survival <= prev_s + 1e-9, r
        assert r.n_risk < prev_risk
        prev_s, prev_risk = r.survival, r.n_risk


def test_dp_noise_matches_inverse_cdf(spark):
    # the deterministic Laplace draw is exactly reproducible from the
    # md5-uniform — recompute it per category and compare
    rows = REGISTRY["q_dp_noisy_count"].fn(spark, SF_DIR).collect()
    true = {
        r.o_orderpriority: r.n
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        h = hashlib.md5(f"{r.category}:dp-seed".encode()).hexdigest()
        u = int(h[:15], 16) / float(1 << 60)
        sign = 1.0 if u >= 0.5 else -1.0
        noise = round(-sign * math.log(max(1.0 - 2.0 * abs(u - 0.5), 1e-12)), 6)
        assert math.isclose(
            r.noisy_count, true[r.category] + noise, abs_tol=2e-6
        ), r
        assert r.epsilon == 1.0


def test_seq_patterns_bounds(spark):
    rows = REGISTRY["q_seq_patterns"].fn(spark, SF_DIR).collect()
    assert rows
    n = {(r.antecedent, r.consequent): r.n_users for r in rows}
    for r in rows:
        assert 0 < r.support <= 1
        assert r.antecedent != r.consequent
    # antisymmetry: a-before-b and b-before-a partition users having
    # both types (strict total order on firsts ⇒ no double counting)
    both = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("k"))
        .filter(F.col("k") == 2)
        .count()
    )
    assert n[("view", "click")] + n[("click", "view")] == both


def test_round9_batch3_plan_shapes(spark):
    for name in (
        "q_link_prediction",
        "q_shapley_attribution",
        "q_survival_km",
        "q_dp_noisy_count",
        "q_seq_patterns",
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
    # link prediction's top-k must be a TakeOrdered, not a global sort
    lp = plans.formatted_plan(
        REGISTRY["q_link_prediction"].fn(spark, SF_DIR)
    )
    assert "TakeOrderedAndProject" in lp, lp

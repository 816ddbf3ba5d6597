"""Round-9 batch-6 operators: property + plan pins for q_causal_did
and q_conformal_prediction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_did_identity(spark):
    out = REGISTRY["q_causal_did"].fn(spark, SF_DIR).collect()[0]
    for c in ("pre_treat", "post_treat", "pre_ctrl", "post_ctrl"):
        assert out[c] is not None and out[c] > 0
    assert math.isclose(
        out.did,
        round(
            (out.post_treat - out.pre_treat) - (out.post_ctrl - out.pre_ctrl),
            6,
        ),
        abs_tol=1e-9,
    )


def test_conformal_coverage_near_nominal(spark):
    # at sf0.01 the test split is large enough that empirical coverage
    # sits near the 90% nominal level (split-conformal guarantee)
    out = REGISTRY["q_conformal_prediction"].fn(
        spark, SF_DIR.replace("sf0.001", "sf0.01")
    ).collect()[0]
    assert out.n_calib > 100 and out.n_test > 100
    assert out.q_hat > 0
    assert out.interval_width == round(2 * out.q_hat, 4)
    assert 0.85 <= out.test_coverage <= 0.95, out


def test_conformal_splits_are_disjoint_and_exhaustive(spark):
    # the three md5-unit thirds cover every order exactly once
    out = REGISTRY["q_conformal_prediction"].fn(spark, SF_DIR).collect()[0]
    n_orders = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority").isNotNull())
        .count()
    )
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.portable_hash import (
        md5_unit,
    )

    u = md5_unit(
        F.concat(F.col("o_orderkey").cast("string"), F.lit(":conf"))
    )
    n_train = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority").isNotNull())
        .filter(u < 0.5)
        .count()
    )
    assert n_train + out.n_calib + out.n_test == n_orders


def test_round9_batch6_plan_shapes(spark):
    for name in ("q_causal_did", "q_conformal_prediction"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
    # DiD is a single conditional aggregate: no join anywhere
    did = plans.formatted_plan(
        REGISTRY["q_causal_did"].fn(spark, SF_DIR)
    ).split("== Physical Plan ==")[-1]
    assert "Join" not in did, did

"""Round-7 hardening pins: the q_robust_scale exact/approx percentile
knob (VERDICT r6 §wrong-3) and its plan-shape invariants."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.evalprep import (
    _ROBUST_EXACT_MAX_ROWS,
    q_robust_scale,
)

from conftest import SF_DIR


def test_robust_scale_approx_path_plan(spark):
    # the approx path keeps the exact path's shape — one stats
    # aggregate (bounded t-digest state, partial+final merge) broadcast
    # back onto the fact scan — and contains NO per-group sort and no
    # exact-percentile full-buffer aggregate
    df = q_robust_scale(spark, SF_DIR, exact=False)
    text = plans.formatted_plan(df)
    assert "approx_percentile" in text, text
    assert "percentile(" not in text.replace("approx_percentile(", ""), text
    assert "Sort " not in text.split("== Physical Plan ==")[-1].split("(1)")[0], text
    assert plans.has_broadcast_join(df)
    # partial aggregation must survive (map-side t-digest merge): the
    # stats agg appears as a partial/final HashAggregate pair
    assert text.count("HashAggregate") + text.count("ObjectHashAggregate") >= 2, text


def test_robust_scale_exact_path_plan(spark):
    df = q_robust_scale(spark, SF_DIR, exact=True)
    text = plans.formatted_plan(df)
    assert "approx_percentile" not in text, text
    assert plans.has_broadcast_join(df)


def test_robust_scale_threshold_routes_to_exact_at_test_sf(spark):
    # sf0.001/sf0.01 are far below the knob threshold, so the default
    # (oracle-facing) path is exact — DuckDB parity is unchanged
    df = q_robust_scale(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "approx_percentile" not in text, text
    assert _ROBUST_EXACT_MAX_ROWS >= 1_000_000


def test_robust_scale_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ROBUST_EXACT", "0")
    df = q_robust_scale(spark, SF_DIR)
    assert "approx_percentile" in plans.formatted_plan(df)
    monkeypatch.setenv("SPARK_GRAFT_ROBUST_EXACT", "1")
    df = q_robust_scale(spark, SF_DIR)
    assert "approx_percentile" not in plans.formatted_plan(df)


def test_robust_scale_approx_tracks_exact(spark):
    # t-digest at accuracy 10k lands within 1e-2 of the exact robust
    # score on the sf0.001 price distribution — the knob changes cost,
    # not meaning
    e = {
        (r["l_orderkey"], r["l_linenumber"]): r["robust_price"]
        for r in q_robust_scale(spark, SF_DIR, exact=True).collect()
    }
    a = {
        (r["l_orderkey"], r["l_linenumber"]): r["robust_price"]
        for r in q_robust_scale(spark, SF_DIR, exact=False).collect()
    }
    assert e.keys() == a.keys()
    worst = max(abs(e[k] - a[k]) for k in e)
    assert worst < 1e-2, worst


def test_attribution_windows_partition_by_user(spark):
    # both attribution models: every window is keyed on a high-
    # cardinality column (user_id for last-touch's preceding-channel
    # scan; p_id for linear's per-purchase denominator since the r9
    # lookback rewrite), never a global SinglePartition sort, and the
    # plan has no CartesianProduct (the credit join is keyed on
    # user_id + horizon bucket)
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

    for name, key in (
        ("q_last_touch_attribution", "user_id"),
        ("q_linear_attribution", "p_id"),
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
        assert "Exchange SinglePartition" not in text.split("AdaptiveSparkPlan")[
            -1
        ].split("HashAggregate")[0], (name, text)
        assert f"windowspecdefinition({key}" in text, (name, text)


def test_linear_attribution_conserves_revenue(spark):
    # the equal split must conserve each purchase's value up to the
    # 6dp per-touch rounding: sum of channel credits == sum of
    # attributable purchase values within n_touches*5e-7 per purchase
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import (
        load_table,
    )
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    credited = sum(
        r["revenue"]
        for r in REGISTRY["q_linear_attribution"].fn(spark, SF_DIR).collect()
    )
    ev = load_table(spark, SF_DIR, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributable = (
        ev.withColumn(
            "n_touches",
            F.count(F.when(F.col("event_type") != "purchase", 1)).over(w),
        )
        .filter((F.col("event_type") == "purchase") & (F.col("n_touches") > 0))
        .agg(F.sum(F.col("value").cast("decimal(12,2)")).cast("double"))
        .first()[0]
    )
    assert abs(credited - attributable) < 1.0, (credited, attributable)


def test_winsorize_and_mad_share_the_percentile_knob(spark):
    # the family knob (functions/quantiles.py): approx path swaps the
    # aggregate implementation, keeps the broadcast-stats plan shape,
    # and the default at test SF stays exact (oracle parity unchanged)
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.relational import (
        q_mad_outliers,
        q_winsorize,
    )

    for fn in (q_winsorize, q_mad_outliers):
        approx = plans.formatted_plan(fn(spark, SF_DIR, exact=False))
        assert "approx_percentile" in approx, (fn.__name__, approx)
        assert plans.has_broadcast_join(fn(spark, SF_DIR, exact=False))
        default = plans.formatted_plan(fn(spark, SF_DIR))
        assert "approx_percentile" not in default, (fn.__name__, default)

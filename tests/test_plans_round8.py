"""Round-8 plan pins: the four new operators' scale shapes.

Each pin is the structural property the operator's docstring promises —
a renamed column or helper change that silently degrades the plan
(cartesian, single-task global sort, unpushed filter) breaks here, not
at 100 TB.
"""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.behavioral import (
    q_impression_click_join,
    q_time_decay_attribution,
)
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.dedup import (
    q_fuzzy_match,
    q_record_linkage,
    q_sorted_neighborhood,
)

from conftest import SF_DIR


def test_impression_click_join_is_a_keyed_hash_join(spark):
    # the compound (user_id, bucket) key must plan an EQUI join — a
    # BroadcastNestedLoopJoin here would mean the bucket decomposition
    # regressed to a pure range join
    df = q_impression_click_join(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "BroadcastNestedLoopJoin" not in text, text
    assert "CartesianProduct" not in text, text
    # the event_type filters reach the scan (no vacuous fallback — the
    # literal 'view' always appears in the Filter node's text)
    assert plans.has_pushed_filter(df, "view"), text


def test_time_decay_window_is_keyed_by_purchase(spark):
    # the normalizer window partitions by p_id (purchases-many 1-group
    # partitions) — a global (unpartitioned) window would funnel every
    # credit through one task
    df = q_time_decay_attribution(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "CartesianProduct" not in text, text
    phys = text.split("== Physical Plan ==")[-1]
    assert "SinglePartition" not in phys, phys


def test_sorted_neighborhood_has_no_global_sort_bottleneck(spark):
    # the dense rank comes from assign_dense_ids (range partition +
    # local sort) — the single-task row_number() shape plans a
    # SinglePartition exchange, which must never appear
    df = q_sorted_neighborhood(spark, SF_DIR)
    text = plans.formatted_plan(df)
    phys = text.split("== Physical Plan ==")[-1]
    assert "SinglePartition" not in phys, phys
    assert "CartesianProduct" not in text, text


def test_record_linkage_candidates_are_block_joined(spark):
    df = q_record_linkage(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "CartesianProduct" not in text, text
    assert "BroadcastNestedLoopJoin" not in text, text


def test_target_encoding_broadcasts_category_stats(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.featureprep import (
        q_target_encoding_loo,
    )

    df = q_target_encoding_loo(spark, SF_DIR)
    assert plans.has_broadcast_join(df)
    assert "CartesianProduct" not in plans.formatted_plan(df)


def test_quantile_normalize_windows_distinct_values_not_facts(spark):
    # the oracle is a percent_rank window; the plan must be the
    # distinct-value decomposition — no fact-table window (a window
    # over 3 giant l_returnflag partitions would show a fact-side sort
    # feeding Window; here Window consumes the (group, value) agg)
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.featureprep import (
        q_quantile_normalize,
    )

    df = q_quantile_normalize(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert plans.has_broadcast_join(df)
    # the Window's input is the aggregated distinct-value frame: a
    # HashAggregate must appear below the Window in the plan tree
    phys = text.split("== Physical Plan ==")[-1]
    assert "Window" in phys and "HashAggregate" in phys, phys


def test_fuzzy_match_union_blocking_pair_budget(spark):
    # the round-8 compound-block rewrite: candidate volume at test SF
    # must stay bounded (sf0.001: 150 customers -> a few hundred pairs,
    # nothing within an order of magnitude of all-pairs ~11k)
    n = q_fuzzy_match(spark, SF_DIR).count()
    assert 0 < n < 2000, n


def test_time_decay_zero_weight_purchase_drops_not_nan(spark, tmp_path):
    # a purchase whose every touch is old enough that all 6dp decay
    # weights round to 0 (age >> 146 days at 7-day half-life) must DROP
    # from the attribution, never divide 0/0 into NaN credits
    # (review-caught: Spark silently nulls the NaN at the decimal cast,
    # DuckDB errors — both wrong answers)
    import datetime as dt

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.behavioral import (
        q_time_decay_attribution,
    )

    sf_dir = str(tmp_path)
    t0 = dt.datetime(2020, 1, 1)
    rows = [
        # user 1: touch 3 YEARS before the purchase -> weight rounds to 0
        (1, t0, 1, "click", 10.0, None),
        (2, t0 + dt.timedelta(days=1095), 1, "purchase", 99.0, None),
        # user 2: fresh touch -> normal credit
        (3, t0, 2, "view", 5.0, None),
        (4, t0 + dt.timedelta(hours=1), 2, "purchase", 50.0, None),
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    out = {r["channel"]: r["revenue"] for r in q_time_decay_attribution(spark, sf_dir).collect()}
    # the stale-touch purchase contributes nothing anywhere; the fresh
    # one credits its full value to 'view'
    assert "click" not in out, out
    assert abs(out["view"] - 50.0) < 1e-6, out
    for v in out.values():
        assert v == v, f"NaN leaked into revenue: {out}"

"""Round-9 plan pins: the new/changed operators keep their scale-safe
physical shapes."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_sim_index_incremental_plan_shape(spark):
    # the maintained-index plan: broadcast codebook joins (32 rows),
    # delta upsert as left_anti + union — never a cartesian, never a
    # data-scaled broadcast
    df = REGISTRY["q_sim_index_incremental"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "CartesianProduct" not in text, text
    assert "LeftAnti" in text, text
    assert plans.has_broadcast_join(df), text


def test_attribution_lookback_join_is_bucket_keyed(spark):
    # the r9 lookback rewrite: the purchases⋈touches join must carry
    # the horizon-bucket compound key (user_id AND bucket as hash join
    # keys), never a plain user_id join with a residual-only range —
    # and never a cartesian
    for name in ("q_linear_attribution", "q_time_decay_attribution"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
        assert "BroadcastNestedLoopJoin" not in text, (name, text)
        # the bucket column participates in the join key expression
        assert "p_bucket" in text, (name, text)


def test_late_round9_ops_plan_shapes(spark):
    # q_text_index_incremental: the signed-delta fold merges with ONE
    # full-outer join on term; q_dedup_cross_spans: no self-join of the
    # window rows (multiplicity is a window count on deduped pairs);
    # q_pass_at_k: every k folds into a single global aggregate
    # (no per-k re-scan)
    for name, must, must_not in (
        ("q_text_index_incremental", "FullOuter", "CartesianProduct"),
        ("q_dedup_cross_spans", None, "CartesianProduct"),
        ("q_pass_at_k", None, "CartesianProduct"),
    ):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
        assert "BroadcastNestedLoopJoin" not in text, (name, text)
        if must:
            assert must in text, (name, text)
    # q_pass_at_k reads events exactly once (the AQE-formatted text
    # lists a scan node up to twice — once in the adaptive plan, once
    # in the initial one — so "once" reads as ≤ 2 mentions; a per-k
    # re-scan would mention it ≥ 3×)
    phys = plans.formatted_plan(
        REGISTRY["q_pass_at_k"].fn(spark, SF_DIR)
    ).split("== Physical Plan ==")[-1]
    assert phys.count("Scan parquet") <= 2, phys

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

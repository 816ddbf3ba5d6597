"""Physical-plan pins for the round-5 operators: the plan shapes that
make them survive 100 TB (SCALE.md 'Round-5 additions') must actually
be in the executed plan, not just in docstrings."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_ohlc_is_single_hash_agg_no_window(spark):
    # open/close come from min/max(struct) — one aggregate, no window
    # sort, no self-join
    df = REGISTRY["q_ohlc_bars"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Window" not in text, text
    assert "partial_min" in text and "partial_max" in text, text


def test_vocab_topk_is_take_ordered_not_global_sort(spark):
    # the top-K vocabulary cut must be TakeOrderedAndProject
    # (distributed partial top-K), never a single-task global sort
    df = REGISTRY["q_vocab_coverage"].fn(spark, SF_DIR)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in text, text
    assert "Exchange SinglePartition" not in text, text


def test_vocab_joined_back_as_broadcast(spark):
    df = REGISTRY["q_vocab_coverage"].fn(spark, SF_DIR)
    assert plans.has_broadcast_join(df)


def test_zscore_stats_join_is_broadcast(spark):
    # the per-segment moments frame is domain-bounded — rows must NOT
    # move for the normalize join
    df = REGISTRY["q_zscore_normalize"].fn(spark, SF_DIR)
    assert plans.has_broadcast_join(df)


def test_delete_vector_apply_has_no_global_sort(spark):
    # positions are assigned per file (windows partition by file_id);
    # the tombstone apply is a keyed anti join
    df = REGISTRY["q_delete_vector_apply"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in text, text
    assert "LeftAnti" in text, text


def test_ewma_window_is_partitioned_by_year(spark):
    # the FIR window must never be an unpartitioned global ORDER BY
    df = REGISTRY["q_ewma"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in text, text
    assert "windowspecdefinition(yr" in text, text


def test_bit_and_mode_aggregates_partial(spark):
    # associative aggregates must map-side combine
    for name in ("q_bit_aggregates", "q_histogram_2d", "q_vwap"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "partial" in text.lower(), (name, text)


def test_gini_window_runs_on_aggregate_not_facts(spark):
    # the rank window's DIRECT input chain must be the per-(nation,
    # supplier) aggregate — not fact-table rows.  Pin the child chain:
    # below the deepest Window in the tree, a HashAggregate must appear
    # before any parquet Scan (only Sort/Exchange/Project may sit in
    # between), and that aggregate's keys are (s_nationkey, l_suppkey).
    import re as _re

    df = REGISTRY["q_gini_concentration"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "windowspecdefinition(s_nationkey" in text, text
    lines = text.splitlines()
    win_idx = max(i for i, l in enumerate(lines) if "Window (" in l)
    below = lines[win_idx + 1 :]
    for l in below:
        if "HashAggregate" in l:
            break  # aggregate reached first: window input is pre-aggregated
        assert "Scan" not in l, (
            "fact-table scan feeds the window before any aggregate:\n" + text
        )
    else:
        raise AssertionError("no HashAggregate below the rank window:\n" + text)
    assert _re.search(r"Keys \[2\]: \[s_nationkey#\d+, l_suppkey#\d+", text), text


def test_target_encode_prior_is_broadcast(spark):
    df = REGISTRY["q_target_encode"].fn(spark, SF_DIR)
    assert plans.has_broadcast_join(df)

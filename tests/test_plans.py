"""Physical-plan assertions (SURVEY.md §4.3, B30): the plans must be
the ones we'd want at 100 TB — filters pushed into the parquet scan,
columns pruned, dimensions broadcast, expressions codegen'd, top-k as
TakeOrderedAndProject rather than a global sort."""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_scan_pushdown_and_pruning(spark):
    df = REGISTRY["q_scan_lineitem"].fn(spark, SF_DIR)
    assert plans.has_pushed_filter(df, "l_shipdate")
    # projection needs 5 columns; the scan must not read the other 6
    assert plans.reads_only_columns(
        df, {"l_orderkey", "l_partkey", "l_quantity", "l_extendedprice", "l_shipdate"}
    )


def test_flagship_pushdown_and_partial_agg(spark):
    df = REGISTRY["q_pricing_summary"].fn(spark, SF_DIR)
    assert plans.has_pushed_filter(df, "l_shipdate")
    # map-side combine before the shuffle — the property that keeps the
    # exchange small at any scale
    assert "partial_sum" in plans.formatted_plan(df)


def test_star_join_broadcasts_dimensions(spark):
    df = REGISTRY["q_star_join"].fn(spark, SF_DIR)
    assert plans.has_broadcast_join(df)


def test_topk_avoids_global_sort(spark):
    df = REGISTRY["q_topk"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_lexicon_join_is_broadcast(spark):
    df = REGISTRY["q_text_lexicon"].fn(spark, SF_DIR)
    assert plans.has_broadcast_join(df)


def test_explain_surfaces(spark):
    # B30 EXPLAIN smoke: formatted plan text is reachable for any query
    df = REGISTRY["q_group_agg"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "HashAggregate" in text and "Exchange" in text

"""Physical-plan assertions (SURVEY.md §4.3, B30): the plans must be
the ones we'd want at 100 TB — filters pushed into the parquet scan,
columns pruned, dimensions broadcast, expressions codegen'd, top-k as
TakeOrderedAndProject rather than a global sort."""

from __future__ import annotations

import pytest

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


def test_asof_join_is_one_window_pass(spark):
    # the scalable as-of form: no join node at all, one window exchange,
    # both event_type filters pushed to the parquet scan
    df = REGISTRY["q_asof_join"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Join" not in text and "Window" in text
    assert plans.has_pushed_filter(df, "event_type")


def test_range_join_is_hash_not_nested_loop(spark):
    # bucketed interval join must plan as an equi join (hash or
    # sort-merge — AQE picks by the windows side's runtime size; no
    # forced broadcast hint, which would OOM on incident-heavy data); a
    # BroadcastNestedLoopJoin here would be the O(n*m) plan we rejected
    df = REGISTRY["q_range_join"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "HashJoin" in text or "SortMergeJoin" in text
    assert "BroadcastNestedLoopJoin" not in text


def test_sort_multi_has_no_single_partition_window(spark):
    # B16 global positions must come from the range-partitioned
    # dense-id path: every Window/Sort in the plan is partition-local,
    # never a single-task global funnel
    df = REGISTRY["q_sort_multi"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    # the old Window.orderBy form planned "Exchange SinglePartition"
    assert "Exchange SinglePartition" not in text, text
    # the surviving Window is keyed by the range-partition id, so every
    # numbering task works one partition (the upstream rangepartitioning
    # Exchange is hidden behind the localCheckpoint lineage cut)
    assert "windowspecdefinition(__pid" in text, text


def test_sessionize_single_sort_exchange(spark):
    # both window passes share one (user_id)x(ts,event_id) ordering:
    # exactly one Sort in the plan, reused by lag + running sum
    df = REGISTRY["q_sessionize"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert len([line for line in text.splitlines() if "Sort (" in line]) == 1, text


def test_shipping_priority_topk_and_broadcast(spark):
    df = REGISTRY["q_shipping_priority"].fn(spark, SF_DIR)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in text
    assert plans.has_broadcast_join(df)
    assert plans.has_pushed_filter(df, "l_shipdate")


def test_correlated_subquery_is_decorrelated(spark):
    # the correlated scalar subquery must rewrite to aggregate + join —
    # a per-row subquery execution would be O(n) scans
    df = REGISTRY["q_correlated_min"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Join" in text and "HashAggregate" in text
    assert "ScalarSubquery" not in text


def test_min_cost_supplier_partial_agg_and_broadcast(spark):
    # Q2 shape: the lineitem offer table must partial-aggregate before
    # its shuffle; the supplier/nation/region closure must broadcast
    df = REGISTRY["q_min_cost_supplier"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "partial_min" in text
    assert plans.has_broadcast_join(df)


def test_local_supplier_volume_pushdown_and_broadcast(spark):
    # Q5 shape: the year filter reaches the orders scan; the dimension
    # closure broadcasts
    df = REGISTRY["q_local_supplier_volume"].fn(spark, SF_DIR)
    assert plans.has_pushed_filter(df, "o_orderdate")
    assert plans.has_broadcast_join(df)


def test_returned_item_revenue_topk_and_pushdown(spark):
    # Q10 shape: returnflag pushed to lineitem's scan, limit compiles
    # to TakeOrderedAndProject (per-partition heaps, no global sort)
    df = REGISTRY["q_returned_item_revenue"].fn(spark, SF_DIR)
    assert plans.has_pushed_filter(df, "l_returnflag")
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()


def test_bpe_pair_freqs_partial_agg_topk(spark):
    # pair counting must map-side combine; top-50 is per-partition heaps
    df = REGISTRY["q_bpe_pair_freqs"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "partial_count" in text
    assert "TakeOrderedAndProject" in df._jdf.queryExecution().executedPlan().toString()


def test_corpus_curation_prunes_scan(spark):
    # the curation chain needs only (doc_id, text) from the scan
    df = REGISTRY["q_corpus_curation"].fn(spark, SF_DIR)
    assert plans.reads_only_columns(df, {"doc_id", "text"})


def test_chunk_documents_is_map_only(spark):
    # chunking must be a stateless flat explode: no Exchange (shuffle)
    # anywhere in the plan — a map-only job at any corpus size
    df = REGISTRY["q_chunk_documents"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Exchange" not in text, text


def test_pack_sequences_no_global_window(spark):
    # the token cumsum must come from the range-partitioned prefix sum,
    # never a single-partition global window
    df = REGISTRY["q_pack_sequences"].fn(spark, SF_DIR)
    text = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in text, text


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    # B30/§4: joining a date-partitioned fact to a filtered dim must
    # insert a dynamic pruning subquery into the fact scan -- at scale
    # this is what turns a full-table scan into a few partitions
    from pyspark.sql import functions as F

    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = f"{tmp_path}/part_orders"
    o.withColumn("od", F.to_date("o_orderdate")).write.partitionBy("od").parquet(path)
    fact = spark.read.parquet(path)
    dim = (
        o.select(F.to_date("o_orderdate").alias("od"))
        .distinct()
        .filter(F.col("od") >= "1996-01-01")
        .limit(3)
    )
    j = fact.join(dim, "od")
    txt = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in txt.lower(), txt


def test_lateral_topk_decorrelates_to_window(spark):
    # the correlated LATERAL LIMIT must rewrite to a ranking window
    # partitioned by the correlation key, never a per-row re-scan
    df = REGISTRY["q_lateral_topk"].fn(spark, SF_DIR)
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in txt, txt
    assert "CartesianProduct" not in txt, txt
    assert "BroadcastNestedLoopJoin" not in txt, txt


def test_dominant_supplier_single_fact_scan(spark):
    # the per-part windowed total must not duplicate the aggregate
    # subtree: one scan per table (lineitem, part, supplier), no more
    df = REGISTRY["q_dominant_supplier"].fn(spark, SF_DIR)
    txt = df._jdf.queryExecution().executedPlan().toString()
    n_scans = sum(1 for line in txt.splitlines() if "FileScan" in line)
    assert n_scans == 3, txt


def test_lm_score_join_is_head_split(spark):
    # the corpus-bigrams ⋈ model join must be head-split: the hot
    # bigrams (top-K by frequency — the only keys that can skew) score
    # through a BROADCAST hash join with no exchange on the corpus
    # side, and only the tail rows reach a shuffle join.  The head
    # selection itself must be a TakeOrderedAndProject on the model
    # (|vocab²|-bounded), never a global sort of corpus rows.
    # the query checkpoints the joined frame (single-execution fix), so
    # inspect the PRE-checkpoint frame the query is built from
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.curation import (
        _lm_model_and_bigrams,
    )

    j, _ = _lm_model_and_bigrams(spark, SF_DIR)
    txt = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in txt, f"no broadcast head join in plan:\n{txt}"
    assert "TakeOrderedAndProject" in txt, f"head pick is not a bounded top-k:\n{txt}"
    assert "CartesianProduct" not in txt and "BroadcastNestedLoopJoin" not in txt, txt
    # and the final plan must consume the checkpointed frame once per
    # branch (ExistingRDD), not rebuild the join per branch
    df = REGISTRY["q_lm_score"].fn(spark, SF_DIR)
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in final, final


def test_spine_ops_scan_facts_once(spark):
    # q_gap_fill / q_interpolate consume the per-day aggregate twice
    # (bounds + fill join); the checkpoint must cap orders at ONE scan
    for name in ("q_gap_fill", "q_interpolate"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        txt = df._jdf.queryExecution().executedPlan().toString()
        n_scans = sum(1 for line in txt.splitlines() if "FileScan" in line)
        assert n_scans <= 1, (name, txt)


@pytest.mark.slow
def test_no_cartesian_product_anywhere(spark):
    """Registry-wide guardrail: no query may plan a CartesianProduct.
    (BroadcastNestedLoopJoin is acceptable — it appears only where one
    side is domain-bounded and broadcast, e.g. centroids, 1-row
    totals; a CartesianProduct means BOTH sides are unbounded and
    partitioned, which is never survivable at scale.)"""
    offenders = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, SF_DIR)
        except Exception:  # noqa: BLE001 — runtime errors are other tests' job
            continue
        txt = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in txt:
            offenders.append(name)
    assert not offenders, offenders


def test_results_invariant_to_aqe(spark):
    """Planning-mode robustness: representative heavy queries must
    return identical row multisets with AQE disabled (the driver and
    any cluster may flip adaptive execution; results must not depend
    on runtime re-planning)."""
    from collections import Counter

    names = [
        "q_min_cost_supplier",
        "q_dedup_minhash_md5",
        "q_kmeans_assign",
        "q_market_basket",
        "q_interpolate",
    ]
    def snap(name):
        rows = REGISTRY[name].fn(spark, SF_DIR).collect()
        return Counter(tuple(r) for r in rows)

    with_aqe = {n: snap(n) for n in names}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        without = {n: snap(n) for n in names}
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    for n in names:
        assert with_aqe[n] == without[n], n


def test_runtime_bloom_filter_injected(spark):
    # q_bloom_prune_join's 100 TB story: Catalyst's runtime bloom filter
    # pre-filters the fact scan with might_contain(bloom, xxhash64(key))
    # built from the selective orders side.  The production thresholds
    # (creation side ≤ 10 MB plan-size estimate, application scan
    # ≥ 10 GB) are sized for cluster scale; lower them here so the same
    # optimizer decision fires on the test fixture.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = REGISTRY["q_bloom_prune_join"].fn(spark, SF_DIR)
        optimized = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized and "bloom_filter_agg" in optimized
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_per_group_topk_uses_window_group_limit(spark):
    # Spark ≥3.5 rewrites rank-filter windows (rn <= k) into
    # WindowGroupLimit: each task keeps a k-row heap per group BEFORE
    # the shuffle, so the exchange carries ≤ k rows per (task, group)
    # instead of every row.  This is what makes per-group sampling /
    # lateral top-k viable at 100 TB; pin that the rewrite fires.
    for q in ("q_sample_per_group", "q_lateral_topk"):
        df = REGISTRY[q].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan, f"{q} lost the group-limit rewrite"


def test_cbo_uses_analyzed_stats(spark, tmp_path):
    # Cost-based optimization needs table/column stats; pin the full
    # circuit: saveAsTable → ANALYZE ... COMPUTE STATISTICS FOR COLUMNS
    # → optimizer sees exact rowCount (not a size-based guess) on the
    # analyzed relation.  On a cluster this is the ANALYZE cadence that
    # lets join reordering and broadcast decisions use real row counts.
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    load_table(spark, SF_DIR, "nation").write.mode("overwrite").saveAsTable("nation_stats")
    try:
        spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR ALL COLUMNS")
        saved = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table("nation_stats")
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            assert stats.rowCount().isDefined(), "ANALYZE stats not visible to CBO"
            assert stats.rowCount().get() == df.count()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", saved)
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats")


def test_topk_incremental_plan_shape(spark):
    # The mergeable-top-k query must (a) keep per-shard states via the
    # WindowGroupLimit rewrite (k-row heaps before the shuffle) and
    # (b) finish with TakeOrderedAndProject for the merge — never a
    # global Sort.
    df = REGISTRY["q_topk_incremental"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, "per-shard rank lost the group-limit rewrite"
    assert "TakeOrderedAndProject" in plan, "merge should be a top-k, not a sort"


def test_bm25_filter_runs_inside_token_array(spark):
    # The BM25 term filter must run on the token ARRAY before the
    # explode (Generate), so the generated rows are already
    # query-term-only: the Generate input must carry the filtered
    # array expression, and no post-explode Filter on token should be
    # needed for the term predicate.
    df = REGISTRY["q_bm25_search"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    gen = [ln for ln in plan.splitlines() if "Generate explode" in ln]
    assert gen, "no explode in the BM25 plan"
    assert "filter(" in gen[0], "term filter did not stay inside the array before explode"


def test_dedup_df_ranks_have_no_single_partition_sort(spark):
    """Round-3 verdict scale-killers: q_setsim_join / q_dedup_containment
    ranked the (data-scaled) token/shingle vocabulary through one task
    via Window.orderBy.  Both now use the range-partitioned dense-id
    path — no Exchange SinglePartition anywhere in either plan."""
    for name in ("q_setsim_join", "q_dedup_containment"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "Exchange SinglePartition" not in text, f"{name}:\n{text}"
        assert "windowspecdefinition(__pid" in text, f"{name} lost the dense-id path"


def test_token_budget_running_sum_is_parallel_within_source(spark):
    """The per-source cumsum must not window a whole source in one
    task: the plan carries the grouped running_total's (__pid, source)
    window, and no single-partition exchange."""
    df = REGISTRY["q_token_budget"].fn(spark, SF_DIR)
    text = plans.formatted_plan(df)
    assert "Exchange SinglePartition" not in text, text
    assert "windowspecdefinition(__pid" in text, text


def test_grouping_sets_expand_never_sees_input_rows(spark):
    # B11 decomposition (functions/grouping.py): the Expand that
    # multiplies rows per grouping set must consume the tiny
    # checkpointed pre-aggregate, never the lineitem/events scan —
    # both union branches read the same materialized RDD (zero file
    # scans in the final plan), and the grand total survives empty
    # input as a plain global aggregate.
    for name in ("q_rollup", "q_cube", "q_grouping_sets"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.collect()
        text = df._jdf.queryExecution().executedPlan().toString()
        assert "Expand" in text, (name, text)
        assert "Scan parquet" not in text and "FileScan" not in text, (name, text)
        assert "Union" in text, (name, text)

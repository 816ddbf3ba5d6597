"""Round-10 operator pins: q_mann_whitney (brute-force U equivalence),
q_poisson_bootstrap (CI geometry), q_cuped (mean preservation),
q_negative_sampling (soundness of the rejected draw), q_doc_novelty
(bounds + first-document law), plus the plan shapes that make each one
100 TB-viable."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import (
    load_table,
)

from conftest import SF_DIR


def test_mann_whitney_matches_bruteforce(spark):
    """The counting-form U (doubled average ranks over the distinct-
    value frame) must equal the textbook pairwise definition
    U_A = #{a>b} + 0.5·#{a==b} computed by brute force."""
    row = REGISTRY["q_mann_whitney"].fn(spark, SF_DIR).first()
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    pool = (
        o.filter(F.col("o_totalprice").isNotNull())
        .join(c, o["o_custkey"] == c["c_custkey"])
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            (F.col("c_mktsegment") == "BUILDING").alias("is_a"),
        )
        .collect()
    )
    a = sorted(r.cents for r in pool if r.is_a)
    b = sorted(r.cents for r in pool if not r.is_a)
    import bisect

    # doubled U to stay integer: 2U = 2·#{a>b} + #{a==b}
    u2 = 0
    for x in a:
        lt = bisect.bisect_left(b, x)
        eq = bisect.bisect_right(b, x) - lt
        u2 += 2 * lt + eq
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u_a == u2 / 2.0
    assert row.z_score is not None and abs(row.z_score) < 50


def test_mann_whitney_plan_has_no_global_window(spark):
    # the whole point of the counting decomposition: rank-sum WITHOUT
    # a single-task `rank() OVER (ORDER BY ...)` window.  running_total
    # legitimately plans an in-partition cumsum window PARTITIONED BY
    # __pid (parallel); what must never appear is a Window with an
    # EMPTY partition spec — the move-everything-to-one-task shape.
    import re

    df = REGISTRY["q_mann_whitney"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"Window \[[^\n]*\], \[\], \[", plan), plan


def test_poisson_bootstrap_geometry(spark):
    rows = REGISTRY["q_poisson_bootstrap"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5  # the five order priorities
    for r in rows:
        assert r.boot_se > 0
        assert r.ci_lo < r.mean_obs < r.ci_hi
        # normal-interval symmetry around the observed mean
        assert abs((r.ci_hi - r.mean_obs) - (r.mean_obs - r.ci_lo)) < 1e-4
        # the SE of a mean over n>=250 orders is far below the spread
        assert r.boot_se < r.mean_obs


def test_cuped_preserves_overall_mean(spark):
    """CUPED adjusts variance, never the pooled mean: the user-weighted
    average of the adjusted variant means equals that of the raw
    post-period means (Σ n_v·θ·(x̄_v − x̄) telescopes to 0)."""
    rows = REGISTRY["q_cuped"].fn(spark, SF_DIR).collect()
    assert len(rows) == 2
    n = sum(r.n_users for r in rows)
    raw = sum(r.n_users * r.mean_post for r in rows) / n
    adj = sum(r.n_users * r.mean_adjusted for r in rows) / n
    assert abs(raw - adj) < 1e-4, (raw, adj)
    (theta,) = {r.theta for r in rows}  # one global theta on both rows
    assert theta is not None


def test_negative_sampling_sound(spark):
    df = REGISTRY["q_negative_sampling"].fn(spark, SF_DIR)
    rows = df.collect()
    assert rows
    o = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = load_table(spark, SF_DIR, "lineitem")
    positives = {
        (r.user_id, r.item_id)
        for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item_id"),
        )
        .distinct()
        .collect()
    }
    n_items = load_table(spark, SF_DIR, "part").count()
    per_pos = defaultdict(int)
    for r in rows:
        # a sampled negative is never an observed positive
        assert (r.user_id, r.neg_item_id) not in positives
        # draws land in the real item-key domain
        assert 0 <= r.neg_item_id < n_items
        assert r.neg_slot in (1, 2)
        per_pos[(r.user_id, r.pos_item_id, r.neg_slot)] += 1
    # one draw per (positive, slot): rejected collisions drop, never
    # duplicate
    assert all(v == 1 for v in per_pos.values())


def test_negative_sampling_plan_uses_anti_join(spark):
    df = REGISTRY["q_negative_sampling"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan, plan


def test_doc_novelty_bounds_and_first_doc(spark):
    rows = REGISTRY["q_doc_novelty"].fn(spark, SF_DIR).collect()
    assert rows
    by_doc = {r.doc_id: r for r in rows}
    for r in rows:
        assert 0.0 <= r.novelty <= 1.0
        assert r.n_grams >= 1
    # the earliest scored document owns every one of its grams
    first = min(by_doc)
    assert by_doc[first].novelty == 1.0


def test_item_cf_sound(spark):
    rows = REGISTRY["q_item_cf"].fn(spark, SF_DIR).collect()
    assert rows
    per_item = defaultdict(list)
    for r in rows:
        assert r.item_id != r.neighbor_id
        assert 0.0 < r.cosine <= 1.0
        per_item[r.item_id].append((r.rank, r.cosine))
    for item, lst in per_item.items():
        lst.sort()
        ranks = [rk for rk, _ in lst]
        assert ranks == list(range(1, len(lst) + 1)), (item, ranks)
        assert len(lst) <= 5
        # ranking is by cosine descending
        cosines = [c for _, c in lst]
        assert cosines == sorted(cosines, reverse=True), (item, cosines)


def test_item_cf_plan_uses_window_group_limit(spark):
    # the literal top-k cap must keep the WindowGroupLimit rewrite
    # (k-row heaps before the exchange — the contrast to the
    # q_class_balance column-cap case, which needs the pre-filter)
    df = REGISTRY["q_item_cf"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan


def test_prefix_cache_hit_bounds(spark):
    rows = REGISTRY["q_prefix_cache_hit"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_prefix_hits < r.n_docs
        assert 0.0 <= r.hit_frac < 1.0
    # across all sources at least one first-occurrence exists
    assert sum(r.n_docs - r.n_prefix_hits for r in rows) >= 1


def test_ab_srm_consistency(spark):
    r = REGISTRY["q_ab_srm"].fn(spark, SF_DIR).first()
    assert r.n_a + r.n_b > 0
    chi2 = (r.n_a - r.n_b) ** 2 / (r.n_a + r.n_b)
    assert abs(r.chi2 - round(chi2, 6)) < 1e-9
    assert r.srm_detected == (chi2 > 3.841)


def test_forecast_backtest_sane(spark):
    r = REGISTRY["q_forecast_backtest"].fn(spark, SF_DIR).first()
    assert r.n_days > 0
    assert r.mape >= 0
    # bias is a signed mean of per-day terms each bounded by its APE
    assert abs(r.bias) <= r.mape + 1e-9

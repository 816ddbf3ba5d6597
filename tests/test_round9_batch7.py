"""Round-9 batch-7 operators: property + plan pins for q_page_hinkley,
q_hbos_outliers, q_ctr_shrinkage, q_ab_sequential, q_mixture_em,
q_tail_index and q_burstiness."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import plans
from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR


def test_page_hinkley_score_properties(spark):
    rows = sorted(
        REGISTRY["q_page_hinkley"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for r in rows:
        assert r.ph_score >= 0  # cum minus its own running min
    assert rows[0].ph_score == 0.0  # first point is its own minimum


def test_hbos_scores_flag_sparse_cells(spark):
    rows = REGISTRY["q_hbos_outliers"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = [r.hbos for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.hbos > 0  # -ln(density) of non-full bins is positive


def test_ctr_shrinkage_moves_toward_mean(spark):
    rows = REGISTRY["q_ctr_shrinkage"].fn(spark, SF_DIR).collect()
    assert rows
    mu = sum(r.raw_rate for r in rows) / len(rows)
    for r in rows:
        lo, hi = sorted((r.raw_rate, mu))
        # posterior mean lies between the raw rate and the prior mean
        assert lo - 1e-6 <= r.shrunk_rate <= hi + 1e-6, (r, mu)
        # and shrinks MORE for smaller samples: |shrunk-raw| <= prior
        # pull bound  K*|mu-raw|/(n+K) with K>0
        assert abs(r.shrunk_rate - r.raw_rate) <= abs(mu - r.raw_rate) + 1e-6


def test_round9_batch7_plan_shapes(spark):
    for name in ("q_page_hinkley", "q_hbos_outliers", "q_ctr_shrinkage"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        text = plans.formatted_plan(df)
        assert "CartesianProduct" not in text, (name, text)
    hb = plans.formatted_plan(REGISTRY["q_hbos_outliers"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in hb, hb


def test_sprt_llr_is_cumulative_and_bounded_decision(spark):
    rows = sorted(
        REGISTRY["q_ab_sequential"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.day,
    )
    assert rows
    for r in rows:
        if r.crossed == "accept_h1":
            assert r.cum_llr >= 2.944439
        elif r.crossed == "accept_h0":
            assert r.cum_llr <= -2.944439
        else:
            assert r.crossed is None
            assert -2.944439 < r.cum_llr < 2.944439


def test_mixture_em_moment_preservation(spark):
    rows = {r.component: r for r in
            REGISTRY["q_mixture_em"].fn(spark, SF_DIR).collect()}
    assert set(rows) == {1, 2}
    w1, w2 = rows[1].weight, rows[2].weight
    assert abs(w1 + w2 - 1.0) < 1e-5
    assert rows[1].sigma >= 1.0 and rows[2].sigma >= 1.0
    # EM preserves the first moment: the mixture mean tracks the data
    # mean (exactly for exact EM; within rounding here)
    import pyspark.sql.functions as F

    mean_x = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .agg(F.avg("o_totalprice"))
        .first()[0]
    )
    mix_mean = w1 * rows[1].mu + w2 * rows[2].mu
    assert abs(mix_mean - mean_x) / mean_x < 0.01, (mix_mean, mean_x)


def test_tail_index_positive_and_tie_aware(spark):
    out = REGISTRY["q_tail_index"].fn(spark, SF_DIR).collect()[0]
    assert out.k == 200
    assert 0 < out.n_used <= out.k
    assert out.hill_alpha > 0


def test_burstiness_integer_fano_matches_variance(spark):
    import statistics

    rows = REGISTRY["q_burstiness"].fn(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    fanos = [r.fano for r in rows]
    assert fanos == sorted(fanos, reverse=True)
    # recompute one user's Fano from raw events (population variance)
    r0 = rows[0]
    days = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id") == r0.user_id)
        .groupBy(F.col("ts").cast("date"))
        .count()
        .collect()
    )
    cs = [d["count"] for d in days]
    fano = statistics.pvariance(cs) / statistics.mean(cs)
    assert abs(fano - r0.fano) < 1e-4, (fano, r0.fano)

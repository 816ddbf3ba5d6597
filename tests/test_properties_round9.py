"""Round-9 property pins.

1. Attribution lookback boundedness (VERDICT r8 next-3): the
   purchases⋈touches fan-in in q_linear_attribution /
   q_time_decay_attribution rides the horizon-bucket compound key, so
   per-purchase CANDIDATE count is bounded by the 90-day horizon's
   bucket population — one bot user with a multi-year history stays
   linear — and the residual-filtered pairs are COMPLETE vs the
   brute-force windowed join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.behavioral import (
    _ATTR_LOOKBACK_US,
    _attr_candidates,
    _attr_pairs,
)

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _bot_events(spark, n_days: int = 1095):
    """One bot user: a click every day for n_days, then one purchase."""
    t0 = dt.datetime(2020, 1, 1)
    rows = [
        (d, t0 + dt.timedelta(days=d), 1, "click", 1.0, None)
        for d in range(n_days)
    ]
    rows.append(
        (n_days, t0 + dt.timedelta(days=n_days), 1, "purchase", 100.0, None)
    )
    return spark.createDataFrame(rows, _SCHEMA)


def _purchases(ev):
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("pu"),
    )


def test_attribution_candidates_bounded_by_horizon(spark):
    # 3 years of daily touches; the horizon is 90 days, so candidates
    # (pre-residual bucket join) are the touches of ≤2 90-day buckets:
    # ≤ 181 rows, NOT the 1095-row full history.  This is the property
    # that makes one adversarial bot user linear instead of quadratic.
    ev = _bot_events(spark)
    n_cand = _attr_candidates(ev, _purchases(ev)).count()
    horizon_days = _ATTR_LOOKBACK_US // 86_400_000_000
    assert n_cand <= 2 * horizon_days + 2, n_cand
    assert n_cand < 1095  # strictly less than the full history


def test_attribution_pairs_complete_vs_brute_force(spark):
    # the bucket decomposition must lose NO in-window pair and invent
    # none: residual-filtered pairs == brute-force windowed join,
    # including the window-boundary touch (tu == pu − H, inclusive)
    ev = _bot_events(spark, n_days=200)
    p = _purchases(ev)
    got = sorted(
        (r["p_id"], r["t_id"])
        for r in _attr_pairs(ev, p).select("p_id", "t_id").collect()
    )
    touches = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user_id"),
        F.col("event_id").alias("t_id"),
        F.unix_micros("ts").alias("tu"),
    )
    brute = (
        p.join(touches, F.col("user_id") == F.col("t_user_id"))
        .filter(
            (F.col("tu") >= F.col("pu") - F.lit(_ATTR_LOOKBACK_US))
            & (
                (F.col("tu") < F.col("pu"))
                | (
                    (F.col("tu") == F.col("pu"))
                    & (F.col("t_id") < F.col("p_id"))
                )
            )
        )
        .select("p_id", "t_id")
    )
    want = sorted((r["p_id"], r["t_id"]) for r in brute.collect())
    assert got == want
    # the window boundary: a 200-day history with a 90-day horizon
    # keeps exactly the last 90 days of touches (days 110..199,
    # inclusive boundary at tu == pu − H means day 110 qualifies)
    assert len(got) == 90


def test_attribution_same_day_boundary_touch_included(spark):
    # touch exactly at pu − H (the inclusive window edge) must pair
    t0 = dt.datetime(2021, 6, 1)
    h_days = _ATTR_LOOKBACK_US // 86_400_000_000
    rows = [
        (1, t0, 7, "view", 1.0, None),  # exactly H before the purchase
        (2, t0 + dt.timedelta(days=int(h_days)), 7, "purchase", 10.0, None),
    ]
    ev = spark.createDataFrame(rows, _SCHEMA)
    pairs = _attr_pairs(ev, _purchases(ev)).select("p_id", "t_id").collect()
    assert [(r["p_id"], r["t_id"]) for r in pairs] == [(2, 1)]


# ------------------------------------------------------------ pass@k math

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(1, 12), st.data())
def test_pass_at_k_ratio_product_matches_enumeration(n, data):
    """The operator's ratio-product form of 1 − C(n−c,k)/C(n,k) must
    equal the literal definition: the fraction of k-subsets of n
    attempts containing at least one of the c successes — enumerated
    exhaustively for small n (the estimator's unbiasedness argument)."""
    c = data.draw(st.integers(0, n))
    k = data.draw(st.integers(1, n))
    prod = 1.0
    for i in range(k):
        prod *= (n - c - i) / (n - i)
    got = 1.0 - prod
    subsets = list(combinations(range(n), k))
    hits = sum(1 for s in subsets if any(x < c for x in s))
    want = hits / len(subsets)
    assert abs(got - want) < 1e-9, (n, c, k, got, want)

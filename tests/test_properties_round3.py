"""Property-style checks for the round-3 session-3 operators: the
interpolation/gap-fill pair against a pure-Python replay on ANY sparse
series, and MERGE INTO against a dict-based merge for ANY key layout."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql.window import Window

D0 = datetime.date(2024, 1, 1)

# sparse series: day-offset → cents, at least 1 observation
series_strategy = st.dictionaries(
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=10_000_00),
    min_size=1,
    max_size=12,
)


def _interp_replay(obs: dict[int, int]) -> dict[int, float]:
    """Pure-Python linear interpolation over the integer-cent series."""
    days = sorted(obs)
    lo, hi = days[0], days[-1]
    out = {}
    for d in range(lo, hi + 1):
        if d in obs:
            out[d] = obs[d] / 100.0
            continue
        prev = max(k for k in days if k < d)
        nxt = min(k for k in days if k > d)
        num, den = d - prev, nxt - prev
        out[d] = (obs[prev] * (den - num) + obs[nxt] * num) / (den * 100.0)
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(obs=series_strategy)
def test_spine_interpolation_matches_replay(spark, obs):
    """Replicate q_interpolate's core (spine + bracketing windows +
    integer-cent interpolation) on generated data and check against
    the sequential replay — same invariants, arbitrary gap layouts."""
    rows = [(D0 + datetime.timedelta(days=k), v) for k, v in obs.items()]
    daily = spark.createDataFrame(rows, "day date, cents long")
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx", F.expr("interval 1 day"))).alias("day")
    )
    j = spine.join(daily, "day", "left")
    wb = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    n = j.select(
        "day",
        "cents",
        F.last("cents", ignorenulls=True).over(wb).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(wb).alias("pd"),
        F.first("cents", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(wf).alias("nd"),
    )
    num = F.datediff("day", "pd").cast("bigint")
    den = F.datediff("nd", "pd").cast("bigint")
    interp = F.col("pv") * (den - num) + F.col("nv") * num
    got = {
        (r["day"] - D0).days: r["filled"]
        for r in n.select(
            "day",
            F.when(F.col("cents").isNotNull(), F.col("cents").cast("double") / 100.0)
            .when(F.col("pv").isNull(), F.col("nv").cast("double") / 100.0)
            .when(F.col("nv").isNull(), F.col("pv").cast("double") / 100.0)
            .otherwise(interp.cast("double") / (den * 100).cast("double"))
            .alias("filled"),
        ).collect()
    }
    want = _interp_replay(obs)
    assert got.keys() == want.keys(), "spine must cover [min, max] exactly"
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
        # interpolation never exits the envelope of the observations
        assert min(v / 100.0 for v in obs.values()) - 1e-9 <= got[k]
        assert got[k] <= max(v / 100.0 for v in obs.values()) + 1e-9


merge_strategy = st.tuples(
    st.sets(st.integers(min_value=1, max_value=30), min_size=1, max_size=15),
    st.sets(st.integers(min_value=1, max_value=30), min_size=1, max_size=15),
    st.sets(st.integers(min_value=1, max_value=30), max_size=5),  # negative-bal keys
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(layout=merge_strategy)
def test_merge_semantics_match_dict_merge(spark, layout):
    """MERGE clause semantics (q_merge_into's full-outer-join + CASE
    form) against a dict merge for arbitrary target/source/delete-key
    layouts."""
    tgt_keys, src_keys, neg_keys = layout
    tgt = spark.createDataFrame(
        [(k, 100.0 + k) for k in tgt_keys], "k long, bal double"
    )
    src = spark.createDataFrame(
        [(k, -50.0 if k in neg_keys else 10.0 + k) for k in src_keys],
        "k long, bal double",
    )
    t = tgt.select(F.col("k").alias("tk"), F.col("bal").alias("t_bal"))
    s = src.select(F.col("k").alias("sk"), F.col("bal").alias("s_bal"))
    m = t.join(s, F.col("tk") == F.col("sk"), "full")
    matched = F.col("tk").isNotNull() & F.col("sk").isNotNull()
    out = m.filter(~(matched & (F.col("s_bal") < 0))).select(
        F.coalesce("tk", "sk").alias("k"),
        F.when(F.col("sk").isNull(), F.col("t_bal"))
        .otherwise(F.col("s_bal") + 100)
        .alias("bal"),
    )
    got = {r["k"]: r["bal"] for r in out.collect()}

    want = {k: 100.0 + k for k in tgt_keys}
    for k in src_keys:
        bal = -50.0 if k in neg_keys else 10.0 + k
        if k in want and bal < 0:
            del want[k]  # matched delete
        else:
            want[k] = bal + 100  # matched update / insert
    assert got == want

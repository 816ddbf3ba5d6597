"""Property-style checks for the session-4 operators: skyline against a
brute-force dominance replay on ANY point set, DQ expectations against
a pure-Python rule evaluator, and the variant/JSON access equivalence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

# (group, size, price) points; prices kept to 2dp-exact doubles
points_strategy = st.lists(
    st.tuples(
        st.sampled_from(["g1", "g2"]),
        st.integers(min_value=1, max_value=8),
        st.integers(min_value=100, max_value=999).map(lambda c: c / 100.0),
    ),
    min_size=1,
    max_size=30,
)


def _skyline_replay(pts):
    """Brute-force per-group Pareto front (max size, min price)."""
    keep = []
    for i, (g, s, p) in enumerate(pts):
        dominated = any(
            qg == g and qs >= s and qp <= p and (qs > s or qp < p)
            for j, (qg, qs, qp) in enumerate(pts)
            if j != i
        )
        if not dominated:
            keep.append((g, s, p))
    return sorted(set(keep))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(points_strategy)
def test_skyline_matches_bruteforce(spark, pts):
    rows = [(g, i, s, p) for i, (g, s, p) in enumerate(pts)]
    df = spark.createDataFrame(rows, "p_brand string, p_partkey long, p_size int, price double")
    # same decomposition as q_skyline (operators/quality.py)
    from pyspark.sql import Window

    per_size = df.groupBy("p_brand", "p_size").agg(F.min("price").alias("minp"))
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("p_size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_size.withColumn("better_minp", F.min("minp").over(w))
    sky = (
        df.join(frontier, ["p_brand", "p_size"])
        .filter(
            (F.col("better_minp").isNull() | (F.col("better_minp") > F.col("price")))
            & (F.col("price") <= F.col("minp"))
        )
        .select("p_brand", "p_size", "price")
    )
    got = sorted({(r["p_brand"], r["p_size"], r["price"]) for r in sky.collect()})
    assert got == _skyline_replay(pts)


rows_strategy = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=60)),  # quantity
        st.sampled_from(["A", "N", "R", "Z"]),  # returnflag
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows_strategy)
def test_dq_rule_semantics_null_is_violation(spark, rows):
    df = spark.createDataFrame(rows, "q int, flag string")
    rules = [("q_le_45", "q <= 45"), ("flag_domain", "flag IN ('A','N','R')")]
    aggs = [F.count(F.lit(1)).alias("total")] + [
        F.count(F.when(~F.coalesce(F.expr(pred), F.lit(False)), 1)).alias(f"v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    got = df.agg(*aggs).collect()[0]
    exp_v0 = sum(1 for q, _ in rows if q is None or q > 45)
    exp_v1 = sum(1 for _, fl in rows if fl not in ("A", "N", "R"))
    assert got["total"] == len(rows)
    assert got["v0"] == exp_v0, "null quantity must count as a violation"
    assert got["v1"] == exp_v1


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.one_of(st.none(), st.integers(-1000, 1000)), min_size=1, max_size=20))
def test_variant_get_matches_get_json_object(spark, ks):
    # VARIANT path reads must agree with the classic JSON text path
    rows = [
        (i, "{}" if k is None else '{"k": %d}' % k) for i, k in enumerate(ks)
    ]
    df = spark.createDataFrame(rows, "i int, props string")
    out = df.select(
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("v"),
        F.get_json_object("props", "$.k").cast("int").alias("j"),
    ).collect()
    for r in out:
        assert r["v"] == r["j"]

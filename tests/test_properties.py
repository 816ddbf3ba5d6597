"""Property-style checks (SURVEY.md §5.2.5) with hypothesis: the CDC
apply must agree with a trivial dict replay for ANY event sequence, and
the salted join must agree with the plain join for any salt."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc

KEYS = ["k1", "k2", "k3"]

event_strategy = st.lists(
    st.tuples(
        st.sampled_from(["INSERT", "MODIFY", "REMOVE"]),
        st.sampled_from(KEYS),
        st.integers(min_value=0, max_value=1000),  # price basis
    ),
    min_size=1,
    max_size=25,
)


def _dict_replay(events):
    """Trivial sequential oracle: apply events in seq order to a dict."""
    state = {}
    for seq, (name, key, price) in enumerate(events, start=1):
        if name == "REMOVE":
            state.pop(key, None)
        else:
            state[key] = (seq, float(price))
    return state


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=event_strategy)
def test_merge_apply_matches_dict_replay(spark, events):
    rows = [
        (
            name,
            seq,
            None if name == "REMOVE" else {"id": key, "price": float(price)},
            key if name == "REMOVE" else None,
        )
        for seq, (name, key, price) in enumerate(events, start=1)
    ]
    df = spark.createDataFrame(
        rows,
        "eventName string, seq long, "
        "newImage struct<id: string, price: double>, removedId string",
    )
    merged = cdc.apply_changes(None, df, mode="merge")
    got = {r["id"]: r["price"] for r in merged.collect()}
    want = {k: price for k, (_, price) in _dict_replay(events).items()}
    assert got == want


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=event_strategy)
def test_append_apply_counts(spark, events):
    rows = [
        (
            name,
            seq,
            None if name == "REMOVE" else {"id": key, "price": float(price)},
            key if name == "REMOVE" else None,
        )
        for seq, (name, key, price) in enumerate(events, start=1)
    ]
    df = spark.createDataFrame(
        rows,
        "eventName string, seq long, "
        "newImage struct<id: string, price: double>, removedId string",
    )
    appended = cdc.apply_changes(None, df, mode="append")
    n_images = sum(1 for name, _, _ in events if name != "REMOVE")
    assert appended.count() == n_images


# ---- invariants of the custom time-series operators, checked against a
# ---- brute-force replay of the sf0.001 events table (oracle-independent)


def _events_pdf(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

    return load_table(spark, "/root/testdata/sf0.001", "events").toPandas()


def test_asof_join_matches_bruteforce(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

    pdf = _events_pdf(spark)
    clicks = pdf[pdf.event_type == "click"]
    got = REGISTRY["q_asof_join"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(got) == (pdf.event_type == "purchase").sum()
    for r in got:
        prior = clicks[(clicks.user_id == r["user_id"]) & (clicks.ts <= r["ts"])]
        if prior.empty:
            assert r["click_ts"] is None
        else:
            t = prior.ts.max()
            assert r["click_ts"] == t
            # value = max over ties at the as-of timestamp
            assert r["click_value"] == prior[prior.ts == t].value.max()


def test_sessionize_partitions_events(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

    pdf = _events_pdf(spark)
    rows = REGISTRY["q_sessionize"].fn(spark, "/root/testdata/sf0.001").collect()
    # sessions tile the event set: counts add up, and per user the
    # sessions are disjoint with >30min between consecutive sessions
    assert sum(r["n_events"] for r in rows) == len(pdf)
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, sess in by_user.items():
        sess.sort(key=lambda r: r["session_start"])
        for a, b in zip(sess, sess[1:]):
            assert a["session_end"] < b["session_start"]
            assert (b["session_start"] - a["session_end"]).total_seconds() > 1800


def test_range_join_containment(spark):
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

    pdf = _events_pdf(spark)
    incidents = pdf[(pdf.event_type == "error") & (pdf.value > 100)]
    got = {r["window_id"]: r for r in REGISTRY["q_range_join"].fn(spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == set(incidents.event_id)
    for _, inc in incidents.iterrows():
        import pandas as pd

        lo, hi = inc.ts, inc.ts + pd.Timedelta(minutes=10)
        inside = pdf[(pdf.ts >= lo) & (pdf.ts < hi)]
        r = got[inc.event_id]
        assert r["n_events"] == len(inside)
        assert r["max_value"] == inside.value.max()


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    xs=st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=8),
    ys=st.lists(st.integers(min_value=0, max_value=65535), min_size=1, max_size=8),
)
def test_z_value_matches_python_interleave(spark, xs, ys):
    # the codegen'd bit interleave must equal the obvious python one
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators.layout import z_value

    n = min(len(xs), len(ys))
    rows = [(xs[i], ys[i]) for i in range(n)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", z_value(F.col("x"), F.col("y"))).collect()
    }

    def py_z(x, y):
        z = 0
        for b in range(16):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for x, y in rows:
        assert got[(x, y)] == py_z(x, y)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=40),
    parts=st.integers(min_value=1, max_value=7),
)
def test_running_total_property(spark, vals, parts):
    # the parallel prefix sum equals the sequential cumsum for any
    # input and any partition count
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.functions.ids import running_total

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(3)
    got = {
        r["k"]: r["cum"]
        for r in running_total(df, ["k"], "v", "cum", partitions=parts).collect()
    }
    acc, expect = 0, {}
    for i, v in enumerate(vals):
        acc += v
        expect[i] = acc
    assert got == expect

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

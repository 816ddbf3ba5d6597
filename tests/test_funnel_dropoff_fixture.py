"""Funnel drop-off fixture (round-4 vacuity audit).

In the shipped testdata every user performs every event type, so
q_event_funnel reports identical counts at all four stages at every
scale factor — the strictly-after ordering constraints (click AFTER
first view, purchase AFTER first qualifying click) never exclude a
user, and an inverted or dropped ordering predicate would pass the
oracle gate unnoticed.  This fixture builds an events table with known
per-stage outcomes — missing stages, out-of-order stages, exact-order
conversions — and checks the Spark query against both the DuckDB
oracle and the hand-computed truth.
"""

from __future__ import annotations

import datetime as dt
import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import duck_rows, spark_rows


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


# (user, minute, type): designed stage outcomes —
#  u1: view→click→purchase in order            → counts in all stages
#  u2: view→click, no purchase                 → viewed+clicked only
#  u3: view only                               → viewed only
#  u4: purchase→click→view (REVERSED)          → viewed only
#  u5: click→view→purchase (click BEFORE view; → viewed only: no
#      qualifying click, so the purchase cannot qualify either)
#  u6: view→purchase→click (purchase precedes the qualifying click,
#      but the click itself is after the view) → viewed+clicked
#  u7: error/signup only                       → no stages
_EVENTS = [
    (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
    (2, 0, "view"), (2, 1, "click"),
    (3, 0, "view"),
    (4, 0, "purchase"), (4, 1, "click"), (4, 2, "view"),
    (5, 0, "click"), (5, 1, "view"), (5, 2, "purchase"),
    (6, 0, "view"), (6, 1, "purchase"), (6, 2, "click"),
    (7, 0, "error"), (7, 1, "signup"),
]
_EXPECTED = {"n_users": 7, "n_viewed": 6, "n_clicked": 3, "n_purchased": 1}


@pytest.fixture(scope="module")
def funnel_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    rows = [
        (i, _ts(minute), user, typ, 1.0, "{}")
        for i, (user, minute, typ) in enumerate(_EVENTS)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "CAST(ts AS timestamp_ntz) AS ts", "user_id", "event_type", "value", "props"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "ev_tmp"))
    part = next((d / "ev_tmp").glob("part-*.parquet"))
    shutil.move(str(part), d / "events.parquet")
    shutil.rmtree(d / "ev_tmp")
    return str(d)


def test_event_funnel_dropoff(spark, funnel_dir):
    q = REGISTRY["q_event_funnel"]
    got_cols, got = spark_rows(q.fn(spark, funnel_dir))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{funnel_dir}/{t}.parquet'")
    want_cols, want, _ = duck_rows(con, q.oracle)
    con.close()
    assert got_cols == want_cols
    assert sorted(got) == sorted(want)
    # and both engines match the hand-computed truth: each stage count
    # differs, so every ordering predicate is exercised
    row = dict(zip(got_cols, got[0]))
    for k, v in _EXPECTED.items():
        assert row[k] == ("i", v), (k, row)  # canon() tags ints as ("i", v)

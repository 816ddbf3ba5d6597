"""NULL event-time fixture (round-4 VERDICT task 6).

Spark orders ASC NULLS FIRST, DuckDB NULLS LAST — a latent divergence in
every timestamp-window ordering that only fires the moment a NULL ts
ships.  All time orderings are now explicit ``asc_nulls_last`` /
``desc_nulls_last`` (grep-pinned below), and this fixture PROVES the
cross-engine agreement by injecting NULL-ts rows into the events table
and replaying the oracle diff for the event-time operator family.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

import duckdb
import pytest

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops
from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources.readers import load_table

from conftest import SF_DIR
from test_oracle_diff import duck_rows, spark_rows

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# event-time operators whose windows/joins order on events.ts
EVENT_TS_QUERIES = [
    "q_sessionize",
    "q_event_funnel",
    "q_event_transitions",
    "q_time_weighted_avg",
    "q_sliding_active_users",
    "q_retention_cohorts",
    "q_cumulative_users",
    "q_new_vs_returning",
    "q_asof_join",
    "q_asof_tolerance",
    # cdc_batch.py event-time windows (review-caught: this list
    # originally covered only timeseries.py, and the one confirmed
    # NULL-ts divergence lived in q_scd2_point_in_time)
    "q_scd2_point_in_time",
    "q_scd2_build",
    "q_upsert_latest_wins",
    # round-5: interval union drops NULL-ts rows explicitly (both
    # engines), so island numbering can't diverge on NULL ordering
    "q_interval_merge",
    # round-7: attribution windows order on events.ts per user
    "q_last_touch_attribution",
    "q_linear_attribution",
    # round-8: decay credits compare ts pairs (NULL ts must drop the
    # touch identically in both engines); the interval join buckets on
    # unix_micros(ts) (NULL → NULL bucket → no match, both engines)
    "q_time_decay_attribution",
    "q_impression_click_join",
]


@pytest.fixture(scope="module")
def null_ts_dir(spark, tmp_path_factory):
    """sf0.001 testdata with 20 NULL-ts event rows appended (written as
    TIMESTAMP_NTZ micros, the round-3 testdata physical form)."""
    d = tmp_path_factory.mktemp("nullts")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    ev = load_table(spark, SF_DIR, "events")
    nulled = ev.limit(20).withColumn("ts", F.lit(None).cast("timestamp"))
    patched = ev.unionByName(nulled).select(
        *[
            F.col(c).cast("timestamp_ntz").alias(c) if c == "ts" else F.col(c)
            for c in ev.columns
        ]
    )
    patched.coalesce(1).write.mode("overwrite").parquet(str(d / "ev_tmp"))
    part = next((d / "ev_tmp").glob("part-*.parquet"))
    shutil.move(str(part), d / "events.parquet")
    shutil.rmtree(d / "ev_tmp")
    return str(d)


@pytest.fixture(scope="module")
def null_oracle(null_ts_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_ts_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def test_fixture_really_has_null_ts(spark, null_ts_dir):
    ev = load_table(spark, null_ts_dir, "events")
    assert ev.filter(F.col("ts").isNull()).count() == 20


@pytest.mark.parametrize("name", EVENT_TS_QUERIES)
def test_event_time_ops_agree_with_null_ts(spark, null_ts_dir, null_oracle, name):
    spec = ops.REGISTRY[name]
    df = spec.fn(spark, null_ts_dir)
    s_cols, s_rows = spark_rows(df)
    d_cols, d_rows, _ = duck_rows(null_oracle, spec.oracle)
    assert s_cols == d_cols
    assert len(s_rows) == len(d_rows), (
        f"{name}: {len(s_rows)} vs oracle {len(d_rows)} under NULL ts"
    )
    assert sorted(s_rows) == sorted(d_rows), f"{name}: values diverge under NULL ts"


def test_no_implicit_ascending_time_orderings():
    """Grep-pin: no bare ascending orderBy on a time-ish column may
    reappear in the operator modules (Spark NULLS FIRST vs DuckDB
    NULLS LAST)."""
    pkg = Path(__file__).resolve().parents[1] / (
        "cdc_from_sql_and_nosql_to_data_warehouse_spark"
    )
    bad: list[str] = []
    pat = re.compile(
        r'orderBy\(\s*"(ts|day|o_orderdate|start_ts|event_ts|wk|d0)"'
    )
    for py in (pkg / "operators").glob("*.py"):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line):
                bad.append(f"{py.name}:{i}: {line.strip()}")
    assert not bad, "implicit NULLS-FIRST time orderings:\n" + "\n".join(bad)

"""Hot-key (celebrity) fixture — round-6 sweep.

Every prior sweep covered NULLs, ties, duplicates, and empty inputs,
but the shipped tables are uniformly distributed: no key ever owned
more than a sliver of its table, so the group-by / window / sessionize
/ join families were certified without ever seeing the one shape that
dominates real data — a celebrity key.  This fixture gives one key
~50% ownership in each of the three places the operators group or
join on:

  * events.user_id   — half of all events belong to one user (the
    sessionize / token-budget / timeseries-window families now build
    one giant per-user partition),
  * orders.o_custkey — half of all orders belong to one customer
    (customer⋈orders joins and per-customer aggregates see the skew),
  * documents.lang   — one language owns half the corpus (per-lang
    quantiles, class balance, language aggregates).

and replays EVERY oracle-bearing query that touches those tables
through the standard parity harness.  Correct operators are
distribution-independent: both engines see the same fixture, so any
failure is an operator whose semantics silently depended on key
uniformity (per-group sampling caps, window-frame assumptions,
group-count heuristics) — exactly the class the round-3/4 sweeps kept
finding.  (Straggler *plans* at scale are measured separately by
tools/scale_slope.py; this sweep is the correctness half.)
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import replay_oracle_parity

QUERIES = sorted(
    n
    for n, s in REGISTRY.items()
    if s.oracle
    and ("events" in s.oracle or "orders" in s.oracle or "documents" in s.oracle)
)


@pytest.fixture(scope="module")
def hot_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hotkey")
    for t in TABLES:
        if t in ("events", "orders", "documents"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    # hot targets are EXISTING domain values (min key / modal lang) so
    # referential joins still resolve and no new domain value appears
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN event_id % 2 = 0
                 THEN (SELECT min(user_id) FROM '{SF_DIR}/events.parquet')
                 ELSE user_id END AS user_id)
          FROM '{SF_DIR}/events.parquet'
        ) TO '{d / "events.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_orderkey % 2 = 0
                 THEN (SELECT min(c_custkey) FROM '{SF_DIR}/customer.parquet')
                 ELSE o_custkey END AS o_custkey)
          FROM '{SF_DIR}/orders.parquet'
        ) TO '{d / "orders.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN doc_id % 2 = 0
                 THEN (SELECT lang FROM '{SF_DIR}/documents.parquet'
                       GROUP BY lang ORDER BY count(*) DESC, lang LIMIT 1)
                 ELSE lang END AS lang)
          FROM '{SF_DIR}/documents.parquet'
        ) TO '{d / "documents.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_hot_key_fixture_shape(hot_dir):
    # the fixture must actually be skewed: hottest key owns >= 45%
    con = duckdb.connect()
    try:
        for tbl, col in (("events", "user_id"), ("orders", "o_custkey"), ("documents", "lang")):
            top, total = con.execute(
                f"SELECT max(c), sum(c) FROM (SELECT count(*) c "
                f"FROM '{hot_dir}/{tbl}.parquet' GROUP BY {col})"
            ).fetchone()
            assert top / total >= 0.45, (tbl, col, top, total)
    finally:
        con.close()


@pytest.mark.slow
def test_hot_key_oracle_parity(spark, hot_dir):
    failures = replay_oracle_parity(spark, hot_dir, QUERIES)
    assert not failures, failures

"""NULL dimension-attribute / NULL event-key fixture (round-4 sweep #3).

NULLs a residue class of customer/supplier/part attributes (balances,
segment, brand, size, nation keys) and events' user_id/value, then
replays every oracle query that touches those tables.  This sweep
caught: NULLS FIRST/LAST divergence on nullable NON-time sort keys
(q_sort_multi, q_window_ntile, q_window_distribution — the ts-column
audit didn't cover dim attributes), NULL join keys matching under the
window-partition as-of/SCD2 decomposition but not under the oracle's
equi-join (q_asof_join, q_scd2_point_in_time), a NULL-valued SCD2
version being skipped by last(ignorenulls) where the interval join
returns its NULL, and NULL-brand parts silently dropped by
q_skyline's list-form equi-join where NOT EXISTS keeps them.
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
    and any(w in s.oracle for w in ("customer", "supplier", "part", "events"))
)


@pytest.fixture(scope="module")
def dirty_dim_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirtydim")
    for t in TABLES:
        if t in ("customer", "supplier", "part", "events"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN c_custkey % 37 = 5 THEN NULL ELSE c_acctbal END AS c_acctbal,
            CASE WHEN c_custkey % 53 = 7 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
            CASE WHEN c_custkey % 97 = 11 THEN NULL ELSE c_nationkey END AS c_nationkey)
          FROM '{SF_DIR}/customer.parquet') TO '{d / "customer.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN s_suppkey % 17 = 3 THEN NULL ELSE s_acctbal END AS s_acctbal,
            CASE WHEN s_suppkey % 29 = 5 THEN NULL ELSE s_nationkey END AS s_nationkey)
          FROM '{SF_DIR}/supplier.parquet') TO '{d / "supplier.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN p_partkey % 41 = 3 THEN NULL ELSE p_retailprice END AS p_retailprice,
            CASE WHEN p_partkey % 61 = 5 THEN NULL ELSE p_brand END AS p_brand,
            CASE WHEN p_partkey % 71 = 7 THEN NULL ELSE p_size END AS p_size)
          FROM '{SF_DIR}/part.parquet') TO '{d / "part.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN event_id % 43 = 3 THEN NULL ELSE user_id END AS user_id,
            CASE WHEN event_id % 59 = 5 THEN NULL ELSE value END AS value)
          FROM '{SF_DIR}/events.parquet') TO '{d / "events.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_null_dims_oracle_parity(spark, dirty_dim_dir):
    failures = replay_oracle_parity(spark, dirty_dim_dir, QUERIES)
    assert not failures, failures

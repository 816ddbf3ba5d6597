"""NULL date-column fixture (round-4 sweep #6).

The NULL-measure sweep perturbed fact measures and foreign keys but
left l_shipdate/o_orderdate intact, so date-grouped aggregates, date
BETWEEN filters, and every date-ORDERed window ran only over non-NULL
dates.  Spark sorts ASC NULLS FIRST where DuckDB sorts ASC NULLS LAST,
so a single NULL o_orderdate re-attributes lag/lead/first_value rows
unless the ordering is explicitly nulls-last (the round-3 audit made
them so — this sweep is the empirical proof).  NULLs a residue class
of both date columns and replays every lineitem/orders oracle.
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
    if s.oracle and ("lineitem" in s.oracle or "orders" in s.oracle)
)


@pytest.fixture(scope="module")
def null_date_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nulldates")
    for t in TABLES:
        if t in ("lineitem", "orders"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN (l_linenumber + l_orderkey) % 31 = 4 THEN NULL ELSE l_shipdate END AS l_shipdate)
          FROM '{SF_DIR}/lineitem.parquet') TO '{d / "lineitem.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (SELECT * REPLACE (
            CASE WHEN o_orderkey % 23 = 6 THEN NULL ELSE o_orderdate END AS o_orderdate)
          FROM '{SF_DIR}/orders.parquet') TO '{d / "orders.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_null_dates_oracle_parity(spark, null_date_dir):
    failures = replay_oracle_parity(spark, null_date_dir, QUERIES)
    assert not failures, failures

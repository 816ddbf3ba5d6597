"""Round-4 review pins for tpch_shapes.py / modern_sql.py.

Two findings: q_global_sales_opportunity (TPC-H Q22 shape) was only
ever verified on data where EVERY customer has orders — 0 rows on both
engines, so the anti-join semantics were certified vacuously; and
q_small_qty_revenue (Q17 shape) paid a second full lineitem scan for
the decorrelated per-part average that a window over the joined rows
computes in one.
"""

from __future__ import annotations

import shutil

import duckdb
import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import REGISTRY

from conftest import SF_DIR, TABLES
from test_oracle_diff import duck_rows, spark_rows


@pytest.fixture(scope="module")
def churned_customer_dir(spark, tmp_path_factory):
    """sf0.001 testdata with every 7th customer's orders DELETED, so
    customers-without-orders exist and the Q22 anti-join produces rows."""
    d = tmp_path_factory.mktemp("churned")
    for t in TABLES:
        if t == "orders":
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    duckdb.sql(
        f"""
        COPY (SELECT * FROM '{SF_DIR}/orders.parquet' WHERE o_custkey % 7 <> 0)
        TO '{d / "orders.parquet"}' (FORMAT PARQUET)
        """
    )
    return str(d)


def test_global_sales_opportunity_non_vacuous(spark, churned_customer_dir):
    # the registered query and its oracle must agree on data where the
    # anti-join actually fires; 0-vs-0 on the shipped testdata proves
    # nothing about the threshold compare, segment list, or anti-join.
    q = REGISTRY["q_global_sales_opportunity"]
    got_cols, got = spark_rows(q.fn(spark, churned_customer_dir))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{churned_customer_dir}/{t}.parquet'"
        )
    want_cols, want, _ = duck_rows(con, q.oracle)
    assert len(got) > 0, "fixture failed to produce never-ordered customers"
    assert got_cols == want_cols
    assert sorted(got) == sorted(want)


def test_small_qty_revenue_single_fact_scan(spark):
    # Q17: the per-part average threshold must come from a window over
    # the joined rows, not a second aggregate scan of lineitem — one
    # FileScan per table (lineitem, part).
    df = REGISTRY["q_small_qty_revenue"].fn(spark, SF_DIR)
    txt = df._jdf.queryExecution().executedPlan().toString()
    n_scans = sum(1 for line in txt.splitlines() if "FileScan" in line)
    assert n_scans == 2, txt

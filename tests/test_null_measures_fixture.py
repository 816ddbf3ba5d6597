"""NULL-measure / NULL-key fact-table fixture (round-4 sweep).

The shipped lineitem/orders have no NULL measures or keys, so
NULL-arithmetic semantics (SUM skipping, COUNT(expr) vs COUNT(*),
collect_list vs list(), UNPIVOT's EXCLUDE NULLS, retract/apply deltas
over NULL prices) were never exercised.  This fixture NULLs a residue
class of measures, foreign keys, and grouping-key flags
(l_returnflag/l_linestatus/o_orderstatus/o_orderpriority — natural
NULL group keys are the adversarial case for the grouping-sets
decomposition, which must keep natural-NULL rows distinct from
rolled-up-NULL rows exactly as direct ROLLUP/CUBE does) in both fact
tables and replays every lineitem/orders oracle query.  The sweep caught: q_array_agg
(Spark collect_list drops NULL elements, DuckDB list() keeps them),
q_unpivot (SQL-standard UNPIVOT excludes NULL cells, Spark keeps
them), and q_mv_incremental (an unconditional +1.00 MODIFY delta for
rows whose NULL price stays NULL when bumped).
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
def dirty_fact_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dirtyfact")
    for t in TABLES:
        if t in ("lineitem", "orders"):
            continue
        shutil.copy(f"{SF_DIR}/{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN (l_linenumber + l_orderkey) % 97 = 5 THEN NULL ELSE l_extendedprice END AS l_extendedprice,
            CASE WHEN (l_linenumber + l_orderkey) % 97 = 5 THEN NULL ELSE l_discount END AS l_discount,
            CASE WHEN (l_linenumber + l_orderkey) % 101 = 7 THEN NULL ELSE l_quantity END AS l_quantity,
            CASE WHEN l_orderkey % 211 = 3 THEN NULL ELSE l_partkey END AS l_partkey,
            CASE WHEN (l_linenumber + l_orderkey) % 113 = 9 THEN NULL ELSE l_returnflag END AS l_returnflag,
            CASE WHEN (l_linenumber + l_orderkey) % 127 = 11 THEN NULL ELSE l_linestatus END AS l_linestatus)
          FROM '{SF_DIR}/lineitem.parquet'
        ) TO '{d / "lineitem.parquet"}' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN o_orderkey % 89 = 11 THEN NULL ELSE o_totalprice END AS o_totalprice,
            CASE WHEN o_orderkey % 149 = 13 THEN NULL ELSE o_custkey END AS o_custkey,
            CASE WHEN o_orderkey % 131 = 8 THEN NULL ELSE o_orderstatus END AS o_orderstatus,
            CASE WHEN o_orderkey % 137 = 9 THEN NULL ELSE o_orderpriority END AS o_orderpriority)
          FROM '{SF_DIR}/orders.parquet'
        ) TO '{d / "orders.parquet"}' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


@pytest.mark.slow
def test_null_measures_oracle_parity(spark, dirty_fact_dir):
    failures = replay_oracle_parity(spark, dirty_fact_dir, QUERIES)
    assert not failures, failures

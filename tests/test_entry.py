"""Driver-contract smoke tests for __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned(spark):
    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(osql) <= set(qs)
    # every oracle-checked query is the majority
    assert len(osql) >= 0.7 * len(qs)

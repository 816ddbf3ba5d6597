"""Two-level ER sub-blocking + the over-cap guard (r12, VERDICT r11
next-5).

Round 11's adaptive blocking refined oversized suffix-3 blocks to
suffix-6 but stopped there: an oversized suffix-6 block went silently
quadratic.  Round 12 recurses once more (suffix-9) and raises a LOUD
error (_guard_er_blocks) when even the suffix-9 block exceeds the cap
— the failure mode is now an actionable exception, not an executor
OOM.  These tests drive both paths with synthetic hot blocks.
"""

from __future__ import annotations

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import dedup as D


def _write_customers(spark, tmp_path, names: list[str]) -> str:
    rows = [
        (i + 1, n, i % 25, ["BUILDING", "MACHINERY", "AUTOMOBILE"][i % 3],
         float(i % 1000))
        for i, n in enumerate(names)
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey long, "
        "c_mktsegment string, c_acctbal double",
    )
    d = str(tmp_path / "er_fixture")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    return d


def test_second_level_refinement_splits_hot_suffix6(spark, tmp_path):
    # 30 groups x 10 rows, ALL sharing suffix-6 "ABC999" (so suffix-3
    # "999" holds 300 > cap, and after the first refinement suffix-6
    # still holds 300 > cap) but with 30 distinct suffix-9 keys — the
    # r11 single-level rule would pair all 300 rows (44,850
    # candidates); the r12 second level must keep pairs within their
    # suffix-9 group (30 x C(10,2) = 1,350 candidates).
    names = [
        f"Cust{i:02d}-{g:03d}ABC999" for g in range(30) for i in range(10)
    ]
    d = _write_customers(spark, tmp_path, names)
    pairs = D._linkage_scored(spark, d).collect()
    assert len(pairs) == 30 * 45
    # every candidate pair shares its suffix-9 (refinement property:
    # equal suffix-9 => equal suffix-6 => equal suffix-3)
    by_key = {r["c_custkey"]: r["c_name"][-9:] for r in
              spark.read.parquet(f"{d}/customer.parquet").collect()}
    assert all(by_key[r["a"]] == by_key[r["b"]] for r in pairs)


def test_guard_raises_on_irreducible_hot_block(spark, tmp_path):
    # 300 rows sharing the FULL suffix-9: no suffix refinement can
    # split them, so candidate generation is quadratic by construction
    # -> the engine must fail loudly, naming the cap.
    names = [f"Cust{i:03d}-XYZABC999" for i in range(300)]
    d = _write_customers(spark, tmp_path, names)
    with pytest.raises(RuntimeError, match="_ER_BLOCK_CAP"):
        D._linkage_scored(spark, d)


def test_below_cap_blocks_unchanged(spark, tmp_path):
    # blocks under the cap keep plain suffix-3 blocking: two groups of
    # 5 rows with distinct suffix-3 keys pair only within their group
    names = [f"Cust{i:02d}-{s}" for s in ("AAA", "BBB") for i in range(5)]
    d = _write_customers(spark, tmp_path, names)
    pairs = D._linkage_scored(spark, d).collect()
    assert len(pairs) == 2 * 10  # 2 x C(5,2)
    by_key = {r["c_custkey"]: r["c_name"][-3:] for r in
              spark.read.parquet(f"{d}/customer.parquet").collect()}
    assert all(by_key[r["a"]] == by_key[r["b"]] for r in pairs)


def test_oracle_carries_the_same_two_level_rule():
    # the DuckDB twin must refine suffix-3 -> suffix-6 -> suffix-9 with
    # the same cap so the cross-engine contract holds at every SF
    sql = D._SQL_LINKAGE_SCORED
    assert sql.count(f"> {D._ER_BLOCK_CAP}") >= 2
    assert "blk9" in sql and "blk6" in sql and "blk3" in sql

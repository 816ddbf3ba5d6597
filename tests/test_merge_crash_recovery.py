"""Crash-recovery for the incremental merge bucket swap (SURVEY.md §2.1
B36; VERDICT r2 task 7 / ADVICE r2 medium).

The swap per touched bucket is rename(dst, old); rename(src, dst);
rmtree(old).  These tests injure each crash window and assert
``recover_merge_table`` + checkpoint replay repair the table exactly.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

import pytest

from cdc_from_sql_and_nosql_to_data_warehouse_spark.streaming import cdc


@pytest.fixture
def tdir(tmp_path):
    yield str(tmp_path)
    shutil.rmtree(tmp_path, ignore_errors=True)


def _drop_file(drop_dir: str, events: list[dict]) -> None:
    with open(f"{drop_dir}/{uuid.uuid4().hex}__records.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")


def _trade(i: int, seq: int, price: float) -> dict:
    return {
        "eventName": "INSERT",
        "seq": seq,
        "newImage": {"id": f"t{i}", "price": price, "shares": 1},
        "removedId": None,
    }


def _build_table(spark, tdir: str) -> str:
    drop, table, ck = f"{tdir}/drop0", f"{tdir}/table", f"{tdir}/ck0"
    os.makedirs(drop)
    _drop_file(drop, [_trade(i, i, float(i)) for i in range(40)])
    q = cdc.start_merge_stream(cdc.read_change_stream(spark, drop), table, ck)
    q.awaitTermination(120)
    assert cdc.read_merge_table(spark, table).count() == 40
    return table


def test_crash_between_renames_recovers_on_replay(spark, tdir):
    """Crash after rename(dst, old) but before rename(src, dst): the
    bucket's prior rows are stranded in __old.  Replay must restore them
    before merging, not silently lose every non-batch key in the bucket."""
    table = _build_table(spark, tdir)
    drop2, ck2 = f"{tdir}/drop2", f"{tdir}/ck2"
    os.makedirs(drop2)
    _drop_file(drop2, [_trade(3, 100, 999.0)])

    real_rename = os.rename

    def crashing_rename(src, dst, *a, **kw):
        if "__merging_" in str(src):
            raise OSError("injected crash between bucket renames")
        return real_rename(src, dst, *a, **kw)

    os.rename = crashing_rename
    try:
        q = cdc.start_merge_stream(cdc.read_change_stream(spark, drop2), table, ck2)
        with pytest.raises(Exception, match="injected crash"):
            q.awaitTermination(120)
            raise AssertionError(f"query should have failed: {q.exception()}")
    finally:
        os.rename = real_rename

    # the injured state: bucket stranded in __old, dst missing
    stranded = [e for e in os.listdir(table) if e.endswith("__old")]
    assert len(stranded) == 1
    assert not os.path.isdir(os.path.join(table, stranded[0][: -len("__old")]))

    # restart with the same checkpoint: recovery restores, replay merges
    q = cdc.start_merge_stream(cdc.read_change_stream(spark, drop2), table, ck2)
    q.awaitTermination(120)
    got = cdc.read_merge_table(spark, table)
    assert got.count() == 40
    assert got.filter("id = 't3'").collect()[0]["price"] == 999.0
    assert not any(e.endswith("__old") for e in os.listdir(table))
    parent, name = os.path.split(os.path.abspath(table))
    assert not any(e.startswith(f"{name}__merging_") for e in os.listdir(parent))


def test_crash_before_old_cleanup_drops_stale_dir(spark, tdir):
    """Crash after the swap but before rmtree(old): the __old dir would
    be discovered as a bogus 'N__old' partition, duplicating stale rows.
    Readers must repair it."""
    table = _build_table(spark, tdir)
    buckets = [e for e in os.listdir(table) if e.startswith("__bucket=") and "__old" not in e]
    victim = os.path.join(table, buckets[0])
    shutil.copytree(victim, victim + "__old")

    got = cdc.read_merge_table(spark, table)
    assert got.count() == 40  # stale copy not double-counted
    assert not os.path.isdir(victim + "__old")
    assert os.path.isdir(victim)


def test_recover_is_idempotent_and_handles_missing_table(tdir):
    cdc.recover_merge_table(f"{tdir}/does_not_exist")  # no-op, no raise
    os.makedirs(f"{tdir}/t/__bucket=1__old")
    cdc.recover_merge_table(f"{tdir}/t")
    cdc.recover_merge_table(f"{tdir}/t")
    assert os.path.isdir(f"{tdir}/t/__bucket=1")
    assert not os.path.isdir(f"{tdir}/t/__bucket=1__old")

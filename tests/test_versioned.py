"""Versioned-table commit protocol (sources/versioned.py): atomic
pointer flips, time travel, crash recovery at every step, vacuum."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from cdc_from_sql_and_nosql_to_data_warehouse_spark.sources import versioned as V


def _df(spark, tag: str, n: int = 5):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_commit_read_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert V.current_version(t) == 0
    assert V.commit_version(_df(spark, "v1"), t) == 1
    assert V.commit_version(_df(spark, "v2", 7), t) == 2
    assert V.current_version(t) == 2
    assert V.read_table(spark, t).count() == 7
    old = V.read_table(spark, t, version=1)
    assert old.count() == 5 and old.select("tag").distinct().collect()[0][0] == "v1"


def test_crash_before_pointer_flip_is_invisible(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)

    # inject a crash between the version rename and the pointer flip
    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith(V._POINTER):
            raise RuntimeError("crash before pointer flip")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError):
        V.commit_version(_df(spark, "v2"), t)
    monkeypatch.undo()

    # readers still see v1; the orphaned _v2 dir exists but is unpublished
    assert V.current_version(t) == 1
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v1"

    # re-running the commit converges: orphan cleaned, v2 published
    assert V.commit_version(_df(spark, "v2-retry"), t) == 2
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v2-retry"


def test_crash_during_staging_write_is_invisible(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    # simulate a mid-write crash: a stray staging dir with partial data
    os.makedirs(os.path.join(t, f"{V._TMP_PREFIX}2"))
    with open(os.path.join(t, f"{V._TMP_PREFIX}2", "part-0.parquet"), "wb") as fh:
        fh.write(b"partial garbage")
    assert V.current_version(t) == 1  # readers unaffected
    assert V.commit_version(_df(spark, "v2"), t) == 2  # orphan cleaned
    assert not any(e.startswith(V._TMP_PREFIX) for e in os.listdir(t))


def test_vacuum_retires_old_versions(spark, tmp_path):
    t = str(tmp_path / "tbl")
    for i in range(1, 5):
        V.commit_version(_df(spark, f"v{i}"), t)
    removed = V.vacuum(t, keep_last=2)
    assert removed == [1, 2]
    assert V.list_versions(t) == [3, 4]
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v4"
    with pytest.raises(FileNotFoundError, match="published"):
        V.read_table(spark, t, version=1)


def test_vacuum_never_removes_current(spark, tmp_path):
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    assert V.vacuum(t, keep_last=1) == []
    assert V.read_table(spark, t).count() == 5


def test_write_audit_publish_gate(spark, tmp_path):
    """WAP: a failed audit fully writes and fully validates the data
    but never publishes it; a passing audit publishes normally."""
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)

    def no_nulls(staged):
        return staged.filter(F.col("tag").isNull()).count() == 0

    bad = spark.range(3).select(
        F.col("id"), F.lit(None).cast("string").alias("tag")
    )
    with pytest.raises(ValueError, match="audit rejected"):
        V.commit_version(bad, t, audit=no_nulls)
    assert V.current_version(t) == 1
    assert V.list_versions(t) == [1]  # rejected version fully removed

    assert V.commit_version(_df(spark, "v2"), t, audit=no_nulls) == 2
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v2"


def test_unpublished_version_is_unreadable(spark, tmp_path, monkeypatch):
    """An on-disk version dir above the pointer (aborted commit) must
    not be readable: its number will be reused by the retry, so
    exposing it would break version immutability."""
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith(V._POINTER):
            raise RuntimeError("crash")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError):
        V.commit_version(_df(spark, "aborted"), t)
    monkeypatch.undo()
    assert os.path.isdir(os.path.join(t, "_v2"))  # orphan on disk...
    with pytest.raises(FileNotFoundError, match="published"):
        V.read_table(spark, t, version=2)  # ...but not readable


def test_corrupt_pointer_recovers_from_commit_journal(spark, tmp_path):
    """A truncated pointer must not brick the table: current_version
    recovers the last PROVABLY-published version from the _COMMITS
    journal (appended post-flip), reads keep working, and the next
    commit repairs the pointer."""
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    V.commit_version(_df(spark, "v2"), t)
    with open(os.path.join(t, V._POINTER), "w") as fh:
        fh.write("")  # truncated by a hypothetical fs failure
    assert V.current_version(t) == 2
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v2"
    assert V.commit_version(_df(spark, "v3"), t) == 3
    assert V.current_version(t) == 3


def test_corrupt_pointer_never_resurrects_unpublished_orphan(spark, tmp_path, monkeypatch):
    """The round-3 advisory: with a corrupt pointer, an on-disk version
    dir ABOVE the last journaled commit (crash between version rename
    and pointer flip, or a rejected WAP audit) must NOT become current —
    the journal, not the directory listing, is the publication witness."""
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    # orphan: crash injected between rename and flip
    real_flip = V.flip_pointer

    def crash_flip(table_dir, n):
        raise RuntimeError("crash before pointer flip")

    monkeypatch.setattr(V, "flip_pointer", crash_flip)
    with pytest.raises(RuntimeError, match="crash"):
        V.commit_version(_df(spark, "orphan"), t)
    monkeypatch.setattr(V, "flip_pointer", real_flip)
    assert os.path.isdir(os.path.join(t, "_v2"))  # orphan present
    with open(os.path.join(t, V._POINTER), "w") as fh:
        fh.write("garbage")
    assert V.current_version(t) == 1  # journal wins, orphan invisible
    assert V.read_table(spark, t).select("tag").distinct().collect()[0][0] == "v1"


def test_corrupt_pointer_without_journal_fails_loudly(spark, tmp_path):
    """No pointer AND no journal → refuse to guess (raising beats
    silently serving data that may never have been committed)."""
    t = str(tmp_path / "tbl")
    V.commit_version(_df(spark, "v1"), t)
    os.remove(os.path.join(t, V._COMMITS))
    with open(os.path.join(t, V._POINTER), "w") as fh:
        fh.write("not-a-number")
    with pytest.raises(RuntimeError, match="refusing to guess"):
        V.current_version(t)

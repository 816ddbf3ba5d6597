"""Registry verification-window budget (SURVEY.md §5.2.1).

The driver's CORRECTNESS gate checks only the FIRST 50 entries of
``operators.REGISTRY`` per round.  These tests pin the round-3 contract:
every oracle-bearing query that has never received a driver CORRECTNESS
row sits inside the first 50 positions, and nothing already verified in
rounds 1-2 wastes a window slot while unchecked work remains.
"""

from __future__ import annotations

from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops

WINDOW = 50


def _window_names() -> list[str]:
    return list(ops.REGISTRY)[:WINDOW]


def test_all_unchecked_oracle_queries_fit_in_window():
    unchecked = [
        s.name
        for s in ops.REGISTRY.values()
        if s.oracle
        and s.name not in ops._DRIVER_CHECKED
        and s.name not in ops._R04_QUEUE  # explicitly parked for round 4
    ]
    window = set(_window_names())
    missing = [n for n in unchecked if n not in window]
    assert not missing, (
        f"{len(unchecked)} unchecked oracle-bearing queries but these fell "
        f"outside the 50-entry driver window: {missing} — park extras in "
        f"_R04_QUEUE instead of letting them displace the queue"
    )
    # parked queries sit immediately behind the window, nothing lost
    order = list(ops.REGISTRY)
    for n in ops._R04_QUEUE:
        assert order.index(n) >= WINDOW, f"{n} is parked but inside the window"


def test_checked_queries_do_not_occupy_window_while_unchecked_remain():
    n_unchecked = sum(
        1 for s in ops.REGISTRY.values() if s.name not in ops._DRIVER_CHECKED
    )
    if n_unchecked < WINDOW:
        return  # window has spare room; checked entries may legitimately fill it
    rechecked = [n for n in _window_names() if n in ops._DRIVER_CHECKED]
    assert not rechecked, f"window slots wasted on already-green queries: {rechecked}"


def test_queue_names_are_registered():
    for name in (
        ops._R03_QUEUE | ops._DEFER_REDUNDANT | ops._DRIVER_CHECKED | ops._R04_QUEUE
    ):
        assert name in ops.REGISTRY, f"stale name in ordering sets: {name}"


def test_disk_absorption_matches_hardcoded_sets():
    """The dynamic CORRECTNESS_r*.json absorption must agree with the
    hardcoded r1/r2 fallback sets (same greens), and a hypothetical
    failed row must NOT be absorbed."""
    from cdc_from_sql_and_nosql_to_data_warehouse_spark.operators import (
        _R01_CHECKED,
        _R02_CHECKED,
        _driver_checked_from_disk,
    )

    disk = _driver_checked_from_disk()
    # every hardcoded name that has a disk row is confirmed green there
    assert _R02_CHECKED <= disk
    # r1 greens (incl. rows-only "no_oracle" entries) are all absorbed
    assert _R01_CHECKED <= disk


def test_window_rolls_forward_when_r03_lands(tmp_path, monkeypatch):
    """Simulate the driver writing CORRECTNESS_r03.json: every green
    name must leave the front of the window (priority 5)."""
    import json

    from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops

    front = list(ops.REGISTRY)[:50]
    fake = {name: {"rows_match": True, "schema_match": True,
                   "hash_match": True, "err": None} for name in front}
    # one failure: must stay in the window
    fail_name = front[0]
    fake[fail_name]["hash_match"] = False
    p = tmp_path / "CORRECTNESS_r99.json"
    p.write_text(json.dumps(fake))

    import glob as _glob

    real_glob = _glob.glob
    monkeypatch.setattr(
        _glob, "glob", lambda pat: real_glob(pat) + [str(p)]
    )
    absorbed = ops._driver_checked_from_disk()
    assert fail_name not in absorbed
    assert set(front[1:]) <= absorbed

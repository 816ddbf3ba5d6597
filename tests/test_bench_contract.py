"""Pin the bench.py driver contract.

The driver captures only the last ~2000 chars of bench stdout and
parses the FINAL line as JSON.  Round 4 shipped a single line that
outgrew that buffer (min + interleaved dicts for 39 queries) and the
driver recorded ``"parsed": null`` — the whole bench round was lost.
These tests make that failure class structurally impossible:

* the final stdout line, simulated with worst-case timing widths for
  the CURRENT headline set, must stay under 1800 chars;
* every headline name must exist in the registry (a renamed query
  would crash the bench run itself).
"""

from __future__ import annotations

import json

import bench
from cdc_from_sql_and_nosql_to_data_warehouse_spark import operators as ops


def _final_line(timings: dict[str, float]) -> str:
    total = round(sum(timings.values()), 3)
    subset_total = round(sum(timings[n] for n in bench.HEADLINE[:23]), 3)
    return json.dumps(
        {
            "metric": "headline_query_wall_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "total_r2_comparable_subset": subset_total,
            "sf": 0.1,
        }
    )


def test_headline_names_are_registered():
    missing = [n for n in bench.HEADLINE if n not in ops.REGISTRY]
    assert missing == []


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_final_json_line_fits_driver_tail_buffer():
    # worst-case width: every query takes hundreds of seconds with full
    # 3-decimal precision (e.g. 123.456 -> 7 chars per value)
    worst = {name: 123.456 for name in bench.HEADLINE}
    line = _final_line(worst)
    assert len(line) < 1800, (
        f"bench final line would be {len(line)} chars with "
        f"{len(bench.HEADLINE)} headline queries; the driver tail buffer "
        "is ~2000 chars — trim HEADLINE or drop per-query detail"
    )

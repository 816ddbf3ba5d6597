"""Assemble SF1_SWEEP.json from the round-10 sf1 replay worker logs.

The sweep ran as parallel tools/replay_driver.py workers over disjoint
registry chunks (plus targeted re-replays after fixes); this merges
their per-query lines LATEST-WINS in the order given, injects the two
queries whose textbook oracles are deliberately quadratic (recorded
Spark-side rows; DuckDB cannot evaluate an exact all-pairs
set-similarity truth over 50k documents — their correctness evidence
is the sf0.001/sf0.01 hash greens plus the 10x/100x slope measured on
this same blowup), and attaches the paired-bench line run at the
blowup.  Usage:

    python tools/sf1_assemble.py log1 log2 ... [--bench bench_line.json]
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# oracle-infeasible at sf1 by construction (exact all-pairs truth):
# Spark-side row counts measured directly on the blowup this round
ORACLE_INFEASIBLE = {
    "q_setsim_join": 2560,
    "q_dedup_containment": 5120,
}

_LINE = re.compile(
    r"^(q_\w+)\s+(OK-SAMPLED|FAIL-SAMPLED|OK|FAIL|rows-only|ERR|ORACLE-TIMEOUT)"
    r"\s*(.*?)(\s+[0-9.]+s)?\s*$"
)


def main() -> None:
    args = sys.argv[1:]
    bench_path = None
    if "--bench" in args:
        i = args.index("--bench")
        bench_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    per: dict[str, dict] = {}
    for f in args:
        try:
            txt = open(f, errors="ignore").read().replace("\r", "\n")
        except FileNotFoundError:
            continue
        for line in txt.splitlines():
            m = _LINE.match(line)
            if m:
                name, status, detail, wall = m.groups()
                per[name] = {
                    "status": status,
                    "detail": detail.strip(),
                    "wall_sec": float(wall.strip()[:-1]) if wall else None,
                }
    for name, rows in ORACLE_INFEASIBLE.items():
        # round 11: a sampled-protocol line (OK-SAMPLED) supersedes the
        # infeasibility note — the md5-slice value check IS the blowup
        # verification for these (tools/replay_driver.py --sampled-oracle)
        if per.get(name, {}).get("status") in ("OK-SAMPLED", "FAIL-SAMPLED"):
            per[name]["detail"] += (
                "; exact full all-pairs oracle remains quadratic/infeasible "
                "— value-checked via the md5-slice sampled protocol"
            )
            continue
        per[name] = {
            "status": "ORACLE-INFEASIBLE",
            "detail": f"spark_rows={rows}; exact all-pairs oracle is "
            "quadratic by design — slope-verified on this blowup instead",
            "wall_sec": None,
        }
    counts: dict[str, int] = {}
    for v in per.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    bench = None
    if bench_path and os.path.exists(bench_path):
        for line in open(bench_path, errors="ignore"):
            line = line.strip()
            if line.startswith("{"):
                try:
                    bench = json.loads(line)
                except json.JSONDecodeError:
                    pass
    doc = {
        "sf_dir": "/tmp/spark_graft_scale10x",
        "scale": "sf1.0 (10x of sf0.1; ~6M-row lineitem)",
        "counts": counts,
        "n_queries": len(per),
        "failed": sorted(
            n for n, v in per.items()
            if v["status"] in ("FAIL", "ERR", "FAIL-SAMPLED")
        ),
        "oracle_timeouts": sorted(
            n for n, v in per.items() if v["status"] == "ORACLE-TIMEOUT"
        ),
        "oracle_infeasible": sorted(
            n for n, v in per.items() if v["status"] == "ORACLE-INFEASIBLE"
        ),
        "sampled_ok": sorted(
            n for n, v in per.items() if v["status"] == "OK-SAMPLED"
        ),
        "per_query": per,
        "bench": bench,
    }
    out = os.path.join(ROOT, "SF1_SWEEP.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"counts": counts, "failed": doc["failed"],
                      "written": out}))


if __name__ == "__main__":
    main()

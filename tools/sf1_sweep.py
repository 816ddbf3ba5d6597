"""One decade up (VERDICT r9 next-3): the sf1.0 sweep.

Correctness and walls had only ever been recorded at sf0.01/sf0.1;
this tool runs BOTH gates at sf1 (~6M-row lineitem — the 10×-of-sf0.1
blowup, built by tools/scale_slope.py with shifted keys, domain-bounded
dims and re-vocabularied documents):

  1. the FULL-registry correctness replay (tools/replay_driver.py — the
     driver's exact row-count + sorted-schema + value-hash protocol,
     DuckDB oracle on the same parquet), and
  2. the paired-calibration headliner bench (bench.py with
     SPARK_GRAFT_SF_DIR pointed at the blowup).

Both run as subprocesses (each builds its own tuned session; the replay
additionally isolates any sf1-only failure from this orchestrator).
Results land in SF1_SWEEP.json: per-query correctness status, the
failed list (must be empty), and the bench's paired totals.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BLOWUP_DIR = os.environ.get(
    "SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_scale10x"
)

_LINE = re.compile(
    r"^(q_\w+)\s+(OK|FAIL|rows-only|ERR)\s*(.*?)\s*([0-9.]+)s\s*$"
)


def run_correctness() -> dict:
    t0 = time.perf_counter()
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(ROOT, "tools", "replay_driver.py"),
            "--sf",
            BLOWUP_DIR,
            "--n",
            "1000",
        ],
        capture_output=True,
        text=True,
        cwd=ROOT,
    )
    wall = time.perf_counter() - t0
    per_query: dict[str, dict] = {}
    summary = None
    for line in proc.stdout.splitlines():
        m = _LINE.match(line.strip())
        if m:
            name, status, detail, secs = m.groups()
            per_query[name] = {
                "status": status,
                "detail": detail,
                "wall_sec": float(secs),
            }
            continue
        if line.startswith("{"):
            try:
                summary = json.loads(line)
            except json.JSONDecodeError:
                pass
    # ERR lines carry no trailing wall — catch them separately
    for line in proc.stdout.splitlines():
        m = re.match(r"^(q_\w+)\s+ERR\s+(.*)$", line.strip())
        if m and m.group(1) not in per_query:
            per_query[m.group(1)] = {
                "status": "ERR",
                "detail": m.group(2),
                "wall_sec": None,
            }
    return {
        "rc": proc.returncode,
        "wall_sec": round(wall, 1),
        "summary": summary,
        "n_reported": len(per_query),
        "per_query": per_query,
        "stderr_tail": proc.stderr[-2000:] if proc.returncode else "",
    }


def run_bench() -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=BLOWUP_DIR)
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True,
        text=True,
        cwd=ROOT,
        env=env,
    )
    last = None
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except json.JSONDecodeError:
                pass
    return last


def main() -> None:
    if not os.path.exists(os.path.join(BLOWUP_DIR, "_BLOWUP_OK")):
        raise SystemExit(
            f"blowup missing at {BLOWUP_DIR}; run tools/scale_slope.py first"
        )
    doc: dict = {"sf_dir": BLOWUP_DIR, "scale": "sf1.0 (10x of sf0.1)"}
    print("sf1 correctness replay (full registry) ...", flush=True)
    doc["correctness"] = run_correctness()
    print(
        json.dumps(
            {
                "correctness_summary": doc["correctness"]["summary"],
                "wall_sec": doc["correctness"]["wall_sec"],
            }
        ),
        flush=True,
    )
    print("sf1 paired bench ...", flush=True)
    doc["bench"] = run_bench()
    out = os.path.join(ROOT, "SF1_SWEEP.json")
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    failed = (doc["correctness"]["summary"] or {}).get("failed", ["<none>"])
    print(json.dumps({"failed": failed, "written": out}))


if __name__ == "__main__":
    main()
